"""Fused Pallas kernel, multichannel (vector-valued) variant (SURVEY.md C9;
eval config 2 on the fast path).

Same structure as ops/pallas_sweep.py - one red-black iteration plus the
next iteration's reductions per pass over HBM - with a C-channel image:
the level set stays scalar; only the data term and the region-mean
partials gain a channel dimension (Chan-Sandberg-Vese: f averages the
per-channel weighted squared distances).

Layout: u0 is carried CHANNELS-FIRST (C, H, W) so each channel's band is a
contiguous (rows, W) tile - lane-friendly, one 3D DMA. The driver
(models/fused.py) transposes from the user-facing (H, W, C) once at entry.

Partials per band: [s_uH_0 .. s_uH_{C-1}, s_H, s_dphi2, flips, s_absdphi].
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import CVParams
from .pallas_sweep import (_HALO, _HALO_UP, _VMEM_LIMIT, _heaviside,
                           _update_all)


_VMEM_BUDGET = _VMEM_LIMIT  # tests shrink this to force multi-band layouts


def band_rows_mc(h: int, w: int, c: int) -> int:
    # per band: double-buffered phi/new (2+2) + u0 (2C) + ~16 tile-sized
    # Mosaic temporaries (the register-allocator spill slots measured on
    # v5e - a (11+2C) budget OOM'd VMEM at 4K RGB with 72M of spill)
    per_row = w * 4 * (27 + 2 * c)
    b = max(8, (_VMEM_BUDGET // per_row) // 8 * 8)
    return min(b, max(8, ((h - _HALO) // 8) * 8))


def supports_mc(h: int, w: int, c: int) -> bool:
    return (w % 128 == 0 and h % 8 == 0 and h >= 24 and 1 <= c <= 8
            and band_rows_mc(h, w, c) + _HALO <= h)


def _kernel(c_ref, phi_hbm, u0_hbm, out_hbm, part_ref,
            phi_scr, u0_scr, new_scr, sems,
            *, H, W, C, b, mu, nu, l1, l2, dt, eps, eta2):
    # double-buffered DMA pipeline, same schedule as the scalar kernel
    # (ops/pallas_sweep.py): prefetch band i+1's tiles while computing
    # band i; stores drain two grid steps behind
    i = pl.program_id(0)
    nbands = pl.num_programs(0)

    def window(ii):
        g0 = pl.multiple_of(jnp.minimum(ii * b, H - b), 8)
        s = pl.multiple_of(jnp.clip(g0 - _HALO_UP, 0, H - (b + _HALO)), 8)
        return g0, s

    def load_dmas(ii, slot):
        _, s = window(ii)
        return (pltpu.make_async_copy(phi_hbm.at[pl.ds(s, b + _HALO), :],
                                      phi_scr.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(u0_hbm.at[:, pl.ds(s, b + _HALO), :],
                                      u0_scr.at[slot], sems.at[slot, 1]))

    def store_dma(ii, slot):
        g0, s = window(ii)
        o = pl.multiple_of(g0 - s, 8)
        return pltpu.make_async_copy(
            new_scr.at[slot].at[pl.ds(o, b), :],
            out_hbm.at[pl.ds(g0, b), :], sems.at[slot, 2])

    slot = i % 2

    @pl.when(i == 0)
    def _():
        for dma in load_dmas(i, slot):
            dma.start()

    @pl.when(i + 1 < nbands)
    def _():
        for dma in load_dmas(i + 1, (i + 1) % 2):
            dma.start()

    for dma in load_dmas(i, slot):
        dma.wait()

    g0, s = window(i)

    phi = phi_scr[slot]
    # Chan-Sandberg-Vese data term: channel-averaged weighted sq. distances
    f = jnp.full(phi.shape, -nu, dtype=phi.dtype)
    for ch in range(C):
        u_ch = u0_scr[slot, ch]
        d1 = u_ch - c_ref[0, ch]
        d2 = u_ch - c_ref[0, C + ch]
        f = f + (l2[ch] / C) * (d2 * d2) - (l1[ch] / C) * (d1 * d1)

    rows = jax.lax.broadcasted_iota(jnp.int32, phi.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, phi.shape, 1)
    grow = rows + s
    red = ((grow + cols) % 2) == 0

    g = (dt * eps / math.pi) / (eps * eps + phi * phi)
    phi_r = jnp.where(red, _update_all(phi, g, f, mu, dt, eps, eta2), phi)
    phi_n = jnp.where(red, phi_r, _update_all(phi_r, g, f, mu, dt, eps, eta2))

    @pl.when(i >= 2)
    def _():
        store_dma(i - 2, slot).wait()

    new_scr[slot] = phi_n
    store_dma(i, slot).start()

    hi = jnp.minimum((i + 1) * b, H)
    m = ((grow >= i * b) & (grow < hi)).astype(phi.dtype)
    h_eps = _heaviside(phi_n, eps)
    hm = h_eps * m
    dphi = phi_n - phi
    flips = ((phi_n >= 0) != (phi >= 0)).astype(phi.dtype)
    for ch in range(C):
        part_ref[i, ch] = jnp.sum(u0_scr[slot, ch] * hm)
    part_ref[i, C] = jnp.sum(hm)
    part_ref[i, C + 1] = jnp.sum(dphi * dphi * m)
    part_ref[i, C + 2] = jnp.sum(flips * m)
    part_ref[i, C + 3] = jnp.sum(jnp.abs(dphi) * m)

    @pl.when(i == nbands - 1)
    def _():
        store_dma(i, slot).wait()

    @pl.when((i == nbands - 1) & (nbands >= 2))
    def _():
        store_dma(i - 1, (i - 1) % 2).wait()


@functools.partial(jax.jit,
                   static_argnames=("p", "lambda1", "lambda2", "interpret"))
def fused_iteration_mc(phi, u0_cfirst, c1, c2, p: CVParams,
                       lambda1=None, lambda2=None, interpret: bool = False
                       ) -> Tuple[jax.Array, jax.Array]:
    """One fused red-black iteration on a (C, H, W) channels-first image.

    c1, c2: (C,) means. Returns (phi_new, partials (C+4,)):
    [s_uH per channel..., s_H, s_dphi2, flips, s_absdphi].
    """
    C, H, W = u0_cfirst.shape
    if phi.shape != (H, W):
        raise ValueError(f"phi {phi.shape} vs image {(H, W)}")
    if not supports_mc(H, W, C):
        raise ValueError(f"mc fast path unsupported for {u0_cfirst.shape}")
    l1, l2 = p.channel_lambdas(C, lambda1, lambda2)
    b = band_rows_mc(H, W, C)
    nbands = pl.cdiv(H, b)
    c = jnp.concatenate([jnp.atleast_1d(c1), jnp.atleast_1d(c2)]
                        ).reshape(1, 2 * C).astype(phi.dtype)

    kernel = functools.partial(
        _kernel, H=H, W=W, C=C, b=b, mu=p.mu, nu=p.nu, l1=l1, l2=l2,
        dt=p.dt, eps=p.eps, eta2=p.eta2)

    phi_new, partials = pl.pallas_call(
        kernel,
        grid=(nbands,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, W), phi.dtype),
            jax.ShapeDtypeStruct((nbands, C + 4), phi.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b + _HALO, W), phi.dtype),
            pltpu.VMEM((2, C, b + _HALO, W), phi.dtype),
            pltpu.VMEM((2, b + _HALO, W), phi.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c, phi, u0_cfirst)
    return phi_new, jnp.sum(partials, axis=0)
