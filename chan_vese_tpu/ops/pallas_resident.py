"""VMEM-resident multi-iteration Pallas kernel (small/medium images).

The banded kernel (ops/pallas_sweep.py) pays one kernel launch and one
full HBM round-trip of phi per iteration - at 4K that cost is amortized
by 8.3 Mpixels of work, but at 256^2 it dominates (~35 us/iter measured
vs ~3 us of ALU). This kernel keeps EVERYTHING resident in VMEM across
iterations: one pallas_call runs ``iters`` full Chan-Vese iterations as
sequential grid steps over the same VMEM scratch - phi is DMA'd in once
at step 0 and out once at the last step. HBM traffic per iteration: zero.

Per grid step (= one outer Chan-Vese iteration, same math as the jnp
driver models/scalar.py step()):

    c1, c2 = in-kernel masked means of the RESIDENT phi   (exact, no lag)
    f      = -nu - l1 (u0-c1)^2 + l2 (u0-c2)^2
    phi    = red half-sweep, then black half-sweep (_update_all)
    partials row k: [s_uH, s_H, s_dphi2, flips, s_absdphi, 0, 0, 0]

Unlike the banded kernel the means here are the CURRENT iteration's
(recomputed from resident phi each step), exactly matching the reference
scheme - there is no carried-means lag.

Limits: the whole (H, W) image + ~15 full-size temporaries must fit in
VMEM - supports_resident() caps H*W accordingly (1024x1024 f32 fits).
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
from .pallas_sweep import _VMEM_LIMIT, _heaviside, _update_all

# full-array temporaries alive at once inside one step (phi, u0, new, the
# shift/coefficient fields of _update_all, H_eps, masks) - conservative
_ARRAYS = 18


def supports_resident(h: int, w: int) -> bool:
    return (w % 128 == 0 and h % 8 == 0 and h >= 8
            and h * w * 4 * _ARRAYS <= _VMEM_LIMIT)


def supports_resident_mc(h: int, w: int, c: int) -> bool:
    # the C-channel image replaces the scalar u0 (+ per-channel distance
    # temporaries in the data-term loop)
    return (w % 128 == 0 and h % 8 == 0 and h >= 8 and 1 <= c <= 8
            and h * w * 4 * (_ARRAYS + 2 * c) <= _VMEM_LIMIT)


def _kernel(phi_hbm, u0_hbm, out_hbm, part_ref, phi_scr, u0_scr, sems,
            *, steps, unroll, mu, nu, l1, l2, dt, eps, eta2, n_pix):
    """One grid step = ``unroll`` exact Chan-Vese iterations (means
    recomputed from the resident phi every iteration - identical
    trajectory for any unroll; unroll amortizes the ~20 us fixed
    per-grid-step cost that dominates small images). Partials row k
    describes grid step k's LAST iteration."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        pltpu.make_async_copy(phi_hbm, phi_scr, sems.at[0]).start()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[1]).start()
        pltpu.make_async_copy(phi_hbm, phi_scr, sems.at[0]).wait()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[1]).wait()

    phi_n = phi_scr[:]
    u0 = u0_scr[:]
    sum_u = jnp.sum(u0)
    tiny = jnp.asarray(1e-30, phi_n.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 1)
    red = ((rows + cols) % 2) == 0

    for _ in range(unroll):
        phi = phi_n
        # region means of the resident phi (SURVEY.md C3) - current
        # iteration's, no lag
        h_eps = _heaviside(phi, eps)
        s_uh = jnp.sum(u0 * h_eps)
        s_h = jnp.sum(h_eps)
        c1 = s_uh / jnp.maximum(s_h, tiny)
        c2 = (sum_u - s_uh) / jnp.maximum(n_pix - s_h, tiny)

        f = -nu - l1 * (u0 - c1) ** 2 + l2 * (u0 - c2) ** 2

        g = (dt * eps / math.pi) / (eps * eps + phi * phi)
        phi_r = jnp.where(red, _update_all(phi, g, f, mu, dt, eps, eta2),
                          phi)
        phi_n = jnp.where(red, phi_r,
                          _update_all(phi_r, g, f, mu, dt, eps, eta2))

    phi_scr[:] = phi_n

    dphi = phi_n - phi
    flips = ((phi_n >= 0) != (phi >= 0)).astype(phi.dtype)
    part_ref[k, 0] = s_uh
    part_ref[k, 1] = s_h
    part_ref[k, 2] = jnp.sum(dphi * dphi)
    part_ref[k, 3] = jnp.sum(flips)
    part_ref[k, 4] = jnp.sum(jnp.abs(dphi))
    part_ref[k, 5] = 0.0
    part_ref[k, 6] = 0.0
    part_ref[k, 7] = 0.0

    @pl.when(k == steps - 1)
    def _():
        pltpu.make_async_copy(phi_scr, out_hbm, sems.at[2]).start()
        pltpu.make_async_copy(phi_scr, out_hbm, sems.at[2]).wait()


def _kernel_batch(phi_hbm, u0_hbm, out_hbm, part_ref, phi_scr, u0_scr, sems,
                  *, steps, unroll, mu, nu, l1, l2, dt, eps, eta2, n_pix):
    """Batched variant: grid (N, steps) - for each frame (outer,
    sequential on TPU) run steps * unroll resident iterations; DMA in at
    step 0 and out at the last step. Partials keep only each frame's
    LAST iteration row (SMEM budget: (N, 8))."""
    fr = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        pltpu.make_async_copy(phi_hbm.at[fr], phi_scr, sems.at[0]).start()
        pltpu.make_async_copy(u0_hbm.at[fr], u0_scr, sems.at[1]).start()
        pltpu.make_async_copy(phi_hbm.at[fr], phi_scr, sems.at[0]).wait()
        pltpu.make_async_copy(u0_hbm.at[fr], u0_scr, sems.at[1]).wait()

    phi_n = phi_scr[:]
    u0 = u0_scr[:]
    sum_u = jnp.sum(u0)
    tiny = jnp.asarray(1e-30, phi_n.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 1)
    red = ((rows + cols) % 2) == 0

    for _ in range(unroll):
        phi = phi_n
        h_eps = _heaviside(phi, eps)
        s_uh = jnp.sum(u0 * h_eps)
        s_h = jnp.sum(h_eps)
        c1 = s_uh / jnp.maximum(s_h, tiny)
        c2 = (sum_u - s_uh) / jnp.maximum(n_pix - s_h, tiny)

        f = -nu - l1 * (u0 - c1) ** 2 + l2 * (u0 - c2) ** 2

        g = (dt * eps / math.pi) / (eps * eps + phi * phi)
        phi_r = jnp.where(red, _update_all(phi, g, f, mu, dt, eps, eta2),
                          phi)
        phi_n = jnp.where(red, phi_r,
                          _update_all(phi_r, g, f, mu, dt, eps, eta2))

    phi_scr[:] = phi_n

    @pl.when(k == steps - 1)
    def _():
        dphi = phi_n - phi
        flips = ((phi_n >= 0) != (phi >= 0)).astype(phi.dtype)
        part_ref[fr, 0] = s_uh
        part_ref[fr, 1] = s_h
        part_ref[fr, 2] = jnp.sum(dphi * dphi)
        part_ref[fr, 3] = jnp.sum(flips)
        part_ref[fr, 4] = jnp.sum(jnp.abs(dphi))
        part_ref[fr, 5] = 0.0
        part_ref[fr, 6] = 0.0
        part_ref[fr, 7] = 0.0
        pltpu.make_async_copy(phi_scr, out_hbm.at[fr], sems.at[2]).start()
        pltpu.make_async_copy(phi_scr, out_hbm.at[fr], sems.at[2]).wait()


def _kernel_mc(phi_hbm, u0_hbm, out_hbm, part_ref, phi_scr, u0_scr,
               sems, *, steps, unroll, C, mu, nu, l1, l2, dt, eps, eta2,
               n_pix):
    """Multichannel resident step: per-channel means of the resident phi,
    Chan-Sandberg-Vese data term, red-black sweep - all in VMEM;
    ``unroll`` exact iterations per grid step (see _kernel).

    Partials row k: [s_uH_0..s_uH_{C-1}, s_H, s_dphi2, flips, s_absdphi]
    of grid step k's last iteration.
    """
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        pltpu.make_async_copy(phi_hbm, phi_scr, sems.at[0]).start()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[1]).start()
        pltpu.make_async_copy(phi_hbm, phi_scr, sems.at[0]).wait()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[1]).wait()

    phi_n = phi_scr[:]
    tiny = jnp.asarray(1e-30, phi_n.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 1)
    red = ((rows + cols) % 2) == 0

    for _ in range(unroll):
        phi = phi_n
        h_eps = _heaviside(phi, eps)
        s_h = jnp.sum(h_eps)
        inv_in = 1.0 / jnp.maximum(s_h, tiny)
        inv_out = 1.0 / jnp.maximum(n_pix - s_h, tiny)

        f = jnp.full(phi.shape, -nu, dtype=phi.dtype)
        s_uhs = []
        for ch in range(C):
            u_ch = u0_scr[ch]
            s_uh = jnp.sum(u_ch * h_eps)
            s_uhs.append(s_uh)
            c1 = s_uh * inv_in
            c2 = (jnp.sum(u_ch) - s_uh) * inv_out
            d1 = u_ch - c1
            d2 = u_ch - c2
            f = f + (l2[ch] / C) * (d2 * d2) - (l1[ch] / C) * (d1 * d1)

        g = (dt * eps / math.pi) / (eps * eps + phi * phi)
        phi_r = jnp.where(red, _update_all(phi, g, f, mu, dt, eps, eta2),
                          phi)
        phi_n = jnp.where(red, phi_r,
                          _update_all(phi_r, g, f, mu, dt, eps, eta2))

    phi_scr[:] = phi_n

    dphi = phi_n - phi
    flips = ((phi_n >= 0) != (phi >= 0)).astype(phi.dtype)
    for ch in range(C):
        part_ref[k, ch] = s_uhs[ch]
    part_ref[k, C] = s_h
    part_ref[k, C + 1] = jnp.sum(dphi * dphi)
    part_ref[k, C + 2] = jnp.sum(flips)
    part_ref[k, C + 3] = jnp.sum(jnp.abs(dphi))

    @pl.when(k == steps - 1)
    def _():
        pltpu.make_async_copy(phi_scr, out_hbm, sems.at[2]).start()
        pltpu.make_async_copy(phi_scr, out_hbm, sems.at[2]).wait()


@functools.partial(jax.jit, static_argnames=("p", "iters", "unroll",
                                             "lambda1", "lambda2",
                                             "interpret"))
def resident_iterations_mc(phi, u0_cfirst, p: CVParams, iters: int,
                           lambda1=None, lambda2=None, unroll: int = 1,
                           interpret: bool = False
                           ) -> Tuple[jax.Array, jax.Array]:
    """Multichannel VMEM-resident run on a (C, H, W) channels-first image.

    Returns (phi_new, partials (iters // unroll, C + 4)); row k holds
    the means sums of the phi its last iteration started from plus that
    iteration's update partials (layout of ops/pallas_sweep_mc.py).
    Means are exact per iteration (recomputed in-kernel from the
    resident phi) for ANY unroll, same as the scalar resident kernel.
    """
    C, H, W = u0_cfirst.shape
    if phi.shape != (H, W):
        raise ValueError(f"phi {phi.shape} vs image {(H, W)}")
    if not supports_resident_mc(H, W, C):
        raise ValueError(f"resident mc path unsupported for {(H, W, C)}")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if unroll < 1 or iters % unroll:
        raise ValueError(f"unroll must divide iters (got iters={iters}, "
                         f"unroll={unroll})")
    steps = iters // unroll
    l1, l2 = p.channel_lambdas(C, lambda1, lambda2)

    kernel = functools.partial(
        _kernel_mc, steps=steps, unroll=unroll, C=C, mu=p.mu, nu=p.nu,
        l1=l1, l2=l2, dt=p.dt, eps=p.eps, eta2=p.eta2, n_pix=float(H * W))

    phi_new, partials = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, W), phi.dtype),
            jax.ShapeDtypeStruct((steps, C + 4), phi.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, W), phi.dtype),
            pltpu.VMEM((C, H, W), phi.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(phi, u0_cfirst)
    return phi_new, partials


@functools.partial(jax.jit, static_argnames=("p", "iters", "unroll",
                                             "interpret"))
def resident_iterations_batch(phis, u0s, p: CVParams, iters: int,
                              unroll: int = 1,
                              interpret: bool = False
                              ) -> Tuple[jax.Array, jax.Array]:
    """Run ``iters`` resident iterations on every frame of an (N, H, W)
    stack in one pallas_call (frames are an outer sequential grid dim;
    ``unroll`` iterations per grid step, trajectory-identical).

    Returns (phis_new (N, H, W), partials (N, 8)) where each frame's row
    holds its LAST iteration's [s_uH, s_H, s_dphi2, flips, s_absdphi].
    """
    N, H, W = phis.shape
    if u0s.shape != phis.shape:
        raise ValueError(f"u0s {u0s.shape} vs phis {phis.shape}")
    if not supports_resident(H, W):
        raise ValueError(f"resident path unsupported for {(H, W)}")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if unroll < 1 or iters % unroll:
        raise ValueError(f"unroll must divide iters (got iters={iters}, "
                         f"unroll={unroll})")
    steps = iters // unroll

    kernel = functools.partial(
        _kernel_batch, steps=steps, unroll=unroll, mu=p.mu, nu=p.nu,
        l1=p.lambda1, l2=p.lambda2, dt=p.dt, eps=p.eps, eta2=p.eta2,
        n_pix=float(H * W))

    phis_new, partials = pl.pallas_call(
        kernel,
        grid=(N, steps),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W), phis.dtype),
            jax.ShapeDtypeStruct((N, 8), phis.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, W), phis.dtype),
            pltpu.VMEM((H, W), phis.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(phis, u0s)
    return phis_new, partials


@functools.partial(jax.jit, static_argnames=("p", "iters", "unroll",
                                             "interpret"))
def resident_iterations(phi, u0, p: CVParams, iters: int, unroll: int = 1,
                        interpret: bool = False
                        ) -> Tuple[jax.Array, jax.Array]:
    """Run ``iters`` full Chan-Vese iterations in one VMEM-resident call.

    Returns (phi_new, partials (iters // unroll, 8)): row k holds the
    masked-mean sums of the phi its LAST iteration started from (s_uH,
    s_H - the means that iteration actually used) plus that iteration's
    update partials (s_dphi2, flips, s_absdphi). ``unroll`` runs that
    many iterations per grid step (identical trajectory - the means are
    recomputed in-VMEM every iteration regardless); it amortizes the
    fixed per-grid-step cost that dominates small images, at the price
    of unroll-granular partials rows.
    """
    H, W = phi.shape
    if not supports_resident(H, W):
        raise ValueError(f"resident path unsupported for shape {phi.shape}")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if unroll < 1 or iters % unroll:
        raise ValueError(f"unroll must divide iters (got iters={iters}, "
                         f"unroll={unroll})")
    steps = iters // unroll

    kernel = functools.partial(
        _kernel, steps=steps, unroll=unroll, mu=p.mu, nu=p.nu,
        l1=p.lambda1, l2=p.lambda2, dt=p.dt, eps=p.eps, eta2=p.eta2,
        n_pix=float(H * W))

    phi_new, partials = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, W), phi.dtype),
            jax.ShapeDtypeStruct((iters, 8), phi.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, W), phi.dtype),
            pltpu.VMEM((H, W), phi.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(phi, u0)
    return phi_new, partials
