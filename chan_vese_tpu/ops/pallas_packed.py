"""Packed-color (plane-deinterleaved) Chan-Vese kernels - the VERDICT r2
item 3 experiment.

The red-black lattice in the standard (H, W) layout forces every
half-sweep to COMPUTE the update at all cells and keep half
(jnp.where masking): Mosaic cannot lower stride-2 lane gathers, so the
num/den/divide work at the inactive color is pure waste (~15-20% of the
iteration; the A/B face-coefficient fields are needed at BOTH colors via
the backward coefficients, so they cannot be thinned - CLAUDE.md
packed-color analysis).

This module dodges the stride-2 limitation by FULLY deinterleaving the
grid into four planes P[a][b][r, c] = phi[2r + a, 2c + b] (row parity x
column parity, each (H/2, W/2) - lane-aligned when W % 256 == 0). Under
that layout:

  * red cells  = planes (0,0) and (1,1), black = (0,1) and (1,0):
    a half-sweep REPLACES two whole planes - no masks, no parity iota,
    no where-selects at all;
  * neighbor access becomes plane aliasing plus single-row/col concats
    (cheaper than the roll+iota+select shifts of the flat layout);
  * A/B fields are still evaluated on all four planes (the backward
    coefficients of an active plane read the neighbor planes' fields),
    but num/den/divide/Dirac run on the two ACTIVE planes only - half
    the area.

Arithmetic per cell is EXACTLY ops/pallas_sweep._update_all's (same
expression structure, same replica-eval clamp semantics), so the packed
trajectory is elementwise the banded kernel's frozen-means trajectory
(verified in tests/test_packed.py, bitwise in interpret mode).

Kernels here are VMEM-RESIDENT chunk kernels (whole image resident,
k frozen-means iterations per call, banded_chunk partials contract):
the A/B measurement vehicle for the packed layout. ``packed=False``
builds the SAME kernel with the flat masked update, isolating the
layout effect from residency/DMA effects. If the packed win measures
out, the layout ports to the banded DMA pipeline.
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

# resident footprint: phi/u0/f (x4 planes or x1 flat - same bytes) plus
# Mosaic temporaries of the field evaluations
_ARRAYS_RESIDENT = 20


def supports_packed(h: int, w: int) -> bool:
    return (h % 16 == 0 and w % 256 == 0
            and h * w * 4 * _ARRAYS_RESIDENT <= _VMEM_LIMIT)


_MXU_G = 256  # lane-deinterleave block; supports_packed demands W % 256


@functools.lru_cache(maxsize=None)
def _perm_matrix_np(dtype_name: str):
    """(G, G) 0/1 deinterleave permutation: output lane j < G/2 selects
    input lane 2j (even columns), j >= G/2 selects 2(j - G/2) + 1 (odd).
    Used from both sides: x @ P deinterleaves, y @ P^T re-interleaves.

    Returns NUMPY, converted per call site: caching the jnp array would
    capture a DynamicJaxprTracer when the first call happens inside an
    outer jit trace and leak it into every later trace (hit by
    bench_configs r4). XLA dedupes the repeated constant."""
    import numpy as np
    g = _MXU_G
    m = np.zeros((g, g), np.dtype(dtype_name))
    m[2 * np.arange(g // 2), np.arange(g // 2)] = 1
    m[2 * np.arange(g // 2) + 1, g // 2 + np.arange(g // 2)] = 1
    return m


def _perm_matrix(dtype_name: str):
    return jnp.asarray(_perm_matrix_np(dtype_name))


def _pack(x):
    """(H, W) -> (2, 2, H/2, W/2) parity planes (host/jnp side).

    Two formulations, picked by width:

    * W % 256 == 0 (every supports_packed shape): lane deinterleave as
      a (256, 256) 0/1 permutation matmul on the MXU (HIGHEST
      precision: each output is exactly one input * 1 summed with
      zeros — bit-exact for normals; denormals flush to zero, which
      TPU arithmetic does anyway and phi/u0/f live at O(1)-O(255)),
      then the row split as a major-dim transpose whose minor dim
      stays intact. The round-4 on-chip profile
      (artifacts/profile_banded_2026-08-18.out) showed the previous
      fused reshape+transpose lowering at ~12 GB/s plus two XLA layout
      copies = 17.2 ms per 4K segment call; the MXU route removes the
      trailing-length-2 lane reshape that caused both.
    * otherwise (odd sharded local widths): the original rank-2
      reshape+transpose — XLA fuses it into one copy.

    Do NOT vmap either form: under vmap the trailing length-2 lane dim
    of the reshape materializes with the (8, 128) tiled layout — a 64x
    HBM transient (f32[3,2160,2,3840,2] asked for 25.5 GB at 8K RGB).
    Strided slices are no alternative: lane-stride-2 slices lower
    gather-like and cost ~1.3 s at 8K RGB (measured 10x end-to-end
    slowdown). Use _pack_mc for (C, H, W)."""
    H, W = x.shape
    if W % _MXU_G == 0:
        pm = _perm_matrix(x.dtype.name)
        xb = x.reshape(H, W // _MXU_G, _MXU_G)
        y = jax.lax.dot_general(xb, pm, (((2,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST)
        ye = y[..., :_MXU_G // 2].reshape(H, W // 2)
        yo = y[..., _MXU_G // 2:].reshape(H, W // 2)
        pe = ye.reshape(H // 2, 2, W // 2).transpose(1, 0, 2)
        po = yo.reshape(H // 2, 2, W // 2).transpose(1, 0, 2)
        return jnp.stack([pe, po], axis=1)
    return (x.reshape(H // 2, 2, W // 2, 2)
            .transpose(1, 3, 0, 2))


def _pack_n(xn):
    """(N, H, W) -> (N, 2, 2, H/2, W/2), O(1) trace size.

    The MXU-permutation form of _pack batches cleanly: its lane
    deinterleave is a dot_general whose minor dims are 256/128 (never
    the trailing length-2 lane dim that makes the vmapped LEGACY
    reshape a 64x tiled-layout HBM transient — see _pack), and the row
    split is the same major-dim transpose with the minor dim intact.
    One batched matmul + transpose replaces the former static per-frame
    Python loop, whose trace/program size grew linearly with N around
    the kernel call (ADVICE r3: N=256 at config-5 scale). Measured
    on-chip 2026-08-19 (artifacts/ab_pack_batch_2026-08-19.out):
    config-5-scale compile+first 274.7 s -> 5.9 s (46x), throughput
    identical (24.1 G both), 8K RGB pack+unpack round-trip ~5 ms
    device time (no 64x transient). Non-MXU widths keep the per-frame loop
    (odd sharded local shapes are never batched at scale)."""
    N, H, W = xn.shape
    if W % _MXU_G == 0:
        pm = _perm_matrix(xn.dtype.name)
        xb = xn.reshape(N, H, W // _MXU_G, _MXU_G)
        y = jax.lax.dot_general(xb, pm, (((3,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST)
        ye = y[..., :_MXU_G // 2].reshape(N, H, W // 2)
        yo = y[..., _MXU_G // 2:].reshape(N, H, W // 2)
        pe = ye.reshape(N, H // 2, 2, W // 2).transpose(0, 2, 1, 3)
        po = yo.reshape(N, H // 2, 2, W // 2).transpose(0, 2, 1, 3)
        return jnp.stack([pe, po], axis=2)
    return jnp.stack([_pack(c) for c in xn])


def _pack_mc(ucf):
    """(C, H, W) channels-first -> (C, 2, 2, H/2, W/2). Alias of
    _pack_n (a channel axis is just a batch axis for the pack)."""
    return _pack_n(ucf)


def _unpack_n(planes_n):
    """(N, 2, 2, H/2, W/2) -> (N, H, W). Inverse of _pack_n: batched
    MXU re-interleave when W % 256 == 0, per-slice loop otherwise."""
    N, _, _, Hp, Wp = planes_n.shape
    H, W = 2 * Hp, 2 * Wp
    if W % _MXU_G == 0:
        pm = _perm_matrix(planes_n.dtype.name)
        ye = planes_n[:, :, 0].transpose(0, 2, 1, 3).reshape(N, H, Wp)
        yo = planes_n[:, :, 1].transpose(0, 2, 1, 3).reshape(N, H, Wp)
        y = jnp.concatenate([ye.reshape(N, H, W // _MXU_G, _MXU_G // 2),
                             yo.reshape(N, H, W // _MXU_G, _MXU_G // 2)],
                            axis=-1)
        xb = jax.lax.dot_general(y, pm, (((3,), (1,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
        return xb.reshape(N, H, W)
    return jnp.stack([_unpack(pl) for pl in planes_n])


def _unpack(planes):
    """(2, 2, H/2, W/2) -> (H, W). Inverse of _pack, same two
    formulations (MXU re-interleave when W % 256 == 0)."""
    _, _, Hp, Wp = planes.shape
    H, W = 2 * Hp, 2 * Wp
    if W % _MXU_G == 0:
        pm = _perm_matrix(planes.dtype.name)
        ye = planes[:, 0].transpose(1, 0, 2).reshape(H, Wp)
        yo = planes[:, 1].transpose(1, 0, 2).reshape(H, Wp)
        y = jnp.concatenate([ye.reshape(H, W // _MXU_G, _MXU_G // 2),
                             yo.reshape(H, W // _MXU_G, _MXU_G // 2)],
                            axis=-1)
        xb = jax.lax.dot_general(y, pm, (((2,), (1,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
        return xb.reshape(H, W)
    return planes.transpose(2, 0, 3, 1).reshape(2 * Hp, 2 * Wp)


def _neighbors(p, a, b):
    """(N, S, E, W) value planes for plane (a, b), replica-eval clamps."""
    if a == 0:
        n = jnp.concatenate([p[0][b][:1], p[1][b][:-1]], axis=0)
        s = p[1][b]
    else:
        n = p[0][b]
        s = jnp.concatenate([p[0][b][1:], p[1][b][-1:]], axis=0)
    if b == 0:
        w = jnp.concatenate([p[a][0][:, :1], p[a][1][:, :-1]], axis=1)
        e = p[a][1]
    else:
        w = p[a][0]
        e = jnp.concatenate([p[a][0][:, 1:], p[a][1][:, -1:]], axis=1)
    return n, s, e, w


def _packed_half_sweep(p, f, active, mu, dt, eps, eta2):
    """One half-sweep: replace the two ``active`` parity planes.

    p: nested plane lists p[a][b]; f: data-term planes. Fields A/B are
    evaluated on all four planes (backward coefficients of the active
    planes read them); Dirac/num/den/divide only on the active two.
    """
    A = [[None, None], [None, None]]
    B = [[None, None], [None, None]]
    dy0s = [[None, None], [None, None]]
    dx0s = [[None, None], [None, None]]
    nbrs = [[None, None], [None, None]]
    for a in (0, 1):
        for b in (0, 1):
            n, s, e, w = _neighbors(p, a, b)
            phi = p[a][b]
            dxp = s - phi
            dyp = e - phi
            dx0 = 0.5 * (s - n)
            dy0 = 0.5 * (e - w)
            A[a][b] = mu * jax.lax.rsqrt(eta2 + dxp * dxp + dy0 * dy0)
            B[a][b] = mu * jax.lax.rsqrt(eta2 + dx0 * dx0 + dyp * dyp)
            dy0s[a][b] = dy0
            dx0s[a][b] = dx0
            nbrs[a][b] = (n, s, e, w)

    out = [[p[0][0], p[0][1]], [p[1][0], p[1][1]]]
    for a, b in active:
        phi = p[a][b]
        n, s, e, w = nbrs[a][b]
        # backward coefficients: shifts of the neighbor planes' forward
        # fields, with the replica-eval row-0/col-0 fixes
        if a == 0:
            am0 = mu * jax.lax.rsqrt(
                eta2 + dy0s[0][b][:1] * dy0s[0][b][:1])
            Am = jnp.concatenate([am0, A[1][b][:-1]], axis=0)
        else:
            Am = A[0][b]
        if b == 0:
            bm0 = mu * jax.lax.rsqrt(
                eta2 + dx0s[a][0][:, :1] * dx0s[a][0][:, :1])
            Bm = jnp.concatenate([bm0, B[a][1][:, :-1]], axis=1)
        else:
            Bm = B[a][0]
        g = (dt * eps / math.pi) / (eps * eps + phi * phi)
        num = phi + g * (A[a][b] * s + Am * n + B[a][b] * e + Bm * w
                         + f[a][b])
        den = 1.0 + g * (A[a][b] + Am + B[a][b] + Bm)
        out[a][b] = num / den
    return out


def _packed_iteration(p, f, mu, dt, eps, eta2):
    """One full red-black iteration on parity planes."""
    p = _packed_half_sweep(p, f, ((0, 0), (1, 1)), mu, dt, eps, eta2)
    return _packed_half_sweep(p, f, ((0, 1), (1, 0)), mu, dt, eps, eta2)


def _packed_rim(p, flags, cropp, growp, colp):
    """Global-edge Neumann replica-rim refresh in PLANE coordinates (the
    packed twin of ops/pallas_sweep._resync_rim; used by the sharded
    packed banded kernel).

    Requires an even-parity canvas origin and even crop bounds, so every
    rim row/col maps to a STATIC plane position: with crop (r0, r1, c0,
    c1) even, canvas rows r0-1 / r0-2 are plane rows r0/2 - 1 of planes
    a=1 / a=0, both replicas of edge row r0 (plane a=0, row r0/2); rows
    r1, r1+1 are plane rows r1/2 of a=0 / a=1, replicas of row r1-1
    (plane a=1, row r1/2 - 1); columns symmetric with the b index.
    ``cropp`` = crop // 2; ``growp``/``colp`` = plane-space global
    row/col iotas of the band tile; ``flags`` = traced (top, bot, left,
    right) booleans. Rows fix before columns so corner replicas match
    _resync_replicas' sequential order.
    """
    r0p, r1p, c0p, c1p = cropp
    is_top, is_bot, is_left, is_right = flags
    out = [[p[0][0], p[0][1]], [p[1][0], p[1][1]]]
    for b in (0, 1):
        # value at plane row r <- plane-a=0 row r+1 (canvas edge row r0)
        top_src = jnp.concatenate([out[0][b][1:], out[0][b][-1:]], axis=0)
        mt = is_top & (growp == r0p - 1)
        o1 = jnp.where(mt, top_src, out[1][b])
        o0 = jnp.where(mt, top_src, out[0][b])
        # value at plane row r <- plane-a=1 row r-1 (canvas row r1 - 1)
        bot_src = jnp.concatenate([o1[:1], o1[:-1]], axis=0)
        mb = is_bot & (growp == r1p)
        out[0][b] = jnp.where(mb, bot_src, o0)
        out[1][b] = jnp.where(mb, bot_src, o1)
    # Column positions are STATIC in plane space (no band offset on the
    # lane axis), so the select source is a single static column slice
    # broadcast across lanes - no full-plane lane-shift concats (the
    # expensive VPU direction; Mosaic cannot lower dynamic_update_slice
    # on values, so masked selects with a broadcast source are the
    # cheapest lowerable form). Rows keep sublane-shift concats (cheap).
    for a in (0, 1):
        src_l = out[a][0][:, c0p:c0p + 1]            # (Tp, 1) broadcast
        ml = is_left & (colp == c0p - 1)
        o1 = jnp.where(ml, src_l, out[a][1])
        o0 = jnp.where(ml, src_l, out[a][0])
        src_r = o1[:, c1p - 1:c1p]
        mr = is_right & (colp == c1p)
        out[a][0] = jnp.where(mr, src_r, o0)
        out[a][1] = jnp.where(mr, src_r, o1)
    return out


def _planes(ref):
    return [[ref[0, 0], ref[0, 1]], [ref[1, 0], ref[1, 1]]]


def _packed_chunk_kernel(c_ref, phi_hbm, u0_hbm, out_hbm, part_ref,
                         phi_scr, u0_scr, f_scr, sems,
                         *, steps, unroll, mu, nu, l1, l2, dt, eps, eta2):
    """Resident packed chunk: grid (steps,), unroll iterations/step."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        pltpu.make_async_copy(phi_hbm, phi_scr, sems.at[0]).start()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[1]).start()
        pltpu.make_async_copy(phi_hbm, phi_scr, sems.at[0]).wait()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[1]).wait()
        for a in (0, 1):
            for b in (0, 1):
                u = u0_scr[a, b]
                f_scr[a, b] = (-nu - l1 * (u - c_ref[0, 0]) ** 2
                               + l2 * (u - c_ref[0, 1]) ** 2)

    p = _planes(phi_scr)
    f = _planes(f_scr)
    prev = p
    for _ in range(unroll):
        prev = p
        p = _packed_iteration(p, f, mu, dt, eps, eta2)
    for a in (0, 1):
        for b in (0, 1):
            phi_scr[a, b] = p[a][b]

    @pl.when(k == steps - 1)
    def _():
        suh = 0.0
        sh = 0.0
        sd2 = 0.0
        fl = 0.0
        sad = 0.0
        for a in (0, 1):
            for b in (0, 1):
                h_eps = _heaviside(p[a][b], eps)
                d = p[a][b] - prev[a][b]
                suh += jnp.sum(u0_scr[a, b] * h_eps)
                sh += jnp.sum(h_eps)
                sd2 += jnp.sum(d * d)
                fl += jnp.sum(((p[a][b] >= 0) != (prev[a][b] >= 0))
                              .astype(d.dtype))
                sad += jnp.sum(jnp.abs(d))
        part_ref[0, 0] = suh
        part_ref[0, 1] = sh
        part_ref[0, 2] = sd2
        part_ref[0, 3] = fl
        part_ref[0, 4] = sad
        for t in range(5, 8):
            part_ref[0, t] = 0.0
        pltpu.make_async_copy(phi_scr, out_hbm, sems.at[0]).start()
        pltpu.make_async_copy(phi_scr, out_hbm, sems.at[0]).wait()


def _flat_chunk_kernel(c_ref, phi_hbm, u0_hbm, out_hbm, part_ref,
                       phi_scr, u0_scr, f_scr, sems,
                       *, steps, unroll, mu, nu, l1, l2, dt, eps, eta2):
    """Control variant: identical residency/structure, flat masked
    red-black updates (the banded kernel's inner loop)."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        pltpu.make_async_copy(phi_hbm, phi_scr, sems.at[0]).start()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[1]).start()
        pltpu.make_async_copy(phi_hbm, phi_scr, sems.at[0]).wait()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[1]).wait()
        u = u0_scr[:]
        f_scr[:] = (-nu - l1 * (u - c_ref[0, 0]) ** 2
                    + l2 * (u - c_ref[0, 1]) ** 2)

    phi_n = phi_scr[:]
    f = f_scr[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 1)
    red = ((rows + cols) % 2) == 0
    prev = phi_n
    for _ in range(unroll):
        prev = phi_n
        phi = phi_n
        g = (dt * eps / math.pi) / (eps * eps + phi * phi)
        phi_r = jnp.where(red, _update_all(phi, g, f, mu, dt, eps, eta2),
                          phi)
        phi_n = jnp.where(red, phi_r,
                          _update_all(phi_r, g, f, mu, dt, eps, eta2))
    phi_scr[:] = phi_n

    @pl.when(k == steps - 1)
    def _():
        h_eps = _heaviside(phi_n, eps)
        d = phi_n - prev
        part_ref[0, 0] = jnp.sum(u0_scr[:] * h_eps)
        part_ref[0, 1] = jnp.sum(h_eps)
        part_ref[0, 2] = jnp.sum(d * d)
        part_ref[0, 3] = jnp.sum(((phi_n >= 0) != (prev >= 0))
                                 .astype(d.dtype))
        part_ref[0, 4] = jnp.sum(jnp.abs(d))
        for t in range(5, 8):
            part_ref[0, t] = 0.0
        pltpu.make_async_copy(phi_scr, out_hbm, sems.at[0]).start()
        pltpu.make_async_copy(phi_scr, out_hbm, sems.at[0]).wait()


@functools.partial(jax.jit, static_argnames=("p", "k", "unroll", "packed",
                                             "interpret"))
def packed_chunk(phi, u0, c1, c2, p: CVParams, k: int = 8,
                 unroll: int = 1, packed: bool = True,
                 interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """k frozen-means red-black iterations, VMEM-resident, in the packed
    (packed=True) or flat (packed=False) layout. Same contract as
    ops/pallas_banded.banded_chunk: returns (phi_new, partials (8,))
    with the partials describing the LAST iteration's transition.
    """
    H, W = phi.shape
    if not supports_packed(H, W):
        raise ValueError(f"packed resident unsupported for {phi.shape}")
    if unroll < 1 or k % unroll:
        raise ValueError(f"unroll must divide k ({k=}, {unroll=})")
    steps = k // unroll
    c = jnp.stack([jnp.asarray(c1, phi.dtype),
                   jnp.asarray(c2, phi.dtype)]).reshape(1, 2)

    if packed:
        phi_in = _pack(phi)
        u0_in = _pack(u0)
        kern = _packed_chunk_kernel
        scr = (2, 2, H // 2, W // 2)
    else:
        phi_in = phi
        u0_in = u0
        kern = _flat_chunk_kernel
        scr = (H, W)

    kernel = functools.partial(
        kern, steps=steps, unroll=unroll, mu=p.mu, nu=p.nu,
        l1=p.lambda1, l2=p.lambda2, dt=p.dt, eps=p.eps, eta2=p.eta2)

    out, partials = pl.pallas_call(
        kernel,
        grid=(steps,),
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
            jax.ShapeDtypeStruct(phi_in.shape, phi.dtype),
            jax.ShapeDtypeStruct((1, 8), phi.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM(scr, phi.dtype),
            pltpu.VMEM(scr, phi.dtype),
            pltpu.VMEM(scr, phi.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c, phi_in, u0_in)
    if packed:
        out = _unpack(out)
    return out, partials[0]


# ---------------------------------------------------------------------------
# Packed BANDED kernel: the plane layout on the k-iterations-per-HBM-pass
# streaming scheme of ops/pallas_banded.py, for images beyond VMEM (the 4K
# headline). phi/u0 stay packed in HBM across the whole driver run; halos
# halve in packed rows (real reach 4k up / 2k down -> 2k / k packed).
# ---------------------------------------------------------------------------

_TILES_BANDED = 34  # measured flat-banded budget, counted in real-image bytes


def band_rows_packed(h: int, w: int, k: int):
    """(bp, upp, dnp) packed-row band geometry for k in-tile iterations."""
    upp = -(-2 * k // 8) * 8
    dnp = -(-k // 8) * 8
    per_real_row = w * 4 * _TILES_BANDED
    b_real = max(16, (_VMEM_LIMIT // per_real_row) // 16 * 16)
    bp = b_real // 2
    hp = h // 2
    bp = min(bp, max(8, ((hp - upp - dnp) // 8) * 8))
    return bp, upp, dnp


def supports_packed_banded(h: int, w: int, k: int) -> bool:
    if h % 16 or w % 256 or not (1 <= k <= 64):
        return False
    bp, upp, dnp = band_rows_packed(h, w, k)
    return bp + upp + dnp <= h // 2


def _packed_banded_kernel(c_ref, phi_hbm, u0_hbm, out_hbm, part_ref,
                          phi_scr, u0_scr, f_scr, work_scr, sems,
                          *, Hp, Wp, bp, k, upp, dnp, mu, nu, l1, l2, dt,
                          eps, eta2, unroll=1, cropp=None):
    """Grid (nbands, k // unroll) over packed (2, 2, Hp, Wp) arrays;
    the DMA pipeline of ops/pallas_banded._banded_kernel on plane tiles.

    cropp (static, plane coords, or None): sharded-canvas mode - apply
    the global-edge replica-rim refresh (_packed_rim) after every
    half-sweep, gated by the traced edge flags in c_ref slots 2..5, and
    restrict the partials to the crop window. The canvas origin parity
    is statically even in this mode (caller contract), so plane (a, b)
    always has global color (a + b) % 2 and the half-sweep pairing needs
    no parity input."""
    Tp = bp + upp + dnp
    i = pl.program_id(0)
    j = pl.program_id(1)
    nsteps = pl.num_programs(1)
    nbands = pl.num_programs(0)

    def window(ii):
        g0 = pl.multiple_of(jnp.minimum(ii * bp, Hp - bp), 8)
        s = pl.multiple_of(jnp.clip(g0 - upp, 0, Hp - Tp), 8)
        return g0, s

    def load_dmas(ii, slot):
        _, s = window(ii)
        return (pltpu.make_async_copy(
                    phi_hbm.at[:, :, pl.ds(s, Tp), :],
                    phi_scr.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    u0_hbm.at[:, :, pl.ds(s, Tp), :],
                    u0_scr.at[slot], sems.at[slot, 1]))

    def store_dma(ii, slot):
        g0, s = window(ii)
        o = pl.multiple_of(g0 - s, 8)
        return pltpu.make_async_copy(
            work_scr.at[slot].at[:, :, pl.ds(o, bp), :],
            out_hbm.at[:, :, pl.ds(g0, bp), :], sems.at[slot, 2])

    slot = i % 2

    @pl.when(j == 0)
    def _():
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

        @pl.when(i >= 2)
        def _():
            store_dma(i - 2, slot).wait()

        for a in (0, 1):
            for b in (0, 1):
                u = u0_scr[slot, a, b]
                f_scr[slot, a, b] = (-nu - l1 * (u - c_ref[0, 0]) ** 2
                                     + l2 * (u - c_ref[0, 1]) ** 2)
        work_scr[slot] = phi_scr[slot]

    p = [[work_scr[slot, 0, 0], work_scr[slot, 0, 1]],
         [work_scr[slot, 1, 0], work_scr[slot, 1, 1]]]
    f = [[f_scr[slot, 0, 0], f_scr[slot, 0, 1]],
         [f_scr[slot, 1, 0], f_scr[slot, 1, 1]]]
    if cropp is not None:
        _, s_rim = window(i)
        growp = (jax.lax.broadcasted_iota(jnp.int32, (Tp, Wp), 0) + s_rim)
        colp = jax.lax.broadcasted_iota(jnp.int32, (Tp, Wp), 1)
        flags = tuple(c_ref[0, 2 + t] > 0.5 for t in range(4))
    prev = p
    for _ in range(unroll):
        prev = p
        if cropp is None:
            p = _packed_iteration(p, f, mu, dt, eps, eta2)
        else:
            p = _packed_half_sweep(p, f, ((0, 0), (1, 1)), mu, dt, eps,
                                   eta2)
            p = _packed_rim(p, flags, cropp, growp, colp)
            p = _packed_half_sweep(p, f, ((0, 1), (1, 0)), mu, dt, eps,
                                   eta2)
            p = _packed_rim(p, flags, cropp, growp, colp)
    for a in (0, 1):
        for b in (0, 1):
            work_scr[slot, a, b] = p[a][b]

    @pl.when(j == nsteps - 1)
    def _():
        store_dma(i, slot).start()

        _, s = window(i)
        g0, _ = window(i)
        rows = jax.lax.broadcasted_iota(jnp.int32, (Tp, Wp), 0)
        grow = rows + s
        hi = jnp.minimum((i + 1) * bp, Hp)
        keep = (grow >= i * bp) & (grow < hi)
        if cropp is not None:
            cols = jax.lax.broadcasted_iota(jnp.int32, (Tp, Wp), 1)
            r0p, r1p, c0p, c1p = cropp
            keep = (keep & (grow >= r0p) & (grow < r1p)
                    & (cols >= c0p) & (cols < c1p))
        m = keep.astype(f_scr.dtype)
        suh = 0.0
        sh = 0.0
        sd2 = 0.0
        fl = 0.0
        sad = 0.0
        for a in (0, 1):
            for b in (0, 1):
                h_eps = _heaviside(p[a][b], eps)
                d = p[a][b] - prev[a][b]
                suh += jnp.sum(u0_scr[slot, a, b] * h_eps * m)
                sh += jnp.sum(h_eps * m)
                sd2 += jnp.sum(d * d * m)
                fl += jnp.sum(((p[a][b] >= 0) != (prev[a][b] >= 0))
                              .astype(d.dtype) * m)
                sad += jnp.sum(jnp.abs(d) * m)
        part_ref[i, 0] = suh
        part_ref[i, 1] = sh
        part_ref[i, 2] = sd2
        part_ref[i, 3] = fl
        part_ref[i, 4] = sad
        for t in range(5, 8):
            part_ref[i, t] = 0.0

        @pl.when(i == nbands - 1)
        def _():
            store_dma(i, slot).wait()

        @pl.when((i == nbands - 1) & (nbands >= 2))
        def _():
            store_dma(i - 1, (i - 1) % 2).wait()


def _packed_banded_kernel_fusej(c_ref, phi_hbm, u0_hbm, out_hbm, part_ref,
                                phi_scr, u0_scr, f_scr, work_scr, sems,
                                *, Hp, Wp, bp, k, upp, dnp, mu, nu, l1, l2,
                                dt, eps, eta2, unroll=1):
    """Fused-j variant of _packed_banded_kernel: grid (nbands,), all k
    in-band iterations inside one grid program via a fori_loop whose
    state round-trips through ``work_scr`` refs (tile-sized loop CARRIES
    are what makes Mosaic spill - the ref round-trip keeps the live set
    at one grid step's worth). This is the per-grid-step-overhead
    remover the packed layout needs: it cannot unroll (4-plane live
    sets spill at unroll >= 2, docs/BENCHMARKS.md round-3), so the
    unfused kernel pays the per-step fixed cost k times per band."""
    Tp = bp + upp + dnp
    i = pl.program_id(0)
    nbands = pl.num_programs(0)

    def window(ii):
        g0 = pl.multiple_of(jnp.minimum(ii * bp, Hp - bp), 8)
        s = pl.multiple_of(jnp.clip(g0 - upp, 0, Hp - Tp), 8)
        return g0, s

    def load_dmas(ii, slot):
        _, s = window(ii)
        return (pltpu.make_async_copy(
                    phi_hbm.at[:, :, pl.ds(s, Tp), :],
                    phi_scr.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    u0_hbm.at[:, :, pl.ds(s, Tp), :],
                    u0_scr.at[slot], sems.at[slot, 1]))

    def store_dma(ii, slot):
        g0, s = window(ii)
        o = pl.multiple_of(g0 - s, 8)
        return pltpu.make_async_copy(
            work_scr.at[slot].at[:, :, pl.ds(o, bp), :],
            out_hbm.at[:, :, pl.ds(g0, bp), :], sems.at[slot, 2])

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

    @pl.when(i >= 2)
    def _():
        store_dma(i - 2, slot).wait()

    for a in (0, 1):
        for b in (0, 1):
            u = u0_scr[slot, a, b]
            f_scr[slot, a, b] = (-nu - l1 * (u - c_ref[0, 0]) ** 2
                                 + l2 * (u - c_ref[0, 1]) ** 2)
    work_scr[slot] = phi_scr[slot]

    def step():
        p = [[work_scr[slot, 0, 0], work_scr[slot, 0, 1]],
             [work_scr[slot, 1, 0], work_scr[slot, 1, 1]]]
        f = [[f_scr[slot, 0, 0], f_scr[slot, 0, 1]],
             [f_scr[slot, 1, 0], f_scr[slot, 1, 1]]]
        prev = p
        for _ in range(unroll):
            prev = p
            p = _packed_iteration(p, f, mu, dt, eps, eta2)
        return p, prev

    def body(jj, carry):
        p, _ = step()
        for a in (0, 1):
            for b in (0, 1):
                work_scr[slot, a, b] = p[a][b]
        return carry

    jax.lax.fori_loop(0, k // unroll - 1, body, 0, unroll=False)
    p, prev = step()
    for a in (0, 1):
        for b in (0, 1):
            work_scr[slot, a, b] = p[a][b]

    store_dma(i, slot).start()

    _, s = window(i)
    rows = jax.lax.broadcasted_iota(jnp.int32, (Tp, Wp), 0)
    grow = rows + s
    hi = jnp.minimum((i + 1) * bp, Hp)
    m = ((grow >= i * bp) & (grow < hi)).astype(f_scr.dtype)
    suh = 0.0
    sh = 0.0
    sd2 = 0.0
    fl = 0.0
    sad = 0.0
    for a in (0, 1):
        for b in (0, 1):
            h_eps = _heaviside(p[a][b], eps)
            d = p[a][b] - prev[a][b]
            suh += jnp.sum(u0_scr[slot, a, b] * h_eps * m)
            sh += jnp.sum(h_eps * m)
            sd2 += jnp.sum(d * d * m)
            fl += jnp.sum(((p[a][b] >= 0) != (prev[a][b] >= 0))
                          .astype(d.dtype) * m)
            sad += jnp.sum(jnp.abs(d) * m)
    part_ref[i, 0] = suh
    part_ref[i, 1] = sh
    part_ref[i, 2] = sd2
    part_ref[i, 3] = fl
    part_ref[i, 4] = sad
    for t in range(5, 8):
        part_ref[i, t] = 0.0

    @pl.when(i == nbands - 1)
    def _():
        store_dma(i, slot).wait()

    @pl.when((i == nbands - 1) & (nbands >= 2))
    def _():
        store_dma(i - 1, (i - 1) % 2).wait()


@functools.partial(jax.jit, static_argnames=("p", "k", "unroll", "fuse",
                                             "interpret"))
def packed_banded_chunk(phi_planes, u0_planes, c1, c2, p: CVParams,
                        k: int = 8, unroll: int = 1, fuse: bool = False,
                        interpret: bool = False
                        ) -> Tuple[jax.Array, jax.Array]:
    """k frozen-means iterations on PRE-PACKED (2, 2, H/2, W/2) planes in
    one HBM pass (banded_chunk's contract on the packed layout; pack
    once per run with _pack/_unpack in the driver)."""
    _, _, Hp, Wp = phi_planes.shape
    H, W = 2 * Hp, 2 * Wp
    if not supports_packed_banded(H, W, k):
        raise ValueError(f"packed banded unsupported for {(H, W)}, k={k}")
    if unroll < 1 or k % unroll:
        raise ValueError(f"unroll must divide k ({k=}, {unroll=})")
    bp, upp, dnp = band_rows_packed(H, W, k)
    nbands = pl.cdiv(Hp, bp)
    c = jnp.stack([jnp.asarray(c1, phi_planes.dtype),
                   jnp.asarray(c2, phi_planes.dtype)]).reshape(1, 2)

    kern = _packed_banded_kernel_fusej if fuse else _packed_banded_kernel
    kernel = functools.partial(
        kern, Hp=Hp, Wp=Wp, bp=bp, k=k, upp=upp, dnp=dnp,
        mu=p.mu, nu=p.nu, l1=p.lambda1, l2=p.lambda2, dt=p.dt, eps=p.eps,
        eta2=p.eta2, unroll=unroll)

    Tp = bp + upp + dnp
    out, partials = pl.pallas_call(
        kernel,
        grid=(nbands,) if fuse else (nbands, k // unroll),
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
            jax.ShapeDtypeStruct(phi_planes.shape, phi_planes.dtype),
            jax.ShapeDtypeStruct((nbands, 8), phi_planes.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, 2, Tp, Wp), phi_planes.dtype),  # phi tiles
            pltpu.VMEM((2, 2, 2, Tp, Wp), phi_planes.dtype),  # u0 tiles
            pltpu.VMEM((2, 2, 2, Tp, Wp), phi_planes.dtype),  # data term
            pltpu.VMEM((2, 2, 2, Tp, Wp), phi_planes.dtype),  # iterate
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) if fuse
            else ("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c, phi_planes, u0_planes)
    return out, jnp.sum(partials, axis=0)


@functools.partial(jax.jit, static_argnames=("p", "k", "crop", "unroll",
                                             "interpret"))
def packed_banded_chunk_sharded(canvas_planes, u0_canvas_planes, c1, c2,
                                p: CVParams, k: int, edges, crop,
                                unroll: int = 1, interpret: bool = False
                                ) -> Tuple[jax.Array, jax.Array]:
    """k frozen-means iterations on a PRE-PACKED halo-padded shard
    canvas: the packed twin of ops/pallas_banded.banded_chunk_sharded
    (parallel/sharded._sharded_chunk_pallas's kernel when the per-shard
    geometry clears the packed auto rule).

    Caller contract (enforced): the canvas origin sits on an EVEN global
    (row, col) — guaranteed by even shard dims h, w and the even halo
    depth D = 4*comm_k — so the red-black parity of every plane is
    STATIC (plane (a, b) has global color (a + b) % 2; no traced parity
    input), and ``crop`` = (r0, r1, c0, c1) canvas coordinates are all
    even. ``edges``: traced (4,) [top, bottom, left, right] global-edge
    flags; replica rims on those sides are refreshed after every
    half-sweep (_packed_rim). Returns (canvas_planes_new, partials (8,))
    restricted to the crop window; the caller unpacks/crops the planes
    and psums the partials.
    """
    _, _, Hp, Wp = canvas_planes.shape
    H, W = 2 * Hp, 2 * Wp
    if not supports_packed_banded(H, W, k):
        raise ValueError(f"packed sharded banded unsupported for "
                         f"canvas {(H, W)}, k={k}")
    if u0_canvas_planes.shape != canvas_planes.shape:
        raise ValueError(f"u0 planes {u0_canvas_planes.shape} vs phi "
                         f"planes {canvas_planes.shape}")
    if any(c % 2 for c in crop):
        raise ValueError(f"packed sharded crop must be even, got {crop}")
    if unroll < 1 or k % unroll:
        raise ValueError(f"unroll must divide k ({k=}, {unroll=})")
    cropp = tuple(c // 2 for c in crop)
    bp, upp, dnp = band_rows_packed(H, W, k)
    nbands = pl.cdiv(Hp, bp)
    dt_ = canvas_planes.dtype
    c = jnp.concatenate([
        jnp.stack([jnp.asarray(c1, dt_), jnp.asarray(c2, dt_)]),
        jnp.asarray(edges, dt_), jnp.zeros((2,), dt_)]).reshape(1, 8)

    kernel = functools.partial(
        _packed_banded_kernel, Hp=Hp, Wp=Wp, bp=bp, k=k, upp=upp, dnp=dnp,
        mu=p.mu, nu=p.nu, l1=p.lambda1, l2=p.lambda2, dt=p.dt, eps=p.eps,
        eta2=p.eta2, unroll=unroll, cropp=cropp)

    Tp = bp + upp + dnp
    out, partials = pl.pallas_call(
        kernel,
        grid=(nbands, k // unroll),
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
            jax.ShapeDtypeStruct(canvas_planes.shape, dt_),
            jax.ShapeDtypeStruct((nbands, 8), dt_),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, 2, Tp, Wp), dt_),  # phi tiles
            pltpu.VMEM((2, 2, 2, Tp, Wp), dt_),  # u0 tiles
            pltpu.VMEM((2, 2, 2, Tp, Wp), dt_),  # data term
            pltpu.VMEM((2, 2, 2, Tp, Wp), dt_),  # iterate
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c, canvas_planes, u0_canvas_planes)
    return out, jnp.sum(partials, axis=0)


# ---------------------------------------------------------------------------
# Packed MULTICHANNEL banded kernel: the parity-plane layout on the
# k-iterations-per-HBM-pass scheme with a (C, H, W) channels-first image
# (ops/pallas_banded._banded_mc_kernel's contract). The level set stays
# scalar; the frozen data term averages per-channel weighted squared
# distances once per band; partials carry per-channel s_uH sums in the
# 16-slot mc layout.
# ---------------------------------------------------------------------------


def band_rows_packed_mc(h: int, w: int, k: int, c: int):
    """(bp, upp, dnp) packed-row band geometry for the mc kernel: the u0
    scratch holds C plane sets per buffer instead of 1 (same channel
    surcharge as ops/pallas_banded.band_rows_banded_mc)."""
    upp = -(-2 * k // 8) * 8
    dnp = -(-k // 8) * 8
    per_real_row = w * 4 * (_TILES_BANDED + 2 * c)
    b_real = max(16, (_VMEM_LIMIT // per_real_row) // 16 * 16)
    bp = b_real // 2
    hp = h // 2
    bp = min(bp, max(8, ((hp - upp - dnp) // 8) * 8))
    return bp, upp, dnp


def supports_packed_banded_mc(h: int, w: int, k: int, c: int) -> bool:
    if h % 16 or w % 256 or not (1 <= k <= 64) or not (1 <= c <= 8):
        return False
    bp, upp, dnp = band_rows_packed_mc(h, w, k, c)
    return bp + upp + dnp <= h // 2


def _packed_banded_mc_kernel(c_ref, phi_hbm, u0_hbm, out_hbm, part_ref,
                             phi_scr, u0_scr, f_scr, work_scr, sems,
                             *, Hp, Wp, C, bp, k, upp, dnp, mu, nu, l1, l2,
                             dt, eps, eta2, unroll=1):
    """Grid (nbands, k // unroll) over packed phi (2, 2, Hp, Wp) and u0
    (C, 2, 2, Hp, Wp); c_ref (SMEM (1, 2C + 8)) as in
    ops/pallas_banded._banded_mc_kernel (parity/edge slots unused -
    the packed banded kernel runs unsharded)."""
    Tp = bp + upp + dnp
    i = pl.program_id(0)
    j = pl.program_id(1)
    nsteps = pl.num_programs(1)
    nbands = pl.num_programs(0)

    def window(ii):
        g0 = pl.multiple_of(jnp.minimum(ii * bp, Hp - bp), 8)
        s = pl.multiple_of(jnp.clip(g0 - upp, 0, Hp - Tp), 8)
        return g0, s

    def load_dmas(ii, slot):
        _, s = window(ii)
        return (pltpu.make_async_copy(
                    phi_hbm.at[:, :, pl.ds(s, Tp), :],
                    phi_scr.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    u0_hbm.at[:, :, :, pl.ds(s, Tp), :],
                    u0_scr.at[slot], sems.at[slot, 1]))

    def store_dma(ii, slot):
        g0, s = window(ii)
        o = pl.multiple_of(g0 - s, 8)
        return pltpu.make_async_copy(
            work_scr.at[slot].at[:, :, pl.ds(o, bp), :],
            out_hbm.at[:, :, pl.ds(g0, bp), :], sems.at[slot, 2])

    slot = i % 2

    @pl.when(j == 0)
    def _():
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

        @pl.when(i >= 2)
        def _():
            store_dma(i - 2, slot).wait()

        for a in (0, 1):
            for b in (0, 1):
                f = jnp.full((Tp, Wp), -nu, dtype=phi_scr.dtype)
                for ch in range(C):
                    u = u0_scr[slot, ch, a, b]
                    d1 = u - c_ref[0, ch]
                    d2 = u - c_ref[0, C + ch]
                    f = (f + (l2[ch] / C) * (d2 * d2)
                         - (l1[ch] / C) * (d1 * d1))
                f_scr[slot, a, b] = f
        work_scr[slot] = phi_scr[slot]

    p = [[work_scr[slot, 0, 0], work_scr[slot, 0, 1]],
         [work_scr[slot, 1, 0], work_scr[slot, 1, 1]]]
    f = [[f_scr[slot, 0, 0], f_scr[slot, 0, 1]],
         [f_scr[slot, 1, 0], f_scr[slot, 1, 1]]]
    prev = p
    for _ in range(unroll):
        prev = p
        p = _packed_iteration(p, f, mu, dt, eps, eta2)
    for a in (0, 1):
        for b in (0, 1):
            work_scr[slot, a, b] = p[a][b]

    @pl.when(j == nsteps - 1)
    def _():
        store_dma(i, slot).start()

        _, s = window(i)
        rows = jax.lax.broadcasted_iota(jnp.int32, (Tp, Wp), 0)
        grow = rows + s
        hi = jnp.minimum((i + 1) * bp, Hp)
        m = ((grow >= i * bp) & (grow < hi)).astype(f_scr.dtype)
        suh = [0.0] * C
        sh = 0.0
        sd2 = 0.0
        fl = 0.0
        sad = 0.0
        for a in (0, 1):
            for b in (0, 1):
                h_eps = _heaviside(p[a][b], eps)
                hm = h_eps * m
                d = p[a][b] - prev[a][b]
                for ch in range(C):
                    suh[ch] += jnp.sum(u0_scr[slot, ch, a, b] * hm)
                sh += jnp.sum(hm)
                sd2 += jnp.sum(d * d * m)
                fl += jnp.sum(((p[a][b] >= 0) != (prev[a][b] >= 0))
                              .astype(d.dtype) * m)
                sad += jnp.sum(jnp.abs(d) * m)
        for ch in range(C):
            part_ref[i, ch] = suh[ch]
        part_ref[i, C] = sh
        part_ref[i, C + 1] = sd2
        part_ref[i, C + 2] = fl
        part_ref[i, C + 3] = sad
        for t in range(C + 4, 16):
            part_ref[i, t] = 0.0

        @pl.when(i == nbands - 1)
        def _():
            store_dma(i, slot).wait()

        @pl.when((i == nbands - 1) & (nbands >= 2))
        def _():
            store_dma(i - 1, (i - 1) % 2).wait()


def _packed_banded_mc_kernel_fusej(c_ref, phi_hbm, u0_hbm, out_hbm,
                                   part_ref, phi_scr, u0_scr, f_scr,
                                   work_scr, sems,
                                   *, Hp, Wp, C, bp, k, upp, dnp, mu, nu,
                                   l1, l2, dt, eps, eta2, unroll=1):
    """Fused-j variant of _packed_banded_mc_kernel: grid (nbands,), all
    k in-band iterations inside one grid program via a fori_loop whose
    state round-trips through ``work_scr`` refs (the scalar
    _packed_banded_kernel_fusej scheme — tile-sized loop carries are
    what makes Mosaic spill; the ref round-trip keeps the live set at
    one step's worth). Built after the 2026-08-19 4K sweep showed
    packed unroll pays only THROUGH fused-j; the mc kernel had never
    been measured fused (round-3 A/B predates the fusej form)."""
    Tp = bp + upp + dnp
    i = pl.program_id(0)
    nbands = pl.num_programs(0)

    def window(ii):
        g0 = pl.multiple_of(jnp.minimum(ii * bp, Hp - bp), 8)
        s = pl.multiple_of(jnp.clip(g0 - upp, 0, Hp - Tp), 8)
        return g0, s

    def load_dmas(ii, slot):
        _, s = window(ii)
        return (pltpu.make_async_copy(
                    phi_hbm.at[:, :, pl.ds(s, Tp), :],
                    phi_scr.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    u0_hbm.at[:, :, :, pl.ds(s, Tp), :],
                    u0_scr.at[slot], sems.at[slot, 1]))

    def store_dma(ii, slot):
        g0, s = window(ii)
        o = pl.multiple_of(g0 - s, 8)
        return pltpu.make_async_copy(
            work_scr.at[slot].at[:, :, pl.ds(o, bp), :],
            out_hbm.at[:, :, pl.ds(g0, bp), :], sems.at[slot, 2])

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

    @pl.when(i >= 2)
    def _():
        store_dma(i - 2, slot).wait()

    for a in (0, 1):
        for b in (0, 1):
            f = jnp.full((Tp, Wp), -nu, dtype=phi_scr.dtype)
            for ch in range(C):
                u = u0_scr[slot, ch, a, b]
                d1 = u - c_ref[0, ch]
                d2 = u - c_ref[0, C + ch]
                f = (f + (l2[ch] / C) * (d2 * d2)
                     - (l1[ch] / C) * (d1 * d1))
            f_scr[slot, a, b] = f
    work_scr[slot] = phi_scr[slot]

    def step():
        p = [[work_scr[slot, 0, 0], work_scr[slot, 0, 1]],
             [work_scr[slot, 1, 0], work_scr[slot, 1, 1]]]
        f = [[f_scr[slot, 0, 0], f_scr[slot, 0, 1]],
             [f_scr[slot, 1, 0], f_scr[slot, 1, 1]]]
        prev = p
        for _ in range(unroll):
            prev = p
            p = _packed_iteration(p, f, mu, dt, eps, eta2)
        return p, prev

    def body(jj, carry):
        p, _ = step()
        for a in (0, 1):
            for b in (0, 1):
                work_scr[slot, a, b] = p[a][b]
        return carry

    jax.lax.fori_loop(0, k // unroll - 1, body, 0, unroll=False)
    p, prev = step()
    for a in (0, 1):
        for b in (0, 1):
            work_scr[slot, a, b] = p[a][b]

    store_dma(i, slot).start()

    _, s = window(i)
    rows = jax.lax.broadcasted_iota(jnp.int32, (Tp, Wp), 0)
    grow = rows + s
    hi = jnp.minimum((i + 1) * bp, Hp)
    m = ((grow >= i * bp) & (grow < hi)).astype(f_scr.dtype)
    suh = [0.0] * C
    sh = 0.0
    sd2 = 0.0
    fl = 0.0
    sad = 0.0
    for a in (0, 1):
        for b in (0, 1):
            h_eps = _heaviside(p[a][b], eps)
            hm = h_eps * m
            d = p[a][b] - prev[a][b]
            for ch in range(C):
                suh[ch] += jnp.sum(u0_scr[slot, ch, a, b] * hm)
            sh += jnp.sum(hm)
            sd2 += jnp.sum(d * d * m)
            fl += jnp.sum(((p[a][b] >= 0) != (prev[a][b] >= 0))
                          .astype(d.dtype) * m)
            sad += jnp.sum(jnp.abs(d) * m)
    for ch in range(C):
        part_ref[i, ch] = suh[ch]
    part_ref[i, C] = sh
    part_ref[i, C + 1] = sd2
    part_ref[i, C + 2] = fl
    part_ref[i, C + 3] = sad
    for t in range(C + 4, 16):
        part_ref[i, t] = 0.0

    @pl.when(i == nbands - 1)
    def _():
        store_dma(i, slot).wait()

    @pl.when((i == nbands - 1) & (nbands >= 2))
    def _():
        store_dma(i - 1, (i - 1) % 2).wait()


@functools.partial(jax.jit, static_argnames=("p", "k", "unroll", "fuse",
                                             "lambda1", "lambda2",
                                             "interpret"))
def packed_banded_chunk_mc(phi_planes, u0_planes, c1, c2, p: CVParams,
                           k: int = 8, unroll: int = 1,
                           fuse: bool = False,
                           lambda1=None, lambda2=None,
                           interpret: bool = False
                           ) -> Tuple[jax.Array, jax.Array]:
    """k frozen-means red-black iterations on PRE-PACKED planes: phi
    (2, 2, H/2, W/2), u0 (C, 2, 2, H/2, W/2) channels-first. Contract of
    ops/pallas_banded.banded_chunk_mc: c1, c2 (C,) means; returns
    (phi_planes_new, partials (16,)) = [s_uH per channel..., s_H,
    s_dphi2, flips, s_absdphi, 0...] of the last iteration's transition.
    fuse=True collapses the j grid into an in-kernel fori_loop
    (_packed_banded_mc_kernel_fusej), bitwise the same program.
    """
    from .pallas_banded import _banded_mc_smem_row

    C = u0_planes.shape[0]
    _, _, Hp, Wp = phi_planes.shape
    H, W = 2 * Hp, 2 * Wp
    if u0_planes.shape[1:] != phi_planes.shape:
        raise ValueError(f"u0 planes {u0_planes.shape} vs phi planes "
                         f"{phi_planes.shape}")
    if not supports_packed_banded_mc(H, W, k, C):
        raise ValueError(f"packed banded mc unsupported for {(H, W, C)}, "
                         f"k={k}")
    if unroll < 1 or k % unroll:
        raise ValueError(f"unroll must divide k ({k=}, {unroll=})")
    l1, l2 = p.channel_lambdas(C, lambda1, lambda2)
    bp, upp, dnp = band_rows_packed_mc(H, W, k, C)
    nbands = pl.cdiv(Hp, bp)
    c = _banded_mc_smem_row(c1, c2, C, phi_planes.dtype)

    kern = (_packed_banded_mc_kernel_fusej if fuse
            else _packed_banded_mc_kernel)
    kernel = functools.partial(
        kern, Hp=Hp, Wp=Wp, C=C, bp=bp, k=k, upp=upp,
        dnp=dnp, mu=p.mu, nu=p.nu, l1=l1, l2=l2, dt=p.dt, eps=p.eps,
        eta2=p.eta2, unroll=unroll)

    Tp = bp + upp + dnp
    out, partials = pl.pallas_call(
        kernel,
        grid=(nbands,) if fuse else (nbands, k // unroll),
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
            jax.ShapeDtypeStruct(phi_planes.shape, phi_planes.dtype),
            jax.ShapeDtypeStruct((nbands, 16), phi_planes.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, 2, Tp, Wp), phi_planes.dtype),     # phi
            pltpu.VMEM((2, C, 2, 2, Tp, Wp), phi_planes.dtype),  # u0
            pltpu.VMEM((2, 2, 2, Tp, Wp), phi_planes.dtype),     # data term
            pltpu.VMEM((2, 2, 2, Tp, Wp), phi_planes.dtype),     # iterate
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) if fuse
            else ("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c, phi_planes, u0_planes)
    return out, jnp.sum(partials, axis=0)


# ---------------------------------------------------------------------------
# Packed 4-phase (mp2) VMEM-resident kernel: the parity-plane layout on the
# fully fused coupled iteration of ops/pallas_multiphase.py. Two level sets
# -> four half-sweeps per iteration, so the mask-free/half-area-num-den win
# applies twice; means/weights/data terms are full-area either way.
# ---------------------------------------------------------------------------

_ARRAYS_MP2_RESIDENT = 26


def supports_packed_mp2_resident(h: int, w: int) -> bool:
    return (h % 16 == 0 and w % 256 == 0
            and h * w * 4 * _ARRAYS_MP2_RESIDENT <= _VMEM_LIMIT)


def _plane_map(fn, *plane_grids):
    return [[fn(*(g[a][b] for g in plane_grids)) for b in (0, 1)]
            for a in (0, 1)]


def _packed_mp2_iteration(p0, p1, u, c, mu, nu, dt, eps, eta2):
    """One coupled 4-phase iteration on parity planes; returns
    (new0, new1). Mirrors pallas_multiphase._coupled_iteration: phi_1's
    data term reads phi_0's NEW Heaviside (pointwise per plane)."""
    d = [_plane_map(lambda uu, s=s: (uu - c[s]) ** 2, u) for s in range(4)]

    h1 = _plane_map(lambda x: _heaviside(x, eps), p1)
    f0 = _plane_map(
        lambda hh, d0, d1, d2, d3:
            -nu + (1.0 - hh) * (d0 - d1) + hh * (d2 - d3),
        h1, d[0], d[1], d[2], d[3])
    p0 = _packed_half_sweep(p0, f0, ((0, 0), (1, 1)), mu, dt, eps, eta2)
    new0 = _packed_half_sweep(p0, f0, ((0, 1), (1, 0)), mu, dt, eps, eta2)

    h0n = _plane_map(lambda x: _heaviside(x, eps), new0)
    f1 = _plane_map(
        lambda hh, d0, d1, d2, d3:
            -nu + (1.0 - hh) * (d0 - d2) + hh * (d1 - d3),
        h0n, d[0], d[1], d[2], d[3])
    p1 = _packed_half_sweep(p1, f1, ((0, 0), (1, 1)), mu, dt, eps, eta2)
    new1 = _packed_half_sweep(p1, f1, ((0, 1), (1, 0)), mu, dt, eps, eta2)
    return new0, new1


def _packed_mp2_resident_kernel(phis_hbm, u0_hbm, out_hbm, part_ref,
                                p0_scr, p1_scr, u0_scr, sems,
                                *, steps, unroll, mu, nu, dt, eps, eta2):
    """Resident packed 4-phase iterations; in-kernel exact per-iteration
    phase means (the mp2_resident_iterations contract on planes)."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        pltpu.make_async_copy(phis_hbm.at[0], p0_scr, sems.at[0]).start()
        pltpu.make_async_copy(phis_hbm.at[1], p1_scr, sems.at[1]).start()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[2]).start()
        pltpu.make_async_copy(phis_hbm.at[0], p0_scr, sems.at[0]).wait()
        pltpu.make_async_copy(phis_hbm.at[1], p1_scr, sems.at[1]).wait()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[2]).wait()

    new0 = _planes(p0_scr)
    new1 = _planes(p1_scr)
    u = _planes(u0_scr)
    tiny = jnp.asarray(1e-30, u0_scr.dtype)

    for _ in range(unroll):
        phi0, phi1 = new0, new1
        # exact per-iteration phase means of the resident planes
        h0 = _plane_map(lambda x: _heaviside(x, eps), phi0)
        h1 = _plane_map(lambda x: _heaviside(x, eps), phi1)
        c = []
        for s in range(4):
            num = 0.0
            den = 0.0
            for a in (0, 1):
                for b in (0, 1):
                    w0 = h0[a][b] if s & 1 else (1.0 - h0[a][b])
                    w1 = h1[a][b] if s & 2 else (1.0 - h1[a][b])
                    w = w0 * w1
                    num += jnp.sum(u[a][b] * w)
                    den += jnp.sum(w)
            c.append(num / jnp.maximum(den, tiny))

        new0, new1 = _packed_mp2_iteration(phi0, phi1, u, c, mu, nu, dt,
                                           eps, eta2)

    for a in (0, 1):
        for b in (0, 1):
            p0_scr[a, b] = new0[a][b]
            p1_scr[a, b] = new1[a][b]

    fl = 0.0
    sd2 = 0.0
    for a in (0, 1):
        for b in (0, 1):
            ln = ((new0[a][b] >= 0).astype(jnp.int32)
                  + 2 * (new1[a][b] >= 0).astype(jnp.int32))
            lo = ((phi0[a][b] >= 0).astype(jnp.int32)
                  + 2 * (phi1[a][b] >= 0).astype(jnp.int32))
            fl += jnp.sum((ln != lo).astype(u0_scr.dtype))
            d0 = new0[a][b] - phi0[a][b]
            d1 = new1[a][b] - phi1[a][b]
            sd2 += jnp.sum(d0 * d0 + d1 * d1)
    part_ref[k, 0] = fl
    part_ref[k, 1] = sd2
    for t in range(2, 8):
        part_ref[k, t] = 0.0

    @pl.when(k == steps - 1)
    def _():
        pltpu.make_async_copy(p0_scr, out_hbm.at[0], sems.at[0]).start()
        pltpu.make_async_copy(p1_scr, out_hbm.at[1], sems.at[1]).start()
        pltpu.make_async_copy(p0_scr, out_hbm.at[0], sems.at[0]).wait()
        pltpu.make_async_copy(p1_scr, out_hbm.at[1], sems.at[1]).wait()


@functools.partial(jax.jit, static_argnames=("p", "iters", "unroll",
                                             "interpret"))
def packed_mp2_resident_iterations(phis, u0, p: CVParams, iters: int,
                                   unroll: int = 1,
                                   interpret: bool = False
                                   ) -> Tuple[jax.Array, jax.Array]:
    """Run ``iters`` 4-phase iterations VMEM-resident on parity planes.

    Same contract as pallas_multiphase.mp2_resident_iterations:
    phis (2, H, W) in/out (packing is internal), partials
    (iters // unroll, 8) rows [label_flips, s_dphi2, 0...].
    """
    M, H, W = phis.shape
    if M != 2:
        raise ValueError("mp2 kernel is specialized to M = 2 level sets")
    if u0.shape != (H, W):
        raise ValueError(f"u0 {u0.shape} vs phis {(H, W)}")
    if not supports_packed_mp2_resident(H, W):
        raise ValueError(f"packed mp2 resident unsupported for {(H, W)}")
    if iters < 1 or unroll < 1 or iters % unroll:
        raise ValueError(f"unroll must divide iters ({iters=}, {unroll=})")
    steps = iters // unroll

    phis_in = jnp.stack([_pack(phis[0]), _pack(phis[1])])
    u0_in = _pack(u0)

    kernel = functools.partial(
        _packed_mp2_resident_kernel, steps=steps, unroll=unroll, mu=p.mu,
        nu=p.nu, dt=p.dt, eps=p.eps, eta2=p.eta2)

    scr = (2, 2, H // 2, W // 2)
    out, partials = pl.pallas_call(
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
            jax.ShapeDtypeStruct(phis_in.shape, phis.dtype),
            jax.ShapeDtypeStruct((steps, 8), phis.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM(scr, phis.dtype),
            pltpu.VMEM(scr, phis.dtype),
            pltpu.VMEM(scr, phis.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(phis_in, u0_in)
    return jnp.stack([_unpack(out[0]), _unpack(out[1])]), partials


# ---------------------------------------------------------------------------
# Packed EXACT-MEANS resident kernels: the parity-plane layout on
# ops/pallas_resident.py's per-iteration-means scheme (scalar, multichannel,
# frame stacks). Contracts mirror the flat kernels row-for-row so the
# drivers can switch transparently.
# ---------------------------------------------------------------------------

def _plane_sum(planes):
    return sum(jnp.sum(planes[a][b]) for a in (0, 1) for b in (0, 1))


def _packed_exact_iteration(p, f, mu, dt, eps, eta2):
    p = _packed_half_sweep(p, f, ((0, 0), (1, 1)), mu, dt, eps, eta2)
    return _packed_half_sweep(p, f, ((0, 1), (1, 0)), mu, dt, eps, eta2)


def _packed_resident_kernel(phi_hbm, u0_hbm, out_hbm, part_ref,
                            phi_scr, u0_scr, sems,
                            *, steps, unroll, mu, nu, l1, l2, dt, eps,
                            eta2, n_pix):
    """Scalar exact-means resident iterations on planes (grid (steps,);
    the _kernel contract of ops/pallas_resident.py)."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        pltpu.make_async_copy(phi_hbm, phi_scr, sems.at[0]).start()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[1]).start()
        pltpu.make_async_copy(phi_hbm, phi_scr, sems.at[0]).wait()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[1]).wait()

    p = _planes(phi_scr)
    u = _planes(u0_scr)
    sum_u = _plane_sum(u)
    tiny = jnp.asarray(1e-30, u0_scr.dtype)

    for _ in range(unroll):
        phi = p
        h = _plane_map(lambda x: _heaviside(x, eps), phi)
        s_uh = sum(jnp.sum(u[a][b] * h[a][b])
                   for a in (0, 1) for b in (0, 1))
        s_h = _plane_sum(h)
        c1 = s_uh / jnp.maximum(s_h, tiny)
        c2 = (sum_u - s_uh) / jnp.maximum(n_pix - s_h, tiny)
        f = _plane_map(
            lambda uu: -nu - l1 * (uu - c1) ** 2 + l2 * (uu - c2) ** 2, u)
        p = _packed_exact_iteration(phi, f, mu, dt, eps, eta2)

    for a in (0, 1):
        for b in (0, 1):
            phi_scr[a, b] = p[a][b]

    sd2 = 0.0
    fl = 0.0
    sad = 0.0
    for a in (0, 1):
        for b in (0, 1):
            d = p[a][b] - phi[a][b]
            sd2 += jnp.sum(d * d)
            fl += jnp.sum(((p[a][b] >= 0) != (phi[a][b] >= 0))
                          .astype(d.dtype))
            sad += jnp.sum(jnp.abs(d))
    part_ref[k, 0] = s_uh
    part_ref[k, 1] = s_h
    part_ref[k, 2] = sd2
    part_ref[k, 3] = fl
    part_ref[k, 4] = sad
    for t in range(5, 8):
        part_ref[k, t] = 0.0

    @pl.when(k == steps - 1)
    def _():
        pltpu.make_async_copy(phi_scr, out_hbm, sems.at[2]).start()
        pltpu.make_async_copy(phi_scr, out_hbm, sems.at[2]).wait()


def _packed_resident_batch_kernel(phi_hbm, u0_hbm, out_hbm, part_ref,
                                  phi_scr, u0_scr, sems,
                                  *, steps, unroll, mu, nu, l1, l2, dt,
                                  eps, eta2, n_pix):
    """Batched variant: grid (N, steps); per-frame planes; partials keep
    each frame's LAST iteration row (the _kernel_batch contract)."""
    fr = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        pltpu.make_async_copy(phi_hbm.at[fr], phi_scr, sems.at[0]).start()
        pltpu.make_async_copy(u0_hbm.at[fr], u0_scr, sems.at[1]).start()
        pltpu.make_async_copy(phi_hbm.at[fr], phi_scr, sems.at[0]).wait()
        pltpu.make_async_copy(u0_hbm.at[fr], u0_scr, sems.at[1]).wait()

    p = _planes(phi_scr)
    u = _planes(u0_scr)
    sum_u = _plane_sum(u)
    tiny = jnp.asarray(1e-30, u0_scr.dtype)

    for _ in range(unroll):
        phi = p
        h = _plane_map(lambda x: _heaviside(x, eps), phi)
        s_uh = sum(jnp.sum(u[a][b] * h[a][b])
                   for a in (0, 1) for b in (0, 1))
        s_h = _plane_sum(h)
        c1 = s_uh / jnp.maximum(s_h, tiny)
        c2 = (sum_u - s_uh) / jnp.maximum(n_pix - s_h, tiny)
        f = _plane_map(
            lambda uu: -nu - l1 * (uu - c1) ** 2 + l2 * (uu - c2) ** 2, u)
        p = _packed_exact_iteration(phi, f, mu, dt, eps, eta2)

    for a in (0, 1):
        for b in (0, 1):
            phi_scr[a, b] = p[a][b]

    @pl.when(k == steps - 1)
    def _():
        sd2 = 0.0
        fl = 0.0
        sad = 0.0
        for a in (0, 1):
            for b in (0, 1):
                d = p[a][b] - phi[a][b]
                sd2 += jnp.sum(d * d)
                fl += jnp.sum(((p[a][b] >= 0) != (phi[a][b] >= 0))
                              .astype(d.dtype))
                sad += jnp.sum(jnp.abs(d))
        part_ref[fr, 0] = s_uh
        part_ref[fr, 1] = s_h
        part_ref[fr, 2] = sd2
        part_ref[fr, 3] = fl
        part_ref[fr, 4] = sad
        for t in range(5, 8):
            part_ref[fr, t] = 0.0
        pltpu.make_async_copy(phi_scr, out_hbm.at[fr], sems.at[2]).start()
        pltpu.make_async_copy(phi_scr, out_hbm.at[fr], sems.at[2]).wait()


def _packed_resident_mc_kernel(phi_hbm, u0_hbm, out_hbm, part_ref,
                               phi_scr, u0_scr, sems,
                               *, steps, unroll, C, mu, nu, l1, l2, dt,
                               eps, eta2, n_pix):
    """Multichannel exact-means resident iterations on planes (the
    _kernel_mc contract: partials rows [s_uH per channel..., s_H,
    s_dphi2, flips, s_absdphi])."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        pltpu.make_async_copy(phi_hbm, phi_scr, sems.at[0]).start()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[1]).start()
        pltpu.make_async_copy(phi_hbm, phi_scr, sems.at[0]).wait()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[1]).wait()

    p = _planes(phi_scr)
    u = [[[u0_scr[ch, a, b] for b in (0, 1)] for a in (0, 1)]
         for ch in range(C)]
    tiny = jnp.asarray(1e-30, u0_scr.dtype)

    for _ in range(unroll):
        phi = p
        h = _plane_map(lambda x: _heaviside(x, eps), phi)
        s_h = _plane_sum(h)
        inv_in = 1.0 / jnp.maximum(s_h, tiny)
        inv_out = 1.0 / jnp.maximum(n_pix - s_h, tiny)
        f = _plane_map(lambda hh: jnp.full(hh.shape, -nu, hh.dtype), h)
        s_uhs = []
        for ch in range(C):
            s_uh = sum(jnp.sum(u[ch][a][b] * h[a][b])
                       for a in (0, 1) for b in (0, 1))
            s_uhs.append(s_uh)
            c1 = s_uh * inv_in
            c2 = (_plane_sum(u[ch]) - s_uh) * inv_out
            for a in (0, 1):
                for b in (0, 1):
                    d1 = u[ch][a][b] - c1
                    d2 = u[ch][a][b] - c2
                    f[a][b] = (f[a][b] + (l2[ch] / C) * (d2 * d2)
                               - (l1[ch] / C) * (d1 * d1))
        p = _packed_exact_iteration(phi, f, mu, dt, eps, eta2)

    for a in (0, 1):
        for b in (0, 1):
            phi_scr[a, b] = p[a][b]

    sd2 = 0.0
    fl = 0.0
    sad = 0.0
    for a in (0, 1):
        for b in (0, 1):
            d = p[a][b] - phi[a][b]
            sd2 += jnp.sum(d * d)
            fl += jnp.sum(((p[a][b] >= 0) != (phi[a][b] >= 0))
                          .astype(d.dtype))
            sad += jnp.sum(jnp.abs(d))
    for ch in range(C):
        part_ref[k, ch] = s_uhs[ch]
    part_ref[k, C] = s_h
    part_ref[k, C + 1] = sd2
    part_ref[k, C + 2] = fl
    part_ref[k, C + 3] = sad

    @pl.when(k == steps - 1)
    def _():
        pltpu.make_async_copy(phi_scr, out_hbm, sems.at[2]).start()
        pltpu.make_async_copy(phi_scr, out_hbm, sems.at[2]).wait()


def supports_packed_resident(h: int, w: int) -> bool:
    return (h % 16 == 0 and w % 256 == 0
            and h * w * 4 * _ARRAYS_RESIDENT <= _VMEM_LIMIT)


def supports_packed_resident_mc(h: int, w: int, c: int) -> bool:
    return (h % 16 == 0 and w % 256 == 0 and 1 <= c <= 8
            and h * w * 4 * (_ARRAYS_RESIDENT + 2 * c) <= _VMEM_LIMIT)


def _resident_call(kernel, phi_in, u0_in, out_shape, parts_shape, grid,
                   scratches, interpret):
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct(out_shape, phi_in.dtype),
                   jax.ShapeDtypeStruct(parts_shape, phi_in.dtype)],
        scratch_shapes=list(scratches) + [pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(phi_in, u0_in)


@functools.partial(jax.jit, static_argnames=("p", "iters", "unroll",
                                             "interpret"))
def packed_resident_iterations(phi, u0, p: CVParams, iters: int,
                               unroll: int = 1, interpret: bool = False
                               ) -> Tuple[jax.Array, jax.Array]:
    """Scalar exact-means resident run on parity planes; the
    resident_iterations contract ((H, W) in/out, partials (steps, 8))."""
    H, W = phi.shape
    if not supports_packed_resident(H, W):
        raise ValueError(f"packed resident unsupported for {(H, W)}")
    if iters < 1 or unroll < 1 or iters % unroll:
        raise ValueError(f"unroll must divide iters ({iters=}, {unroll=})")
    steps = iters // unroll
    kernel = functools.partial(
        _packed_resident_kernel, steps=steps, unroll=unroll, mu=p.mu,
        nu=p.nu, l1=p.lambda1, l2=p.lambda2, dt=p.dt, eps=p.eps,
        eta2=p.eta2, n_pix=float(H * W))
    scr = (2, 2, H // 2, W // 2)
    out, partials = _resident_call(
        kernel, _pack(phi), _pack(u0), scr, (steps, 8), (steps,),
        [pltpu.VMEM(scr, phi.dtype), pltpu.VMEM(scr, phi.dtype)],
        interpret)
    return _unpack(out), partials


@functools.partial(jax.jit, static_argnames=("p", "iters", "unroll",
                                             "interpret"))
def packed_resident_iterations_batch(phis, u0s, p: CVParams, iters: int,
                                     unroll: int = 1,
                                     interpret: bool = False
                                     ) -> Tuple[jax.Array, jax.Array]:
    """Batched exact-means resident run on parity planes; the
    resident_iterations_batch contract ((N, H, W) in/out, partials
    (N, 8) - each frame's last iteration)."""
    N, H, W = phis.shape
    if u0s.shape != phis.shape:
        raise ValueError(f"u0s {u0s.shape} vs phis {phis.shape}")
    if not supports_packed_resident(H, W):
        raise ValueError(f"packed resident unsupported for {(H, W)}")
    if iters < 1 or unroll < 1 or iters % unroll:
        raise ValueError(f"unroll must divide iters ({iters=}, {unroll=})")
    steps = iters // unroll
    kernel = functools.partial(
        _packed_resident_batch_kernel, steps=steps, unroll=unroll,
        mu=p.mu, nu=p.nu, l1=p.lambda1, l2=p.lambda2, dt=p.dt, eps=p.eps,
        eta2=p.eta2, n_pix=float(H * W))
    scr = (2, 2, H // 2, W // 2)
    out, partials = _resident_call(
        kernel, _pack_n(phis), _pack_n(u0s), (N,) + scr, (N, 8),
        (N, steps),
        [pltpu.VMEM(scr, phis.dtype), pltpu.VMEM(scr, phis.dtype)],
        interpret)
    return _unpack_n(out), partials


@functools.partial(jax.jit, static_argnames=("p", "iters", "unroll",
                                             "lambda1", "lambda2",
                                             "interpret"))
def packed_resident_iterations_mc(phi, u0_cfirst, p: CVParams, iters: int,
                                  lambda1=None, lambda2=None,
                                  unroll: int = 1,
                                  interpret: bool = False
                                  ) -> Tuple[jax.Array, jax.Array]:
    """Multichannel exact-means resident run on parity planes; the
    resident_iterations_mc contract ((H, W) in/out, (C, H, W) image,
    partials (steps, C + 4))."""
    C, H, W = u0_cfirst.shape
    if phi.shape != (H, W):
        raise ValueError(f"phi {phi.shape} vs image {(H, W)}")
    if not supports_packed_resident_mc(H, W, C):
        raise ValueError(f"packed resident mc unsupported for {(H, W, C)}")
    if iters < 1 or unroll < 1 or iters % unroll:
        raise ValueError(f"unroll must divide iters ({iters=}, {unroll=})")
    steps = iters // unroll
    l1, l2 = p.channel_lambdas(C, lambda1, lambda2)
    kernel = functools.partial(
        _packed_resident_mc_kernel, steps=steps, unroll=unroll, C=C,
        mu=p.mu, nu=p.nu, l1=l1, l2=l2, dt=p.dt, eps=p.eps, eta2=p.eta2,
        n_pix=float(H * W))
    scr = (2, 2, H // 2, W // 2)
    out, partials = _resident_call(
        kernel, _pack(phi), _pack_mc(u0_cfirst), scr,
        (steps, C + 4), (steps,),
        [pltpu.VMEM(scr, phi.dtype), pltpu.VMEM((C,) + scr, phi.dtype)],
        interpret)
    return _unpack(out), partials
