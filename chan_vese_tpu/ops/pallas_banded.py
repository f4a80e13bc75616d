"""Banded multi-iteration Pallas kernel: k iterations per HBM pass.

The VMEM-resident kernel (ops/pallas_resident.py) proves that amortizing
kernel launches and HBM round-trips over multiple iterations wins big
(+91% at 1024^2), but it needs the whole image in VMEM. This kernel
extends the idea to images of ANY size by generalizing the overlapped
band tiling of ops/pallas_sweep.py from 1 iteration to k:

    load  (U + b + D, W) tile          U = ceil8(4k), D = ceil8(2k)
    run   k full red-black iterations in VMEM (frozen c1/c2)
    store the band's b rows

One full red-black iteration at row r reads old phi over rows
[r - 4, r + 2] (the backward face coefficients compose two stencils -
see ops/pallas_sweep.py), so after j in-tile iterations rows
[4j, T - 2j) of the tile still carry the exact global trajectory; a
halo of 4k up / 2k down (rounded to the sublane tiling) keeps the
band's rows exact through all k iterations. Where the window clips at
the image top/bottom the tile edge IS the image edge and the in-tile
clamped shifts equal global Neumann exactly - same invariant as the
single-iteration kernel, deepened.

HBM traffic per iteration drops ~k-fold (read phi+u0 tile, write band,
all once per k iterations) and so does the per-iteration VPU cost of
everything outside the two half-sweeps: the data term f, the
H_eps/atan evaluation, and the reduction partials run once per chunk
instead of once per iteration.

Trajectory class: c1/c2 are FROZEN across the k iterations of a chunk
(they refresh from the chunk's final partials, like the fused driver's
schedule stretched by k). This is a documented semantic difference from
the per-iteration-means paths - the same lagged-means family as
Getreuer's IPOL scheme, converging to the same fixed point (masks agree;
see tests/test_banded.py). k = 1 reproduces ops/pallas_sweep.py
semantics exactly.

Partials (8,) per chunk, same layout as the fused kernel, measured on
the LAST in-chunk iteration: [s_uH, s_H, s_dphi2, flips, s_absdphi,
0, 0, 0] - s_uH/s_H feed the next chunk's means; the delta/flip slots
drive chunk-granular convergence (tolerance crossings are detected up
to k-1 iterations late, which is harmless: a converged contour is a
fixed point of the flips metric).
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
from .pallas_sweep import (_VMEM_LIMIT, _heaviside, _resync_rim,
                           _update_all)

# live tile-sized buffers: 8 double-buffered scratch tiles (phi/u0/f/work
# x 2) + ~16 tile-sized Mosaic temporaries of the two half-sweeps
# (measured from the register-allocator spill report on v5e: ~67 MB of
# spill slots at tile 280 rows = ~16 tiles on top of the declared scratch)
_TILES = 34
_VMEM_BUDGET = _VMEM_LIMIT  # tests shrink this to force multi-band layouts


def _halos(k: int) -> Tuple[int, int]:
    """(up, down) halo depth for k in-tile iterations, sublane-aligned."""
    up = -(-4 * k // 8) * 8
    dn = -(-2 * k // 8) * 8
    return up, dn


def _tile_height_cap(w: int, up: int, dn: int, extra: int = 0) -> int:
    """Band cap from the TILE height T = b + up + dn: the live VMEM is
    (8 declared double-buffered scratch tiles + ~16 Mosaic spill tiles
    + channel extras) x T rows, so deep halos must shrink b. The
    b-proportional _TILES proxy alone underestimates when up+dn is a
    large fraction of b - Mosaic's stack OOM'd at compile at 8K, k=8
    (round 3); this cap keeps the 4K-tuned geometry unchanged (the
    proxy binds there) while making 8K compile. The factor 27 brackets
    the measured spill behavior: 4K compiles at T=240 (=> 8+spills <=
    27.3 tiles) while 8K failed at T=136 (=> > 24.1)."""
    t_cap = _VMEM_BUDGET // (w * 4 * (27 + extra))
    return max(8, (t_cap - up - dn) // 8 * 8)


def band_rows_banded(h: int, w: int, k: int) -> int:
    """Largest multiple-of-8 band height fitting VMEM with k-deep halos."""
    up, dn = _halos(k)
    per_row = w * 4 * _TILES
    b = max(8, (_VMEM_BUDGET // per_row) // 8 * 8)
    b = min(b, _tile_height_cap(w, up, dn))
    return min(b, max(8, ((h - up - dn) // 8) * 8))


def supports_banded(h: int, w: int, k: int) -> bool:
    up, dn = _halos(k)
    return (w % 128 == 0 and h % 8 == 0 and 1 <= k <= 64
            and band_rows_banded(h, w, k) + up + dn <= h)


def _banded_kernel(c_ref, phi_hbm, u0_hbm, out_hbm, part_ref,
                   phi_scr, u0_scr, f_scr, work_scr, sems,
                   *, H, W, b, k, up, dn, mu, nu, l1, l2, dt, eps, eta2,
                   unroll=1, crop=None):
    """Grid (nbands, k): step (i, j) runs iteration j of band i.

    The in-chunk iterate lives in ``work_scr`` (explicit scratch, not a
    loop-carried value: a fori_loop over k tile-sized carries makes
    Mosaic's register allocator spill tens of MB of VMEM - measured OOM
    at k = 4 on v5e - while one-iteration-per-grid-step keeps the live
    set identical to the proven single-iteration kernel; ``unroll``
    iterations per step trade a little of that safety for fewer
    per-step overheads). The frozen data term is computed once per band
    into ``f_scr``; stores drain two BANDS behind, giving them k grid
    steps of latency to hide in.
    """
    T = b + up + dn
    i = pl.program_id(0)
    j = pl.program_id(1)
    nsteps = pl.num_programs(1)
    nbands = pl.num_programs(0)

    def window(ii):
        g0 = pl.multiple_of(jnp.minimum(ii * b, H - b), 8)
        s = pl.multiple_of(jnp.clip(g0 - up, 0, H - T), 8)
        return g0, s

    def load_dmas(ii, slot):
        _, s = window(ii)
        return (pltpu.make_async_copy(phi_hbm.at[pl.ds(s, T), :],
                                      phi_scr.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(u0_hbm.at[pl.ds(s, T), :],
                                      u0_scr.at[slot], sems.at[slot, 1]))

    def store_dma(ii, slot):
        g0, s = window(ii)
        o = pl.multiple_of(g0 - s, 8)
        return pltpu.make_async_copy(
            work_scr.at[slot].at[pl.ds(o, b), :],
            out_hbm.at[pl.ds(g0, b), :], sems.at[slot, 2])

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

        # band i's store reads work_scr[slot]; it was issued at
        # (i - 2, k - 1) and must drain before this band reuses the slot
        @pl.when(i >= 2)
        def _():
            store_dma(i - 2, slot).wait()

        u0 = u0_scr[slot]
        f_scr[slot] = (-nu - l1 * (u0 - c_ref[0, 0]) ** 2
                       + l2 * (u0 - c_ref[0, 1]) ** 2)
        work_scr[slot] = phi_scr[slot]

    phi_n = work_scr[slot]
    f = f_scr[slot]

    _, s = window(i)
    rows = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 1)
    grow = rows + s
    parity = c_ref[0, 2].astype(jnp.int32)
    red = ((grow + cols + parity) % 2) == 0
    flags = tuple(c_ref[0, 3 + t] > 0.5 for t in range(4))

    for _ in range(unroll):
        phi = phi_n
        g = (dt * eps / math.pi) / (eps * eps + phi * phi)
        phi_r = jnp.where(red, _update_all(phi, g, f, mu, dt, eps, eta2),
                          phi)
        if crop is not None:
            phi_r = _resync_rim(phi_r, grow, cols, crop, flags)
        phi_n = jnp.where(red, phi_r,
                          _update_all(phi_r, g, f, mu, dt, eps, eta2))
        if crop is not None:
            phi_n = _resync_rim(phi_n, grow, cols, crop, flags)
    work_scr[slot] = phi_n

    @pl.when(j == nsteps - 1)
    def _():
        store_dma(i, slot).start()

        g0, _ = window(i)
        hi = jnp.minimum((i + 1) * b, H)
        keep = (grow >= i * b) & (grow < hi)
        if crop is not None:
            r0, r1, c0, c1x = crop
            keep = (keep & (grow >= r0) & (grow < r1)
                    & (cols >= c0) & (cols < c1x))
        m = keep.astype(phi_n.dtype)
        h_eps = _heaviside(phi_n, eps)
        dphi = phi_n - phi
        flips = ((phi_n >= 0) != (phi >= 0)).astype(phi_n.dtype)
        part_ref[i, 0] = jnp.sum(u0_scr[slot] * h_eps * m)
        part_ref[i, 1] = jnp.sum(h_eps * m)
        part_ref[i, 2] = jnp.sum(dphi * dphi * m)
        part_ref[i, 3] = jnp.sum(flips * m)
        part_ref[i, 4] = jnp.sum(jnp.abs(dphi) * m)
        part_ref[i, 5] = 0.0
        part_ref[i, 6] = 0.0
        part_ref[i, 7] = 0.0

        @pl.when(i == nbands - 1)
        def _():
            store_dma(i, slot).wait()

        @pl.when((i == nbands - 1) & (nbands >= 2))
        def _():
            store_dma(i - 1, (i - 1) % 2).wait()


def _banded_kernel_fusej(c_ref, phi_hbm, u0_hbm, out_hbm, part_ref,
                         phi_scr, u0_scr, f_scr, work_scr, sems,
                         *, H, W, b, k, up, dn, mu, nu, l1, l2, dt, eps,
                         eta2, unroll=1, crop=None):
    """Fused-j variant of _banded_kernel: grid (nbands,), ALL k in-band
    iterations inside one grid program via a fori_loop whose state lives
    in ``work_scr`` (a ref round-trip per step, NOT tile-sized loop
    carries - those make Mosaic's register allocator spill tens of MB;
    the ref-based loop keeps the live set identical to one grid step of
    the unfused kernel). This removes the per-grid-step fixed cost that
    the packed layout cannot unroll away (docs/BENCHMARKS.md round-3
    packed-at-4K analysis); DMA schedule (prefetch next band, store two
    bands behind) is unchanged.
    """
    T = b + up + dn
    i = pl.program_id(0)
    nbands = pl.num_programs(0)

    def window(ii):
        g0 = pl.multiple_of(jnp.minimum(ii * b, H - b), 8)
        s = pl.multiple_of(jnp.clip(g0 - up, 0, H - T), 8)
        return g0, s

    def load_dmas(ii, slot):
        _, s = window(ii)
        return (pltpu.make_async_copy(phi_hbm.at[pl.ds(s, T), :],
                                      phi_scr.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(u0_hbm.at[pl.ds(s, T), :],
                                      u0_scr.at[slot], sems.at[slot, 1]))

    def store_dma(ii, slot):
        g0, s = window(ii)
        o = pl.multiple_of(g0 - s, 8)
        return pltpu.make_async_copy(
            work_scr.at[slot].at[pl.ds(o, b), :],
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

    @pl.when(i >= 2)
    def _():
        store_dma(i - 2, slot).wait()

    u0 = u0_scr[slot]
    f_scr[slot] = (-nu - l1 * (u0 - c_ref[0, 0]) ** 2
                   + l2 * (u0 - c_ref[0, 1]) ** 2)
    work_scr[slot] = phi_scr[slot]

    _, s = window(i)
    parity = c_ref[0, 2].astype(jnp.int32)
    flags = tuple(c_ref[0, 3 + t] > 0.5 for t in range(4))

    def step():
        """``unroll`` iterations from work_scr back to a value pair
        (phi_n, prev); iota/mask recomputed per call to keep nothing
        tile-sized live across the fori_loop back-edge."""
        phi_n = work_scr[slot]
        f = f_scr[slot]
        rows = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 1)
        grow = rows + s
        red = ((grow + cols + parity) % 2) == 0
        phi = phi_n
        for _ in range(unroll):
            phi = phi_n
            g = (dt * eps / math.pi) / (eps * eps + phi * phi)
            phi_r = jnp.where(red, _update_all(phi, g, f, mu, dt, eps,
                                               eta2), phi)
            if crop is not None:
                phi_r = _resync_rim(phi_r, grow, cols, crop, flags)
            phi_n = jnp.where(red, phi_r,
                              _update_all(phi_r, g, f, mu, dt, eps, eta2))
            if crop is not None:
                phi_n = _resync_rim(phi_n, grow, cols, crop, flags)
        return phi_n, phi

    nsteps = k // unroll

    def body(jj, carry):
        phi_n, _ = step()
        work_scr[slot] = phi_n
        return carry

    jax.lax.fori_loop(0, nsteps - 1, body, 0, unroll=False)
    phi_n, phi = step()
    work_scr[slot] = phi_n

    store_dma(i, slot).start()

    g0, _ = window(i)
    rows = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 1)
    grow = rows + s
    hi = jnp.minimum((i + 1) * b, H)
    keep = (grow >= i * b) & (grow < hi)
    if crop is not None:
        r0, r1, c0, c1x = crop
        keep = (keep & (grow >= r0) & (grow < r1)
                & (cols >= c0) & (cols < c1x))
    m = keep.astype(phi_n.dtype)
    h_eps = _heaviside(phi_n, eps)
    dphi = phi_n - phi
    flips = ((phi_n >= 0) != (phi >= 0)).astype(phi_n.dtype)
    part_ref[i, 0] = jnp.sum(u0_scr[slot] * h_eps * m)
    part_ref[i, 1] = jnp.sum(h_eps * m)
    part_ref[i, 2] = jnp.sum(dphi * dphi * m)
    part_ref[i, 3] = jnp.sum(flips * m)
    part_ref[i, 4] = jnp.sum(jnp.abs(dphi) * m)
    part_ref[i, 5] = 0.0
    part_ref[i, 6] = 0.0
    part_ref[i, 7] = 0.0

    @pl.when(i == nbands - 1)
    def _():
        store_dma(i, slot).wait()

    @pl.when((i == nbands - 1) & (nbands >= 2))
    def _():
        store_dma(i - 1, (i - 1) % 2).wait()


def _banded_smem_row(c1, c2, dtype, parity=None, edges=None):
    """(1, 8) SMEM row: [c1, c2, parity, top, bot, left, right, 0]."""
    par = jnp.asarray(0 if parity is None else parity)
    if edges is None:
        edges = jnp.zeros((4,), dtype)
    return jnp.concatenate([
        jnp.stack([jnp.asarray(c1, dtype), jnp.asarray(c2, dtype),
                   par.astype(dtype)]),
        jnp.asarray(edges, dtype), jnp.zeros((1,), dtype),
    ]).reshape(1, 8)


@functools.partial(jax.jit, static_argnames=("p", "k", "unroll", "fuse",
                                             "interpret"))
def banded_chunk(phi, u0, c1, c2, p: CVParams, k: int = 8,
                 unroll: int = 1, fuse: bool = False,
                 interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Run k red-black iterations with frozen means in one HBM pass.

    Returns (phi_new, partials (8,)) where the partials describe the
    LAST iteration's transition (layout of ops/pallas_sweep.py).
    ``unroll`` runs that many iterations per grid step (k % unroll == 0)
    to amortize Mosaic's per-step costs; values > 2 risk VMEM spill OOM.
    ``fuse`` collapses the j grid dimension into an in-kernel fori_loop
    (one grid program per band; see _banded_kernel_fusej).
    """
    if not supports_banded(*phi.shape, k):
        raise ValueError(f"banded path unsupported for {phi.shape}, k={k}")
    c = _banded_smem_row(c1, c2, phi.dtype)
    return _call_banded(phi, u0, c, p, k, unroll, None, interpret,
                        fuse=fuse)


@functools.partial(jax.jit, static_argnames=("p", "k", "unroll", "crop",
                                             "fuse", "interpret"))
def banded_chunk_sharded(canvas, u0_canvas, c1, c2, p: CVParams, k: int,
                         parity, edges, crop, unroll: int = 1,
                         fuse: bool = False,
                         interpret: bool = False
                         ) -> Tuple[jax.Array, jax.Array]:
    """k frozen-means iterations on a halo-padded SHARD canvas.

    The banded kernel run per shard inside a communication-avoiding
    chunk (parallel/sharded._sharded_chunk_pallas): ``canvas`` embeds
    the (h + 2D, w + 2D) deep-halo padded block (D = 4 * comm_k >= 4k
    covers the composite stencil reach of the chunk) in a lane-aligned
    width with edge-extended dead columns, exactly like the
    single-iteration canvas of ops/pallas_sweep.fused_iteration.

    parity (traced int): global red-black lattice offset of the canvas
    origin. edges (traced (4,) floats): [top, bottom, left, right]
    global-boundary flags; replica halos on those sides are resynced
    after every half-sweep (see _resync_rim). crop (static (r0, r1, c0,
    c1) = (D, D+h, D, D+w)): the shard's own window, to which the
    returned partials are restricted.

    Returns (canvas_new, partials (8,)); the caller crops the canvas
    and psums the partials over the mesh.
    """
    if not supports_banded(*canvas.shape, k):
        raise ValueError(f"banded sharded path unsupported for "
                         f"{canvas.shape}, k={k}")
    c = _banded_smem_row(c1, c2, canvas.dtype, parity, edges)
    return _call_banded(canvas, u0_canvas, c, p, k, unroll, crop,
                        interpret, fuse=fuse)


def _call_banded(phi, u0, c, p: CVParams, k: int, unroll: int, crop,
                 interpret: bool, fuse: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
    H, W = phi.shape
    if unroll < 1 or k % unroll:
        raise ValueError(f"unroll must divide k (got k={k}, "
                         f"unroll={unroll})")
    up, dn = _halos(k)
    b = band_rows_banded(H, W, k)
    nbands = pl.cdiv(H, b)

    kern = _banded_kernel_fusej if fuse else _banded_kernel
    kernel = functools.partial(
        kern, H=H, W=W, b=b, k=k, up=up, dn=dn, mu=p.mu, nu=p.nu,
        l1=p.lambda1, l2=p.lambda2, dt=p.dt, eps=p.eps, eta2=p.eta2,
        unroll=unroll, crop=crop)

    T = b + up + dn
    phi_new, partials = pl.pallas_call(
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
            jax.ShapeDtypeStruct(phi.shape, phi.dtype),
            jax.ShapeDtypeStruct((nbands, 8), phi.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, T, W), phi.dtype),   # phi tiles
            pltpu.VMEM((2, T, W), phi.dtype),   # u0 tiles
            pltpu.VMEM((2, T, W), phi.dtype),   # frozen data term
            pltpu.VMEM((2, T, W), phi.dtype),   # in-chunk iterate
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) if fuse
            else ("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c, phi, u0)
    return phi_new, jnp.sum(partials, axis=0)


# ---------------------------------------------------------------------------
# Multichannel (vector-valued) banded variant: same k-iterations-per-HBM-pass
# scheme with a C-channel image; the level set stays scalar, the frozen data
# term averages per-channel weighted squared distances (Chan-Sandberg-Vese),
# and the partials carry per-channel s_uH sums (ops/pallas_sweep_mc.py
# layout).
# ---------------------------------------------------------------------------

def band_rows_banded_mc(h: int, w: int, k: int, c: int) -> int:
    up, dn = _halos(k)
    per_row = w * 4 * (_TILES + 2 * c)
    b = max(8, (_VMEM_BUDGET // per_row) // 8 * 8)
    # extra declared tiles vs the scalar kernel: the u0 scratch holds C
    # planes per buffer instead of 1 (spill behavior is the same scalar
    # sweep body); 2*(c-1) keeps the cap non-binding at the proven 4K
    # RGB geometry while still capping 8K
    b = min(b, _tile_height_cap(w, up, dn, extra=2 * (c - 1)))
    return min(b, max(8, ((h - up - dn) // 8) * 8))


def supports_banded_mc(h: int, w: int, k: int, c: int) -> bool:
    up, dn = _halos(k)
    return (w % 128 == 0 and h % 8 == 0 and 1 <= k <= 64 and 1 <= c <= 8
            and band_rows_banded_mc(h, w, k, c) + up + dn <= h)


def _banded_mc_kernel(c_ref, phi_hbm, u0_hbm, out_hbm, part_ref,
                      phi_scr, u0_scr, f_scr, work_scr, sems,
                      *, H, W, C, b, k, up, dn, mu, nu, l1, l2, dt, eps,
                      eta2, unroll=1, crop=None):
    """Grid (nbands, k // unroll); c_ref (SMEM (1, 2C + 8)):
    [c1..., c2..., parity, top, bot, left, right, 0, 0, 0]."""
    T = b + up + dn
    i = pl.program_id(0)
    j = pl.program_id(1)
    nsteps = pl.num_programs(1)
    nbands = pl.num_programs(0)

    def window(ii):
        g0 = pl.multiple_of(jnp.minimum(ii * b, H - b), 8)
        s = pl.multiple_of(jnp.clip(g0 - up, 0, H - T), 8)
        return g0, s

    def load_dmas(ii, slot):
        _, s = window(ii)
        return (pltpu.make_async_copy(phi_hbm.at[pl.ds(s, T), :],
                                      phi_scr.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(u0_hbm.at[:, pl.ds(s, T), :],
                                      u0_scr.at[slot], sems.at[slot, 1]))

    def store_dma(ii, slot):
        g0, s = window(ii)
        o = pl.multiple_of(g0 - s, 8)
        return pltpu.make_async_copy(
            work_scr.at[slot].at[pl.ds(o, b), :],
            out_hbm.at[pl.ds(g0, b), :], sems.at[slot, 2])

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

        f = jnp.full((T, W), -nu, dtype=phi_scr.dtype)
        for ch in range(C):
            u_ch = u0_scr[slot, ch]
            d1 = u_ch - c_ref[0, ch]
            d2 = u_ch - c_ref[0, C + ch]
            f = f + (l2[ch] / C) * (d2 * d2) - (l1[ch] / C) * (d1 * d1)
        f_scr[slot] = f
        work_scr[slot] = phi_scr[slot]

    phi_n = work_scr[slot]
    f = f_scr[slot]

    _, s = window(i)
    rows = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 1)
    grow = rows + s
    parity = c_ref[0, 2 * C].astype(jnp.int32)
    red = ((grow + cols + parity) % 2) == 0
    flags = tuple(c_ref[0, 2 * C + 1 + t] > 0.5 for t in range(4))

    for _ in range(unroll):
        phi = phi_n
        g = (dt * eps / math.pi) / (eps * eps + phi * phi)
        phi_r = jnp.where(red, _update_all(phi, g, f, mu, dt, eps, eta2),
                          phi)
        if crop is not None:
            phi_r = _resync_rim(phi_r, grow, cols, crop, flags)
        phi_n = jnp.where(red, phi_r,
                          _update_all(phi_r, g, f, mu, dt, eps, eta2))
        if crop is not None:
            phi_n = _resync_rim(phi_n, grow, cols, crop, flags)
    work_scr[slot] = phi_n

    @pl.when(j == nsteps - 1)
    def _():
        store_dma(i, slot).start()

        hi = jnp.minimum((i + 1) * b, H)
        keep = (grow >= i * b) & (grow < hi)
        if crop is not None:
            r0, r1, cc0, cc1 = crop
            keep = (keep & (grow >= r0) & (grow < r1)
                    & (cols >= cc0) & (cols < cc1))
        m = keep.astype(phi_n.dtype)
        h_eps = _heaviside(phi_n, eps)
        hm = h_eps * m
        dphi = phi_n - phi
        flips = ((phi_n >= 0) != (phi >= 0)).astype(phi_n.dtype)
        for ch in range(C):
            part_ref[i, ch] = jnp.sum(u0_scr[slot, ch] * hm)
        part_ref[i, C] = jnp.sum(hm)
        part_ref[i, C + 1] = jnp.sum(dphi * dphi * m)
        part_ref[i, C + 2] = jnp.sum(flips * m)
        part_ref[i, C + 3] = jnp.sum(jnp.abs(dphi) * m)
        for t in range(C + 4, 16):
            part_ref[i, t] = 0.0

        @pl.when(i == nbands - 1)
        def _():
            store_dma(i, slot).wait()

        @pl.when((i == nbands - 1) & (nbands >= 2))
        def _():
            store_dma(i - 1, (i - 1) % 2).wait()


def _banded_mc_kernel_fusej(c_ref, phi_hbm, u0_hbm, out_hbm, part_ref,
                            phi_scr, u0_scr, f_scr, work_scr, sems,
                            *, H, W, C, b, k, up, dn, mu, nu, l1, l2, dt,
                            eps, eta2, unroll=1, crop=None):
    """Fused-j variant of _banded_mc_kernel: grid (nbands,), all k
    in-band iterations inside one grid program via a fori_loop with
    ref-based state (work_scr round-trips, no tile-sized loop carries -
    same spill discipline as _banded_kernel_fusej). Measured motivation:
    fusej lifted the flat SCALAR kernel ~+12% at 4K (2026-08-18 A/B)
    and the flat layout is the mc auto default at every size, so the mc
    kernel is where the per-grid-step overhead still bites.
    """
    T = b + up + dn
    i = pl.program_id(0)
    nbands = pl.num_programs(0)

    def window(ii):
        g0 = pl.multiple_of(jnp.minimum(ii * b, H - b), 8)
        s = pl.multiple_of(jnp.clip(g0 - up, 0, H - T), 8)
        return g0, s

    def load_dmas(ii, slot):
        _, s = window(ii)
        return (pltpu.make_async_copy(phi_hbm.at[pl.ds(s, T), :],
                                      phi_scr.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(u0_hbm.at[:, pl.ds(s, T), :],
                                      u0_scr.at[slot], sems.at[slot, 1]))

    def store_dma(ii, slot):
        g0, s = window(ii)
        o = pl.multiple_of(g0 - s, 8)
        return pltpu.make_async_copy(
            work_scr.at[slot].at[pl.ds(o, b), :],
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

    @pl.when(i >= 2)
    def _():
        store_dma(i - 2, slot).wait()

    f = jnp.full((T, W), -nu, dtype=phi_scr.dtype)
    for ch in range(C):
        u_ch = u0_scr[slot, ch]
        d1 = u_ch - c_ref[0, ch]
        d2 = u_ch - c_ref[0, C + ch]
        f = f + (l2[ch] / C) * (d2 * d2) - (l1[ch] / C) * (d1 * d1)
    f_scr[slot] = f
    work_scr[slot] = phi_scr[slot]

    _, s = window(i)
    parity = c_ref[0, 2 * C].astype(jnp.int32)
    flags = tuple(c_ref[0, 2 * C + 1 + t] > 0.5 for t in range(4))

    def step():
        """``unroll`` iterations from work_scr back to (phi_n, prev);
        iota/mask recomputed per call so nothing tile-sized stays live
        across the fori_loop back-edge."""
        phi_n = work_scr[slot]
        f = f_scr[slot]
        rows = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 1)
        grow = rows + s
        red = ((grow + cols + parity) % 2) == 0
        phi = phi_n
        for _ in range(unroll):
            phi = phi_n
            g = (dt * eps / math.pi) / (eps * eps + phi * phi)
            phi_r = jnp.where(red, _update_all(phi, g, f, mu, dt, eps,
                                               eta2), phi)
            if crop is not None:
                phi_r = _resync_rim(phi_r, grow, cols, crop, flags)
            phi_n = jnp.where(red, phi_r,
                              _update_all(phi_r, g, f, mu, dt, eps, eta2))
            if crop is not None:
                phi_n = _resync_rim(phi_n, grow, cols, crop, flags)
        return phi_n, phi

    nsteps = k // unroll

    def body(jj, carry):
        phi_n, _ = step()
        work_scr[slot] = phi_n
        return carry

    jax.lax.fori_loop(0, nsteps - 1, body, 0, unroll=False)
    phi_n, phi = step()
    work_scr[slot] = phi_n

    store_dma(i, slot).start()

    rows = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, phi_n.shape, 1)
    grow = rows + s
    hi = jnp.minimum((i + 1) * b, H)
    keep = (grow >= i * b) & (grow < hi)
    if crop is not None:
        r0, r1, cc0, cc1 = crop
        keep = (keep & (grow >= r0) & (grow < r1)
                & (cols >= cc0) & (cols < cc1))
    m = keep.astype(phi_n.dtype)
    h_eps = _heaviside(phi_n, eps)
    hm = h_eps * m
    dphi = phi_n - phi
    flips = ((phi_n >= 0) != (phi >= 0)).astype(phi_n.dtype)
    for ch in range(C):
        part_ref[i, ch] = jnp.sum(u0_scr[slot, ch] * hm)
    part_ref[i, C] = jnp.sum(hm)
    part_ref[i, C + 1] = jnp.sum(dphi * dphi * m)
    part_ref[i, C + 2] = jnp.sum(flips * m)
    part_ref[i, C + 3] = jnp.sum(jnp.abs(dphi) * m)
    for t in range(C + 4, 16):
        part_ref[i, t] = 0.0

    @pl.when(i == nbands - 1)
    def _():
        store_dma(i, slot).wait()

    @pl.when((i == nbands - 1) & (nbands >= 2))
    def _():
        store_dma(i - 1, (i - 1) % 2).wait()


def _banded_mc_smem_row(c1, c2, C, dtype, parity=None, edges=None):
    """(1, 2C + 8) SMEM row: [c1..., c2..., parity, edge flags, 0s]."""
    par = jnp.asarray(0 if parity is None else parity)
    if edges is None:
        edges = jnp.zeros((4,), dtype)
    return jnp.concatenate([
        jnp.atleast_1d(c1).astype(dtype), jnp.atleast_1d(c2).astype(dtype),
        par.astype(dtype)[None], jnp.asarray(edges, dtype),
        jnp.zeros((3,), dtype),
    ]).reshape(1, 2 * C + 8)


@functools.partial(jax.jit, static_argnames=("p", "k", "unroll", "lambda1",
                                             "lambda2", "fuse",
                                             "interpret"))
def banded_chunk_mc(phi, u0_cfirst, c1, c2, p: CVParams, k: int = 8,
                    unroll: int = 1, lambda1=None, lambda2=None,
                    fuse: bool = False, interpret: bool = False
                    ) -> Tuple[jax.Array, jax.Array]:
    """k frozen-means red-black iterations on a (C, H, W) channels-first
    image in one HBM pass. c1, c2: (C,) means. Returns (phi_new,
    partials (16,)): [s_uH per channel..., s_H, s_dphi2, flips,
    s_absdphi, 0...] of the last iteration's transition. ``fuse``
    collapses the j grid into an in-kernel fori_loop
    (_banded_mc_kernel_fusej), like the scalar banded_chunk.
    """
    C, H, W = u0_cfirst.shape
    if phi.shape != (H, W):
        raise ValueError(f"phi {phi.shape} vs image {(H, W)}")
    if not supports_banded_mc(H, W, k, C):
        raise ValueError(f"banded mc unsupported for {(H, W, C)}, k={k}")
    c = _banded_mc_smem_row(c1, c2, C, phi.dtype)
    return _call_banded_mc(phi, u0_cfirst, c, p, k, unroll, lambda1,
                           lambda2, None, interpret, fuse=fuse)


@functools.partial(jax.jit, static_argnames=("p", "k", "unroll", "lambda1",
                                             "lambda2", "crop", "fuse",
                                             "interpret"))
def banded_chunk_mc_sharded(canvas, u0_canvas_cfirst, c1, c2, p: CVParams,
                            k: int, parity, edges, crop, unroll: int = 1,
                            lambda1=None, lambda2=None, fuse: bool = False,
                            interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """Multichannel twin of banded_chunk_sharded: k frozen-means
    iterations on a halo-padded shard canvas with a (C, Hc, Wc)
    channels-first image canvas. Same parity/edges/crop contract;
    returns (canvas_new, partials (16,)) restricted to the crop window.
    """
    C, H, W = u0_canvas_cfirst.shape
    if canvas.shape != (H, W):
        raise ValueError(f"canvas {canvas.shape} vs image {(H, W)}")
    if not supports_banded_mc(H, W, k, C):
        raise ValueError(f"banded mc sharded unsupported for "
                         f"{(H, W, C)}, k={k}")
    c = _banded_mc_smem_row(c1, c2, C, canvas.dtype, parity, edges)
    return _call_banded_mc(canvas, u0_canvas_cfirst, c, p, k, unroll,
                           lambda1, lambda2, crop, interpret, fuse=fuse)


def _call_banded_mc(phi, u0_cfirst, c, p: CVParams, k: int, unroll: int,
                    lambda1, lambda2, crop, interpret: bool,
                    fuse: bool = False) -> Tuple[jax.Array, jax.Array]:
    C, H, W = u0_cfirst.shape
    if unroll < 1 or k % unroll:
        raise ValueError(f"unroll must divide k (got k={k}, "
                         f"unroll={unroll})")
    l1, l2 = p.channel_lambdas(C, lambda1, lambda2)
    up, dn = _halos(k)
    b = band_rows_banded_mc(H, W, k, C)
    nbands = pl.cdiv(H, b)

    kern = _banded_mc_kernel_fusej if fuse else _banded_mc_kernel
    kernel = functools.partial(
        kern, H=H, W=W, C=C, b=b, k=k, up=up, dn=dn, mu=p.mu,
        nu=p.nu, l1=l1, l2=l2, dt=p.dt, eps=p.eps, eta2=p.eta2,
        unroll=unroll, crop=crop)

    T = b + up + dn
    phi_new, partials = pl.pallas_call(
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
            jax.ShapeDtypeStruct(phi.shape, phi.dtype),
            jax.ShapeDtypeStruct((nbands, 16), phi.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, T, W), phi.dtype),      # phi tiles
            pltpu.VMEM((2, C, T, W), phi.dtype),   # u0 tiles
            pltpu.VMEM((2, T, W), phi.dtype),      # frozen data term
            pltpu.VMEM((2, T, W), phi.dtype),      # in-chunk iterate
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) if fuse
            else ("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c, phi, u0_cfirst)
    return phi_new, jnp.sum(partials, axis=0)
