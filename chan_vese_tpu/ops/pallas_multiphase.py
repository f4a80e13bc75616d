"""Fused Pallas kernels for 2-level-set (4-phase) Vese-Chan multiphase.

SURVEY.md §3.3 / C10; VERDICT round-1 item 3. The jnp multiphase path
(models/multiphase.py) spends its time OUTSIDE the sweeps: 2 heavisides,
4 soft phase weights, 8 masked reductions and 2 coupling terms per
iteration, each a separate HBM-bound XLA op. These kernels fuse the
ENTIRE coupled iteration - both data terms, both red-black sweeps and
all next-iteration reductions - into one pass over the image.

Iteration structure (exactly models/multiphase.multiphase_step for
M = 2, sequential coupling: phi_1's data term sees phi_0's updated
Heaviside):

    d_s  = (u0 - c_s)^2                          s in {0,1,2,3}, bit0 = phi_0
    f_0  = -nu + (1-h1)(d_0 - d_1) + h1 (d_2 - d_3)      h1 = H(phi_1 old)
    phi_0 <- red/black semi-implicit sweep (Dirac of old phi_0)
    f_1  = -nu + (1-h0')(d_0 - d_2) + h0' (d_1 - d_3)    h0' = H(phi_0 NEW)
    phi_1 <- red/black semi-implicit sweep (Dirac of old phi_1)

Stencil reach of the full coupled iteration: phi_1's sweep at row r needs
f_1 (hence NEW phi_0) over [r-2, r+1], and NEW phi_0 at row q needs old
values over [q-4, q+2] - total 8 up / 4 down, which the standard
8-up/8-down band halo of ops/pallas_sweep.py already covers. Tiles,
window clamping and the redundant-rim argument are identical.

Banded kernel partials per band (16 slots):
    [s_uw_0..3, s_w_0..3, label_flips, s_dphi2, 0...]
with w_s the soft phase weights of the NEW phis - next iteration's means
are c_s = s_uw_s / s_w_s, exactly the phase_means schedule (no lag).

The resident variant keeps both level sets + u0 in VMEM across
iterations (grid = (iters,)) and recomputes the means in-kernel each
step - zero HBM traffic per iteration, the multiphase analog of
ops/pallas_resident.py.
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
                           _resync_rim, _update_all)

# tile-sized live buffers: 10 double-buffered DMA tiles (phi0/phi1/u0/
# new0/new1 x 2) + the half-sweep temporaries
_TILES = 40
_VMEM_BUDGET = _VMEM_LIMIT  # tests shrink this to force multi-band layouts

# resident: phi0 + phi1 + u0 + new + sweep temporaries, all full-size
_ARRAYS_RESIDENT = 24


def band_rows_mp2(h: int, w: int) -> int:
    per_row = w * 4 * _TILES
    b = max(8, (_VMEM_BUDGET // per_row) // 8 * 8)
    return min(b, max(8, ((h - _HALO) // 8) * 8))


def supports_mp2(h: int, w: int) -> bool:
    return (w % 128 == 0 and h % 8 == 0 and h >= 24
            and band_rows_mp2(h, w) + _HALO <= h)


def supports_mp2_resident(h: int, w: int) -> bool:
    return (w % 128 == 0 and h % 8 == 0 and h >= 8
            and h * w * 4 * _ARRAYS_RESIDENT <= _VMEM_LIMIT)


def _coupled_iteration(phi0, phi1, u0, c, red, mu, nu, dt, eps, eta2,
                       resync=None):
    """One full 4-phase iteration on tile values; returns (new0, new1).

    ``c``: the 4 phase means [c00, c10, c01, c11] indexed by the bitmask
    s = (phi0 inside) + 2 * (phi1 inside).

    ``resync`` (sharded-canvas mode): applied after EVERY half-sweep -
    each red-half result before its black half reads the global-edge
    replica rim through it, and each black-half result so a CHAINED
    call (the multiphase comm_k chunk runs k coupled iterations per
    halo exchange) starts from valid replicas. The coupling term f1
    reads new0 pointwise, so no refresh is needed between the level
    sets beyond these.
    """
    d0 = (u0 - c[0]) ** 2
    d1 = (u0 - c[1]) ** 2
    d2 = (u0 - c[2]) ** 2
    d3 = (u0 - c[3]) ** 2

    h1 = _heaviside(phi1, eps)
    f0 = -nu + (1.0 - h1) * (d0 - d1) + h1 * (d2 - d3)
    g0 = (dt * eps / math.pi) / (eps * eps + phi0 * phi0)
    p0r = jnp.where(red, _update_all(phi0, g0, f0, mu, dt, eps, eta2), phi0)
    if resync is not None:
        p0r = resync(p0r)
    new0 = jnp.where(red, p0r,
                     _update_all(p0r, g0, f0, mu, dt, eps, eta2))
    if resync is not None:
        new0 = resync(new0)

    h0n = _heaviside(new0, eps)
    f1 = -nu + (1.0 - h0n) * (d0 - d2) + h0n * (d1 - d3)
    g1 = (dt * eps / math.pi) / (eps * eps + phi1 * phi1)
    p1r = jnp.where(red, _update_all(phi1, g1, f1, mu, dt, eps, eta2), phi1)
    if resync is not None:
        p1r = resync(p1r)
    new1 = jnp.where(red, p1r,
                     _update_all(p1r, g1, f1, mu, dt, eps, eta2))
    if resync is not None:
        new1 = resync(new1)
    return new0, new1


def _mp2_partials(part_ref, row, u0, new0, new1, old0, old1, m, eps):
    """Write the 16-slot partials row from the post-iteration state."""
    h0 = _heaviside(new0, eps)
    h1 = _heaviside(new1, eps)
    w0 = (1.0 - h0) * (1.0 - h1)
    w1 = h0 * (1.0 - h1)
    w2 = (1.0 - h0) * h1
    w3 = h0 * h1
    lab_new = (new0 >= 0).astype(jnp.int32) + 2 * (new1 >= 0).astype(
        jnp.int32)
    lab_old = (old0 >= 0).astype(jnp.int32) + 2 * (old1 >= 0).astype(
        jnp.int32)
    flips = (lab_new != lab_old).astype(u0.dtype)
    d0 = new0 - old0
    d1 = new1 - old1
    for s, w in enumerate((w0, w1, w2, w3)):
        part_ref[row, s] = jnp.sum(u0 * w * m)
        part_ref[row, 4 + s] = jnp.sum(w * m)
    part_ref[row, 8] = jnp.sum(flips * m)
    part_ref[row, 9] = jnp.sum((d0 * d0 + d1 * d1) * m)
    for s in range(10, 16):
        part_ref[row, s] = 0.0


def _mp2_band_kernel(c_ref, phis_hbm, u0_hbm, out_hbm, part_ref,
                     p0_scr, p1_scr, u0_scr, n0_scr, n1_scr, sems,
                     *, H, W, b, mu, nu, dt, eps, eta2, crop=None):
    """Banded fused 4-phase iteration, double-buffered DMA pipeline.

    c_ref (SMEM (1, 16)): [c00, c10, c01, c11, parity, top, bot, left,
    right, 0...]. ``crop`` enables sharded-canvas mode exactly like the
    scalar kernels (global parity, per-half-sweep replica-rim resync,
    crop-windowed partials)."""
    i = pl.program_id(0)
    nbands = pl.num_programs(0)

    def window(ii):
        g0 = pl.multiple_of(jnp.minimum(ii * b, H - b), 8)
        s = pl.multiple_of(jnp.clip(g0 - _HALO_UP, 0, H - (b + _HALO)), 8)
        return g0, s

    def load_dmas(ii, slot):
        _, s = window(ii)
        return (pltpu.make_async_copy(phis_hbm.at[0, pl.ds(s, b + _HALO), :],
                                      p0_scr.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(phis_hbm.at[1, pl.ds(s, b + _HALO), :],
                                      p1_scr.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(u0_hbm.at[pl.ds(s, b + _HALO), :],
                                      u0_scr.at[slot], sems.at[slot, 2]))

    def store_dmas(ii, slot):
        g0, s = window(ii)
        o = pl.multiple_of(g0 - s, 8)
        return (pltpu.make_async_copy(n0_scr.at[slot].at[pl.ds(o, b), :],
                                      out_hbm.at[0, pl.ds(g0, b), :],
                                      sems.at[slot, 3]),
                pltpu.make_async_copy(n1_scr.at[slot].at[pl.ds(o, b), :],
                                      out_hbm.at[1, pl.ds(g0, b), :],
                                      sems.at[slot, 4]))

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
    phi0 = p0_scr[slot]
    phi1 = p1_scr[slot]
    u0 = u0_scr[slot]

    rows = jax.lax.broadcasted_iota(jnp.int32, phi0.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, phi0.shape, 1)
    grow = rows + s
    parity = c_ref[0, 4].astype(jnp.int32)
    red = ((grow + cols + parity) % 2) == 0

    resync = None
    if crop is not None:
        flags = tuple(c_ref[0, 5 + t] > 0.5 for t in range(4))
        resync = lambda x: _resync_rim(x, grow, cols, crop, flags)  # noqa: E731

    c = [c_ref[0, t] for t in range(4)]
    new0, new1 = _coupled_iteration(phi0, phi1, u0, c, red, mu, nu, dt,
                                    eps, eta2, resync=resync)

    @pl.when(i >= 2)
    def _():
        for dma in store_dmas(i - 2, slot):
            dma.wait()

    n0_scr[slot] = new0
    n1_scr[slot] = new1
    for dma in store_dmas(i, slot):
        dma.start()

    hi = jnp.minimum((i + 1) * b, H)
    keep = (grow >= i * b) & (grow < hi)
    if crop is not None:
        r0, r1, c0, c1x = crop
        keep = (keep & (grow >= r0) & (grow < r1)
                & (cols >= c0) & (cols < c1x))
    m = keep.astype(u0.dtype)
    _mp2_partials(part_ref, i, u0, new0, new1, phi0, phi1, m, eps)

    @pl.when(i == nbands - 1)
    def _():
        for dma in store_dmas(i, slot):
            dma.wait()

    @pl.when((i == nbands - 1) & (nbands >= 2))
    def _():
        for dma in store_dmas(i - 1, (i - 1) % 2):
            dma.wait()


def _mp2_smem_row(cs, dtype, parity=None, edges=None):
    """(1, 16) SMEM row: [c00, c10, c01, c11, parity, edge flags, 0s]."""
    par = jnp.asarray(0 if parity is None else parity)
    if edges is None:
        edges = jnp.zeros((4,), dtype)
    return jnp.concatenate([
        jnp.asarray(cs, dtype).reshape(4), par.astype(dtype)[None],
        jnp.asarray(edges, dtype), jnp.zeros((7,), dtype),
    ]).reshape(1, 16)


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def mp2_iteration(phis, u0, cs, p: CVParams,
                  interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """One fused 4-phase iteration on (2, H, W) level sets.

    cs: (4,) phase means ordered by bitmask s = (phi_0 in) + 2*(phi_1 in)
    (the phase_means order of models/multiphase.py). Returns
    (phis_new (2, H, W), partials (16,)): [s_uw_0..3, s_w_0..3, flips,
    s_dphi2, 0...], from which the next means are s_uw_s / s_w_s.
    """
    M, H, W = phis.shape
    if M != 2:
        raise ValueError("mp2 kernel is specialized to M = 2 level sets")
    if u0.shape != (H, W):
        raise ValueError(f"u0 {u0.shape} vs phis {(H, W)} (grayscale only)")
    if not supports_mp2(H, W):
        raise ValueError(f"mp2 fast path unsupported for {(H, W)}")
    c = _mp2_smem_row(cs, u0.dtype)
    return _call_mp2(phis, u0, c, p, None, interpret)


@functools.partial(jax.jit, static_argnames=("p", "crop", "interpret"))
def mp2_iteration_sharded(phis_canvas, u0_canvas, cs, p: CVParams,
                          parity, edges, crop, interpret: bool = False
                          ) -> Tuple[jax.Array, jax.Array]:
    """One fused 4-phase iteration on halo-padded SHARD canvases.

    The coupled kernel run per shard under shard_map
    (parallel/sharded._sharded_multiphase_iteration_pallas):
    ``phis_canvas`` (2, Hc, Wc) embeds both level sets' depth-4-padded
    blocks in the lane-aligned canvas, ``u0_canvas`` the image. Depth-4
    halos cover the coupled iteration's reach (phi_1's black half reads
    new phi_0 through the data term: composite read depth 3 into the
    halo; both level sets' own sweeps read depth 2). parity/edges/crop
    as in pallas_sweep.fused_iteration. Returns (canvas_new (2, Hc, Wc),
    partials (16,)) restricted to the crop window.
    """
    M, H, W = phis_canvas.shape
    if M != 2:
        raise ValueError("mp2 kernel is specialized to M = 2 level sets")
    if u0_canvas.shape != (H, W):
        raise ValueError(f"u0 {u0_canvas.shape} vs phis {(H, W)}")
    if not supports_mp2(H, W):
        raise ValueError(f"mp2 sharded path unsupported for {(H, W)}")
    c = _mp2_smem_row(cs, u0_canvas.dtype, parity, edges)
    return _call_mp2(phis_canvas, u0_canvas, c, p, crop, interpret)


def _call_mp2(phis, u0, c, p: CVParams, crop, interpret: bool):
    M, H, W = phis.shape
    b = band_rows_mp2(H, W)
    nbands = pl.cdiv(H, b)

    kernel = functools.partial(
        _mp2_band_kernel, H=H, W=W, b=b, mu=p.mu, nu=p.nu, dt=p.dt,
        eps=p.eps, eta2=p.eta2, crop=crop)

    phis_new, partials = pl.pallas_call(
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
            jax.ShapeDtypeStruct(phis.shape, phis.dtype),
            jax.ShapeDtypeStruct((nbands, 16), phis.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b + _HALO, W), phis.dtype),
            pltpu.VMEM((2, b + _HALO, W), phis.dtype),
            pltpu.VMEM((2, b + _HALO, W), phis.dtype),
            pltpu.VMEM((2, b + _HALO, W), phis.dtype),
            pltpu.VMEM((2, b + _HALO, W), phis.dtype),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c, phis, u0)
    return phis_new, jnp.sum(partials, axis=0)


def _mp2_resident_kernel(phis_hbm, u0_hbm, out_hbm, part_ref,
                         p0_scr, p1_scr, u0_scr, sems,
                         *, steps, unroll, mu, nu, dt, eps, eta2):
    """Resident 4-phase iterations; means recomputed in-kernel every
    iteration (``unroll`` per grid step - identical trajectory, fewer
    fixed per-step costs)."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        pltpu.make_async_copy(phis_hbm.at[0], p0_scr, sems.at[0]).start()
        pltpu.make_async_copy(phis_hbm.at[1], p1_scr, sems.at[1]).start()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[2]).start()
        pltpu.make_async_copy(phis_hbm.at[0], p0_scr, sems.at[0]).wait()
        pltpu.make_async_copy(phis_hbm.at[1], p1_scr, sems.at[1]).wait()
        pltpu.make_async_copy(u0_hbm, u0_scr, sems.at[2]).wait()

    new0 = p0_scr[:]
    new1 = p1_scr[:]
    u0 = u0_scr[:]
    tiny = jnp.asarray(1e-30, u0.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, new0.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, new0.shape, 1)
    red = ((rows + cols) % 2) == 0

    for _ in range(unroll):
        phi0, phi1 = new0, new1
        # phase means of the RESIDENT state (current iteration's, no lag)
        h0 = _heaviside(phi0, eps)
        h1 = _heaviside(phi1, eps)
        c = []
        for s, w in enumerate(((1.0 - h0) * (1.0 - h1), h0 * (1.0 - h1),
                               (1.0 - h0) * h1, h0 * h1)):
            c.append(jnp.sum(u0 * w) / jnp.maximum(jnp.sum(w), tiny))

        new0, new1 = _coupled_iteration(phi0, phi1, u0, c, red, mu, nu,
                                        dt, eps, eta2)

    p0_scr[:] = new0
    p1_scr[:] = new1

    lab_new = (new0 >= 0).astype(jnp.int32) + 2 * (new1 >= 0).astype(
        jnp.int32)
    lab_old = (phi0 >= 0).astype(jnp.int32) + 2 * (phi1 >= 0).astype(
        jnp.int32)
    flips = (lab_new != lab_old).astype(u0.dtype)
    d0 = new0 - phi0
    d1 = new1 - phi1
    part_ref[k, 0] = jnp.sum(flips)
    part_ref[k, 1] = jnp.sum(d0 * d0 + d1 * d1)
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
def mp2_resident_iterations(phis, u0, p: CVParams, iters: int,
                            unroll: int = 1,
                            interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """Run ``iters`` 4-phase iterations entirely in VMEM.

    Returns (phis_new (2, H, W), partials (iters // unroll, 8)) with
    rows [label_flips, s_dphi2, 0...] per grid step (the step's LAST
    iteration). Means are exact per iteration (recomputed from the
    resident state) for any unroll, the same schedule as the jnp
    multiphase_step.
    """
    M, H, W = phis.shape
    if M != 2:
        raise ValueError("mp2 kernel is specialized to M = 2 level sets")
    if u0.shape != (H, W):
        raise ValueError(f"u0 {u0.shape} vs phis {(H, W)} (grayscale only)")
    if not supports_mp2_resident(H, W):
        raise ValueError(f"mp2 resident unsupported for {(H, W)}")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if unroll < 1 or iters % unroll:
        raise ValueError(f"unroll must divide iters (got iters={iters}, "
                         f"unroll={unroll})")
    steps = iters // unroll

    kernel = functools.partial(
        _mp2_resident_kernel, steps=steps, unroll=unroll, mu=p.mu, nu=p.nu,
        dt=p.dt, eps=p.eps, eta2=p.eta2)

    phis_new, partials = pl.pallas_call(
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
            jax.ShapeDtypeStruct(phis.shape, phis.dtype),
            jax.ShapeDtypeStruct((steps, 8), phis.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, W), phis.dtype),
            pltpu.VMEM((H, W), phis.dtype),
            pltpu.VMEM((H, W), phis.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(phis, u0)
    return phis_new, partials
