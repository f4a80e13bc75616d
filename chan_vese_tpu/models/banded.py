"""Banded multi-iteration drivers: k iterations per HBM pass at any size.

Wraps ops/pallas_banded.py. This is the large-image counterpart of
models/resident.py: where the resident driver amortizes launches and HBM
round-trips by keeping the whole image in VMEM (<= ~1024^2), this one
streams deep-halo bands so the same k-fold amortization works at 4K and
beyond.

Trajectory class (documented, tested): c1/c2 refresh every k iterations
from the chunk's final partials instead of every iteration - the
lagged-means family (see ops/pallas_banded.py docstring). k = 1 is
exactly the fused driver's schedule. Convergence and divergence are
evaluated at chunk boundaries from the last in-chunk iteration's
delta/flip partials, so a tolerance crossing is detected up to k-1
iterations late. ``patience`` is iteration-denominated on every driver:
a below-tol chunk check credits its full k iterations to the streak, so
the same CVParams stops chunked and per-iteration drivers within one
chunk of each other. The max_iter cap is exact: full chunks run in the
while_loop and the static remainder runs once at the end (same scheme
as models/resident).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import pallas_banded
from ..ops.reductions import loop_continue, means_from_sums, region_means
from ..params import CVParams
from ..utils.init_phi import init_phi
from .fused import (_backend_ok, _delta_from_partials,
                    _fold_scalar_lambdas)
from .scalar import SegResult


def _supported(u0, p: CVParams, k: int) -> bool:
    if u0.ndim != 2:
        return False
    H, W = u0.shape
    return (pallas_banded.supports_banded(H, W, k)
            and p.order == "redblack" and not p.reinit_every)


def _supported_mc(u0, p: CVParams, k: int) -> bool:
    if u0.ndim != 3:
        return False
    H, W, C = u0.shape
    return (pallas_banded.supports_banded_mc(H, W, k, C)
            and p.order == "redblack" and not p.reinit_every)


def auto_config(H, W, k=None, unroll=None, packed=None, fuse=None):
    """Resolve (k, unroll, packed, fuse) from the measured size sweeps
    (docs/BENCHMARKS.md round-3 tables: 1080p/4K/8K on v5e).

    k=8 wins at every size. The packed parity-plane kernel leads at 4K
    area and beyond where its layout constraints (H % 16, W % 256)
    allow: +9-12% over flat k=8/unroll=4 in alternating same-session
    A/B at 4K (14.3-15.0 vs 12.7-13.6 G) and +5% at 8K. unroll=4 wins
    for the flat kernel at every size; the packed kernel runs
    unroll=1 (its 4-plane live set spills at unroll >= 2). Below 4K
    area the flat kernel + unroll=4 is the measured best (packed
    unmeasured there; most such widths fail W % 256 anyway).
    fuse (collapse the j grid into an in-kernel ref-state fori_loop):
    measured 2026-08-18 clean session (scripts/ab_fusej.py,
    artifacts/ab_fusej_2026-08-18.out): +7.1% on packed u4 at 8K
    (17.15 -> 18.36 G, the new 8K default), +3.6-6.9% on flat u4 at
    4K/8K, -2% on packed u1 at 4K, and a compile-time VMEM OOM at
    k=16 x unroll=4 flat (69M register spills) — so auto turns fuse on
    exactly for the unroll=4, k <= 8, >= 4K-area regimes where it
    measured ahead: never with the spill-prone deep-k geometry, and
    not below 4K area where it is unmeasured.

    2026-08-19 (scripts/ab_4k_bp_unroll.py, asymptotic 800-it
    protocol, artifacts/ab_4k_bp_unroll_2026-08-19.out + confirm
    session): packed u4+fusej BEATS packed u1 at 4K too (25727 vs
    24845, then 25811 vs 25399 — +1.6-3.5% across two sessions), and
    the round-3 "packed spills at unroll >= 2" does not hold for the
    fused-j form at bp <= 96 (compiles in 40-156 s). Packed unroll is
    therefore 4 wherever fuse will engage AND the band geometry is
    inside the measured envelope (bp <= 96, i.e. W >= 3840; taller
    bands at narrower widths are unmeasured VMEM territory); u1
    otherwise. Shorter forced bands lose (u4 bp64 fusej 24697,
    bp48 22407 — redundancy tax), so bp stays at band_rows_packed.
    """
    from ..ops import pallas_packed

    if k is None:
        k = 8
    if packed is None:
        packed = (H * W >= 2160 * 3840
                  and pallas_packed.supports_packed_banded(H, W, k))
    if unroll is None:
        if packed:
            # u4 pays ONLY via fused-j (u4 unfused measured below u1:
            # 22969 vs 24845); pick it only where fuse will engage.
            bp, _, _ = pallas_packed.band_rows_packed(H, W, k)
            will_fuse = (fuse is True
                         or (fuse is None and k <= 8
                             and H * W >= 2160 * 3840))
            unroll = 4 if (will_fuse and k % 4 == 0 and bp <= 96) else 1
        else:
            unroll = 4  # flat wants 4 everywhere (measured tables)
    if fuse is None:
        fuse = unroll == 4 and k <= 8 and H * W >= 2160 * 3840
    return k, unroll, packed, fuse


@functools.partial(jax.jit,
                   static_argnames=("p", "iters", "k", "unroll", "lambda1",
                                    "lambda2", "packed", "fuse",
                                    "interpret"))
def segment_banded_fixed(u0, p: CVParams = CVParams(), iters: int = 100,
                         k: Optional[int] = None,
                         phi0: Optional[jax.Array] = None,
                         lambda1=None, lambda2=None,
                         unroll: Optional[int] = None,
                         packed: Optional[bool] = None,
                         fuse: Optional[bool] = None,
                         interpret: bool = False):
    """Fixed-iteration banded run. Returns (phi, mask).

    Runs ceil-free: iters = full k-chunks + one static remainder chunk.
    Falls back to the fused driver off the supported envelope.
    k/unroll/packed default to None = the measured size-aware selection
    (auto_config: k=8 everywhere; flat kernel + unroll=4 up to 4K;
    parity-plane packed kernel + unroll=1 beyond 4K area where its
    H % 16 / W % 256 constraints allow - docs/BENCHMARKS.md round-3
    sweep). ``unroll`` drops to 1 automatically for chunk sizes it does
    not divide.

    packed=True forces the parity-plane kernel
    (ops/pallas_packed.packed_banded_chunk): phi/u0 packed once up
    front, every chunk on (2, 2, H/2, W/2) planes - same frozen-means
    trajectory to FMA-contraction level (falls back to the flat kernel
    off its envelope).
    """
    if u0.ndim == 3:
        return _segment_banded_mc_fixed(u0, p, iters, k, phi0,
                                        lambda1, lambda2, unroll,
                                        interpret, packed=packed,
                                        fuse=fuse)
    k, unroll, packed, fuse = auto_config(*u0.shape, k, unroll, packed,
                                          fuse)
    p = _fold_scalar_lambdas(p, lambda1, lambda2)
    if not _supported(u0, p, k) or iters < 1 \
            or not _backend_ok(interpret):
        from .fused import segment_fused_fixed
        return segment_fused_fixed(u0, p, iters, phi0, interpret=interpret)
    H, W = u0.shape
    phi0 = init_phi((H, W), p.init, u0.dtype) if phi0 is None else phi0
    n_pix = jnp.asarray(H * W, u0.dtype)
    sum_u = jnp.sum(u0)
    c1, c2 = region_means(u0, phi0, p.eps)

    from ..ops import pallas_packed
    use_packed = (packed
                  and pallas_packed.supports_packed_banded(H, W, k))
    if use_packed:
        phi_st = pallas_packed._pack(phi0)
        u0_st = pallas_packed._pack(u0)
    else:
        phi_st, u0_st = phi0, u0

    def chunk(carry, size):
        phi, c1, c2 = carry
        un = unroll if size % unroll == 0 else 1
        if use_packed:
            phi, parts = pallas_packed.packed_banded_chunk(
                phi, u0_st, c1, c2, p, size, unroll=un, fuse=fuse,
                interpret=interpret)
        else:
            phi, parts = pallas_banded.banded_chunk(
                phi, u0_st, c1, c2, p, size, unroll=un, fuse=fuse,
                interpret=interpret)
        c1, c2 = means_from_sums(parts[0], parts[1], sum_u, n_pix)
        return (phi, c1, c2)

    full, rem = iters // k, iters % k
    carry = (phi_st, c1, c2)
    if full:
        carry = jax.lax.scan(lambda cr, _: (chunk(cr, k), None), carry,
                             None, length=full)[0]
    if rem:
        carry = chunk(carry, rem)
    phi = carry[0]
    if use_packed:
        phi = pallas_packed._unpack(phi)
    return phi, phi >= 0


@functools.partial(jax.jit,
                   static_argnames=("p", "k", "unroll", "lambda1",
                                    "lambda2", "packed", "fuse",
                                    "interpret"))
def segment_banded(u0, p: CVParams = CVParams(),
                   phi0: Optional[jax.Array] = None,
                   k: Optional[int] = None,
                   lambda1=None, lambda2=None,
                   unroll: Optional[int] = None,
                   packed: Optional[bool] = None,
                   fuse: Optional[bool] = None,
                   interpret: bool = False) -> SegResult:
    """Tolerance-mode banded segmentation (chunk-granular convergence).

    Convergence/divergence logic is ops/reductions.loop_continue evaluated
    once per chunk on the final in-chunk iteration's partials; ``patience``
    is iteration-denominated (a good chunk credits k iterations - module
    docstring). (H, W, C) images run the multichannel chunk kernel with
    per-channel lambda tuples. k/unroll/packed default to the measured
    size-aware selection (auto_config).
    """
    if u0.ndim == 3:
        return _segment_banded_mc(u0, p, phi0, k, lambda1, lambda2,
                                  unroll, interpret, packed=packed,
                                  fuse=fuse)
    k, unroll, packed, fuse = auto_config(*u0.shape, k, unroll, packed,
                                          fuse)
    p = _fold_scalar_lambdas(p, lambda1, lambda2)
    if not _supported(u0, p, k) or not _backend_ok(interpret):
        from .fused import segment_fused
        return segment_fused(u0, p, phi0, interpret=interpret)
    H, W = u0.shape
    # validate conv_norm at trace time (same contract as the other drivers)
    _delta_from_partials(jnp.zeros((8,), u0.dtype), 1.0, p)
    phi0 = init_phi((H, W), p.init, u0.dtype) if phi0 is None else phi0
    n_pix = jnp.asarray(H * W, u0.dtype)
    sum_u = jnp.sum(u0)
    c1_0, c2_0 = region_means(u0, phi0, p.eps)

    from ..ops import pallas_packed
    use_packed = (packed
                  and pallas_packed.supports_packed_banded(H, W, k))
    phi_st = pallas_packed._pack(phi0) if use_packed else phi0
    u0_st = pallas_packed._pack(u0) if use_packed else u0

    def not_stopped(state):
        _, _, _, n, delta, streak = state
        done = jnp.logical_and(streak >= p.patience, n >= p.min_iter)
        diverged = jnp.logical_and(n > 0,
                                   jnp.logical_not(jnp.isfinite(delta)))
        return jnp.logical_not(jnp.logical_or(done, diverged))

    def run_chunk(state, size):
        phi, c1, c2, n, _, streak = state
        un = unroll if size % unroll == 0 else 1
        if use_packed:
            phi, parts = pallas_packed.packed_banded_chunk(
                phi, u0_st, c1, c2, p, size, unroll=un, fuse=fuse,
                interpret=interpret)
        else:
            phi, parts = pallas_banded.banded_chunk(
                phi, u0_st, c1, c2, p, size, unroll=un, fuse=fuse,
                interpret=interpret)
        c1, c2 = means_from_sums(parts[0], parts[1], sum_u, n_pix)
        delta = _delta_from_partials(parts, n_pix, p)
        # a below-tol chunk check credits its full SIZE iterations, so
        # ``patience`` keeps its per-iteration meaning across drivers
        # (chunk-granular: agreement with the per-iteration drivers is
        # within one chunk; VERDICT r2 weak #6)
        streak = jnp.where(delta < p.tol, streak + size, 0)
        return (phi, c1, c2, n + size, delta, streak)

    full = (p.max_iter // k) * k
    rem = p.max_iter - full

    def cond(state):
        return jnp.logical_and(state[3] < full, not_stopped(state))

    init = (phi_st, c1_0, c2_0, jnp.int32(0),
            jnp.asarray(jnp.inf, u0.dtype), jnp.int32(0))
    state = jax.lax.while_loop(cond, lambda s: run_chunk(s, k), init)
    if rem:
        state = jax.lax.cond(
            jnp.logical_and(state[3] < p.max_iter, not_stopped(state)),
            lambda s: run_chunk(s, rem), lambda s: s, state)
    phi, c1, c2, iters, delta, _ = state
    if use_packed:
        phi = pallas_packed._unpack(phi)
    return SegResult(phi, phi >= 0, iters, delta, c1, c2)


def auto_config_mc(H, W, C, k=None, unroll=None, packed=None, fuse=None):
    """(k, unroll, packed, fuse) for the multichannel banded drivers.

    Round-4 flip (2026-08-19, scripts/ab_mc_packed.py, asymptotic
    800-it single-dispatch protocol, artifacts/ab_mc_packed*_2026-08-19
    .out): the packed parity-plane mc kernel now WINS at both RGB
    sizes once it runs unroll=4 + fused-j — 4K RGB packed u4+fusej
    24585 vs flat auto 17634 (+39%), 8K RGB 23630 vs 14037 (+68%;
    packed RGB ~= packed gray 23.1 G — the channel surcharge almost
    vanishes in plane space). The round-3 "flat stays the mc default"
    verdict was an artifact of the pre-MXU-pack, pre-fused-j,
    3-dispatch protocol. Unlike the scalar kernel, mc packed unroll=4
    pays even UNFUSED (22047 vs u1's 15595 at 4K): the C-times-smaller
    bands (bp=80/40 at 4K/8K vs scalar 96/48) leave VMEM headroom.
    Measured ladder at 4K RGB: u1 15595, u2 18067, u4 22047,
    u1+fusej 22967, u4+fusej 24585. Auto therefore picks packed from
    4K area up (where the H % 16 / W % 256 / band-fit envelope
    allows), unroll=4 where k % 4 == 0 and bp <= 96 (the measured
    scalar+mc envelope), and fuse on the packed kernel for k <= 8
    (both u1 and u4 fused legs measured ahead; compiles 20-218 s).
    At 16K RGB the pick is a measured WASH (packed 15784 vs flat
    15732 at 400 it): mc bp halves per size doubling (80/40/16) so
    the band-halo redundancy tax reaches 2.5x there — packed stays
    the auto for uniformity, not for margin.

    Flat-path policy unchanged (scripts/ab_fusej_mc.py 2026-08-18):
    u4+fusej at >= 4K area (+18.7%/+7.2% vs unfused at 4K/8K RGB);
    flat u1 x fusej is a compile-time VMEM OOM (63M register spills:
    the fused k*u=8 trip count spills where u4's in-loop trip of 2
    does not), so the flat path never pairs fuse with unroll=1;
    below 4K area fusej is unmeasured and stays off."""
    from ..ops import pallas_packed

    if k is None:
        k = 8
    if packed is None:
        packed = (H * W >= 2160 * 3840
                  and pallas_packed.supports_packed_banded_mc(H, W, k, C))
    if unroll is None:
        if packed:
            bp, _, _ = pallas_packed.band_rows_packed_mc(H, W, k, C)
            unroll = 4 if (k % 4 == 0 and bp <= 96) else 1
        else:
            unroll = 4
    if fuse is None:
        if packed:
            fuse = k <= 8 and H * W >= 2160 * 3840
        else:
            fuse = unroll == 4 and k <= 8 and H * W >= 2160 * 3840
    return k, unroll, packed, fuse


def _segment_banded_mc_fixed(u0, p, iters, k, phi0, lambda1, lambda2,
                             unroll, interpret, packed=None, fuse=None):
    """Vector-valued fixed-iteration banded run (channels-first kernel,
    per-channel frozen means per chunk)."""
    H, W, C = u0.shape
    k, unroll, packed, fuse = auto_config_mc(H, W, C, k, unroll, packed,
                                             fuse)
    if not _supported_mc(u0, p, k) or iters < 1 \
            or not _backend_ok(interpret):
        from .fused import segment_fused_fixed
        return segment_fused_fixed(u0, p, iters, phi0, lambda1=lambda1,
                                   lambda2=lambda2, interpret=interpret)
    ucf = jnp.transpose(u0, (2, 0, 1))
    phi0 = init_phi((H, W), p.init, u0.dtype) if phi0 is None else phi0
    n_pix = jnp.asarray(H * W, u0.dtype)
    sum_u = jnp.sum(ucf, axis=(1, 2))  # (C,)
    c1, c2 = region_means(u0, phi0, p.eps)

    from ..ops import pallas_packed
    use_packed = (packed
                  and pallas_packed.supports_packed_banded_mc(H, W, k, C))
    if use_packed:
        phi_st = pallas_packed._pack(phi0)
        u0_st = pallas_packed._pack_mc(ucf)
    else:
        phi_st, u0_st = phi0, ucf

    def chunk(carry, size):
        phi, c1, c2 = carry
        un = unroll if size % unroll == 0 else 1
        if use_packed:
            phi, parts = pallas_packed.packed_banded_chunk_mc(
                phi, u0_st, c1, c2, p, size, unroll=un, fuse=fuse,
                lambda1=lambda1, lambda2=lambda2, interpret=interpret)
        else:
            phi, parts = pallas_banded.banded_chunk_mc(
                phi, u0_st, c1, c2, p, size, unroll=un, lambda1=lambda1,
                lambda2=lambda2, fuse=fuse, interpret=interpret)
        c1, c2 = means_from_sums(parts[:C], parts[C], sum_u, n_pix)
        return (phi, c1, c2)

    full, rem = iters // k, iters % k
    carry = (phi_st, c1, c2)
    if full:
        carry = jax.lax.scan(lambda cr, _: (chunk(cr, k), None), carry,
                             None, length=full)[0]
    if rem:
        carry = chunk(carry, rem)
    phi = carry[0]
    if use_packed:
        phi = pallas_packed._unpack(phi)
    return phi, phi >= 0


def _segment_banded_mc(u0, p, phi0, k, lambda1, lambda2, unroll,
                       interpret, packed=None, fuse=None):
    """Tolerance-mode banded segmentation for (H, W, C) images."""
    H, W, C = u0.shape
    k, unroll, packed, fuse = auto_config_mc(H, W, C, k, unroll, packed,
                                             fuse)
    if not _supported_mc(u0, p, k) or not _backend_ok(interpret):
        from .fused import segment_fused
        return segment_fused(u0, p, phi0, lambda1=lambda1, lambda2=lambda2,
                             interpret=interpret)
    _delta_from_partials(jnp.zeros((C + 4,), u0.dtype), 1.0, p,
                         offset=C - 1)
    ucf = jnp.transpose(u0, (2, 0, 1))
    phi0 = init_phi((H, W), p.init, u0.dtype) if phi0 is None else phi0
    n_pix = jnp.asarray(H * W, u0.dtype)
    sum_u = jnp.sum(ucf, axis=(1, 2))
    c1_0, c2_0 = region_means(u0, phi0, p.eps)

    from ..ops import pallas_packed
    use_packed = (packed
                  and pallas_packed.supports_packed_banded_mc(H, W, k, C))
    if use_packed:
        phi_init = pallas_packed._pack(phi0)
        u0_st = pallas_packed._pack_mc(ucf)
    else:
        phi_init, u0_st = phi0, ucf

    def not_stopped(state):
        _, _, _, n, delta, streak = state
        done = jnp.logical_and(streak >= p.patience, n >= p.min_iter)
        diverged = jnp.logical_and(n > 0,
                                   jnp.logical_not(jnp.isfinite(delta)))
        return jnp.logical_not(jnp.logical_or(done, diverged))

    def run_chunk(state, size):
        phi, c1, c2, n, _, streak = state
        un = unroll if size % unroll == 0 else 1
        if use_packed:
            phi, parts = pallas_packed.packed_banded_chunk_mc(
                phi, u0_st, c1, c2, p, size, unroll=un, fuse=fuse,
                lambda1=lambda1, lambda2=lambda2, interpret=interpret)
        else:
            phi, parts = pallas_banded.banded_chunk_mc(
                phi, u0_st, c1, c2, p, size, unroll=un, lambda1=lambda1,
                lambda2=lambda2, fuse=fuse, interpret=interpret)
        c1, c2 = means_from_sums(parts[:C], parts[C], sum_u, n_pix)
        delta = _delta_from_partials(parts, n_pix, p, offset=C - 1)
        # iteration-denominated patience (see the scalar driver)
        streak = jnp.where(delta < p.tol, streak + size, 0)
        return (phi, c1, c2, n + size, delta, streak)

    full = (p.max_iter // k) * k
    rem = p.max_iter - full

    def cond(state):
        return jnp.logical_and(state[3] < full, not_stopped(state))

    init = (phi_init, c1_0, c2_0, jnp.int32(0),
            jnp.asarray(jnp.inf, u0.dtype), jnp.int32(0))
    state = jax.lax.while_loop(cond, lambda s: run_chunk(s, k), init)
    if rem:
        state = jax.lax.cond(
            jnp.logical_and(state[3] < p.max_iter, not_stopped(state)),
            lambda s: run_chunk(s, rem), lambda s: s, state)
    phi, c1, c2, iters, delta, _ = state
    if use_packed:
        phi = pallas_packed._unpack(phi)
    return SegResult(phi, phi >= 0, iters, delta, c1, c2)
