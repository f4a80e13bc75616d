"""VMEM-resident segmentation drivers for small/medium images.

Wraps ops/pallas_resident.py: phi stays in VMEM across iterations inside
one pallas_call, so the per-iteration kernel-launch + HBM round-trip of
the banded path disappears. Measured on v5e vs the banded fused driver:
+13% at 256^2, +30% at 512^2, +91% at 1024^2 (the banded kernel is HBM
round-trip bound there; this one does zero HBM traffic per iteration).

Trajectory note: the means are reduced in-kernel (Mosaic summation order)
rather than by XLA, so trajectories drift from the jnp/banded paths at
the f32 ulp level from iteration 2 on - same equivalence class as every
reduction-order change (masks agree; see tests/test_resident.py).

Tolerance mode runs in CHUNKS of ``chunk`` iterations per kernel call and
checks convergence between chunks from the per-iteration partials rows,
so a converged run may execute up to chunk-1 extra iterations (harmless:
a converged contour is a fixed point of the flips metric). The reported
``iters`` is the chunk boundary where convergence was declared. The
max_iter cap is exact: full chunks run in the while_loop and the
remainder (max_iter % chunk, a static size) runs once at the end.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import pallas_resident
from ..ops.reductions import region_means
from ..params import CVParams
from ..utils.init_phi import init_phi
from .fused import _backend_ok, _fold_scalar_lambdas
from .scalar import SegResult


def _auto_unroll(iters: int, cap: int = 4) -> int:
    """Largest power of two <= cap dividing iters (fixed-mode grid-step
    amortization; trajectory-identical for the resident kernels).

    Measured on v5e: unrolling doubles 256^2 scalar throughput at u=4
    (the fixed per-grid-step cost dominates there), but HURTS the
    reduction-heavy variants (mc / multiphase / batched: per-channel or
    per-phase sums serialize inside the unrolled chain), so only the
    scalar resident driver uses it."""
    u = 1
    while u * 2 <= cap and iters % (u * 2) == 0:
        u *= 2
    return u


def _delta_rows(parts, n_pix, p: CVParams):
    """Per-iteration convergence metric from the (iters, 8) partials."""
    if p.conv_norm == "flips":
        # 0 * s_dphi2 NaN-poisons the rows when phi went non-finite
        return parts[:, 3] / n_pix + 0.0 * parts[:, 2]
    if p.conv_norm == "rms":
        return jnp.sqrt(parts[:, 2] / n_pix)
    if p.conv_norm == "mean_abs":
        return parts[:, 4] / n_pix
    raise ValueError(f"unknown conv_norm {p.conv_norm!r}")


@functools.partial(jax.jit,
                   static_argnames=("p", "iters", "lambda1", "lambda2",
                                    "interpret"))
def segment_resident_fixed(u0, p: CVParams = CVParams(), iters: int = 100,
                           phi0: Optional[jax.Array] = None,
                           lambda1=None, lambda2=None,
                           interpret: bool = False):
    """Fixed-iteration VMEM-resident run. Returns (phi, mask).

    Falls back to the banded fused driver when the image does not fit the
    resident envelope, when a non-red-black ordering is requested, or when
    a reinit cadence is set (reinit must run between kernel calls).

    Vector-valued (H, W, C) images route to the multichannel resident
    kernel (exact per-iteration per-channel means, zero HBM traffic per
    iteration), with the same fused-mc fallback off the envelope.

    Where the shape allows (H % 16, W % 256) the parity-plane packed
    variants run instead (ops/pallas_packed.py): same exact-means
    schedule with mask-free half-sweeps - measured +6-13% across
    256^2/512^2 scalar and 512^2 RGB on v5e; reduction-order trajectory
    class (masks identical, docs/BENCHMARKS.md).
    """
    from ..ops import pallas_packed

    if u0.ndim == 3:
        H, W, C = u0.shape
        if (not pallas_resident.supports_resident_mc(H, W, C)
                or p.order != "redblack" or p.reinit_every
                or not _backend_ok(interpret)):
            from .fused import segment_fused_fixed
            return segment_fused_fixed(u0, p, iters, phi0, lambda1=lambda1,
                                       lambda2=lambda2, interpret=interpret)
        phi0 = init_phi((H, W), p.init, u0.dtype) if phi0 is None else phi0
        ucf = jnp.transpose(u0, (2, 0, 1))
        if pallas_packed.supports_packed_resident_mc(H, W, C):
            un = 2 if iters % 2 == 0 else 1  # measured best (mc, 512^2)
            phi, _ = pallas_packed.packed_resident_iterations_mc(
                phi0, ucf, p, iters, lambda1, lambda2, unroll=un,
                interpret=interpret)
        else:
            phi, _ = pallas_resident.resident_iterations_mc(
                phi0, ucf, p, iters, lambda1, lambda2, interpret=interpret)
        return phi, phi >= 0
    p = _fold_scalar_lambdas(p, lambda1, lambda2)
    H, W = u0.shape
    if (not pallas_resident.supports_resident(H, W)
            or p.order != "redblack" or p.reinit_every
            or not _backend_ok(interpret)):
        from .fused import segment_fused_fixed
        return segment_fused_fixed(u0, p, iters, phi0, interpret=interpret)
    phi0 = init_phi((H, W), p.init, u0.dtype) if phi0 is None else phi0
    if pallas_packed.supports_packed_resident(H, W):
        # measured: per-grid-step cost dominates small images (unroll
        # helps at <= 256^2); at 512^2 the un-unrolled packed body wins
        un = _auto_unroll(iters) if H * W <= 256 * 256 else 1
        phi, _ = pallas_packed.packed_resident_iterations(
            phi0, u0, p, iters, unroll=un, interpret=interpret)
    else:
        phi, _ = pallas_resident.resident_iterations(
            phi0, u0, p, iters, unroll=_auto_unroll(iters),
            interpret=interpret)
    return phi, phi >= 0


@functools.partial(jax.jit,
                   static_argnames=("p", "chunk", "lambda1", "lambda2",
                                    "interpret"))
def segment_resident(u0, p: CVParams = CVParams(),
                     phi0: Optional[jax.Array] = None,
                     chunk: int = 16, lambda1=None, lambda2=None,
                     interpret: bool = False) -> SegResult:
    """Tolerance-mode VMEM-resident segmentation (chunked convergence).

    Runs ``chunk`` iterations per kernel call; between chunks the
    per-iteration partials rows drive the same streak/patience/min_iter/
    divergence logic as every other driver (ops/reductions.loop_continue
    semantics, evaluated per row).

    Vector-valued (H, W, C) images fall back to the fused tolerance
    driver (the resident mc kernel has no per-iteration partials-row
    convergence surface; fixed mode keeps the mc fast path).
    """
    if u0.ndim == 3:
        from .fused import segment_fused
        return segment_fused(u0, p, phi0, lambda1=lambda1, lambda2=lambda2,
                             interpret=interpret)
    p = _fold_scalar_lambdas(p, lambda1, lambda2)
    H, W = u0.shape
    if (not pallas_resident.supports_resident(H, W)
            or p.order != "redblack" or p.reinit_every
            or not _backend_ok(interpret)):
        from .fused import segment_fused
        return segment_fused(u0, p, phi0, interpret=interpret)
    if chunk < 1:
        raise ValueError("chunk must be >= 1")
    # validate conv_norm at trace time (same contract as the other drivers)
    _delta_rows(jnp.zeros((1, 8), u0.dtype), 1.0, p)

    phi0 = init_phi((H, W), p.init, u0.dtype) if phi0 is None else phi0
    n_pix = jnp.asarray(H * W, u0.dtype)

    def scan_rows(deltas, streak0):
        """Thread the streak counter through one chunk's delta rows."""
        def step(streak, d):
            streak = jnp.where(d < p.tol, streak + 1, 0)
            return streak, streak
        return jax.lax.scan(step, streak0, deltas)

    def not_stopped(state):
        _, n, _, streak, diverged = state
        done = jnp.logical_and(streak >= p.patience, n >= p.min_iter)
        return jnp.logical_not(jnp.logical_or(done, diverged))

    from ..ops import pallas_packed
    use_packed = pallas_packed.supports_packed_resident(H, W)

    def run_chunk(state, size):
        phi, n, _, streak, _ = state
        if use_packed:
            # unroll stays 1: the partials rows ARE the per-iteration
            # convergence surface this driver scans
            phi_new, parts = pallas_packed.packed_resident_iterations(
                phi, u0, p, size, interpret=interpret)
        else:
            phi_new, parts = pallas_resident.resident_iterations(
                phi, u0, p, size, interpret=interpret)
        deltas = _delta_rows(parts, n_pix, p)
        streak, _ = scan_rows(deltas, streak)
        diverged = jnp.any(jnp.logical_not(jnp.isfinite(deltas)))
        return (phi_new, n + size, deltas[-1], streak, diverged)

    # full chunks via while_loop, then the static remainder in a cond, so
    # the run stops EXACTLY at max_iter (not rounded up to the chunk)
    full = (p.max_iter // chunk) * chunk
    rem = p.max_iter - full

    def cond(state):
        return jnp.logical_and(state[1] < full, not_stopped(state))

    init = (phi0, jnp.int32(0), jnp.asarray(jnp.inf, u0.dtype),
            jnp.int32(0), jnp.bool_(False))
    state = jax.lax.while_loop(cond, lambda s: run_chunk(s, chunk), init)
    if rem:
        state = jax.lax.cond(
            jnp.logical_and(state[1] < p.max_iter, not_stopped(state)),
            lambda s: run_chunk(s, rem), lambda s: s, state)
    phi, iters, delta, _, _ = state
    c1, c2 = region_means(u0, phi, p.eps)
    return SegResult(phi, phi >= 0, iters, delta, c1, c2)


@functools.partial(jax.jit,
                   static_argnames=("p", "iters", "lambda1", "lambda2",
                                    "interpret"))
def segment_stack_resident_fixed(u0, p: CVParams = CVParams(),
                                 iters: int = 100,
                                 phi0: Optional[jax.Array] = None,
                                 lambda1=None, lambda2=None,
                                 interpret: bool = False):
    """Fixed-iteration stack segmentation, one resident kernel call.

    (N, H, W) grayscale stacks where each frame fits the VMEM envelope:
    frames are an outer sequential grid dimension; each frame runs its
    ``iters`` iterations entirely in VMEM (one in-DMA, one out-DMA per
    frame total). Falls back to the banded batched driver otherwise.
    Returns (phi (N, H, W), mask).
    """
    p = _fold_scalar_lambdas(p, lambda1, lambda2)
    N, H, W = u0.shape
    if (not pallas_resident.supports_resident(H, W)
            or p.order != "redblack" or p.reinit_every
            or not _backend_ok(interpret)):
        from .batched import segment_stack_fused_fixed
        return segment_stack_fused_fixed(u0, p, iters, phi0,
                                         interpret=interpret)
    if phi0 is None:
        phi0 = jnp.broadcast_to(init_phi((H, W), p.init, u0.dtype),
                                (N, H, W))
    from ..ops import pallas_packed
    if pallas_packed.supports_packed_resident(H, W):
        un = 2 if iters % 2 == 0 else 1  # measured best (batch, 512^2)
        phis, _ = pallas_packed.packed_resident_iterations_batch(
            phi0, u0, p, iters, unroll=un, interpret=interpret)
    else:
        phis, _ = pallas_resident.resident_iterations_batch(
            phi0, u0, p, iters, interpret=interpret)
    return phis, phis >= 0
