"""Flagship single-chip driver: fused-Pallas-kernel segmentation.

The whole solver is `jit(while_loop(fused_iteration))`: one Pallas kernel
per iteration (ops/pallas_sweep.py - red+black sweep and next-iteration
reductions in a single ~3-HBM-pass kernel), scalars carried on device, one
host<->device crossing per segmentation. Trajectory is EXACTLY the jnp
red-black path (verified elementwise in tests/test_pallas.py); shapes the
kernel doesn't support (W % 128 != 0 or tiny H) fall back to the jnp path
transparently, so this is safe as the default entry point on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pallas_sweep
from ..ops.reductions import loop_continue, means_from_sums, region_means
from ..params import CVParams
from ..utils.init_phi import init_phi
from .scalar import SegResult, segment as _segment_jnp, step as _step_jnp


def _backend_ok(interpret: bool) -> bool:
    """Pallas/Mosaic kernels compile only on the TPU backend;
    interpret=True runs them anywhere. Every driver's routing guard
    includes this so the documented "transparent jnp fallback" covers
    the backend dimension too, not just shape/order (found via
    examples/demo.py crashing on CPU - round 4)."""
    return interpret or jax.default_backend() == "tpu"


def _delta_from_partials(parts, n_pixels, p: CVParams, offset: int = 0):
    """Decode the convergence metric from kernel partials.

    Layout: [s_uH x C, s_H, s_dphi2, flips, s_absdphi] with ``offset`` =
    C - 1 extra leading channel slots (0 for grayscale); shared by the
    fused, batched and sharded drivers.
    """
    if p.conv_norm == "flips":
        # 0 * s_dphi2 NaN-poisons the metric when phi went non-finite
        # (sign comparisons alone would count 0 flips on a NaN field)
        return parts[offset + 3] / n_pixels + 0.0 * parts[offset + 2]
    if p.conv_norm == "rms":
        return jnp.sqrt(parts[offset + 2] / n_pixels)
    if p.conv_norm == "mean_abs":
        return parts[offset + 4] / n_pixels
    raise ValueError(f"unknown conv_norm {p.conv_norm!r}")


def _fold_scalar_lambdas(p: CVParams, lambda1, lambda2) -> CVParams:
    """Grayscale path: lambda overrides fold into the (static) params the
    kernel bakes in; per-channel tuples are a vector-image concept."""
    kw = {}
    if lambda1 is not None:
        if np.ndim(lambda1) > 0 and len(np.atleast_1d(lambda1)) > 1:
            raise ValueError("per-channel lambda1 needs an (H, W, C) image")
        kw["lambda1"] = float(np.atleast_1d(lambda1)[0])
    if lambda2 is not None:
        if np.ndim(lambda2) > 0 and len(np.atleast_1d(lambda2)) > 1:
            raise ValueError("per-channel lambda2 needs an (H, W, C) image")
        kw["lambda2"] = float(np.atleast_1d(lambda2)[0])
    return p.replace(**kw) if kw else p


def _reinit_and_refresh_means(phi, n, u0, p: CVParams):
    """Apply the reinit cadence, then refresh c1/c2 from the redistanced
    level set (reinit rescales |phi|, which moves H_eps everywhere - the
    carried kernel partials would be stale). Only used when
    p.reinit_every > 0 (a static branch; the common case stays on the
    carried-partials fast path)."""
    from ..ops.reinit import maybe_reinit

    phi = maybe_reinit(phi, n, p)
    c1, c2 = region_means(u0, phi, p.eps)
    return phi, c1, c2


@functools.partial(jax.jit,
                   static_argnames=("p", "lambda1", "lambda2", "interpret",
                                    "fixed", "max_iter"))
def segment_fused(u0, p: CVParams = CVParams(),
                  phi0: Optional[jax.Array] = None,
                  lambda1=None, lambda2=None,
                  interpret: bool = False, fixed: bool = False,
                  max_iter: Optional[int] = None) -> SegResult:
    """Tolerance-mode segmentation on the fused kernel.

    Grayscale (H, W) or vector-valued (H, W, C) - the latter dispatches to
    the multichannel kernel (ops/pallas_sweep_mc.py) with per-channel
    lambda weight tuples. ``fixed=True`` runs exactly ``max_iter`` (or
    p.max_iter) iterations regardless of tolerance, still returning the
    full SegResult (iters/delta/c1/c2) - the degenerate-mesh fast path of
    parallel/sharded.py uses this for eval config 4.
    """
    cap = p.max_iter if max_iter is None else max_iter
    if u0.ndim == 3:
        return _segment_fused_mc(u0, p, phi0, lambda1, lambda2, interpret,
                                 fixed, cap)
    p = _fold_scalar_lambdas(p, lambda1, lambda2)
    H, W = u0.shape
    if not pallas_sweep.supports(H, W) or p.order != "redblack" \
            or not _backend_ok(interpret):
        # the fused kernel implements red-black only; explicit wavefront/
        # jacobi requests must run the jnp path regardless of shape
        if fixed:
            # a negative tol can never be reached, so the loop runs to cap
            return _segment_jnp(u0, p.replace(max_iter=cap, tol=-1.0), phi0)
        return _segment_jnp(u0, p.replace(max_iter=cap), phi0)

    phi0 = init_phi((H, W), p.init, u0.dtype) if phi0 is None else phi0
    n_pix = jnp.asarray(H * W, u0.dtype)
    sum_u = jnp.sum(u0)

    c1_0, c2_0 = region_means(u0, phi0, p.eps)

    def cond(state):
        _, _, _, n, delta, streak = state
        if fixed:
            return n < cap
        return loop_continue(n, delta, streak, p, cap)

    def body(state):
        phi, c1, c2, n, _, streak = state
        phi_new, parts = pallas_sweep.fused_iteration(
            phi, u0, c1, c2, p, interpret=interpret)
        c1n, c2n = means_from_sums(parts[0], parts[1], sum_u, n_pix)
        delta = _delta_from_partials(parts, n_pix, p)
        if p.reinit_every:
            phi_new, c1n, c2n = _reinit_and_refresh_means(phi_new, n, u0, p)
        streak = jnp.where(delta < p.tol, streak + 1, 0)
        return (phi_new, c1n, c2n, n + 1, delta, streak)

    init = (phi0, c1_0, c2_0, jnp.int32(0),
            jnp.asarray(jnp.inf, u0.dtype), jnp.int32(0))
    phi, c1, c2, iters, delta, _ = jax.lax.while_loop(cond, body, init)
    return SegResult(phi, phi >= 0, iters, delta, c1, c2)


def _segment_fused_mc(u0, p, phi0, lambda1, lambda2, interpret,
                      fixed=False, cap=None):
    """Vector-valued tolerance-mode driver over the multichannel kernel."""
    from ..ops import pallas_sweep_mc
    from ..models.vector import segment_vector

    cap = p.max_iter if cap is None else cap
    H, W, C = u0.shape
    if not pallas_sweep_mc.supports_mc(H, W, C) or p.order != "redblack" \
            or not _backend_ok(interpret):
        l1, l2 = p.channel_lambdas(C, lambda1, lambda2)
        pf = p.replace(max_iter=cap, tol=-1.0) if fixed \
            else p.replace(max_iter=cap)
        return segment_vector(u0, pf, phi0, l1, l2)

    ucf = jnp.transpose(u0, (2, 0, 1))  # channels-first for the kernel
    phi0 = init_phi((H, W), p.init, u0.dtype) if phi0 is None else phi0
    n_pix = jnp.asarray(H * W, u0.dtype)
    sum_u = jnp.sum(ucf, axis=(1, 2))  # (C,)
    c1_0, c2_0 = region_means(u0, phi0, p.eps)

    def cond(state):
        _, _, _, n, delta, streak = state
        if fixed:
            return n < cap
        return loop_continue(n, delta, streak, p, cap)

    def body(state):
        phi, c1, c2, n, _, streak = state
        phi_new, parts = pallas_sweep_mc.fused_iteration_mc(
            phi, ucf, c1, c2, p, lambda1, lambda2, interpret=interpret)
        c1n, c2n = means_from_sums(parts[:C], parts[C], sum_u, n_pix)
        delta = _delta_from_partials(parts, n_pix, p, offset=C - 1)
        if p.reinit_every:
            phi_new, c1n, c2n = _reinit_and_refresh_means(phi_new, n, u0, p)
        streak = jnp.where(delta < p.tol, streak + 1, 0)
        return (phi_new, c1n, c2n, n + 1, delta, streak)

    init = (phi0, c1_0, c2_0, jnp.int32(0),
            jnp.asarray(jnp.inf, u0.dtype), jnp.int32(0))
    phi, c1, c2, iters, delta, _ = jax.lax.while_loop(cond, body, init)
    return SegResult(phi, phi >= 0, iters, delta, c1, c2)


@functools.partial(jax.jit,
                   static_argnames=("p", "iters", "lambda1", "lambda2",
                                    "interpret"))
def segment_fused_fixed(u0, p: CVParams = CVParams(), iters: int = 100,
                        phi0: Optional[jax.Array] = None,
                        lambda1=None, lambda2=None,
                        interpret: bool = False):
    """Fixed-iteration fused run (the benchmark loop). Returns (phi, mask).

    Handles grayscale (H, W) and vector-valued (H, W, C) inputs (the
    latter through the multichannel kernel, jnp fallback when unaligned).
    """
    if u0.ndim == 3:
        return _segment_fused_mc_fixed(u0, p, iters, phi0, lambda1,
                                       lambda2, interpret)
    p = _fold_scalar_lambdas(p, lambda1, lambda2)
    H, W = u0.shape
    if not pallas_sweep.supports(H, W) or p.order != "redblack" \
            or not _backend_ok(interpret):
        from ..ops.reinit import maybe_reinit

        phi0 = init_phi((H, W), p.init, u0.dtype) if phi0 is None else phi0

        def body_jnp(carry, _):
            phi, n = carry
            phi = _step_jnp(phi, u0, p)[0]
            return (maybe_reinit(phi, n, p), n + 1), None

        (phi, _), _ = jax.lax.scan(body_jnp, (phi0, jnp.int32(0)), None,
                                   length=iters)
        return phi, phi >= 0

    phi0 = init_phi((H, W), p.init, u0.dtype) if phi0 is None else phi0
    n_pix = jnp.asarray(H * W, u0.dtype)
    sum_u = jnp.sum(u0)
    c1_0, c2_0 = region_means(u0, phi0, p.eps)

    def body(carry, _):
        phi, c1, c2, n = carry
        phi_new, parts = pallas_sweep.fused_iteration(
            phi, u0, c1, c2, p, interpret=interpret)
        c1n, c2n = means_from_sums(parts[0], parts[1], sum_u, n_pix)
        if p.reinit_every:
            phi_new, c1n, c2n = _reinit_and_refresh_means(phi_new, n, u0, p)
        return (phi_new, c1n, c2n, n + 1), None

    (phi, _, _, _), _ = jax.lax.scan(
        body, (phi0, c1_0, c2_0, jnp.int32(0)), None, length=iters)
    return phi, phi >= 0


def _segment_fused_mc_fixed(u0, p, iters, phi0, lambda1, lambda2, interpret):
    from ..ops import pallas_sweep_mc

    H, W, C = u0.shape
    if not pallas_sweep_mc.supports_mc(H, W, C) or p.order != "redblack" \
            or not _backend_ok(interpret):
        from .scalar import segment_fixed
        l1, l2 = p.channel_lambdas(C, lambda1, lambda2)
        tr = segment_fixed(u0, p, iters=iters, phi0=phi0,
                           lambda1=l1, lambda2=l2)
        return tr.phi, tr.mask

    ucf = jnp.transpose(u0, (2, 0, 1))
    phi0 = init_phi((H, W), p.init, u0.dtype) if phi0 is None else phi0
    n_pix = jnp.asarray(H * W, u0.dtype)
    sum_u = jnp.sum(ucf, axis=(1, 2))
    c1_0, c2_0 = region_means(u0, phi0, p.eps)

    def body(carry, _):
        phi, c1, c2, n = carry
        phi_new, parts = pallas_sweep_mc.fused_iteration_mc(
            phi, ucf, c1, c2, p, lambda1, lambda2, interpret=interpret)
        c1n, c2n = means_from_sums(parts[:C], parts[C], sum_u, n_pix)
        if p.reinit_every:
            phi_new, c1n, c2n = _reinit_and_refresh_means(phi_new, n, u0, p)
        return (phi_new, c1n, c2n, n + 1), None

    (phi, _, _, _), _ = jax.lax.scan(
        body, (phi0, c1_0, c2_0, jnp.int32(0)), None, length=iters)
    return phi, phi >= 0
