"""Multiphase Vese-Chan segmentation (SURVEY.md C10, §3.3; B:9).

M coupled level sets partition the image into 2^M phases (Vese & Chan 2002,
"A Multiphase Level Set Framework..."). Energy:

    F = sum_s  int (u0 - c_s)^2 w_s  +  mu sum_m Length(phi_m)
    w_s = prod_m [ H(phi_m) if s_m else (1 - H(phi_m)) ],  s in {0,1}^M

Gradient flow for phi_m (the coupling term of §3.3 for M = 2):

    dphi_m/dt = delta(phi_m) [ mu kappa(phi_m) - nu
                  - sum_{s: s_m=1} (u0-c_s)^2 prod_{k!=m} w-factor_k
                  + sum_{s: s_m=0} (u0-c_s)^2 prod_{k!=m} w-factor_k ]

Each phi_m is advanced by the same semi-implicit sweep as the scalar model
(ops/sweep.py), with the data term f_m built from the *current* state:
sweeps are sequential over m within an iteration (phi_1's sweep sees
phi_0's updated Heaviside), and the 2^M phase means are computed once per
outer iteration - "two coupled GS sweeps + 4 reductions per iteration" for
M = 2, exactly the structure SURVEY.md §3.3 describes.

Vector-valued (H, W, C) images are supported: phase means are per-channel
and squared distances average over channels.

TPU notes: everything is a fixed-M python loop over vectorized full-grid
ops - under jit this unrolls into one fused program; no dynamic shapes.
The M phis are carried as a single (M, H, W) array so the batched/sharded
paths treat multiphase transparently.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.numerics import heaviside
from ..ops.reductions import loop_continue
from ..ops.sweep import semi_implicit_step
from ..params import CVParams
from ..utils.init_phi import checkerboard, circle


def _sqdist(u0, c):
    """(u0 - c)^2, channel-averaged for vector-valued images."""
    if u0.ndim == 3:
        return jnp.mean((u0 - c) ** 2, axis=-1)
    return (u0 - c) ** 2


def phase_weights(phis, eps: float):
    """The 2^M soft phase indicators w_s, ordered by bitmask s.

    Bit m of s set <=> inside phi_m (H factor), else (1 - H).
    Returns a list of (H, W) arrays, length 2^M.
    """
    m_sets = phis.shape[0]
    hs = [heaviside(phis[m], eps) for m in range(m_sets)]
    ws = []
    for s in range(2 ** m_sets):
        w = None
        for m in range(m_sets):
            factor = hs[m] if (s >> m) & 1 else (1.0 - hs[m])
            w = factor if w is None else w * factor
        ws.append(w)
    return ws


def phase_means(u0, phis, eps: float):
    """Means c_s of u0 over each soft phase (per-channel for RGB)."""
    ws = phase_weights(phis, eps)
    tiny = 1e-30
    cs = []
    for w in ws:
        if u0.ndim == 3:
            num = jnp.sum(u0 * w[..., None], axis=(0, 1))
            den = jnp.maximum(jnp.sum(w), tiny)
        else:
            num = jnp.sum(u0 * w)
            den = jnp.maximum(jnp.sum(w), tiny)
        cs.append(num / den)
    return cs


def _coupling_term(u0, phis, cs, m: int, p: CVParams):
    """Data-fitting force on phi_m given all current level sets.

    ``phis``: stacked (M, H, W) array or a length-M sequence of (H, W).
    """
    m_sets = len(phis)
    f = jnp.zeros(u0.shape[:2], dtype=phis[0].dtype)
    hs = [heaviside(phis[k], p.eps) for k in range(m_sets)]
    for s in range(2 ** m_sets):
        d = _sqdist(u0, cs[s])
        w_other = None
        for k in range(m_sets):
            if k == m:
                continue
            factor = hs[k] if (s >> k) & 1 else (1.0 - hs[k])
            w_other = factor if w_other is None else w_other * factor
        if w_other is None:  # M == 1
            w_other = jnp.ones_like(f)
        sign = -1.0 if (s >> m) & 1 else 1.0
        f = f + sign * d * w_other
    return f - p.nu


def multiphase_step(phis, u0, p: CVParams, use_pallas: bool = False,
                    interpret: bool = False):
    """One outer iteration: 2^M means, then M sequential sweeps.

    use_pallas routes each level set's sweep through the fused band
    kernel in precomputed-data-term mode (ops/pallas_sweep.fused_sweep) -
    the TPU fast path for SURVEY.md C10; the coupling terms stay jnp.
    """
    cs = phase_means(u0, phis, p.eps)
    # work on a list of (H, W) level sets and stack once: sequential
    # .at[m].set() on the stacked array fuses the kernel output into a
    # full (M, H, W) scoped-VMEM copy per sweep (compiled OOM at 512^2)
    new = [phis[m] for m in range(phis.shape[0])]
    for m in range(phis.shape[0]):
        f = _coupling_term(u0, new, cs, m, p)
        if use_pallas:
            from ..ops.pallas_sweep import fused_sweep
            new[m], _ = fused_sweep(new[m], f, p, interpret=interpret)
        else:
            new[m] = semi_implicit_step(new[m], f, p)
    return jnp.stack(new), cs


def _mp2_route(u0, p: CVParams, m_sets: int, use_pallas,
               allow_resident: bool = True):
    """Resolve the multiphase kernel switch.

    Returns one of:
      'resident' - fully fused 4-phase VMEM-resident kernel
                   (ops/pallas_multiphase.mp2_resident_iterations)
      'banded'   - fully fused 4-phase banded kernel (mp2_iteration)
      'sweeps'   - per-level-set fused_sweep kernels with jnp coupling
                   (the only kernel option for M != 2 or vector images)
      None       - pure jnp path

    ``use_pallas=None`` is AUTO: the fused kernels on a TPU backend
    (round-1 ablations showed the per-sweep kernels alone buy ~5%
    because the jnp coupling terms dominate; the fully fused M = 2
    kernel removes that bottleneck, so auto is now ON), jnp elsewhere.
    Explicit True picks the best supported kernel route or raises.
    """
    from ..ops import pallas_multiphase, pallas_sweep

    mp2_ok = (m_sets == 2 and u0.ndim == 2 and p.order == "redblack")
    if use_pallas is None:
        import jax
        if jax.default_backend() == "tpu" and mp2_ok:
            if (allow_resident and not p.reinit_every
                    and pallas_multiphase.supports_mp2_resident(*u0.shape)):
                return "resident"
            if pallas_multiphase.supports_mp2(*u0.shape):
                return "banded"
        return None
    if not use_pallas:
        return None
    if mp2_ok:
        if (allow_resident and not p.reinit_every
                and pallas_multiphase.supports_mp2_resident(*u0.shape)):
            return "resident"
        if pallas_multiphase.supports_mp2(*u0.shape):
            return "banded"
    if p.order == "redblack" and pallas_sweep.supports(*u0.shape[:2]):
        return "sweeps"
    raise ValueError(f"pallas multiphase path unsupported for "
                     f"{u0.shape} with order={p.order!r}")


def _maybe_reinit_phis(phis, n, p: CVParams):
    """Redistance every level set every p.reinit_every iterations."""
    from ..ops.reinit import maybe_reinit

    return maybe_reinit(phis, n, p)


def multiphase_energy(u0, phis, p: CVParams):
    """F = sum_s fit_s + mu sum_m Length(phi_m) + nu sum_m Area(phi_m)."""
    from ..ops.numerics import dirac, grad_forward

    cs = phase_means(u0, phis, p.eps)
    ws = phase_weights(phis, p.eps)
    fit = jnp.zeros((), dtype=phis.dtype)
    for w, c in zip(ws, cs):
        fit = fit + jnp.sum(_sqdist(u0, c) * w)
    reg = jnp.zeros((), dtype=phis.dtype)
    for m in range(phis.shape[0]):
        gx, gy = grad_forward(phis[m])
        reg = reg + p.mu * jnp.sum(dirac(phis[m], p.eps)
                                   * jnp.sqrt(gx * gx + gy * gy))
        reg = reg + p.nu * jnp.sum(heaviside(phis[m], p.eps))
    return fit + reg


def labels_from_phis(phis):
    """Phase label map: bit m set where phi_m >= 0 (SURVEY.md §3.3)."""
    lab = jnp.zeros(phis.shape[1:], dtype=jnp.int32)
    for m in range(phis.shape[0]):
        lab = lab | ((phis[m] >= 0).astype(jnp.int32) << m)
    return lab


def init_multiphase(shape, m_sets: int = 2, kind: str = "checkerboard",
                    dtype=jnp.float32):
    """Default multiphase init: phase-shifted checkerboards.

    Checkerboard (default) puts zero contours everywhere, so convergence is
    independent of image size (contours move O(1) px per sweep - a circle
    init on a 512^2 image needs hundreds of iterations just to travel);
    'circles' uses staggered circles (useful to pin label polarity).
    """
    if kind == "checkerboard":
        base = checkerboard(shape, dtype)
        phis = [base]
        for m in range(1, m_sets):
            # shift by a fraction of the period per extra level set so all
            # 2^M phase combinations are seeded
            rolled = jnp.roll(base, shift=(5 * m) // 2 + 1, axis=1)
            phis.append(rolled)
        return jnp.stack(phis)
    if kind != "circles":
        raise ValueError(f"unknown multiphase init {kind!r}")
    h, w = shape
    phis = []
    for m in range(m_sets):
        cy = h * (0.35 + 0.3 * (m % 2))
        cx = w * (0.35 + 0.3 * ((m // 2) % 2))
        phis.append(circle(shape, dtype, center=(cy, cx),
                           radius=min(h, w) / 3.5))
    return jnp.stack(phis)


class MultiphaseResult(NamedTuple):
    phis: jax.Array     # (M, H, W)
    labels: jax.Array   # (H, W) int32 phase labels
    iters: jax.Array
    delta: jax.Array
    cs: jax.Array       # (2^M, ...) phase means


def _mp2_banded_loop(u0, p: CVParams, phis0, interpret, fixed, cap):
    """while_loop over the fully fused 4-phase banded kernel.

    Means are carried through the loop from the kernel partials (the
    exact phase_means schedule - partials of the new phis are the means
    the next iteration starts from).
    """
    from ..ops.pallas_multiphase import mp2_iteration

    n_pix = jnp.asarray(u0.size, u0.dtype)
    tiny = jnp.asarray(1e-30, u0.dtype)
    cs0 = jnp.stack(phase_means(u0, phis0, p.eps))

    def cond(state):
        _, _, n, delta, streak = state
        if fixed:
            return n < cap
        return loop_continue(n, delta, streak, p, cap)

    def body(state):
        phis, cs, n, _, streak = state
        new, parts = mp2_iteration(phis, u0, cs, p, interpret=interpret)
        cs = parts[0:4] / jnp.maximum(parts[4:8], tiny)
        # 0 * s_dphi2 NaN-poisons the flip metric when a phi went
        # non-finite (labels of NaN fields are finite garbage)
        flips = parts[8] / n_pix + 0.0 * parts[9]
        if p.reinit_every:
            new = _maybe_reinit_phis(new, n, p)
            cs = jnp.stack(phase_means(u0, new, p.eps))
        streak = jnp.where(flips < p.tol, streak + 1, 0)
        return (new, cs, n + 1, flips, streak)

    init = (phis0, cs0, jnp.int32(0), jnp.asarray(jnp.inf, phis0.dtype),
            jnp.int32(0))
    phis, _, iters, delta, _ = jax.lax.while_loop(cond, body, init)
    return phis, iters, delta


def _mp2_resident_loop(u0, p: CVParams, phis0, interpret, fixed, cap,
                       chunk: int = 32):
    """Chunked tolerance/fixed loop over the resident 4-phase kernel.

    Same chunking scheme as models/resident.segment_resident: full
    chunks in a while_loop + a static remainder, convergence evaluated
    per in-chunk iteration from the partials rows (col 0 = label flips,
    col 1 = s_dphi2 for NaN poisoning), so max_iter is exact and a
    converged run overshoots by at most chunk-1 iterations.

    The parity-plane packed variant runs when the shape allows
    (H % 16, W % 256): measured +21% at 512^2 on v5e (5101 vs 4223
    Mpix-it/s; mask-free half-sweeps x4 per coupled iteration,
    unroll=2), same label trajectory class as the flat kernel.
    """
    from ..ops import pallas_packed
    from ..ops.pallas_multiphase import mp2_resident_iterations

    use_packed = pallas_packed.supports_packed_mp2_resident(*u0.shape)

    def run_kernel(phis, size, unroll=1):
        # unroll > 1 halves the partials rows (one per grid step), so
        # the tolerance loop keeps unroll=1 for exact per-iteration
        # streak semantics; the fixed path takes the +6% of unroll=2
        if use_packed:
            un = unroll if size % unroll == 0 else 1
            return pallas_packed.packed_mp2_resident_iterations(
                phis, u0, p, size, unroll=un, interpret=interpret)
        return mp2_resident_iterations(phis, u0, p, size,
                                       interpret=interpret)

    n_pix = jnp.asarray(u0.size, u0.dtype)

    def delta_rows(parts):
        return parts[:, 0] / n_pix + 0.0 * parts[:, 1]

    def scan_rows(deltas, streak0):
        def step(streak, d):
            streak = jnp.where(d < p.tol, streak + 1, 0)
            return streak, streak
        return jax.lax.scan(step, streak0, deltas)

    def not_stopped(state):
        _, n, _, streak, diverged = state
        done = jnp.logical_and(streak >= p.patience, n >= p.min_iter)
        return jnp.logical_not(jnp.logical_or(done, diverged))

    def run_chunk(state, size):
        phis, n, _, streak, _ = state
        phis, parts = run_kernel(phis, size)
        deltas = delta_rows(parts)
        streak, _ = scan_rows(deltas, streak)
        diverged = jnp.any(jnp.logical_not(jnp.isfinite(deltas)))
        return (phis, n + size, deltas[-1], streak, diverged)

    if fixed:
        if cap < 1:  # e.g. a checkpoint rerun resumed past its target
            return (phis0, jnp.int32(0),
                    jnp.asarray(jnp.inf, u0.dtype))
        phis, parts = run_kernel(phis0, cap, unroll=2)
        return phis, jnp.int32(cap), delta_rows(parts)[-1]

    full = (cap // chunk) * chunk
    rem = cap - full

    def cond(state):
        return jnp.logical_and(state[1] < full, not_stopped(state))

    init = (phis0, jnp.int32(0), jnp.asarray(jnp.inf, u0.dtype),
            jnp.int32(0), jnp.bool_(False))
    state = jax.lax.while_loop(cond, lambda s: run_chunk(s, chunk), init)
    if rem:
        state = jax.lax.cond(
            jnp.logical_and(state[1] < cap, not_stopped(state)),
            lambda s: run_chunk(s, rem), lambda s: s, state)
    phis, iters, delta, _, _ = state
    return phis, iters, delta


@functools.partial(jax.jit,
                   static_argnames=("p", "m_sets", "use_pallas", "interpret",
                                    "fixed", "max_iter"))
def segment_multiphase(u0, p: CVParams = CVParams(), m_sets: int = 2,
                       phis0: Optional[jax.Array] = None,
                       use_pallas: Optional[bool] = None,
                       interpret: bool = False, fixed: bool = False,
                       max_iter: Optional[int] = None) -> MultiphaseResult:
    """Segment into 2^m_sets phases; converges on label-flip fraction.

    use_pallas (None = auto: fused kernels on TPU, jnp elsewhere): for
    M = 2 grayscale the whole coupled iteration runs in one fused kernel
    (VMEM-resident when the image fits, banded otherwise); for other
    configurations kernels cover the sweeps only (see _mp2_route).
    ``fixed=True`` runs exactly ``max_iter`` (or p.max_iter) iterations.
    """
    route = _mp2_route(u0, p, m_sets, use_pallas)
    cap = p.max_iter if max_iter is None else max_iter
    if phis0 is None:
        phis0 = init_multiphase(u0.shape[:2], m_sets, dtype=u0.dtype)

    if route == "resident":
        phis, iters, delta = _mp2_resident_loop(u0, p, phis0, interpret,
                                                fixed, cap)
    elif route == "banded":
        phis, iters, delta = _mp2_banded_loop(u0, p, phis0, interpret,
                                              fixed, cap)
    else:
        use_sweep_kernels = route == "sweeps"

        def cond(state):
            _, n, delta, streak = state
            if fixed:
                return n < cap
            return loop_continue(n, delta, streak, p, cap)

        def body(state):
            phis, n, _, streak = state
            new, _ = multiphase_step(phis, u0, p, use_sweep_kernels,
                                     interpret)
            # 0 * sum(new) NaN-poisons the label-flip metric when a level
            # set went non-finite (labels of NaN phis are finite garbage),
            # so loop_continue's divergence abort fires
            flips = (jnp.mean((labels_from_phis(new)
                               != labels_from_phis(phis)).astype(u0.dtype))
                     + 0.0 * jnp.sum(new))
            new = _maybe_reinit_phis(new, n, p)
            streak = jnp.where(flips < p.tol, streak + 1, 0)
            return (new, n + 1, flips, streak)

        init = (phis0, jnp.int32(0), jnp.asarray(jnp.inf, phis0.dtype),
                jnp.int32(0))
        phis, iters, delta, _ = jax.lax.while_loop(cond, body, init)
    cs = jnp.stack(phase_means(u0, phis, p.eps))
    return MultiphaseResult(phis, labels_from_phis(phis), iters, delta, cs)


class MultiphaseTrace(NamedTuple):
    phis: jax.Array
    labels: jax.Array
    energy: jax.Array
    delta: jax.Array


@functools.partial(jax.jit,
                   static_argnames=("p", "iters", "m_sets", "use_pallas",
                                    "interpret"))
def segment_multiphase_fixed(u0, p: CVParams = CVParams(), iters: int = 100,
                             m_sets: int = 2,
                             phis0: Optional[jax.Array] = None,
                             use_pallas: Optional[bool] = None,
                             interpret: bool = False) -> MultiphaseTrace:
    """Fixed-iteration run with per-iteration energy/flip traces.

    This is the parity/diagnostic entry point: the energy is evaluated
    in jnp between iterations, so the resident kernel (which runs all
    iterations inside one pallas_call) is excluded from the route; the
    banded fused kernel still applies. For throughput benchmarking use
    ``segment_multiphase(..., fixed=True)`` - the per-iteration energy
    evaluation here costs as much as the iteration itself (SURVEY.md
    §3.1 marks energy logging optional).
    """
    route = _mp2_route(u0, p, m_sets, use_pallas, allow_resident=False)
    if phis0 is None:
        phis0 = init_multiphase(u0.shape[:2], m_sets, dtype=u0.dtype)

    if route == "banded":
        from ..ops.pallas_multiphase import mp2_iteration

        n_pix = jnp.asarray(u0.size, u0.dtype)
        tiny = jnp.asarray(1e-30, u0.dtype)
        cs0 = jnp.stack(phase_means(u0, phis0, p.eps))

        def body(carry, _):
            phis, cs, n = carry
            new, parts = mp2_iteration(phis, u0, cs, p, interpret=interpret)
            cs = parts[0:4] / jnp.maximum(parts[4:8], tiny)
            flips = parts[8] / n_pix
            e = multiphase_energy(u0, new, p)
            if p.reinit_every:
                new = _maybe_reinit_phis(new, n, p)
                cs = jnp.stack(phase_means(u0, new, p.eps))
            return (new, cs, n + 1), (e, flips)

        (phis, _, _), (es, ds) = jax.lax.scan(
            body, (phis0, cs0, jnp.int32(0)), None, length=iters)
        return MultiphaseTrace(phis, labels_from_phis(phis), es, ds)

    use_sweep_kernels = route == "sweeps"

    def body(carry, _):
        phis, n = carry
        new, _ = multiphase_step(phis, u0, p, use_sweep_kernels, interpret)
        flips = jnp.mean((labels_from_phis(new)
                          != labels_from_phis(phis)).astype(u0.dtype))
        e = multiphase_energy(u0, new, p)
        new = _maybe_reinit_phis(new, n, p)
        return (new, n + 1), (e, flips)

    (phis, _), (es, ds) = jax.lax.scan(body, (phis0, jnp.int32(0)), None,
                                       length=iters)
    return MultiphaseTrace(phis, labels_from_phis(phis), es, ds)
