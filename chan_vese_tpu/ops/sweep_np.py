"""Straight-line NumPy transcription of the sequential raster Gauss-Seidel
sweep (f64) - the golden reference for the order-equivalence and parity
tests (SURVEY.md §4.1).

This is a deliberately naive per-cell double loop, written independently of
the vectorized jnp code so the two can cross-check each other. The C
baseline in native/cv_baseline.c implements the same convention a third
time. Convention notes (shared by all implementations in this repo):

  * Neumann boundaries are replica-eval (Getreuer IPOL 2012 /
    pad-then-compute lineage): every neighbor *value* read clamps to the
    grid, so out-of-range DIFFERENCES vanish - including inside the
    backward face coefficients A-, B- (A-[0, j] has a zero
    forward-difference term), matching ``face_coeffs_backward`` in
    ops/numerics.py. This is the convention that spatial sharding with
    edge-replicate halos reproduces exactly.
  * Raster order: row-major, in place, so reads at (i-1, j-1), (i-1, j),
    (i-1, j+1) and (i, j-1) see already-updated values.
"""

from __future__ import annotations

import math

import numpy as np


def _cell_update(at, f_ij, i, j, mu, dt, eps, eta2):
    """The per-cell semi-implicit update given a clamped reader ``at``."""
    # forward face coefficients at (i+1/2, j) and (i, j+1/2)
    dxp = at(i + 1, j) - at(i, j)
    dy0 = 0.5 * (at(i, j + 1) - at(i, j - 1))
    A = mu / math.sqrt(eta2 + dxp * dxp + dy0 * dy0)
    dx0 = 0.5 * (at(i + 1, j) - at(i - 1, j))
    dyp = at(i, j + 1) - at(i, j)
    B = mu / math.sqrt(eta2 + dx0 * dx0 + dyp * dyp)
    # backward coefficients, replica-eval: clamped VALUE reads only, so
    # the forward-difference terms vanish at the boundary
    dxm = at(i, j) - at(i - 1, j)
    dy0m = 0.5 * (at(i - 1, j + 1) - at(i - 1, j - 1))
    Am = mu / math.sqrt(eta2 + dxm * dxm + dy0m * dy0m)
    dym = at(i, j) - at(i, j - 1)
    dx0m = 0.5 * (at(i + 1, j - 1) - at(i - 1, j - 1))
    Bm = mu / math.sqrt(eta2 + dx0m * dx0m + dym * dym)

    z = at(i, j)
    d = (eps / math.pi) / (eps * eps + z * z)
    num = z + dt * d * (A * at(i + 1, j) + Am * at(i - 1, j)
                        + B * at(i, j + 1) + Bm * at(i, j - 1) + f_ij)
    den = 1.0 + dt * d * (A + Am + B + Bm)
    return num / den


def raster_sweep(phi: np.ndarray, f: np.ndarray, mu: float, dt: float,
                 eps: float, eta2: float) -> np.ndarray:
    """One in-place raster Gauss-Seidel sweep. Returns ``phi`` (modified)."""
    H, W = phi.shape

    def at(i, j):
        return phi[min(max(i, 0), H - 1), min(max(j, 0), W - 1)]

    for i in range(H):
        for j in range(W):
            phi[i, j] = _cell_update(at, f[i, j], i, j, mu, dt, eps, eta2)
    return phi


def redblack_sweep(phi: np.ndarray, f: np.ndarray, mu: float, dt: float,
                   eps: float, eta2: float) -> np.ndarray:
    """Red-black ordered sweep matching ops/sweep.py:redblack_step.

    Red cells ((i + j) even) update from the all-old state; black cells
    from the red-updated state. Vectorization-free transcription used to
    validate the jnp/Pallas fast path.
    """
    H, W = phi.shape
    out = phi
    for color in (0, 1):
        base = out  # frozen state this half-sweep reads from

        def at(i, j, base=base):
            return base[min(max(i, 0), H - 1), min(max(j, 0), W - 1)]

        nxt = base.copy()
        for i in range(H):
            for j in range(W):
                if (i + j) % 2 != color:
                    continue
                nxt[i, j] = _cell_update(at, f[i, j], i, j, mu, dt, eps,
                                         eta2)
        out = nxt
    return out
