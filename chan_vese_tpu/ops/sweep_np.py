"""Straight-line NumPy transcription of the sequential raster Gauss-Seidel
sweep (f64) - the golden reference for the order-equivalence and parity
tests (SURVEY.md §4.1).

This is a deliberately naive per-cell double loop, written independently of
the vectorized jnp code so the two can cross-check each other. The C
baseline in native/cv_baseline.c implements the same convention a third
time. Convention notes (shared by all implementations in this repo):

  * Neumann boundaries are clamped-index: every neighbor *value* read
    clamps to the grid, and the backward face coefficients A-, B- are the
    forward coefficient fields evaluated at the clamped position
    (A-[0, j] == A[0, j]), matching ``shift_up(A)`` / ``shift_left(B)`` in
    ops/sweep.py.
  * Raster order: row-major, in place, so reads at (i-1, j-1), (i-1, j),
    (i-1, j+1) and (i, j-1) see already-updated values.
"""

from __future__ import annotations

import math

import numpy as np


def raster_sweep(phi: np.ndarray, f: np.ndarray, mu: float, dt: float,
                 eps: float, eta2: float) -> np.ndarray:
    """One in-place raster Gauss-Seidel sweep. Returns ``phi`` (modified)."""
    H, W = phi.shape

    def at(i, j):
        return phi[min(max(i, 0), H - 1), min(max(j, 0), W - 1)]

    def acoef(i, j):
        i = min(max(i, 0), H - 1)
        j = min(max(j, 0), W - 1)
        dxp = at(i + 1, j) - at(i, j)
        dy0 = 0.5 * (at(i, j + 1) - at(i, j - 1))
        return mu / math.sqrt(eta2 + dxp * dxp + dy0 * dy0)

    def bcoef(i, j):
        i = min(max(i, 0), H - 1)
        j = min(max(j, 0), W - 1)
        dx0 = 0.5 * (at(i + 1, j) - at(i - 1, j))
        dyp = at(i, j + 1) - at(i, j)
        return mu / math.sqrt(eta2 + dx0 * dx0 + dyp * dyp)

    for i in range(H):
        for j in range(W):
            A = acoef(i, j)
            Am = acoef(i - 1, j)
            B = bcoef(i, j)
            Bm = bcoef(i, j - 1)
            z = phi[i, j]
            d = (eps / math.pi) / (eps * eps + z * z)
            num = z + dt * d * (A * at(i + 1, j) + Am * at(i - 1, j)
                                + B * at(i, j + 1) + Bm * at(i, j - 1)
                                + f[i, j])
            den = 1.0 + dt * d * (A + Am + B + Bm)
            phi[i, j] = num / den
    return phi


def redblack_sweep(phi: np.ndarray, f: np.ndarray, mu: float, dt: float,
                   eps: float, eta2: float) -> np.ndarray:
    """Red-black ordered sweep matching ops/sweep.py:redblack_step.

    Red cells ((i + j) even) update from the all-old state; black cells
    from the red-updated state. Vectorized-free transcription used to
    validate the jnp/Pallas fast path.
    """
    H, W = phi.shape
    out = phi
    for color in (0, 1):
        base = out  # frozen state this half-sweep reads from

        def at(i, j):
            return base[min(max(i, 0), H - 1), min(max(j, 0), W - 1)]

        def acoef(i, j):
            i = min(max(i, 0), H - 1)
            j = min(max(j, 0), W - 1)
            dxp = at(i + 1, j) - at(i, j)
            dy0 = 0.5 * (at(i, j + 1) - at(i, j - 1))
            return mu / math.sqrt(eta2 + dxp * dxp + dy0 * dy0)

        def bcoef(i, j):
            i = min(max(i, 0), H - 1)
            j = min(max(j, 0), W - 1)
            dx0 = 0.5 * (at(i + 1, j) - at(i - 1, j))
            dyp = at(i, j + 1) - at(i, j)
            return mu / math.sqrt(eta2 + dx0 * dx0 + dyp * dyp)

        nxt = base.copy()
        for i in range(H):
            for j in range(W):
                if (i + j) % 2 != color:
                    continue
                A = acoef(i, j)
                Am = acoef(i - 1, j)
                B = bcoef(i, j)
                Bm = bcoef(i, j - 1)
                z = at(i, j)
                d = (eps / math.pi) / (eps * eps + z * z)
                num = z + dt * d * (A * at(i + 1, j) + Am * at(i - 1, j)
                                    + B * at(i, j + 1) + Bm * at(i, j - 1)
                                    + f[i, j])
                den = 1.0 + dt * d * (A + Am + B + Bm)
                nxt[i, j] = num / den
        out = nxt
    return out
