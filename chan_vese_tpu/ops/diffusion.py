"""Perona-Malik anisotropic diffusion pre-smoothing (SURVEY.md C12).

    du/dt = div( g(|grad u|) grad u ),
    g(s) = exp(-(s/K)^2)        ('exp')
    g(s) = 1 / (1 + (s/K)^2)    ('frac')

Explicit scheme on the 4-neighbor fluxes with edge-conductance evaluated at
the half-points (the classic Perona-Malik 1990 discretization), clamped
Neumann boundaries, stable for dt <= 0.25. Optional preprocessing before
segmentation (listed as uncertain-presence in the reference; SURVEY.md C12)
- pure jnp, fuses under jit, channel-wise for RGB.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .numerics import shift_down, shift_left, shift_right, shift_up


def _g(s2, kappa: float, kind: str):
    k2 = kappa * kappa
    if kind == "exp":
        return jnp.exp(-s2 / k2)
    if kind == "frac":
        return 1.0 / (1.0 + s2 / k2)
    raise ValueError(f"unknown conductance {kind!r}")


def perona_malik(u, steps: int = 10, kappa: float = 10.0, dt: float = 0.2,
                 conductance: str = "exp"):
    """Diffuse ``u`` (H, W) or (H, W, C) for ``steps`` explicit steps."""
    if u.ndim == 3:
        return jax.vmap(
            lambda ch: perona_malik(ch, steps, kappa, dt, conductance),
            in_axes=-1, out_axes=-1)(u)

    def body(_, x):
        dn = shift_down(x) - x
        ds = shift_up(x) - x
        de = shift_right(x) - x
        dw = shift_left(x) - x
        flux = (_g(dn * dn, kappa, conductance) * dn
                + _g(ds * ds, kappa, conductance) * ds
                + _g(de * de, kappa, conductance) * de
                + _g(dw * dw, kappa, conductance) * dw)
        return x + dt * flux

    return jax.lax.fori_loop(0, steps, body, u)
