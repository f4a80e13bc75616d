"""Level-set reinitialization (SURVEY.md C11).

Sussman-Smereka-Osher PDE redistancing: evolve

    d psi / d tau = S(phi0) (1 - |grad psi|),   psi(0) = phi0

to steady state; psi approaches the signed distance function with the same
zero contour as phi0. Discretized with the standard Godunov upwind scheme
and the smoothed sign S(z) = z / sqrt(z^2 + h^2).

Why it matters here: under the semi-implicit Chan-Vese flow the level set
flattens (|grad phi| -> 0), which (a) blows up the curvature coefficients
mu/|grad phi| and (b) keeps |phi| << eps so H_eps stays near 1/2 and the
region means never lock on. Periodic redistancing (params via
``segment(..., reinit_every=K)`` in the model drivers) keeps |grad phi| ~ 1
and restores the sharp-interface behavior - the standard practice for
level-set methods (optional in the reference lineage per SURVEY.md C11).

Fully vectorized (VPU-friendly: shifts + min/max, no gathers); the step
count is static so the whole redistance unrolls into a ``fori_loop`` under
jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .numerics import shift_down, shift_left, shift_right, shift_up


def _godunov_grad(psi, sgn):
    """Godunov upwind |grad psi| for the redistancing PDE."""
    a = psi - shift_up(psi)      # D-x (backward in i)
    b = shift_down(psi) - psi    # D+x (forward in i)
    c = psi - shift_left(psi)    # D-y
    d = shift_right(psi) - psi   # D+y
    ap, an = jnp.maximum(a, 0.0), jnp.minimum(a, 0.0)
    bp, bn = jnp.maximum(b, 0.0), jnp.minimum(b, 0.0)
    cp, cn = jnp.maximum(c, 0.0), jnp.minimum(c, 0.0)
    dp, dn = jnp.maximum(d, 0.0), jnp.minimum(d, 0.0)
    g_pos = jnp.sqrt(jnp.maximum(ap * ap, bn * bn)
                     + jnp.maximum(cp * cp, dn * dn))
    g_neg = jnp.sqrt(jnp.maximum(an * an, bp * bp)
                     + jnp.maximum(cn * cn, dp * dp))
    return jnp.where(sgn > 0, g_pos, g_neg)


def maybe_reinit(x, n, p):
    """Shared redistancing cadence: every p.reinit_every iterations (no-op
    when 0). Handles a single (H, W) level set or an (M, H, W) stack."""
    if not p.reinit_every:
        return x
    if x.ndim == 3:
        fn = jax.vmap(lambda ph: reinit(ph, p.reinit_steps))
    else:
        fn = lambda ph: reinit(ph, p.reinit_steps)  # noqa: E731
    return jax.lax.cond((n + 1) % p.reinit_every == 0, fn, lambda v: v, x)


def reinit(phi, steps: int = 20, dtau: float = 0.5, h: float = 1.0):
    """Redistance ``phi`` toward a signed distance function.

    ``steps * dtau`` is the distance band (in pixels) that becomes exact;
    ~min(H, W)/2 steps redistance fully, a handful suffices to keep the
    interface band healthy between segmentation iterations.
    """
    # Peng et al. 1999 smoothed sign: S = phi / sqrt(phi^2 + |grad phi|^2 h^2).
    # The |grad phi| factor makes S subcell-aware on steep level sets
    # (plain S = phi/sqrt(phi^2 + h^2) saturates to +/-1 one cell from the
    # contour when |grad phi| >> 1, and the O(dtau * |grad phi|) updates
    # slosh the zero crossing by many pixels - observed empirically).
    gx = 0.5 * (shift_down(phi) - shift_up(phi))
    gy = 0.5 * (shift_right(phi) - shift_left(phi))
    gn2 = gx * gx + gy * gy
    sgn = phi / jnp.sqrt(phi * phi + gn2 * (h * h) + 1e-30)

    # Russo-Smereka 2000 subcell fix: cells whose 4-neighborhood crosses the
    # zero level of phi0 are relaxed directly toward the signed distance
    # estimate D = h * phi0 / |grad phi0| instead of the upwind PDE - this
    # pins the zero crossing in place (no contour drift during reinit).
    # D is clamped to +-1.5h: a genuine crossing-cell distance is <= h, but
    # on noisy level sets the CENTRAL gradient can vanish at an extremum
    # whose neighbors still cross zero, making the raw ratio arbitrarily
    # large (observed blowing phi up to 1e22 in a 1000-iteration 4K soak).
    crosses = ((phi * shift_up(phi) < 0) | (phi * shift_down(phi) < 0)
               | (phi * shift_left(phi) < 0) | (phi * shift_right(phi) < 0))
    dist0 = jnp.clip(h * phi / jnp.maximum(jnp.sqrt(gn2), 1e-12),
                     -1.5 * h, 1.5 * h)

    def body(_, psi):
        g = _godunov_grad(psi, phi)
        pde = psi - dtau * sgn * (g - 1.0)
        sub = psi - (dtau / h) * (jnp.sign(phi) * jnp.abs(psi) - dist0)
        return jnp.where(crosses, sub, pde)

    return jax.lax.fori_loop(0, steps, body, phi)
