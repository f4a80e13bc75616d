"""Morphological Chan-Vese (MorphACWE) operators (rebuild-side capability).

Curvature regularization as alternating morphological sup-inf / inf-sup
operators over a BINARY level set, per the published MorphACWE scheme
(Marquez-Neila, Baumela, Alvarez, PAMI 2014) - the algorithm scikit-image
ships as ``morphological_chan_vese``. The reference mount is empty
(SURVEY.md Section 0) and SURVEY's component inventory covers only the
PDE lineage, so this module is a rebuild-side extension completing the
compat surface: ``compat.chan_vese`` mirrors skimage's ``chan_vese``;
``compat.morphological_chan_vese`` (models/morph.py) mirrors its sibling.

TPU-first structure: the level set is a float plane of {0.0, 1.0} and
every operator below is neighbor-shift + min/max arithmetic - no gather,
no masks, no data-dependent control flow - so XLA fuses a full smoothing
cycle into a few elementwise passes over VMEM-resident tiles and the
whole iteration (means -> discrete force -> smoothing) jits into one
device program. The binary state also makes the iteration bitwise
reproducible across backends (all comparisons and min/max are exact),
which the CPU-golden equivalence tests exploit.

Edge convention: the framework-wide replica-eval Neumann semantics
(ops/numerics shift_*: out-of-range neighbors repeat the edge pixel).
NOTE this deliberately differs from scipy.ndimage.binary_erosion's
default border_value=0 (which erodes a one-pixel frame every SI pass,
and is what skimage's implementation inherits); interior behavior is
identical, and the replica convention is the one every other operator
in this framework pins (CLAUDE.md numerics invariants).

The four length-3 line structuring elements of the scheme (horizontal,
vertical, both diagonals) become: erosion along a line = min(center,
the two opposite neighbors); dilation = max. sup_inf = max over the four
line erosions (removes structures thinner than the lines without moving
straight edges); inf_sup is the dual. Alternating the composition
SIoIS / ISoSI per smoothing call (cycle_op) cancels the systematic
shrink/grow bias of either composition alone - the published scheme's
operator cycling, realized here with a traced call counter + lax.cond
so the alternation lives inside one compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .numerics import shift_down, shift_left, shift_right, shift_up


def _neighbors8(u):
    """The 8 replica-clamped neighbor planes of u.

    Diagonals compose two axis shifts; replica clamping composes
    correctly (corner out-of-range pixels repeat the corner).
    """
    up, dn = shift_up(u), shift_down(u)
    lf, rt = shift_left(u), shift_right(u)
    ul, ur = shift_left(up), shift_right(up)
    dl, dr = shift_left(dn), shift_right(dn)
    return up, dn, lf, rt, ul, ur, dl, dr


def sup_inf(u):
    """max over the 4 line SEs of the erosion (min) along that line."""
    up, dn, lf, rt, ul, ur, dl, dr = _neighbors8(u)
    e_h = jnp.minimum(jnp.minimum(lf, rt), u)
    e_v = jnp.minimum(jnp.minimum(up, dn), u)
    e_d = jnp.minimum(jnp.minimum(ul, dr), u)   # main diagonal
    e_a = jnp.minimum(jnp.minimum(ur, dl), u)   # anti-diagonal
    return jnp.maximum(jnp.maximum(e_h, e_v), jnp.maximum(e_d, e_a))


def inf_sup(u):
    """min over the 4 line SEs of the dilation (max) along that line."""
    up, dn, lf, rt, ul, ur, dl, dr = _neighbors8(u)
    d_h = jnp.maximum(jnp.maximum(lf, rt), u)
    d_v = jnp.maximum(jnp.maximum(up, dn), u)
    d_d = jnp.maximum(jnp.maximum(ul, dr), u)
    d_a = jnp.maximum(jnp.maximum(ur, dl), u)
    return jnp.minimum(jnp.minimum(d_h, d_v), jnp.minimum(d_d, d_a))


def cycle_op(u, k):
    """One smoothing call: SIoIS when the call counter k is even, ISoSI
    when odd (the scheme's global operator cycling). k is traced, so the
    branch is a lax.cond inside the compiled program."""
    return jax.lax.cond(k % 2 == 0,
                        lambda v: sup_inf(inf_sup(v)),
                        lambda v: inf_sup(sup_inf(v)),
                        u)


def smooth(u, k, smoothing: int):
    """``smoothing`` consecutive cycle_op calls, counter advancing by one
    per call (matching a per-call global counter: iteration n with
    smoothing s starts at k = n*s)."""
    for i in range(smoothing):
        u = cycle_op(u, k + i)
    return u


def binary_means(img, u, tiny: float = 1e-8):
    """Region means of ``img`` inside (u==1) and outside (u==0).

    img: (H, W) or (H, W, C); returns scalars or (C,) vectors. The
    ``tiny`` guard keeps an empty region finite (mean -> 0) instead of
    NaN-poisoning the run - an empty region's force then pushes pixels
    back toward it only if the data supports it.
    """
    w = u[..., None] if img.ndim == 3 else u
    axes = (0, 1)
    n_in = jnp.sum(u)
    n_out = jnp.sum(1.0 - u)
    c_in = jnp.sum(img * w, axis=axes) / (n_in + tiny)
    c_out = jnp.sum(img * (1.0 - w), axis=axes) / (n_out + tiny)
    return c_in, c_out


def acwe_step(u, img, c_in, c_out, lambda1, lambda2):
    """The discrete ACWE data-force step.

    f = lambda1*(img-c_in)^2 - lambda2*(img-c_out)^2 (summed over
    channels for (H, W, C) images); pixels where the level set has a
    nonzero discrete gradient move by sign(f): f < 0 -> inside (1),
    f > 0 -> outside (0), f == 0 or flat-gradient pixels keep their
    value. Gradient = central differences with replica edges; only the
    ZERO/nonzero distinction matters (the force is multiplied by
    |grad u| in the published scheme, and u is updated by the SIGN of
    that product), so the replica-vs-one-sided edge scaling difference
    vs np.gradient is immaterial.
    """
    f = lambda1 * (img - c_in) ** 2 - lambda2 * (img - c_out) ** 2
    if img.ndim == 3:
        f = jnp.sum(f, axis=-1)
    gx = shift_down(u) - shift_up(u)
    gy = shift_right(u) - shift_left(u)
    abs_du = jnp.abs(gx) + jnp.abs(gy)
    aux = abs_du * f
    one = jnp.ones((), u.dtype)
    zero = jnp.zeros((), u.dtype)
    return jnp.where(aux < 0, one, jnp.where(aux > 0, zero, u))


def acwe_energy(img, u, c_in, c_out, lambda1, lambda2):
    """Piecewise-constant ACWE data energy (no length term - the
    morphological smoothing is not a gradient flow of any explicit
    length functional; this traces the data-fit part only)."""
    e = lambda1 * (img - c_in) ** 2 * (u[..., None] if img.ndim == 3
                                       else u)
    e2 = lambda2 * (img - c_out) ** 2 * ((1.0 - u)[..., None]
                                         if img.ndim == 3 else (1.0 - u))
    return jnp.sum(e) + jnp.sum(e2)
