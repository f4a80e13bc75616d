"""Drop-in convenience entry point.

``chan_vese(image, ...)`` mirrors the argument surface users know from the
reference CLI and the scikit-image function of the same name, returning
the binary mask (and optionally the full result). Dispatches to the fused
TPU path automatically.

Note the intensity convention: this framework's canonical operating point
is [0, 255] (see CVParams); pass ``normalize='255'`` (default) to rescale
[0, 1] float inputs up, or ``normalize=None`` to use the image as-is with
your own mu scaling.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def chan_vese(image,
              mu: float = 0.01 * 255.0 ** 2,
              nu: float = 0.0,
              lambda1=1.0,
              lambda2=1.0,
              tol: float = 1e-5,
              max_num_iter: int = 500,
              dt: float = 0.5,
              eps: float = 1.0,
              init_level_set="checkerboard",
              normalize: Optional[str] = "255",
              extended_output: bool = False):
    """Segment ``image`` (2D grayscale or 3D HxWxC) with Chan-Vese.

    Returns the boolean mask, or (mask, phi, result) with
    extended_output=True. Accepts numpy or jax arrays; floats in [0, 1]
    are rescaled to [0, 255] when normalize='255' and max(image) <= 1.

    ``init_level_set``: a named shape ('checkerboard' | 'circle'/'disk' |
    'small disk' | 'rect') or a custom (H, W) array used directly as phi0
    (skimage-compatible).
    """
    import jax
    import jax.numpy as jnp

    from .models.fused import segment_fused
    from .models.scalar import segment as segment_jnp
    from .params import CVParams

    img = np.asarray(image, np.float32)
    if normalize == "255" and img.size and float(img.max()) <= 1.0:
        img = img * 255.0

    vector = img.ndim == 3
    if not vector and (len(np.atleast_1d(lambda1)) > 1
                       or len(np.atleast_1d(lambda2)) > 1):
        raise ValueError("per-channel lambda weights need an (H, W, C) "
                         "image")
    l1 = tuple(np.atleast_1d(lambda1).astype(float)) if vector else None
    l2 = tuple(np.atleast_1d(lambda2).astype(float)) if vector else None
    if vector and len(l1) == 1:
        l1 = l1 * img.shape[-1]
    if vector and len(l2) == 1:
        l2 = l2 * img.shape[-1]

    # skimage-compat: init_level_set may be a custom (H, W) array instead
    # of a named shape; it is forwarded as phi0 (CVParams.init stays a
    # static string for jit hashing).
    phi0 = None
    init_kind = init_level_set
    if not isinstance(init_level_set, str):
        phi0 = jnp.asarray(np.asarray(init_level_set, img.dtype))
        if phi0.shape != img.shape[:2]:
            raise ValueError(
                f"init_level_set array shape {phi0.shape} does not match "
                f"image spatial shape {img.shape[:2]}")
        init_kind = "checkerboard"  # unused when phi0 is given

    p = CVParams(mu=mu, nu=nu,
                 lambda1=float(np.atleast_1d(lambda1)[0]),
                 lambda2=float(np.atleast_1d(lambda2)[0]),
                 dt=dt, eps=eps, tol=tol, max_iter=max_num_iter,
                 init=init_kind)
    # the Pallas fast path only lowers on TPU backends
    if jax.default_backend() == "tpu":
        res = segment_fused(jnp.asarray(img), p, phi0,
                            lambda1=l1, lambda2=l2)
    else:
        res = segment_jnp(jnp.asarray(img), p, phi0,
                          lambda1=l1, lambda2=l2)
    mask = np.asarray(res.mask)
    if extended_output:
        return mask, np.asarray(res.phi), res
    return mask
