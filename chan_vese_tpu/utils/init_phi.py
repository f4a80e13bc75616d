"""Level-set initialization (SURVEY.md C7).

Checkerboard is the canonical default (BASELINE.json:7:
phi0(x, y) = sin(pi x / 5) sin(pi y / 5)); circle/rect give signed-distance
initializations. All are pure functions of the grid shape, so they trace
into jit and shard naturally (each device materializes only its tile when
used under shard_map - the iotas are sharded).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def checkerboard(shape, dtype=jnp.float32, period: float = 5.0):
    """phi0[i, j] = sin(pi i / period) * sin(pi j / period)."""
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(dtype)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(dtype)
    return jnp.sin(i * (math.pi / period)) * jnp.sin(j * (math.pi / period))


def circle(shape, dtype=jnp.float32, center=None, radius=None):
    """Signed distance to a circle: positive inside."""
    h, w = shape
    cy, cx = center if center is not None else ((h - 1) / 2.0, (w - 1) / 2.0)
    r = radius if radius is not None else min(h, w) / 4.0
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(dtype)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(dtype)
    return r - jnp.sqrt((i - cy) ** 2 + (j - cx) ** 2)


def rect(shape, dtype=jnp.float32, margin: float = None):
    """Signed distance to an axis-aligned rectangle inset by ``margin``."""
    h, w = shape
    m = margin if margin is not None else min(h, w) / 8.0
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(dtype)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(dtype)
    # distance to each inset edge; min over edges = signed distance (pos inside)
    d = jnp.minimum(jnp.minimum(i - m, (h - 1 - m) - i),
                    jnp.minimum(j - m, (w - 1 - m) - j))
    return d


def init_phi(shape, kind: str = "checkerboard", dtype=jnp.float32, **kw):
    if kind == "checkerboard":
        return checkerboard(shape, dtype, **kw)
    if kind in ("circle", "disk"):  # 'disk' = skimage-compat alias
        return circle(shape, dtype, **kw)
    if kind in ("small disk", "small-disk"):
        h, w = shape
        kw.setdefault("radius", min(h, w) / 8.0)
        return circle(shape, dtype, **kw)
    if kind == "rect":
        return rect(shape, dtype, **kw)
    raise ValueError(f"unknown init {kind!r}")
