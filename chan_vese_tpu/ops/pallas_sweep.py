"""Fused Pallas TPU kernel for the Chan-Vese hot loop (SURVEY.md §7 phase 2).

One kernel invocation = one full red-black iteration PLUS the reductions
the next iteration needs, in a single pass over HBM:

    in:  phi_n (HBM), u0 (HBM), [c1, c2] (SMEM)
    out: phi_{n+1} (HBM), per-band partial sums:
         [sum u0*H_eps(phi'), sum H_eps(phi'), sum (dphi)^2, flip count]

so the while-loop body costs ~3 HBM passes of 4 B/pixel (read phi, read
u0, write phi) instead of the ~8+ passes of the unfused jnp pipeline
(means pass + sweep passes + convergence pass). c1/c2 for the *next*
iteration derive from the partials: c1 = s_uH/s_H, c2 = (S_u - s_uH)/
(N - s_H) with S_u, N precomputed once.

Tiling: the grid walks row bands; each step manually DMAs a (band+16, W)
tile (8-row nominal halo each side, sublane-aligned) from HBM/ANY into VMEM, computes the red half-sweep everywhere (red
values neighboring the band are recomputed redundantly - the classic
overlapped-tiling trick that keeps red->black fusion local), the black
half-sweep on the band, and DMAs the band back. The halo is asymmetric -
4 rows above, 2 below - because the backward face coefficients reach one
extra row up through two composed stencils: black at row r reads the
A-field at r-1 which reads red phi at r-2, and red phi at q reads old phi
at q-2 (down-reach is one less on both hops). Ragged last band is handled
by sliding its window up (rows are recomputed identically - deterministic
- and partial masks keep the counted region disjoint).

Numerics are EXACTLY ops/sweep.py:redblack_step (same clamped-index
Neumann convention; columns clamp globally since tiles span full width,
rows clamp at tile edges which coincide with image edges exactly where it
matters). Verified elementwise in tests/test_pallas.py (interpret mode on
CPU) and on real TPU via RUN_TPU_TESTS=1.

Fast-path requirements: W % 128 == 0 (lane alignment) and H >= 16; other
shapes fall back to the jnp path transparently (models/fused.py).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import CVParams

# number of tile-sized live buffers the kernel needs (3 DMA scratch tiles
# + mosaic temporaries of the two half-sweeps); used to budget the band
# height against the raised scoped-VMEM limit below
_VMEM_LIMIT = 96 * 1024 * 1024
_VMEM_BUDGET = _VMEM_LIMIT
_TILES = 24


# Mosaic requires DMA row slices aligned to the sublane tiling (8), so the
# tile is band + 16 rows: nominal 8-row halo each side (the math needs only
# 4 up / 2 down - black at row r reads the A-field at r-1 which reads red
# phi at r-2, and red phi at q reads old phi at q-2), and tile edges land
# exactly on the image edges wherever the window gets clamped.
_HALO_UP = 8
_HALO = 16


def band_rows(h: int, w: int) -> int:
    """Largest multiple-of-8 band height fitting VMEM and the halo layout
    (tile = band + 16 halo rows must fit inside the image)."""
    per_row = w * 4 * _TILES
    b = max(8, (_VMEM_BUDGET // per_row) // 8 * 8)
    return min(b, max(8, ((h - _HALO) // 8) * 8))


def supports(h: int, w: int) -> bool:
    return (w % 128 == 0 and h % 8 == 0 and h >= 24
            and band_rows(h, w) + _HALO <= h)


# ---------------------------------------------------------------------------
# In-tile math (mirrors ops/numerics.py + ops/sweep.py on a (rows, W) tile).
# Columns are global width: roll + clamp == clamped-index semantics.
# ---------------------------------------------------------------------------

def _atan(x):
    """Vectorized arctan for the Mosaic VPU (atan is not a TPU primitive).

    Cephes-style: two-stage range reduction to |t| <= tan(pi/8), then a
    degree-9 odd minimax polynomial; ~1 ulp in f32 (validated against
    jnp.arctan in tests/test_pallas.py::test_kernel_atan_accuracy).
    """
    ax = jnp.abs(x)
    big = ax > 2.414213562373095   # tan(3pi/8)
    mid = ax > 0.4142135623730950  # tan(pi/8)
    safe_ax = jnp.maximum(ax, 1e-30)
    t = jnp.where(big, -1.0 / safe_ax,
                  jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    base = jnp.where(big, math.pi / 2, jnp.where(mid, math.pi / 4, 0.0))
    z = t * t
    poly = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
             + 1.99777106478e-1) * z - 3.33329491539e-1) * z * t + t
    return jnp.sign(x) * (base + poly)


def _heaviside(z, eps):
    return 0.5 + (1.0 / math.pi) * _atan(z / eps)


def _col_ids(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _west(x):
    r = pltpu.roll(x, 1, 1)
    return jnp.where(_col_ids(x.shape) == 0, x, r)


def _east(x):
    r = pltpu.roll(x, x.shape[1] - 1, 1)  # roll left by 1 (shift must be >= 0)
    return jnp.where(_col_ids(x.shape) == x.shape[1] - 1, x, r)


def _north(x):
    return jnp.concatenate([x[:1], x[:-1]], axis=0)


def _south(x):
    return jnp.concatenate([x[1:], x[-1:]], axis=0)


def _update_all(phi, g, f, mu, dt, eps, eta2):
    """Semi-implicit update at every cell (tile-local clamped shifts).

    Replica-eval boundary convention, mirroring ops/numerics.py
    face_coeffs(+_backward): backward coefficients use the vanishing
    difference (phi - north(phi)) and the shifted central field.

    ``g`` = dt * delta_eps(phi_old): the Dirac factor uses the OLD center
    value in BOTH half-sweeps (red cells are old in pass 1, black cells
    are old in pass 2), so the caller computes it once per iteration.
    """
    n, s = _north(phi), _south(phi)
    w, e = _west(phi), _east(phi)
    dxp = s - phi
    dyp = e - phi
    dx0 = 0.5 * (s - n)
    dy0 = 0.5 * (e - w)
    A = mu * jax.lax.rsqrt(eta2 + dxp * dxp + dy0 * dy0)
    B = mu * jax.lax.rsqrt(eta2 + dx0 * dx0 + dyp * dyp)
    # Backward coefficients are exact shifts of the forward fields away
    # from the boundary (Am[i] == A[i-1] since dxm[i] == dxp[i-1]), so
    # reuse them instead of two more full-tile rsqrt evaluations; only the
    # first row/col needs the replica-eval value (vanishing forward
    # difference). Row 0 of a non-top tile is halo and never consumed, so
    # the fix row is unconditionally correct to install.
    am0 = mu * jax.lax.rsqrt(eta2 + dy0[:1] * dy0[:1])
    Am = jnp.concatenate([am0, A[:-1]], axis=0)
    bm0 = mu * jax.lax.rsqrt(eta2 + dx0[:, :1] * dx0[:, :1])
    Bm = jnp.concatenate([bm0, B[:, :-1]], axis=1)
    num = phi + g * (A * s + Am * n + B * e + Bm * w + f)
    den = 1.0 + g * (A + Am + B + Bm)
    return num / den


def _fused_band_kernel(c_ref, phi_hbm, u0_hbm, out_hbm, part_ref,
                       phi_scr, u0_scr, new_scr, sems,
                       *, H, W, b, mu, nu, l1, l2, dt, eps, eta2):
    i = pl.program_id(0)
    g0 = jnp.minimum(i * b, H - b)                    # compute-window start
    # all starts/sizes are multiples of 8 (H % 8 == 0, b % 8 == 0): Mosaic
    # requires sublane-aligned DMA slices, and needs the hint to prove it
    s = jnp.clip(g0 - _HALO_UP, 0, H - (b + _HALO))   # tile start row
    g0 = pl.multiple_of(g0, 8)
    s = pl.multiple_of(s, 8)
    o = pl.multiple_of(g0 - s, 8)                     # window offset in tile

    load_phi = pltpu.make_async_copy(
        phi_hbm.at[pl.ds(s, b + _HALO), :], phi_scr, sems.at[0])
    load_u0 = pltpu.make_async_copy(
        u0_hbm.at[pl.ds(s, b + _HALO), :], u0_scr, sems.at[1])
    load_phi.start()
    load_u0.start()
    load_phi.wait()
    load_u0.wait()

    phi = phi_scr[:]
    u0 = u0_scr[:]
    f = -nu - l1 * (u0 - c_ref[0, 0]) ** 2 + l2 * (u0 - c_ref[0, 1]) ** 2

    rows = jax.lax.broadcasted_iota(jnp.int32, phi.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, phi.shape, 1)
    grow = rows + s
    red = ((grow + cols) % 2) == 0

    # dt * Dirac(old center) serves both half-sweeps (centers stay old
    # until their own color's update)
    g = (dt * eps / math.pi) / (eps * eps + phi * phi)

    # red half-sweep from all-old values (computed everywhere; only the
    # band's 1-ring needs to be right, and it is: its stencil lies in-tile)
    phi_r = jnp.where(red, _update_all(phi, g, f, mu, dt, eps, eta2), phi)
    # black half-sweep from red-new + black-old
    phi_n = jnp.where(red, phi_r, _update_all(phi_r, g, f, mu, dt, eps, eta2))

    new_scr[:] = phi_n

    store = pltpu.make_async_copy(
        new_scr.at[pl.ds(o, b), :], out_hbm.at[pl.ds(g0, b), :], sems.at[2])
    store.start()

    # partial sums over this band's *unique* rows [i*b, min((i+1)*b, H))
    hi = jnp.minimum((i + 1) * b, H)
    m = ((grow >= i * b) & (grow < hi)).astype(phi.dtype)
    h_eps = _heaviside(phi_n, eps)
    dphi = phi_n - phi
    flips = ((phi_n >= 0) != (phi >= 0)).astype(phi.dtype)
    part_ref[i, 0] = jnp.sum(u0 * h_eps * m)
    part_ref[i, 1] = jnp.sum(h_eps * m)
    part_ref[i, 2] = jnp.sum(dphi * dphi * m)
    part_ref[i, 3] = jnp.sum(flips * m)
    part_ref[i, 4] = jnp.sum(jnp.abs(dphi) * m)
    part_ref[i, 5] = 0.0
    part_ref[i, 6] = 0.0
    part_ref[i, 7] = 0.0

    store.wait()


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def fused_iteration(phi, u0, c1, c2, p: CVParams, interpret: bool = False
                    ) -> Tuple[jax.Array, jax.Array]:
    """One fused red-black iteration.

    Returns (phi_new, partials (8,)) with partials summed over bands:
    [s_uH, s_H, s_dphi2, flips, s_absdphi, 0, 0, 0].
    """
    H, W = phi.shape
    if not supports(H, W):
        raise ValueError(f"pallas fast path unsupported for shape {phi.shape}"
                         f" (need W % 128 == 0, H >= 16)")
    b = band_rows(H, W)
    nbands = pl.cdiv(H, b)
    c = jnp.stack([c1, c2]).reshape(1, 2).astype(phi.dtype)

    kernel = functools.partial(
        _fused_band_kernel, H=H, W=W, b=b, mu=p.mu, nu=p.nu,
        l1=p.lambda1, l2=p.lambda2, dt=p.dt, eps=p.eps, eta2=p.eta2)

    phi_new, partials = pl.pallas_call(
        kernel,
        grid=(nbands,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            # whole-array SMEM (row-blocking is not lowerable on TPU);
            # band i writes row i
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, W), phi.dtype),
            jax.ShapeDtypeStruct((nbands, 8), phi.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b + _HALO, W), phi.dtype),
            pltpu.VMEM((b + _HALO, W), phi.dtype),
            pltpu.VMEM((b + _HALO, W), phi.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c, phi, u0)
    return phi_new, jnp.sum(partials, axis=0)
