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
tile (8-row nominal halo each side - Mosaic needs sublane-aligned DMA
slices; the math needs 4 up / 2 down because the backward face
coefficients compose two stencils) from HBM/ANY into VMEM, computes the
red half-sweep everywhere (red values neighboring the band are recomputed
redundantly - the classic overlapped-tiling trick that keeps red->black
fusion local), the black half-sweep on the band, and DMAs the band back.
Ragged last band is handled by sliding its window up (rows are recomputed
identically and partial masks keep the counted region disjoint).

Numerics are EXACTLY ops/sweep.py:redblack_step (same replica-eval
Neumann convention; columns clamp globally since tiles span full width,
rows clamp at tile edges which coincide with image edges exactly where it
matters). Verified elementwise in tests/test_pallas.py (interpret mode on
CPU) and on real TPU via RUN_TPU_TESTS=1.

Three deployment modes share the kernel body:
  * whole image (fused_iteration, grid = bands),
  * frame stacks (fused_iteration_batch, grid = frames x bands),
  * halo-padded shard canvases under shard_map (fused_iteration with
    parity/crop/edges - see parallel/sharded.py).

Fast-path requirements: W % 128 == 0 (lane alignment), H % 8 == 0,
H >= 24; other shapes fall back to the jnp path transparently
(models/fused.py).
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

# number of tile-sized live buffers the kernel needs (6 double-buffered DMA
# scratch tiles + mosaic temporaries of the two half-sweeps); used to
# budget the band height against the raised scoped-VMEM limit below
_VMEM_LIMIT = 96 * 1024 * 1024
_VMEM_BUDGET = _VMEM_LIMIT
_TILES = 24  # measured best at 4K (band 272, compiles with double buffers)


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


def _resync_rim(x, grow, cols, crop, flags):
    """Refresh the global-edge Neumann replica rim of a shard canvas.

    Sharded-canvas mode (parallel/sharded.py): the canvas embeds a
    halo-padded shard block, and at GLOBAL image edges the halo holds
    clamped-index replicas that must track the edge cells as the
    half-sweeps update them (the kernel twin of
    parallel/sharded._resync_replicas). Shift-based so every source
    index is static regardless of band geometry: row r0-1 <- row r0 via
    one south-shift, row r0-2 via two, and symmetrically for the other
    sides. Depth 2 suffices because a single half-sweep reads at most 1
    cell into the replica region (the update's read set is the 3x3
    neighborhood - see _update_all) and the rim is re-refreshed after
    every half-sweep, so deeper stale replicas are never consumed (the
    jnp path refreshes the full depth; the extra cells it touches are
    write-only between refreshes). Row fixes happen before column fixes
    so corner replicas match _resync_replicas' sequential order.

    ``crop`` = (r0, r1, c0, c1): the shard's own window in canvas
    coordinates; ``flags`` = (is_top, is_bot, is_left, is_right) traced
    scalar booleans. Used by the banded chunk kernels
    (ops/pallas_banded.py) and the fused multiphase canvas kernel
    (ops/pallas_multiphase.py).
    """
    r0, r1, c0, c1x = crop
    is_top, is_bot, is_left, is_right = flags
    s1 = _south(x)
    s2 = _south(s1)
    x = jnp.where(is_top & (grow == r0 - 1), s1, x)
    x = jnp.where(is_top & (grow == r0 - 2), s2, x)
    n1 = _north(x)
    n2 = _north(n1)
    x = jnp.where(is_bot & (grow == r1), n1, x)
    x = jnp.where(is_bot & (grow == r1 + 1), n2, x)
    e1 = _east(x)
    e2 = _east(e1)
    x = jnp.where(is_left & (cols == c0 - 1), e1, x)
    x = jnp.where(is_left & (cols == c0 - 2), e2, x)
    w1 = _west(x)
    w2 = _west(w1)
    x = jnp.where(is_right & (cols == c1x), w1, x)
    x = jnp.where(is_right & (cols == c1x + 1), w2, x)
    return x


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
                       *, H, W, b, mu, nu, l1, l2, dt, eps, eta2,
                       crop=None, batched=False, data_is_f=False):
    # data_is_f: the second input already IS the data-fitting force f
    # (multiphase coupling terms are built outside); c_ref[.., 0:2] unused
    # and the u*H partial is meaningless in that mode.
    # c_ref (SMEM (rows, 8)): [c1, c2, parity, top, bottom, left, right, -]
    # per frame; parity aligns the local red-black lattice with the global
    # one when this kernel runs on a halo-padded shard
    # (parallel/sharded.py) - 0 for whole images.
    # crop (static (r0, r1, c0, c1) or None): restrict the partial sums to
    # an interior window (the shard's own cells, excluding halo/dead pad).
    # batched: leading frame axis on phi/u0/out + a leading grid dim
    # (models/batched.py stack path - vmap cannot batch ANY-space refs).
    nbands = pl.num_programs(1) if batched else pl.num_programs(0)
    if batched:
        k = pl.program_id(0) * nbands + pl.program_id(1)
    else:
        k = pl.program_id(0)
    total = (pl.num_programs(0) * nbands) if batched else nbands

    def window(kk):
        """(frame, compute-window start, tile start) for flattened step kk.

        All starts/sizes are multiples of 8 (H % 8 == 0, b % 8 == 0):
        Mosaic requires sublane-aligned DMA slices + hints to prove it.
        """
        fr = kk // nbands if batched else jnp.int32(0)
        ib = kk % nbands if batched else kk
        g0 = pl.multiple_of(jnp.minimum(ib * b, H - b), 8)
        s = pl.multiple_of(
            jnp.clip(g0 - _HALO_UP, 0, H - (b + _HALO)), 8)
        return fr, ib, g0, s

    def load_dmas(kk, slot):
        fr, _, _, s = window(kk)
        src_phi = phi_hbm.at[fr] if batched else phi_hbm
        src_u0 = u0_hbm.at[fr] if batched else u0_hbm
        return (pltpu.make_async_copy(src_phi.at[pl.ds(s, b + _HALO), :],
                                      phi_scr.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(src_u0.at[pl.ds(s, b + _HALO), :],
                                      u0_scr.at[slot], sems.at[slot, 1]))

    def store_dma(kk, slot):
        fr, _, g0, s = window(kk)
        o = pl.multiple_of(g0 - s, 8)
        dst = out_hbm.at[fr] if batched else out_hbm
        return pltpu.make_async_copy(
            new_scr.at[slot].at[pl.ds(o, b), :],
            dst.at[pl.ds(g0, b), :], sems.at[slot, 2])

    slot = k % 2

    # double-buffered pipeline: prefetch step k+1's tiles while computing
    # step k; stores drain two steps behind (grid steps are sequential)
    @pl.when(k == 0)
    def _():
        for dma in load_dmas(k, slot):
            dma.start()

    @pl.when(k + 1 < total)
    def _():
        for dma in load_dmas(k + 1, (k + 1) % 2):
            dma.start()

    for dma in load_dmas(k, slot):
        dma.wait()

    fr, i, g0, s = window(k)
    o = pl.multiple_of(g0 - s, 8)
    prow = k
    crow = fr if batched else 0

    phi = phi_scr[slot]
    u0 = u0_scr[slot]
    if data_is_f:
        f = u0
    else:
        f = (-nu - l1 * (u0 - c_ref[crow, 0]) ** 2
             + l2 * (u0 - c_ref[crow, 1]) ** 2)

    rows = jax.lax.broadcasted_iota(jnp.int32, phi.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, phi.shape, 1)
    grow = rows + s
    parity = c_ref[crow, 2].astype(jnp.int32)
    red = ((grow + cols + parity) % 2) == 0

    # dt * Dirac(old center) serves both half-sweeps (centers stay old
    # until their own color's update)
    g = (dt * eps / math.pi) / (eps * eps + phi * phi)

    # red half-sweep from all-old values (computed everywhere; only the
    # band's 1-ring needs to be right, and it is: its stencil lies in-tile)
    phi_r = jnp.where(red, _update_all(phi, g, f, mu, dt, eps, eta2), phi)

    if crop is not None:
        # Sharded mode: the array is a halo-padded shard canvas. At global
        # edges the pad holds REPLICAS (clamped-index Neumann); between the
        # half-sweeps they must be refreshed from the red-updated edge
        # cells (the black pass reads red values through them). All source
        # indices are static: the band containing the top pad rows always
        # has s == 0 (source local row = crop r0), and any band whose tile
        # reaches the last canvas row has s == H-(b+16) (source local row
        # = b + 16 - 5). Flags in c_ref[0, 3:7]: [top, bottom, left,
        # right] are 1.0 where this shard sits on that global edge.
        r0, r1, c0, c1x = crop
        is_top = c_ref[crow, 3] > 0.5
        is_bot = c_ref[crow, 4] > 0.5
        is_left = c_ref[crow, 5] > 0.5
        is_right = c_ref[crow, 6] > 0.5
        phi_r = jnp.where(is_top & (grow < r0),
                          jnp.broadcast_to(phi_r[r0: r0 + 1], phi_r.shape),
                          phi_r)
        bot_src = phi_r[b + _HALO - 5: b + _HALO - 4]
        phi_r = jnp.where(is_bot & (grow >= r1),
                          jnp.broadcast_to(bot_src, phi_r.shape), phi_r)
        phi_r = jnp.where(is_left & (cols < c0),
                          jnp.broadcast_to(phi_r[:, c0: c0 + 1],
                                           phi_r.shape), phi_r)
        phi_r = jnp.where(is_right & (cols >= c1x),
                          jnp.broadcast_to(phi_r[:, c1x - 1: c1x],
                                           phi_r.shape), phi_r)

    # black half-sweep from red-new + black-old
    phi_n = jnp.where(red, phi_r, _update_all(phi_r, g, f, mu, dt, eps, eta2))

    # reclaim this slot's store buffer (issued two steps ago), then store
    @pl.when(k >= 2)
    def _():
        store_dma(k - 2, slot).wait()

    new_scr[slot] = phi_n
    store_dma(k, slot).start()

    # partial sums over this band's *unique* rows [i*b, min((i+1)*b, H))
    hi = jnp.minimum((i + 1) * b, H)
    keep = (grow >= i * b) & (grow < hi)
    if crop is not None:
        r0, r1, c0, c1x = crop
        keep = keep & (grow >= r0) & (grow < r1) & (cols >= c0) & (cols < c1x)
    m = keep.astype(phi.dtype)
    h_eps = _heaviside(phi_n, eps)
    dphi = phi_n - phi
    flips = ((phi_n >= 0) != (phi >= 0)).astype(phi.dtype)
    part_ref[prow, 0] = jnp.sum(u0 * h_eps * m)
    part_ref[prow, 1] = jnp.sum(h_eps * m)
    part_ref[prow, 2] = jnp.sum(dphi * dphi * m)
    part_ref[prow, 3] = jnp.sum(flips * m)
    part_ref[prow, 4] = jnp.sum(jnp.abs(dphi) * m)
    part_ref[prow, 5] = 0.0
    part_ref[prow, 6] = 0.0
    part_ref[prow, 7] = 0.0

    # drain outstanding stores before the program ends
    @pl.when(k == total - 1)
    def _():
        store_dma(k, slot).wait()

    @pl.when((k == total - 1) & (total >= 2))
    def _():
        store_dma(k - 1, (k - 1) % 2).wait()


@functools.partial(jax.jit, static_argnames=("p", "crop", "interpret"))
def fused_iteration(phi, u0, c1, c2, p: CVParams, parity=None, crop=None,
                    edges=None, interpret: bool = False
                    ) -> Tuple[jax.Array, jax.Array]:
    """One fused red-black iteration.

    Returns (phi_new, partials (8,)) with partials summed over bands:
    [s_uH, s_H, s_dphi2, flips, s_absdphi, 0, 0, 0].

    Sharded-shard mode (parallel/sharded.py): ``parity`` (traced int
    scalar) offsets the red-black lattice, ``crop`` (static (r0, r1, c0,
    c1)) restricts the partial sums to the shard's own window, and
    ``edges`` (traced (4,) float flags [top, bottom, left, right]) marks
    which sides of the canvas are global boundaries whose replica halos
    get resynced between the half-sweeps.
    """
    H, W = phi.shape
    if not supports(H, W):
        raise ValueError(f"pallas fast path unsupported for shape {phi.shape}"
                         f" (need W % 128 == 0, H % 8 == 0, H >= 24)")
    if crop is not None:
        r0, r1, _, _ = crop
        # the between-sweep edge resync hardcodes the 4-deep-halo canvas
        # geometry of parallel/sharded.py (top source row r0 valid only for
        # tiles with s == 0, bottom source fixed at canvas row H - 5)
        if r0 > _HALO_UP or r1 != H - 4:
            raise ValueError(
                f"crop {crop} does not match the supported halo geometry "
                f"(need r0 <= {_HALO_UP} and r1 == H - 4 == {H - 4})")
    b = band_rows(H, W)
    nbands = pl.cdiv(H, b)
    par = jnp.asarray(0 if parity is None else parity)
    if edges is None:
        edges = jnp.zeros((4,), phi.dtype)
    c = jnp.concatenate([
        jnp.stack([jnp.asarray(c1, phi.dtype), jnp.asarray(c2, phi.dtype),
                   par.astype(phi.dtype)]),
        jnp.asarray(edges, phi.dtype), jnp.zeros((1,), phi.dtype),
    ]).reshape(1, 8)

    kernel = functools.partial(
        _fused_band_kernel, H=H, W=W, b=b, mu=p.mu, nu=p.nu,
        l1=p.lambda1, l2=p.lambda2, dt=p.dt, eps=p.eps, eta2=p.eta2,
        crop=crop)
    return _call_fused(kernel, phi, u0, c, (nbands,), nbands, b, interpret)


def _call_fused(kernel, phi, u0, c, grid, nparts, b, interpret):
    H, W = phi.shape[-2:]

    phi_new, partials = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            # whole-array SMEM (row-blocking is not lowerable on TPU);
            # each grid step writes its own row
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(phi.shape, phi.dtype),
            jax.ShapeDtypeStruct((nparts, 8), phi.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b + _HALO, W), phi.dtype),
            pltpu.VMEM((2, b + _HALO, W), phi.dtype),
            pltpu.VMEM((2, b + _HALO, W), phi.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c, phi, u0)
    if phi.ndim == 3:
        nbands = nparts // phi.shape[0]
        return phi_new, jnp.sum(
            partials.reshape(phi.shape[0], nbands, 8), axis=1)
    return phi_new, jnp.sum(partials, axis=0)


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def fused_sweep(phi, f, p: CVParams, parity=None,
                interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """One fused red-black SWEEP with a precomputed data term ``f``.

    The multiphase fast path (models/multiphase.py): coupling terms are
    built outside, the kernel does the two half-sweeps + the flip/delta
    partials. Returns (phi_new, partials (8,)); partial slots 0/1 (u*H, H)
    are meaningless in this mode.
    """
    H, W = phi.shape
    if not supports(H, W):
        raise ValueError(f"pallas fast path unsupported for shape "
                         f"{phi.shape}")
    b = band_rows(H, W)
    nbands = pl.cdiv(H, b)
    par = jnp.asarray(0 if parity is None else parity)
    c = jnp.concatenate([jnp.zeros((2,), phi.dtype),
                         par.astype(phi.dtype)[None],
                         jnp.zeros((5,), phi.dtype)]).reshape(1, 8)
    kernel = functools.partial(
        _fused_band_kernel, H=H, W=W, b=b, mu=p.mu, nu=p.nu,
        l1=p.lambda1, l2=p.lambda2, dt=p.dt, eps=p.eps, eta2=p.eta2,
        data_is_f=True)
    return _call_fused(kernel, phi, f, c, (nbands,), nbands, b, interpret)


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def fused_iteration_batch(phis, u0s, c1s, c2s, p: CVParams,
                          interpret: bool = False
                          ) -> Tuple[jax.Array, jax.Array]:
    """One fused red-black iteration over a stack (N, H, W).

    The frame axis is a leading grid dimension of the same kernel (vmap
    cannot batch ANY-memory-space refs on TPU). c1s/c2s: (N,) per-frame
    means. Returns (phi_new (N, H, W), partials (N, 8)).
    """
    N, H, W = phis.shape
    if not supports(H, W):
        raise ValueError(f"pallas fast path unsupported for {phis.shape}")
    b = band_rows(H, W)
    nbands = pl.cdiv(H, b)
    zeros = jnp.zeros((N,), phis.dtype)
    c = jnp.stack([c1s.astype(phis.dtype), c2s.astype(phis.dtype)]
                  + [zeros] * 6, axis=1)  # (N, 8)

    kernel = functools.partial(
        _fused_band_kernel, H=H, W=W, b=b, mu=p.mu, nu=p.nu,
        l1=p.lambda1, l2=p.lambda2, dt=p.dt, eps=p.eps, eta2=p.eta2,
        batched=True)
    return _call_fused(kernel, phis, u0s, c, (N, nbands), N * nbands, b,
                       interpret)
