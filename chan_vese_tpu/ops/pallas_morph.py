"""Banded multi-iteration Pallas kernels for the morphological family.

Why a kernel at all: the jnp morphological iteration is ~10 shift +
min/max passes, and XLA materializes every concat-shift - measured
2026-08-20 on v5e (artifacts/bench_morph_2026-08-20_jnp.out): 4.3 G
(4K) / 2.4 G (8K) Mpix-it/s, ANTI-scaling with size, vs 25.7 G for the
packed banded PDE kernel. The fix is the same banded
k-iterations-per-HBM-pass scheme as ops/pallas_banded.py, and the
morphological family is an even better fit:

  * the loop body is pure min/max/select VPU arithmetic - no
    transcendentals, tiny register pressure, fast Mosaic compiles;
  * MorphGAC has NO reductions anywhere in its iteration, so a k-deep
    chunk is trajectory-EXACT for any k (not a frozen-means class);
  * MorphACWE's only reduction is the region means - frozen per chunk
    exactly like the PDE banded kernel's c1/c2 (k=1 reproduces the
    published per-iteration-means scheme bit-for-bit), and the frozen
    data force f is then a per-chunk INVARIANT computed in one fused
    jnp pass outside the kernel.

Scheme (mirrors _banded_kernel_fusej's DMA schedule):

    grid (nbands,); band i loads a (b + up + dn, W) window of the level
    set + ONE auxiliary plane (ACWE: the frozen force f; GAC: the edge
    map g - its gradients and balloon mask are recomputed per iteration
    from the tile, cheaper than 3x the DMA traffic), runs k full
    iterations in VMEM with the k-loop UNROLLED in Python (the
    SIoIS/ISoSI alternation parity is then compile-time static - see
    below), and stores the owned b rows. Double-buffered slots,
    prefetch of band i+1 during band i, stores draining two bands
    behind.

Exactness: every operator in the family reads neighbors at distance 1,
so one iteration has reach R = 1 + 2s (ACWE: force + s cycles of two
ops) or R = 2 + 2s (GAC: balloon then attraction). After j in-tile
iterations, tile rows [R*j, T - R*j) still carry the exact global
trajectory; symmetric halos of ceil8(R*k) keep the owned band exact
through all k iterations. Where the window clips at the image top or
bottom the tile edge IS the image edge, so the in-tile clamped shifts
equal the global replica/Neumann semantics exactly (the invariant of
ops/pallas_sweep.py, symmetric here). The auxiliary plane's in-tile
derivatives (GAC) are wrong only on the tile's outermost row, whose
influence after k iterations stays strictly inside the discarded halo.

Alternation parity: the smoothing-call counter of iteration n, cycle c
is (n0 + n)*s + c. The kernel requires (k*s) % 2 == 0 (auto picks even
k), which makes every chunk start at the same parity (start*s) % 2 -
a compile-time constant, so the Python-unrolled body bakes the
SIoIS/ISoSI sequence in with zero traced control flow.

Values are binary {0.0, 1.0} floats and every operation is min/max/
select, so kernel-vs-jnp equivalence is EXACT (bitwise) in any dtype -
pinned in tests/test_pallas_morph.py for both families, plus the
frozen-means trajectory semantics for ACWE at k > 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import _VMEM_LIMIT

# declared scratch = 3 tiles x 2 slots; the morphological body's Mosaic
# temporaries are the 8 shifted neighbor planes of the active op (far
# lighter than the PDE sweep's ~16 spill tiles - no face-coefficient
# chains, no transcendentals). GAC budgets more tile-rows per row: its
# body recomputes dgx/dgy/balloon-mask from the g tile each iteration
# on TOP of the neighbor planes - measured 2026-08-20 on chip: 4K GAC
# k=8 at the 18-tile sizing was a compile-time VMEM OOM (131.4M of
# 128M, +3.4M over) while every ACWE leg fit; 24 tiles shortens bands
# ~25% and clears it
_TILES = 18
_TILES_GAC = 24
# gac_pre declares 4 extra aux tiles (3-plane stack x 2 slots vs 1) but
# its body drops the per-iteration dg recompute temporaries
_TILES_GAC_PRE = 28
_TILES_BY_KIND = {"acwe": _TILES, "gac": _TILES_GAC,
                  "gac_pre": _TILES_GAC_PRE,
                  "acwe_fused": 22,  # 4 declared tile-pairs (ls/u0/f/work)
                  # sharded-canvas variants: base + rim-refresh temps
                  "acwe_sh": 20, "gac_pre_sh": 30}
_VMEM_BUDGET = _VMEM_LIMIT  # tests shrink this to force multi-band layouts


def _reach(kind: str, smoothing: int) -> int:
    """Neighbor reach of ONE full iteration."""
    return (1 if kind.startswith("acwe") else 2) + 2 * smoothing


def _halo_morph(k: int, smoothing: int, kind: str) -> int:
    """Symmetric halo depth for k in-tile iterations, sublane-aligned."""
    return -(-_reach(kind, smoothing) * k // 8) * 8


# acwe_fused measured 97.41M actual scoped at a T=192 8K tile (~16.6
# effective tiles, OOM at factor 16); 18 keeps opt-in geometries inside
_SCOPED_TILES = {"acwe": 14, "gac": 16, "gac_pre": 20, "acwe_fused": 18,
                 "acwe_sh": 16, "gac_pre_sh": 22}


def band_rows_morph(h: int, w: int, k: int, smoothing: int,
                    kind: str) -> int:
    """Largest multiple-of-8 band height fitting VMEM with k-deep halos.

    TWO ceilings: the declared-scratch budget (per-kind _TILES rows/row)
    AND the calibrated scoped-footprint model, which tracks the TILE
    height T = b + 2*halo (_SCOPED_TILES of T x W f32 - see
    supports_morph_banded). At 16K width the scoped ceiling BINDS: the
    budget formula's b=88 gives T*W past the measured OOM line, but
    shrinking to b=64 (T=112) fits - a ~43% halo-redundancy tax that
    still beats the 2.45G jnp fallback by an order of magnitude. At
    4K/8K defaults the scoped ceiling is slack and b is unchanged."""
    hal = _halo_morph(k, smoothing, kind)
    per_row = w * 4 * _TILES_BY_KIND[kind]
    b_budget = max(8, (_VMEM_BUDGET // per_row) // 8 * 8)
    t_scoped = _VMEM_BUDGET // (w * 4 * _SCOPED_TILES[kind])
    b_scoped = (t_scoped - 2 * hal) // 8 * 8
    b = min(b_budget, max(8, b_scoped))
    return min(b, max(8, ((h - 2 * hal) // 8) * 8))


def supports_morph_banded(h: int, w: int, k: int, smoothing: int,
                          kind: str = "acwe") -> bool:
    """Geometry support. NOTE the jitted chunk-loop drivers additionally
    require (k * smoothing) % 2 == 0 so the SIoIS/ISoSI parity at a
    chunk's first iteration is chunk-invariant (parity0 is a
    compile-time constant of the kernel); odd products are still usable
    by alternating parity0 across chunks at the Python level (tests).

    The last clause rejects geometries whose scoped-VMEM footprint
    would blow the compile: Mosaic's scoped usage tracks the TILE
    height T = b + 2*halo (the PDE band-sizing lesson - spills scale
    with T, not b). Calibrated against the 2026-08-20 on-chip ladder:
    ACWE scoped = ~13.7 tiles of T x W f32 (8K k=16, T=272: OOM at
    114.4M of the 96M limit; every measured-good config <= 94.3M) ->
    factor 14; GAC's heavier body at its 24-row sizing stays <= 16
    tiles across measured-good configs -> factor 16. A rejected
    geometry falls back to the jnp path (the route is printed by
    scripts/bench_morph.py)."""
    hal = _halo_morph(k, smoothing, kind)
    b = band_rows_morph(h, w, k, smoothing, kind)
    scoped_tiles = _SCOPED_TILES[kind]
    return (w % 128 == 0 and h % 8 == 0 and 1 <= k <= 64
            and b + 2 * hal <= h
            and (b + 2 * hal) * w * 4 * scoped_tiles <= _VMEM_BUDGET)


# ---------------------------------------------------------------------------
# in-tile operators (clamped shifts == global replica at image edges)
# ---------------------------------------------------------------------------

def _su(x):
    return jnp.concatenate([x[:1], x[:-1]], axis=0)


def _sd(x):
    return jnp.concatenate([x[1:], x[-1:]], axis=0)


def _col_ids(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _sl(x):
    # roll + edge re-select, NOT a lane-dim concat of 1-column slices:
    # the concat form wedged the Mosaic compile on the real chip
    # (2026-08-20: >39 min with no output even at k=1, while every
    # roll-based PDE kernel compiles in minutes). Same clamped-shift
    # values bitwise, so the kernel==jnp parity tests are unaffected.
    r = pltpu.roll(x, 1, 1)
    return jnp.where(_col_ids(x.shape) == 0, x, r)


def _sr(x):
    r = pltpu.roll(x, x.shape[1] - 1, 1)  # roll left by 1 (shift >= 0)
    return jnp.where(_col_ids(x.shape) == x.shape[1] - 1, x, r)


def _neighbors8_t(u):
    up, dn, lf, rt = _su(u), _sd(u), _sl(u), _sr(u)
    return up, dn, lf, rt, _sl(up), _sr(up), _sl(dn), _sr(dn)


def _sup_inf_t(u):
    up, dn, lf, rt, ul, ur, dl, dr = _neighbors8_t(u)
    e_h = jnp.minimum(jnp.minimum(lf, rt), u)
    e_v = jnp.minimum(jnp.minimum(up, dn), u)
    e_d = jnp.minimum(jnp.minimum(ul, dr), u)
    e_a = jnp.minimum(jnp.minimum(ur, dl), u)
    return jnp.maximum(jnp.maximum(e_h, e_v), jnp.maximum(e_d, e_a))


def _inf_sup_t(u):
    up, dn, lf, rt, ul, ur, dl, dr = _neighbors8_t(u)
    d_h = jnp.maximum(jnp.maximum(lf, rt), u)
    d_v = jnp.maximum(jnp.maximum(up, dn), u)
    d_d = jnp.maximum(jnp.maximum(ul, dr), u)
    d_a = jnp.maximum(jnp.maximum(ur, dl), u)
    return jnp.minimum(jnp.minimum(d_h, d_v), jnp.minimum(d_d, d_a))


def _dilate8_t(u):
    up, dn, lf, rt, ul, ur, dl, dr = _neighbors8_t(u)
    m = jnp.maximum
    return m(m(m(up, dn), m(lf, rt)), m(m(ul, ur), m(m(dl, dr), u)))


def _erode8_t(u):
    up, dn, lf, rt, ul, ur, dl, dr = _neighbors8_t(u)
    m = jnp.minimum
    return m(m(m(up, dn), m(lf, rt)), m(m(ul, ur), m(m(dl, dr), u)))


def _iterate(u, aux, j, *, kind, smoothing, parity0, balloon, thr_b,
             one, zero, rim=None):
    """One full morphological iteration (force + smoothing) on the tile.

    ``j`` and all parameters are compile-time constants: the caller
    unrolls the k-loop in Python, so the SIoIS/ISoSI parity at
    iteration j, cycle c - parity0 + j*smoothing + c - is static.

    ``rim`` (sharded-canvas mode): a callback applied BEFORE every
    elementary stencil read, refreshing the depth-1 global-edge replica
    ring of a halo-padded shard block (the per-op cadence is
    load-bearing - parallel/sharded_morph.py module docstring; depth 1
    suffices because every elementary op reads exactly 1 deep and the
    ring is re-refreshed before the next read, the _resync_rim
    argument of ops/pallas_sweep.py)."""
    r = rim if rim is not None else (lambda x: x)
    if kind.startswith("acwe"):
        u = r(u)
        f = aux
        gx = _sd(u) - _su(u)
        gy = _sr(u) - _sl(u)
        a = (jnp.abs(gx) + jnp.abs(gy)) * f
        u = jnp.where(a < 0, one, jnp.where(a > 0, zero, u))
    elif kind.startswith("gac_pre"):
        # preloaded invariants: aux = (3, T, W) stack of dgx, dgy, mask
        # (run invariants of the GAC flow, computed ONCE by the driver -
        # saves ~8 tile-ops of in-tile dg recompute per iteration at the
        # cost of two extra DMA planes per chunk; bitwise-identical
        # values, and the preloaded derivatives are exact even on the
        # tile's outermost row where the in-tile recompute is clamped)
        dgx, dgy, mask = aux[0], aux[1], aux[2]
        if balloon > 0:
            u = r(u)
            u = jnp.where(mask > 0, _dilate8_t(u), u)
        elif balloon < 0:
            u = r(u)
            u = jnp.where(mask > 0, _erode8_t(u), u)
        u = r(u)
        dux = 0.5 * (_sd(u) - _su(u))
        duy = 0.5 * (_sr(u) - _sl(u))
        a = dgx * dux + dgy * duy
        u = jnp.where(a > 0, one, jnp.where(a < 0, zero, u))
    else:  # gac
        g = aux
        if balloon > 0:
            u = jnp.where(g > thr_b, _dilate8_t(u), u)
        elif balloon < 0:
            u = jnp.where(g > thr_b, _erode8_t(u), u)
        dgx = 0.5 * (_sd(g) - _su(g))
        dgy = 0.5 * (_sr(g) - _sl(g))
        dux = 0.5 * (_sd(u) - _su(u))
        duy = 0.5 * (_sr(u) - _sl(u))
        a = dgx * dux + dgy * duy
        u = jnp.where(a > 0, one, jnp.where(a < 0, zero, u))
    for c in range(smoothing):
        if (parity0 + j * smoothing + c) % 2 == 0:
            u = _sup_inf_t(r(_inf_sup_t(r(u))))
        else:
            u = _inf_sup_t(r(_sup_inf_t(r(u))))
    return u


def _morph_fused_kernel(c_ref, ls_hbm, u0_hbm, out_hbm, part_ref,
                        ls_scr, u0_scr, f_scr, work_scr, sems,
                        *, H, W, b, k, hal, smoothing, parity0):
    """ACWE variant with the force fused IN-KERNEL (kind='acwe_fused'):
    aux = the RAW image (a run invariant - one HBM load per chunk
    instead of a fresh force plane written and re-read every chunk);
    the frozen force f = l1*(u0-c_in)^2 - l2*(u0-c_out)^2 is one cheap
    VPU pass per band from the SMEM scalars c_ref = (c_in, c_out, l1,
    l2), and the kernel RETURNS the owned-row region partials
    (n_in, sum_u*ls) of its FINAL state so the driver refreshes the
    next chunk's means with ZERO full-array jnp passes - the PDE
    _banded_kernel's c_ref/part_ref scheme (ops/pallas_banded.py).
    Same frozen-means-per-chunk trajectory; only the reduction ORDER of
    sum_in differs from the jnp driver (bandwise vs full-array tree),
    a ~1e-7 relative means difference that can flip a pixel only on an
    exact force-sign tie."""
    T = b + 2 * hal
    i = pl.program_id(0)
    nbands = pl.num_programs(0)

    def window(ii):
        g0 = pl.multiple_of(jnp.minimum(ii * b, H - b), 8)
        s = pl.multiple_of(jnp.clip(g0 - hal, 0, H - T), 8)
        return g0, s

    def load_dmas(ii, slot):
        _, s = window(ii)
        return (pltpu.make_async_copy(ls_hbm.at[pl.ds(s, T), :],
                                      ls_scr.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(u0_hbm.at[pl.ds(s, T), :],
                                      u0_scr.at[slot], sems.at[slot, 1]))

    def store_dma(ii, slot):
        g0, s = window(ii)
        o = pl.multiple_of(g0 - s, 8)
        return pltpu.make_async_copy(
            work_scr.at[slot].at[pl.ds(o, b), :],
            out_hbm.at[pl.ds(g0, b), :], sems.at[slot, 2])

    slot = i % 2

    @pl.when(i == 0)
    def _():
        for dma in load_dmas(i, slot):
            dma.start()

    @pl.when(i + 1 < nbands)
    def _():
        for dma in load_dmas(i + 1, (i + 1) % 2):
            dma.start()

    for dma in load_dmas(i, slot):
        dma.wait()

    @pl.when(i >= 2)
    def _():
        store_dma(i - 2, slot).wait()

    c_in, c_out, l1, l2 = (c_ref[0, 0], c_ref[0, 1], c_ref[0, 2],
                           c_ref[0, 3])
    u0t = u0_scr[slot]
    f_scr[slot] = l1 * (u0t - c_in) ** 2 - l2 * (u0t - c_out) ** 2

    work_scr[slot] = ls_scr[slot]
    dt = ls_scr.dtype
    it = functools.partial(_iterate, kind="acwe", smoothing=smoothing,
                           parity0=parity0, balloon=0, thr_b=0.0,
                           one=jnp.ones((), dt), zero=jnp.zeros((), dt))
    u = 1 if smoothing % 2 == 0 else 2

    def trip(t, _):
        for j in range(u):
            work_scr[slot] = it(work_scr[slot], f_scr[slot], j)
        return 0

    jax.lax.fori_loop(0, k // u, trip, 0, unroll=False)
    for j in range((k // u) * u, k):
        work_scr[slot] = it(work_scr[slot], f_scr[slot], j)

    # owned-row region partials of the final state (next chunk's means).
    # Ownership = the NON-overlapping partition [i*b, (i+1)*b) in GLOBAL
    # rows (the PDE _banded_kernel convention): the last band's window
    # clamps to H-b and overlaps its predecessor, so the local owned
    # range would double-count the overlap rows.
    _, s = window(i)
    grow = (jax.lax.broadcasted_iota(jnp.int32, (T, W), 0) + s)
    hi = jnp.minimum((i + 1) * b, H)
    m = ((grow >= i * b) & (grow < hi)).astype(dt)
    lsf = work_scr[slot]
    part_ref[i, 0] = jnp.sum(lsf * m)
    part_ref[i, 1] = jnp.sum(u0_scr[slot] * lsf * m)

    store_dma(i, slot).start()

    @pl.when(i == nbands - 1)
    def _():
        store_dma(i, slot).wait()

    @pl.when((i == nbands - 1) & (nbands >= 2))
    def _():
        store_dma(i - 1, (i - 1) % 2).wait()


def _morph_banded_kernel(*refs, H, W, b, k, hal, kind, smoothing,
                         parity0, balloon, thr_b, pads=None):
    """Grid (nbands,): band i runs all k iterations Python-unrolled,
    with a work_scr ref round-trip after every iteration so nothing
    tile-sized stays live across iteration boundaries (the register-
    pressure discipline of _banded_kernel_fusej's step()).

    Sharded-canvas mode (``pads`` = static (pt, pb, pcl, pcr) pad
    depths of a halo-padded shard block; a leading SMEM flags ref
    carries the traced is_top/is_bot/is_left/is_right edge booleans):
    a depth-1 replica-ring refresh runs before EVERY elementary
    stencil op via the rim callback - 4 static shifts + 4 selects per
    refresh (see _iterate's rim docstring)."""
    if pads is None:
        ls_hbm, aux_hbm, out_hbm, ls_scr, aux_scr, work_scr, sems = refs
        flags_ref = None
    else:
        (flags_ref, ls_hbm, aux_hbm, out_hbm,
         ls_scr, aux_scr, work_scr, sems) = refs
    T = b + 2 * hal
    i = pl.program_id(0)
    nbands = pl.num_programs(0)

    def window(ii):
        g0 = pl.multiple_of(jnp.minimum(ii * b, H - b), 8)
        s = pl.multiple_of(jnp.clip(g0 - hal, 0, H - T), 8)
        return g0, s

    def load_dmas(ii, slot):
        _, s = window(ii)
        aux_src = (aux_hbm.at[:, pl.ds(s, T), :]
                   if kind.startswith("gac_pre")
                   else aux_hbm.at[pl.ds(s, T), :])
        return (pltpu.make_async_copy(ls_hbm.at[pl.ds(s, T), :],
                                      ls_scr.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(aux_src,
                                      aux_scr.at[slot], sems.at[slot, 1]))

    def store_dma(ii, slot):
        g0, s = window(ii)
        o = pl.multiple_of(g0 - s, 8)
        return pltpu.make_async_copy(
            work_scr.at[slot].at[pl.ds(o, b), :],
            out_hbm.at[pl.ds(g0, b), :], sems.at[slot, 2])

    slot = i % 2

    @pl.when(i == 0)
    def _():
        for dma in load_dmas(i, slot):
            dma.start()

    @pl.when(i + 1 < nbands)
    def _():
        for dma in load_dmas(i + 1, (i + 1) % 2):
            dma.start()

    for dma in load_dmas(i, slot):
        dma.wait()

    @pl.when(i >= 2)
    def _():
        store_dma(i - 2, slot).wait()

    work_scr[slot] = ls_scr[slot]
    dt = ls_scr.dtype
    rim = None
    if pads is not None:
        pt, pb, pcl, pcr = pads
        _, s_band = window(i)
        is_top = flags_ref[0, 0] > 0
        is_bot = flags_ref[0, 1] > 0
        is_left = flags_ref[0, 2] > 0
        is_right = flags_ref[0, 3] > 0

        def rim(x):
            grow = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
                    + s_band)
            cols = _col_ids(x.shape)
            x = jnp.where(is_top & (grow == pt - 1), _sd(x), x)
            x = jnp.where(is_bot & (grow == H - pb), _su(x), x)
            x = jnp.where(is_left & (cols == pcl - 1), _sr(x), x)
            x = jnp.where(is_right & (cols == W - pcr), _sl(x), x)
            return x

    it = functools.partial(_iterate, kind=kind, smoothing=smoothing,
                           parity0=parity0, balloon=balloon, thr_b=thr_b,
                           one=jnp.ones((), dt), zero=jnp.zeros((), dt),
                           rim=rim)
    # k-loop structure (measured 2026-08-20, scripts/probe_morph_bisect):
    # Mosaic compile time explodes super-linearly in the STATICALLY
    # unrolled body size x tile area - k=2 compiles in 3 s, k=8 in
    # 250 s at 512x1280, and k=8 at 4K sat >25 min with no output (the
    # round-4 wedge; the concat->roll _sl/_sr rewrite alone did NOT fix
    # it). So unroll only the minimal u keeping the SIoIS/ISoSI parity
    # compile-time static ((u*s) % 2 == 0: iteration j = u*t + i has
    # parity (parity0 + i*s + c) independent of the traced t) and run
    # the k//u trips as a fori_loop - the exact structure of the PDE
    # _banded_kernel_fusej. Trailing k % u iterations (tolerance-driver
    # remainder chunks) unroll at static positions after the loop.
    u = 1 if smoothing % 2 == 0 else 2

    def trip(t, _):
        for i in range(u):
            work_scr[slot] = it(work_scr[slot], aux_scr[slot], i)
        return 0

    jax.lax.fori_loop(0, k // u, trip, 0, unroll=False)
    for j in range((k // u) * u, k):
        work_scr[slot] = it(work_scr[slot], aux_scr[slot], j)

    store_dma(i, slot).start()

    @pl.when(i == nbands - 1)
    def _():
        store_dma(i, slot).wait()

    @pl.when((i == nbands - 1) & (nbands >= 2))
    def _():
        store_dma(i - 1, (i - 1) % 2).wait()


def _call_morph(ls, aux, *, k, smoothing, kind, parity0, balloon, thr_b,
                interpret, pads=None, flags=None):
    H, W = ls.shape
    if not supports_morph_banded(H, W, k, smoothing, kind):
        raise ValueError(f"morph banded path unsupported for "
                         f"{ls.shape}, k={k}, smoothing={smoothing}")
    hal = _halo_morph(k, smoothing, kind)
    b = band_rows_morph(H, W, k, smoothing, kind)
    nbands = pl.cdiv(H, b)
    T = b + 2 * hal

    kernel = functools.partial(
        _morph_banded_kernel, H=H, W=W, b=b, k=k, hal=hal, kind=kind,
        smoothing=smoothing, parity0=parity0, balloon=balloon,
        thr_b=thr_b, pads=pads)

    plane_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if pads is not None:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + plane_specs
        args = (flags, ls, aux)
    else:
        in_specs = plane_specs
        args = (ls, aux)

    return pl.pallas_call(
        kernel,
        grid=(nbands,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(ls.shape, ls.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, T, W), ls.dtype),   # level-set tiles
            pltpu.VMEM((2, 3, T, W) if kind.startswith("gac_pre")
                       else (2, T, W), ls.dtype),  # aux plane tiles
            pltpu.VMEM((2, T, W), ls.dtype),   # in-chunk iterate
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("k", "smoothing", "parity0",
                                             "interpret"))
def morph_chunk(ls, f, k: int = 8, smoothing: int = 1, parity0: int = 0,
                interpret: bool = False):
    """k MorphACWE iterations against the FROZEN data force ``f`` in one
    HBM pass. ``f`` = lambda1*(img-c_in)^2 - lambda2*(img-c_out)^2
    (summed over channels), computed by the driver per chunk - region
    means are frozen across the chunk exactly like the PDE banded
    kernel's c1/c2 (k=1 == the published per-iteration-means scheme).
    ``parity0`` = the smoothing-call parity at the chunk's first
    iteration ((start_iter * smoothing) % 2; chunk-invariant because
    (k*smoothing) % 2 == 0 is required)."""
    return _call_morph(ls, f, k=k, smoothing=smoothing, kind="acwe",
                       parity0=parity0, balloon=0, thr_b=0.0,
                       interpret=interpret)


@functools.partial(jax.jit, static_argnames=("k", "smoothing", "parity0",
                                             "interpret"))
def morph_chunk_fused(ls, u0, c_in, c_out, l1, l2, k: int = 8,
                      smoothing: int = 1, parity0: int = 0,
                      interpret: bool = False):
    """k MorphACWE iterations with the force fused in-kernel and the
    next chunk's region partials returned: (ls_new, (n_in, sum_in)).
    Gray (H, W) images; u0 is the RAW image (run invariant), c_in/c_out
    the frozen means for this chunk, l1/l2 scalars. Same frozen-means
    trajectory as morph_chunk up to sum_in reduction order
    (_morph_fused_kernel docstring)."""
    H, W = ls.shape
    kind = "acwe_fused"
    if not supports_morph_banded(H, W, k, smoothing, kind):
        raise ValueError(f"fused morph path unsupported for {ls.shape}, "
                         f"k={k}, smoothing={smoothing}")
    hal = _halo_morph(k, smoothing, kind)
    b = band_rows_morph(H, W, k, smoothing, kind)
    nbands = pl.cdiv(H, b)
    T = b + 2 * hal

    kernel = functools.partial(
        _morph_fused_kernel, H=H, W=W, b=b, k=k, hal=hal,
        smoothing=smoothing, parity0=parity0)
    c = jnp.stack([jnp.asarray(v, ls.dtype) for v in
                   (c_in, c_out, l1, l2)]).reshape(1, 4)

    ls_new, parts = pl.pallas_call(
        kernel,
        grid=(nbands,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(ls.shape, ls.dtype),
            jax.ShapeDtypeStruct((nbands, 2), ls.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, T, W), ls.dtype),   # level-set tiles
            pltpu.VMEM((2, T, W), ls.dtype),   # image tiles
            pltpu.VMEM((2, T, W), ls.dtype),   # in-band frozen force
            pltpu.VMEM((2, T, W), ls.dtype),   # in-chunk iterate
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c, ls, u0)
    return ls_new, jnp.sum(parts, axis=0)


@functools.partial(jax.jit, static_argnames=("k", "smoothing", "parity0",
                                             "balloon", "threshold",
                                             "interpret", "pre_dg"))
def gac_chunk(ls, g, k: int = 8, smoothing: int = 1, parity0: int = 0,
              balloon: int = 0, threshold: float = 0.5,
              interpret: bool = False, pre_dg: bool = False):
    """k MorphGAC iterations in one HBM pass - trajectory-EXACT for any
    k (the GAC loop body has no reductions; the edge map g is a run
    invariant).

    ``pre_dg=False``: gradients and the balloon mask are recomputed per
    iteration from the g tile (one aux DMA plane per chunk).
    ``pre_dg=True``: dgx/dgy/mask are computed ONCE here (they are run
    invariants) and streamed as a 3-plane aux stack - trades two extra
    DMA planes per chunk for ~8 fewer tile-ops per iteration in the
    VPU-bound body. Bitwise-identical trajectories (same arithmetic on
    the same values; the preloaded derivatives are additionally exact
    on the tile's outermost rows where the in-tile recompute clamps)."""
    thr_b = threshold / abs(float(balloon)) if balloon else 0.0
    if pre_dg:
        # accept a prebuilt (3, H, W) stack so chunk-loop drivers hoist
        # the invariant computation outside the loop (gac_aux_stack)
        aux = g if g.ndim == 3 else gac_aux_stack(g, balloon, threshold)
        return _call_morph(ls, aux, k=k, smoothing=smoothing,
                           kind="gac_pre", parity0=parity0,
                           balloon=int(balloon), thr_b=thr_b,
                           interpret=interpret)
    return _call_morph(ls, g, k=k, smoothing=smoothing, kind="gac",
                       parity0=parity0, balloon=int(balloon), thr_b=thr_b,
                       interpret=interpret)


def gac_aux_stack(g, balloon: int, threshold: float):
    """The (3, H, W) run-invariant stack (dgx, dgy, balloon mask) the
    pre_dg kernel streams; compute ONCE per run."""
    from .numerics import shift_down, shift_left, shift_right, shift_up

    thr_b = threshold / abs(float(balloon)) if balloon else 0.0
    dgx = 0.5 * (shift_down(g) - shift_up(g))
    dgy = 0.5 * (shift_right(g) - shift_left(g))
    mask = ((g > thr_b).astype(g.dtype) if balloon
            else jnp.zeros_like(g))
    return jnp.stack([dgx, dgy, mask])


@functools.partial(jax.jit, static_argnames=("k", "smoothing", "parity0",
                                             "pads", "interpret"))
def morph_chunk_shard(ls_pad, f_pad, flags, pads, k: int = 8,
                      smoothing: int = 1, parity0: int = 0,
                      interpret: bool = False):
    """k MorphACWE iterations on a halo-PADDED shard block (kernel-per-
    shard inside a comm_k chunk, parallel/sharded_morph.py). ``pads`` =
    static (pt, pb, pcl, pcr) pad depths; ``flags`` = (1, 4) traced
    is_top/is_bot/is_left/is_right as {0., 1.} floats. The depth-1
    global-edge replica ring is refreshed in-kernel before every
    elementary op (rim callback); interior-edge pads rely on the
    exchanged-halo validity budget exactly like the jnp chunk loop."""
    return _call_morph(ls_pad, f_pad, k=k, smoothing=smoothing,
                       kind="acwe_sh", parity0=parity0, balloon=0,
                       thr_b=0.0, interpret=interpret, pads=pads,
                       flags=flags)


@functools.partial(jax.jit, static_argnames=("k", "smoothing", "parity0",
                                             "balloon", "threshold",
                                             "pads", "interpret"))
def gac_chunk_shard(ls_pad, aux_pad, flags, pads, k: int = 4,
                    smoothing: int = 1, parity0: int = 0,
                    balloon: int = 0, threshold: float = 0.5,
                    interpret: bool = False):
    """k MorphGAC iterations on a halo-padded shard block; ``aux_pad`` =
    the padded (3, Hp, Wp) dg/mask stack (gac_aux_stack of the padded
    edge map - run invariant). Same rim-refresh semantics as
    morph_chunk_shard; trajectory-exact for any k."""
    thr_b = threshold / abs(float(balloon)) if balloon else 0.0
    return _call_morph(ls_pad, aux_pad, k=k, smoothing=smoothing,
                       kind="gac_pre_sh", parity0=parity0,
                       balloon=int(balloon), thr_b=thr_b,
                       interpret=interpret, pads=pads, flags=flags)
