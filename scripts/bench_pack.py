"""Micro-benchmark for the parity-plane pack/unpack transform.

The round-4 on-chip profile (artifacts/profile_banded_2026-08-18.out)
showed the packed banded kernel body running at ~28.9 Gpix-it/s while
the per-call pack/unpack costs 17.2 ms at 4K (XLA lowers the
(H,W)<->(2,2,H/2,W/2) deinterleave reshape+transpose at ~12 GB/s
effective, plus two ~3 ms layout copies around the custom call). This
script measures candidate replacements COMPILED ON THE CHIP:

  xla      : the shipped _pack/_unpack (rank-2 reshape+transpose)
  slices   : 4 strided slices / interleave via at[].set (XLA level)
  pallas   : Pallas kernel, in-kernel strided slices (pack) and
             stack+reshape interleave (unpack)
  pallas_rs: Pallas kernel, in-kernel reshape+transpose per block
  mxu      : lane deinterleave as a (256, 256) 0/1 permutation matmul
             on the MXU (exact: every output is one input * 1.0 summed
             with zeros; HIGHEST precision), row split as a major-dim
             transpose whose minor dim stays intact — sidesteps both
             the trailing-length-2 lane reshape (measured ~12 GB/s in
             the round-4 profile) and the stride-2 gather path

First-session results (artifacts/bench_pack_2026-08-18.out): xla
roundtrip in a fused scan = 1.25 ms (XLA elides/fuses the pack∘unpack
pair — NOT representative of the 17.2 ms seen around the custom call),
slices = 129 ms, both Pallas variants failed (stride-2 miscompile /
Mosaic HTTP 500). The pack-only scan below defeats the elision by
accumulating the packed result instead of roundtripping it.

Methodology (axon tunnel: ~25 ms/dispatch): each variant runs
pack->unpack roundtrips in a lax.scan inside ONE jit (adding the step
index so nothing folds), with a forced readback; time/step = one
roundtrip. Variants are timed in alternating reps so session drift
shows up as spread, not bias. Run:

    cd /root/repo && timeout 3600 python scripts/bench_pack.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 2160, 3840
STEPS = 30
BLK = 216  # output plane rows per grid step (input rows = 2*BLK)


# ------------------------------------------------------- XLA level (legacy)
# Inlined (not imported from pallas_packed) so this stays the round-3
# reshape+transpose formulation even now that _pack dispatches to the
# MXU route for W % 256 == 0.
def pack_xla(x):
    h, w = x.shape
    return x.reshape(h // 2, 2, w // 2, 2).transpose(1, 3, 0, 2)


def unpack_xla(p):
    _, _, hp, wp = p.shape
    return p.transpose(2, 0, 3, 1).reshape(2 * hp, 2 * wp)


def pack_slices(x):
    return jnp.stack([jnp.stack([x[a::2, b::2] for b in range(2)])
                      for a in range(2)])


def unpack_slices(p):
    z = jnp.zeros((H, W), p.dtype)
    for a in range(2):
        for b in range(2):
            z = z.at[a::2, b::2].set(p[a, b])
    return z


# ---------------------------------------------------------------- MXU
G = 256  # lane-deinterleave block (W % G == 0; supports_packed needs 256)


def _perm_matrix(g):
    """(g, g) 0/1 f32: column j<g/2 selects input lane 2j (evens),
    column j>=g/2 selects input lane 2(j-g/2)+1 (odds)."""
    p = np.zeros((g, g), np.float32)
    p[2 * np.arange(g // 2), np.arange(g // 2)] = 1.0
    p[2 * np.arange(g // 2) + 1, g // 2 + np.arange(g // 2)] = 1.0
    return jnp.asarray(p)


_P = None  # built in _register (first jnp touch stays out of import)


def pack_mxu(x):
    h, w = x.shape
    xb = x.reshape(h, w // G, G)
    y = jax.lax.dot_general(xb, _P, (((2,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
    ye = y[..., :G // 2].reshape(h, w // 2)   # even columns, compact
    yo = y[..., G // 2:].reshape(h, w // 2)   # odd columns
    pe = ye.reshape(h // 2, 2, w // 2).transpose(1, 0, 2)
    po = yo.reshape(h // 2, 2, w // 2).transpose(1, 0, 2)
    return jnp.stack([pe, po], axis=1)        # [row parity, col parity]


def unpack_mxu(p):
    _, _, hp, wp = p.shape
    h, w = 2 * hp, 2 * wp
    ye = p[:, 0].transpose(1, 0, 2).reshape(h, wp)
    yo = p[:, 1].transpose(1, 0, 2).reshape(h, wp)
    y = jnp.concatenate([ye.reshape(h, w // G, G // 2),
                         yo.reshape(h, w // G, G // 2)], axis=-1)
    xb = jax.lax.dot_general(y, _P, (((2,), (1,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    return xb.reshape(h, w)


# ---------------------------------------------------------------- Pallas
def _pack_kernel_sl(x_ref, out_ref):
    x = x_ref[...]
    for a in range(2):
        for b in range(2):
            out_ref[a, b] = x[a::2, b::2]


def _pack_kernel_rs(x_ref, out_ref):
    x = x_ref[...]
    r = x.reshape(x.shape[0] // 2, 2, x.shape[1] // 2, 2)
    out_ref[...] = r.transpose(1, 3, 0, 2)


def _mk_pack(kernel):
    grid = (H // 2 // BLK,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((2 * BLK, W), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((2, 2, BLK, W // 2), lambda i: (0, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 2, H // 2, W // 2), jnp.float32),
    )


def _unpack_kernel_st(p_ref, out_ref):
    p = p_ref[...]
    rows = []
    for a in range(2):
        rows.append(jnp.stack([p[a, 0], p[a, 1]], axis=-1)
                    .reshape(p.shape[2], W))
    out_ref[...] = jnp.stack(rows, axis=1).reshape(2 * p.shape[2], W)


def _mk_unpack(kernel):
    grid = (H // 2 // BLK,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((2, 2, BLK, W // 2), lambda i: (0, 0, i, 0))],
        out_specs=pl.BlockSpec((2 * BLK, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
    )


VARIANTS = {}


def _register(pallas_variants=False):
    global _P
    _P = _perm_matrix(G)
    VARIANTS["xla"] = (pack_xla, unpack_xla)
    VARIANTS["mxu"] = (pack_mxu, unpack_mxu)
    VARIANTS["mxu_pack_xla_unpack"] = (pack_mxu, unpack_xla)
    VARIANTS["xla_pack_mxu_unpack"] = (pack_xla, unpack_mxu)
    if pallas_variants:  # both failed 2026-08-18; keep for reference
        VARIANTS["slices"] = (pack_slices, unpack_slices)
        VARIANTS["pallas"] = (_mk_pack(_pack_kernel_sl),
                              _mk_unpack(_unpack_kernel_st))
        VARIANTS["pallas_rs"] = (_mk_pack(_pack_kernel_rs),
                                 _mk_unpack(_unpack_kernel_st))


@functools.partial(jax.jit, static_argnames=("name",))
def pack_only(x, name):
    """Accumulate packed results so XLA cannot elide the pack (the
    roundtrip scan fuses pack∘unpack into one elementwise pass).
    Per-step cost = add(HW) + pack + add(planes); subtract the
    'addonly' row (two adds, no pack) to isolate the pack itself."""
    if name == "addonly":
        def step(c, i):
            xx, acc = c
            return (xx, acc + (xx + jnp.float32(i))), None
        init = (x, jnp.zeros_like(x))
    else:
        pack, _ = VARIANTS[name]

        def step(c, i):
            xx, acc = c
            return (xx, acc + pack(xx + jnp.float32(i))), None
        init = (x, jnp.zeros_like(VARIANTS[name][0](x)))

    (_, acc), _ = jax.lax.scan(step, init,
                               jnp.arange(STEPS, dtype=jnp.int32))
    return acc


@functools.partial(jax.jit, static_argnames=("name",))
def roundtrips(x, name):
    pack, unpack = VARIANTS[name]

    def step(carry, i):
        return unpack(pack(carry + jnp.float32(i))), None

    out, _ = jax.lax.scan(step, x, jnp.arange(STEPS, dtype=jnp.int32))
    return out


def check(name, x):
    """One roundtrip must be exact (pack/unpack are permutations)."""
    pack, unpack = VARIANTS[name]
    y = jax.jit(lambda v: unpack(pack(v)))(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    _register()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    for name in VARIANTS:
        try:
            check(name, x)
            _ = roundtrips(x, name).block_until_ready()  # warm/compile
            print(f"{name}: parity OK, compiled", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e!s:.300}",
                  flush=True)
            VARIANTS[name] = None
    live = [n for n, v in VARIANTS.items() if v is not None]
    for rep in range(3):
        for name in live:
            t0 = time.perf_counter()
            out = roundtrips(x, name)
            _ = float(out[0, 0])
            dt = (time.perf_counter() - t0) / STEPS
            gbs = 2 * H * W * 4 / dt / 1e9  # read+write per direction
            print(f"rep{rep} {name:22s}: {dt * 1e3:8.3f} ms/roundtrip "
                  f"({gbs:6.1f} GB/s eff per direction x2)", flush=True)

    # pack-only (elision-proof): warm, then time; addonly = 2-add floor
    ponly = ["addonly"] + [n for n in live if "_" not in n or n == "mxu"]
    for name in ponly:
        out = pack_only(x, name)
        _ = float(np.asarray(out).ravel()[0])
    for rep in range(3):
        for name in ponly:
            t0 = time.perf_counter()
            out = pack_only(x, name)
            _ = float(out.reshape(-1)[0])  # device slice, tiny readback
            dt = (time.perf_counter() - t0) / STEPS
            print(f"rep{rep} pack_only {name:12s}: {dt * 1e3:8.3f} ms/step",
                  flush=True)


if __name__ == "__main__":
    main()
