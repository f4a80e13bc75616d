#!/usr/bin/env python
"""MorphACWE throughput at headline sizes (round-4 capability bench).

Measures the lean fixed-iteration driver (segment_morph_iterations - no
trace reductions) at 4K/8K gray and RGB with the single-dispatch timing
discipline of bench_sizes.py (perturb + solve + scalar probe inside ONE
jitted program; the tunneled dev chip costs ~25 ms per dispatch). The
morphological iteration is ~10 fusable elementwise passes + 2 mean
reductions - expect it to be HBM-bound, i.e. well above the PDE kernels
in Mpix-it/s; the interesting number is the ratio to the packed banded
PDE rate at the same size (README headline table).

Run: python scripts/bench_morph.py [iters] [k=N] [predg=0|1] [name ...]
(k=N overrides the kernel chunk depth on the kernel legs; N*smoothing
must be even or the auto route silently resolves to jnp - each leg
prints its RESOLVED route so a mislabeled A/B is impossible.)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.models.morph import segment_morph_iterations
from chan_vese_tpu.models.morph_gac import _route_kernel
from chan_vese_tpu.params import CVParams


def route_label(shape2d, up, kk, kind):
    """The route a leg will ACTUALLY take (ADVICE r4: an odd k= override
    fails the (k*smoothing)%2 check and the auto leg silently falls back
    to jnp - print the resolved route so the A/B labels stay honest)."""
    if up is False:
        return "jnp(forced)"
    try:
        use_k, rk = _route_kernel(shape2d, kk, 1, kind, up, False)
    except ValueError as e:
        return f"ERROR({e})"
    return f"kernel(k={rk})" if use_k else "jnp(fallback)"


def timeit(run, *args, reps=3):
    _ = float(run(*args, jnp.float32(0)))  # compile + warm
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        _ = float(run(*args, jnp.float32(r + 1)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    # args: [iters] [k=N] [name-substring ...]; k= overrides the kernel
    # chunk depth on the kernel legs (A/B smaller unrolls if the k=8
    # Python-unrolled body compiles pathologically on Mosaic)
    rest = sys.argv[1:]
    iters = int(rest.pop(0)) if rest and rest[0].isdigit() else 800
    kk = None
    predg = False
    fusef = False
    for a in list(rest):
        if a.startswith("k="):
            kk = int(a[2:])
            rest.remove(a)
        elif a.startswith("predg="):
            predg = bool(int(a[6:]))
            rest.remove(a)
        elif a.startswith("fusef="):
            fusef = bool(int(a[6:]))
            rest.remove(a)
    only = [a.lower() for a in rest]
    print(f"backend={jax.default_backend()} iters={iters} k={kk} "
          f"pre_dg={predg} fuse_force={fusef}", flush=True)
    rng = np.random.default_rng(0)
    p = CVParams()

    def run_morph(up):
        @jax.jit
        def run(u, r):
            res = segment_morph_iterations(u + r, p, iters=iters,
                                           smoothing=1, use_pallas=up,
                                           k=kk if up is not False else None,
                                           fuse_force=(fusef
                                                       and up is not False))
            return res.ls[0, 0]
        return run

    # auto = banded Pallas kernel on TPU (frozen means per k=8 chunk);
    # -jnp legs force the per-iteration jnp path for the A/B
    for kind, up in [("", None), ("-jnp", False)]:
        for base, shape in [("4K gray", (2160, 3840)),
                            ("8K gray", (4320, 7680)),
                            ("16K gray", (8640, 15360)),
                            ("4K RGB", (2160, 3840, 3)),
                            ("8K RGB", (4320, 7680, 3))]:
            name = base + kind
            if only and not any(s in name.lower() for s in only):
                continue
            u = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
            route = route_label(shape[:2], up, kk, "acwe")
            print(f"{name:12s} route={route}", flush=True)
            t = timeit(run_morph(up), u)
            mpix = shape[0] * shape[1] * iters / t / 1e6
            print(f"{name:12s} morph smoothing=1: {mpix:9.1f} Mpix-it/s "
                  f"({t:.4f}s) [{route}]", flush=True)

    # MorphGAC: the reduction-free sibling (balloon + attraction +
    # smoothing, zero reductions in the loop body) on a precomputed
    # synthetic edge map - the perturbation keeps XLA from folding it.
    # The kernel route is trajectory-exact (not a frozen class).
    from chan_vese_tpu.models.morph_gac import segment_gac_iterations

    def run_gac(up):
        @jax.jit
        def run(g, r):
            res = segment_gac_iterations(g + 1e-6 * r, p, iters=iters,
                                         smoothing=1, balloon=1,
                                         threshold=0.3, use_pallas=up,
                                         k=kk if up is not False else None,
                                         pre_dg=predg and up is not False)
            return res.ls[0, 0]
        return run

    for kind, up in [("", None), ("-jnp", False)]:
        for base, shape in [("4K gac", (2160, 3840)),
                            ("8K gac", (4320, 7680)),
                            ("16K gac", (8640, 15360))]:
            name = base + kind
            if only and not any(s in name.lower() for s in only):
                continue
            g = jnp.asarray(rng.uniform(0.05, 1.0, shape)
                            .astype(np.float32))
            route = route_label(shape, up, kk, "gac")
            print(f"{name:12s} route={route}", flush=True)
            t = timeit(run_gac(up), g)
            mpix = shape[0] * shape[1] * iters / t / 1e6
            print(f"{name:12s} gac balloon=1 smoothing=1: {mpix:9.1f} "
                  f"Mpix-it/s ({t:.4f}s) [{route}]", flush=True)


if __name__ == "__main__":
    main()
