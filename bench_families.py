#!/usr/bin/env python
"""Per-family round-close benchmark: one JSON line per model family.

VERDICT r4 weak #5: the round-close ritual (bench.py headline +
bench_configs.py eval configs) under-represented the morph and pyramid
families - regressions there were invisible in committed artifacts.
This suite emits one steady-state throughput row per FAMILY at a fixed
representative config, so family regressions show up round-over-round:

    scalar-banded    4K gray, packed banded auto (the headline program)
    vector-banded    4K RGB, packed mc auto
    multiphase-mp2   512^2, fused 4-phase resident auto
    batched-stack    64 x 512^2, data-mesh batched kernel
    morph-acwe       4K gray, lean iterations driver (kernel auto)
    morph-gac        4K gray, lean iterations driver (kernel auto)
    pyramid          4K gray circle-init time-to-converged-mask (ms,
                     lower is better - the one latency-metric row)

Timing discipline: ONE jitted dispatch per rep with an in-program
perturbation + scalar readback (bench_configs._t rationale; the
tunneled dev chip costs ~25 ms per dispatch).

Usage: python bench_families.py [--quick] [name-substring ...]
Writes BENCH_FAMILIES.json (one record per family with honest labels).
"""

import argparse
import json
import time

import numpy as np


def _t(run, *args, reps=3):
    import jax.numpy as jnp
    float(run(*args, jnp.float32(0)))  # compile + warm
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        float(run(*args, jnp.float32(rep + 1)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("only", nargs="*", default=[])
    args = ap.parse_args()
    only = [s.lower() for s in args.only]

    def want(name):
        return not only or any(s in name.lower() for s in only)

    import jax
    import jax.numpy as jnp

    from chan_vese_tpu.params import CVParams

    rng = np.random.default_rng(0)
    p = CVParams()
    iters = 100 if args.quick else 800
    iters_small = 200 if args.quick else 1000
    results = []

    def report(name, label, pixels, it, secs):
        rec = {"family": name, "label": label,
               "mpix_iters_per_s": round(pixels * it / secs / 1e6, 1),
               "iters": it, "seconds": round(secs, 4)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    u4k = jnp.asarray(rng.uniform(0, 255, (2160, 3840)), jnp.float32)
    u4k_rgb = jnp.asarray(rng.uniform(0, 255, (2160, 3840, 3)),
                          jnp.float32)
    u512 = jnp.asarray(rng.uniform(0, 255, (512, 512)), jnp.float32)

    if want("scalar-banded"):
        from chan_vese_tpu.models.banded import segment_banded_fixed

        @jax.jit
        def run_sb(u, r):
            phi, _ = segment_banded_fixed(u + r, p, iters=iters)
            return phi[0, 0]

        t = _t(run_sb, u4k)
        report("scalar-banded", "4K gray packed banded auto",
               u4k.size, iters, t)

    if want("vector-banded"):
        from chan_vese_tpu.models.banded import segment_banded_fixed

        @jax.jit
        def run_vb(u, r):
            phi, _ = segment_banded_fixed(u + r, p, iters=iters)
            return phi[0, 0]

        t = _t(run_vb, u4k_rgb)
        report("vector-banded", "4K RGB packed mc banded auto",
               2160 * 3840, iters, t)

    if want("multiphase-mp2"):
        # segment_multiphase(fixed=True) = the production hot loop
        # (fused mp2 resident kernel); segment_multiphase_fixed is the
        # TRACE twin whose per-iteration energy diagnostic costs as
        # much as the iteration (bench_configs.py config-3 rationale;
        # the first BENCH_FAMILIES record used the trace twin - 2320
        # vs config 3's 5410 - a bench bug, not a routing gap)
        from chan_vese_tpu.models.multiphase import segment_multiphase

        @jax.jit
        def run_mp(u, r):
            res = segment_multiphase(u + r, p, m_sets=2, fixed=True,
                                     max_iter=iters_small)
            return res.phis[0, 0, 0]

        t = _t(run_mp, u512)
        report("multiphase-mp2", "512^2 fused mp2 resident (production)",
               u512.size, iters_small, t)

    if want("batched-stack"):
        from chan_vese_tpu.parallel.data_parallel import \
            segment_stack_sharded
        from chan_vese_tpu.parallel.mesh import make_data_mesh

        stack = jnp.asarray(rng.uniform(0, 255, (64, 512, 512)),
                            jnp.float32)
        it_b = 10 if args.quick else 30
        dmesh = make_data_mesh()
        with jax.set_mesh(dmesh):
            t = _t(jax.jit(
                lambda s, r: segment_stack_sharded(
                    s + r, p, dmesh, iters=it_b)[0][0, 0, 0]), stack)
        report("batched-stack", "64x512^2 stack over the data mesh",
               stack.size, it_b, t)

    if want("morph-acwe"):
        from chan_vese_tpu.models.morph import segment_morph_iterations

        @jax.jit
        def run_ma(u, r):
            res = segment_morph_iterations(u + r, p, iters=iters,
                                           smoothing=1)
            return res.ls[0, 0]

        t = _t(run_ma, u4k)
        report("morph-acwe", "4K gray lean driver (kernel auto on TPU)",
               u4k.size, iters, t)

    if want("morph-gac"):
        from chan_vese_tpu.models.morph_gac import segment_gac_iterations

        g = jnp.asarray(rng.uniform(0.05, 1.0, (2160, 3840)), jnp.float32)

        @jax.jit
        def run_mg(gg, r):
            res = segment_gac_iterations(gg + 1e-6 * r, p, iters=iters,
                                         smoothing=1, balloon=1,
                                         threshold=0.3)
            return res.ls[0, 0]

        t = _t(run_mg, g)
        report("morph-gac", "4K gray lean driver (kernel auto on TPU)",
               g.size, iters, t)

    if want("pyramid"):
        # time-to-converged-mask (wall clock incl. per-level dispatches;
        # the basin-rescue scenario of docs/BENCHMARKS.md's pyramid
        # section). Not a throughput row: milliseconds, lower is better.
        from chan_vese_tpu.models.pyramid import segment_pyramid

        yy, xx = np.mgrid[:2160, :3840]
        disk = ((yy - 1080.0) ** 2 + (xx - 1920.0) ** 2
                < 800.0 ** 2)
        img = jnp.asarray(np.where(disk, 200.0, 0.0)
                          + rng.normal(0, 5, (2160, 3840)), jnp.float32)
        pp = CVParams(init="circle", tol=1e-4, patience=4, min_iter=4)
        segment_pyramid(img, pp).mask.block_until_ready()  # warm
        t0 = time.perf_counter()
        res = segment_pyramid(img, pp)
        res.mask.block_until_ready()
        t = time.perf_counter() - t0
        rec = {"family": "pyramid",
               "label": "4K circle-init time-to-converged-mask",
               "ms": round(t * 1e3, 1),
               "level_iters": list(res.level_iters)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if only:
        # filtered runs MERGE into the existing record instead of
        # clobbering the other families' rows
        try:
            with open("BENCH_FAMILIES.json") as fh:
                out = json.load(fh)
        except (OSError, ValueError):
            out = {"families": []}
        keep = [r for r in out.get("families", [])
                if r["family"] not in {x["family"] for x in results}]
        out["families"] = keep + results
        out["backend"] = jax.default_backend()
        out["date"] = time.strftime("%Y-%m-%d %H:%M")
    else:
        out = {"backend": jax.default_backend(),
               "date": time.strftime("%Y-%m-%d %H:%M"),
               "families": results}
    with open("BENCH_FAMILIES.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"# wrote BENCH_FAMILIES.json ({len(results)} families)")


if __name__ == "__main__":
    main()
