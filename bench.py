#!/usr/bin/env python
"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric (BASELINE.json:2): Mpixel-iterations/sec at 4K (3840x2160) on one
TPU chip, fused-Pallas solver, vs the measured single-core C baseline of
the same scheme (native/cv_baseline.c) on this machine's CPU.
vs_baseline > 10 meets the BASELINE.json:5 target.
"""

import json
import sys
import time


def _tpu_mpixel_iters(iters=800, reps=3):
    # iters amortizes the fixed per-dispatch cost of the tunneled dev
    # chip, measured at 28.0 ms by the iteration sweep fit
    # (scripts/bench_iters.py, artifacts/bench_iters_2026-08-19.out:
    # t(I) = 0.293 ms * I + 28 ms, asymptote 28.3 G). At 800 iters the
    # fixed share is ~10%; the metric (BASELINE.json:2) is steady-state
    # throughput, with no pinned iteration count.
    # Solver: the banded multi-iteration kernel (ops/pallas_banded.py,
    # k = 8 iterations per HBM pass; frozen-means-per-chunk trajectory
    # class, same fixed point - see models/banded.py docstring).
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chan_vese_tpu.params import CVParams
    from chan_vese_tpu.models.banded import segment_banded_fixed

    H, W = 2160, 3840
    rng = np.random.default_rng(0)
    host = (rng.uniform(0, 255, (H, W))).astype(np.float32)
    u0 = jnp.asarray(host)
    p = CVParams()

    # The timed region is ONE jitted dispatch: the program perturbs the
    # input by the rep index (defeats any result caching), runs the
    # full solve, and returns a single element of phi. The 4-byte
    # readback still forces the whole while-loop (phi[0,0] depends on
    # every chunk), but the timing no longer pays three tunnel
    # round-trips of pure latency (add + solve + getitem ~75 ms,
    # priced by the round-4 profile; on a normal host this is a no-op).
    import functools

    @functools.partial(jax.jit, static_argnames=("it",))
    def run(u, r, it):
        phi, _ = segment_banded_fixed(u + r, p, iters=it, k=8)
        return phi[0, 0]

    _ = float(run(u0, jnp.float32(0), iters))  # compile + warm

    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        _ = float(run(u0, jnp.float32(r + 1), iters))
        best = min(best, time.perf_counter() - t0)
    return H * W * iters / best / 1e6


def _cpu_fallback_mpixel_iters():
    """CPU-only fallback so the harness always emits a line."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from chan_vese_tpu.params import CVParams
    from chan_vese_tpu import segment_fixed

    H, W = 512, 512
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    p = CVParams()
    tr = segment_fixed(u0, p, iters=5)
    jax.block_until_ready(tr.phi)
    t0 = time.perf_counter()
    tr = segment_fixed(u0, p, iters=20)
    jax.block_until_ready(tr.phi)
    dt = time.perf_counter() - t0
    return H * W * 20 / dt / 1e6


def main():
    # Probe the backend FIRST, in a SUBPROCESS with a timeout: when the
    # axon relay is down, jax device init through the dead tunnel HANGS
    # rather than raising (observed 2026-08-17) - and even the C
    # baseline's fixture builder touches jnp, so the CPU override must
    # be decided before anything initializes a backend in this process.
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=240)
        on_tpu = r.returncode == 0 and r.stdout.strip() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    try:
        from native import baseline
        c_mpix = baseline.bench_mpixel_iters_per_sec(h=512, w=512, iters=8,
                                                     repeats=2)
    except Exception as e:  # noqa: BLE001
        print(f"# C baseline failed ({e}); using survey estimate",
              file=sys.stderr)
        c_mpix = 27.5  # measured on this machine 2026-08-16

    if on_tpu:
        value = _tpu_mpixel_iters()
        # derive the kernel description from the auto defaults so the
        # label can never go stale against models/banded.auto_config
        from chan_vese_tpu.models.banded import auto_config
        k, unroll, packed, fuse = auto_config(2160, 3840, k=8)
        desc = ("packed parity-plane" if packed else "flat") + \
            f" banded k={k}/u={unroll}" + (" fused-j" if fuse else "")
        metric = (f"Mpixel-iters/s, 4K scalar Chan-Vese, {desc} Pallas, "
                  f"1 TPU chip")
    else:
        value = _cpu_fallback_mpixel_iters()
        metric = "Mpixel-iters/s, 512^2 scalar Chan-Vese, jnp path, CPU (no TPU found)"

    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": "Mpixel-iters/s",
        "vs_baseline": round(value / c_mpix, 2),
    }))


if __name__ == "__main__":
    main()
