"""Capture + analyze an on-chip profile of the 4K banded chunk
(VERDICT r3 item 4: the roofline attribution - "Mosaic scheduling/VMEM
pressure" for the ~2x-of-pure-ALU residual - rests on ablations; one
captured trace confirms or kills it, and prices the ~15-25 us
per-grid-step overhead that gates packed-at-4K).

Run on the real chip (axon relay up):

    cd /root/repo && timeout 3600 python scripts/profile_banded.py

Captures jax.profiler traces of the flat (k=8, u=4) and packed (k=8,
u=1) banded kernels at 4K into /tmp/cv_profile/{flat,packed}, then
post-processes the Perfetto trace.json.gz DIRECTLY (gzip+json; no
tensorboard dependency) and prints per-track top spans by total
duration. What to look for: the per-grid-step gap between consecutive
kernel-body spans on the device track (scalar prologue? DMA wait?
window setup?) and which lever it selects (fused-j, wider bands
post-T-cap, double-buffered packed DMA). Results go into
docs/BENCHMARKS.md's roofline section with this session's timestamp.

NOTE: the axon platform is a tunneled remote PJRT plugin; if the device
track comes back empty (host-only trace), record that outcome in
BENCHMARKS.md - a documented can't-profile is the honest close of the
thread on this environment.
"""

import gzip
import json
import time
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.models.banded import segment_banded_fixed
from chan_vese_tpu.utils.profiling import trace

H, W, ITERS = 2160, 3840, 24  # short dispatch: keep the trace small
OUT = Path("/tmp/cv_profile")


def capture(tag, **kw):
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    p = CVParams()
    # warm OUTSIDE the trace so compile time doesn't pollute it
    phi, _ = segment_banded_fixed(u0, p, ITERS, **kw)
    _ = float(phi[0, 0])
    d = OUT / tag
    with trace(str(d)):
        for r in range(2):
            t0 = time.perf_counter()
            phi, _ = segment_banded_fixed(u0 + jnp.float32(r + 1), p,
                                          ITERS, **kw)
            _ = float(phi[0, 0])
            dt = time.perf_counter() - t0
            print(f"{tag} rep{r}: {H * W * ITERS / dt / 1e6:9.1f} "
                  f"Mpix-it/s", flush=True)
    return d


def analyze(d: Path, top: int = 25):
    """Aggregate Perfetto complete events (ph='X') by (track, name)."""
    traces = sorted(d.rglob("*.trace.json.gz"))
    if not traces:
        print(f"  !! no trace.json.gz under {d} - host-only or failed "
              f"capture; record this outcome", flush=True)
        return
    f = traces[-1]
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = data["traceEvents"] if isinstance(data, dict) \
        else (data if isinstance(data, list) else [])
    pids = {}  # pid -> process name (device vs host python threads)
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", str(e["pid"]))
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    agg = defaultdict(lambda: [0.0, 0, 0.0])  # (proc, name) -> [tot, n, max]
    for e in events:
        if e.get("ph") != "X":
            continue
        proc = pids.get(e["pid"], str(e["pid"]))
        thr = tids.get((e["pid"], e.get("tid")), "")
        key = (f"{proc}/{thr}", e.get("name", "?"))
        dur = float(e.get("dur", 0.0))  # us
        a = agg[key]
        a[0] += dur
        a[1] += 1
        a[2] = max(a[2], dur)
    print(f"  trace: {f} ({len(events)} events)", flush=True)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"  {'total_ms':>9} {'n':>6} {'max_us':>9}  track :: span")
    for (track, name), (tot, n, mx) in rows:
        print(f"  {tot / 1e3:9.2f} {n:6d} {mx:9.1f}  {track} :: "
              f"{name[:90]}", flush=True)


def main():
    # fail loudly off-TPU: the drivers now silently fall back to jnp on
    # other backends (_backend_ok guard), which would profile the wrong
    # program under a kernel label
    assert jax.default_backend() == "tpu", \
        f"profile_banded needs the TPU backend, got {jax.default_backend()!r}"
    # fuse pinned explicitly: auto now turns it on for u4/k8/4K, and the
    # flat fused-vs-unfused pair directly prices the per-grid-step
    # overhead the roofline section attributes
    runs = [("flat", dict(k=8, unroll=4, packed=False, fuse=False)),
            ("flat_fusej", dict(k=8, unroll=4, packed=False, fuse=True)),
            ("packed", dict(k=8, unroll=1, packed=True, fuse=False))]
    dirs = []
    for tag, kw in runs:
        try:
            dirs.append((tag, capture(tag, **kw)))
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{tag} capture FAILED: {type(e).__name__}: {e}",
                  flush=True)
    for tag, d in dirs:
        print(f"\n=== {tag} ===", flush=True)
        analyze(d)


if __name__ == "__main__":
    main()
