#!/usr/bin/env python
"""Time-to-convergence A/B: direct tolerance-mode solve vs the
coarse-to-fine pyramid (models/pyramid.py) at 4K.

Unlike the Mpix-it/s benchmarks (fixed iteration counts, single
dispatch), the quantity here is END-TO-END wall clock to a converged
mask from a cold level set: the pyramid's claim is that warm-starting
the full-resolution level saves most of its iterations, which no
per-iteration throughput number captures. Both legs are timed after a
warm-up solve (compile + remote-cache priming; the tunnel's ~25 ms
per-dispatch cost is part of the pyramid's honest price - it runs one
program per level), with a fresh noise perturbation per rep so no leg
re-uses a cached trajectory, and a forced float() readback.

Run: python scripts/bench_pyramid.py [H W] (default 2160 3840)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_root = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(_root, "tests"))
sys.path.insert(0, _root)

from chan_vese_tpu.models.banded import segment_banded
from chan_vese_tpu.models.pyramid import segment_pyramid
from chan_vese_tpu.params import CVParams
from fixtures import iou, two_disks


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 2 else 2160
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 3840
    print(f"backend={jax.default_backend()} size={H}x{W}", flush=True)
    img, gt = two_disks(H, W, noise=8.0, dtype=np.float32)
    # circle init pins the phi -> -phi fixed-point orientation (the
    # checkerboard lands either, resolution-dependently) so IoU-vs-gt
    # is meaningful at every size
    p = CVParams(init="circle")
    # The direct leg needs a cap that lets it actually converge: at 4K
    # the circle-init contour travels O(1000) px at O(1) px/iter, far
    # past the default max_iter=500 (first on-chip record: direct hit
    # the cap at IoU 0.16 while the pyramid converged to IoU 1.0). An
    # uncapped-in-practice direct leg prices the pyramid's win honestly.
    p_direct = CVParams(init="circle", max_iter=20000)

    def direct(u):
        res = segment_banded(u, p_direct)
        return res

    def pyramid(u):
        return segment_pyramid(u, p)

    rng = np.random.default_rng(0)
    for name, fn in [("direct", direct), ("pyramid", pyramid)]:
        # warm-up = compile every per-level program shape
        r = fn(jnp.asarray(img))
        _ = float(r.phi[0, 0])
        best, iters, m = float("inf"), None, None
        for rep in range(3):
            u = jnp.asarray(img + rng.normal(0, 0.25, img.shape)
                            .astype(np.float32))
            u = u.block_until_ready()
            t0 = time.perf_counter()
            res = fn(u)
            _ = float(res.phi[0, 0])
            dt = time.perf_counter() - t0
            if dt < best:
                best, m = dt, res
                iters = (res.level_iters if hasattr(res, "level_iters")
                         else int(res.iters))
        print(f"{name}: {best * 1e3:.1f} ms  iters={iters}  "
              f"IoU={iou(np.asarray(m.mask), gt):.4f}", flush=True)


if __name__ == "__main__":
    main()
