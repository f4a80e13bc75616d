#!/usr/bin/env python
"""On-chip time-to-convergence for the pyramid variants that round 4
left CPU-only (VERDICT r4 weak #4) plus the new morph pyramid:

    sharded     segment_pyramid_sharded on a 1x1 mesh, comm_k=8, 4K
                (vs direct segment_sharded same mesh)
    multiphase  segment_pyramid_multiphase at 1024^2, M=2
                (vs direct segment_multiphase)
    morph       segment_pyramid_morph at 4K (vs direct segment_morph,
                both kernel-routed on TPU)
    gac         segment_pyramid_gac at 4K (vs direct segment_gac)

Each leg: warm-up solve (compile + remote cache), then timed reps with
a fresh noise perturbation (no cached trajectories) and IoU/label
checks against ground truth so a "fast" wrong answer cannot pass.

Run: python scripts/bench_pyramid_variants.py [leg-substring ...]
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

from chan_vese_tpu.params import CVParams
from fixtures import iou, two_disks


def timed(fn, reps=2, quality=None):
    """Time fn(r) whose return must force the solve via a SCALAR only
    (a full-mask readback through the ~tunnel costs hundreds of ms at
    4K and would swamp both legs); ``quality`` (optional) is called
    once AFTER timing for the IoU/labels check."""
    out = fn(0.0)  # warm
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(float(r + 1))
        best = min(best, time.perf_counter() - t0)
    return best, (quality(out) if quality else out)


def main():
    only = [s.lower() for s in sys.argv[1:]]

    def want(name):
        return not only or any(s in name for s in only)

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    if want("sharded"):
        from chan_vese_tpu.models.pyramid import segment_pyramid_sharded
        from chan_vese_tpu.parallel.mesh import make_grid_mesh
        from chan_vese_tpu.parallel.sharded import segment_sharded

        H, W = 2160, 3840
        img, gt = two_disks(H, W, noise=8.0, dtype=np.float32)
        u = jnp.asarray(img)
        mesh = make_grid_mesh(1, 1)
        p = CVParams(init="circle")
        pd = CVParams(init="circle", max_iter=20000)

        def pyr(r):
            res = segment_pyramid_sharded(
                u + jnp.float32(r), p, mesh=mesh, comm_k=8)
            float(res.delta)  # force via scalar
            return res

        def direct(r):
            res = segment_sharded(u + jnp.float32(r), pd, mesh,
                                  comm_k=8)
            float(res.delta)
            return res

        t_p, (li, iou_p) = timed(pyr, quality=lambda r: (
            r.level_iters, iou(np.asarray(r.mask), gt)))
        t_d, (it_d, iou_d) = timed(direct, quality=lambda r: (
            int(r.iters), iou(np.asarray(r.mask), gt)))
        print(f"sharded 1x1 comm_k=8 4K: pyramid {t_p*1e3:8.1f} ms "
              f"(levels {li}, IoU {iou_p:.3f}) vs direct "
              f"{t_d*1e3:8.1f} ms ({it_d} it, IoU {iou_d:.3f}) "
              f"=> {t_d/t_p:.1f}x", flush=True)

    if want("multiphase"):
        from chan_vese_tpu.models.multiphase import (init_multiphase,
                                                     segment_multiphase)
        from chan_vese_tpu.models.pyramid import \
            segment_pyramid_multiphase

        H = W = 1024
        yy, xx = np.mgrid[:H, :W]
        img = np.full((H, W), 30.0)
        img[(yy - 300) ** 2 + (xx - 300) ** 2 < 180 ** 2] = 110.0
        img[(yy - 700) ** 2 + (xx - 700) ** 2 < 180 ** 2] = 220.0
        img += rng.normal(0, 4, img.shape)
        u = jnp.asarray(img, jnp.float32)
        p = CVParams(mu=0.01 * 195 ** 2)
        pd = p.replace(max_iter=20000)
        # localized circles init: iterations scale with contour travel,
        # the regime the pyramid exists for (test_pyramid.py rationale)
        phis0 = init_multiphase((H, W), 2, kind="circles",
                                dtype=jnp.float32)

        def pyr(r):
            res = segment_pyramid_multiphase(u + jnp.float32(r), p,
                                             m_sets=2, phis0=phis0)
            float(res.delta)
            return res

        def direct(r):
            res = segment_multiphase(u + jnp.float32(r), pd, m_sets=2,
                                     phis0=phis0)
            float(res.delta)
            return res

        t_p, (li, lab_p) = timed(pyr, quality=lambda r: (
            r.level_iters, np.asarray(r.labels)))
        t_d, (it_d, lab_d) = timed(direct, quality=lambda r: (
            int(r.iters), np.asarray(r.labels)))
        agree = float(np.mean(lab_p == lab_d))
        print(f"multiphase M=2 1024^2: pyramid {t_p*1e3:8.1f} ms "
              f"(levels {li}) vs direct {t_d*1e3:8.1f} ms ({it_d} it), "
              f"label agreement {agree:.3f} => {t_d/t_p:.1f}x",
              flush=True)

    if want("morph"):
        from chan_vese_tpu.models.morph import segment_morph
        from chan_vese_tpu.models.pyramid import segment_pyramid_morph

        # Single CENTERED disk: the morphological force only moves the
        # contour where |grad ls| > 0, so a circle init centered on the
        # target converges to IoU 1.0 while the contour-travel distance
        # (the quantity the pyramid collapses) stays resolution-scaled.
        # The two_disks fixture stalls the morph flow at IoU 0.64 in
        # BOTH legs (first on-chip record) - equal quality, no signal.
        H, W = 2160, 3840
        yy, xx = np.mgrid[:H, :W].astype(np.float32)
        gt = np.hypot(yy - H / 2, xx - W / 2) < 800
        img = np.where(gt, 217.0, 38.0) + 8 * rng.standard_normal(
            (H, W)).astype(np.float32)
        u = jnp.asarray(img)
        p = CVParams(init="circle", tol=1e-5, patience=4, min_iter=4)
        pd = p.replace(max_iter=20000)

        def pyr(r):
            res = segment_pyramid_morph(u + jnp.float32(r), p)
            float(res.delta)
            return res

        def direct(r):
            res = segment_morph(u + jnp.float32(r), pd)
            float(res.delta)
            return res

        t_p, (li, iou_p) = timed(pyr, quality=lambda r: (
            r.level_iters, iou(np.asarray(r.mask), gt)))
        t_d, (it_d, iou_d) = timed(direct, quality=lambda r: (
            int(r.iters), iou(np.asarray(r.mask), gt)))
        print(f"morph ACWE 4K: pyramid {t_p*1e3:8.1f} ms (levels {li}, "
              f"IoU {iou_p:.3f}) vs direct {t_d*1e3:8.1f} ms ({it_d} it, "
              f"IoU {iou_d:.3f}) => {t_d/t_p:.1f}x", flush=True)

    if want("gac"):
        from chan_vese_tpu.models.morph_gac import segment_gac
        from chan_vese_tpu.models.pyramid import segment_pyramid_gac
        from chan_vese_tpu.ops.morph import inverse_gaussian_gradient

        # centered disk with the small-disk seed INSIDE it (the on-chip
        # CLI drive configuration that converged IoU 1.0 in 528 it);
        # the two_disks center seed sat in BACKGROUND -> balloon grew
        # the complement (IoU 0, meaningless)
        H, W = 2160, 3840
        yy, xx = np.mgrid[:H, :W].astype(np.float32)
        gt = np.hypot(yy - H / 2, xx - W / 2) < 800
        img = np.where(gt, 217.0, 38.0) + 3 * rng.standard_normal(
            (H, W)).astype(np.float32)
        u = jnp.asarray(img)
        p = CVParams(init="small-disk", tol=1e-5, patience=4, min_iter=4,
                     max_iter=20000)

        def pyr(r):
            res = segment_pyramid_gac(u + jnp.float32(r), p, balloon=1,
                                      threshold=0.3, gac_alpha=5.0,
                                      gac_sigma=2.0)
            float(res.delta)
            return res

        def direct(r):
            g = inverse_gaussian_gradient(u + jnp.float32(r), 5.0, 2.0)
            res = segment_gac(g, p, balloon=1, threshold=0.3)
            float(res.delta)
            return res

        t_p, (li, iou_p) = timed(pyr, quality=lambda r: (
            r.level_iters, iou(np.asarray(r.mask), gt)))
        t_d, (it_d, iou_d) = timed(direct, quality=lambda r: (
            int(r.iters), iou(np.asarray(r.mask), gt)))
        print(f"morph GAC 4K: pyramid {t_p*1e3:8.1f} ms (levels {li}, "
              f"IoU {iou_p:.3f}) vs direct {t_d*1e3:8.1f} ms ({it_d} it, "
              f"IoU {iou_d:.3f}) => {t_d/t_p:.1f}x", flush=True)


if __name__ == "__main__":
    main()
