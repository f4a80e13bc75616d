"""A/B the fused-j sharded chunk kernel at 4K on the real chip (1x1).

The round-4 sharded profile (artifacts/profile_sharded_2026-08-18.out)
showed the comm_k machinery is ~free on-device and the whole 1x1
sharded tax is the kernel body (banded_chunk_sharded 4.33 ms/chunk =
15.3 G in-kernel vs flat single-chip 3.47 ms = 19.1 G). fused-j
measured +4-12% on the flat single-chip body in that regime, so the
sharded chunk now auto-fuses at >= 4K canvases
(parallel/sharded._sharded_chunk_pallas, _FUSE_AREA). This prices the
flip in ONE session, scalar + RGB.

Run (relay up): timeout 3600 python scripts/ab_sharded_fusej.py

Decision rule: fusej ahead -> keep the auto default; behind or
compile-OOM -> revert _FUSE_AREA to float('inf') for that family and
document the measured dead end.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.parallel import sharded as sh
from chan_vese_tpu.parallel.mesh import make_grid_mesh
from chan_vese_tpu.parallel.sharded import segment_sharded, _make_phi0

assert jax.default_backend() == "tpu", \
    f"needs the TPU backend, got {jax.default_backend()!r}"

H, W, ITERS = 2160, 3840, 96
DEFAULT_FUSE_AREA = sh._FUSE_AREA


def make_run(vec):
    mesh = make_grid_mesh(1, 1)
    rng = np.random.default_rng(0)
    shape = (H, W, 3) if vec else (H, W)
    u0 = jax.device_put(
        jnp.asarray(rng.uniform(0, 255, shape), jnp.float32),
        NamedSharding(mesh, P("x", "y", None) if vec else P("x", "y")))
    p = CVParams()
    phi0 = _make_phi0((H, W), p.init, jnp.float32, mesh)
    run = jax.jit(lambda u, phi0, r: segment_sharded(
        u + r, p, mesh, phi0=phi0, max_iter=ITERS, fixed=True,
        comm_k=8, use_pallas=True).phi[0, 0])  # fail loudly off-envelope
    return mesh, run, u0, phi0


for vec in (False, True):
    name = "4K RGB" if vec else "4K gray"
    legs = []
    for tag, area in [("unfused", float("inf")),
                      ("fusej  ", DEFAULT_FUSE_AREA)]:
        sh._FUSE_AREA = area
        sh._build_program.cache_clear()
        mesh, run, u0, phi0 = make_run(vec)
        try:
            with jax.set_mesh(mesh):
                t0 = time.perf_counter()
                _ = float(run(u0, phi0, jnp.float32(0)))
                print(f"warm {name} {tag}: compile+run "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
            legs.append((tag, mesh, run, u0, phi0))
        except Exception as e:  # noqa: BLE001 - report and keep measuring
            print(f"warm {name} {tag} FAILED: {type(e).__name__}: {e}",
                  flush=True)
    for r in range(1, 4):
        for tag, mesh, run, u0, phi0 in legs:
            with jax.set_mesh(mesh):
                t0 = time.perf_counter()
                _ = float(run(u0, phi0, jnp.float32(r)))
                dt = time.perf_counter() - t0
            print(f"{name} {tag} rep{r}: {H * W * ITERS / dt / 1e6:9.1f} "
                  f"Mpix-it/s", flush=True)
sh._FUSE_AREA = DEFAULT_FUSE_AREA
