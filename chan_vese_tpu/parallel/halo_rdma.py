"""Pallas remote-DMA halo exchange (SURVEY.md §2.9 comm-backend row:
"Optional fast path: Pallas make_async_remote_copy").

Drop-in equivalent of parallel/halo.py::exchange_halo2d built on direct
inter-chip RDMA instead of `lax.ppermute`: each device ships its boundary
strips straight into its neighbors' halo buffers with
`pltpu.make_async_remote_copy`, skipping the XLA collective scheduler.
Same two-stage structure (rows, then columns of the row-extended array so
corners ride along) and the same Neumann edge-replica fix-up.

Topology note: the transfers form a RING (wraparound neighbors included)
rather than an open chain. This is deliberate twice over: on TPU the ICI
torus makes the wrap link free, and in Pallas TPU interpret mode a
remote copy is emulated with an all-device collective, so every device
must issue the same copies - a `pl.when`-gated edge device would
deadlock the emulation (verified on the 8-device fake CPU mesh). The
wrapped strips land in halos that global-boundary devices immediately
overwrite with edge replicas, exactly as exchange_halo2d overwrites the
zeros ppermute delivers there.

Validation status (honest accounting, tests/test_halo_rdma.py):
- The remote-DMA ring kernel itself is equivalence-tested against
  lax.ppermute on a SINGLE-axis 8-device fake CPU mesh in interpret
  mode - JAX's interpret-mode discharge of `dma_start_p` supports only
  one named mesh axis (NotImplementedError otherwise), so that is the
  deepest interpret-mode validation possible today.
- Under a MULTI-axis interpret environment, `_ring_shift` transparently
  substitutes a semantically identical ppermute ring so the full 2D
  exchange and the `segment_sharded(halo="rdma")` routing stay
  end-to-end testable on the fake mesh.
- On hardware the kernel is used unconditionally; single-chip boxes
  cannot exercise real multi-device RDMA, so on-chip multi-device
  validation is pending pod access (CLAUDE.md). The ppermute path
  remains the default (`segment_sharded(halo="ppermute")`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# distinct collective ids for the row/column exchange kernels (barrier
# semaphores are keyed by collective_id; reusing one across different
# kernels in flight is unsafe)
_CID_ROWS = 7
_CID_COLS = 8


def _ring_kernel(idx_ref, lo_ref, hi_ref, from_lo_ref, from_hi_ref, sems,
                 *, use_barrier):
    """Bidirectional ring shift: hi strip -> next device's from_lo,
    lo strip -> previous device's from_hi. idx_ref (SMEM (2,)):
    [my linear device id of the previous neighbor, of the next].

    ``use_barrier``: on hardware, neighbors must rendezvous BEFORE the
    remote writes start - devices enter the kernel at skewed times and
    an early sender would land data in a neighbor still executing the
    previous program whose buffers alias these outputs. Signal both
    neighbors on the collective_id-keyed barrier semaphore and wait for
    both of their signals (the JAX distributed-Pallas discipline). The
    interpret-mode emulation is lock-step (remote copies lower to a
    collective all devices join), so the test path skips it."""
    prev_id = idx_ref[0]
    next_id = idx_ref[1]
    if use_barrier:
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=prev_id,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier, inc=1, device_id=next_id,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)
    send_next = pltpu.make_async_remote_copy(
        src_ref=hi_ref, dst_ref=from_lo_ref,
        send_sem=sems.at[0], recv_sem=sems.at[1],
        device_id=next_id, device_id_type=pltpu.DeviceIdType.LOGICAL)
    send_prev = pltpu.make_async_remote_copy(
        src_ref=lo_ref, dst_ref=from_hi_ref,
        send_sem=sems.at[2], recv_sem=sems.at[3],
        device_id=prev_id, device_id_type=pltpu.DeviceIdType.LOGICAL)
    send_next.start()
    send_prev.start()
    send_next.wait()
    send_prev.wait()


@functools.partial(jax.jit, static_argnames=("collective_id", "interpret"))
def _ring_exchange(lo, hi, prev_id, next_id, collective_id: int,
                   interpret: bool = False):
    """Run the ring kernel; returns (from_lo, from_hi) strips."""
    idx = jnp.stack([prev_id, next_id]).astype(jnp.int32)
    kernel = functools.partial(_ring_kernel, use_barrier=not interpret)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(hi.shape, hi.dtype),
                   jax.ShapeDtypeStruct(lo.shape, lo.dtype)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id),
        interpret=interpret,
    )(idx, lo, hi)


def _single_axis_env() -> bool:
    """True when exactly one named mesh axis is in scope (the only case
    interpret-mode remote DMA supports).

    Reaches into jax._src.core (no public axis-env query exists as of
    JAX 0.9); if a JAX upgrade moves it, fall back conservatively to
    False so the interpret path routes to the always-correct ppermute
    stand-in instead of a kernel interpret mode cannot discharge."""
    try:
        from jax._src import core as jax_core

        env = jax_core.get_axis_env()
        return len([n for n in env.axis_sizes if n is not None]) == 1
    except Exception:
        return False


def _ring_shift(lo, hi, axis, prev_id, next_id, collective_id: int,
                interpret: bool):
    """(from_lo, from_hi) ring shift along ``axis``.

    Real remote-DMA kernel everywhere except a multi-axis interpret
    environment, where JAX cannot discharge remote DMAs and an
    identical-semantics ppermute ring stands in (see module docstring).
    """
    if interpret and not _single_axis_env():
        n = lax.axis_size(axis)
        ring_fwd = [(i, (i + 1) % n) for i in range(n)]
        ring_bwd = [(i, (i - 1) % n) for i in range(n)]
        return (lax.ppermute(hi, axis, ring_fwd),
                lax.ppermute(lo, axis, ring_bwd))
    return _ring_exchange(lo, hi, prev_id, next_id, collective_id,
                          interpret)


def exchange_halo2d_rdma(x, depth: int = 4, axes=("x", "y"),
                         interpret: bool = False):
    """Pad a local (h, w) block to (h + 2*depth, w + 2*depth) with halos
    via remote DMA. Semantics identical to halo.exchange_halo2d; must be
    called inside shard_map over a row-major 2D mesh with ``axes``."""
    ax_r, ax_c = axes
    nx = lax.axis_size(ax_r)
    ny = lax.axis_size(ax_c)
    ix = lax.axis_index(ax_r)
    iy = lax.axis_index(ax_c)

    # row-major linearization of mesh coordinates -> logical device id
    def lin(cx, cy):
        return cx * ny + cy

    # --- rows: halo above me = my NORTH neighbor's bottom strip --------
    from_north, from_south = _ring_shift(
        x[:depth, :], x[-depth:, :], ax_r,
        prev_id=lin((ix - 1 + nx) % nx, iy),
        next_id=lin((ix + 1) % nx, iy),
        collective_id=_CID_ROWS, interpret=interpret)
    top_rep = jnp.broadcast_to(x[:1, :], (depth, x.shape[1]))
    bot_rep = jnp.broadcast_to(x[-1:, :], (depth, x.shape[1]))
    top = jnp.where(ix == 0, top_rep, from_north)
    bot = jnp.where(ix == nx - 1, bot_rep, from_south)
    xr = jnp.concatenate([top, x, bot], axis=0)

    # --- cols of the row-extended array (corners ride along) -----------
    from_west, from_east = _ring_shift(
        xr[:, :depth], xr[:, -depth:], ax_c,
        prev_id=lin(ix, (iy - 1 + ny) % ny),
        next_id=lin(ix, (iy + 1) % ny),
        collective_id=_CID_COLS, interpret=interpret)
    left_rep = jnp.broadcast_to(xr[:, :1], (xr.shape[0], depth))
    right_rep = jnp.broadcast_to(xr[:, -1:], (xr.shape[0], depth))
    left = jnp.where(iy == 0, left_rep, from_west)
    right = jnp.where(iy == ny - 1, right_rep, from_east)
    return jnp.concatenate([left, xr, right], axis=1)
