"""Iteration checkpoint/resume (SURVEY.md §5).

The reference (seconds-long CLI runs) has none; for long sharded 4K runs
the framework checkpoints (phi, iteration, c1, c2) every K iterations as a
plain .npz - enough to restart a multi-slice run from the last checkpoint
(documented failure-recovery story, SURVEY.md §5 'failure detection').

Arrays are pulled to host once per checkpoint (sharded phi gathers
transparently via np.asarray); for pod-scale runs swap in
orbax/array_serialization - the call sites only touch save/load/latest.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


import re

_CKPT_RE = re.compile(r"^ckpt_(\d{8})\.npz$")


def save(path_dir, step: int, phi, c1=None, c2=None, **extra) -> Path:
    d = Path(path_dir)
    d.mkdir(parents=True, exist_ok=True)
    p = d / f"ckpt_{step:08d}.npz"
    # dot-prefixed temp name: cannot match the ckpt_*.npz pattern, so a
    # torn write is never picked up by latest()
    tmp = d / f".tmp_ckpt_{step:08d}.npz"
    np.savez(tmp, step=step, phi=np.asarray(phi),
             c1=np.asarray(c1 if c1 is not None else np.nan),
             c2=np.asarray(c2 if c2 is not None else np.nan),
             **{k: np.asarray(v) for k, v in extra.items()})
    tmp.rename(p)  # atomic-ish: never leave a torn ckpt under the real name
    return p


def latest(path_dir) -> Optional[Path]:
    d = Path(path_dir)
    if not d.is_dir():
        return None
    cands = sorted(f for f in d.iterdir() if _CKPT_RE.match(f.name))
    return cands[-1] if cands else None


def load(path):
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def segment_with_checkpoints(u0, p, iters: int, ckpt_dir, every: int = 50,
                             phi0=None, resume: bool = True,
                             lambda1=None, lambda2=None):
    """Fixed-iteration segmentation checkpointing every ``every`` iters.

    Resumes from the newest checkpoint in ckpt_dir when ``resume``.
    Chunked driver: runs `every`-iteration device-side scans between
    host-side checkpoint writes. Vector-valued (H, W, C) images route
    through the vector trace driver (per-channel lambda tuples apply).
    """
    import jax.numpy as jnp

    from ..models.scalar import segment_fixed
    from ..utils.init_phi import init_phi

    if every <= 0 or iters < 0:
        raise ValueError(f"need every > 0 and iters >= 0 "
                         f"(got every={every}, iters={iters})")
    start = 0
    phi = phi0
    if resume:
        ck = latest(ckpt_dir)
        if ck is not None:
            state = load(ck)
            start = int(state["step"])
            phi = jnp.asarray(state["phi"], u0.dtype)
    if phi is None:
        phi = init_phi(u0.shape[:2], p.init, u0.dtype)

    n = start
    while n < iters:
        chunk = min(every, iters - n)
        # start_iter keeps the global iteration counter (and hence the
        # reinit cadence) identical to an unchunked run
        if u0.ndim == 3:
            from ..models.vector import segment_vector_fixed
            tr = segment_vector_fixed(u0, p, iters=chunk, phi0=phi,
                                      lambda1=lambda1, lambda2=lambda2,
                                      start_iter=n)
        else:
            tr = segment_fixed(u0, p, iters=chunk, phi0=phi, start_iter=n)
        phi = tr.phi
        n += chunk
        save(ckpt_dir, n, phi, tr.c1[-1], tr.c2[-1])
    return phi


def segment_multiphase_with_checkpoints(u0, p, iters: int, ckpt_dir,
                                        every: int = 50, m_sets: int = 2,
                                        phis0=None, resume: bool = True):
    """Multiphase counterpart: checkpoints the (M, H, W) level-set stack
    every ``every`` iterations; resumes from the newest checkpoint.

    With a reinit cadence, ``every`` must be a multiple of
    p.reinit_every: segment_multiphase's iteration counter restarts per
    chunk, so only aligned chunk boundaries keep the redistancing
    cadence identical to an unchunked run.
    """
    import jax.numpy as jnp

    from ..models.multiphase import init_multiphase, segment_multiphase

    if every <= 0 or iters < 0:
        raise ValueError(f"need every > 0 and iters >= 0 "
                         f"(got every={every}, iters={iters})")
    if p.reinit_every and every % p.reinit_every:
        raise ValueError(
            f"every={every} must be a multiple of reinit_every="
            f"{p.reinit_every} to keep the redistancing cadence identical "
            f"to an unchunked run")
    start = 0
    phis = phis0
    if resume:
        ck = latest(ckpt_dir)
        if ck is not None:
            state = load(ck)
            start = int(state["step"])
            phis = jnp.asarray(state["phi"], u0.dtype)
    if phis is None:
        phis = init_multiphase(u0.shape[:2], m_sets, dtype=u0.dtype)

    n = start
    res = None
    while n < iters:
        chunk = min(every, iters - n)
        res = segment_multiphase(u0, p, m_sets=m_sets, phis0=phis,
                                 fixed=True, max_iter=chunk)
        phis = res.phis
        n += chunk
        save(ckpt_dir, n, phis)
    if res is None:
        res = segment_multiphase(u0, p, m_sets=m_sets, phis0=phis,
                                 fixed=True, max_iter=0)
    return res
