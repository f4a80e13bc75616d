"""Energy-trace artifacts and parity diffing (SURVEY.md §5 metrics/logging).

The per-iteration energy trace is accumulated ON DEVICE by the scanned
trace-mode drivers (no host sync per iteration) and written as CSV here -
this doubles as the parity artifact of BASELINE.json:5 ("energy-trace
agreement <=1e-5 at fixed iteration count").
"""

from __future__ import annotations

import csv

import numpy as np


def write_energy_csv(path, energy, delta=None, c1=None, c2=None) -> None:
    energy = np.asarray(energy)
    cols = {"iter": np.arange(1, len(energy) + 1), "energy": energy}
    if delta is not None:
        cols["delta"] = np.asarray(delta)
    if c1 is not None:
        c1 = np.asarray(c1)
        if c1.ndim == 1:
            cols["c1"] = c1
        else:
            for ch in range(c1.shape[1]):
                cols[f"c1_{ch}"] = c1[:, ch]
    if c2 is not None:
        c2 = np.asarray(c2)
        if c2.ndim == 1:
            cols["c2"] = c2
        else:
            for ch in range(c2.shape[1]):
                cols[f"c2_{ch}"] = c2[:, ch]
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(cols.keys())
        for row in zip(*cols.values()):
            w.writerow([f"{v:.17g}" if isinstance(v, float) or hasattr(v, "dtype")
                        else v for v in row])


def read_energy_csv(path):
    with open(path) as fh:
        r = csv.DictReader(fh)
        rows = list(r)
    out = {k: np.asarray([float(row[k]) for row in rows])
           for k in rows[0].keys()}
    return out


def trace_parity(path_a, path_b, column: str = "energy",
                 allow_prefix: bool = False):
    """Max relative deviation between two trace CSVs (the parity number).

    The parity criterion is "at fixed iteration count", so traces of
    different lengths are an error unless allow_prefix=True (compare the
    common prefix explicitly).
    """
    a = read_energy_csv(path_a)[column]
    b = read_energy_csv(path_b)[column]
    if len(a) == 0 or len(b) == 0:
        raise ValueError("empty traces")
    if len(a) != len(b) and not allow_prefix:
        raise ValueError(f"trace lengths differ ({len(a)} vs {len(b)}); "
                         f"pass allow_prefix=True to compare the prefix")
    n = min(len(a), len(b))
    rel = np.abs(a[:n] - b[:n]) / np.maximum(np.abs(b[:n]), 1e-30)
    return float(rel.max())
