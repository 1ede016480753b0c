"""Observability: result CSVs, trajectory dumps, solver logs.

File-format-compatible equivalents of the reference's printf-style
observability (SURVEY.md section 5):

* ``append_allres`` / ``read_allres``: the plain-ADMM oracle record
  ``idx,-obj,iters,time`` per instance (allres.csv writer,
  LPboxADMMsolver.cpp:1081; reader get_lpbox_info, trainer.py:189-201)
* ``write_xiter_csv`` / ``read_xiter_csv``: per-iteration trajectory
  dumps ``Iter{i},v0,...,vn-1`` (xiter writer, LPboxADMMsolver.cpp:
  903-909; reader readFile, trainer.py:32-48)
* ``SolverLog``: per-instance iteration log (does_log path,
  LPboxADMMsolver.cpp:1013-1067)

The native C++ writer (runtime/io) is used for the hot trajectory dumps
when built; pure-Python fallback otherwise.
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import numpy as np


def append_allres(path: str, idx: int, obj: float, iters: int,
                  seconds: float):
    """One oracle record: ``idx,-obj,iters,time`` (reference negates the
    minimization objective back to auction revenue at :1081)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(f"{idx},{-obj:f},{iters},{seconds:f}\n")


def read_allres(path: str) -> List[List[float]]:
    """[[instance, obj, iters, time], ...] (get_lpbox_info)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append([float(v) for v in line.split(",")])
    return out


def write_xiter_csv(path: str, traj: np.ndarray, start_iter: int = 0):
    """Trajectory dump: one line ``Iter{i},v...`` per iteration.

    ``traj`` is (n, T) (variables x iterations), matching the
    reference's per-instance xiter CSVs.  Uses the native writer when
    available.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    traj = np.asarray(traj)
    try:
        from ..runtime import io as native_io
        native_io.write_xiter(path, traj, start_iter)
        return
    except Exception:
        pass
    with open(path, "w") as f:
        for t in range(traj.shape[1]):
            vals = ",".join(f"{v:f}" for v in traj[:, t])
            f.write(f"Iter{start_iter + t + 1},{vals}\n")


def read_xiter_csv(path: str) -> np.ndarray:
    """Read a trajectory CSV back as (n, T) (readFile,
    trainer.py:32-48 -- note the reference transposes to (vars, iters))."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 2:
                continue
            rows.append([float(v) for v in parts[1:]])
    return np.asarray(rows).T


class SolverLog:
    """Per-instance iteration log in the spirit of the reference's
    ``does_log`` output (norms of the splitting variables per
    iteration, LPboxADMMsolver.cpp:1027-1066)."""

    def __init__(self, path: Optional[str]):
        self.path = path
        self._start = time.time()
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "w")
        else:
            self._f = None

    def iteration(self, it: int, **norms: float):
        if not self._f:
            return
        self._f.write(f"Iteration: {it}\n")
        for k, v in norms.items():
            self._f.write(f"norm of {k}: {v:.9f}\n")
        self._f.write(f"Time elapsed: {time.time() - self._start:f}s\n")
        self._f.write("-" * 49 + "\n")

    def message(self, msg: str):
        if self._f:
            self._f.write(msg + "\n")

    def close(self):
        if self._f:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
