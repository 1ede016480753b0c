"""Ablation-timing utilities (the framework's profiling story).

``jax.profiler`` trace capture is BANNED on the axon TPU backend (it
wedged the device for >1h; see CLAUDE.md).  Profiling here is
*ablation timing*: wall-clock phase timers with real host
synchronisation, plus input perturbation to defeat the remote
executor's request dedup cache.

    with PhaseTimer() as t:
        with t.phase("solve"):
            state = solve(prob)
            t.sync(state)
        with t.phase("score"):
            s = score(rows)
            t.sync(s)
    print(t.report())

The reference's analogue is std::chrono around solves
(LPboxADMMsolver.cpp:768-769) and time.time() in trainers
(trainer.py:387-415).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np


class PhaseTimer:
    """Accumulating wall-clock phase timer with forced host sync."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            self.totals[name] = self.totals.get(name, 0.0) \
                + time.perf_counter() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    @staticmethod
    def sync(tree):
        """Force completion INCLUDING a host fetch of one leaf: on the
        axon remote backend ``block_until_ready`` alone has been
        observed to return before the work is actually done."""
        import jax

        leaves = jax.tree_util.tree_leaves(tree)
        jax.block_until_ready(tree)
        if leaves:
            np.asarray(leaves[0]).ravel()[:1]

    def report(self) -> str:
        total = sum(self.totals.values())
        lines = []
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            pct = 100.0 * t / total if total else 0.0
            lines.append(f"{name:>20s}: {t:8.3f}s ({pct:5.1f}%) "
                         f"x{self.counts[name]}")
        lines.append(f"{'TOTAL':>20s}: {total:8.3f}s")
        return "\n".join(lines)


def perturb(rng: np.random.RandomState, arr, scale: float = 1e-5):
    """Multiplicative random perturbation that moves every element (the
    dedup-cache defeat; scalar factors near 1 can round away in f32)."""
    import jax.numpy as jnp

    f = 1.0 + scale * rng.rand(*np.shape(arr)).astype(np.float32)
    return arr * jnp.asarray(f)


def enable_compile_cache(root=None):
    """Persistent XLA compilation cache (CLAUDE.md: the axon remote
    compile service can take minutes per executable; the cache
    serializes compiled executables across processes).  Call at the
    top of every TPU driver/script."""
    import os

    import jax
    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(root, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
