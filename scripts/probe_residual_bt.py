"""Probe: does the fused LP kernel compile + run at the compacted
l2f residual shape (B=128, m=256, n=256, nside) for bt in {8, 16}?

The conservative auto_bt budget (8MB) rejects bt=8 here (naive
footprint 10.6MB), but physical VMEM is 16MB/core. Measure wall-clock
of a 1000-iter window vs the XLA residual at the same shape.
"""
import os, sys, time
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lpbox_admm_tpu.config import LP_CONFIG
from lpbox_admm_tpu.core import lp
from lpbox_admm_tpu.core.problem import LpProblem
from lpbox_admm_tpu.ops import woodbury
from lpbox_admm_tpu.ops.pallas_lp import lp_window_fused, solve_fused_from

B, m, n = 128, 256, 256
rng = np.random.RandomState(0)
# synthetic compacted-like problem: sparse 0/1 E rows, negative b
E = (rng.rand(B, m, n) < 0.02).astype(np.float32)
b = -rng.rand(B, n).astype(np.float32)
f = np.maximum(E.sum(-1) * 0.3, 1.0).astype(np.float32)
var_mask = np.ones((B, n), bool)
row_mask = np.ones((B, m), bool)
prob = LpProblem(E=jnp.asarray(E), b=jnp.asarray(b), f=jnp.asarray(f),
                 var_mask=jnp.asarray(var_mask),
                 row_mask=jnp.asarray(row_mask))
cfg = LP_CONFIG.replace(linsolve="woodbury")
state = lp.init_state(prob, cfg)
state = state._replace(it=state.it + 5000)   # mid-schedule rho

nf = woodbury.factorize_nside(prob.E, state.free, lp._wb_ratio(cfg))
nfactor = (nf.hinv, nf.ete)

print("devices:", jax.devices(), flush=True)

import functools
for bt in (8, 16, 32):
    try:
        t0 = time.time()
        st = lp_window_fused(state, prob, cfg, window=1000, bt=bt,
                             interpret=False, nfactor=nfactor)
        np.asarray(st.x)
        c = time.time() - t0
        t0 = time.time()
        st = lp_window_fused(state._replace(
            x=state.x + 1e-6 * jnp.asarray(rng.rand(B, n).astype(np.float32))),
            prob, cfg, window=1000, bt=bt, interpret=False, nfactor=nfactor)
        np.asarray(st.x)
        w = time.time() - t0
        print(f"bt={bt}: OK compile+1st={c:.1f}s warm={w:.3f}s "
              f"done={int(np.asarray(st.done).sum())}/{B}", flush=True)
    except Exception as e:
        print(f"bt={bt}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

# XLA residual comparison at the same shape
from lpbox_admm_tpu.train.l2f import _residual_phase_xla
t0 = time.time()
st = _residual_phase_xla(state, prob, cfg, 100, 20000)
np.asarray(st.x)
c = time.time() - t0
t0 = time.time()
st = _residual_phase_xla(state._replace(
    x=state.x + 1e-6 * jnp.asarray(rng.rand(B, n).astype(np.float32))),
    prob, cfg, 100, 20000)
np.asarray(st.x)
print(f"xla residual: compile+1st={c:.1f}s warm={time.time()-t0:.3f}s "
      f"it={int(np.asarray(st.it))}", flush=True)
