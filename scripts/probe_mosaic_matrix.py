"""Discriminate Mosaic-helper crashes: which window-kernel configs
fail to compile? Forces fresh compiles via unusual window sizes.

 a) full shape (256,512) bt=8, non-nside  [known-good structure]
 b) compacted shape (256,256) bt=8, non-nside
 c) full shape (256,512) bt=8, nside
 d) compacted shape (256,256) bt=8, nside
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
from lpbox_admm_tpu.ops.pallas_lp import lp_window_fused

cfg = LP_CONFIG.replace(linsolve="woodbury")
rng = np.random.RandomState(0)


def make(B, m, n):
    E = (rng.rand(B, m, n) < 0.02).astype(np.float32)
    b = -rng.rand(B, n).astype(np.float32)
    f = np.maximum(E.sum(-1) * 0.3, 1.0).astype(np.float32)
    prob = LpProblem(E=jnp.asarray(E), b=jnp.asarray(b), f=jnp.asarray(f),
                     var_mask=jnp.ones((B, n), bool),
                     row_mask=jnp.ones((B, m), bool))
    return prob, lp.init_state(prob, cfg)


def trial(name, prob, state, bt, nside, window):
    nfactor = None
    if nside:
        nf = woodbury.factorize_nside(prob.E, state.free, lp._wb_ratio(cfg))
        nfactor = (nf.hinv, nf.ete)
    try:
        t0 = time.time()
        st = lp_window_fused(state, prob, cfg, window=window, bt=bt,
                             interpret=False, nfactor=nfactor)
        np.asarray(st.x)
        print(f"{name}: OK {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


pf, sf = make(32, 256, 512)
pc, sc = make(32, 256, 256)
trial("a full  bt8 woodbury", pf, sf, 8, False, 994)
trial("b small bt8 woodbury", pc, sc, 8, False, 994)
trial("c full  bt8 nside   ", pf, sf, 8, True, 994)
trial("d small bt8 nside   ", pc, sc, 8, True, 994)
