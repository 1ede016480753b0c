"""Tiny-shape TPU compile/run smoke of the fused LP kernel variants.

Mosaic is the risk surface (CLAUDE.md: compile crashes can wedge the
axon tunnel) -- this checks, at the smallest useful shapes, that every
kernel structure we ship lowers and runs on the real chip:
  * m-side window, stride 1 (ref-based incumbents in a while_loop)
  * m-side window, incumbent_stride 8 (pl.when-guarded updates)
  * n-side window (direct H^{-1} x-update)
  * record=True window (fori_loop + trajectory writes)

    python scripts/tpu_smoke_fused.py
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.ops import pallas_lp, woodbury

    print(f"devices={jax.devices()}", flush=True)
    rng = np.random.RandomState(5)
    insts = [ca.generate_cauction(rng, n_items=20, n_bids=60)
             for _ in range(8)]
    prob = ca.make_problem(insts)
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    state0 = lp.init_state(prob, cfg)
    ref, _ = lp.solve_window(state0, prob, cfg, 30, record=False,
                             skip_cvg_at=0)

    def check(tag, fn):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        print(f"{tag}: ok in {time.time()-t0:.1f}s", flush=True)
        return out

    st = check("m-side stride1", lambda: pallas_lp.lp_window_fused(
        state0, prob, cfg, 30, bt=8, skip_cvg_at=0, interpret=False))
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(ref.x),
                               rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(st.best_bin_obj),
                               np.asarray(ref.best_bin_obj),
                               rtol=1e-3, atol=1e-3)

    cfg8 = cfg.replace(incumbent_stride=8)
    ref8, _ = lp.solve_window(lp.init_state(prob, cfg8), prob, cfg8, 30,
                              record=False, skip_cvg_at=0)
    st8 = check("m-side stride8", lambda: pallas_lp.lp_window_fused(
        lp.init_state(prob, cfg8), prob, cfg8, 30, bt=8, skip_cvg_at=0,
        interpret=False))
    np.testing.assert_allclose(np.asarray(st8.best_bin_obj),
                               np.asarray(ref8.best_bin_obj),
                               rtol=1e-3, atol=1e-3)

    nf = woodbury.factorize_nside(prob.E, state0.free, lp._wb_ratio(cfg))
    stn = check("n-side stride1", lambda: pallas_lp.lp_window_fused(
        state0, prob, cfg, 30, bt=8, skip_cvg_at=0, interpret=False,
        nfactor=(nf.hinv, nf.ete)))
    np.testing.assert_allclose(np.asarray(stn.x), np.asarray(ref.x),
                               rtol=5e-2, atol=5e-3)

    _, traj = check("record=True", lambda: pallas_lp.lp_window_fused(
        state0, prob, cfg, 20, bt=8, skip_cvg_at=0, interpret=False,
        record=True))
    assert traj.shape == (8, prob.n, 20), traj.shape
    print("ALL SMOKE CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
