"""Isolate the Mosaic compile crash inside _policy_phase at CA-500
shapes: record-mode fused window alone, scorer alone, then combined.

    python scripts/tpu_repro_policyphase.py
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
    from bench import get_instances
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.models.pallas_policy import policy_scores_pallas
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.ops import pallas_lp
    from lpbox_admm_tpu.train import l2f
    from lpbox_admm_tpu.train.imitation import PolicyTrainer

    print(f"devices={jax.devices()}", flush=True)
    insts = get_instances()[:128]
    prob = ca.make_problem(insts)
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    print(f"E{prob.E.shape}", flush=True)
    state0 = lp.init_state(prob, cfg)

    def attempt(tag, fn):
        t0 = time.time()
        try:
            out = fn()
            jax.block_until_ready(out)
            print(f"{tag}: OK in {time.time()-t0:.1f}s", flush=True)
        except Exception as e:
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    attempt("record window (full shape, bt=8, w=50)",
            lambda: pallas_lp.lp_window_fused(
                state0, prob, cfg, 50, bt=8, skip_cvg_at=0,
                interpret=False, record=True))

    ckpt = os.path.join(ROOT, "checkpoints", "ca500_mha", "checkpoint",
                        "best_checkpoint.npz")
    pcfg = PolicyConfig(net="mha", fix_confidence=0.98, fix_windows=2)
    model = build_policy("mha")
    trainer = PolicyTrainer(model, pcfg, cfg, ws=100)
    variables = trainer.variables(trainer.load(ckpt))

    rows = jnp.asarray(np.random.RandomState(0)
                       .rand(128 * prob.n, 100).astype(np.float32))
    attempt("pallas scorer standalone (65k rows)",
            lambda: policy_scores_pallas(variables, rows, pcfg))

    attempt("_policy_phase combined (pallas scorer)",
            lambda: l2f._policy_phase(
                state0, prob, variables, model, cfg, pcfg, 100, 3,
                True, "pallas", 10000, False))


if __name__ == "__main__":
    main()
