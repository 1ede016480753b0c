"""A/B the trajectory-agreement fix gate (PolicyConfig.fix_agree_gate).

Uses the cached plain-side raw solutions (bench_cache/raw_sols_b64.npz,
produced by scripts/sweep_repair.py) as the oracle, so only the l2f
side is re-solved per gate setting:

    scripts/cpu-env.sh python scripts/sweep_agree_gate.py --gates 0,1,2
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gates", default="0,1,2")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import get_instances
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import l2f
    from lpbox_admm_tpu.train.imitation import PolicyTrainer

    insts = get_instances()[: args.batch]
    prob = ca.make_problem(insts)
    cfg = LP_CONFIG.replace(linsolve="woodbury", incumbent_stride=8)
    sel = jax.jit(functools.partial(lp.select_solution,
                                    repair_rounds=16, swap_rounds=4))

    z = np.load(os.path.join(ROOT, "bench_cache",
                             f"raw_sols_b{args.batch}.npz"))
    _, pobj, _ = sel(prob, jnp.asarray(z["plain_last"]),
                     jnp.asarray(z["plain_best"]))
    pobj = np.asarray(pobj)
    print(f"backend={jax.default_backend()} plain mean={pobj.mean():.1f}")

    model = build_policy("mha")
    ckpt = os.path.join(ROOT, "checkpoints", "ca500_mha", "checkpoint",
                        "best_checkpoint.npz")
    for g in (int(v) for v in args.gates.split(",")):
        pcfg = PolicyConfig(net="mha", fix_confidence=0.98,
                            fix_windows=2, fix_agree_gate=g)
        trainer = PolicyTrainer(model, pcfg, cfg, ws=100)
        variables = trainer.variables(trainer.load(ckpt))
        t0 = time.time()
        _, out = l2f.l2f_solve_compact(
            prob, model, variables, cfg, pcfg, ws=100,
            policy_windows=3, use_fused=True, rho_boost_iters=5000,
            max_iter=10000, repair_rounds=16, swap_rounds=4)
        obj = np.asarray(out["obj"])
        gap = (obj - pobj) / np.abs(pobj)
        nf = np.asarray(out["n_fixed"])
        print(f"gate={g}: gap mean={gap.mean():+.4f} max={gap.max():+.4f}"
              f" n>5%={(gap > 0.05).sum()} fixed={nf.mean():.0f}"
              f" infeas={int(np.asarray(out['infeasible']).sum())}"
              f" ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
