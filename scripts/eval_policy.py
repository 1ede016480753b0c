"""Evaluate a trained CA-500 early-fixing policy checkpoint.

Prints the STATUS.md ablation row: obj gap (mean/max) vs the plain
oracle (both sides with incumbent-selection reporting), iteration
speedup, fixes, fix errors, infeasibility, wall time.

    python scripts/eval_policy.py -net mlp \
        -checkpoint checkpoints/ca500_mlp/checkpoint/best_checkpoint.npz
"""

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-net", default="mha")
    ap.add_argument("-checkpoint", default=None)
    ap.add_argument("-n_eval", type=int, default=16)
    ap.add_argument("-seed", type=int, default=424242,
                    help="eval instance seed (held out from training)")
    ap.add_argument("-rho_boost", type=int, default=0)
    args = ap.parse_args()
    ckpt = args.checkpoint or os.path.join(
        ROOT, "checkpoints", f"ca500_{args.net}", "checkpoint",
        "best_checkpoint.npz")

    import jax
    import jax.numpy as jnp
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import imitation

    cfg = LP_CONFIG.replace(linsolve="woodbury")
    pcfg = PolicyConfig(net=args.net)
    model = build_policy(args.net)
    trainer = imitation.PolicyTrainer(model, pcfg, cfg, ws=100)
    ts = trainer.load(ckpt)

    rng = np.random.RandomState(args.seed)
    insts = [ca.generate_cauction(rng, n_items=100, n_bids=500)
             for _ in range(args.n_eval)]
    prob = ca.make_problem(insts)
    t0 = time.time()
    ds = imitation.build_dataset(prob, cfg, record_iters=1000)
    print(f"oracle: {int(ds.oracle_iters)} iters, mean obj "
          f"{float(ds.oracle_obj.mean()):.1f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    m = trainer.evaluate(ts, prob, ds, compact=True)
    gap = np.asarray(m["obj_gap"])
    print(f"[{args.net}] obj_gap mean={gap.mean():+.4f} "
          f"max={gap.max():+.4f} "
          f"iters={int(m['iterations'])} "
          f"(iter speedup {m['iter_speedup']:.2f}x) "
          f"fixed={m['n_fixed'].mean():.0f} "
          f"fix_errors={m['fix_errors'].mean():.1f} "
          f"infeas={int((m['infeasible'] > 0).sum())} "
          f"wall={m['wall_time_s']:.2f}s")


if __name__ == "__main__":
    main()
