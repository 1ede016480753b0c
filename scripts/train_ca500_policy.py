"""Train the CA-500 early-fixing MHA policy (the flagship benchmark
policy, reference experiments/01_run_train.sh preset: net=mha ws=100).

Writes checkpoints to checkpoints/ca500_{net}/ and prints per-epoch
obj-gap/speedup eval against the plain oracle.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-net", default="mha")
    ap.add_argument("-n_train", type=int, default=32)
    ap.add_argument("-n_eval", type=int, default=8)
    ap.add_argument("-batch", type=int, default=8)
    ap.add_argument("-epochs", type=int, default=30)
    ap.add_argument("-eval_every", type=int, default=5)
    ap.add_argument("-seed", type=int, default=19260817)
    ap.add_argument("-out", default="checkpoints")
    ap.add_argument("-eval_conf", type=float, default=0.98,
                    help="fix confidence used for checkpoint-selection "
                         "eval (the bench operating point, STATUS.md)")
    ap.add_argument("-eval_fix_windows", type=int, default=2)
    ap.add_argument("-damage_alpha", type=float, default=None,
                    help="fix-error-aware BCE: weight each variable by "
                         "its wrong-fix damage^alpha (imitation."
                         "damage_weights); None = uniform")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import imitation

    cfg = LP_CONFIG.replace(linsolve="woodbury")
    # fix_confidence/fix_windows only affect inference-time thresholding
    # (deter_fix_2), not the imitation loss -- set them to the bench
    # operating point so checkpoint selection optimizes what we ship
    pcfg = PolicyConfig(net=args.net, fix_confidence=args.eval_conf,
                        fix_windows=args.eval_fix_windows)
    rng = np.random.RandomState(args.seed % (2 ** 31))

    print("generating instances...", flush=True)
    t0 = time.time()
    all_insts = [ca.generate_cauction(rng, n_items=100, n_bids=500)
                 for _ in range(args.n_train + args.n_eval)]
    print(f"  {len(all_insts)} CA-500 instances in {time.time()-t0:.0f}s",
          flush=True)

    datasets = []
    for lo in range(0, args.n_train, args.batch):
        prob = ca.make_problem(all_insts[lo:lo + args.batch])
        t0 = time.time()
        ds = imitation.build_dataset(prob, cfg, record_iters=1000,
                                     damage_alpha=args.damage_alpha)
        print(f"  train ds {lo}..{lo+args.batch}: oracle "
              f"{int(ds.oracle_iters)} iters {time.time()-t0:.0f}s "
              f"mean obj {float(ds.oracle_obj.mean()):.1f}", flush=True)
        datasets.append(ds)
    eval_prob = ca.make_problem(all_insts[args.n_train:])
    eval_ds = imitation.build_dataset(eval_prob, cfg, record_iters=1000)
    print(f"  eval ds: oracle {int(eval_ds.oracle_iters)} iters", flush=True)

    model = build_policy(args.net)
    tag = (f"ca500_{args.net}_dmg{args.damage_alpha}"
           if args.damage_alpha is not None else f"ca500_{args.net}")
    save_dir = os.path.join(args.out, tag)
    trainer = imitation.PolicyTrainer(model, pcfg, cfg, ws=100,
                                      save_dir=save_dir)
    ts = trainer.init(jax.random.PRNGKey(args.seed % (2 ** 31)),
                      jnp.zeros((2, 20, 5)))
    best_gap = None
    for epoch in range(args.epochs):
        t0 = time.time()
        ts, loss = trainer.train_epoch(ts, datasets)
        msg = f"epoch {epoch}: loss={loss:.5f} ({time.time()-t0:.0f}s)"
        # the full l2f eval is expensive; run it every eval_every epochs
        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            m = trainer.evaluate(ts, eval_prob, eval_ds)
            gap = m["mean_obj_gap"]
            msg += (f" obj_gap={gap:+.4f} "
                    f"speedup={m['iter_speedup']:.2f}x "
                    f"fixed={m['n_fixed'].mean():.0f} "
                    f"errors={m['fix_errors'].mean():.1f}")
            trainer.save(ts, epoch)
            if best_gap is None or gap < best_gap:
                best_gap = gap
                trainer.save(ts, epoch, best=True)
        print(msg, flush=True)
    trainer.save(ts, args.epochs - 1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
