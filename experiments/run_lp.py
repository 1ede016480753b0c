"""Combinatorial-auction LP experiment driver.

The TPU equivalent of the reference's LP silo entry points:

* ``-phase generate`` ~ generate_data/generate_instances.py CLI
  (:362-401): seeded CA instances to disk in the reference's format.
* ``-phase solve``    ~ cython_solver/get_iterations.py (:10-30): plain
  batched solves recording xiter trajectory CSVs + the allres.csv
  oracle.
* ``-phase train``    ~ experiments/run.py -phase train (:22-61) ->
  PolicyKL.train(): imitation training with in-loop eval + checkpoints.
* ``-phase test``     ~ experiments/run.py -phase test -> _valid_2:
  l2f eval with objective gap / speedup / infeasibility metrics.

Usage (presets mirror experiments/01_run_train.sh: net=mha ws=100):
  python experiments/run_lp.py -phase generate -n 120 -j 100 -col 500
  python experiments/run_lp.py -phase solve -n 120
  python experiments/run_lp.py -phase train -net mha -ws 100
  python experiments/run_lp.py -phase test -net mha -ws 100
"""

import os
import sys
import time

try:                       # installed package (pip install -e .)
    import lpbox_admm_tpu  # noqa: F401
except ImportError:        # source checkout: add the repo root
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lpbox_admm_tpu.utils.cmd_args import base_parser


def parse_args():
    p = base_parser("CA-LP Lp-Box ADMM with learned early fixing")
    p.add_argument("-n", type=int, default=24, help="number of instances")
    p.add_argument("-j", type=int, default=100, help="number of items")
    p.add_argument("-n_eval", type=int, default=8,
                   help="held-out eval instances")
    p.add_argument("-record_iters", type=int, default=1000)
    return p.parse_args()


def instance_dir(args):
    return os.path.join(args.data_dir, "instance", f"{args.j}_{args.col}")


def load_problem(args, lo, hi):
    from lpbox_admm_tpu.adapters import ca
    d = instance_dir(args)
    insts = [ca.read_instance(os.path.join(d, f"instance_{i + 1}"))
             for i in range(lo, hi)]
    return ca.make_problem(insts)


def main():
    from lpbox_admm_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    args = parse_args()
    if args.save_dir == "saved_model":
        args.save_dir = os.path.join("saved_model", "lp", args.net)
    import jax.numpy as jnp
    import jax
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import imitation, l2f
    from lpbox_admm_tpu.utils import io as uio

    cfg = LP_CONFIG.replace(linsolve=args.linsolve,
                            matvec_dtype=args.matvec_dtype)
    pcfg = PolicyConfig(net=args.net, node_size=20,
                        chunk_dim=args.ws // 20,
                        damage_gate=args.damage_gate)

    if args.phase == "generate":
        t0 = time.time()
        ca.generate_dataset(args.data_dir, args.seed, args.n,
                            n_items=args.j, n_bids=args.col)
        print(f"generated {args.n} instances in {instance_dir(args)} "
              f"({time.time() - t0:.1f}s)")
        return

    if args.phase == "solve":
        xdir = os.path.join(args.data_dir, "xiter")
        os.makedirs(xdir, exist_ok=True)
        allres = os.path.join(xdir, "allres.csv")
        for lo in range(0, args.n, args.batch):
            hi = min(lo + args.batch, args.n)
            prob = load_problem(args, lo, hi)
            t0 = time.time()
            ds = imitation.build_dataset(prob, cfg,
                                         record_iters=args.record_iters)
            wall = time.time() - t0
            per = wall / (hi - lo)
            for b, i in enumerate(range(lo, hi)):
                nvars = int(prob.var_mask[b].sum())
                uio.write_xiter_csv(
                    os.path.join(
                        xdir, f"{args.j}_{args.col}_xiters_{i + 1}.csv"),
                    np.asarray(ds.traj[b, :nvars, :]))
                uio.append_allres(allres, i + 1,
                                  float(ds.oracle_obj[b]),
                                  int(ds.oracle_iters), per)
            print(f"instances {lo + 1}..{hi}: plain solve "
                  f"{int(ds.oracle_iters)} iters, {wall:.1f}s, "
                  f"mean obj {float(ds.oracle_obj.mean()):.1f}")
        return

    # train / test need the policy
    model = build_policy(args.net)
    trainer = imitation.PolicyTrainer(model, pcfg, cfg, ws=args.ws,
                                      save_dir=args.save_dir)

    # optional data-parallel mesh: instance batches shard over devices,
    # params replicate; jit inserts the gradient psum (SURVEY.md 2.4)
    mesh = None
    if args.mesh:
        from lpbox_admm_tpu.parallel.mesh import (make_mesh,
                                                  replicate_pytree,
                                                  shard_batch_pytree)
        mesh = make_mesh(args.mesh)
        print(f"data-parallel mesh over {args.mesh} devices")

    def maybe_shard(tree):
        return shard_batch_pytree(tree, mesh) if mesh is not None \
            else tree

    def maybe_replicate(tree):
        return replicate_pytree(tree, mesh) if mesh is not None else tree

    n_train = args.n - args.n_eval
    eval_prob = maybe_shard(load_problem(args, n_train, args.n))
    eval_ds = imitation.build_dataset(eval_prob, cfg,
                                      record_iters=args.record_iters)

    if args.phase == "train":
        os.makedirs(os.path.join(args.save_dir, "log"), exist_ok=True)
        logf = open(os.path.join(args.save_dir, "log", "log.txt"), "a")

        def log(msg):
            print(msg)
            logf.write(msg + "\n")
            logf.flush()

        datasets = []
        for lo in range(0, n_train, args.batch):
            hi = min(lo + args.batch, n_train)
            prob = maybe_shard(load_problem(args, lo, hi))
            datasets.append(imitation.build_dataset(
                prob, cfg, record_iters=args.record_iters))
            log(f"dataset {lo + 1}..{hi} built "
                f"(oracle iters {int(datasets[-1].oracle_iters)})")
        ts = trainer.init(jax.random.PRNGKey(args.seed),
                          jnp.zeros((2, pcfg.node_size, pcfg.chunk_dim)))
        ts = maybe_replicate(ts)
        trainer.train(ts, datasets, eval_prob, eval_ds,
                      num_epochs=args.num_epochs, log=log)
        logf.close()
        return

    if args.phase == "test":
        path = args.checkpoint or os.path.join(
            args.save_dir, "checkpoint", "best_checkpoint.npz")
        ts = maybe_replicate(trainer.load(path))
        m = trainer.evaluate(ts, eval_prob, eval_ds, compact=True)
        print(f"[Lpbox] oracle: mean obj "
              f"{float(eval_ds.oracle_obj.mean()):.2f}, "
              f"iters {int(eval_ds.oracle_iters)}")
        print(f"[l2f] obj gap {m['mean_obj_gap']:+.4f}, "
              f"iters {int(m['iterations'])} "
              f"(speedup {m['iter_speedup']:.2f}x), "
              f"fixed {m['n_fixed'].mean():.0f} vars, "
              f"fix errors {m['fix_errors'].mean():.1f}, "
              f"infeasible {m['infeasible'].mean():.2f}")
        return


if __name__ == "__main__":
    main()
