"""Image-segmentation experiment driver.

TPU equivalent of the reference's Segmentation silo entry points:

* ``-phase solve`` ~ cython/src/image_segmentation.cpp main (:15-31):
  plain batched solves of the shipped images at ~num_nodes pixels,
  recording trajectories + the xiter_all.csv oracle and output PNGs.
* ``-phase train`` ~ Segmentation/experiments/run.py -phase train:
  imitation training on 5 episodes of ws=10 sliding windows.
* ``-phase test``  ~ run.py -phase test -> _my_valid (trainer.py:
  676-811): l2f eval, energy gap + per-pixel agreement, PNG outputs.

Usage (presets mirror the reference: ws=10, ~1e4 px standard):
  python experiments/run_seg.py -phase solve -n 8 -num_nodes 10000
  python experiments/run_seg.py -phase train -net mha -ws 10
  python experiments/run_seg.py -phase test -net mha -ws 10
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
    p = base_parser("Segmentation BQP with learned early fixing")
    p.set_defaults(ws=10)
    p.add_argument("-n", type=int, default=8, help="number of images")
    p.add_argument("-n_eval", type=int, default=2)
    p.add_argument("-num_nodes", type=int, default=10_000,
                   help="target pixel count (1e4 standard, 1e5 "
                        "generalization)")
    p.add_argument("-image_dir", default=None,
                   help="defaults to the reference's shipped images")
    p.add_argument("-image_list", default=None,
                   help="comma-separated reference image ids (e.g. the "
                        "generalization list of Seg trainer.py:832); "
                        "overrides -n/-n_eval slicing for -phase test")
    p.add_argument("-result_dir", default="result")
    p.add_argument("-max_eval_iters", type=int, default=30,
                   help="l2f iteration budget (Seg trainer.py:705)")
    p.add_argument("-repair_sweeps", type=int, default=8,
                   help="ICM one-flip polish sweeps applied to BOTH the "
                        "plain oracle and the l2f solution in -phase "
                        "test (0 = reference reporting semantics)")
    p.add_argument("-pair_sweeps", type=int, default=4,
                   help="domino (two-pixel) flip descent sweeps after "
                        "the ICM polish, both sides "
                        "(ops/repair.pair_descent; 0 = off)")
    p.add_argument("-compact", type=int, default=-1,
                   help="physically compact the l2f residual problem "
                        "between windows in -phase test (the reference's "
                        "Ma/Mb shrink; 0 = masked full-grid iteration; "
                        "-1 = auto: compact on CPU only -- the compacted "
                        "problem's ELL matvec is gather-based, and TPU "
                        "XLA gathers serialize (~40 cycles/element, "
                        "probe_sparse_ops), so on TPU the full-grid "
                        "stencil conv is faster than any shrunken "
                        "gather form: 57s vs 337s for the 24-image "
                        "1e5-px eval at identical quality)")
    p.add_argument("-refine_rounds", type=int, default=1,
                   help="repeat the re-free + iterate cycle on the "
                        "moved boundary this many times")
    p.add_argument("-refine_band", type=int, default=1,
                   help="8-neighbour radius of the re-freed band")
    p.add_argument("-init_checkpoint", default=None,
                   help="warm-start -phase train from this policy "
                        "checkpoint (fine-tune, e.g. adapting the "
                        "1e4-px sliding policy to 1e5-px statistics; "
                        "pair with a low -lr)")
    p.add_argument("-train_image_list", default=None,
                   help="explicit reference image ids for the -phase "
                        "train set (keeps fine-tune images disjoint "
                        "from the -image_list eval set)")
    p.add_argument("-lr", type=float, default=None,
                   help="override PolicyConfig.lr (fine-tune)")
    p.add_argument("-eval_semantics", default="raw",
                   choices=["raw", "full"],
                   help="in-loop -phase train validation scoring: "
                        "'full' applies the test protocol's repair + "
                        "pair polish to BOTH sides so best-checkpoint "
                        "selection optimizes the metric actually "
                        "reported (the r3c 1e5-px fine-tune selected a "
                        "net good at raw energies that lost after "
                        "polish)")
    p.add_argument("-refine_iters", type=int, default=0,
                   help="post-fix refinement: re-free boundary-band "
                        "fixed pixels and run this many extra ADMM "
                        "iterations before rounding (l2f side only)")
    p.add_argument("-traj_fix_thr", type=float, default=0.0,
                   help="trajectory-extremity fixing: additionally fix "
                        "pixels with |x-0.5| > thr to round(x) at each "
                        "fix event (PolicyConfig.traj_fix_thr; 0.30 "
                        "measured near-zero fix error at 1e5 px)")
    p.add_argument("-traj_fix_only", type=int, default=0,
                   help="1 = ignore the net's sigmoid entirely (pure "
                        "trajectory fixing -- no policy checkpoint "
                        "needed at eval; ~4-14x faster seg l2f at "
                        "+0.5pp gap, logs/tpu_r5v.log)")
    return p.parse_args()


def main():
    from lpbox_admm_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    args = parse_args()
    if args.save_dir == "saved_model":
        args.save_dir = os.path.join("saved_model", "seg", args.net)
    import jax
    import jax.numpy as jnp
    from lpbox_admm_tpu.adapters import segmentation as seg
    from lpbox_admm_tpu.config import SEG_CONFIG, PolicyConfig
    from lpbox_admm_tpu.core import qp
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import imitation, l2f
    from lpbox_admm_tpu.train.imitation import PolicyTrainer
    from lpbox_admm_tpu.utils import io as uio

    cfg = SEG_CONFIG
    pcfg = PolicyConfig(net=args.net, node_size=5, chunk_dim=5,
                        window_mode="sliding",
                        damage_gate=args.damage_gate,
                        boundary_gate=args.boundary_gate,
                        boundary_band=args.boundary_band,
                        traj_fix_thr=args.traj_fix_thr,
                        traj_fix_only=bool(args.traj_fix_only))
    if args.lr is not None:
        pcfg = pcfg.replace(lr=args.lr)
    paths = (sorted(os.listdir(args.image_dir))
             if args.image_dir else seg.reference_image_paths())
    if args.image_dir:
        paths = [os.path.join(args.image_dir, p) for p in paths]
    all_paths = paths
    paths = paths[:args.n]
    os.makedirs(args.result_dir, exist_ok=True)

    if args.phase == "solve":
        prob = seg.load_problem(paths, num_nodes=args.num_nodes)
        t0 = time.time()
        ds = imitation.build_dataset_qp(prob, cfg,
                                        record_iters=5 * args.ws)
        wall = time.time() - t0
        xall = os.path.join(args.result_dir, "xiter_all.csv")
        H, W = prob.grid
        for i, p in enumerate(paths):
            name = os.path.splitext(os.path.basename(p))[0]
            uio.write_xiter_csv(
                os.path.join(args.result_dir, f"{name}.csv"),
                np.asarray(ds.traj[i]))
            uio.append_allres(xall, int(name) if name.isdigit() else i,
                              -float(ds.oracle_obj[i]),
                              int(ds.oracle_iters), wall / len(paths))
            seg.save_img(np.asarray(ds.labels[i]).reshape(H, W),
                         np.asarray(prob.mask[i]),
                         os.path.join(args.result_dir,
                                      f"output_{name}.png"))
        print(f"solved {len(paths)} images in {wall:.1f}s "
              f"({int(ds.oracle_iters)} iters); mean energy "
              f"{float(ds.oracle_obj.mean()):.1f}")
        return

    model = build_policy(args.net)
    trainer = PolicyTrainer(model, pcfg, cfg, ws=args.ws,
                            save_dir=args.save_dir)

    n_train = args.n - args.n_eval
    eval_paths = paths[n_train:]
    if args.image_list:
        # the reference's hand-picked generalization images
        # (_my_valid_2 my_list, Seg trainer.py:832)
        ids = [int(v) for v in args.image_list.split(",")]
        by_id = {os.path.splitext(os.path.basename(p))[0]: p
                 for p in all_paths}
        eval_paths = [by_id[str(i)] for i in ids]
    eval_prob = seg.load_problem(eval_paths, num_nodes=args.num_nodes)
    full_val = args.phase == "test" or (args.phase == "train"
                                        and args.eval_semantics == "full")
    eval_ds = imitation.build_dataset_qp(
        eval_prob, cfg, record_iters=5 * args.ws,
        repair_sweeps=args.repair_sweeps if full_val else 0,
        pair_sweeps=args.pair_sweeps if full_val else 0)
    val_rep = args.repair_sweeps if full_val else 0
    val_pair = args.pair_sweeps if full_val else 0

    if args.phase == "train":
        train_paths = paths[:n_train]
        if args.train_image_list:
            ids = [int(v) for v in args.train_image_list.split(",")]
            by_id = {os.path.splitext(os.path.basename(p))[0]: p
                     for p in all_paths}
            train_paths = [by_id[str(i)] for i in ids]
        train_prob = seg.load_problem(train_paths,
                                      num_nodes=args.num_nodes)
        train_ds = imitation.build_dataset_qp(train_prob, cfg,
                                              record_iters=5 * args.ws)
        if args.init_checkpoint:
            ts = trainer.load(args.init_checkpoint)
        else:
            ts = trainer.init(
                jax.random.PRNGKey(args.seed),
                jnp.zeros((2, pcfg.node_size, pcfg.chunk_dim)))
        def score(ts_):
            # validation scoring matches -eval_semantics: "full" runs
            # the test protocol (refine + both-sides polish) so the
            # kept checkpoint optimizes the metric actually reported
            state = l2f.l2f_solve(eval_prob, model,
                                  trainer.variables(ts_), cfg, pcfg,
                                  ws=args.ws,
                                  max_iter=args.max_eval_iters)
            if full_val and args.refine_iters > 0:
                state = l2f.qp_refine_boundary(
                    state, eval_prob, cfg, iters=args.refine_iters,
                    rounds=args.refine_rounds, band=args.refine_band)
            m = l2f.l2f_metrics_qp(state, eval_prob, eval_ds.oracle_obj,
                                   eval_ds.labels.reshape(
                                       eval_prob.batch, *eval_prob.grid),
                                   repair_sweeps=val_rep,
                                   pair_sweeps=val_pair)
            return (float(np.mean(np.asarray(m["energy_gap"]))),
                    float(np.asarray(m["n_fixed"]).mean()))

        best = None
        if args.init_checkpoint:
            # fine-tune floor: score the starting policy first so the
            # kept "best" can never be worse than what we started from
            best, nfix = score(ts)
            print(f"init: energy_gap={best:+.4f} fixed={nfix:.0f}px",
                  flush=True)
            trainer.save(ts, 0, best=True)
        for epoch in range(args.num_epochs):
            ts, loss = trainer.train_epoch(ts, [train_ds], n_episodes=5)
            gap, nfix = score(ts)
            print(f"epoch {epoch}: loss={loss:.5f} energy_gap={gap:+.4f}"
                  f" fixed={nfix:.0f}px", flush=True)
            trainer.save(ts, epoch)
            if best is None or gap < best:
                best = gap
                trainer.save(ts, epoch, best=True)
        return

    if args.phase == "test":
        path = args.checkpoint or os.path.join(
            args.save_dir, "checkpoint", "best_checkpoint.npz")
        ts = trainer.load(path)
        t0 = time.time()
        if args.compact == -1:
            args.compact = int(jax.default_backend() == "cpu")
        if args.compact:
            state = l2f.l2f_solve_compact_qp(
                eval_prob, model, trainer.variables(ts), cfg, pcfg,
                ws=args.ws, max_iter=args.max_eval_iters)
        else:
            state = l2f.l2f_solve(eval_prob, model, trainer.variables(ts),
                                  cfg, pcfg, ws=args.ws,
                                  max_iter=args.max_eval_iters)
        if args.refine_iters > 0:
            state = l2f.qp_refine_boundary(state, eval_prob, cfg,
                                           iters=args.refine_iters,
                                           rounds=args.refine_rounds,
                                           band=args.refine_band)
        jax.block_until_ready(state.x)
        wall = time.time() - t0
        m = l2f.l2f_metrics_qp(state, eval_prob, eval_ds.oracle_obj,
                               eval_ds.labels.reshape(
                                   eval_prob.batch, *eval_prob.grid),
                               repair_sweeps=args.repair_sweeps,
                               pair_sweeps=args.pair_sweeps)
        H, W = eval_prob.grid
        sol, _ = qp.select_solution(state, eval_prob,
                                    repair_sweeps=args.repair_sweeps,
                                    pair_sweeps=args.pair_sweeps)
        sol = np.asarray(sol)
        for i, p in enumerate(eval_paths):
            name = os.path.splitext(os.path.basename(p))[0]
            seg.save_img(sol[i], np.asarray(eval_prob.mask[i]),
                         os.path.join(args.result_dir,
                                      f"l2f_output_{name}.png"))
        print(f"[plain] mean energy {float(eval_ds.oracle_obj.mean()):.1f} "
              f"({int(eval_ds.oracle_iters)} iters)")
        print(f"[l2f] energy gap "
              f"{float(np.mean(np.asarray(m['energy_gap']))):+.4f}, "
              f"iters {int(m['iterations'])}, "
              f"fixed {np.asarray(m['n_fixed']).mean():.0f}px, "
              f"pixel agreement "
              f"{np.asarray(m['px_agree']).mean():.0f}, wall {wall:.2f}s")
        return


if __name__ == "__main__":
    main()
