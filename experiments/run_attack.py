"""Sparse adversarial attack experiment driver.

TPU equivalent of the reference's SparseAttack entry points
(main_ori.py / main_mha.py / main_mlp.py + experiments/lista_kl.py):

* ``-phase solve``  ~ main_ori.py: plain-ADMM attacks over the CIFAR
  images with lambda1 search; writes result/all_ori.csv and, with
  ``-dump_xiter``, per-image G-trajectory CSVs for imitation training
  (the generate_data.py path).
* ``-phase train``  ~ experiments/lista_kl.py: policy training on the
  recorded G trajectories (3 episodes, ws=50, node 10 x chunk 5).
* ``-phase test``   ~ main_mha.py/main_mlp.py: l2f-accelerated attacks,
  success rate + L norms to result/all_{net}.csv.

The reference's pretrained victim (cifar_best.pth) is not shipped; pass
``-victim path.pth`` to load one, otherwise a seeded random-init victim
is used (see models/cifarnet.py).
"""

import glob
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

CIFAR_DIR = "/root/reference/SparseAttack/SparseAttack/data"


def parse_args():
    p = base_parser("Sparse adversarial attack with learned early fixing")
    p.set_defaults(ws=50)
    p.add_argument("-n", type=int, default=8, help="number of images")
    p.add_argument("-image_dir", default=CIFAR_DIR)
    p.add_argument("-victim", default=None,
                   help="victim checkpoint: torch cifar_best.pth or a "
                        "flax .npz from scripts/train_victim.py "
                        "(optional; random-init without)")
    p.add_argument("-k", type=int, default=200, help="L0 budget")
    p.add_argument("-segments", type=int, default=150)
    p.add_argument("-maxIter_e", type=int, default=2000)
    p.add_argument("-maxIter_g", type=int, default=2000)
    p.add_argument("-search", type=int, default=6)
    p.add_argument("-init_lambda1", type=float, default=None,
                   help="starting lambda1 for the binary search "
                        "(default: the reference's 1e-3; random-init "
                        "victims need ~10-100)")
    p.add_argument("-result_dir", default="result")
    p.add_argument("-dump_xiter", action="store_true",
                   help="record G trajectories for policy training")
    p.add_argument("-repair", type=int, default=1,
                   help="1 = L0 cardinality repair on the final mask "
                        "(attack.cardinality_repair; never degrades "
                        "success), 0 = reference reporting semantics")
    p.add_argument("-weight_type", default="none",
                   choices=["none", "gradient", "variance",
                            "variance_mean", "contrast",
                            "contrast_mean"],
                   help="noise sensitivity weighting (utils.py:144)")
    return p.parse_args()


def load_images(args):
    from PIL import Image
    paths = sorted(glob.glob(os.path.join(args.image_dir, "*.png")))
    paths = paths[:args.n]
    imgs, labels = [], []
    for p in paths:
        im = np.asarray(Image.open(p).convert("RGB"),
                        dtype=np.float32) / 255.0
        imgs.append(im.transpose(2, 0, 1))
        labels.append(int(os.path.basename(p).split("_")[0]))
    # target rule of the reference (main_mha.py:84-88)
    targets = np.array([(t - 2) + 9 if t - 2 < 0 else t - 2
                        for t in labels])
    return np.stack(imgs), np.array(labels), targets, paths


def main():
    from lpbox_admm_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from lpbox_admm_tpu.adapters import attack, slic
    from lpbox_admm_tpu.config import ATTACK_CONFIG, PolicyConfig
    from lpbox_admm_tpu.models.cifarnet import (init_victim,
                                                load_torch_checkpoint,
                                                CifarNet)
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train.imitation import PolicyTrainer
    from lpbox_admm_tpu.utils import io as uio

    if args.save_dir == "saved_model":
        args.save_dir = os.path.join("saved_model", "attack", args.net)
    os.makedirs(args.result_dir, exist_ok=True)
    cfg = ATTACK_CONFIG.replace(
        k=args.k, segments=args.segments, maxIter_e=args.maxIter_e,
        maxIter_g=args.maxIter_g, lambda1_search_times=args.search)
    if args.init_lambda1 is None and args.victim is None:
        # a seeded random-init victim has weak, noisy gradients; the
        # reference's 1e-3 start leaves the whole binary search below
        # the useful range (observed 3% success vs 100% at 100)
        args.init_lambda1 = 100.0
    if args.init_lambda1 is not None:
        cfg = cfg.replace(init_lambda1=args.init_lambda1,
                          lambda1=args.init_lambda1)
    pcfg = PolicyConfig(net=args.net, node_size=10, chunk_dim=5)

    imgs, labels, targets, paths = load_images(args)
    if args.victim and args.victim.endswith(".npz"):
        from lpbox_admm_tpu.utils.checkpoint import load_pytree
        model, variables = init_victim()
        variables = load_pytree(args.victim, variables)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    elif args.victim:
        model = CifarNet()
        variables = load_torch_checkpoint(args.victim)
    else:
        model, variables = init_victim(seed=args.seed % (2 ** 31))
    Bms = [slic.segment_masks(
        (im.transpose(1, 2, 0) * 255).astype(np.uint8),
        n_segments=args.segments) for im in imgs]
    S = max(b.shape[0] for b in Bms)
    Bm = np.zeros((len(imgs), S, 3, 32, 32), np.float32)
    for i, b in enumerate(Bms):
        Bm[i, :b.shape[0]] = b
    nw = np.stack([attack.compute_sensitive(im, args.weight_type)
                   for im in imgs])

    if args.phase in ("solve", "test"):
        use_l2f = args.phase == "test"
        pm = pv = None
        if use_l2f:
            pm = build_policy(args.net)
            trainer = PolicyTrainer(pm, pcfg, ws=args.ws,
                                    save_dir=args.save_dir)
            path = args.checkpoint or os.path.join(
                args.save_dir, "checkpoint", "best_checkpoint.npz")
            ts = trainer.load(path)
            pv = trainer.variables(ts)
        t0 = time.time()
        res = attack.attack_with_search(
            model, variables, jnp.asarray(imgs), jnp.asarray(targets),
            jnp.asarray(Bm), jnp.asarray(nw), cfg, use_l2f=use_l2f,
            policy_model=pm, policy_variables=pv, pcfg=pcfg,
            repair=bool(args.repair), log=print)
        wall = time.time() - t0
        tag = args.net if use_l2f else "ori"
        csv = os.path.join(args.result_dir, f"all_{tag}.csv")
        with open(csv, "a") as f:
            for i, p in enumerate(paths):
                f.write(
                    f"Img:{os.path.basename(p)}, "
                    f"Origin Label:{labels[i]}, "
                    f"Target Label:{targets[i]}, "
                    f"asr:{int(res['success'][i])}, "
                    f"L0:{res['L0'][i]}, L1:{res['L1'][i]:.4f}, "
                    f"L2:{res['L2'][i]:.4f}, L-inf:{res['Li'][i]:.4f}\n")
        print(f"success rate {res['asr']:.2f}; mean L0 "
              f"{res['L0'].mean():.0f}, L1 {res['L1'].mean():.2f}, "
              f"L2 {res['L2'].mean():.3f}, Linf {res['Li'].mean():.3f}; "
              f"wall {wall:.1f}s -> {csv}")
        # per-image distribution (the reference evaluates its full
        # image set, main_mha.py:72-203 -- report quartiles, not just
        # means, so tail behaviour is visible)
        for norm in ("L0", "L1", "L2", "Li"):
            q = np.percentile(np.asarray(res[norm], np.float64),
                              [0, 25, 50, 75, 100])
            print(f"  {norm} quartiles: min {q[0]:.3f} / q25 {q[1]:.3f}"
                  f" / med {q[2]:.3f} / q75 {q[3]:.3f} / max {q[4]:.3f}")
        if args.dump_xiter and args.phase == "solve":
            # record G trajectories of a plain windowed run for training
            xdir = os.path.join(args.data_dir, "attack_xiter")
            os.makedirs(xdir, exist_ok=True)
            lam = jnp.asarray(res["lambda1"])
            G = jnp.ones_like(jnp.asarray(imgs))
            eps = jnp.asarray(res["epsilon"])
            state = attack.init_attack_state(G)
            trajs = []
            for w in range(3):
                state, traj = attack.g_window(
                    model, variables, jnp.asarray(imgs),
                    jnp.asarray(targets), eps, state, jnp.asarray(Bm),
                    jnp.asarray(nw), cfg, args.ws, lam, record=True)
                trajs.append(np.asarray(traj))
            traj = np.concatenate(trajs, axis=-1)  # (B,3,H,W,3*ws)
            for i, p in enumerate(paths):
                name = os.path.splitext(os.path.basename(p))[0]
                uio.write_xiter_csv(
                    os.path.join(xdir, f"{name}.csv"),
                    traj[i].reshape(-1, traj.shape[-1]))
            print(f"dumped {len(paths)} G trajectories to {xdir}")
        return

    if args.phase == "train":
        # policy training on G trajectories (lista_kl.py).  Recorded
        # CSVs (reference format) are used when present; otherwise the
        # trajectories are generated on device in one batch -- no file
        # round-trip (the reference dumps xiter/*.csv then re-reads
        # them, generate_data.py; the LP path here shows the on-device
        # alternative).
        from lpbox_admm_tpu.train.imitation import (TrajectoryDataset,
                                                    episode_batch)
        import jax.numpy as jnp
        xdir = os.path.join(args.data_dir, "attack_xiter")
        files = sorted(glob.glob(os.path.join(xdir, "*.csv")))
        pm = build_policy(args.net)
        trainer = PolicyTrainer(pm, pcfg, ws=args.ws,
                                save_dir=args.save_dir)
        ts = trainer.init(jax.random.PRNGKey(args.seed),
                          jnp.zeros((2, pcfg.node_size, pcfg.chunk_dim)))
        datasets = []
        if files:
            for fp in files:
                tr = uio.read_xiter_csv(fp)          # (3072, T)
                labels_i = (tr[:, -1] >= 0.5).astype(np.float32)
                datasets.append(TrajectoryDataset(
                    traj=jnp.asarray(tr[None]),
                    labels=jnp.asarray(labels_i[None]),
                    var_mask=jnp.ones((1, tr.shape[0]), bool),
                    oracle_obj=jnp.zeros((1,)),
                    oracle_iters=jnp.int32(tr.shape[1])))
        else:
            print("no recorded trajectories; generating on device")
            lam = jnp.full((imgs.shape[0],), cfg.init_lambda1,
                           jnp.float32)
            res0 = attack.attack_single(
                model, variables, jnp.asarray(imgs),
                jnp.asarray(targets), jnp.asarray(Bm), jnp.asarray(nw),
                cfg, lam)
            eps = jnp.asarray(res0["epsilon"])
            state = attack.init_attack_state(
                jnp.ones_like(jnp.asarray(imgs)))
            trajs = []
            for w in range(3):
                state, traj = attack.g_window(
                    model, variables, jnp.asarray(imgs),
                    jnp.asarray(targets), eps, state, jnp.asarray(Bm),
                    jnp.asarray(nw), cfg, args.ws, lam, record=True)
                trajs.append(traj)
            traj = jnp.concatenate(trajs, axis=-1)
            B_img = traj.shape[0]
            rows = traj.reshape(B_img, -1, traj.shape[-1])
            labels_d = (rows[:, :, -1] >= 0.5).astype(jnp.float32)
            datasets.append(TrajectoryDataset(
                traj=rows, labels=labels_d,
                var_mask=jnp.ones(rows.shape[:2], bool),
                oracle_obj=jnp.zeros((B_img,)),
                oracle_iters=jnp.int32(rows.shape[-1])))
        # best-checkpoint selection on an in-loop l2f eval: success rate
        # first, then mean L0 (the reference intends best-by-eval in SA
        # trainer.py:437-464 -- its comparison is commented out and it
        # saves every epoch; the LP trainer's live logic is the model)
        best_key = None
        lam_eval = jnp.full((imgs.shape[0],), cfg.init_lambda1,
                            jnp.float32)
        for epoch in range(args.num_epochs):
            ts, loss = trainer.train_epoch(ts, datasets, n_episodes=3)
            res = attack.attack_single(
                model, variables, jnp.asarray(imgs),
                jnp.asarray(targets), jnp.asarray(Bm), jnp.asarray(nw),
                cfg, lam_eval, use_l2f=True, policy_model=pm,
                policy_variables=trainer.variables(ts), pcfg=pcfg)
            asr = float(np.asarray(res["success"]).mean())
            l0 = float(np.asarray(res["L0"]).mean())
            key = (asr, -l0)               # higher asr, then lower L0
            print(f"epoch {epoch}: loss={loss:.5f} eval asr={asr:.2f} "
                  f"L0={l0:.0f}")
            trainer.save(ts, epoch)
            if best_key is None or key > best_key:
                best_key = key
                trainer.save(ts, epoch, best=True)
                print(f"  new best checkpoint (asr={asr:.2f}, "
                      f"L0={l0:.0f})")
        return


if __name__ == "__main__":
    main()
