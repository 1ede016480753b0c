"""Diagnostic: is the ADMM ITERATE a better fix-VALUE source than the
policy's sigmoid at high fix volume? (seg 1e5-px <=3% target, STATUS r5
item 6b: the floor is volume-dependent -- zero-error fixes at ~87k px
reach +2.42% but the policy's sigmoid VALUES lose ~3pp to errors there.)

For each image: run the plain seg ADMM, snapshot x at iteration 10/20/30,
score the window-1 trajectory with the shipped policy, then compare value
errors vs the converged oracle labels on
  (a) the policy's confident selection at several C
  (b) pure iterate-extremity selections of matched volume.

CPU-friendly (use scripts/cpu-env.sh); defaults to 4 images @ 1e4 px.

    scripts/cpu-env.sh python scripts/diag_seg_traj.py
        [--num_nodes 10000] [--images 2,3,11,14]
"""

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_nodes", type=int, default=10_000)
    ap.add_argument("--images", default="2,3,11,14")
    ap.add_argument("--ws", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lpbox_admm_tpu.adapters import segmentation as seg
    from lpbox_admm_tpu.config import SEG_CONFIG, PolicyConfig
    from lpbox_admm_tpu.core import qp
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import imitation, l2f
    from lpbox_admm_tpu.train.imitation import PolicyTrainer

    cfg = SEG_CONFIG
    pcfg = PolicyConfig(net="mha", node_size=5, chunk_dim=5,
                        window_mode="sliding")
    ids = [int(v) for v in args.images.split(",")]
    by_id = {os.path.splitext(os.path.basename(p))[0]: p
             for p in seg.reference_image_paths()}
    paths = [by_id[str(i)] for i in ids]
    print(f"backend={jax.default_backend()} {len(paths)} images @ "
          f"{args.num_nodes}px", flush=True)

    prob = seg.load_problem(paths, num_nodes=args.num_nodes)
    ds = imitation.build_dataset_qp(prob, cfg, record_iters=args.ws)
    labels = np.asarray(ds.labels)                   # (B, n)
    mask = np.asarray(ds.var_mask)
    B, n = labels.shape

    # plain trajectory snapshots at it=10/20/30
    state = qp.init_state(prob, cfg)
    snaps = {}
    traj1 = None
    for t in (1, 2, 3):
        state, tr = qp.solve_window(state, prob, cfg, args.ws,
                                    record=True)
        if t == 1:
            traj1 = tr
        snaps[t * args.ws] = np.asarray(state.x).reshape(B, n)

    # policy scores from the window-1 trajectory (what l2f sees at the
    # first fix event)
    model = build_policy("mha")
    trainer = PolicyTrainer(model, pcfg, cfg, ws=args.ws)
    variables = trainer.variables(trainer.load(os.path.join(
        ROOT, "checkpoints", "seg_mha", "checkpoint",
        "best_checkpoint.npz")))
    rows = traj1.reshape(-1, args.ws)
    sig = np.asarray(l2f.policy_scores(model, variables, rows, pcfg,
                                       8192)).reshape(B, n)

    x10 = snaps[args.ws]

    def report(tag, sel, values):
        sel = sel & (mask > 0.5)
        nsel = sel.sum(axis=-1)
        err = (sel & (values != labels)).sum(axis=-1)
        print(f"  {tag:34s} fixed/img {nsel.mean():8.0f}  "
              f"err/img {err.mean():7.1f}  "
              f"err-rate {err.sum() / max(nsel.sum(), 1):.5f}",
              flush=True)
        return nsel.mean()

    print("policy selection (sigmoid conf C), values = sigmoid vs "
          "iterate@10 vs iterate@30:")
    for C in (0.90, 0.80, 0.70, 0.60):
        m = 1.0 - C
        sel = (sig > 1 - m) | (sig < m)
        sig_val = (sig > 0.5).astype(np.float32)
        report(f"C={C:.2f} sigmoid-values", sel, sig_val)
        report(f"C={C:.2f} x@10-values", sel,
               (x10 > 0.5).astype(np.float32))
        report(f"C={C:.2f} x@30-values", sel,
               (snaps[3 * args.ws] > 0.5).astype(np.float32))

    print("pure iterate-extremity selection (|x-0.5|>t), values = "
          "round(x):")
    for t_it, x in snaps.items():
        for thr in (0.45, 0.4, 0.3, 0.2, 0.1):
            sel = np.abs(x - 0.5) > thr
            report(f"x@{t_it} thr={thr:.2f}", sel,
                   (x > 0.5).astype(np.float32))


if __name__ == "__main__":
    main()
