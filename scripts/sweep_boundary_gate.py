"""CPU A/B of the seg boundary-distance damage gate (STATUS r5 plan).

Builds the problem + plain oracle ONCE, then evaluates the masked l2f
path (+ post-fix refinement, the bench reporting semantics) at several
``PolicyConfig.boundary_gate`` values under equal semantics.

    scripts/cpu-env.sh python scripts/sweep_boundary_gate.py \
        [--num_nodes 10000] [--images 2,3,11,...] [--gates 0,0.5,1]
"""

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT_IMAGES = "2,3,11,14,16,17,21,24"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_nodes", type=int, default=10_000)
    ap.add_argument("--images", default=DEFAULT_IMAGES)
    ap.add_argument("--gates", default="0,0.5,1.0")
    ap.add_argument("--bands", default="2")
    ap.add_argument("--ws", type=int, default=10)
    ap.add_argument("--max_iter", type=int, default=30)
    ap.add_argument("--repair_sweeps", type=int, default=8)
    ap.add_argument("--pair_sweeps", type=int, default=4)
    ap.add_argument("--ref", default="10,2,2",
                    help="refine iters,rounds,band (0,0,0 = off)")
    ap.add_argument("--checkpoint",
                    default=os.path.join(
                        ROOT, "checkpoints", "seg_mha", "checkpoint",
                        "best_checkpoint.npz"))
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    from lpbox_admm_tpu.adapters import segmentation as seg
    from lpbox_admm_tpu.config import SEG_CONFIG, PolicyConfig
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import imitation, l2f
    from lpbox_admm_tpu.train.imitation import PolicyTrainer

    cfg = SEG_CONFIG
    base_pcfg = PolicyConfig(net="mha", node_size=5, chunk_dim=5,
                             window_mode="sliding")
    ids = [int(v) for v in args.images.split(",")]
    by_id = {os.path.splitext(os.path.basename(p))[0]: p
             for p in seg.reference_image_paths()}
    paths = [by_id[str(i)] for i in ids]
    print(f"backend={jax.default_backend()}  {len(paths)} images @ "
          f"{args.num_nodes}px", flush=True)

    prob = seg.load_problem(paths, num_nodes=args.num_nodes)
    t0 = time.time()
    ds = imitation.build_dataset_qp(
        prob, cfg, record_iters=5 * args.ws,
        repair_sweeps=args.repair_sweeps, pair_sweeps=args.pair_sweeps)
    print(f"oracle: mean energy {float(ds.oracle_obj.mean()):.1f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    model = build_policy("mha")
    trainer = PolicyTrainer(model, base_pcfg, cfg, ws=args.ws)
    variables = trainer.variables(trainer.load(args.checkpoint))
    labels = ds.labels.reshape(prob.batch, *prob.grid)
    ri, rr, rb = (int(v) for v in args.ref.split(","))

    for band in (int(v) for v in args.bands.split(",")):
        for gate in (float(v) for v in args.gates.split(",")):
            pcfg = base_pcfg.replace(boundary_gate=gate,
                                     boundary_band=band)
            t0 = time.time()
            state = l2f.l2f_solve(prob, model, variables, cfg, pcfg,
                                  ws=args.ws, max_iter=args.max_iter)
            if ri:
                state = l2f.qp_refine_boundary(state, prob, cfg,
                                               iters=ri, rounds=rr,
                                               band=rb)
            jax.block_until_ready(state.x)
            wall = time.time() - t0
            m = l2f.l2f_metrics_qp(state, prob, ds.oracle_obj, labels,
                                   repair_sweeps=args.repair_sweeps,
                                   pair_sweeps=args.pair_sweeps)
            gaps = np.asarray(m["energy_gap"])
            agrees = np.asarray(m["px_agree"])
            print(f"gate={gate:.2f} band={band}: "
                  f"gap={gaps.mean():+.4f} max={gaps.max():+.4f} "
                  f"agree={agrees.mean():.0f} "
                  f"fixed={np.asarray(m['n_fixed']).mean():.0f}px "
                  f"wall={wall:.1f}s", flush=True)
            print("  per-image gaps: "
                  + ",".join(f"{g:+.3f}" for g in gaps), flush=True)


if __name__ == "__main__":
    main()
