"""Diagnose the l2f objective-gap tail: which test-time signals flag
the bad instances?

For each instance we compute the oracle gap (vs the plain fused solve
under bench reporting semantics) and candidate suspicion signals that
are available WITHOUT the oracle:

    s_gain   repair+swap improvement fraction on the l2f rounding
    s_fixed  number of policy-fixed variables
    s_dis    best-incumbent vs last-rounding objective disagreement
    s_obj    selected objective, normalized by the instance's own
             LP-relaxation-free scale proxy (mean |b| * n)

and one oracle-only diagnostic (fix errors vs the plain solution).
Prints correlations and the recall of "top-k most suspicious" against
"gap > 5%" -- the viability check for a gated rescue pass.

    scripts/cpu-env.sh python scripts/diag_tail.py --batch 64 --topk 12
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--topk", type=int, default=12)
    ap.add_argument("--repair", type=int, default=16)
    ap.add_argument("--swap", type=int, default=8)
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import get_instances
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.ops import pallas_lp
    from lpbox_admm_tpu.train import l2f
    from lpbox_admm_tpu.train.imitation import PolicyTrainer

    insts = get_instances()[:args.batch]
    B = len(insts)
    prob = ca.make_problem(insts)
    cfg = LP_CONFIG.replace(linsolve="woodbury", incumbent_stride=8)
    print(f"backend={jax.default_backend()} B={B}", flush=True)

    sel = jax.jit(functools.partial(
        lp.select_solution, repair_rounds=args.repair,
        swap_rounds=args.swap))
    sel0 = jax.jit(lp.select_solution)

    t0 = time.time()
    st = pallas_lp.solve_fused(prob, cfg, window=100, bt=8)
    plain_sol, plain_objs, _ = sel(prob, lp.solution(st),
                                   lp.solution_best(st))
    plain_sol = np.asarray(plain_sol)
    plain_objs = np.asarray(plain_objs)
    print(f"plain oracle: mean={plain_objs.mean():.1f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    ckpt = args.checkpoint or os.path.join(
        ROOT, "checkpoints", "ca500_mha", "checkpoint",
        "best_checkpoint.npz")
    model = build_policy("mha")
    pcfg = PolicyConfig(net="mha", fix_confidence=0.98, fix_windows=2)
    trainer = PolicyTrainer(model, pcfg, cfg, ws=100)
    variables = trainer.variables(trainer.load(ckpt))

    t0 = time.time()
    state, out = l2f.l2f_solve_compact(
        prob, model, variables, cfg, pcfg, ws=100, policy_windows=3,
        use_fused=True, rho_boost_iters=5000, max_iter=10000,
        repair_rounds=0, swap_rounds=0)
    raw_sol = np.asarray(out["solution"])
    raw_obj = np.asarray(out["obj"])
    # the l2f selection also exposes last vs best for the disagreement
    obj_last = np.asarray(out["obj_last"])
    # final reporting: repair+swap on the selected solution
    rep_sol, rep_obj, rep_inf = sel(
        prob, out["solution"], out["solution"])
    rep_sol = np.asarray(rep_sol)
    rep_obj = np.asarray(rep_obj)
    print(f"l2f: mean raw={raw_obj.mean():.1f} rep={rep_obj.mean():.1f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    gap = (rep_obj - plain_objs) / np.abs(plain_objs)
    fixed_mask = np.asarray(out["fixed_mask"])
    fixed_val = np.asarray(out["fixed_val"])
    n_fixed = np.asarray(out["n_fixed"])

    s_gain = (raw_obj - rep_obj) / np.abs(rep_obj)      # repair gain
    s_dis = (obj_last - raw_obj) / np.abs(raw_obj)      # incumbent won by
    # oracle-only diagnostic
    fix_err = (fixed_mask & (fixed_val != plain_sol)).sum(-1)

    def corr(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        if a.std() < 1e-12 or b.std() < 1e-12:
            return 0.0
        return float(np.corrcoef(a, b)[0, 1])

    print(f"\ngap: mean={gap.mean():+.4f} max={gap.max():+.4f} "
          f"n(gap>5%)={(gap > 0.05).sum()} n(gap>3%)={(gap > 0.03).sum()}")
    print(f"corr(gap, s_gain)={corr(gap, s_gain):+.3f}")
    print(f"corr(gap, n_fixed)={corr(gap, n_fixed):+.3f}")
    print(f"corr(gap, s_dis)={corr(gap, s_dis):+.3f}")
    print(f"corr(gap, fix_err)={corr(gap, fix_err):+.3f}  [oracle-only]")

    bad = set(np.where(gap > 0.05)[0].tolist())
    print(f"\nbad instances (gap>5%): {sorted(bad)}")
    for name, sig in [("s_gain", s_gain), ("n_fixed", n_fixed),
                      ("s_dis", s_dis),
                      ("combo", s_gain + 0.001 * n_fixed)]:
        top = set(np.argsort(-np.asarray(sig))[:args.topk].tolist())
        rec = len(bad & top) / max(1, len(bad))
        print(f"top-{args.topk} by {name}: recall of bad = {rec:.2f} "
              f"({sorted(bad & top)})")

    order = np.argsort(-gap)[:10]
    print("\nworst 10 instances:")
    print(" idx    gap   s_gain n_fixed  s_dis fix_err")
    for i in order:
        print(f"{i:4d} {gap[i]:+.4f} {s_gain[i]:+.4f} {n_fixed[i]:6.0f} "
              f"{s_dis[i]:+.4f} {fix_err[i]:5.0f}")


if __name__ == "__main__":
    main()
