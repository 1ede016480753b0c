"""Quick CPU check: effect of greedy repair on plain & l2f gaps.

    scripts/cpu-env.sh python scripts/eval_repair_cpu.py --batch 32
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=16)
    args = ap.parse_args()

    import jax
    from bench import get_instances
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.ops import pallas_lp, repair
    from lpbox_admm_tpu.train import l2f
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train.imitation import PolicyTrainer

    insts = get_instances()[:args.batch]
    prob = ca.make_problem(insts)
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    print(f"backend={jax.default_backend()} B={len(insts)}", flush=True)

    t0 = time.time()
    st = pallas_lp.solve_fused(prob, cfg, window=100, bt=8)
    sel = jax.jit(lp.select_solution)(prob, lp.solution(st),
                                      lp.solution_best(st))
    selr = jax.jit(functools.partial(
        lp.select_solution, repair_rounds=args.rounds))(
        prob, lp.solution(st), lp.solution_best(st))
    plain, plain_r = np.asarray(sel[1]), np.asarray(selr[1])
    dm = (plain_r - plain) / np.abs(plain)
    print(f"plain: mean {plain.mean():.1f} -> {plain_r.mean():.1f} "
          f"(repair helps {int((dm < -1e-6).sum())}/{len(insts)} "
          f"instances, mean delta {dm.mean():+.5f}, "
          f"max delta {dm.min():+.5f}) [{time.time()-t0:.0f}s]",
          flush=True)

    ckpt = os.path.join(ROOT, "checkpoints", "ca500_mha", "checkpoint",
                        "best_checkpoint.npz")
    model = build_policy("mha")
    pcfg = PolicyConfig(net="mha", fix_confidence=0.98, fix_windows=2)
    trainer = PolicyTrainer(model, pcfg, cfg, ws=100)
    variables = trainer.variables(trainer.load(ckpt))
    t0 = time.time()
    _, out = l2f.l2f_solve_compact(
        prob, model, variables, cfg.replace(incumbent_stride=8), pcfg,
        ws=100, policy_windows=3, use_fused=True, rho_boost_iters=5000,
        max_iter=10000)
    l2f_objs = np.asarray(out["obj"])
    sol = out["solution"]
    sol_r = repair.greedy_repair(prob, sol, rounds=args.rounds)
    l2f_r = np.asarray(jax.numpy.einsum("bn,bn->b", prob.b, sol_r))
    ex = np.einsum("bmn,bn->bm", np.asarray(prob.E, np.float64),
                   np.asarray(sol_r, np.float64))
    infeas = ((ex > np.asarray(prob.f) + 1e-6)
              & np.asarray(prob.row_mask)).sum(axis=-1)
    print(f"l2f solve: {time.time()-t0:.0f}s", flush=True)
    for name, l2 in (("raw", l2f_objs), ("repaired", l2f_r)):
        for pname, pl in (("raw", plain), ("repaired", plain_r)):
            gap = (l2 - pl) / np.abs(pl)
            print(f"l2f {name:9s} vs plain {pname:9s}: "
                  f"mean {gap.mean():+.4f} max {gap.max():+.4f}")
    print(f"l2f repaired infeas instances: {int((infeas > 0).sum())}")


if __name__ == "__main__":
    main()
