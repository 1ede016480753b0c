"""CPU (interpret-mode) quality sweep of the l2f operating point.

Measures obj-gap statistics (NOT wall time -- interpret mode) of
l2f_solve_compact against the plain fused solve under matching
reporting semantics, for grids of (incumbent_stride, cap, K, conf).

    scripts/cpu-env.sh python scripts/sweep_l2f_cpu.py \
        --batch 64 --strides 1,8 --caps 10000
"""

import argparse
import itertools
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--strides", default="1,8")
    ap.add_argument("--caps", default="10000")
    ap.add_argument("--ks", default="5000")
    ap.add_argument("--conf", type=float, default=0.98)
    ap.add_argument("--damage-gates", default="0",
                    help="comma list of gate[:floor] values, e.g. "
                         "0,0.5,0.75:0.6")
    ap.add_argument("--fix-windows", type=int, default=2)
    ap.add_argument("--policy-windows", type=int, default=3)
    ap.add_argument("--checkpoint", default=None,
                    help="policy checkpoint (default: shipped ca500_mha); "
                         "comma list compares several against ONE oracle")
    ap.add_argument("--checkpoint2", default=None,
                    help="second checkpoint enabling the ensemble veto")
    ap.add_argument("--veto", default="0.5",
                    help="comma list of ensemble_veto thresholds")
    ap.add_argument("--repair", type=int, default=0,
                    help="greedy-repair rounds applied to BOTH sides")
    ap.add_argument("--swap", type=int, default=0,
                    help="1-for-1 swap-repair rounds, both sides")
    ap.add_argument("--portfolio", action="store_true",
                    help="also report best-of(l2f, cap-limited plain "
                         "fused): a signal-free tail cap -- max gap "
                         "<= the capped plain solve's by construction")
    args = ap.parse_args()

    import jax.numpy as jnp
    from bench import get_instances
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.ops import pallas_lp
    from lpbox_admm_tpu.train import l2f
    from lpbox_admm_tpu.train.imitation import PolicyTrainer
    import jax

    insts = get_instances()[:args.batch]
    B = len(insts)
    prob = ca.make_problem(insts)
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    print(f"backend={jax.default_backend()} B={B}", flush=True)

    import functools

    t0 = time.time()
    ocache = os.path.join(ROOT, "bench_cache",
                          f"sweep_oracle_{B}_r{args.repair}"
                          f"_s{args.swap}.npy")
    if os.path.exists(ocache):
        plain_objs = np.load(ocache)
    else:
        st = pallas_lp.solve_fused(prob, cfg, window=100, bt=8)
        _, plain_objs, _ = jax.jit(functools.partial(
            lp.select_solution, repair_rounds=args.repair,
            swap_rounds=args.swap))(
            prob, lp.solution(st), lp.solution_best(st))
        plain_objs = np.asarray(plain_objs)
        os.makedirs(os.path.dirname(ocache), exist_ok=True)
        np.save(ocache, plain_objs)
    print(f"plain oracle: mean={plain_objs.mean():.1f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    pobjs_cap = None
    if args.portfolio:
        pc = os.path.join(ROOT, "bench_cache",
                          f"sweep_plaincap_{B}_r{args.repair}"
                          f"_s{args.swap}.npy")
        if os.path.exists(pc):
            pobjs_cap = np.load(pc)
        else:
            stc = pallas_lp.solve_fused(prob, cfg, window=100, bt=8,
                                        max_iters=10000)
            _, pobjs_cap, _ = jax.jit(functools.partial(
                lp.select_solution, repair_rounds=args.repair,
                swap_rounds=args.swap))(
                prob, lp.solution(stc), lp.solution_best(stc))
            pobjs_cap = np.asarray(pobjs_cap)
            np.save(pc, pobjs_cap)
        gap_c = (pobjs_cap - plain_objs) / np.abs(plain_objs)
        print(f"plain cap-10000 side: gap mean={gap_c.mean():+.4f} "
              f"max={gap_c.max():+.4f}", flush=True)

    default_ckpt = os.path.join(
        ROOT, "checkpoints", "ca500_mha", "checkpoint",
        "best_checkpoint.npz")
    ckpts = (args.checkpoint or default_ckpt).split(",")
    model = build_policy("mha")
    base_pcfg = PolicyConfig(net="mha", fix_confidence=args.conf,
                             fix_windows=args.fix_windows)
    trainer = PolicyTrainer(model, base_pcfg, cfg, ws=100)

    def parse_gate(s):
        if ":" in s:
            g, q = s.split(":")
            return float(g), float(q)
        return float(s), 0.0

    variables2 = None
    if args.checkpoint2:
        variables2 = trainer.variables(trainer.load(args.checkpoint2))
    vetoes = [float(v) for v in args.veto.split(",")]

    for ckpt in ckpts:
        variables = trainer.variables(trainer.load(ckpt))
        tag = os.path.basename(os.path.dirname(os.path.dirname(ckpt)))
        for stride, cap, K, dgq, veto in itertools.product(
                [int(s) for s in args.strides.split(",")],
                [int(c) for c in args.caps.split(",")],
                [int(k) for k in args.ks.split(",")],
                [parse_gate(g) for g in args.damage_gates.split(",")],
                vetoes):
            dg, dq = dgq
            c = cfg.replace(incumbent_stride=stride)
            pcfg = base_pcfg.replace(damage_gate=dg, damage_rank_floor=dq,
                                     ensemble_veto=veto)
            tm = {}
            t0 = time.time()
            _, out = l2f.l2f_solve_compact(
                prob, model, variables, c, pcfg, ws=100,
                policy_windows=args.policy_windows, use_fused=True,
                rho_boost_iters=K, max_iter=cap,
                repair_rounds=args.repair, swap_rounds=args.swap,
                timings=tm, variables2=variables2)
            objs = np.asarray(out["obj"])
            gap = (objs - plain_objs) / np.abs(plain_objs)
            infeas = np.asarray(out["infeasible"])
            vtag = f" veto={veto}" if variables2 is not None else ""
            ptag = ""
            if pobjs_cap is not None:
                pgap = (np.minimum(objs, pobjs_cap) - plain_objs) \
                    / np.abs(plain_objs)
                ptag = (f" port_mean={pgap.mean():+.4f}"
                        f" port_max={pgap.max():+.4f}")
            print(f"[{tag}]{vtag} stride={stride} cap={cap} K={K} "
                  f"dg={dg}:{dq} "
                  f"mean={gap.mean():+.4f} "
                  f"max={gap.max():+.4f} "
                  f"infeas={int((infeas>0).sum())} "
                  f"fixed={np.asarray(out['n_fixed']).mean():.0f} "
                  f"it={int(out['iterations'])}{ptag} "
                  f"paths={tm.get('scorer')}/{tm.get('residual_path')} "
                  f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
