"""Repair-config quality sweep on CACHED raw solutions.

Solving the 64-instance plain oracle + l2f raw trajectories takes
minutes; evaluating a (repair_rounds, swap_rounds, refill_rounds)
selection config on the cached raw (last, best) roundings takes
seconds.  This separates the two so the repair operating point can be
swept cheaply:

    scripts/cpu-env.sh python scripts/sweep_repair.py --batch 64 \
        --configs "16:0:0,16:8:4,16:4:2,16:2:2,8:4:2"

Config syntax: repair_rounds:swap_rounds:refill_rounds.  Both sides
(plain oracle and l2f) are re-selected under each config — reporting
semantics stay equal, as in bench.py.
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CACHE = os.path.join(ROOT, "bench_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--configs", default="16:0:0,16:8:4,16:4:2,8:4:2")
    ap.add_argument("--refresh", action="store_true",
                    help="recompute the cached raw solves")
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

    insts = get_instances()[: args.batch]
    B = len(insts)
    prob = ca.make_problem(insts)
    cfg = LP_CONFIG.replace(linsolve="woodbury", incumbent_stride=8)
    cache = os.path.join(CACHE, f"raw_sols_b{B}.npz")
    os.makedirs(CACHE, exist_ok=True)

    if os.path.exists(cache) and not args.refresh:
        z = np.load(cache)
        plain_last, plain_best = z["plain_last"], z["plain_best"]
        l2f_last, l2f_best = z["l2f_last"], z["l2f_best"]
        print(f"cached raw solves: {cache}", flush=True)
    else:
        t0 = time.time()
        st = pallas_lp.solve_fused(prob, cfg, window=100, bt=8)
        plain_last = np.asarray(lp.solution(st))
        plain_best = np.asarray(lp.solution_best(st))
        print(f"plain raw solve: {time.time()-t0:.0f}s", flush=True)

        ckpt = os.path.join(ROOT, "checkpoints", "ca500_mha",
                            "checkpoint", "best_checkpoint.npz")
        model = build_policy("mha")
        pcfg = PolicyConfig(net="mha", fix_confidence=0.98, fix_windows=2)
        trainer = PolicyTrainer(model, pcfg, cfg, ws=100)
        variables = trainer.variables(trainer.load(ckpt))
        t0 = time.time()
        _, out = l2f.l2f_solve_compact(
            prob, model, variables, cfg, pcfg, ws=100, policy_windows=3,
            use_fused=True, rho_boost_iters=5000, max_iter=10000,
            repair_rounds=0, swap_rounds=0)
        # out["solution"] is the SELECTED (last-vs-best) full-width
        # rounding; selection is idempotent so feeding it as both
        # last and best reproduces bench's reporting path.
        l2f_last = np.asarray(out["solution"])
        l2f_best = l2f_last
        print(f"l2f raw solve: {time.time()-t0:.0f}s", flush=True)
        np.savez(cache, plain_last=plain_last, plain_best=plain_best,
                 l2f_last=l2f_last, l2f_best=l2f_best)

    from lpbox_admm_tpu.ops import repair as repair_mod

    def run_cfg(rr, sr, fr):
        @jax.jit
        def sel(last, best):
            sols = jnp.stack([last, best], axis=1)
            ex = jnp.einsum("bmn,bkn->bkm", prob.E, sols,
                            preferred_element_type=jnp.float32)
            viol = (ex > prob.f[:, None]) & prob.row_mask[:, None]
            infeas = jnp.sum(viol, axis=-1)
            obj = jnp.einsum("bn,bkn->bk", prob.b, sols,
                             preferred_element_type=jnp.float32)
            use_best = (infeas[:, 1] == 0) & (
                (obj[:, 1] <= obj[:, 0]) | (infeas[:, 0] > 0))
            k = use_best.astype(jnp.int32)
            sol = jnp.take_along_axis(sols, k[:, None, None], 1)[:, 0]
            if rr:
                sol = repair_mod.greedy_repair(prob, sol, rounds=rr)
            if sr:
                sol = repair_mod.swap_repair(prob, sol, rounds=sr,
                                             refill_rounds=fr)
            o = jnp.einsum("bn,bn->b", prob.b, sol,
                           preferred_element_type=jnp.float32)
            ex2 = jnp.einsum("bmn,bn->bm", prob.E, sol,
                             preferred_element_type=jnp.float32)
            inf = jnp.sum((ex2 > prob.f + 1e-6) & prob.row_mask, -1)
            return o, inf

        po, pi = map(np.asarray, sel(jnp.asarray(plain_last),
                                     jnp.asarray(plain_best)))
        lo, li = map(np.asarray, sel(jnp.asarray(l2f_last),
                                     jnp.asarray(l2f_best)))
        gap = (lo - po) / np.abs(po)
        return po, lo, gap, int(pi.sum()), int(li.sum())

    print(f"\nbackend={jax.default_backend()} B={B}")
    print("rr:sr:fr | plain mean | l2f mean | gap mean | gap max | "
          "n>5% | infeas(p/l)")
    for c in args.configs.split(","):
        rr, sr, fr = (int(v) for v in c.split(":"))
        t0 = time.time()
        po, lo, gap, pi, li = run_cfg(rr, sr, fr)
        print(f"{c:>8s} | {po.mean():10.1f} | {lo.mean():8.1f} | "
              f"{gap.mean():+8.4f} | {gap.max():+7.4f} | "
              f"{(gap > 0.05).sum():4d} | {pi}/{li}  ({time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
