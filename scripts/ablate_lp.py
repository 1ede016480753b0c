"""Systematic ablation harness for the CA-LP solve paths.

The framework's profiling story (jax.profiler trace capture is banned
on the axon backend — see CLAUDE.md): measure each optimisation by
toggling it and timing the whole solve with real host sync, on the
same instance batch.  This is the harness VERDICT r1 asked for under
"§5 profiling (partial)" — one command produces the feature-ablation
table that explains where the throughput comes from.

Rows (plain solve, CA batch):
  xla-cg            batched XLA while_loop, Jacobi-PCG x-update
  xla-woodbury      + exact Woodbury x-update (ops/woodbury.py)
  xla-noincumbent   woodbury, feasible-incumbent tracking OFF
  xla-stride1       woodbury, incumbent checked EVERY iteration
  xla-bf16          woodbury, bf16 constraint storage (cfg.matvec_dtype)
  blocked           lp.solve_blocked (per-block early exit), woodbury
  fused             Pallas fused window kernel (ops/pallas_lp), bt=8
  fused-bt2         fused kernel at block size 2 (VMEM/occupancy trade)

l2f rows (when a trained checkpoint exists):
  l2f               full pipeline at the bench operating point
  l2f-scorer-xla    flax/XLA scorer instead of the Pallas scorer
  l2f-noboost       no rho fast-forward in the residual phase
  l2f-norepair      no greedy set-packing repair

Usage:
  scripts/cpu-env.sh python scripts/ablate_lp.py --quick   # CPU smoke
  python scripts/ablate_lp.py                              # real TPU run
  python scripts/ablate_lp.py --rows xla-woodbury,fused

Each timed run perturbs b with a fresh random vector and fetches the
result to host inside the timed region (axon dedup/async hazards —
STATUS.md).  Prints a markdown table; paste into STATUS.md.
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="small batch + iteration cap (CPU smoke)")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--max_iters", type=int, default=None)
    p.add_argument("--rows", default=None,
                   help="comma-separated subset of row names")
    p.add_argument("--n_items", type=int, default=100)
    p.add_argument("--n_bids", type=int, default=500)
    p.add_argument("--seed", type=int, default=2207)
    p.add_argument("--repeats", type=int, default=1,
                   help="timed repetitions per row (min is reported)")
    return p.parse_args()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(args):
    from lpbox_admm_tpu.adapters import ca
    rng = np.random.RandomState(args.seed)
    insts = [ca.generate_cauction(rng, n_items=args.n_items,
                                  n_bids=args.n_bids)
             for _ in range(args.batch)]
    return ca.make_problem(insts)


def timed(fn, prob, repeats):
    """(compile+run once, then time `repeats` perturbed runs, min wall).

    Returns (wall_s, result_of_last_timed_run)."""
    import jax

    t0 = time.time()
    out = fn(prob)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    rng = np.random.RandomState(17)
    best = None
    for _ in range(repeats):
        pert = 1.0 + 1e-5 * rng.rand(*prob.b.shape).astype(np.float32)
        p2 = prob._replace(b=prob.b * pert)
        t0 = time.time()
        out = fn(p2)
        # host fetch inside the timed region (axon async hazard)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        jax.block_until_ready(out)
        wall = time.time() - t0
        best = wall if best is None else min(best, wall)
    return compile_s, best, out


def main():
    args = parse_args()
    if args.batch is None:
        args.batch = 16 if args.quick else 128
    if args.max_iters is None:
        args.max_iters = 600 if args.quick else 20_000

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.ops import pallas_lp

    log(f"devices: {jax.devices()}")
    prob = make_batch(args)
    log(f"batch: {args.batch} x CA({args.n_items},{args.n_bids}), "
        f"E {prob.E.shape}, max_iters {args.max_iters}")

    base = LP_CONFIG.replace(linsolve="woodbury", incumbent_stride=8,
                             max_iters=args.max_iters)
    W = 100

    def plain(cfg):
        return lambda p: lp.solve(p, cfg, window=W)

    rows = {
        "xla-cg": plain(base.replace(linsolve="cg")),
        "xla-woodbury": plain(base),
        "xla-noincumbent": plain(base.replace(feasible_incumbent=False)),
        "xla-stride1": plain(base.replace(incumbent_stride=1)),
        "xla-bf16": plain(base.replace(matvec_dtype="bfloat16")),
        # rule-based fixing baseline (ADMM_lp_iters_fix, LP cpp:
        # 1689-1950): the paper's natural rule-vs-learned comparison
        "xla-rule": lambda p: lp.solve(p, base, window=W,
                                       rule_fixing=True),
        # window=500: each host round-trip over the remote tunnel costs
        # ~ms; short windows make dispatch latency dominate
        "blocked": lambda p: lp.solve_blocked(p, base, block=8,
                                              window=500)[0],
        "fused": lambda p: pallas_lp.solve_fused(
            p, base, window=W, bt=8, interpret=args.quick),
        "fused-bt2": lambda p: pallas_lp.solve_fused(
            p, base, window=W, bt=2, interpret=args.quick),
    }
    want = set(args.rows.split(",")) if args.rows else set(rows)

    results = []
    for name, fn in rows.items():
        if name not in want:
            continue
        try:
            compile_s, wall, state = timed(fn, prob, args.repeats)
            sel = jax.jit(functools.partial(lp.select_solution,
                                            repair_rounds=16))
            _, objs, infeas = sel(prob, lp.solution(state),
                                  lp.solution_best(state))
            results.append((name, wall, args.batch / wall,
                            float(np.mean(np.asarray(objs))),
                            int((np.asarray(infeas) > 0).sum()),
                            int(state.it), compile_s))
            log(f"{name}: wall={wall:.2f}s compile={compile_s:.1f}s")
        except Exception as e:                      # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
            results.append((name, None, None, None, None, None, None))

    # l2f ablations
    ckpt = os.path.join(ROOT, "checkpoints", "ca500_mha", "checkpoint",
                        "best_checkpoint.npz")
    l2f_rows = []
    if os.path.exists(ckpt) and (args.rows is None
                                 or any(r.startswith("l2f")
                                        for r in want)):
        import jax.numpy as jnp
        from lpbox_admm_tpu.config import PolicyConfig
        from lpbox_admm_tpu.models.policy import build_policy
        from lpbox_admm_tpu.train import l2f as l2f_mod
        from lpbox_admm_tpu.train.imitation import PolicyTrainer

        pcfg = PolicyConfig(net="mha", fix_confidence=0.98,
                            fix_windows=2)
        model = build_policy("mha")
        trainer = PolicyTrainer(model, pcfg, base, ws=100)
        ts = trainer.load(ckpt)
        variables = trainer.variables(ts)
        op = dict(ws=100, use_fused=not args.quick, policy_windows=3,
                  rho_boost_iters=5000,
                  max_iter=min(10_000, args.max_iters),
                  repair_rounds=16)
        variants = {
            "l2f": dict(op),
            "l2f-scorer-xla": dict(op, scorer="fast"),
            "l2f-noboost": dict(op, rho_boost_iters=0),
            "l2f-norepair": dict(op, repair_rounds=0),
        }
        rng = np.random.RandomState(29)
        for name, kw in variants.items():
            if args.rows and name not in want:
                continue
            try:
                t0 = time.time()
                _, out = l2f_mod.l2f_solve_compact(
                    prob, model, variables, base, pcfg, **kw)
                np.asarray(out["solution"])
                compile_s = time.time() - t0
                pert = 1.0 + 1e-5 * rng.rand(*prob.b.shape).astype(
                    np.float32)
                p2 = prob._replace(b=prob.b * jnp.asarray(pert))
                tm = {}
                t0 = time.time()
                # time the PERTURBED problem: an identical repeat
                # request can be served from the axon dedup cache
                _, out = l2f_mod.l2f_solve_compact(
                    p2, model, variables, base, pcfg, timings=tm,
                    **kw)
                np.asarray(out["solution"])
                wall = time.time() - t0
                l2f_rows.append(
                    (name, wall, args.batch / wall,
                     float(np.mean(np.asarray(out["obj"]))),
                     int((np.asarray(out["infeasible"]) > 0).sum()),
                     int(out["iterations"]), compile_s))
                log(f"{name}: wall={wall:.2f}s "
                    f"phases={ {k: round(v, 3) for k, v in tm.items() if isinstance(v, float)} }")
            except Exception as e:                  # noqa: BLE001
                log(f"{name}: FAILED {type(e).__name__}: "
                    f"{str(e)[:160]}")
                l2f_rows.append((name, None, None, None, None, None,
                                 None))
    elif not os.path.exists(ckpt):
        log("no CA-500 checkpoint; skipping l2f rows")

    print(f"\n| config | wall s | inst/s | mean obj | infeas | iters |"
          f" compile s |")
    print("|---|---|---|---|---|---|---|")
    for name, wall, ips, obj, inf, it, comp in results + l2f_rows:
        if wall is None:
            print(f"| {name} | FAILED | | | | | |")
        else:
            print(f"| {name} | {wall:.2f} | {ips:.1f} | {obj:.1f} | "
                  f"{inf} | {it} | {comp:.1f} |")


if __name__ == "__main__":
    main()
