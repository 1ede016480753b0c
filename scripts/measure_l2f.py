"""TPU measurement: l2f phase breakdown + rho_boost sweep vs plain fused.

Answers VERDICT round-2 item 1: where does l2f wall-clock go, and what
does ``rho_boost_iters`` buy.  Run on the real TPU chip (default env):

    python scripts/measure_l2f.py [--ks 0,2000,5000,10000]

Hazards honoured (CLAUDE.md): problems passed as jit args, data
perturbed between timed runs to defeat the remote-execution dedup
cache, no jax.profiler.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp



def _enable_compile_cache():
    """Persistent compilation cache: the axon remote compile can take
    minutes; cache executables across processes."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="5000")
    ap.add_argument("--caps", default="10000")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--policy-windows", type=int, default=3)
    ap.add_argument("--conf", type=float, default=0.98)
    ap.add_argument("--fix-windows", type=int, default=2)
    ap.add_argument("--stride", type=int, default=8,
                    help="incumbent_stride for the quality configs")
    ap.add_argument("--ckpt", default=None,
                    help="policy checkpoint (default: the shipped "
                         "checkpoints/ca500_mha best)")
    ap.add_argument("--skip-plain", action="store_true")
    ap.add_argument("--skip-scorer", action="store_true")
    args = ap.parse_args()
    ks = [int(k) for k in args.ks.split(",")]
    caps = [int(c) for c in args.caps.split(",")]

    _enable_compile_cache()
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
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    print(f"devices={jax.devices()} problem E{prob.E.shape}", flush=True)

    # per-run random perturbation: defeats the remote-execution dedup
    # cache (a scalar 1e-7 factor proved too weak -- one run was served
    # from cache at 0.00s) while moving objectives by < 0.001%
    rngp = np.random.RandomState(7)

    def perturbed():
        f = 1.0 + 1e-5 * rngp.rand(*prob.b.shape).astype(np.float32)
        return prob._replace(b=prob.b * jnp.asarray(f))

    results = {}

    # ---- plain fused -----------------------------------------------------
    plain_objs = None
    if not args.skip_plain:
        for feas_inc, stride in ((True, 1), (True, args.stride),
                                 (False, 1)):
            c = cfg.replace(feasible_incumbent=feas_inc,
                            incumbent_stride=stride)
            t0 = time.time()
            st = pallas_lp.solve_fused(perturbed(), c, window=100, bt=8)
            np.asarray(st.x)            # host fetch = real sync (axon
            compile_s = time.time() - t0  # block_until_ready can lie)
            t0 = time.time()
            p2 = perturbed()
            st = pallas_lp.solve_fused(p2, c, window=100, bt=8)
            np.asarray(st.x)
            wall = time.time() - t0
            sol, objs, infeas = jax.jit(lp.select_solution)(
                p2, lp.solution(st), lp.solution_best(st))
            objs = np.asarray(objs)
            lastobjs = np.asarray(lp.objective(st))
            if feas_inc and (stride == args.stride or plain_objs is None):
                plain_objs = objs
            print(f"plain fused feas_inc={feas_inc} stride={stride}: "
                  f"wall={wall:.2f}s "
                  f"({B/wall:.1f} inst/s) it={int(st.it)} "
                  f"compile+1st={compile_s:.1f}s "
                  f"mean_obj={objs.mean():.1f} last={lastobjs.mean():.1f} "
                  f"infeas={int((np.asarray(infeas)>0).sum())}", flush=True)
            results[f"plain_feas{int(feas_inc)}_s{stride}"] = {
                "wall_s": wall, "inst_per_s": B / wall,
                "mean_obj": float(objs.mean())}

    # ---- l2f sweep -------------------------------------------------------
    ckpt = args.ckpt or os.path.join(ROOT, "checkpoints", "ca500_mha",
                                     "checkpoint", "best_checkpoint.npz")
    pcfg = PolicyConfig(net="mha", fix_confidence=args.conf,
                        fix_windows=args.fix_windows)
    model = build_policy("mha")
    trainer = PolicyTrainer(model, pcfg, cfg, ws=100)
    ts = trainer.load(ckpt)
    variables = trainer.variables(ts)

    if plain_objs is None:
        p2 = perturbed()
        st = pallas_lp.solve_fused(p2, cfg, window=100, bt=8)
        _, plain_objs, _ = jax.jit(lp.select_solution)(
            p2, lp.solution(st), lp.solution_best(st))
        plain_objs = np.asarray(plain_objs)

    # ---- policy-scorer micro-benchmark ----------------------------------
    from lpbox_admm_tpu.models.fast_policy import fast_policy_scores
    from lpbox_admm_tpu.models.pallas_policy import policy_scores_pallas
    R = 65536
    rows_np = np.random.RandomState(1).rand(R, 100).astype(np.float32)
    for name, fn in ([] if args.skip_scorer else [
            ("fast", lambda r: fast_policy_scores(variables, r, pcfg)),
            ("pallas", lambda r: policy_scores_pallas(variables, r,
                                                      pcfg))]):
        try:
            np.asarray(fn(jnp.asarray(rows_np)))       # compile
            rp = jnp.asarray(
                rows_np * (1.0 + 1e-5 * rngp.rand(R, 1)
                           ).astype(np.float32))
            t0 = time.time()
            out = np.asarray(fn(rp))
            wall = time.time() - t0
            print(f"scorer {name}: {R/wall/1e6:.2f}M rows/s "
                  f"({wall*1e3:.1f} ms / {R} rows)", flush=True)
            results[f"scorer_{name}_rows_per_s"] = R / wall
        except Exception as e:
            print(f"scorer {name} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    lcfg = cfg.replace(incumbent_stride=args.stride)
    for K in ks:
        for cap in caps:
            # warm-up/compile run, then timed run on perturbed data
            for timed in (False, True):
                tm = {}
                p2 = perturbed()
                t0 = time.time()
                st, out = l2f.l2f_solve_compact(
                    p2, model, variables, lcfg, pcfg, ws=100,
                    policy_windows=args.policy_windows, use_fused=True,
                    rho_boost_iters=K, max_iter=cap, timings=tm)
                np.asarray(out["solution"])
                wall = time.time() - t0
                if not timed:
                    print(f"l2f K={K} cap={cap}: compile+1st={wall:.1f}s",
                          flush=True)
                    continue
                objs = np.asarray(out["obj"])
                gap = (objs - plain_objs) / np.abs(plain_objs)
                infeas = np.asarray(out["infeasible"])
                print(f"l2f K={K} cap={cap}: wall={wall:.2f}s "
                      f"({B/wall:.1f} inst/s) "
                      f"it={int(out['iterations'])} "
                      f"gap mean={gap.mean():+.4f} max={gap.max():+.4f} "
                      f"fixed={np.asarray(out['n_fixed']).mean():.0f} "
                      f"infeas={int((infeas>0).sum())} timings="
                      + json.dumps({k: round(v, 3) if isinstance(v, float) else v
                                    for k, v in tm.items()}),
                      flush=True)
                results[f"l2f_K{K}_cap{cap}"] = {
                    "wall_s": wall, "inst_per_s": B / wall,
                    "gap_mean": float(gap.mean()),
                    "gap_max": float(gap.max()), "timings": tm}

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
