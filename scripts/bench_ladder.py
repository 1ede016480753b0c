"""CA scale ladder: throughput/quality at (items, bids) beyond 500 bids.

The reference's readFile carries an instance ladder up to 2000 items
(LinerProgramming/.../cython_solver/LPboxADMMsolver.cpp:2461-2486);
round-1 only ever benchmarked (100, 500).  This script benches the XLA
woodbury solver, the XLA CG solver and the fused Pallas kernel at each
rung on the real TPU chip, with a cached single-instance CPU
reference-semantics solve for objective sanity.

    python scripts/bench_ladder.py [--rungs 100x500,200x1000,500x2000]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, "bench_cache")

#: the reference's s/m/l/xl instance ladder (commented psize table,
#: LPboxADMMsolver.cpp:2461-2469: 100-500, 200-1000, 300-1500, 800-4000)
RUNG_BATCH = {(100, 500): 128, (200, 1000): 64, (300, 1500): 64,
              (500, 2000): 64, (800, 4000): 32}


def get_instances(n_items, n_bids, batch):
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"ca_{n_items}_{n_bids}_{batch}.npz")
    if os.path.exists(path):
        z = np.load(path, allow_pickle=True)
        return list(zip(z["prices"], z["Cs"]))
    from lpbox_admm_tpu.adapters import ca
    rng = np.random.RandomState(2207 + n_bids)
    t0 = time.time()
    insts = [ca.generate_cauction(rng, n_items=n_items, n_bids=n_bids)
             for _ in range(batch)]
    print(f"generated {batch} CA-({n_items},{n_bids}) in "
          f"{time.time()-t0:.1f}s", flush=True)
    np.savez(path,
             prices=np.array([p for p, _ in insts], dtype=object),
             Cs=np.array([C for _, C in insts], dtype=object))
    return insts


def cpu_oracle(n_items, n_bids, inst):
    path = os.path.join(CACHE, f"cpu_oracle_{n_items}_{n_bids}.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    from bench import cpu_reference_solve
    t0 = time.time()
    obj, iters = cpu_reference_solve(*inst)
    out = {"obj": float(obj), "iters": int(iters),
           "time_s": time.time() - t0}
    with open(path, "w") as f:
        json.dump(out, f)
    return out



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
    ap.add_argument("--rungs", default="200x1000,300x1500,800x4000")
    ap.add_argument("--batch", type=int, default=0,
                    help="override the per-rung batch size")
    ap.add_argument("--skip-cpu", action="store_true")
    ap.add_argument("--solvers", default="woodbury,fused",
                    help="comma list of woodbury,cg,fused.  cg is "
                         "excluded by default on TPU: the batched-CG "
                         "while_loop at (64,512,1024) crashed the TPU "
                         "worker process (2026-08-17); it remains "
                         "CPU-validated (tests)")
    args = ap.parse_args()
    rungs = [tuple(int(v) for v in r.split("x"))
             for r in args.rungs.split(",")]

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.ops import pallas_lp

    print(f"devices={jax.devices()}", flush=True)
    rngp = np.random.RandomState(11)
    results = {}
    out_path = os.path.join(CACHE, "ladder.json")
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for n_items, n_bids in rungs:
        B = args.batch or RUNG_BATCH.get((n_items, n_bids), 64)
        insts = get_instances(n_items, n_bids, B)
        prob = ca.make_problem(insts)
        m, n = prob.m, prob.n
        print(f"--- rung ({n_items},{n_bids}): B={B} E=({m},{n})",
              flush=True)
        oracle = None
        if not args.skip_cpu:
            oracle = cpu_oracle(n_items, n_bids, insts[0])
            print(f"cpu oracle: obj={oracle['obj']:.1f} "
                  f"iters={oracle['iters']} time={oracle['time_s']:.1f}s",
                  flush=True)

        def perturbed():
            f = 1.0 + 1e-5 * rngp.rand(*prob.b.shape).astype(np.float32)
            return prob._replace(b=prob.b * jnp.asarray(f))

        rung_res = {"B": B, "m": m, "n": n,
                    "cpu_oracle": oracle}
        solvers = args.solvers.split(",")
        runs = []
        if "woodbury" in solvers:
            runs.append(("xla-woodbury",
                         lambda p: lp.solve(p, LP_CONFIG.replace(
                             linsolve="woodbury"), window=100)))
        if "cg" in solvers:
            runs.append(("xla-cg",
                         lambda p: lp.solve(p, LP_CONFIG.replace(
                             linsolve="cg"), window=100)))
        if any(s.startswith("hostloop") for s in solvers):
            # host-driven windows: the xl rung's single 20k-iteration
            # while_loop dispatch crashed the axon TPU worker; shorter
            # dispatches with host fetches in between survive
            def solve_hostloop(p, _cfg=LP_CONFIG.replace(
                    linsolve="woodbury")):
                import functools as _ft

                @_ft.partial(jax.jit,
                             static_argnames=("cfg", "w", "skip"))
                def win(s, p, cfg, w, skip):
                    s, _ = lp.solve_window(s, p, cfg, w, record=False,
                                           skip_cvg_at=skip)
                    return s

                s = jax.jit(lp.init_state,
                            static_argnames=("cfg",))(p, _cfg)
                first = True
                while True:
                    s = win(s, p, _cfg, 500, 0 if first else None)
                    first = False
                    it, done = jax.device_get((s.it, jnp.all(s.done)))
                    if bool(done) or int(it) >= _cfg.max_iters:
                        return s
            if "hostloop" in solvers:
                runs.append(("xla-woodbury-hostloop", solve_hostloop))
            if "hostloop-bf16" in solvers:
                # bf16-stored E (exact: 0/1 entries), 3-limb vector
                # split — halves the HBM traffic of the E passes that
                # dominate at this rung (core/lp._emv)
                runs.append(
                    ("xla-woodbury-hostloop-bf16",
                     lambda p: solve_hostloop(p, LP_CONFIG.replace(
                         linsolve="woodbury",
                         matvec_dtype="bfloat16"))))
        for s in solvers:
            # blocked[-bf16][-sK][-bN]: core/lp.solve_blocked -- host
            # windows + per-block early exit (stragglers don't gate
            # the whole batch)
            if not s.startswith("blocked"):
                continue
            cfg_b = LP_CONFIG.replace(linsolve="woodbury")
            blk, cap = 8, None
            for part in s.split("-")[1:]:
                if part == "bf16":
                    cfg_b = cfg_b.replace(matvec_dtype="bfloat16")
                elif part.startswith("rs"):
                    cfg_b = cfg_b.replace(rho_change_step=int(part[2:]))
                elif part.startswith("s"):
                    cfg_b = cfg_b.replace(incumbent_stride=int(part[1:]))
                elif part.startswith("c"):
                    cap = int(part[1:])
                elif part.startswith("b"):
                    blk = int(part[1:])
            runs.append(
                (f"xla-{s}",
                 lambda p, c=cfg_b, bk=blk, mi=cap: lp.solve_blocked(
                     p, c, block=bk, window=500, max_iters=mi)[0]))
        for s in solvers:
            # stream[-bf16][-cK]: single-E-stream Pallas sweep
            # (ops/pallas_stream) through the blocked dispatch
            if not s.startswith("stream"):
                continue
            cfg_s = LP_CONFIG.replace(linsolve="woodbury")
            cap_s = None
            for part in s.split("-")[1:]:
                if part == "bf16":
                    cfg_s = cfg_s.replace(matvec_dtype="bfloat16")
                elif part == "g16":
                    # bf16-stored G^-1 (config.ginv_dtype): ~45% of
                    # the xl per-iteration traffic halved, lossy
                    cfg_s = cfg_s.replace(ginv_dtype="bfloat16")
                elif part == "sym":
                    # packed lower-triangle XLA apply (ops/symm_xla):
                    # exact f32 at 0.54x the G^-1 bytes if XLA fuses
                    cfg_s = cfg_s.replace(ginv_apply="packed-sym")
                elif part.startswith("rs"):
                    # faster rho schedule: iterations-to-convergence
                    # scale with rho_change_step (reference: x1.01/25,
                    # LPboxADMMsolver.cpp:951-970); the feasible
                    # incumbent + eviction/refill/swap reporting carry
                    # the quality (VERDICT r3 item 4: buy the xl 100x
                    # with an iteration cut, not bytes)
                    cfg_s = cfg_s.replace(rho_change_step=int(part[2:]))
                elif part.startswith("c"):
                    cap_s = int(part[1:])
                elif part.startswith("s"):
                    cfg_s = cfg_s.replace(
                        incumbent_stride=int(part[1:]))
            runs.append(
                (s,
                 lambda p, c=cfg_s, mi=cap_s: lp.solve_blocked(
                     p, c, block=8, window=500, max_iters=mi,
                     stream=True)[0]))
        if "auto" in solvers:
            # the user-facing dispatch (core/lp.solve_auto): fused
            # when the VMEM budget admits bt>=2, blocked-bf16 in the
            # HBM-bound regime, plain while_loop otherwise
            runs.append(("auto", lambda p: lp.solve_auto(
                p, LP_CONFIG.replace(linsolve="woodbury"))[0]))
        for s in solvers:
            # fused-bf16[-bN]: bf16 E storage in the VMEM-resident
            # kernel (bit-exact for 0/1 E; halves the footprint so
            # larger instance blocks fit)
            if not s.startswith("fused-bf16"):
                continue
            bt16 = pallas_lp.auto_bt(B, m, n, e_bytes=2)
            cfg_f = LP_CONFIG.replace(linsolve="woodbury",
                                      matvec_dtype="bfloat16")
            cap_f = None
            for part in s.split("-")[2:]:
                if part.startswith("rs"):
                    cfg_f = cfg_f.replace(rho_change_step=int(part[2:]))
                elif part.startswith("b"):
                    bt16 = int(part[1:])
                elif part.startswith("c"):
                    cap_f = int(part[1:])
            if bt16 < 1:
                print(f"{s}: no VMEM-resident block fits; skipped",
                      flush=True)
                continue
            runs.append(
                (f"pallas-{s}(bt={bt16})",
                 lambda p, b16=bt16, c=cfg_f, mi=cap_f:
                 pallas_lp.solve_fused(
                     p, c, window=100, bt=b16,
                     **({} if mi is None else {"max_iters": mi}))))
        bt = pallas_lp.auto_bt(B, m, n)
        if "fused" in solvers and bt > 0:
            runs.append((f"pallas-fused(bt={bt})",
                         lambda p: pallas_lp.solve_fused(
                             p, LP_CONFIG.replace(linsolve="woodbury"),
                             window=100, bt=bt)))
        elif "fused" in solvers:
            print("pallas-fused: no valid VMEM-resident block size at "
                  f"({m},{n}); skipped (needs the HBM-streamed variant)",
                  flush=True)
        for name, fn in runs:
            try:
                t0 = time.time()
                st = fn(perturbed())
                np.asarray(st.x)
                c_s = time.time() - t0
                p2 = perturbed()
                t0 = time.time()
                st = fn(p2)
                np.asarray(st.x)
                wall = time.time() - t0
                # "-rep" rows report with eviction + refill + swap
                # (ops/repair): iteration caps below the incumbent's
                # first-feasible point (~9k at xl) stay reportable
                rep = "-rep" in name
                sel = functools.partial(
                    lp.select_solution,
                    drop_rounds=64 if rep else 0,
                    repair_rounds=16 if rep else 0,
                    swap_rounds=4 if rep else 0)
                _, objs, infeas = jax.jit(sel)(
                    p2, lp.solution(st), lp.solution_best(st))
                objs = np.asarray(objs)
                line = {"wall_s": wall, "inst_per_s": B / wall,
                        "iters": int(st.it),
                        "mean_obj": float(objs.mean()),
                        "obj0": float(objs[0]),
                        "infeas_instances":
                            int((np.asarray(infeas) > 0).sum()),
                        "compile_s": c_s}
                if oracle:
                    line["gap0_vs_cpu"] = float(
                        (objs[0] - oracle["obj"]) / abs(oracle["obj"]))
                rung_res[name] = line
                print(f"{name}: wall={wall:.2f}s ({B/wall:.1f} inst/s) "
                      f"it={int(st.it)} mean_obj={objs.mean():.1f} "
                      f"infeas={line['infeas_instances']} "
                      + (f"gap0={line['gap0_vs_cpu']:+.4f}"
                         if oracle else ""), flush=True)
            except Exception as e:
                print(f"{name} FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                rung_res[name] = {"error": str(e)[:300]}
        # merge into existing results (don't clobber other rungs; keep
        # prior solver lines not re-run this invocation)
        prev = results.get(f"{n_items}x{n_bids}", {})
        prev.update(rung_res)
        results[f"{n_items}x{n_bids}"] = prev
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
