"""Benchmark: batched CA-500 plain Lp-Box ADMM throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value  = instances/s solving a 128-instance CA (j=100 items, k=500 bids)
         batch to convergence on one chip (the reference solves these one
         at a time in C++/Eigen; BASELINE.md north-star is >=100x).
vs_baseline = ratio against a faithful single-instance CPU
         reference-semantics implementation (float64 scipy-sparse PCG,
         the same hyperparameters/stopping rules as
         LPboxADMMsolver.cpp:489-995), timed on this host and cached --
         the stand-in for the un-buildable Eigen reference (no Eigen in
         this image).

Diagnostics (objective gap vs the CPU implementation, convergence
fraction) go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, "bench_cache")

N_ITEMS, N_BIDS, BATCH = 100, 500, 128
SEED = 2207
# greedy set-packing refill applied to BOTH plain and l2f reporting
# (equal semantics; ops/repair.py).  On 32-instance CPU sweeps repair
# improves the plain mean objective 4.7% and collapses the l2f
# max-gap tail +15.7% -> +6.3%; cost is ~16 comparison passes once
# per solve (negligible vs 1e4 iterations).
REPAIR_ROUNDS = 16
# 1-for-1 swap rounds after the refill (ops/repair.swap_repair): frees
# wrongly-fixed blocking bids; 64-inst CPU sweep mean gap -0.6% -> -1.2%.
# 4 rounds (x2 refill each) are quality-identical to 8x4 on the sweep
# (scripts/sweep_repair.py) at ~30% of the passes.
SWAP_ROUNDS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_instances():
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"ca_{N_ITEMS}_{N_BIDS}_{BATCH}.npz")
    if os.path.exists(path):
        z = np.load(path, allow_pickle=True)
        return list(zip(z["prices"], z["Cs"]))
    from lpbox_admm_tpu.adapters import ca
    rng = np.random.RandomState(SEED)
    t0 = time.time()
    insts = [ca.generate_cauction(rng, n_items=N_ITEMS, n_bids=N_BIDS)
             for _ in range(BATCH)]
    log(f"generated {BATCH} CA-{N_BIDS} instances in {time.time()-t0:.1f}s")
    np.savez(path,
             prices=np.array([p for p, _ in insts], dtype=object),
             Cs=np.array([C for _, C in insts], dtype=object))
    return insts


def cpu_reference_solve(prices, C, max_iters=20000):
    """Reference-semantics plain solve: float64, sparse E, Jacobi-PCG
    (tol 1e-3, maxiter 1e3, warm start y1 with early exit), LP preset
    schedule and stopping rules."""
    import scipy.sparse as sp

    b = -np.asarray(prices, dtype=np.float64)
    if isinstance(C, tuple):      # COO (rows, cols, vals, shape): the
        r, c, v, shape = C        # >20k-bid generator output
        E = sp.csr_matrix((np.asarray(v, np.float64), (r, c)),
                          shape=tuple(shape))
    else:
        E = sp.csr_matrix(np.asarray(C, dtype=np.float64))
    Et = E.T.tocsr()
    m, n = E.shape
    f = np.ones(m)
    x = np.ones(n)
    z1 = np.zeros(n)
    z2 = np.zeros(n)
    z4 = np.zeros(m)
    esq_diag = np.asarray(E.multiply(E).sum(axis=0)).ravel()
    obj_hist = []
    cur_obj = b @ x

    def sphere(v):
        s = v - 0.5
        return s * np.sqrt(n) / (2 * max(np.linalg.norm(s), 1e-300)) + 0.5

    def pcg(rhs, x0, rho, tol=1e-3, maxiter=1000):
        diag = 2 * rho + rho * esq_diag

        def mv(p):
            return 2 * rho * p + rho * (Et @ (E @ p))

        xk = x0.copy()
        r = rhs - mv(xk)
        rhs2 = rhs @ rhs
        if rhs2 == 0:
            return np.zeros_like(rhs)
        thr = max(tol * tol * rhs2, np.finfo(np.float64).tiny)
        if r @ r < thr:
            return xk
        p = r / diag
        absn = r @ p
        for _ in range(maxiter):
            tmp = mv(p)
            alpha = absn / (p @ tmp)
            xk += alpha * p
            r -= alpha * tmp
            if r @ r < thr:
                break
            z = r / diag
            absn, absold = r @ z, absn
            p = z + (absn / absold) * p
        return xk

    it = 0
    for it in range(max_iters):
        k = it // 25
        rho = 25.0 * 1.01 ** k
        gamma = max(1.6 * 0.95 ** k, 1.0)
        y1 = np.clip(x + z1 / rho, 0, 1)
        y2 = sphere(x + z2 / rho)
        y3 = np.maximum(f - E @ x - z4 / rho, 0)
        rhs = rho * y1 + rho * y2 - (b + z1 + z2) + Et @ (rho * (f - y3) - z4)
        x = pcg(rhs, y1, rho)
        z1 = z1 + gamma * rho * (x - y1)
        z2 = z2 + gamma * rho * (x - y2)
        z4 = z4 + gamma * rho * (E @ x + y3 - f)
        xn = max(np.linalg.norm(x), 2.2204e-16)
        if it > 0 and np.linalg.norm(x - y1) / xn <= 1e-4 \
                and np.linalg.norm(x - y2) / xn <= 1e-4:
            break
        obj_hist.append(b @ x)
        if len(obj_hist) >= 10:
            w = np.array(obj_hist[-10:])
            if np.std(w, ddof=1) / abs(w[-1]) <= 1e-12:
                break
        cur_obj = b @ (x >= 0.5)
    return cur_obj, it + 1


def cpu_baseline(insts, n_time=2):
    path = os.path.join(CACHE, "cpu_baseline.json")
    if os.path.exists(path):
        with open(path) as fjs:
            return json.load(fjs)
    times, objs, iters = [], [], []
    for prices, C in insts[:n_time]:
        t0 = time.time()
        obj, it = cpu_reference_solve(prices, C)
        times.append(time.time() - t0)
        objs.append(obj)
        iters.append(it)
        log(f"cpu reference: obj={obj:.1f} iters={it} "
            f"time={times[-1]:.2f}s")
    out = {"mean_time_s": float(np.mean(times)), "objs": objs,
           "iters": iters, "n": n_time}
    with open(path, "w") as fjs:
        json.dump(out, fjs)
    return out


def run_solver(name, solve_fn, prob, base):
    """Time a batched solve twice (compile, then measure); returns
    (instances/s, objectives, state, per-instance infeasible rows)."""
    import numpy as np

    t0 = time.time()
    state = solve_fn(prob)
    jax_block(state)
    log(f"{name}: first solve (incl. compile): {time.time()-t0:.1f}s, "
        f"it={int(state.it)}, done={int(np.asarray(state.done).sum())}"
        f"/{BATCH}")
    t0 = time.time()
    # per-process RANDOM VECTOR perturbation: a deterministic scalar
    # factor produces the same uploaded operand on every bench run,
    # which the axon remote executor dedups to a 0.00s cache hit
    # (CLAUDE.md hazards)
    import jax.numpy as jnp
    rng = np.random.default_rng()
    prob2 = prob._replace(b=prob.b * jnp.asarray(
        1.0 + 1e-7 * rng.random(prob.b.shape, dtype=np.float32)))
    state = solve_fn(prob2)
    jax_block(state)
    wall = time.time() - t0

    import functools

    import jax
    from lpbox_admm_tpu.core import lp
    it = int(state.it)
    # report the better of (last rounding, best feasible incumbent),
    # polished by the greedy refill (same semantics as the l2f side)
    _, objs, infeas = jax.jit(functools.partial(
        lp.select_solution, repair_rounds=REPAIR_ROUNDS,
        swap_rounds=SWAP_ROUNDS))(
        prob2, lp.solution(state), lp.solution_best(state))
    objs = np.asarray(objs)
    objs_last = np.asarray(lp.objective(state))
    infeas = np.asarray(infeas)
    log(f"{name}: wall={wall:.2f}s it={it} "
        f"done={int(np.asarray(state.done).sum())}/{BATCH} "
        f"mean_obj={objs.mean():.1f} "
        f"(last-rounding mean={objs_last.mean():.1f}) "
        f"infeas_instances={int((infeas > 0).sum())} "
        f"({it * BATCH / wall:.0f} instance-iterations/s)")
    for i, obj_ref in enumerate(base["objs"]):
        gap = (objs[i] - obj_ref) / abs(obj_ref)
        log(f"  inst{i}: tpu={objs[i]:.1f} cpu_ref={obj_ref:.1f} "
            f"gap={gap:+.4f}")
    return BATCH / wall, objs, state, infeas


def jax_block(tree):
    import jax
    jax.block_until_ready(tree)


def bench_l2f(prob, plain_objs, rho_boost_iters=5000,
              fix_confidence=0.98, fix_windows=2, max_iter=10000,
              policy_windows=3, damage_gate=0.25, tail_rho_step=None):
    """Learned-early-fixing benchmark using the trained CA-500 MHA
    checkpoint (scripts/train_ca500_policy.py), if present.

    Returns (instances/s, mean gap, max gap, infeasible count) or None.
    Defaults are the measured operating point (STATUS.md r2/r3 sweeps):
    3 policy windows, fix confidence 0.98 with a 2-window consistency
    gate and a 0.25 risk-calibrated damage gate (the confidence margin
    tightens with the bid's |b| rank), residual rho fast-forward 5000,
    iteration cap 10000 -- on the 128-instance CPU validation the gate
    moved mean obj gap -1.3% -> -1.7% and max +7.6% -> +5.7% at 346
    fixes/instance, 0 infeasibilities.

    Returns the 6-tuple ``(instances/s, mean gap, max gap,
    n infeasible instances, per-instance objectives,
    per-instance infeasible-row counts)`` or None when no checkpoint
    is available.
    """
    ckpt = os.path.join(ROOT, "checkpoints", "ca500_mha", "checkpoint",
                        "best_checkpoint.npz")
    if not os.path.exists(ckpt):
        log("l2f: no trained checkpoint at checkpoints/ca500_mha; skip")
        return None
    import numpy as np
    import jax.numpy as jnp
    from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import l2f
    from lpbox_admm_tpu.train.imitation import PolicyTrainer

    # incumbent_stride=8 is part of the measured operating point
    # (scripts/measure_l2f.py --stride default; quality validated in
    # the STATUS sweeps -- sampling the incumbent every 8 iterations
    # drops the per-iteration feasibility pass at no measurable gap)
    cfg = LP_CONFIG.replace(linsolve="woodbury", incumbent_stride=8)
    pcfg = PolicyConfig(net="mha", fix_confidence=fix_confidence,
                        fix_windows=fix_windows,
                        damage_gate=damage_gate)
    model = build_policy("mha")
    trainer = PolicyTrainer(model, pcfg, cfg, ws=100)
    ts = trainer.load(ckpt)
    variables = trainer.variables(ts)

    t0 = time.time()
    _, out = l2f.l2f_solve_compact(prob, model, variables, cfg, pcfg,
                                   ws=100, use_fused=True,
                                   policy_windows=policy_windows,
                                   rho_boost_iters=rho_boost_iters,
                                   max_iter=max_iter,
                                   repair_rounds=REPAIR_ROUNDS,
                                   swap_rounds=SWAP_ROUNDS,
                                   tail_rho_step=tail_rho_step)
    np.asarray(out["solution"])
    log(f"l2f: first solve (incl. compile): {time.time()-t0:.1f}s")
    # perturb a data input (NOT cfg -- static args recompile) to defeat
    # the remote-execution request cache
    rng = np.random.RandomState(13)
    prob2 = prob._replace(b=prob.b * jnp.asarray(
        1.0 + 1e-5 * rng.rand(*prob.b.shape).astype(np.float32)))
    t0 = time.time()
    tm = {}
    _, out = l2f.l2f_solve_compact(prob2, model, variables, cfg, pcfg,
                                   ws=100, use_fused=True,
                                   policy_windows=policy_windows,
                                   rho_boost_iters=rho_boost_iters,
                                   max_iter=max_iter,
                                   repair_rounds=REPAIR_ROUNDS,
                                   swap_rounds=SWAP_ROUNDS,
                                   timings=tm,
                                   tail_rho_step=tail_rho_step)
    np.asarray(out["solution"])        # host fetch = full sync
    wall = time.time() - t0
    objs = np.asarray(out["obj"])
    gap = (objs - plain_objs) / np.abs(plain_objs)
    fixed = np.asarray(out["n_fixed"])
    infeas = np.asarray(out["infeasible"])
    tag = f"K={rho_boost_iters}" + ("" if tail_rho_step is None else f",rs{tail_rho_step}")
    log(f"l2f({tag}): wall={wall:.2f}s "
        f"it={int(out['iterations'])} "
        f"obj_gap mean={gap.mean():+.4f} max={gap.max():+.4f} "
        f"fixed={fixed.mean():.0f} vars/instance "
        f"infeas_instances={int((infeas > 0).sum())} "
        f"throughput={BATCH / wall:.1f} instances/s "
        f"timings={ {k: round(v, 3) if isinstance(v, float) else v for k, v in tm.items()} }")
    return (BATCH / wall, float(gap.mean()), float(gap.max()),
            int((infeas > 0).sum()), objs, infeas)



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
    _enable_compile_cache()
    insts = get_instances()
    base = cpu_baseline(insts)

    import jax
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.ops import pallas_lp

    log(f"devices: {jax.devices()}")
    prob = ca.make_problem(insts)
    cfg = LP_CONFIG.replace(linsolve="woodbury", incumbent_stride=8)
    log(f"problem: E {prob.E.shape}")

    xla_ips, objs, _, _ = run_solver(
        "xla", lambda p: lp.solve(p, cfg, window=100), prob, base)
    fused_ips = 0.0
    finfeas = None
    # bt=2 first (114 vs 101 inst/s at bt=8, r2 ablation table); each
    # size retried once: the axon remote Mosaic compile helper fails
    # transiently on big kernel bodies (STATUS.md hazards)
    bt_ok = None
    for bt in (2, 2, 8, 4):
        try:
            fused_ips, fobjs, _, finfeas = run_solver(
                f"pallas-fused(bt={bt})",
                lambda p: pallas_lp.solve_fused(p, cfg, window=100,
                                                bt=bt),
                prob, base)
            bt_ok = bt
            # compiled-kernel regression check: converged objectives of
            # the fused path must track the XLA path (trajectories are
            # chaotic; objectives agree to the heuristic's spread)
            par = np.abs(fobjs - objs) / np.abs(objs)
            log(f"fused-vs-xla objective parity: mean={par.mean():.4f} "
                f"max={par.max():.4f}"
                + ("  [WARN: mean>5%]" if par.mean() > 0.05 else ""))
            break
        except Exception as e:
            log(f"pallas-fused(bt={bt}) failed: "
                f"{type(e).__name__}: {str(e)[:200]}")

    best_ips = max(xla_ips, fused_ips)
    l2f_res = bench_l2f(prob, objs)
    # tail-only rho cut (the lever that carried the xl/mega rungs to
    # 161-173x / 18.9x): policy phase keeps the reference schedule its
    # training trajectories used; headline-eligible under the same
    # quality bar as the default row
    # the rho fast-forward must be rescaled with the schedule: K=5000
    # at rs25 lands the tail at rho ~ 25*1.01^200; the same K at rs12
    # would land at 1.01^416 (measured: mean gap flipped to +1.7%, max
    # +12.9%).  K=2400 = 5000*12/25 reproduces the operating rho.
    # cap rescaled too: the tail runs cap-bound (the dual stop rarely
    # fires for every instance in a block), so the wall is
    # (cap - boost) iterations; 5000 lands the same rho endpoint as
    # the default row's 10000 under rs12
    l2f_rs = bench_l2f(prob, objs, tail_rho_step=12,
                       rho_boost_iters=2400, max_iter=5000)
    if l2f_rs is not None:
        rs_ips, rs_mean, rs_max, rs_inf = l2f_rs[:4]
        # stricter gate than the default row: the headline's story is
        # "l2f beats the plain solve's own mean objective"
        if rs_mean <= 0.0 and rs_inf == 0:
            best_ips = max(best_ips, rs_ips)
        else:
            log(f"l2f-rs12 excluded from headline (gap {rs_mean:+.4f}, "
                f"infeas {rs_inf})")
    # headline = best path meeting the quality bar: l2f counts when its
    # mean obj gap vs the plain solve is <= 3% with no infeasibilities
    # (the reference's whole point is l2f beating plain; VERDICT r1)
    if l2f_res is not None:
        l2f_ips, gap_mean, gap_max, infeas, l2f_objs, l2f_inf_rows = \
            l2f_res
        if gap_mean <= 0.03 and infeas == 0:
            best_ips = max(best_ips, l2f_ips)
        else:
            log(f"l2f excluded from headline (gap {gap_mean:+.4f}, "
                f"infeas {infeas})")
        if fused_ips > 0:
            # portfolio mode: keep the better of (ungated l2f, the
            # full-budget fused plain run) per instance -- a
            # signal-free cap on the l2f worst case.  The plain side
            # is ADAPTIVE (VERDICT r3 item 1a): it runs the full
            # reference iteration budget with the kernel's in-batch
            # early exit, i.e. "until done", and the SAME run is the
            # gap reference, so the portfolio never loses to the
            # plain solver it contains -- max gap <= 0 by
            # construction, immune to the chaotic run-to-run
            # trajectory variance that made the r3 capped-plain row
            # miss its own criterion (+4.27% claimed, +8.01% in the
            # driver run).  The l2f side runs UNgated (damage_gate=0,
            # ~374 fixes/instance): the plain floor already bounds
            # the tail (VERDICT r2 item 1 asks >=350 fixes).
            l2f_res0 = bench_l2f(prob, fobjs, damage_gate=0.0)
            if l2f_res0 is not None:
                p_ips, _, _, _, p_objs, p_inf = l2f_res0
            else:
                # fall back to the gated run WITH its per-instance
                # infeasibility rows, so the +inf masking below still
                # keeps invalid objectives out of the portfolio min
                p_ips, p_objs, p_inf = l2f_ips, l2f_objs, l2f_inf_rows
            # an infeasible l2f solution's invalid lower objective
            # must never enter the portfolio min (ADVICE r3): mask
            # those instances to the plain side
            if p_inf is not None:
                p_objs = np.where(p_inf > 0, np.inf, p_objs)
            port_objs = np.minimum(p_objs, fobjs)
            port_inf = np.where(port_objs == fobjs, finfeas, 0)
            pgap = (port_objs - fobjs) / np.abs(fobjs)
            port_ips = 1.0 / (1.0 / p_ips + 1.0 / fused_ips)
            n_port_inf = int((port_inf > 0).sum())
            log(f"portfolio(l2f-dg0+plain-full): "
                f"gap mean={pgap.mean():+.4f} "
                f"max={pgap.max():+.4f} "
                f"infeas_instances={n_port_inf} "
                f"throughput={port_ips:.1f} instances/s "
                f"({port_ips / (1.0 / base['mean_time_s']):.0f}x CPU)")
            # the portfolio row is the headline candidate whenever it
            # clears the quality bar (mean <= 0, max <= 0, feasible --
            # the r3 gates were inconsistent across rows, ADVICE r3)
            # AND beats the current best
            if (pgap.mean() <= 0.0 and pgap.max() <= 0.0
                    and n_port_inf == 0 and port_ips > best_ips):
                best_ips = port_ips

            # FAST portfolio (VERDICT r4 item 5): same max<=0-by-
            # construction design, but the plain partner runs the rs12
            # tail schedule with the budget rescaled 25->12 (cap
            # 20000*12/25 = 9600) -- the same lever that carried the
            # xl/mega ladder rungs.  The rs12 run is ITSELF the gap
            # reference, so the row never loses to the plain solver it
            # contains; its mean objective vs the full-budget plain run
            # is logged so the speed/quality trade stays explicit
            # (measured 0.5-1.5% at the mid rungs, STATUS r4 item 8).
            try:
                cfg_rs = cfg.replace(rho_change_step=12, max_iters=9600)
                rs_plain_ips, rs_objs, _, rs_inf_rows = run_solver(
                    f"pallas-fused-rs12(bt={bt_ok})",
                    lambda p: pallas_lp.solve_fused(p, cfg_rs,
                                                    window=100,
                                                    bt=bt_ok),
                    prob, base)
                rs_vs_full = (rs_objs.mean() - fobjs.mean()) \
                    / abs(fobjs.mean())
                log(f"plain-rs12 vs plain-full mean obj: "
                    f"{rs_vs_full:+.4f}")
                # l2f side: reuse the ungated run (infeasible instances
                # already masked to +inf above)
                port2 = np.minimum(p_objs, rs_objs)
                port2_inf = np.where(port2 == rs_objs, rs_inf_rows, 0)
                p2gap = (port2 - rs_objs) / np.abs(rs_objs)
                port2_ips = 1.0 / (1.0 / p_ips + 1.0 / rs_plain_ips)
                n2_inf = int((port2_inf > 0).sum())
                log(f"portfolio(l2f-dg0+plain-rs12): "
                    f"gap mean={p2gap.mean():+.4f} "
                    f"max={p2gap.max():+.4f} "
                    f"infeas_instances={n2_inf} "
                    f"throughput={port2_ips:.1f} instances/s "
                    f"({port2_ips / (1.0 / base['mean_time_s']):.0f}x "
                    f"CPU)")
                if (p2gap.mean() <= 0.0 and p2gap.max() <= 0.0
                        and n2_inf == 0
                        and int((rs_inf_rows > 0).sum()) == 0
                        and port2_ips > best_ips):
                    best_ips = port2_ips
            except Exception as e:
                log(f"portfolio-rs12 failed: {type(e).__name__}: "
                    f"{str(e)[:200]}")

    cpu_instances_per_s = 1.0 / base["mean_time_s"]
    vs = best_ips / cpu_instances_per_s
    print(json.dumps({
        "metric": "ca500_instance_throughput",
        "value": round(best_ips, 3),
        "unit": "instances/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
