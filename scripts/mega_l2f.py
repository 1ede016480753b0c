"""Learned early fixing at the very-large struct+Schur rungs.

VERDICT r4 item 1: the framework's flagship capability
(``ADMM_lp_iters_l2f``, reference cython_solver/LPboxADMMsolver.cpp
:1098-1574) had never run at its flagship scale -- the (1000, 1e5)-class
rungs of the reference's own instance ladder (:2461-2486).  This driver
runs the full pipeline there, TPU-first:

    python scripts/mega_l2f.py --phase gen      --seeds 7001,7002,...
    python scripts/mega_l2f.py --phase labels   --seeds bench,7001,...
    python scripts/mega_l2f.py --phase transfer --seeds 7001 [--ckpt ...]
    python scripts/mega_l2f.py --phase train    --seeds 7001,... --holdout 7001
    python scripts/mega_l2f.py --phase l2f      [--ckpt ...]

Phases:

* ``gen``      generate + cache training instances (seeds disjoint from
               the canonical bench instance, which is seed 2207+n_bids
               under the tag ``bench``).
* ``labels``   plain struct+Schur solve at the reference schedule with
               the first ``--record`` iterations recorded (the xiter
               trajectory); saves trajectory (f16) + converged labels +
               the selection-reported objective per instance.  This is
               both the imitation dataset and the transfer ground truth.
* ``transfer`` score a checkpoint's deter_fix_2 decisions on the cached
               trajectories against the converged labels: fix volume,
               fix errors and the |b|-weighted error mass at a C grid --
               decides transfer vs retrain.
* ``train``    imitation-train a mega policy on the cached trajectories
               (train/imitation.PolicyTrainer; one instance = one
               dataset, episodes weighted 1/i as in LP trainer.py:272-285),
               best-checkpoint by the held-out transfer proxy.
* ``l2f``      the flagship run.  TPU-first design (no reference analog
               translates): the policy phase runs ``--policy-windows``
               recorded windows on the FULL struct problem WITHOUT
               applying fixes in between -- confidence streaks accumulate
               across windows exactly like train/l2f._policy_phase, but
               no fix event means no O(seconds) host Schur
               refactorization per window (ops/struct_ginv) and the
               trajectories the net sees stay closest to the plain
               trajectories it was trained on.  Then ONE host-side
               fix+compact event restricts the COO to the surviving free
               columns and live rows (the same reduction algebra as
               core/lp.compact, reference :1124-1335) and re-emerges as
               a small DENSE bf16 problem -- at the post-fix size the
               dense MXU path beats every sparse form (STATUS r4 8b) --
               whose Woodbury inverse is a seconds-scale host Cholesky.
               The residual solve runs windowed at the tail rho schedule
               (``--tail-rho``), and the final rounding + incumbent are
               scattered back and re-checked on the ORIGINAL problem
               (feasibility + objective vs the f64 CPU oracle).

Run inside scripts/tpu_session.py to share the compile cache.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, "bench_cache")


# --------------------------------------------------------------------
# instance + dataset caching
# --------------------------------------------------------------------

def inst_path(n_items, n_bids, seed):
    if seed == "bench":
        # the canonical ladder instance (bench_sparse_rung.get_instances
        # batch=1 file; regenerating uses the same fixed seed)
        return os.path.join(CACHE, f"ca_coo_{n_items}_{n_bids}_1.npz")
    return os.path.join(CACHE, f"ca_coo_{n_items}_{n_bids}_s{seed}.npz")


def get_instance(n_items, n_bids, seed):
    """One cached COO instance (price, (rows, cols, vals, shape))."""
    os.makedirs(CACHE, exist_ok=True)
    path = inst_path(n_items, n_bids, seed)
    if os.path.exists(path):
        z = np.load(path, allow_pickle=False)
        return (z["p0"], (z["r0"], z["c0"], z["v0"], tuple(z["s0"])))
    from lpbox_admm_tpu.adapters import ca
    rs = 2207 + n_bids if seed == "bench" else int(seed)
    rng = np.random.RandomState(rs)
    t0 = time.time()
    p, coo = ca.generate_cauction(rng, n_items=n_items, n_bids=n_bids,
                                  return_coo=True)
    print(f"  gen seed={seed} ({time.time()-t0:.0f}s)", flush=True)
    r, c, v, s = coo
    np.savez(path, p0=p, r0=r, c0=c, v0=v, s0=np.asarray(s))
    return (p, coo)


def ds_path(n_items, n_bids, seed):
    return os.path.join(CACHE, f"megads_{n_items}_{n_bids}_s{seed}.npz")


# --------------------------------------------------------------------
# struct problem + Schur inverse (one instance, B=1)
# --------------------------------------------------------------------

def build_struct(inst, width_cap=12):
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.ops.struct_ginv import build_struct_ginv
    prob, row_maps = ca.make_struct_problem([inst], width_cap=width_cap)
    p, (r, c, v, shape) = inst
    coos = [(r, c, v)]
    shp = [tuple(shape)]
    E = prob.E
    ginv = build_struct_ginv(coos, shp, row_maps, E.m1, E.m2, prob.n,
                             ratio=2.0)
    return prob, ginv, row_maps


# --------------------------------------------------------------------
# policy scoring helpers (host-driven streaks, device scoring)
# --------------------------------------------------------------------

def make_scorer(ckpt):
    """Load a chunk-mode MHA policy checkpoint -> (jitted scorer, pcfg)."""
    import jax
    from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import l2f
    from lpbox_admm_tpu.train.imitation import PolicyTrainer

    pcfg = PolicyConfig(net="mha")
    model = build_policy("mha")
    trainer = PolicyTrainer(model, pcfg, LP_CONFIG, ws=100)
    ts = trainer.load(ckpt)
    variables = trainer.variables(ts)

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def score(rows):
        return l2f.policy_scores(model, variables, rows, pcfg)

    return score, pcfg


def window_decisions(traj, score, ws, conf, fix_windows, n_windows,
                     margins=None):
    """Replay deter_fix_2 + consistency streaks over trajectory windows.

    ``traj``: (n, T) host array.  Returns (vec, sigs): the +1/0/-1 fix
    vector after ``n_windows`` windows and the per-window sigmoids.
    Mirrors train/l2f._policy_phase's streak logic on host.
    """
    import jax.numpy as jnp
    n, T = traj.shape
    assert n_windows * ws <= T, (n_windows, ws, T)
    if margins is None:
        margins = np.full((n,), 1.0 - conf, np.float32)
    streak1 = np.zeros(n, np.int32)
    streak0 = np.zeros(n, np.int32)
    sigs = []
    for w in range(n_windows):
        rows = jnp.asarray(traj[:, w * ws:(w + 1) * ws], jnp.float32)
        sig = np.asarray(score(rows))
        sigs.append(sig)
        conf1 = sig > 1.0 - margins
        conf0 = sig < margins
        streak1 = np.where(conf1, streak1 + 1, 0)
        streak0 = np.where(conf0, streak0 + 1, 0)
    vec = np.where(streak1 >= fix_windows, 1.0,
                   np.where(streak0 >= fix_windows, 0.0, -1.0))
    return vec.astype(np.float32), sigs


def transfer_report(vec, labels, b, oracle_obj, tag=""):
    """Fix volume / errors / |b|-weighted error mass of a decision vec."""
    fixed = vec >= 0.0
    val = np.clip(vec, 0.0, 1.0)
    err = fixed & (val != labels)
    err_mass = float(np.abs(b[err]).sum())
    print(f"  {tag}: fixed {int(fixed.sum())}/{len(vec)} "
          f"errors {int(err.sum())} "
          f"(1->0 {int((err & (labels == 1)).sum())}, "
          f"0->1 {int((err & (labels == 0)).sum())}) "
          f"err |b| mass {err_mass:.1f} = "
          f"{err_mass / abs(oracle_obj):+.3%} of |oracle|", flush=True)
    return int(fixed.sum()), int(err.sum()), err_mass


# --------------------------------------------------------------------
# host-side fix + compact (struct -> reduced dense)
# --------------------------------------------------------------------

def host_fix_compact(state, prob, inst, row_map, vec, cfg_tail,
                     align=512, e_dtype="bfloat16"):
    """Apply the fix vector and physically shrink to a dense problem.

    The reduction algebra is core/lp.compact's (itself the reference's
    physical shrink, :1124-1335): free columns gathered, rows with no
    free support dropped (their feasibility is re-checked on the
    original problem at reporting), f_eff = f - E @ (fixed * val), the
    fixed objective mass accumulated into sum_fix_obj.  Departures, all
    host-side because the fix event is already a host round-trip point:

    * the reduced E is assembled DENSE from the restricted COO -- at the
      post-fix size the MXU streaming path beats every sparse layout
      (STATUS r4 8b: dense wins whenever E fits HBM);
    * the reduced Woodbury inverse is a host f64 Cholesky of the sparse
      Gram (seconds at m~6k; the remote XLA compiler has failed on
      large cholesky programs);
    * m-side state (y3, z4) is gathered through ``row_map`` because the
      struct layout reorders rows ([item | dummy] blocks).

    Returns (state_red, prob_red, free_cols, kept_rows, carry) where
    ``carry`` holds the full-width fixing snapshot for reassembly.
    """
    import jax.numpy as jnp
    import scipy.sparse as sp
    from scipy.linalg import cho_factor, cho_solve
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.core.problem import LpProblem

    p, (r, c, v, shape) = inst
    m_orig, n_valid = int(shape[0]), int(shape[1])
    b_orig = -np.asarray(p, np.float64)      # prices negate (make_problem)

    st = {k: np.asarray(getattr(state, k))
          for k in ("x", "y1", "y2", "y3", "z1", "z2", "z4", "free",
                    "fixed_val", "sum_fix_obj", "obj_ring", "obj_count",
                    "it", "cur_obj", "best_bin_obj", "best_sol",
                    "x_prev", "fix_count")}
    free_old = st["free"][0, :n_valid]
    vecv = vec[:n_valid]
    newly = free_old & (vecv >= 0.0)
    val = np.clip(vecv, 0.0, 1.0)
    free_new = free_old & ~newly
    # total fixing snapshot: prior fixes (if any) + this event's
    fixed_vals = np.where(newly, val, st["fixed_val"][0, :n_valid])
    fixed_vals = np.where(free_new, 0.0, fixed_vals)
    sum_fix = float(st["sum_fix_obj"][0]) \
        + float((b_orig * val * newly).sum())

    C = sp.csr_matrix((np.asarray(v, np.float64),
                       (np.asarray(r), np.asarray(c))),
                      shape=(m_orig, n_valid))
    f_eff = 1.0 - C @ fixed_vals

    free_cols = np.where(free_new)[0]
    Cc = C[:, free_cols].tocsr()
    kept_rows = np.where(Cc.getnnz(axis=1) > 0)[0]
    Cr = Cc[kept_rows]
    m_v, n_v = Cr.shape

    def rup(x):
        return max(align, -(-x // align) * align)

    m_pad, n_pad = rup(m_v), rup(n_v)
    E = np.zeros((1, m_pad, n_pad), np.float32)
    E[0, :m_v, :n_v] = Cr.toarray()
    b_red = np.zeros((1, n_pad), np.float32)
    b_red[0, :n_v] = b_orig[free_cols]
    f_red = np.ones((1, m_pad), np.float32)
    f_red[0, :m_v] = f_eff[kept_rows]
    vmask = np.zeros((1, n_pad), bool)
    vmask[0, :n_v] = True
    rmask = np.zeros((1, m_pad), bool)
    rmask[0, :m_v] = True

    # reduced Woodbury inverse: host sparse Gram + f64 Cholesky
    G = (Cr @ Cr.T).toarray()
    Gs = G + 2.0 * np.eye(m_v)               # ratio = (rho1+rho2)/rho4
    gi = cho_solve(cho_factor(Gs, lower=True), np.eye(m_v))
    ginv = np.zeros((1, m_pad, m_pad), np.float32)
    ginv[0, :m_v, :m_v] = gi.astype(np.float32)

    edt = jnp.bfloat16 if e_dtype == "bfloat16" else jnp.float32
    prob_red = LpProblem(b=jnp.asarray(b_red),
                         E=jnp.asarray(E, edt),
                         f=jnp.asarray(f_red),
                         row_mask=jnp.asarray(rmask),
                         var_mask=jnp.asarray(vmask))

    def gn(a, fill=0.0):                      # n-side gather + pad
        out = np.full((1, n_pad), fill, np.float32)
        out[0, :n_v] = a[0, free_cols]
        return jnp.asarray(out)

    # m-side: struct layout reorders rows; kept_rows are ORIGINAL ids
    srows = row_map[kept_rows]

    def gm(a, fill=0.0):
        out = np.full((1, m_pad), fill, np.float32)
        out[0, :m_v] = a[0, srows]
        return jnp.asarray(out)

    x_red = gn(st["x"])
    ex = jnp.einsum("bmn,bn->bm", jnp.asarray(E), x_red,
                    preferred_element_type=jnp.float32)
    dtf = np.float32
    state_red = lp.LpState(
        x=x_red, y1=gn(st["y1"]), y2=gn(st["y2"]), y3=gm(st["y3"]),
        z1=gn(st["z1"]), z2=gn(st["z2"]), z4=gm(st["z4"]),
        free=jnp.asarray(vmask),
        fixed_val=jnp.zeros((1, n_pad), dtf),
        f_eff=jnp.asarray(f_red),
        sum_fix_obj=jnp.asarray(np.array([sum_fix], dtf)),
        obj_ring=jnp.asarray(st["obj_ring"].astype(dtf)),
        obj_count=jnp.asarray(st["obj_count"]),
        it=jnp.asarray(np.int32(st["it"])),
        done=jnp.zeros((1,), bool),
        cg_fail=jnp.zeros((1,), bool),
        cur_obj=jnp.asarray(st["cur_obj"].astype(dtf)),
        best_bin_obj=jnp.asarray(st["best_bin_obj"].astype(dtf)),
        best_sol=gn(st["best_sol"]), x_prev=gn(st["x_prev"]),
        fix_count=jnp.asarray(np.zeros((1, n_pad), np.int32)),
        ex=ex,
        ginv=jnp.asarray(ginv),
        et_next=jnp.zeros((1, n_pad), dtf),
    )
    state_red = lp.refresh_et_next(state_red, prob_red, cfg_tail)
    carry = {"free_cols": free_cols, "fixed_vals": fixed_vals,
             "free_new": free_new, "C": C, "b_orig": b_orig,
             "n_valid": n_valid}
    return state_red, prob_red, carry


def report_full(state_red, carry, oracle=None, repair_rounds=0):
    """Scatter last + incumbent to full width and select on the ORIGINAL
    problem (host COO mirror of core/lp.select_solution, equal
    semantics to the plain ladder rows)."""
    from lpbox_admm_tpu.core import lp

    n_valid = carry["n_valid"]
    free_cols = carry["free_cols"]
    cands = []
    for sol_red in (np.asarray(lp.solution(state_red))[0],
                    np.asarray(lp.solution_best(state_red))[0]):
        full = carry["fixed_vals"].copy()
        full[free_cols] = sol_red[:len(free_cols)]
        cands.append(full[:n_valid])
    C, b = carry["C"], carry["b_orig"]
    objs = [float(b @ s) for s in cands]
    viol = [int(((C @ s) > 1.0 + 1e-6).sum()) for s in cands]
    use_best = viol[1] == 0 and (objs[1] <= objs[0] or viol[0] > 0)
    k = 1 if use_best else 0
    out = {"obj": objs[k], "infeasible": viol[k],
           "n_fixed": int((~carry["free_new"]).sum())}
    if oracle is not None:
        out["gap"] = (objs[k] - oracle) / abs(oracle)
    return out


# --------------------------------------------------------------------
# phases
# --------------------------------------------------------------------

def phase_labels(args, seeds):
    import jax
    import functools
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp

    cfg = LP_CONFIG.replace(linsolve="woodbury")
    if args.rho_step:
        cfg = cfg.replace(rho_change_step=args.rho_step)

    @functools.partial(jax.jit, static_argnames=("c", "w", "rec", "skip"))
    def win(s, p, c, w, rec, skip=None):
        return lp.solve_window(s, p, c, w, record=rec, skip_cvg_at=skip)

    for seed in seeds:
        out = ds_path(args.n_items, args.n_bids, seed)
        if os.path.exists(out) and not args.force:
            print(f"labels seed={seed}: cached", flush=True)
            continue
        inst = get_instance(args.n_items, args.n_bids, seed)
        t0 = time.time()
        prob, ginv, row_maps = build_struct(inst, args.width_cap)
        print(f"labels seed={seed}: struct+schur built "
              f"{time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        state = lp.init_state(prob, cfg, ginv=ginv)
        state, traj = win(state, prob, cfg, args.record, True, 0)
        n_valid = int(np.asarray(prob.var_mask).sum())
        traj_h = np.asarray(traj)[0, :n_valid, :].astype(np.float16)
        it = int(np.asarray(state.it))
        while it < args.cap and not bool(np.asarray(state.done).all()):
            state, _ = win(state, prob, cfg, args.window, False)
            it = int(np.asarray(state.it))
        sol, obj, infeas = lp.select_solution(
            prob, lp.solution(state), lp.solution_best(state))
        wall = time.time() - t0
        labels = np.asarray(sol)[0, :n_valid].astype(np.uint8)
        b = np.asarray(prob.b)[0, :n_valid]
        np.savez(out, traj=traj_h, labels=labels, b=b,
                 obj=np.float64(np.asarray(obj)[0]),
                 infeas=np.int32(np.asarray(infeas)[0]),
                 iters=np.int32(it), wall=np.float64(wall))
        print(f"labels seed={seed}: obj {float(np.asarray(obj)[0]):.1f} "
              f"infeas {int(np.asarray(infeas)[0])} iters {it} "
              f"wall {wall:.1f}s -> {out}", flush=True)


def gate_margins(b, conf, damage_gate):
    """Risk-calibrated per-variable margins (train/l2f.fix_margins on
    host): the 1-C margin tightens with the bid's |b| percentile rank."""
    n = len(b)
    margins = np.full((n,), 1.0 - conf, np.float32)
    if damage_gate > 0:
        rank = np.argsort(np.argsort(np.abs(b))) / max(n - 1, 1)
        margins *= (1.0 - damage_gate * rank.astype(np.float32))
    return margins


def phase_transfer(args, seeds):
    score, _ = make_scorer(args.ckpt)
    for seed in seeds:
        z = np.load(ds_path(args.n_items, args.n_bids, seed))
        traj = z["traj"].astype(np.float32)
        labels, b, obj = z["labels"], z["b"], float(z["obj"])
        print(f"transfer seed={seed} (oracle obj {obj:.1f}, "
              f"{traj.shape[1]} recorded iters):", flush=True)
        for conf in args.conf_grid:
            margins = gate_margins(b, conf, args.damage_gate)
            vec, _ = window_decisions(traj, score, args.ws, conf,
                                      args.fix_windows,
                                      args.policy_windows,
                                      margins=margins)
            transfer_report(vec, labels, b, obj,
                            tag=f"C={conf} fw={args.fix_windows} "
                                f"w={args.policy_windows} "
                                f"dg={args.damage_gate}")


def phase_train(args, seeds):
    import jax
    import jax.numpy as jnp
    from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import l2f
    from lpbox_admm_tpu.train.imitation import (PolicyTrainer,
                                                TrajectoryDataset)

    holdout = args.holdout
    train_seeds = [s for s in seeds if s != holdout]
    pcfg = PolicyConfig(net="mha", lr=args.lr)
    model = build_policy("mha")
    trainer = PolicyTrainer(model, pcfg, LP_CONFIG, ws=args.ws,
                            save_dir=args.save_dir)

    def load_ds(seed):
        z = np.load(ds_path(args.n_items, args.n_bids, seed))
        traj = jnp.asarray(z["traj"].astype(np.float32))[None]
        return TrajectoryDataset(
            traj=traj, labels=jnp.asarray(z["labels"].astype(np.float32))[None],
            var_mask=jnp.ones(traj.shape[:2], bool),
            oracle_obj=jnp.asarray([float(z["obj"])]),
            oracle_iters=jnp.asarray(int(z["iters"]))), z

    datasets = [load_ds(s)[0] for s in train_seeds]
    n_eps = min(args.episodes, datasets[0].traj.shape[-1] // args.ws)
    hz = np.load(ds_path(args.n_items, args.n_bids, holdout))
    htraj = hz["traj"].astype(np.float32)
    hlab, hb, hobj = hz["labels"], hz["b"], float(hz["obj"])

    if args.init_ckpt:
        ts = trainer.load(args.init_ckpt)
        print(f"init from {args.init_ckpt}", flush=True)
    else:
        rng = jax.random.PRNGKey(args.seed_rng)
        sample = jnp.zeros((2, pcfg.node_size, pcfg.chunk_dim))
        ts = trainer.init(rng, sample)

    import functools

    def proxy(ts):
        variables = trainer.variables(ts)

        @functools.partial(jax.jit)
        def score(rows):
            return l2f.policy_scores(model, variables, rows, pcfg)

        vec, _ = window_decisions(htraj, score, args.ws, args.conf,
                                  args.fix_windows, args.policy_windows)
        nf, ne, mass = transfer_report(vec, hlab, hb, hobj, tag="holdout")
        # proxy objective: |b| mass of wrong fixes, plus a penalty when
        # fix volume drops below the target fraction (fixing too little
        # destroys the speedup the whole exercise exists for)
        frac = nf / len(vec)
        return mass / abs(hobj) + 0.05 * max(0.0, args.target_frac - frac)

    best = (np.inf, -1)
    for epoch in range(args.epochs):
        ts, loss = trainer.train_epoch(ts, datasets, n_episodes=n_eps)
        p = proxy(ts)
        print(f"epoch {epoch}: loss {loss:.5f} proxy {p:.5f}", flush=True)
        trainer.save(ts, epoch)
        if p < best[0]:
            best = (p, epoch)
            trainer.save(ts, epoch, best=True)
    print(f"best epoch {best[1]} proxy {best[0]:.5f} -> "
          f"{args.save_dir}/checkpoint/best_checkpoint.npz", flush=True)


def phase_l2f(args, seeds):
    import jax
    import functools
    import jax.numpy as jnp
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp

    cfg_pol = LP_CONFIG.replace(linsolve="woodbury")
    if args.rho_step:
        cfg_pol = cfg_pol.replace(rho_change_step=args.rho_step)
    cfg_tail = cfg_pol.replace(rho_change_step=args.tail_rho) \
        if args.tail_rho else cfg_pol
    score, _ = make_scorer(args.ckpt)

    @functools.partial(jax.jit, static_argnames=("c", "w", "rec", "skip"))
    def win(s, p, c, w, rec, skip=None):
        return lp.solve_window(s, p, c, w, record=rec, skip_cvg_at=skip)

    seed = seeds[0]
    inst = get_instance(args.n_items, args.n_bids, seed)
    orc = None
    opath = os.path.join(CACHE,
                         f"cpu_oracle_{args.n_items}_{args.n_bids}.json")
    if os.path.exists(opath) and seed == "bench":
        with open(opath) as f:
            orc = json.load(f)["obj"]
    lpath = ds_path(args.n_items, args.n_bids, seed)
    plain = dict(np.load(lpath)) if os.path.exists(lpath) else None

    t0 = time.time()
    prob, ginv, row_maps = build_struct(inst, args.width_cap)
    n_valid = int(np.asarray(prob.var_mask).sum())
    build_s = time.time() - t0
    print(f"struct+schur built {build_s:.1f}s (n={n_valid})", flush=True)

    if args.perturb is not None:
        pr = np.random.RandomState(args.perturb)
        noise = 1.0 + 1e-6 * pr.rand(*prob.b.shape).astype(np.float32)
        prob = prob._replace(b=prob.b * jnp.asarray(noise))

    margins = np.full((n_valid,), 1.0 - args.conf, np.float32)
    if args.damage_gate > 0:
        b_h = np.asarray(prob.b)[0, :n_valid]
        rank = np.argsort(np.argsort(np.abs(b_h))) / max(n_valid - 1, 1)
        margins *= (1.0 - args.damage_gate * rank.astype(np.float32))

    t0 = time.time()
    state = lp.init_state(prob, cfg_pol, ginv=ginv)
    streak1 = np.zeros(n_valid, np.int32)
    streak0 = np.zeros(n_valid, np.int32)
    for w in range(args.policy_windows):
        state, traj = win(state, prob, cfg_pol, args.ws, True,
                          0 if w == 0 else None)
        sig = np.asarray(score(traj[0, :n_valid, :]))
        conf1 = sig > 1.0 - margins
        conf0 = sig < margins
        streak1 = np.where(conf1, streak1 + 1, 0)
        streak0 = np.where(conf0, streak0 + 1, 0)
    vec = np.where(streak1 >= args.fix_windows, 1.0,
                   np.where(streak0 >= args.fix_windows, 0.0,
                            -1.0)).astype(np.float32)
    policy_s = time.time() - t0
    print(f"policy phase: {args.policy_windows}x{args.ws} iters + "
          f"scoring in {policy_s:.1f}s; decided "
          f"{int((vec >= 0).sum())}/{n_valid}", flush=True)

    t0 = time.time()
    state_red, prob_red, carry = host_fix_compact(
        state, prob, inst, row_maps[0], vec, cfg_tail,
        e_dtype=args.e_dtype)
    compact_s = time.time() - t0
    print(f"fix+compact: n {n_valid}->{len(carry['free_cols'])} "
          f"m {inst[1][3][0]}->{np.asarray(prob_red.row_mask).sum()} "
          f"(padded {prob_red.E.shape}) in {compact_s:.1f}s", flush=True)

    t0 = time.time()
    it = int(np.asarray(state_red.it))
    while it < args.cap and not bool(np.asarray(state_red.done).all()):
        state_red, _ = win(state_red, prob_red, cfg_tail, args.window,
                           False)
        it = int(np.asarray(state_red.it))
    tail_s = time.time() - t0
    out = report_full(state_red, carry, oracle=orc)
    total = policy_s + compact_s + tail_s
    gap = f" gap {out['gap']:+.2%}" if "gap" in out else ""
    pgap = ""
    if plain is not None:
        pgap = (f" vs plain obj {float(plain['obj']):.1f} "
                f"({float(plain['wall']):.1f}s struct wall)")
    print(f"L2F {args.n_items}x{args.n_bids} seed={seed}: "
          f"wall {total:.1f}s (policy {policy_s:.1f} + compact "
          f"{compact_s:.1f} + tail {tail_s:.1f}; struct build "
          f"{build_s:.1f}s extra) it {it} obj {out['obj']:.1f}{gap} "
          f"infeas {out['infeasible']} fixed {out['n_fixed']}{pgap}",
          flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["gen", "labels", "transfer", "train", "l2f"])
    ap.add_argument("--rung", default="1000x100000")
    ap.add_argument("--seeds", default="bench")
    ap.add_argument("--width-cap", type=int, default=12)
    ap.add_argument("--record", type=int, default=500,
                    help="recorded iterations (labels phase)")
    ap.add_argument("--cap", type=int, default=20000)
    ap.add_argument("--window", type=int, default=500)
    ap.add_argument("--rho-step", type=int, default=None,
                    help="policy/labels phase rho_change_step "
                         "(default: reference 25)")
    ap.add_argument("--tail-rho", type=int, default=12,
                    help="residual-phase rho_change_step (l2f phase); "
                         "0 keeps the policy schedule")
    ap.add_argument("--ws", type=int, default=100)
    ap.add_argument("--ckpt",
                    default=os.path.join(ROOT, "checkpoints", "ca500_mha",
                                         "checkpoint",
                                         "best_checkpoint.npz"))
    ap.add_argument("--conf", type=float, default=0.98)
    ap.add_argument("--conf-grid", default="0.9,0.98,0.995,0.999")
    ap.add_argument("--fix-windows", type=int, default=2)
    ap.add_argument("--policy-windows", type=int, default=3)
    ap.add_argument("--damage-gate", type=float, default=0.0)
    ap.add_argument("--e-dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--perturb", type=int, default=None)
    ap.add_argument("--force", action="store_true")
    # train phase
    ap.add_argument("--holdout", default=None)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--episodes", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed-rng", type=int, default=0)
    ap.add_argument("--init-ckpt", default=None)
    ap.add_argument("--target-frac", type=float, default=0.6)
    ap.add_argument("--save-dir",
                    default=os.path.join(ROOT, "checkpoints_r5",
                                         "mega_mha"))
    args = ap.parse_args()
    args.n_items, args.n_bids = map(int, args.rung.split("x"))
    args.conf_grid = [float(c) for c in args.conf_grid.split(",")]
    seeds = args.seeds.split(",")

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    print(f"backend: {jax.default_backend()}", flush=True)

    if args.phase == "gen":
        for s in seeds:
            get_instance(args.n_items, args.n_bids, s)
    elif args.phase == "labels":
        phase_labels(args, seeds)
    elif args.phase == "transfer":
        phase_transfer(args, seeds)
    elif args.phase == "train":
        if args.holdout is None:
            args.holdout = seeds[-1]
        phase_train(args, seeds)
    elif args.phase == "l2f":
        phase_l2f(args, seeds)


if __name__ == "__main__":
    main()
