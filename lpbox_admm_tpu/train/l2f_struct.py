"""Struct-path learned early fixing at the very-large CA rungs.

The package form of the flagship pipeline (reference
``ADMM_lp_iters_l2f``, cython_solver/LPboxADMMsolver.cpp:1098-1574)
for the struct+Schur problems of ops/ca_sparse + ops/struct_ginv:

1. POLICY PHASE (``struct_policy_vec``): recorded ws-iteration windows
   on the FULL struct problem with deter_fix_2 confidence streaks
   accumulating across windows (train/l2f semantics) and NO fix events
   in between -- no per-window host Schur refactorization, and the
   trajectories the net scores stay closest to the plain trajectories
   it was trained on.
2. ONE host-side fix+compact (``host_fix_compact``): the reduction
   algebra of core/lp.compact (reference :1124-1335) restricted to the
   surviving free columns and live rows, re-emerging as a reduced
   DENSE bf16 problem (the MXU-fast form at post-fix size, STATUS r4
   8b) whose E is assembled ON DEVICE from the reduced COO and whose
   Woodbury inverse keeps the [item | dummy] Schur block structure
   (dummy supports stay disjoint under column restriction).
3. Residual windows at the tail rho schedule, then ``report_full``:
   last rounding + incumbent scattered to full width and re-selected
   on the ORIGINAL problem (host COO mirror of core/lp.select_solution
   -- equal reporting semantics to the plain ladder rows).

Measured (driver: scripts/mega_l2f.py; TPU v5e, warm): (1000,1e5)
3.8 s at +0.02% vs the f64 CPU oracle; (2000,2e5) 11.8 s at +0.02%;
(2000,5e5) 39.0 s at +0.04%; (2000,1e6) 96.3 s at +0.31% -- all
0 infeasible, vs plain struct walls of 41.8/595.8/866.6/1870.8 s.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

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


def gate_margins(b, conf, damage_gate):
    """Risk-calibrated per-variable margins (train/l2f.fix_margins on
    host): the 1-C margin tightens with the bid's |b| percentile rank."""
    n = len(b)
    margins = np.full((n,), 1.0 - conf, np.float32)
    if damage_gate > 0:
        rank = np.argsort(np.argsort(np.abs(b))) / max(n - 1, 1)
        margins *= (1.0 - damage_gate * rank.astype(np.float32))
    return margins


_SCATTER = None


def _scatter_rows(rows, cols, vals, shape, dt):
    """Assemble the reduced dense E ON DEVICE from its COO triplets:
    ~100k-entry upload instead of the 150-300 MB dense tensor through
    the axon tunnel (the make_dense_bf16_problem pattern, adapters/ca).
    Duplicate-free COO, so .add == .set with zero padding harmless.
    Module-level jit (nnz is bucketed so the cache key is stable)."""
    global _SCATTER
    if _SCATTER is None:
        import functools
        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnames=("shape", "dt"))
        def scat(rows, cols, vals, shape, dt):
            return jnp.zeros(shape, dt).at[0, rows, cols].add(
                vals.astype(dt))

        _SCATTER = scat
    return _SCATTER(rows, cols, vals, shape=shape, dt=dt)


def host_fix_compact(state, prob, inst, row_map, vec, cfg_tail,
                     align=512, e_dtype="bfloat16", m1_full=None,
                     timings=None):
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
    * the reduced Woodbury inverse: with ``m1_full`` (the full struct
      E's item-block size) the dummy rows -- still support-DISJOINT
      after dropping columns -- give a diagonal dummy Gram block, so
      the reduced G^-1 ships as a Schur-structured ``StructGinv``
      (ops/struct_ginv) whose host build is an (m1, m1) Cholesky in
      ~a second instead of the dense (m, m) one (measured 20-30 s at
      the (2000, 2e5) rung's m~6.4k); rows are laid out
      [kept items | pad | kept dummies | pad].  Without ``m1_full`` it
      falls back to the dense f64 Cholesky;
    * m-side state (y3, z4) is gathered through ``row_map`` because the
      struct layout reorders rows ([item | dummy] blocks).

    Returns (state_red, prob_red, free_cols, kept_rows, carry) where
    ``carry`` holds the full-width fixing snapshot for reassembly.
    """
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from scipy.linalg import cho_factor, cho_solve
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.core.problem import LpProblem

    tmark = [time.time()]

    def mark(key):
        if timings is not None:
            now = time.time()
            timings[key] = timings.get(key, 0.0) + now - tmark[0]
            tmark[0] = now

    p, (r, c, v, shape) = inst
    m_orig, n_valid = int(shape[0]), int(shape[1])
    b_orig = -np.asarray(p, np.float64)      # prices negate (make_problem)

    keys = ("x", "y1", "y2", "y3", "z1", "z2", "z4", "free",
            "fixed_val", "sum_fix_obj", "obj_ring", "obj_count",
            "it", "done", "cur_obj", "best_bin_obj", "best_sol",
            "x_prev", "fix_count")
    # ONE batched fetch: per-array np.asarray pays an axon tunnel round
    # trip each (measured seconds at the 2e5 rung)
    vals = jax.device_get([getattr(state, k) for k in keys])
    st = dict(zip(keys, vals))
    mark("fetch_s")
    free_old = st["free"][0, :n_valid]
    vecv = vec[:n_valid]
    # active gate mirrors core apply_fix: a converged instance fixes
    # nothing further
    newly = free_old & (vecv >= 0.0) & (not bool(st["done"][0]))
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

    mark("scipy_s")
    ratio = lp._wb_ratio(cfg_tail)
    free_cols = np.where(free_new)[0]
    Cc = C[:, free_cols].tocsr()
    kept_rows = np.where(Cc.getnnz(axis=1) > 0)[0]

    def rup(x):
        return max(align, -(-x // align) * align)

    if m1_full is not None:
        # Schur route: keep the [item | dummy] block structure.  Item
        # rows are those the full struct layout classified into its
        # item block; kept rows reorder to [items, dummies] with each
        # block padded, so the reduced G^-1 is a StructGinv.
        is_item = row_map[kept_rows] < m1_full
        kept_rows = np.concatenate([kept_rows[is_item],
                                    kept_rows[~is_item]])
        ik, dk = int(is_item.sum()), int((~is_item).sum())
        m1p, m2p = rup(ik), rup(dk)
        m_pad = m1p + m2p
        pos = np.concatenate([np.arange(ik), m1p + np.arange(dk)])
    else:
        ik = dk = m1p = m2p = 0
        m_pad = rup(len(kept_rows))
        pos = np.arange(len(kept_rows))

    Cr = Cc[kept_rows]
    m_v, n_v = Cr.shape
    n_pad = rup(n_v)
    edt = jnp.bfloat16 if e_dtype == "bfloat16" else jnp.float32
    e_bytes = m_pad * n_pad * (2 if edt == jnp.bfloat16 else 4)
    if e_bytes > 7e9:
        # the reduced dense form must fit HBM next to the full struct
        # problem (measured OOM: a low-fix-volume policy at the 1e6
        # rung left n_red ~ 1.3e5 -> a ~10 GB E).  Fail with the
        # remedy instead of a ResourceExhausted mid-upload.
        raise ValueError(
            f"reduced dense E would be {e_bytes/1e9:.1f} GB "
            f"({m_pad}x{n_pad}); the policy fixed too few variables "
            f"for the dense residual form -- raise fix volume (more "
            f"policy windows / lower confidence) or continue masked "
            f"on the struct problem")
    coo_r = Cr.tocoo()
    nnz_pad = -(-coo_r.nnz // 16384) * 16384     # bucket the compile
    er = np.zeros(nnz_pad, np.int32)
    ec = np.zeros(nnz_pad, np.int32)
    ev = np.zeros(nnz_pad, np.float32)
    er[:coo_r.nnz] = pos[coo_r.row]
    ec[:coo_r.nnz] = coo_r.col
    ev[:coo_r.nnz] = coo_r.data
    E_dev = _scatter_rows(
        jnp.asarray(er), jnp.asarray(ec), jnp.asarray(ev),
        shape=(1, m_pad, n_pad), dt=edt)
    b_red = np.zeros((1, n_pad), np.float32)
    b_red[0, :n_v] = b_orig[free_cols]
    f_red = np.ones((1, m_pad), np.float32)
    f_red[0, pos] = f_eff[kept_rows]
    vmask = np.zeros((1, n_pad), bool)
    vmask[0, :n_v] = True
    rmask = np.zeros((1, m_pad), bool)
    rmask[0, pos] = True
    mark("assemble_s")

    if m1_full is not None:
        # reduced Schur inverse (ops/struct_ginv algebra at the reduced
        # size): D diagonal because dummy supports stay disjoint under
        # column restriction
        from lpbox_admm_tpu.ops.struct_ginv import StructGinv
        C1, C2 = Cr[:ik], Cr[ik:]
        G22 = (C2 @ C2.T).tocoo()
        off = G22.row != G22.col
        assert not np.any(np.abs(G22.data[off]) > 0), \
            "reduced dummy rows are not support-disjoint"
        d = np.full(m2p, ratio, np.float64)
        d[G22.row[~off]] += G22.data[~off]
        Bm = np.zeros((m1p, m2p), np.float64)
        Bm[:ik, :dk] = (C1 @ C2.T).toarray()
        A = np.full(m1p, ratio, np.float64) * np.eye(m1p)
        A[:ik, :ik] += (C1 @ C1.T).toarray()
        S = A - (Bm / d[None, :]) @ Bm.T
        sinv = cho_solve(cho_factor(S, lower=True), np.eye(m1p))
        ginv = StructGinv(
            sinv=jnp.asarray(sinv.astype(np.float32))[None],
            b12=jnp.asarray(Bm.astype(np.float32))[None],
            dinv=jnp.asarray((1.0 / d).astype(np.float32))[None])
    else:
        # dense fallback: host sparse Gram + f64 Cholesky
        G = (Cr @ Cr.T).toarray()
        Gs = G + ratio * np.eye(m_v)
        gi = cho_solve(cho_factor(Gs, lower=True), np.eye(m_v))
        gpad = np.zeros((1, m_pad, m_pad), np.float32)
        gpad[0, :m_v, :m_v] = gi.astype(np.float32)
        ginv = jnp.asarray(gpad)
    mark("ginv_s")

    prob_red = LpProblem(b=jnp.asarray(b_red),
                         E=E_dev,
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
        out[0, pos] = a[0, srows]
        return jnp.asarray(out)

    x_red = gn(st["x"])
    # ex = E_red @ x_red from the COO on host: a device einsum would
    # materialize an f32 copy of E (8 GB at the 1e6 rung)
    ex_np = np.zeros((1, m_pad), np.float32)
    ex_np[0, pos] = (Cr @ st["x"][0, free_cols].astype(
        np.float64)).astype(np.float32)
    ex = jnp.asarray(ex_np)
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
        done=jnp.asarray(st["done"]),   # sticky, as in core compact
        cg_fail=jnp.zeros((1,), bool),
        cur_obj=jnp.asarray(st["cur_obj"].astype(dtf)),
        best_bin_obj=jnp.asarray(st["best_bin_obj"].astype(dtf)),
        best_sol=gn(st["best_sol"]), x_prev=gn(st["x_prev"]),
        fix_count=jnp.asarray(np.zeros((1, n_pad), np.int32)),
        ex=ex,
        ginv=ginv,
        et_next=jnp.zeros((1, n_pad), dtf),
    )
    jax.block_until_ready(state_red.ex)
    mark("upload_s")
    state_red = lp.refresh_et_next(state_red, prob_red, cfg_tail)
    jax.block_until_ready(state_red.et_next)
    mark("refresh_s")
    carry = {"free_cols": free_cols, "fixed_vals": fixed_vals,
             "free_new": free_new, "C": C, "b_orig": b_orig,
             "n_valid": n_valid}
    return state_red, prob_red, carry


def report_full(state_red, carry, oracle=None):
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


_WIN = None


def _get_win():
    """Module-level jitted solve window (one trace cache shared by all
    l2f_solve_struct calls in the process)."""
    global _WIN
    if _WIN is None:
        import functools
        import jax
        from ..core import lp

        @functools.partial(jax.jit, static_argnames=("c", "w", "rec",
                                                     "skip"))
        def win(s, p, c, w, rec, skip=None):
            return lp.solve_window(s, p, c, w, record=rec,
                                   skip_cvg_at=skip)

        _WIN = win
    return _WIN


def l2f_solve_struct(prob, ginv, inst, row_map, score, cfg, *,
                     conf: float = 0.98, fix_windows: int = 2,
                     policy_windows: int = 3, ws: int = 100,
                     tail_rho: Optional[int] = 12, cap: int = 20000,
                     window: Optional[int] = None,
                     damage_gate: float = 0.0,
                     e_dtype: str = "bfloat16",
                     reduced_ginv: str = "schur",
                     oracle_obj: Optional[float] = None,
                     timings: Optional[dict] = None):
    """Full struct-path l2f solve (library form of scripts/mega_l2f's
    l2f phase; see the module docstring for the design).

    ``prob``/``ginv``/``row_map`` come from ca.make_struct_problem +
    ops/struct_ginv.build_struct_ginv (B=1); ``inst`` is the raw
    (price, COO) instance; ``score`` maps (R, ws) trajectory rows to
    sigmoids (e.g. train/l2f.policy_scores under jit, or the pallas /
    fast scorers).  Returns the ``report_full`` dict plus stage walls.
    """
    from ..core import lp

    cfg_tail = cfg if not tail_rho \
        else cfg.replace(rho_change_step=tail_rho)
    win = _get_win()

    n_valid = int(np.asarray(prob.var_mask).sum())
    if window is None:
        # a 500-iteration window dispatch crashed the TPU worker at
        # the (2000,1e6)-class shapes (CLAUDE.md hazard); 100 holds
        window = 100 if prob.n >= 400_000 else 500
    b_h = np.asarray(prob.b)[0, :n_valid]
    margins = gate_margins(b_h, conf, damage_gate)

    import jax

    if timings is None:
        timings = {}
    t0 = time.time()
    state = lp.init_state(prob, cfg, ginv=ginv)
    streak1 = np.zeros(n_valid, np.int32)
    streak0 = np.zeros(n_valid, np.int32)
    for w in range(policy_windows):
        t1 = time.time()
        state, traj = win(state, prob, cfg, ws, True,
                          0 if w == 0 else None)
        jax.block_until_ready(traj)
        timings["win_s"] = timings.get("win_s", 0.0) + time.time() - t1
        t1 = time.time()
        sig = np.asarray(score(traj[0, :n_valid, :]))
        timings["score_s"] = timings.get("score_s", 0.0) \
            + time.time() - t1
        conf1 = sig > 1.0 - margins
        conf0 = sig < margins
        streak1 = np.where(conf1, streak1 + 1, 0)
        streak0 = np.where(conf0, streak0 + 1, 0)
    vec = np.where(streak1 >= fix_windows, 1.0,
                   np.where(streak0 >= fix_windows, 0.0,
                            -1.0)).astype(np.float32)
    policy_s = time.time() - t0

    t0 = time.time()
    state_red, prob_red, carry = host_fix_compact(
        state, prob, inst, row_map, vec, cfg_tail, e_dtype=e_dtype,
        m1_full=prob.E.m1 if reduced_ginv == "schur" else None,
        timings=timings)
    compact_s = time.time() - t0

    t0 = time.time()
    it = int(np.asarray(state_red.it))
    while it < cap and not bool(np.asarray(state_red.done).all()):
        state_red, _ = win(state_red, prob_red, cfg_tail, window,
                           False)
        it = int(np.asarray(state_red.it))
    tail_s = time.time() - t0

    out = report_full(state_red, carry, oracle=oracle_obj)
    out.update(policy_s=policy_s, compact_s=compact_s, tail_s=tail_s,
               iterations=it, decided=int((vec >= 0).sum()),
               n_valid=n_valid, n_red=len(carry["free_cols"]),
               red_shape=tuple(prob_red.E.shape))
    return out
