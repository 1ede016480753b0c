"""Learned-early-fixing inference loop (the framework's core capability).

The reference alternates on the host between C++ solver windows and a
GPU policy (trainer.py:483-597 ``_valid_2``): each round trips
solver -> numpy copy -> GPU -> numpy fix vector -> solver.  Here the
whole alternation is ONE jitted ``lax.while_loop``: the body runs a
``ws``-iteration solver window via ``lax.scan`` (trajectory stays in
device memory), applies the jitted policy to the per-variable trajectory
windows, thresholds into a fix vector (``deter_fix_2``,
trainer.py:101-135), and updates the free masks -- zero host round
trips (SURVEY.md section 7, design delta 4).

Works over both solver cores: the LP core (core/lp.py) and the
segmentation QP core (core/qp.py), which share the
init_state/solve_window/apply_fix API.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import PolicyConfig, SolverConfig
from ..core import general, lp, qp
from ..core.problem import LpProblem

# Scorer backends whose compile failed in this process (the axon remote
# Mosaic helper is flaky; jax does not cache failed compiles, so without
# this memo every l2f call would re-pay the failed compile attempt).
_failed_scorers: set = set()


def traj_to_tokens(rows: jnp.ndarray, pcfg: PolicyConfig) -> jnp.ndarray:
    """(R, ws) trajectory rows -> (R, node_size, chunk_dim) policy tokens.

    * ``chunk`` mode (LP, SparseAttack): contiguous reshape,
      ws = node_size * chunk_dim (LP trainer.py:285).
    * ``sliding`` mode (Segmentation): node_size overlapping windows of
      width chunk_dim, window j = row[j : j+chunk_dim]
      (Seg trainer.py:363-368, 718-725).
    """
    R, ws = rows.shape
    node, chunk = pcfg.node_size, pcfg.chunk_dim
    if pcfg.window_mode == "chunk":
        assert ws == node * chunk, (ws, node, chunk)
        return rows.reshape(R, node, chunk)
    if pcfg.window_mode == "sliding":
        assert node + chunk - 1 <= ws, (ws, node, chunk)
        wins = [rows[:, j:j + chunk] for j in range(node)]
        return jnp.stack(wins, axis=1)
    raise ValueError(f"unknown window_mode {pcfg.window_mode!r}")


def policy_scores(model, variables, rows: jnp.ndarray, pcfg: PolicyConfig,
                  row_chunk: int = 8192) -> jnp.ndarray:
    """Score per-variable trajectory rows (R, ws) -> sigmoids (R,).

    Applied in ``row_chunk`` chunks to bound activation memory,
    mirroring ``_get_fix_vec``'s 10k batching (trainer.py:216-252).
    """
    x = traj_to_tokens(rows, pcfg)
    R = x.shape[0]
    if R <= row_chunk:
        _, sig = model.apply(variables, x, train=False)
        return sig[:, 0]
    pad = (-R) % row_chunk
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    xp = xp.reshape(-1, row_chunk, *x.shape[1:])

    def score(xc):
        _, sig = model.apply(variables, xc, train=False)
        return sig[:, 0]

    sig = jax.lax.map(score, xp).reshape(-1)
    return sig[:R]


def scores_to_vec(sig: jnp.ndarray, confidence: float) -> jnp.ndarray:
    """``deter_fix_2``: sigma > C -> fix 1; sigma < 1-C -> fix 0; else -1
    (trainer.py:101-135)."""
    return jnp.where(sig > confidence, 1.0,
                     jnp.where(sig < 1.0 - confidence, 0.0, -1.0))


def fix_margins(b: jnp.ndarray, var_mask: jnp.ndarray,
                pcfg: PolicyConfig) -> jnp.ndarray:
    """Per-variable confidence margins (B, n): risk-calibrated
    thresholds (PolicyConfig.damage_gate).

    The margin ``1 - C`` shrinks linearly with the variable's
    within-instance |b| percentile rank -- the damage of a locked-in
    wrong fix scales with the bid price, and the objective-gap tail is
    a handful of wrong fixes on load-bearing bids (STATUS r2 issue 1).
    A variable fixes to 1 when ``sigma > 1 - margin_j`` and to 0 when
    ``sigma < margin_j``.
    """
    base = 1.0 - pcfg.fix_confidence
    if pcfg.damage_gate <= 0:
        return jnp.full(b.shape, base, jnp.float32)
    absb = jnp.abs(b)
    order2 = jnp.argsort(jnp.argsort(absb, axis=-1), axis=-1)
    cnt = jnp.maximum(jnp.sum(var_mask, axis=-1, keepdims=True), 2)
    rank = order2.astype(jnp.float32) / (cnt.astype(jnp.float32) - 1.0)
    rank = jnp.clip(rank, 0.0, 1.0)
    # tighten only ranks above the floor (cheap bids keep base C, so
    # fix volume is preserved; see PolicyConfig.damage_rank_floor)
    q = pcfg.damage_rank_floor
    if q > 0:
        rank = jnp.clip((rank - q) / max(1.0 - q, 1e-6), 0.0, 1.0)
    return base * (1.0 - pcfg.damage_gate * rank)


def qp_boundary_margins(x: jnp.ndarray, mask: jnp.ndarray,
                        margins: jnp.ndarray,
                        pcfg: PolicyConfig) -> jnp.ndarray:
    """Boundary-distance damage gate for the seg QP (STATUS r4 plan).

    Tightens the per-pixel confidence margin for pixels within
    ``pcfg.boundary_band`` 8-neighbour hops of a label change in the
    CURRENT rounding of ``x``:  margin_px *= (1 - boundary_gate) inside
    the band.  Recomputed every policy window from the live iterate, so
    the protected band tracks the moving boundary.  See
    PolicyConfig.boundary_gate for the rationale (over-fixing of
    contested band pixels is the measured 1e5-px failure mode)."""
    from ..ops.stencil import OFFSETS, shift as st_shift

    if pcfg.boundary_band <= 0:      # band 0 = gate disabled (ADVICE r4:
        return margins               # band 1 is "exact boundary only")
    dt = x.dtype
    maskb = mask.astype(bool)
    sol = (x >= 0.5).astype(dt) * maskb.astype(dt)
    differs = jnp.zeros(sol.shape, bool)
    for dr, dc in OFFSETS:
        nb = st_shift(sol, dr, dc)
        inb = st_shift(maskb.astype(dt), dr, dc) > 0.5
        differs = differs | (inb & (nb != sol))
    # restrict to in-mask pixels BEFORE dilating: out-of-mask pixels
    # (implicit sol=0) would otherwise flag as "boundary" against any
    # in-mask label-1 neighbour and the dilation would propagate that
    # back into in-mask pixels with no real label change (ADVICE r4)
    differs = differs & maskb
    for _ in range(pcfg.boundary_band - 1):
        wide = differs
        for dr, dc in OFFSETS:
            wide = wide | (st_shift(differs.astype(dt), dr, dc) > 0.5)
        differs = wide & maskb
    return jnp.where(differs, margins * (1.0 - pcfg.boundary_gate),
                     margins)


def _core_of(problem) -> object:
    if isinstance(problem, LpProblem):
        return lp
    if isinstance(problem, (general.GeneralProblem,
                            general.GridGeneralProblem)):
        return general
    return qp


@functools.partial(jax.jit, static_argnames=("model", "cfg", "pcfg", "ws",
                                             "max_iter", "row_chunk"))
def l2f_solve(prob, model, variables, cfg: SolverConfig,
              pcfg: PolicyConfig, ws: int = 100,
              max_iter: Optional[int] = None,
              row_chunk: int = 8192,
              fix_values: Optional[jnp.ndarray] = None):
    """Windowed solve with the policy fixing variables between windows.

    Equivalent of the reference's ``_valid_2`` alternation loop
    (LP trainer.py:516-535) and ``_my_valid`` (Seg trainer.py:707-737),
    dispatching on the problem type (LpProblem -> LP core, QpProblem ->
    grid QP core) with mask-based fixing.

    ``fix_values``: optional oracle-label override (same shape as the
    solution) -- the policy keeps its SELECTION (which variables are
    confidently decided) but the fixed VALUE comes from ``fix_values``
    instead of the sigmoid side.  This is the label-floor experiment
    (VERDICT r4 item 3): it measures the gap a ZERO-fix-error policy of
    identical fix volume would deliver under the same iteration budget
    and reporting protocol, separating label/budget structure from
    policy error.
    """
    core = _core_of(prob)
    if max_iter is None:
        max_iter = cfg.max_iters
    state = core.init_state(prob, cfg)
    B = prob.batch

    def cond(s):
        return jnp.logical_and(s.it < max_iter, ~jnp.all(s.done))

    if pcfg.damage_gate > 0 and isinstance(prob, LpProblem):
        margins = fix_margins(prob.b, prob.var_mask, pcfg)
    elif pcfg.damage_gate > 0 and isinstance(prob, qp.QpProblem):
        # same risk calibration on the grid: a wrong fix on a pixel
        # with strong unary |b| costs more energy
        margins = fix_margins(
            prob.b.reshape(prob.batch, -1),
            prob.mask.reshape(prob.batch, -1), pcfg
        ).reshape(prob.b.shape)
    else:
        margins = jnp.full(prob.b.shape, 1.0 - pcfg.fix_confidence,
                           jnp.float32)

    def body(s):
        s, traj = core.solve_window(s, prob, cfg, ws, record=True)
        var_shape = traj.shape[1:-1]       # (n,) or (H, W)
        rows = traj.reshape(-1, ws)
        sig = policy_scores(model, variables, rows, pcfg, row_chunk)
        sig = sig.reshape((B,) + var_shape)
        m = margins.reshape((B,) + var_shape)
        if pcfg.boundary_gate > 0 and isinstance(prob, qp.QpProblem):
            m = qp_boundary_margins(s.x, prob.mask, m, pcfg)
        if fix_values is not None:
            decided = (sig > 1.0 - m) | (sig < m)
            vec = jnp.where(decided, fix_values, -1.0)
        else:
            vec = jnp.where(sig > 1.0 - m, 1.0,
                            jnp.where(sig < m, 0.0, -1.0))
        if pcfg.traj_fix_thr > 0 and isinstance(prob, qp.QpProblem):
            # trajectory-extremity fixing (PolicyConfig.traj_fix_thr):
            # on the unconstrained grid QP the iterate's extremity is a
            # near-zero-error high-volume fix signal; values come from
            # round(x), not the sigmoid.  Never applied to LP problems
            # (feasibility-unsound there, STATUS r5 item 4e).
            ext = (jnp.abs(s.x - 0.5) > pcfg.traj_fix_thr) & prob.mask
            if pcfg.traj_fix_windows > 0:
                # first fix event happens at it == ws
                ext = ext & (s.it <= pcfg.traj_fix_windows * ws)
            xval = (s.x > 0.5).astype(s.x.dtype)
            if pcfg.traj_fix_only:
                vec = jnp.where(ext, xval, -1.0)
            else:
                vec = jnp.where((vec < 0) & ext, xval, vec)
        s = core.apply_fix(s, prob, vec, cfg)
        return s

    return jax.lax.while_loop(cond, body, state)


@functools.partial(jax.jit, static_argnames=("model", "cfg", "pcfg", "ws",
                                              "row_chunk"))
def _qp_policy_window(state, prob, variables, model, cfg, pcfg, ws,
                      row_chunk, margins):
    """One [grid solver window -> policy -> fix] round (jitted)."""
    state, traj = qp.solve_window(state, prob, cfg, ws, record=True)
    rows = traj.reshape(-1, ws)
    sig = policy_scores(model, variables, rows, pcfg, row_chunk)
    sig = sig.reshape(state.x.shape)
    if pcfg.boundary_gate > 0:
        margins = qp_boundary_margins(state.x, prob.mask, margins, pcfg)
    vec = jnp.where(sig > 1.0 - margins, 1.0,
                    jnp.where(sig < margins, 0.0, -1.0))
    state = qp.apply_fix(state, prob, vec, cfg)
    return state, jnp.max(jnp.sum(state.free, axis=(-2, -1))), \
        jnp.all(state.done)


@functools.partial(jax.jit, static_argnames=("model", "cfg", "pcfg", "ws",
                                              "row_chunk"))
def _flat_policy_window(gstate, gprob, variables, model, cfg, pcfg, ws,
                        row_chunk, margins):
    """Same round on the compacted flat problem (core.general)."""
    gstate, traj = general.solve_window(gstate, gprob, cfg, ws,
                                        record=True)
    rows = traj.reshape(-1, ws)
    sig = policy_scores(model, variables, rows, pcfg, row_chunk)
    sig = sig.reshape(gstate.x.shape)
    vec = jnp.where(sig > 1.0 - margins, 1.0,
                    jnp.where(sig < margins, 0.0, -1.0))
    gstate = general.apply_fix(gstate, gprob, vec, cfg)
    return gstate, jnp.max(jnp.sum(gstate.free, axis=-1)), \
        jnp.all(gstate.done)


_qp_compact_jit = jax.jit(qp.compact,
                          static_argnames=("cfg", "n_new"))
_general_compact_jit = jax.jit(general.compact_sparse,
                               static_argnames=("n_new",))


@jax.jit
def _persist_fix_snapshot(gstate, idx, free_full, fixed_full):
    """Scatter the flat problem's CURRENT fixing state back into the
    full-grid snapshot.  Must run before every re-compaction: slots
    fixed inside the flat problem may not be selected into the smaller
    bucket, and the final reassembly would otherwise fall back to the
    stale snapshot and silently zero their fixed values (bug found by
    the 1e5-px A/B: compact quality collapsed only with recompaction
    enabled)."""
    B = idx.shape[0]
    shp = free_full.shape

    def scat(base_flat, vals):
        return jax.vmap(lambda fb, ib, vb: fb.at[ib].set(vb))(
            base_flat, idx, vals)

    free2 = scat(free_full.reshape(B, -1), gstate.free).reshape(shp)
    fixed2 = scat(fixed_full.reshape(B, -1),
                  gstate.fixed_val).reshape(shp)
    return free2, fixed2


@jax.jit
def _qp_reassemble(gstate, idx, free_full, fixed_full, state0, prob):
    """Scatter the compacted flat state back into a full-grid QpState
    (drop-in for the l2f_solve return value; one dispatch)."""
    B, H, W = free_full.shape
    n = H * W

    def scat(vec_c, base_flat):
        out = jax.vmap(lambda fb, ib, vb: fb.at[ib].set(vb))(
            base_flat, idx, vec_c)
        return out.reshape(B, H, W)

    zeros = jnp.zeros((B, n), gstate.x.dtype)
    free_new = scat(gstate.free, jnp.zeros((B, n), bool))
    fixed_new = scat(gstate.fixed_val, fixed_full.reshape(B, n))
    x_full = scat(gstate.x, zeros)
    best_full = scat(gstate.best_sol, zeros)
    xprev_full = scat(gstate.x_prev, zeros)
    dt = gstate.x.dtype
    b_eff = prob.b + 2.0 * prob.stencil.a_matvec(
        (~free_new).astype(dt) * fixed_new)
    return state0._replace(
        x=x_full, y1=scat(gstate.y1, zeros), y2=scat(gstate.y2, zeros),
        z1=scat(gstate.z1, zeros), z2=scat(gstate.z2, zeros),
        free=free_new, fixed_val=fixed_new, b_eff=b_eff,
        obj_ring=gstate.obj_ring, obj_count=gstate.obj_count,
        it=gstate.it, done=gstate.done,
        cur_obj=gstate.cur_obj, best_bin_obj=gstate.best_bin_obj,
        best_sol=best_full, x_prev=xprev_full,
        fix_count=scat(gstate.fix_count.astype(jnp.int32),
                       jnp.zeros((B, n), jnp.int32)))


def _bucket(count: int, lo: int, hi: int) -> int:
    b = lo
    while b < count:
        b *= 2
    return min(b, hi)


def l2f_solve_compact_qp(prob, model, variables, cfg: SolverConfig,
                         pcfg: PolicyConfig, ws: int = 10,
                         max_iter: Optional[int] = None,
                         min_bucket: int = 1024,
                         recompact: bool = True,
                         row_chunk: int = 8192):
    """Segmentation l2f solve with physical compaction between windows.

    ``l2f_solve`` iterates masked at full grid size forever, so its
    speedup is iteration-count only; the reference's Ma/Mb shrink drops
    the per-iteration cost as pixels fix (Seg LPboxADMMsolver.cpp
    :1048-1057).  This restores that the TPU way (VERDICT r2 item 5):

    1. window 1 runs on the (B, H, W) grid (policy scoring + fixing);
    2. the free pixels are gathered into a flat power-of-two bucket
       with a 9-nnz/row SparseEll A (``qp.compact``) -- ONE host fetch
       decides the static bucket;
    3. later windows run on the compacted problem through
       ``core.general`` (identical update math, verified pointwise in
       tests), re-compacting when the free count halves again;
    4. the final state is scattered back into a full-grid ``QpState``,
       so all reporting (qp.select_solution / l2f_metrics_qp) is
       unchanged.

    ``pcfg.boundary_gate`` applies only to the first (grid) window
    here: the compacted flat problem has no grid structure to read the
    boundary from.  The masked path (``l2f_solve``, the TPU default)
    re-applies it every window.

    Returns the same full-grid QpState as ``l2f_solve``.
    """
    if max_iter is None:
        max_iter = cfg.max_iters
    H, W = prob.grid
    n = H * W
    B = prob.batch
    windows = max(1, max_iter // ws)
    if pcfg.damage_gate > 0:
        margins = fix_margins(prob.b.reshape(B, -1),
                              prob.mask.reshape(B, -1),
                              pcfg).reshape(prob.b.shape)
    else:
        margins = jnp.full(prob.b.shape, 1.0 - pcfg.fix_confidence,
                           jnp.float32)
    state = qp.init_state(prob, cfg)
    state, max_free, all_done = _qp_policy_window(
        state, prob, variables, model, cfg, pcfg, ws, row_chunk,
        margins)
    mf, done0 = jax.device_get((max_free, all_done))
    if windows == 1 or bool(done0):
        return state
    n_b = _bucket(int(mf), min_bucket, n)
    if n_b >= n:
        # nothing to gain; stay on the grid
        for _ in range(windows - 1):
            state, _, all_done = _qp_policy_window(
                state, prob, variables, model, cfg, pcfg, ws,
                row_chunk, margins)
            if bool(jax.device_get(all_done)):
                break
        return state

    state0 = state
    free_full, fixed_full = state.free, state.fixed_val
    gstate, gprob, idx = _qp_compact_jit(state, prob, cfg, n_b)
    margins_c = jnp.take_along_axis(margins.reshape(B, -1), idx,
                                    axis=-1)
    for w in range(1, windows):
        gstate, max_free, all_done = _flat_policy_window(
            gstate, gprob, variables, model, cfg, pcfg, ws, row_chunk,
            margins_c)
        if bool(jax.device_get(all_done)):
            break
        if recompact and w < windows - 1:
            mf = int(jax.device_get(max_free))
            n_b2 = _bucket(mf, min_bucket, n_b)
            if n_b2 <= n_b // 2:
                # persist fixes made inside the current flat problem:
                # their slots may be dropped by the smaller bucket
                free_full, fixed_full = _persist_fix_snapshot(
                    gstate, idx, free_full, fixed_full)
                gstate, gprob, idx2 = _general_compact_jit(
                    gstate, gprob, n_b2)
                idx = jnp.take_along_axis(idx, idx2, axis=-1)
                margins_c = jnp.take_along_axis(margins_c, idx2,
                                                axis=-1)
                n_b = n_b2
    return _qp_reassemble(gstate, idx, free_full, fixed_full, state0,
                          prob)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "iters", "rounds", "band"))
def qp_refine_boundary(state, prob, cfg: SolverConfig,
                       iters: int = 10, rounds: int = 1,
                       band: int = 1):
    """Post-fix refinement window for the seg l2f solve (VERDICT r2
    item 6): re-free the fixed pixels that sit on the current solution
    BOUNDARY (any 8-neighbour labelled differently) -- the band where
    the energy is actually decided and where a locked-in wrong fix
    hurts -- and run ``iters`` more ADMM iterations before rounding.

    Interior pixels (uniform neighbourhoods) stay fixed, so the
    re-freed set is a thin band: the refinement costs a few extra
    masked iterations, not a re-solve.  ``band`` dilates the re-freed
    band to that 8-neighbour radius; ``rounds`` repeats the whole
    re-free + iterate cycle on the MOVED boundary (each round re-reads
    the current solution).  Returns the refined QpState (same
    reporting interface)."""
    from ..ops.stencil import OFFSETS, shift as st_shift

    dt = state.x.dtype

    def one_round(state):
        sol = qp.solution(state) * prob.mask.astype(dt)
        differs = jnp.zeros(sol.shape, bool)
        for dr, dc in OFFSETS:
            nb = st_shift(sol, dr, dc)
            inb = st_shift(prob.mask.astype(dt), dr, dc) > 0.5
            differs = differs | (inb & (nb != sol))
        for _ in range(band - 1):          # dilate to the band radius
            wide = differs
            for dr, dc in OFFSETS:
                wide = wide | (st_shift(
                    differs.astype(dt), dr, dc) > 0.5)
            differs = wide & prob.mask
        refree = (~state.free) & prob.mask & differs
        free2 = state.free | refree
        fixed2 = jnp.where(refree, 0.0, state.fixed_val)
        b_eff2 = prob.b + 2.0 * prob.stencil.a_matvec(
            (~free2).astype(dt) * fixed2)
        # re-freed pixels re-enter the relaxation at their fixed value
        # with fresh duals; everything else keeps its iterate
        x2 = jnp.where(refree, state.fixed_val, state.x)
        z0 = lambda z: jnp.where(refree, 0.0, z)
        st2 = state._replace(
            x=x2, y1=jnp.where(refree, state.fixed_val, state.y1),
            y2=jnp.where(refree, state.fixed_val, state.y2),
            z1=z0(state.z1), z2=z0(state.z2),
            free=free2, fixed_val=fixed2, b_eff=b_eff2,
            done=jnp.zeros_like(state.done))
        st2, _ = qp.solve_window(st2, prob, cfg, iters, record=False)
        return st2

    for _ in range(rounds):
        state = one_round(state)
    return state


def l2f_metrics(state: lp.LpState, prob: LpProblem,
                oracle_obj: jnp.ndarray,
                labels: Optional[jnp.ndarray] = None) -> dict:
    """Evaluation metrics of the accelerated LP solve against the plain
    oracle: objective gap, infeasible rows, fix counts and fix errors
    (trainer.py:431-453, 559-560).  Objective/solution are
    selection-reported (better of last rounding / feasible incumbent),
    matching the oracle's reporting semantics."""
    sol, obj, infeas = lp.select_solution(
        prob, lp.solution(state), lp.solution_best(state))
    gap = (obj - oracle_obj) / jnp.abs(oracle_obj)
    fixed = (~state.free) & prob.var_mask
    out = {
        "obj": obj,
        "obj_gap": gap,
        "iterations": state.it,
        "infeasible": infeas,
        "n_fixed": jnp.sum(fixed, axis=-1),
    }
    if labels is not None:
        agree = (sol == labels) & prob.var_mask
        out["fix_errors"] = jnp.sum(fixed & (state.fixed_val != labels),
                                    axis=-1)
        out["sol_1_to_0"] = jnp.sum(
            ((labels == 1) & (sol == 0)) & prob.var_mask, axis=-1)
        out["sol_0_to_1"] = jnp.sum(
            ((labels == 0) & (sol == 1)) & prob.var_mask, axis=-1)
        out["sol_agree"] = jnp.sum(agree, axis=-1)
    return out


def l2f_metrics_qp(state: qp.QpState, prob: qp.QpProblem,
                   oracle_energy: jnp.ndarray,
                   labels: Optional[jnp.ndarray] = None,
                   repair_sweeps: int = 0,
                   pair_sweeps: int = 0) -> dict:
    """Segmentation eval metrics: energy gap + per-pixel agreement
    (Seg trainer.py:745-771).  Energy/solution are the better of the
    final rounding and the best incumbent (qp.select_solution),
    optionally ICM-polished (pass the same ``repair_sweeps`` used for
    the oracle side so gaps compare equal reporting semantics)."""
    sol, energy = qp.select_solution(state, prob,
                                     repair_sweeps=repair_sweeps,
                                     pair_sweeps=pair_sweeps)
    gap = (energy - oracle_energy) / jnp.abs(oracle_energy)
    fixed = (~state.free) & prob.mask
    out = {
        "energy": energy,
        "energy_gap": gap,
        "iterations": state.it,
        "n_fixed": jnp.sum(fixed, axis=(-2, -1)),
    }
    if labels is not None:
        out["px_1_to_0"] = jnp.sum(
            ((labels == 1) & (sol == 0)) & prob.mask, axis=(-2, -1))
        out["px_0_to_1"] = jnp.sum(
            ((labels == 0) & (sol == 1)) & prob.mask, axis=(-2, -1))
        out["px_agree"] = jnp.sum((sol == labels) & prob.mask,
                                  axis=(-2, -1))
        out["fix_errors"] = jnp.sum(fixed & (state.fixed_val != labels),
                                    axis=(-2, -1))
    return out


@functools.partial(jax.jit, static_argnames=(
    "model", "cfg", "pcfg", "ws", "policy_windows", "fuse", "scorer",
    "max_iter", "interpret"))
def _policy_phase(state, prob, variables, model, cfg, pcfg, ws,
                  policy_windows, fuse, scorer, max_iter, interpret,
                  variables2=None):
    """Jitted phase 1 of l2f_solve_compact (module-level so repeat calls
    hit the jit cache)."""

    def score_rows(rows, vs=None):
        vs = variables if vs is None else vs
        if scorer == "pallas":
            from ..models.pallas_policy import policy_scores_pallas
            return policy_scores_pallas(vs, rows, pcfg,
                                        interpret=interpret)
        if scorer == "fast":
            from ..models.fast_policy import fast_policy_scores
            return fast_policy_scores(vs, rows, pcfg)
        return policy_scores(model, vs, rows, pcfg)

    def cond(c):
        s, w, _, _ = c
        return (w < policy_windows) & ~jnp.all(s.done) & (s.it < max_iter)

    def body(c):
        s, w, streak1, streak0 = c
        if fuse:
            # record in two half-windows: the (bt, ws, n) trajectory
            # buffer would not fit VMEM alongside E and G^{-1}
            from ..ops.pallas_lp import lp_window_fused
            s, tr1 = lp_window_fused(s, prob, cfg, ws // 2, record=True,
                                     interpret=interpret)
            s, tr2 = lp_window_fused(s, prob, cfg, ws - ws // 2,
                                     record=True, interpret=interpret)
            traj = jnp.concatenate([tr1, tr2], axis=-1)
        else:
            s, traj = lp.solve_window(s, prob, cfg, ws, record=True)
        rows = traj.reshape(-1, ws)
        sig = score_rows(rows).reshape(s.x.shape)
        # risk-calibrated per-variable thresholds (no-op at
        # damage_gate=0: margins is the constant 1-C)
        margins = fix_margins(prob.b, prob.var_mask, pcfg)
        conf1 = sig > 1.0 - margins
        conf0 = sig < margins
        if variables2 is not None:
            # ensemble veto: an independently-trained net must not
            # contradict the fix (PolicyConfig.ensemble_veto)
            sig2 = score_rows(rows, variables2).reshape(s.x.shape)
            v = pcfg.ensemble_veto
            conf1 = conf1 & (sig2 > 1.0 - v)
            conf0 = conf0 & (sig2 < v)
        if pcfg.fix_agree_gate:
            # veto fixes that contradict the trajectory (config.py:
            # fix_agree_gate): the window's own iterates are in hand
            end = traj[:, :, -1]
            conf1 = conf1 & (end > 0.5)
            conf0 = conf0 & (end < 0.5)
            if pcfg.fix_agree_gate >= 2:
                amp = jnp.max(traj, -1) - jnp.min(traj, -1)
                stable = amp < 0.25
                conf1 = conf1 & stable
                conf0 = conf0 & stable
        streak1 = jnp.where(conf1, streak1 + 1, 0)
        streak0 = jnp.where(conf0, streak0 + 1, 0)
        k = pcfg.fix_windows
        vec = jnp.where(streak1 >= k, 1.0,
                        jnp.where(streak0 >= k, 0.0, -1.0))
        s = lp.apply_fix(s, prob, vec, cfg)
        return s, w + 1, streak1, streak0

    zeros_i = jnp.zeros(state.x.shape, jnp.int32)
    state, _, _, _ = jax.lax.while_loop(
        cond, body, (state, jnp.int32(0), zeros_i, zeros_i))
    support = jnp.any((jnp.abs(prob.E) > 0) & state.free[:, None, :],
                      axis=-1) & prob.row_mask
    return state, jnp.max(jnp.sum(state.free, axis=-1)), \
        jnp.max(jnp.sum(support, axis=-1))


@functools.partial(jax.jit, static_argnames=("cfg", "ws", "max_iter"))
def _residual_phase_xla(state, prob, cfg, ws, max_iter):
    def cond(s):
        return jnp.logical_and(s.it < max_iter, ~jnp.all(s.done))

    def body(s):
        s, _ = lp.solve_window(s, prob, cfg, ws, record=False)
        return s

    return jax.lax.while_loop(cond, body, state)


@functools.partial(jax.jit, static_argnames=("repair_rounds",
                                             "swap_rounds"))
def _finalize(state, idx_map, fixed_full, free_full, orig_prob,
              repair_rounds=0, swap_rounds=0):
    """Scatter the last rounding AND the best feasible incumbent back to
    original indices, then pick per instance (core.lp.select_solution),
    optionally polishing with the greedy refill (ops/repair)."""
    sol_last = lp.scatter_solution(state, idx_map, fixed_full, free_full)
    state_b = state._replace(x=lp.solution_best(state))
    sol_best = lp.scatter_solution(state_b, idx_map, fixed_full,
                                   free_full)
    sol, obj, infeas = lp.select_solution(orig_prob, sol_last, sol_best,
                                          repair_rounds=repair_rounds,
                                          swap_rounds=swap_rounds)
    n_fixed = jnp.sum(~free_full & orig_prob.var_mask, axis=-1)
    return sol, obj, infeas, n_fixed


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_new", "m_new", "rho_boost", "max_iter", "ws", "bt",
    "fused", "interpret", "repair_rounds", "swap_rounds",
    "cfg_changed"))
def _tail_phase(state, orig_prob, cfg, n_new, m_new, rho_boost,
                max_iter, ws, bt, fused, interpret, repair_rounds=0,
                swap_rounds=0, cfg_changed=False):
    """Everything after the policy-phase fetch in ONE executable:
    compaction, rho fast-forward, n-side factorization, residual solve
    (fused kernel or XLA windows) and scatter + incumbent selection.

    Remote TPU links make per-dispatch latency a first-order cost (the
    decomposed compact/factor/solve/finalize sequence spent ~0.25s of
    a 0.78s l2f solve on round trips); one dispatch removes it."""
    prob = orig_prob
    fixed_full = state.fixed_val
    free_full = state.free
    B, n_full = state.x.shape
    idx_map = jnp.broadcast_to(jnp.arange(n_full)[None], (B, n_full))
    if n_new < n_full or m_new < prob.m:
        state, prob, idx_map = lp.compact(state, prob, cfg, n_new,
                                          m_new=m_new)
    elif cfg_changed and not rho_boost:
        # a tail-only rho schedule changes rho_at(it): the carried
        # E^T w product was built under the policy phase's schedule
        state = lp.refresh_et_next(state, prob, cfg)
    if rho_boost:
        # OPTIONAL acceleration beyond the reference: the residual
        # (the policy's leftover hard variables) only binarizes once
        # rho is large, so fast-forward the schedule by advancing the
        # iteration counter.  Off by default (reference semantics);
        # quality/speed trade-off measured in STATUS.md.
        state = state._replace(it=state.it + rho_boost)
        # the boosted iteration counter changes rho, so the carried
        # E^T w product (core/lp.LpState.et_next) is stale
        state = lp.refresh_et_next(state, prob, cfg)
    if fused:
        from ..ops.pallas_lp import solve_fused_from
        nfactor = None
        if prob.n <= prob.m:
            # compaction leaves n <= m, where the direct n-side
            # x-update beats the Woodbury detour (factorize_nside)
            from ..ops import woodbury as _wb
            nf = _wb.factorize_nside(prob.E, state.free,
                                     lp._wb_ratio(cfg))
            nfactor = (nf.hinv, nf.ete)
        # large window + in-kernel all-done early exit: stragglers
        # iterate inside one launch, finished blocks cost only DMA
        state = solve_fused_from(state, prob, cfg, max_iters=max_iter,
                                 window=max(ws, 1000), bt=bt,
                                 interpret=interpret, nfactor=nfactor)
    else:
        state = _residual_phase_xla(state, prob, cfg, ws, max_iter)
    sol, obj, infeas, n_fixed = _finalize(state, idx_map, fixed_full,
                                          free_full, orig_prob,
                                          repair_rounds=repair_rounds,
                                          swap_rounds=swap_rounds)
    return state, sol, obj, lp.objective(state), infeas, n_fixed


def l2f_solve_compact(prob, model, variables, cfg: SolverConfig,
                      pcfg: PolicyConfig, ws: int = 100,
                      max_iter: Optional[int] = None,
                      policy_windows: int = 5,
                      min_bucket: int = 128, m_min_bucket: int = 64,
                      use_fused: bool = False,
                      rho_boost_iters: int = 0,
                      interpret: Optional[bool] = None,
                      scorer: Optional[str] = None,
                      repair_rounds: int = 0,
                      swap_rounds: int = 0,
                      timings: Optional[dict] = None,
                      variables2=None,
                      tail_rho_step: Optional[int] = None):
    """LP l2f solve with bucketed physical compaction.

    ``tail_rho_step``: optional rho_change_step for the RESIDUAL phase
    only (the policy phase keeps the reference schedule its training
    trajectories used).  The residual binarizes once rho is large, so
    a faster tail schedule converges in fewer iterations -- the same
    lever that carried the xl/mega rungs to 161-173x / 18.9x
    (ladder.json r4); quality must be re-validated per operating
    point.

    TWO dispatches, one host round trip between them (per-dispatch
    latency is a first-order cost over remote TPU links):

    1. POLICY phase (one jit): up to ``policy_windows`` windows of
       [ws solver iterations -> policy scoring -> mask fixing] in a
       device-side while_loop -- the reference's policy fixes nearly
       everything it ever will within the first few windows.  Returns
       the max free-variable / supported-row counts, whose (single)
       host fetch decides the static bucket shapes.
    2. TAIL phase (one jit, ``_tail_phase``): gather free columns and
       supported constraint rows into power-of-two buckets
       (core.lp.compact -- restores the reference's shrinking
       per-iteration cost, the source of its wall-clock speedup,
       SURVEY.md section 7 "hard parts"), then run the small problem
       to convergence (fused Pallas kernel when ``use_fused`` and the
       block fits VMEM, XLA windows otherwise) and scatter + select
       the solution.

    All jitted phases are module-level, so repeated solves reuse the
    compile cache.  Returns (final_state, dict) with the full-width
    binary solution, objective, iterations, fixing info and
    original-problem feasibility.
    """
    import time as _time

    import numpy as np

    def _mark(key, t0):
        if timings is not None:
            jax.block_until_ready(state)
            timings[key] = timings.get(key, 0.0) + _time.time() - t0
        return _time.time()

    if max_iter is None:
        max_iter = cfg.max_iters
    if interpret is None:
        import jax as _jax
        interpret = _jax.default_backend() == "cpu"

    orig_prob = prob
    state = lp.init_state(prob, cfg)
    B, n_full = state.x.shape
    fuse = use_fused and cfg.linsolve == "woodbury" and B % 8 == 0 \
        and prob.n * ws <= 64 * 1024
    params = variables.get("params", {})
    if scorer is None:
        # the fused Pallas forward handles both window modes and the
        # MHA/MLP encoders; fall back to model.apply for anything else
        scorer = "pallas" if ("Dense_0" in params
                              and "Classifier_0" in params) else "model"
        if scorer in _failed_scorers:
            # a failed Mosaic compile is NOT cached by jax, so retrying
            # every call would pay the full (often slow, axon) compile
            # attempt each time; remember the failure per process
            scorer = "fast" if pcfg.window_mode == "chunk" else "model"

    # the axon remote Mosaic compile helper fails transiently: try the
    # pallas scorer twice, then fall back to the transposed XLA scorer
    # (chunk mode) or plain model.apply
    fallback = "fast" if pcfg.window_mode == "chunk" else "model"
    plan = [scorer, scorer, fallback] if scorer == "pallas" else [scorer]
    t0 = _time.time()
    for i, sc in enumerate(plan):
        try:
            state, max_free, max_rows = _policy_phase(
                state, prob, variables, model, cfg, pcfg, ws,
                policy_windows, fuse, sc, max_iter, interpret,
                variables2=variables2)
            scorer = sc
            break
        except Exception as e:
            if i == len(plan) - 1:
                raise
            import sys as _sys
            print(f"l2f: {sc} scorer failed ({type(e).__name__}: "
                  f"{str(e)[:200]}); "
                  f"{'retrying' if plan[i + 1] == sc else 'falling back'}",
                  file=_sys.stderr, flush=True)
            if plan[i + 1] != sc:
                _failed_scorers.add(sc)
            t0 = _time.time()   # don't bill the failed attempt
    if timings is not None:
        timings["scorer"] = scorer
    t0 = _mark("policy_s", t0)

    fixed_full = state.fixed_val
    free_full = state.free

    # ONE host fetch decides the (static) bucket shapes
    mf, mr = (int(v) for v in jax.device_get((max_free, max_rows)))
    n_b = min_bucket
    while n_b < mf:
        n_b *= 2
    n_b = min(n_b, n_full)
    m_b = m_min_bucket
    while m_b < mr:
        m_b *= 2
    m_b = min(m_b, prob.m)

    from ..ops.pallas_lp import auto_bt
    nside = n_b <= m_b
    bt = auto_bt(B, m_b, n_b, nside=nside) if fuse else 0
    state0 = state
    cfg_tail = cfg if tail_rho_step is None \
        else cfg.replace(rho_change_step=tail_rho_step)
    for attempt in (1, 2, 3):
        fused = fuse and bt > 0 and attempt < 3
        try:
            state, sol_full, obj, obj_last, infeas, n_fixed = \
                _tail_phase(state0, prob, cfg_tail, n_b, m_b,
                            rho_boost_iters, max_iter, ws, bt, fused,
                            interpret, repair_rounds=repair_rounds,
                            swap_rounds=swap_rounds,
                            cfg_changed=cfg_tail is not cfg)
            if timings is not None:
                timings["residual_path"] = (
                    f"fused(bt={bt},nside={nside})" if fused else "xla")
            break
        except Exception as e:
            # transient remote-compile failure (retry once with the
            # fused kernel, then fall back to the XLA residual -- e.g.
            # a Mosaic VMEM OOM at an unlucky compacted shape)
            if not fused:
                raise
            import sys as _sys
            print(f"l2f: fused tail failed ({type(e).__name__}: "
                  f"{str(e)[:200]}); "
                  f"{'retrying' if attempt == 1 else 'XLA fallback'}",
                  file=_sys.stderr, flush=True)
    t0 = _mark("tail_s", t0)

    out = {
        "solution": sol_full,
        "obj": obj,
        "obj_last": obj_last,              # reference-parity accessor
        "iterations": state.it,
        "infeasible": infeas,
        "n_fixed": n_fixed,
        "fixed_mask": ~free_full & orig_prob.var_mask,
        "fixed_val": fixed_full,
    }
    return state, out
