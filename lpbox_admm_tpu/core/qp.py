"""Batched Lp-Box ADMM for unconstrained binary QPs (segmentation).

TPU-native re-design of the reference's segmentation solver
(Segmentation/Segmentation/cython/src/LPboxADMMsolver.cpp):

* ``init_state``     ~ ADMM_bqp_unconstrained_init state setup (:658-810)
* ``step``           ~ one iteration of ADMM_bqp_unconstrained_{legacy,l2f}
                       (:1067-1195, :1200-1380)
* ``apply_fix``      ~ the quadratic early-fix reduction Ma/Mb
                       (:927-1062): reduced problem A'=Ma,
                       b' = 2 Mb x2 + b1 -- reproduced with static
                       shapes as b_eff = b + 2 A'@((1-free) * v) masked
                       to free coordinates
* ``energy``         ~ get_final_obj (:868-893): full restored solution
                       on the original A plus the unary constant c

The problem is ``min x^T A' x + b^T x`` with ``A' = D - W`` given as a
grid ``Stencil`` (see ops/stencil.py); the CG matrix
``2 A' + (rho1+rho2) I`` is applied as a 9-point stencil matvec.  State
vectors live on the (B, H, W) grid.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from ..ops import cg as cg_ops
from ..ops.projections import project_box
from ..ops.schedule import rho_at, gamma_at
from ..ops.stats import rel_std_obj
from ..ops.stencil import Stencil

_EPS = 2.2204e-16


class QpProblem(NamedTuple):
    """Batched grid BQP: min x.A'x + b.x, A' = degree - W (stencil)."""

    stencil: Stencil        # (B, 8, H, W) weights + (B, H, W) degree
    b: jnp.ndarray          # (B, H, W) linear cost
    const: jnp.ndarray      # (B,) additive constant (Seg's sum of U1)
    mask: jnp.ndarray       # (B, H, W) bool: valid (in-image) pixels

    @property
    def batch(self) -> int:
        return self.b.shape[0]

    @property
    def grid(self) -> Tuple[int, int]:
        return self.b.shape[-2], self.b.shape[-1]


class QpState(NamedTuple):
    x: jnp.ndarray          # (B, H, W)
    y1: jnp.ndarray
    y2: jnp.ndarray
    z1: jnp.ndarray
    z2: jnp.ndarray
    free: jnp.ndarray       # (B, H, W) bool
    fixed_val: jnp.ndarray  # (B, H, W)
    b_eff: jnp.ndarray      # (B, H, W): b + 2 A'@(fixed contribution)
    obj_ring: jnp.ndarray   # (B, H)
    obj_count: jnp.ndarray  # (B,)
    it: jnp.ndarray         # ()
    done: jnp.ndarray       # (B,)
    cur_obj: jnp.ndarray    # (B,) binary objective on the reduced problem
    best_bin_obj: jnp.ndarray
    best_sol: jnp.ndarray
    x_prev: jnp.ndarray
    fix_count: jnp.ndarray  # (B, H, W) int32


def _msum(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x, axis=(-2, -1))


def _mnorm(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    x = jnp.where(mask, x, 0.0)
    return jnp.sqrt(_msum(x * x))


def _sphere(x: jnp.ndarray, free: jnp.ndarray, p: int) -> jnp.ndarray:
    shift = jnp.where(free, x - 0.5, 0.0)
    n_act = _msum(free).astype(x.dtype)[:, None, None]
    norm = jnp.sqrt(_msum(shift * shift))[:, None, None]
    norm = jnp.maximum(norm, _EPS)
    y = shift * (n_act ** (1.0 / p)) / (2.0 * norm) + 0.5
    return jnp.where(free, y, x)


def reduced_cost(state: QpState, prob: QpProblem, x: jnp.ndarray
                 ) -> jnp.ndarray:
    """compute_cost on the reduced (free) problem: x.Ma x + b_eff.x with
    x masked to free coords (reference compute_cost, Seg :497-510)."""
    free_f = state.free.astype(x.dtype)
    xf = free_f * x
    ax = prob.stencil.a_matvec(xf)
    return _msum(xf * (free_f * ax)) + _msum(state.b_eff * xf)


def init_state(prob: QpProblem, cfg: SolverConfig) -> QpState:
    """x0 = 0, duals 0 (Seg init :762-800)."""
    B = prob.batch
    H, W = prob.grid
    dt = prob.b.dtype
    zeros = jnp.zeros((B, H, W), dt)
    free = prob.mask
    st = QpState(
        x=zeros, y1=zeros, y2=zeros, z1=zeros, z2=zeros,
        free=free, fixed_val=zeros, b_eff=prob.b,
        obj_ring=jnp.zeros((B, cfg.history_size), dt),
        obj_count=jnp.zeros((B,), jnp.int32),
        it=jnp.int32(0),
        done=jnp.zeros((B,), bool),
        cur_obj=jnp.zeros((B,), dt), best_bin_obj=jnp.zeros((B,), dt),
        best_sol=zeros, x_prev=zeros,
        fix_count=jnp.zeros((B, H, W), jnp.int32),
    )
    # best_bin_obj = cost(x0) = 0 for x0 = 0 (:800)
    return st


def step(state: QpState, prob: QpProblem, cfg: SolverConfig,
         rule_fixing: bool = False) -> QpState:
    """One ADMM iteration (Seg :1067-1195)."""
    dt = state.x.dtype
    it = state.it
    active = ~state.done
    act = active[:, None, None]
    free = state.free
    free_f = free.astype(dt)

    rho1 = rho_at(it, cfg)
    rho2 = rho1
    gamma = gamma_at(it, cfg)
    c = rho1 + rho2

    y1 = project_box(state.x + state.z1 / rho1)
    y2 = _sphere(state.x + state.z2 / rho2, free, cfg.projection_lp)

    rhs = free_f * (rho1 * y1 + rho2 * y2
                    - (state.b_eff + state.z1 + state.z2))

    def matvec(p):
        ap = prob.stencil.a_matvec(free_f * p)
        return free_f * (2.0 * ap + c * p)

    diag = jnp.where(free, 2.0 * prob.stencil.a_diag() + c, 1.0)
    B = prob.batch
    H, W = prob.grid
    res = cg_ops.pcg(
        lambda p: matvec(p.reshape(B, H, W)).reshape(B, H * W),
        rhs.reshape(B, H * W), (free_f * y1).reshape(B, H * W),
        diag.reshape(B, H * W), cfg.pcg_tol, cfg.pcg_maxiters,
        active=active)
    x = jnp.where(act & ~res.failed[:, None, None],
                  free_f * res.x.reshape(B, H, W), state.x)

    z1 = state.z1 + gamma * rho1 * free_f * (x - y1)
    z2 = state.z2 + gamma * rho2 * free_f * (x - y2)

    xnorm = jnp.maximum(_mnorm(x, free), _EPS)
    c1 = _mnorm(x - y1, free) / xnorm
    c2 = _mnorm(x - y2, free) / xnorm
    cvg = ((c1 <= cfg.stop_threshold) & (c2 <= cfg.stop_threshold)
           ) | res.failed

    obj_val = reduced_cost(state._replace(free=free), prob, x)
    push = active & ~cvg
    Hs = cfg.history_size
    slot = jnp.mod(state.obj_count, Hs)
    onehot = slot[:, None] == jnp.arange(Hs)[None, :]
    obj_ring = jnp.where(push[:, None] & onehot, obj_val[:, None],
                         state.obj_ring)
    obj_count = state.obj_count + push.astype(jnp.int32)
    std = rel_std_obj(obj_ring, obj_count, obj_val)
    std_stop = push & (std <= cfg.std_threshold)

    newly_done = active & (cvg | std_stop)

    track = active & ~newly_done
    rounded = free_f * (x >= 0.5).astype(dt)
    obj_bin = reduced_cost(state, prob, rounded)
    cur_obj = jnp.where(track, obj_bin, state.cur_obj)
    better = track & (state.best_bin_obj >= obj_bin)
    best_bin_obj = jnp.where(better, obj_bin, state.best_bin_obj)
    best_sol = jnp.where(better[:, None, None], x, state.best_sol)

    if rule_fixing:
        det = jnp.abs(x - state.x_prev) <= cfg.fix_threshold
        fix_count = jnp.where(act & det & free, state.fix_count + 1,
                              jnp.where(act & free, 0, state.fix_count))
    else:
        fix_count = state.fix_count

    upd = lambda new, old: jnp.where(act, new, old)
    return state._replace(
        x=upd(x, state.x), y1=upd(y1, state.y1), y2=upd(y2, state.y2),
        z1=upd(z1, state.z1), z2=upd(z2, state.z2),
        obj_ring=obj_ring, obj_count=obj_count,
        it=it + 1, done=state.done | newly_done,
        cur_obj=cur_obj, best_bin_obj=best_bin_obj, best_sol=best_sol,
        x_prev=upd(x, state.x_prev), fix_count=fix_count)


def solve_window(state: QpState, prob: QpProblem, cfg: SolverConfig,
                 window: int, record: bool = True,
                 rule_fixing: bool = False
                 ) -> Tuple[QpState, Optional[jnp.ndarray]]:
    """Run ``window`` iterations; optional (B, H, W, window) trajectory."""

    def body(s, _):
        s = step(s, prob, cfg, rule_fixing=rule_fixing)
        return s, (s.x if record else None)

    state, traj = jax.lax.scan(body, state, None, length=window)
    if record:
        traj = jnp.moveaxis(traj, 0, -1)
    return state, traj


def apply_fix(state: QpState, prob: QpProblem, vec: jnp.ndarray,
              cfg: SolverConfig, min_fix: Optional[int] = None) -> QpState:
    """Quadratic early-fix reduction, mask-based (Seg :927-1062).

    ``vec`` is (B, H, W) in the +1/0/-1 convention.  The reduced linear
    term b' = 2 Mb x2 + b1 becomes
    ``b_eff = free * (b + 2 * A'@((1-free) * fixed_val))`` -- the
    off-diagonal block times the fixed values, folded into b.
    """
    if min_fix is None:
        min_fix = cfg.min_fix
    dt = state.x.dtype
    active = ~state.done
    want = state.free & (vec >= 0.0) & active[:, None, None]
    cnt = _msum(want)
    do = cnt > min_fix
    newly = want & do[:, None, None]

    val = jnp.clip(vec, 0.0, 1.0)
    fixed_val = jnp.where(newly, val, state.fixed_val)
    free = state.free & ~newly
    free_f = free.astype(dt)

    contrib = prob.stencil.a_matvec((~free).astype(dt) * fixed_val)
    b_eff = jnp.where(do[:, None, None], prob.b + 2.0 * contrib,
                      state.b_eff)

    empty = _msum(free) == 0
    done = state.done | (do & empty)

    return state._replace(
        free=free, fixed_val=fixed_val, b_eff=b_eff, done=done,
        x_prev=jnp.where(do[:, None, None], state.x, state.x_prev))


def rule_fix_vec(state: QpState, cfg: SolverConfig) -> jnp.ndarray:
    flag = state.free & (state.fix_count >= cfg.consistency)
    val = (state.x >= 0.5).astype(state.x.dtype)
    return jnp.where(flag, val, -1.0)


def solution(state: QpState) -> jnp.ndarray:
    """Full restored binary solution (Seg get_x_sol :895-915)."""
    rounded = (state.x >= 0.5).astype(state.x.dtype)
    return jnp.where(state.free, rounded, state.fixed_val)


def energy(state: QpState, prob: QpProblem) -> jnp.ndarray:
    """Total segmentation energy of the restored solution on the
    ORIGINAL problem + constant c (get_final_obj, Seg :868-893)."""
    x = solution(state) * prob.mask.astype(state.x.dtype)
    ax = prob.stencil.a_matvec(x)
    return _msum(x * ax) + _msum(prob.b * x) + prob.const


def solution_best(state: QpState) -> jnp.ndarray:
    """Full restored rounding of the best incumbent iterate."""
    rounded = (state.best_sol >= 0.5).astype(state.x.dtype)
    return jnp.where(state.free, rounded, state.fixed_val)


def select_solution(state: QpState, prob: QpProblem,
                    repair_sweeps: int = 0, pair_sweeps: int = 0):
    """Per instance, the lower-energy of (final rounding, best incumbent
    rounding).  The BQP is unconstrained so every rounding is feasible;
    the reference reports only the last (Seg xiter_all.csv, :1376) --
    this is a strict quality improvement.  With ``repair_sweeps > 0``
    the selected rounding is further polished by the 4-coloured
    one-flip descent (ops/repair.icm_descent), which never increases
    the energy.  Returns (sol, energy)."""
    return select_from_sols(prob, solution(state), solution_best(state),
                            repair_sweeps=repair_sweeps,
                            pair_sweeps=pair_sweeps)


def select_from_sols(prob: QpProblem, sol_last: jnp.ndarray,
                     sol_best: jnp.ndarray,
                     repair_sweeps: int = 0, pair_sweeps: int = 0):
    """select_solution on precomputed full-grid candidate solutions
    (used by the compacted l2f path, whose solver state is flat)."""
    mask = prob.mask.astype(sol_last.dtype)
    sols = jnp.stack([sol_last * mask,
                      sol_best * mask], axis=1)              # (B,2,H,W)

    def en(x):
        ax = prob.stencil.a_matvec(x)
        return _msum(x * ax) + _msum(prob.b * x) + prob.const

    e = jnp.stack([en(sols[:, 0]), en(sols[:, 1])], axis=1)   # (B, 2)
    k = jnp.argmin(e, axis=1)
    sol = jnp.take_along_axis(sols, k[:, None, None, None],
                              axis=1)[:, 0]
    energy_sel = jnp.take_along_axis(e, k[:, None], axis=1)[:, 0]
    def keep_better(cand, sol, energy_sel):
        # polish safety net: per instance, never return a solution
        # worse than the pre-polish one (descent passes are proven
        # monotone, but this makes the guarantee structural)
        e_c = en(cand)
        better = (e_c < energy_sel)[:, None, None]
        return (jnp.where(better, cand, sol),
                jnp.minimum(e_c, energy_sel))

    if repair_sweeps > 0:
        from ..ops.repair import icm_descent
        cand = icm_descent(prob.stencil, prob.b, prob.mask, sol,
                           sweeps=repair_sweeps)
        sol, energy_sel = keep_better(cand, sol, energy_sel)
    if pair_sweeps > 0:
        # domino flips reach moves 1-flip descent cannot; interleave a
        # final 1-flip pass to clean up what the pairs opened up
        from ..ops.repair import icm_descent, pair_descent
        cand = pair_descent(prob.stencil, prob.b, prob.mask, sol,
                            sweeps=pair_sweeps)
        cand = icm_descent(prob.stencil, prob.b, prob.mask, cand,
                           sweeps=max(1, repair_sweeps // 2))
        sol, energy_sel = keep_better(cand, sol, energy_sel)
    return sol, energy_sel


@functools.partial(jax.jit, static_argnames=("cfg", "max_iters", "window",
                                             "rule_fixing"))
def solve(prob: QpProblem, cfg: SolverConfig,
          max_iters: Optional[int] = None, window: int = 100,
          rule_fixing: bool = False) -> QpState:
    """Plain full solve (ADMM_bqp_unconstrained_legacy, Seg :1200-1380)."""
    if max_iters is None:
        max_iters = cfg.max_iters
    state = init_state(prob, cfg)

    def cond(s):
        return jnp.logical_and(s.it < max_iters, ~jnp.all(s.done))

    def body(s):
        s, _ = solve_window(s, prob, cfg, window, record=False,
                            rule_fixing=rule_fixing)
        if rule_fixing:
            s = apply_fix(s, prob, rule_fix_vec(s, cfg), cfg)
        return s

    return jax.lax.while_loop(cond, body, state)


def compact(state: QpState, prob: QpProblem, cfg: SolverConfig,
            n_new: int):
    """Gather free pixels into a flat compacted unconstrained QP whose
    A is a 9-nnz/row SparseEll, consumed by ``core.general``.

    The TPU-native equivalent of the reference's Ma/Mb physical shrink
    (Seg LPboxADMMsolver.cpp:1048-1057), which this mask-based core
    otherwise forgoes: after the policy fixes most pixels, the masked
    grid iteration still streams the full stencil.  Here the free
    pixels (plus fixed padding up to the static bucket ``n_new``) are
    gathered into a flat problem; the stencil rows restricted to
    free-free pairs become ELL rows built entirely in-jit (the grid
    neighbour structure is static), and fixed-neighbour contributions
    stay folded in ``b_eff``.

    Entries pointing at non-free (padding) slots are ZEROED -- their
    contribution is already inside the gathered ``b_eff``, and
    ``general.apply_fix`` recomputes ``b_eff`` from the compacted
    problem's b, so live columns must be exactly the free ones (same
    invariant as core/lp.compact).

    Returns ``(gstate, gprob, idx)`` where ``idx`` (B, n_new) maps
    compacted slots to flat grid positions; scatter back with
    :func:`scatter_solution`.  Requires every instance to have at most
    ``n_new`` free pixels.
    """
    from . import general
    from ..ops import sparse as sparse_ops
    from ..ops.stencil import OFFSETS

    B, H, W = state.x.shape
    n = H * W
    dt = state.x.dtype
    free_flat = state.free.reshape(B, n)
    order = jnp.argsort(~free_flat, axis=-1, stable=True)
    idx = order[:, :n_new].astype(jnp.int32)       # slot -> grid pos
    slots = jnp.arange(n_new, dtype=jnp.int32)
    inv = jnp.full((B, n), 0, jnp.int32)           # grid pos -> slot
    inv = jax.vmap(lambda iv, ix: iv.at[ix].set(slots))(inv, idx)

    def take(a):                                   # (B,H,W) -> (B,n_new)
        return jax.vmap(lambda ab, ib: ab.reshape(-1)[ib])(a, idx)

    def gat(flat, q):                              # flat (B,n) at q (B,n_new)
        return jax.vmap(lambda fb, qb: fb[qb])(flat, q)

    free_c = take(state.free)
    r, c = idx // W, idx % W

    # --- 9-entry ELL rows: diag + 8 neighbours ---------------------------
    row_i = [slots[None, :].repeat(B, axis=0)]
    row_v = [jnp.where(free_c, take(prob.stencil.degree), 0.0)]
    for d, (dr, dc) in enumerate(OFFSETS):
        qr, qc = r + dr, c + dc
        inb = (qr >= 0) & (qr < H) & (qc >= 0) & (qc < W)
        q = jnp.clip(qr, 0, H - 1) * W + jnp.clip(qc, 0, W - 1)
        nb_free = gat(free_flat, q) & inb
        slot_q = gat(inv, q)
        w_d = take(prob.stencil.weights[:, d])
        valid = free_c & nb_free
        row_i.append(jnp.where(valid, slot_q, 0))
        row_v.append(jnp.where(valid, -w_d, 0.0))
    ri = jnp.stack(row_i, axis=-1)                 # (B, n_new, 9)
    rv = jnp.stack(row_v, axis=-1).astype(jnp.float32)
    # A is symmetric: the row layout doubles as the column layout
    A = sparse_ops.SparseEll(row_idx=ri, row_val=rv,
                             col_idx=ri, col_val=rv)

    b_c = take(state.b_eff)
    zr = jnp.zeros((B, 0), jnp.float32)
    gprob = general.GeneralProblem(
        A=A, b=b_c, C=jnp.zeros((B, 0, n_new), jnp.float32), d=zr,
        E=jnp.zeros((B, 0, n_new), jnp.float32), f=zr, var_mask=free_c)
    gstate = general.GeneralState(
        x=take(state.x), y1=take(state.y1), y2=take(state.y2),
        y3=zr, z1=take(state.z1), z2=take(state.z2), z3=zr, z4=zr,
        free=free_c, fixed_val=take(state.fixed_val), b_eff=b_c,
        d_eff=zr, f_eff=zr,
        obj_ring=state.obj_ring, obj_count=state.obj_count,
        it=state.it, done=state.done,
        cg_fail=jnp.zeros((B,), bool),
        cur_obj=state.cur_obj, best_bin_obj=state.best_bin_obj,
        best_sol=take(state.best_sol), x_prev=take(state.x_prev),
        fix_count=take(state.fix_count))
    return gstate, gprob, idx


def scatter_solution(sol_c: jnp.ndarray, idx: jnp.ndarray,
                     fixed_val_full: jnp.ndarray,
                     free_full: jnp.ndarray) -> jnp.ndarray:
    """Reassemble the (B, H, W) solution after compaction.

    ``fixed_val_full``/``free_full`` are the full-grid fixing snapshot
    at compaction time; compacted slots overwrite their grid positions
    (Seg get_x_sol scatter, :895-915).
    """
    B, H, W = free_full.shape
    base = jnp.where(free_full, 0.0, fixed_val_full).reshape(B, -1)
    out = jax.vmap(lambda fb, ib, vb: fb.at[ib].set(vb))(base, idx,
                                                         sol_c)
    return out.reshape(B, H, W)
