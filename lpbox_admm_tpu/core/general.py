"""Generic constrained binary-QP Lp-Box ADMM.

The reference's general solver path (Segmentation/.../LPboxADMMsolver.cpp
``ADMM_bqp`` :1384-1834 with the eq/ineq wrapper entry points
:1834-2109, steered by ``SolverInstruction``/``problem_t``,
LPboxADMMsolver.h:42-86):

    min x^T A x + b^T x   s.t.  C x = d,  E x <= f,  x in {0,1}^n

Splitting: y1 (box), y2 (sphere), y3 = f - Ex slack (inequality only),
duals z1, z2, z3 (equality), z4 (inequality).  The x-update solves

    (2A + (rho1+rho2) I + rho3 C^T C + rho4 E^T E) x =
        rho1 y1 + rho2 y2 + rho3 C^T d_eff + rho4 E^T (f_eff - y3)
        - (b_eff + z1 + z2 + C^T z3 + E^T z4)

by masked batched PCG with the same matrix-expression trick as the
reference (chained matvecs, never forming C^T C / E^T E; reference
calculate_mat_expr_multiplication, LP cpp:115-162).

TPU design notes: instead of the reference's instruction flags, absent
constraint blocks are simply ZERO-ROW arrays (mc = 0 or mi = 0) -- the
einsums vanish structurally and one compiled program serves all four
problem types.  Early fixing is mask-based like core/lp.py: fixed
variables fold into ``b_eff = b + 2 A @ (fixed)``, ``d_eff = d - C @
(fixed)``, ``f_eff = f - E @ (fixed)``.

Any of A / C / E may also be an ``ops.sparse.SparseEll`` (ELL gather
layout) instead of a dense array -- the TPU-native analogue of the
reference's Eigen-sparse generic path (Seg LPboxADMMsolver.cpp
:1384-1834), selected structurally at trace time.  Sparse storage is
O(nnz) instead of O(n^2)/O(m n), which is what admits 1e5+-variable
constrained problems (``make_sparse_general``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from ..ops import cg as cg_ops
from ..ops import sparse as sparse_ops
from ..ops.projections import project_box, project_shifted_lp_ball, project_nonneg
from ..ops.schedule import rho_at, gamma_at
from ..ops.stats import dual_residuals, rel_std_obj

_EPS = 2.2204e-16
HI = jax.lax.Precision.HIGHEST


class GeneralProblem(NamedTuple):
    """min x.Ax + b.x s.t. Cx = d, Ex <= f.  Any block may be empty:
    A all-zeros for linear objectives, C/d with 0 rows for no equality,
    E/f with 0 rows for no inequality."""

    A: jnp.ndarray         # (B, n, n) symmetric (can be zeros)
    b: jnp.ndarray         # (B, n)
    C: jnp.ndarray         # (B, mc, n)
    d: jnp.ndarray         # (B, mc)
    E: jnp.ndarray         # (B, mi, n)
    f: jnp.ndarray         # (B, mi)
    var_mask: jnp.ndarray  # (B, n)

    @property
    def batch(self) -> int:
        return self.b.shape[0]

    @property
    def n(self) -> int:
        return self.b.shape[-1]


def make_general(A=None, b=None, C=None, d=None, E=None, f=None,
                 var_mask=None, batch_dims=True) -> GeneralProblem:
    """Convenience constructor filling absent blocks with zero-size /
    zero arrays (the four problem_t variants of LPboxADMMsolver.h:42)."""
    import numpy as np

    b = np.asarray(b, dtype=np.float32)
    if b.ndim == 1:
        b = b[None]
    B, n = b.shape
    A = (np.zeros((B, n, n), np.float32) if A is None
         else np.asarray(A, np.float32).reshape(B, n, n))
    if C is None:
        C = np.zeros((B, 0, n), np.float32)
        d = np.zeros((B, 0), np.float32)
    else:
        C = np.asarray(C, np.float32).reshape(B, -1, n)
        d = np.asarray(d, np.float32).reshape(B, -1)
    if E is None:
        E = np.zeros((B, 0, n), np.float32)
        f = np.zeros((B, 0), np.float32)
    else:
        E = np.asarray(E, np.float32).reshape(B, -1, n)
        f = np.asarray(f, np.float32).reshape(B, -1)
    if var_mask is None:
        var_mask = np.ones((B, n), bool)
    return GeneralProblem(A=jnp.asarray(A), b=jnp.asarray(b),
                          C=jnp.asarray(C), d=jnp.asarray(d),
                          E=jnp.asarray(E), f=jnp.asarray(f),
                          var_mask=jnp.asarray(var_mask))


def make_sparse_general(b, A_coo=None, C_coo=None, d=None,
                        E_coo=None, f=None, var_mask=None
                        ) -> GeneralProblem:
    """GeneralProblem with sparse-ELL A / C / E blocks.

    ``*_coo`` are per-instance COO triplets ``(rows, cols, vals)``
    (numpy, 0-indexed) -- one triplet per batch element, all sharing
    the block's shape.  This is the at-scale entry point matching the
    reference's Eigen-sparse generic ``ADMM_bqp`` (Seg
    LPboxADMMsolver.cpp:1384-1834): storage and matvec cost are
    O(nnz), so 1e5+-variable problems with sparse quadratic terms and
    sparse constraint rows fit comfortably in HBM.  A must be
    symmetric (the solver never transposes it).

    Conditioning note: normalize wide constraint rows to ~unit norm
    (scale the row AND its rhs entry -- mathematically equivalent).
    An unnormalized n-wide cardinality row makes the dual force
    ``rho3 * z3`` dwarf ``b`` by orders of magnitude and the ADMM
    oscillates instead of converging (measured at n = 1e5).
    """
    import numpy as np

    b = np.asarray(b, np.float32)
    if b.ndim == 1:
        b = b[None]
    B, n = b.shape
    A = (sparse_ops.empty(B, n, n) if A_coo is None
         else sparse_ops.from_coo(A_coo, (n, n)))
    if C_coo is None:
        C = sparse_ops.empty(B, 0, n)
        d = np.zeros((B, 0), np.float32)
    else:
        d = np.asarray(d, np.float32).reshape(B, -1)
        C = sparse_ops.from_coo(C_coo, (d.shape[-1], n))
    if E_coo is None:
        E = sparse_ops.empty(B, 0, n)
        f = np.zeros((B, 0), np.float32)
    else:
        f = np.asarray(f, np.float32).reshape(B, -1)
        E = sparse_ops.from_coo(E_coo, (f.shape[-1], n))
    if var_mask is None:
        var_mask = np.ones((B, n), bool)
    return GeneralProblem(A=A, b=jnp.asarray(b), C=C,
                          d=jnp.asarray(d), E=E, f=jnp.asarray(f),
                          var_mask=jnp.asarray(var_mask))


class GridGeneralProblem(NamedTuple):
    """Constrained binary QP whose A is an implicit grid stencil.

    The reference's generic ``ADMM_bqp`` consumes arbitrary Eigen sparse
    matrices and reaches 1e4+ variables (Seg LPboxADMMsolver.cpp
    :1384-1834).  The dense ``GeneralProblem`` caps out at a few
    thousand variables (O(n^2) HBM for A); this variant stores A as the
    segmentation stencil (ops/stencil.py: 8 shifted multiply planes, the
    TPU-native sparse format for grids) while keeping the constraint
    blocks dense -- realistic eq/ineq systems on grids have FEW rows
    (cardinality, region budgets), so (B, mc, n) with small mc is cheap.
    n = H * W; x is carried flat."""

    weights: jnp.ndarray   # (B, 8, H, W) stencil neighbour weights
    degree: jnp.ndarray    # (B, H, W) = diag(A)
    b: jnp.ndarray         # (B, n)
    C: jnp.ndarray         # (B, mc, n)
    d: jnp.ndarray         # (B, mc)
    E: jnp.ndarray         # (B, mi, n)
    f: jnp.ndarray         # (B, mi)
    var_mask: jnp.ndarray  # (B, n)

    @property
    def batch(self) -> int:
        return self.b.shape[0]

    @property
    def n(self) -> int:
        return self.b.shape[-1]

    @property
    def grid(self) -> Tuple[int, int]:
        return self.degree.shape[-2], self.degree.shape[-1]


def make_grid_general(weights, b, C=None, d=None, E=None, f=None,
                      var_mask=None) -> GridGeneralProblem:
    """Build a GridGeneralProblem from (B, 8, H, W) stencil weights
    (A = diag(W 1) - W) and optional dense constraint blocks."""
    import numpy as np

    from ..ops.stencil import build_stencil

    st = build_stencil(jnp.asarray(weights, jnp.float32))
    B = st.weights.shape[0]
    H, W = st.grid
    n = H * W
    b = jnp.asarray(b, jnp.float32).reshape(B, n)
    zr = lambda mrows: (jnp.zeros((B, mrows, n), jnp.float32),
                        jnp.zeros((B, mrows), jnp.float32))
    if C is None:
        C, d = zr(0)
    else:
        C = jnp.asarray(C, jnp.float32).reshape(B, -1, n)
        d = jnp.asarray(d, jnp.float32).reshape(B, -1)
    if E is None:
        E, f = zr(0)
    else:
        E = jnp.asarray(E, jnp.float32).reshape(B, -1, n)
        f = jnp.asarray(f, jnp.float32).reshape(B, -1)
    if var_mask is None:
        var_mask = jnp.ones((B, n), bool)
    return GridGeneralProblem(weights=st.weights, degree=st.degree,
                              b=b, C=C, d=d, E=E, f=f,
                              var_mask=jnp.asarray(var_mask))


def _A_mv(prob, xf: jnp.ndarray) -> jnp.ndarray:
    """A @ xf for any problem representation (trace-time dispatch)."""
    if isinstance(prob, GridGeneralProblem):
        from ..ops.stencil import Stencil

        B, n = xf.shape
        H, W = prob.grid
        st = Stencil(weights=prob.weights, degree=prob.degree)
        return st.a_matvec(xf.reshape(B, H, W)).reshape(B, n)
    return _mv(prob.A, xf)


def _A_diag(prob) -> jnp.ndarray:
    if isinstance(prob, GridGeneralProblem):
        B = prob.batch
        return prob.degree.reshape(B, prob.n)
    if sparse_ops.is_sparse(prob.A):
        return sparse_ops.diag(prob.A)
    return jnp.einsum("bnn->bn", prob.A)


class GeneralState(NamedTuple):
    x: jnp.ndarray
    y1: jnp.ndarray
    y2: jnp.ndarray
    y3: jnp.ndarray        # (B, mi)
    z1: jnp.ndarray
    z2: jnp.ndarray
    z3: jnp.ndarray        # (B, mc)
    z4: jnp.ndarray        # (B, mi)
    free: jnp.ndarray
    fixed_val: jnp.ndarray
    b_eff: jnp.ndarray
    d_eff: jnp.ndarray
    f_eff: jnp.ndarray
    obj_ring: jnp.ndarray
    obj_count: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    cg_fail: jnp.ndarray
    cur_obj: jnp.ndarray
    best_bin_obj: jnp.ndarray
    best_sol: jnp.ndarray
    x_prev: jnp.ndarray
    fix_count: jnp.ndarray


def _mv(M, v):
    """M @ v for a dense (B, m, n) array or a SparseEll."""
    if sparse_ops.is_sparse(M):
        return sparse_ops.mv(M, v)
    return jnp.einsum("bmn,bn->bm", M, v,
                      preferred_element_type=jnp.float32, precision=HI)


def _mtv(M, v):
    """M^T @ v for a dense (B, m, n) array or a SparseEll."""
    if sparse_ops.is_sparse(M):
        return sparse_ops.mtv(M, v)
    return jnp.einsum("bmn,bm->bn", M, v,
                      preferred_element_type=jnp.float32, precision=HI)


def _colsq(M):
    """diag(M^T M) per column -> (B, n)."""
    if sparse_ops.is_sparse(M):
        return sparse_ops.colsq(M)
    return jnp.sum(M * M, axis=1)


def reduced_cost(prob: GeneralProblem, state, x) -> jnp.ndarray:
    free_f = state.free.astype(x.dtype)
    xf = free_f * x
    ax = free_f * _A_mv(prob, xf)
    return jnp.sum(xf * ax, axis=-1) + jnp.sum(state.b_eff * xf, axis=-1)


def init_state(prob: GeneralProblem, cfg: SolverConfig,
               x0: Optional[jnp.ndarray] = None) -> GeneralState:
    """x0 = 0 by default (the generic path's convention, Seg :762)."""
    B, n = prob.batch, prob.n
    mc, mi = prob.d.shape[-1], prob.f.shape[-1]
    dt = prob.b.dtype
    free = prob.var_mask
    x = jnp.zeros((B, n), dt) if x0 is None else x0 * free.astype(dt)
    zeros_n = jnp.zeros((B, n), dt)
    y3 = project_nonneg(prob.f - _mv(prob.E, x))
    cur = jnp.sum(prob.b * (x >= 0.5) * free, axis=-1)
    st = GeneralState(
        x=x, y1=x, y2=x, y3=y3,
        z1=zeros_n, z2=zeros_n,
        z3=jnp.zeros((B, mc), dt), z4=jnp.zeros((B, mi), dt),
        free=free, fixed_val=jnp.zeros((B, n), dt),
        b_eff=prob.b, d_eff=prob.d, f_eff=prob.f,
        obj_ring=jnp.zeros((B, cfg.history_size), dt),
        obj_count=jnp.zeros((B,), jnp.int32),
        it=jnp.int32(0), done=jnp.zeros((B,), bool),
        cg_fail=jnp.zeros((B,), bool),
        cur_obj=cur, best_bin_obj=cur, best_sol=x,
        x_prev=jnp.zeros((B, n), dt),
        fix_count=jnp.zeros((B, n), jnp.int32))
    return st


def step(state: GeneralState, prob: GeneralProblem, cfg: SolverConfig,
         rule_fixing: bool = False) -> GeneralState:
    dt = state.x.dtype
    it = state.it
    active = ~state.done
    act = active[:, None]
    free = state.free
    free_f = free.astype(dt)

    rho = rho_at(it, cfg)
    rho1 = rho2 = rho3 = rho4 = rho
    gamma = gamma_at(it, cfg)

    y1 = project_box(state.x + state.z1 / rho1)
    y2 = project_shifted_lp_ball(state.x + state.z2 / rho2,
                                 cfg.projection_lp, mask=free)
    ex = _mv(prob.E, free_f * state.x)
    y3 = project_nonneg(state.f_eff - ex - state.z4 / rho4)

    rhs = free_f * (
        rho1 * y1 + rho2 * y2
        - (state.b_eff + state.z1 + state.z2)
        + _mtv(prob.C, rho3 * state.d_eff - state.z3)
        + _mtv(prob.E, rho4 * (state.f_eff - y3) - state.z4))
    c = rho1 + rho2

    def matvec(p):
        pf = free_f * p
        out = 2.0 * _A_mv(prob, pf) + c * pf
        out = out + rho3 * _mtv(prob.C, _mv(prob.C, pf))
        out = out + rho4 * _mtv(prob.E, _mv(prob.E, pf))
        return free_f * out

    a_diag = _A_diag(prob)
    diag = (2.0 * a_diag + c
            + rho3 * _colsq(prob.C)
            + rho4 * _colsq(prob.E))
    diag = jnp.where(free, diag, 1.0)
    res = cg_ops.pcg(matvec, rhs, free_f * y1, diag, cfg.pcg_tol,
                     cfg.pcg_maxiters, active=active)
    x = jnp.where(act & ~res.failed[:, None], free_f * res.x, state.x)

    z1 = state.z1 + gamma * rho1 * free_f * (x - y1)
    z2 = state.z2 + gamma * rho2 * free_f * (x - y2)
    cx = _mv(prob.C, free_f * x)
    z3 = state.z3 + gamma * rho3 * (cx - state.d_eff)
    ex2 = _mv(prob.E, free_f * x)
    z4 = state.z4 + gamma * rho4 * (ex2 + y3 - state.f_eff)

    c1, c2 = dual_residuals(x, y1, y2, free)
    cvg = ((c1 <= cfg.stop_threshold) & (c2 <= cfg.stop_threshold)
           ) | res.failed

    obj_val = reduced_cost(prob, state, x)
    push = active & ~cvg
    H = cfg.history_size
    slot = jnp.mod(state.obj_count, H)
    onehot = slot[:, None] == jnp.arange(H)[None, :]
    obj_ring = jnp.where(push[:, None] & onehot, obj_val[:, None],
                         state.obj_ring)
    obj_count = state.obj_count + push.astype(jnp.int32)
    std = rel_std_obj(obj_ring, obj_count, obj_val)
    newly_done = active & (cvg | (push & (std <= cfg.std_threshold)))

    track = active & ~newly_done
    rounded = free_f * (x >= 0.5).astype(dt)
    obj_bin = reduced_cost(prob, state, rounded)
    cur_obj = jnp.where(track, obj_bin, state.cur_obj)
    better = track & (state.best_bin_obj >= obj_bin)
    best_bin_obj = jnp.where(better, obj_bin, state.best_bin_obj)
    best_sol = jnp.where(better[:, None], x, state.best_sol)

    if rule_fixing:
        det = jnp.abs(x - state.x_prev) <= cfg.fix_threshold
        fix_count = jnp.where(act & det & free, state.fix_count + 1,
                              jnp.where(act & free, 0, state.fix_count))
    else:
        fix_count = state.fix_count

    upd = lambda new, old: jnp.where(act, new, old)
    updr = lambda new, old: jnp.where(active[:, None], new, old)
    return state._replace(
        x=upd(x, state.x), y1=upd(y1, state.y1), y2=upd(y2, state.y2),
        y3=updr(y3, state.y3),
        z1=upd(z1, state.z1), z2=upd(z2, state.z2),
        z3=updr(z3, state.z3), z4=updr(z4, state.z4),
        obj_ring=obj_ring, obj_count=obj_count, it=it + 1,
        done=state.done | newly_done, cg_fail=state.cg_fail | res.failed,
        cur_obj=cur_obj, best_bin_obj=best_bin_obj, best_sol=best_sol,
        x_prev=upd(x, state.x_prev), fix_count=fix_count)


def solve_window(state, prob, cfg, window: int, record: bool = True,
                 rule_fixing: bool = False):
    def body(s, _):
        s = step(s, prob, cfg, rule_fixing=rule_fixing)
        return s, (s.x if record else None)

    state, traj = jax.lax.scan(body, state, None, length=window)
    if record:
        traj = jnp.moveaxis(traj, 0, -1)
    return state, traj


def apply_fix(state: GeneralState, prob: GeneralProblem, vec,
              cfg: SolverConfig, min_fix: Optional[int] = None
              ) -> GeneralState:
    """Mask-based reduction folding fixed values into b/d/f
    (the general analogue of LP N5 + Seg N10)."""
    if min_fix is None:
        min_fix = cfg.min_fix
    dt = state.x.dtype
    active = ~state.done
    want = state.free & (vec >= 0.0) & active[:, None]
    cnt = jnp.sum(want, axis=-1)
    do = cnt > min_fix
    newly = want & do[:, None]

    val = jnp.clip(vec, 0.0, 1.0)
    fixed_val = jnp.where(newly, val, state.fixed_val)
    free = state.free & ~newly
    fixed_f = (~free).astype(dt) * fixed_val

    b_eff = jnp.where(do[:, None],
                      prob.b + 2.0 * _A_mv(prob, fixed_f), state.b_eff)
    d_eff = jnp.where(do[:, None], prob.d - _mv(prob.C, fixed_f),
                      state.d_eff)
    f_eff = jnp.where(do[:, None], prob.f - _mv(prob.E, fixed_f),
                      state.f_eff)

    empty = jnp.sum(free, axis=-1) == 0
    done = state.done | (do & empty)
    return state._replace(free=free, fixed_val=fixed_val, b_eff=b_eff,
                          d_eff=d_eff, f_eff=f_eff, done=done,
                          x_prev=jnp.where(do[:, None], state.x,
                                           state.x_prev))


def rule_fix_vec(state: GeneralState, cfg: SolverConfig) -> jnp.ndarray:
    flag = state.free & (state.fix_count >= cfg.consistency)
    val = (state.x >= 0.5).astype(state.x.dtype)
    return jnp.where(flag, val, -1.0)


def solution(state: GeneralState) -> jnp.ndarray:
    rounded = (state.x >= 0.5).astype(state.x.dtype)
    return jnp.where(state.free, rounded, state.fixed_val)


def objective(state: GeneralState, prob: GeneralProblem) -> jnp.ndarray:
    """Full objective of the restored solution on the original A, b."""
    x = solution(state) * prob.var_mask.astype(state.x.dtype)
    return jnp.sum(x * _A_mv(prob, x), axis=-1) \
        + jnp.sum(prob.b * x, axis=-1)


def constraint_violation(state: GeneralState, prob: GeneralProblem
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(||Cx - d||, #violated inequality rows) of the restored solution
    (reference's per-iteration logging + check_infeasible)."""
    x = solution(state) * prob.var_mask.astype(state.x.dtype)
    eq = jnp.sqrt(jnp.sum((_mv(prob.C, x) - prob.d) ** 2, axis=-1))
    ineq = jnp.sum(_mv(prob.E, x) > prob.f + 1e-6, axis=-1)
    return eq, ineq


@functools.partial(jax.jit, static_argnames=("cfg", "max_iters", "window",
                                             "rule_fixing"))
def solve(prob: GeneralProblem, cfg: SolverConfig,
          max_iters: Optional[int] = None, window: int = 100,
          rule_fixing: bool = False) -> GeneralState:
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


def compact_sparse(state: GeneralState, prob: GeneralProblem,
                   n_new: int):
    """Re-compact a flat UNCONSTRAINED sparse-A problem to ``n_new``
    columns (bucketed), gathering free variables (plus fixed padding).

    Used by the compacted segmentation l2f path (core/qp.compact makes
    the first grid->flat compaction; this shrinks again as later
    windows fix more variables).  ELL rows are gathered and their
    column indices remapped through the inverse permutation; entries
    pointing at non-free variables are zeroed -- their contribution is
    already folded into ``b_eff``, which becomes the compacted
    problem's ``b`` (the same invariant as core/lp.compact).

    Returns ``(state', prob', idx)`` with ``idx`` (B, n_new) mapping
    new slots to OLD slots (compose with the previous map to reach
    original indices).
    """
    from ..ops import sparse as sparse_ops

    if prob.d.shape[-1] != 0 or prob.f.shape[-1] != 0:
        raise ValueError("compact_sparse supports unconstrained "
                         "problems only (C/E zero-row)")
    if not sparse_ops.is_sparse(prob.A):
        raise ValueError("compact_sparse requires a SparseEll A")
    B, n = state.x.shape
    order = jnp.argsort(~state.free, axis=-1, stable=True)
    idx = order[:, :n_new].astype(jnp.int32)
    slots = jnp.arange(n_new, dtype=jnp.int32)
    inv = jnp.full((B, n), 0, jnp.int32)
    inv = jax.vmap(lambda iv, ix: iv.at[ix].set(slots))(inv, idx)

    def take(a):
        return jax.vmap(lambda ab, ib: ab[ib])(a, idx)

    free_c = take(state.free)
    A = prob.A
    ri_old = jax.vmap(lambda r, ib: r[ib])(A.row_idx, idx)  # (B,n_new,K)
    rv_old = jax.vmap(lambda r, ib: r[ib])(A.row_val, idx)
    tgt_free = jax.vmap(lambda fb, q: fb[q.reshape(-1)].reshape(q.shape)
                        )(state.free, ri_old)
    valid = free_c[:, :, None] & tgt_free
    ri = jnp.where(valid,
                   jax.vmap(lambda iv, q: iv[q.reshape(-1)]
                            .reshape(q.shape))(inv, ri_old), 0)
    rv = jnp.where(valid, rv_old, 0.0)
    A2 = sparse_ops.SparseEll(row_idx=ri, row_val=rv,
                              col_idx=ri, col_val=rv)

    b_c = take(state.b_eff)
    zr = jnp.zeros((B, 0), jnp.float32)
    prob2 = GeneralProblem(
        A=A2, b=b_c, C=jnp.zeros((B, 0, n_new), jnp.float32), d=zr,
        E=jnp.zeros((B, 0, n_new), jnp.float32), f=zr, var_mask=free_c)
    state2 = state._replace(
        x=take(state.x), y1=take(state.y1), y2=take(state.y2),
        z1=take(state.z1), z2=take(state.z2),
        free=free_c, fixed_val=take(state.fixed_val), b_eff=b_c,
        best_sol=take(state.best_sol), x_prev=take(state.x_prev),
        fix_count=take(state.fix_count))
    return state2, prob2, idx


def solution_best(state: GeneralState) -> jnp.ndarray:
    """Rounding of the best incumbent iterate, fixed values restored."""
    rounded = (state.best_sol >= 0.5).astype(state.x.dtype)
    return jnp.where(state.free, rounded, state.fixed_val)
