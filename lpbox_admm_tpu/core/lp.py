"""Batched Lp-Box ADMM for binary LPs (combinatorial auctions et al.).

TPU-native re-design of the reference's LP solver
(LinerProgramming/LinearProgramming/cython_solver/LPboxADMMsolver.cpp):

* ``init_state``        ~ ADMM_lp_iters_init        (:489-763)
* ``step``              ~ one iteration of ADMM_lp_iters / _l2f  (:796-1068, :1341-1564)
* ``solve_window``      ~ ADMM_lp_iters_l2f window  (:1098-1574) incl. trajectory capture
* ``apply_fix``         ~ the early-fix problem reduction (:1124-1335)
* ``rule_fix_mask``     ~ the rule-based fixing counters of ADMM_lp_iters_fix (:1856-1950)
* ``solution`` / ``objective`` / ``infeasible_rows``
                        ~ get_x_sol (:1648), cal_obj (:1630), check_infeasible_l2f (:1593)

Key design deltas (SURVEY.md section 7): the instance batch is the leading
axis of every array; early fixing keeps **static shapes** via a ``free``
mask + ``fixed_val`` vector instead of physically rebuilding E1/f1/b1 --
fixed columns are zeroed out of every matvec and their objective/rhs
contributions are folded in with masked reductions (mathematically
identical to the reference's shrink, see derivation in apply_fix).  All
control flow is ``lax.scan``/``lax.while_loop`` with per-instance ``done``
freezing, so a batch of heterogeneous instances runs as one XLA program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from ..ops import cg as cg_ops
from ..ops import sparse as sparse_ops
from ..ops import woodbury
from ..ops.projections import project_box, project_shifted_lp_ball, project_nonneg
from ..ops.schedule import rho_at, gamma_at
from ..ops.stats import dual_residuals, rel_std_obj
from .problem import LpProblem

_EPS = 2.2204e-16
_BEST_INIT = 1e30     # "no feasible incumbent yet" sentinel
HI = jax.lax.Precision.HIGHEST


class LpState(NamedTuple):
    # ADMM variables
    x: jnp.ndarray            # (B, n) relaxed iterate
    y1: jnp.ndarray           # (B, n) box copy
    y2: jnp.ndarray           # (B, n) sphere copy
    y3: jnp.ndarray           # (B, m) slack copy
    z1: jnp.ndarray           # (B, n) dual for y1
    z2: jnp.ndarray           # (B, n) dual for y2
    z4: jnp.ndarray           # (B, m) dual for inequality
    # Early fixing (mask-based problem reduction)
    free: jnp.ndarray         # (B, n) bool: not yet fixed
    fixed_val: jnp.ndarray    # (B, n) value of fixed vars (0/1), 0 elsewhere
    f_eff: jnp.ndarray        # (B, m) f - E @ (fixed contribution)
    sum_fix_obj: jnp.ndarray  # (B,) accumulated objective of fixed vars
    # Convergence machinery
    obj_ring: jnp.ndarray     # (B, H) objective history ring
    obj_count: jnp.ndarray    # (B,) number of objectives pushed
    it: jnp.ndarray           # () global iteration counter
    done: jnp.ndarray         # (B,) bool
    cg_fail: jnp.ndarray      # (B,) bool: CG lost positive definiteness
    # Incumbent tracking
    cur_obj: jnp.ndarray      # (B,) binary objective of current rounding
    best_bin_obj: jnp.ndarray # (B,)
    best_sol: jnp.ndarray     # (B, n)
    # Rule-based fixing counters
    x_prev: jnp.ndarray       # (B, n)
    fix_count: jnp.ndarray    # (B, n) int32 consistency counters
    # Cached constraint matvec of the current iterate: E @ (free * x).
    # Carried across iterations so the y3 update re-uses the product the
    # previous dual step already computed (one fewer pass over E).
    ex: jnp.ndarray           # (B, m)
    # Woodbury factor (zeros-shaped placeholder when linsolve == "cg")
    ginv: jnp.ndarray         # (B, m, m) G^{-1}
    # Pre-computed E^T w for the NEXT iteration's rhs assembly, where
    # w = rho4 (f_eff - y3) - z4 is fully determined by (f_eff, ex, z4)
    # and rho4(it): folding this transpose pass into the previous
    # iteration's stacked transpose product cuts E's HBM streams from
    # 3 to 2 per iteration (the iteration is bandwidth-bound at ladder
    # scale).  Must be refreshed whenever f_eff/ex/z4/it change outside
    # step() -- see refresh_et_next.
    et_next: jnp.ndarray      # (B, n)


def _wb_ratio(cfg: SolverConfig) -> float:
    # (rho1 + rho2) / rho4; constant because the LP preset shares one
    # schedule across all rho's (LPboxADMMsolver.cpp:951-966).  A rho
    # cap (Seg-style rho_upper_limit) or per-rho schedules would break
    # this invariant -- the cached Woodbury factor would silently solve
    # the wrong system -- so refuse instead.
    if cfg.rho_upper_limit is not None:
        raise ValueError(
            "linsolve='woodbury' requires an uncapped shared rho "
            "schedule ((rho1+rho2)/rho4 must stay constant); use "
            "linsolve='cg' with rho_upper_limit")
    return 2.0


def _is_struct_ginv(ginv) -> bool:
    return getattr(ginv, "is_struct_ginv", False)


def _ginv_store(ginv, cfg: SolverConfig):
    """Apply the configured storage dtype to a freshly-computed G^-1.

    The FACTORIZATION is always f32 (ADVICE r2); only the stored copy
    the iteration streams may opt into bf16 (cfg.ginv_dtype, xl rung).
    Structured inverses (ops/struct_ginv.StructGinv) pass through --
    their blocks are already minimal.
    """
    if _is_struct_ginv(ginv):
        return ginv
    if cfg.ginv_dtype == "bfloat16":
        return ginv.astype(jnp.bfloat16)
    return ginv


def _ginv_apply(ginv, r: jnp.ndarray) -> jnp.ndarray:
    """``G^{-1} r`` for either representation: dense (B, m, m) einsum
    (bf16 storage handled by _emv's limb split) or the Schur-structured
    block elimination (ops/struct_ginv: diagonal dummy Gram block --
    ~20x less HBM per apply at the (1000, 1e5)-class rungs)."""
    if _is_struct_ginv(ginv):
        return ginv.apply(r)
    return _emv("bmk,bk->bm", ginv, r)


def _E32(E):
    """E for Gram factorization.

    f32-stored problems cast to f32 (ADVICE r2: a downstream bf16 VIEW
    must never reach the Gram).  An E *stored* bfloat16 passes through:
    storing bf16 asserts the entries are bf16-exact (the 0/1 CA
    matrices), and ``woodbury.factorize``'s einsum accumulates f32 from
    bf16 inputs exactly -- so the f32 densification (8 GB at the
    (1000, 1e5) rung, vs 4 GB bf16) never materializes anywhere."""
    if sparse_ops.is_sparse(E) or E.dtype == jnp.bfloat16:
        return E
    return E.astype(jnp.float32)


def _w_vec(f_eff, ex, z4, rho4):
    # the m-side vector whose transpose product forms the rhs E^T term:
    # w(it) = rho4 (f_eff - y3) - z4 with y3 = max(f_eff - ex - z4/rho4, 0)
    y3 = project_nonneg(f_eff - ex - z4 / rho4)
    return rho4 * (f_eff - y3) - z4


def refresh_et_next(state: LpState, prob: LpProblem,
                    cfg: SolverConfig) -> LpState:
    """Recompute the carried E^T w product for the state's CURRENT
    (f_eff, ex, z4, it).  Required after any out-of-step mutation of
    those fields (apply_fix and compact call it themselves; callers
    that advance ``it`` manually, e.g. the l2f rho fast-forward, must
    call it before running XLA windows)."""
    w = _w_vec(state.f_eff, state.ex, state.z4, rho_at(state.it, cfg))
    et = _emv("bmn,bm->bn", _mv_problem(prob, cfg).E, w)
    return state._replace(et_next=et)


def init_state(prob: LpProblem, cfg: SolverConfig,
               gram: Optional[jnp.ndarray] = None,
               ginv: Optional[jnp.ndarray] = None) -> LpState:
    """Initial state: x=1, z=0, y3 = f - E x (reference :550-727).

    ``gram``: optional precomputed (B, m, m) unshifted Gram
    ``E E^T`` (all columns free) for the Woodbury factorization --
    host-side scipy sparse assembly is O(nnz * K) where the on-device
    einsum is O(m^2 n), decisive at the (1000, 1e5)-scale rungs.
    ``ginv``: optional fully-precomputed (B, m, m) inverse of
    ``ratio I + E E^T`` (host LAPACK) -- the remote XLA compiler has
    failed outright on the m ~ 2e4 cholesky/cho_solve program."""
    B, n, m = prob.batch, prob.n, prob.m
    dt = prob.b.dtype
    free = prob.var_mask
    free_f = free.astype(dt)
    x = free_f * 1.0                      # x0 = 1 on valid vars (:583-586)
    zeros_n = jnp.zeros((B, n), dt)
    z4 = jnp.zeros((B, m), dt)
    ex = _emv("bmn,bn->bm", prob.E, x)
    y3 = prob.f - ex                      # (:720)
    cur_obj = jnp.sum(prob.b * x, axis=-1)  # best_bin_obj = b.x0 (:727)
    # With feasible-incumbent tracking the x0=1 objective (the global
    # minimum of b.x for b<=0) would freeze the incumbent forever, so
    # start from +inf and let the first feasible rounding claim it.
    best0 = jnp.full((B,), _BEST_INIT, dt) if cfg.feasible_incumbent \
        else cur_obj
    if cfg.linsolve == "woodbury":
        if ginv is not None:
            factor = woodbury.WoodburyFactor(
                ginv=ginv if _is_struct_ginv(ginv)
                else ginv.astype(jnp.float32), ratio=_wb_ratio(cfg))
        elif gram is not None:
            factor = woodbury.factorize_from_gram(gram, _wb_ratio(cfg))
        else:
            factor = woodbury.factorize(_E32(prob.E), free,
                                        _wb_ratio(cfg))
        # ginv stays f32 under matvec_dtype="bfloat16" alone: bf16
        # G^{-1} storage was tried (r2b) and REJECTED at small/mid
        # rungs -- its ~4e-3 entry rounding degrades converged
        # objectives up to 30% there (the x_exact cancellation
        # amplifies it); unlike E's exact 0/1 entries there is no free
        # lunch.  The xl rung opts in EXPLICITLY via cfg.ginv_dtype
        # (HBM-bound regime + drop-to-feasible reporting repair; see
        # config.py and the STATUS.md A/B).
        ginv = _ginv_store(factor.ginv, cfg)
    else:
        ginv = jnp.zeros((B, 1, 1), dt)
    return LpState(
        x=x, y1=x, y2=x, y3=y3, z1=zeros_n, z2=zeros_n, z4=z4,
        free=free, fixed_val=jnp.zeros((B, n), dt), f_eff=prob.f,
        sum_fix_obj=jnp.zeros((B,), dt),
        obj_ring=jnp.zeros((B, cfg.history_size), dt),
        obj_count=jnp.zeros((B,), jnp.int32),
        it=jnp.int32(0),
        done=jnp.zeros((B,), bool),
        cg_fail=jnp.zeros((B,), bool),
        cur_obj=cur_obj, best_bin_obj=best0, best_sol=x,
        x_prev=jnp.zeros((B, n), dt),
        fix_count=jnp.zeros((B, n), jnp.int32),
        ex=ex, ginv=ginv,
        et_next=_emv(
            "bmn,bm->bn", prob.E,
            _w_vec(prob.f, ex, z4, rho_at(jnp.int32(0), cfg))),
    )


def _esq_diag(E, free: jnp.ndarray) -> jnp.ndarray:
    """diag(E_f^T E_f): per-column squared norms over free columns."""
    if sparse_ops.is_sparse(E):
        return sparse_ops.colsq(E) * free.astype(jnp.float32)
    d = jnp.sum(E.astype(jnp.float32) * E.astype(jnp.float32), axis=1)
    return d * free.astype(d.dtype)


def _emv(spec: str, M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Constraint/factor einsum honouring the storage dtype.

    When ``M`` is stored bfloat16 (cfg.matvec_dtype, HBM-bound large
    shapes) the contraction streams M once in bf16 (half HBM traffic;
    exact for the 0/1 CA constraint matrix) while the vector operand is
    split into three bfloat16 limbs ``v = v0 + v1 + v2`` contracted in
    the same dot (an extra free dim on the small side, f32
    accumulation).  A naive single-limb bf16 cast of v is NOT usable
    here: its ~4e-3 rounding noise enters the dual ascent scaled by rho
    and the z4 feedback diverges at high rho (observed: relaxed
    objectives blowing up past iteration ~8k); two limbs (~16 mantissa
    bits) still stalls convergence on some instances.  Three limbs give
    ~24 mantissa bits -- f32-equivalent (verified: a 4th limb changes
    nothing) -- at negligible extra traffic (v is (n,) vs M (m,n)).
    f32 storage keeps the exact highest-precision path.

    ``M`` may also be a SparseEll (ops/sparse.py) -- the O(nnz) path
    for the very large LP rungs whose dense E exceeds HBM (the
    reference's Eigen-sparse regime, instance table at
    cython_solver/LPboxADMMsolver.cpp:2461-2486): CPU backends gather,
    TPU routes through the MXU one-hot matmuls (ops/mxu_sparse), where
    stacked specs share one one-hot pass across the k vectors."""
    if sparse_ops.is_sparse(M):
        if spec == "bmn,bn->bm":
            return sparse_ops.mv(M, v)
        if spec == "bmn,bm->bn":
            return sparse_ops.mtv(M, v)
        if spec == "bmn,bkn->bkm":
            return sparse_ops.mv_many(M, v)
        if spec == "bmn,bkm->bkn":
            return sparse_ops.mtv_many(M, v)
        raise ValueError(f"unsupported sparse einsum spec {spec!r}")
    if M.dtype == jnp.bfloat16:
        # limb rounding via lax.reduce_precision: the XLA TPU pipeline
        # folds astype(bf16).astype(f32) round-trips to identity, which
        # cancels the residual subtraction and silently degrades the
        # split to ONE limb (measured on-chip: 1.7e-3 matvec error,
        # scripts/diag_struct_tpu.py r4c) -- the exact failure mode the
        # limb split exists to avoid.  reduce_precision cannot be
        # folded; the astype after it is exact.
        v32 = v.astype(jnp.float32)
        limbs = []
        for _ in range(3):                        # 3x8 mantissa bits
            vf = jax.lax.reduce_precision(v32, 8, 7)
            limbs.append(vf.astype(jnp.bfloat16))
            v32 = v32 - vf
        vs = jnp.stack(limbs, axis=1)             # (B, 3, ...)
        in_m, rest = spec.split(",")
        in_v, out = rest.split("->")
        spec2 = f"{in_m},{in_v[0]}L{in_v[1:]}->{out[0]}L{out[1:]}"
        r = jnp.einsum(spec2, M, vs, preferred_element_type=jnp.float32)
        return r.sum(axis=1)
    return jnp.einsum(spec, M, v, preferred_element_type=jnp.float32,
                      precision=HI)


def _mv_problem(prob: LpProblem, cfg: SolverConfig) -> LpProblem:
    """Problem view for the solve loop: E in the configured matvec
    storage dtype (cast once, outside the iteration loop)."""
    if sparse_ops.is_sparse(prob.E):
        return prob      # sparse values stay f32 (indices dominate traffic)
    if cfg.matvec_dtype == "bfloat16" and prob.E.dtype != jnp.bfloat16:
        return prob._replace(E=prob.E.astype(jnp.bfloat16))
    return prob


def step(state: LpState, prob: LpProblem, cfg: SolverConfig,
         skip_cvg_at: Optional[int] = None,
         rule_fixing: bool = False) -> LpState:
    """One ADMM iteration over the whole batch (reference :796-1068).

    ``skip_cvg_at``: global iteration at which the y1/y2 stop is not
    checked (the plain solver skips its very first iteration,
    ``iter != iter_start`` at :934).  ``rule_fixing`` also updates the
    |x - x_prev| consistency counters of ADMM_lp_iters_fix (:1856-1871);
    the caller decides when to turn counters into fixes.
    """
    dt = state.x.dtype
    it = state.it
    active = ~state.done
    act_n = active[:, None]
    free_f = state.free.astype(dt)

    rho1 = rho_at(it, cfg)
    rho2 = rho1
    rho4 = rho1
    gamma = gamma_at(it, cfg)

    # --- y updates -------------------------------------------------------
    y1 = project_box(state.x + state.z1 / rho1)                     # :806-809
    y2 = project_shifted_lp_ball(state.x + state.z2 / rho2,
                                 cfg.projection_lp, mask=state.free)  # :815-818
    # E @ (free * x) is cached from the previous dual step (state.ex)
    y3 = project_nonneg(state.f_eff - state.ex - state.z4 / rho4)   # :824-828

    # --- x update (PCG or Woodbury) -------------------------------------
    # rhs = rho1 y1 + rho2 y2 - (b + z1 + z2) + E^T(rho4 (f_eff - y3) - z4)
    # The E^T term was pre-computed by the PREVIOUS iteration's stacked
    # transpose pass (state.et_next; init_state/refresh_et_next seed it)
    # -- this iteration owes its successor the same favour below. :872-878
    et_term = state.et_next
    rhs = free_f * (rho1 * y1 + rho2 * y2
                    - (prob.b + state.z1 + state.z2) + et_term)
    x0 = free_f * y1                                                # :892

    failed = jnp.zeros((prob.batch,), bool)
    c = rho1 + rho2

    def matvec(p):
        ep = _emv("bmn,bn->bm", prob.E, free_f * p)
        etep = _emv("bmn,bm->bn", prob.E, ep)
        return free_f * (c * p + rho4 * etep)

    if cfg.linsolve not in ("cg", "woodbury"):
        raise ValueError(f"unknown linsolve {cfg.linsolve!r}; "
                         "expected 'cg' or 'woodbury'")
    if cfg.linsolve == "woodbury":
        # The iteration is HBM-bound on passes over E, which streams
        # from HBM exactly TWICE per iteration: one stacked forward
        # pass F:[rhs, x0] and one stacked transpose pass
        # T:[u, E x0, w_keep, w_exact].  The transpose pass pre-pays
        # the NEXT iteration's rhs E^T term for both possible outcomes
        # of the warm-start branch (their duals/y3 lookahead is m-side
        # elementwise math), and E @ x_new needs no pass at all:
        # E_f E_f^T u = (G - ratio I) u = E rhs - ratio u.
        fw = _emv("bmn,bkn->bkm", prob.E, jnp.stack([rhs, x0], axis=1))
        Erhs, Ex0 = fw[:, 0], fw[:, 1]
        u = _ginv_apply(state.ginv, Erhs)
        Ex_exact = (_wb_ratio(cfg) / c) * u
        rho4n = rho_at(it + 1, cfg)
        z4_keep = state.z4 + gamma * rho4 * (Ex0 + y3 - state.f_eff)
        z4_exact = state.z4 + gamma * rho4 * (Ex_exact + y3
                                              - state.f_eff)
        w_keep = _w_vec(state.f_eff, Ex0, z4_keep, rho4n)
        w_exact = _w_vec(state.f_eff, Ex_exact, z4_exact, rho4n)
        tv = _emv("bmn,bkm->bkn", prob.E,
                  jnp.stack([u, Ex0, w_keep, w_exact], axis=1))
        EtU, EtEx0, et_keep, et_exact = (tv[:, 0], tv[:, 1],
                                         tv[:, 2], tv[:, 3])
        x_exact = free_f * (rhs - EtU) / c
        # PCG's warm-start early exit (cg.py / reference :204-209): if y1
        # already solves the system to pcg_tol the iterate *is* y1, which
        # is what ultimately fires the ||x-y1|| stop.  Without this the
        # exact solve hovers an O(1/rho) gap away from y1 forever.
        Mx0 = free_f * (c * x0 + rho4 * EtEx0)
        r0 = rhs - Mx0
        keep = jnp.sum(r0 * r0, axis=-1) \
            < (cfg.pcg_tol ** 2) * jnp.sum(rhs * rhs, axis=-1)
        x_new = jnp.where(keep[:, None], x0, x_exact)
        ex_branch = jnp.where(keep[:, None], Ex0, Ex_exact)
        et_next = jnp.where(keep[:, None], et_keep, et_exact)
    else:
        diag = jnp.where(state.free, c + rho4 * _esq_diag(prob.E, state.free),
                         1.0)
        res = cg_ops.pcg(matvec, rhs, x0, diag, cfg.pcg_tol,
                         cfg.pcg_maxiters, active=active)
        x_new, failed = res.x, res.failed
    # CG failure => reference aborts the solve keeping the previous
    # iterate (:1450-1454); here the instance freezes via done below.
    x = jnp.where(act_n & ~failed[:, None], free_f * x_new, state.x)

    # --- dual ascent -----------------------------------------------------
    z1 = state.z1 + gamma * rho1 * free_f * (x - y1)                # :917
    z2 = state.z2 + gamma * rho2 * free_f * (x - y2)                # :918
    if cfg.linsolve == "woodbury":
        ex_new = jnp.where(act_n & ~failed[:, None], ex_branch, state.ex)
    else:
        ex_new = _emv("bmn,bn->bm", prob.E, free_f * x)
    z4 = state.z4 + gamma * rho4 * (ex_new + y3 - state.f_eff)      # :919-924
    if cfg.linsolve != "woodbury":
        # pre-pay the next iteration's rhs E^T term (the woodbury
        # branch folded this into its stacked transpose pass)
        et_next = _emv("bmn,bm->bn", prob.E,
                       _w_vec(state.f_eff, ex_new, z4,
                              rho_at(it + 1, cfg)))

    # --- convergence -----------------------------------------------------
    c1, c2 = dual_residuals(x, y1, y2, state.free)                  # :931-933
    cvg = (c1 <= cfg.stop_threshold) & (c2 <= cfg.stop_threshold)
    if skip_cvg_at is not None:
        cvg = cvg & (it != skip_cvg_at)
    cvg = cvg | failed

    obj_val = jnp.sum(prob.b * free_f * x, axis=-1)                 # :972
    push = active & ~cvg
    H = cfg.history_size
    slot = jnp.mod(state.obj_count, H)
    onehot = slot[:, None] == jnp.arange(H)[None, :]
    obj_ring = jnp.where(push[:, None] & onehot, obj_val[:, None],
                         state.obj_ring)
    obj_count = state.obj_count + push.astype(jnp.int32)
    std = rel_std_obj(obj_ring, obj_count, obj_val)
    std_stop = push & (std <= cfg.std_threshold)                    # :977

    newly_done = active & (cvg | std_stop)

    # --- incumbent (skipped on the break iteration, :1001-1011) ----------
    track = active & ~newly_done
    if cfg.incumbent_stride > 1:
        # sample the incumbent every incumbent_stride iterations (cfg
        # docstring); scalar gate so both the XLA and the fused Pallas
        # paths agree bit-for-bit
        track = track & jnp.equal(jnp.mod(it, cfg.incumbent_stride), 0)
    cur_idx = free_f * (x >= 0.5).astype(dt)
    obj_bin = jnp.sum(prob.b * cur_idx, axis=-1)
    cur_obj = jnp.where(track, obj_bin, state.cur_obj)
    better = track & (state.best_bin_obj >= obj_bin)
    if cfg.feasible_incumbent:
        # only roundings that satisfy the reduced constraints on rows
        # the free variables still couple to (cfg docstring)
        def _feas(_):
            exr = _emv("bmn,bn->bm", prob.E, cur_idx)
            return jnp.all((exr <= state.f_eff + 1e-6) | ~prob.row_mask,
                           axis=-1)
        if cfg.incumbent_stride > 1:
            # real branch on the scalar gate: at ladder shapes the
            # feasibility pass is ~1/4 of the per-iteration HBM
            # traffic, so actually skip it on off-stride iterations
            # (track is all-False then, making `feas` irrelevant)
            feas = jax.lax.cond(
                jnp.equal(jnp.mod(it, cfg.incumbent_stride), 0),
                _feas, lambda _: jnp.zeros((x.shape[0],), bool), None)
        else:
            feas = _feas(None)
        better = better & feas
    best_bin_obj = jnp.where(better, obj_bin, state.best_bin_obj)
    best_sol = jnp.where(better[:, None], x, state.best_sol)

    # --- rule-based fixing counters (:1856-1871) -------------------------
    if rule_fixing:
        det = jnp.abs(x - state.x_prev) <= cfg.fix_threshold
        fix_count = jnp.where(act_n & det & state.free,
                              state.fix_count + 1,
                              jnp.where(act_n & state.free, 0,
                                        state.fix_count))
    else:
        fix_count = state.fix_count

    upd = lambda new, old: jnp.where(act_n, new, old)
    updm = lambda new, old: jnp.where(active[:, None], new, old)
    return state._replace(
        x=upd(x, state.x), y1=upd(y1, state.y1), y2=upd(y2, state.y2),
        y3=updm(y3, state.y3),
        z1=upd(z1, state.z1), z2=upd(z2, state.z2), z4=updm(z4, state.z4),
        ex=jnp.where(act_n, ex_new, state.ex),
        et_next=upd(et_next, state.et_next),
        obj_ring=obj_ring, obj_count=obj_count,
        it=it + 1,
        done=state.done | newly_done,
        cg_fail=state.cg_fail | failed,
        cur_obj=cur_obj, best_bin_obj=best_bin_obj, best_sol=best_sol,
        x_prev=upd(x, state.x_prev),
        fix_count=fix_count,
    )


def solve_window(state: LpState, prob: LpProblem, cfg: SolverConfig,
                 window: int, record: bool = True,
                 skip_cvg_at: Optional[int] = None,
                 rule_fixing: bool = False
                 ) -> Tuple[LpState, Optional[jnp.ndarray]]:
    """Run ``window`` iterations via lax.scan, optionally capturing the
    per-iteration x trajectory (reference x_iters, :1472-1475).

    Returns (state, traj) with traj of shape (B, n, window) matching the
    reference's (n_remaining, ws) layout plus the batch axis; rows of
    fixed/done variables repeat their frozen value.
    """

    prob = _mv_problem(prob, cfg)   # cast once, outside the scan

    def body(s, _):
        s = step(s, prob, cfg, skip_cvg_at=skip_cvg_at,
                 rule_fixing=rule_fixing)
        out = s.x if record else None
        return s, out

    state, traj = jax.lax.scan(body, state, None, length=window)
    if record:
        traj = jnp.moveaxis(traj, 0, -1)   # (W, B, n) -> (B, n, W)
    return state, traj


def apply_fix(state: LpState, prob: LpProblem, vec: jnp.ndarray,
              cfg: SolverConfig, min_fix: Optional[int] = None,
              ginv=None) -> LpState:
    """Fix variables per decision vector ``vec`` (mask-based shrink).

    ``vec`` is (B, n) with +1 (fix to 1), 0 (fix to 0), -1 (leave free),
    exactly the Cython bridge's convention (lpbox.pyx:31, reference
    :1136-1149).  Only currently-free variables can be fixed.  Per
    instance, if the number of newly fixed variables is <= ``min_fix``
    the whole round is skipped (trainer.py:533-535).

    ``ginv``: optional caller-refactorized Woodbury inverse for the
    POST-fix free mask -- dense (B, m, m) or a StructGinv.  Required
    for structured inverses (the in-jit refactorize only builds dense
    Grams); the host driver mirrors the newly/do decision, rebuilds
    the Schur blocks on host (seconds -- ops/struct_ginv), and passes
    it here.  The per-instance ``do`` skip still merges old-vs-new.

    Equivalence to the reference's physical shrink (:1124-1335): with
    free mask m and fixed values v, the reduced problem
    ``min b1.x1 s.t. E1 x1 <= f - E2 x2`` is reproduced by masking every
    matvec to free columns and replacing f with
    ``f_eff = f - E @ ((1-m) * v)``; ``sum_fix_obj`` accumulates b2.x2.
    """
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
    free_f = free.astype(dt)

    fix_obj = jnp.sum(prob.b * val * newly.astype(dt), axis=-1)
    sum_fix_obj = state.sum_fix_obj + fix_obj                        # :1248-1249

    fixed_contrib = _emv("bmn,bn->bm", prob.E,
                         (~free).astype(dt) * fixed_val)
    f_eff = jnp.where(do[:, None], prob.f - fixed_contrib, state.f_eff)  # :1276-1278

    # all-fixed or vanishing remaining iterate => converged (:1212-1223)
    x_free_norm = jnp.sqrt(jnp.sum((free_f * state.x) ** 2, axis=-1))
    empty = jnp.sum(free, axis=-1) == 0
    done = state.done | (do & (empty | (x_free_norm < 1e-3)))

    ex = _emv("bmn,bn->bm", prob.E, free_f * state.x)
    ex = jnp.where(do[:, None], ex, state.ex)
    if ginv is not None:
        # caller-refactorized inverse (host Schur rebuild for struct
        # problems, or any precomputed dense inverse): merge per the
        # per-instance skip decision
        ginv = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                do.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
            ginv, state.ginv)
    elif cfg.linsolve == "woodbury":
        if _is_struct_ginv(state.ginv):
            raise NotImplementedError(
                "early fixing with a Schur-structured G^-1 needs a "
                "caller-refactorized inverse: mirror the newly/do "
                "decision on host, rebuild via ops/struct_ginv."
                "build_struct_ginv(free=...), and pass it as "
                "apply_fix(..., ginv=new_ginv)")
        # f32 cast mirrors init_state: G^-1 in bf16 was measured to
        # cost up to 30% objective; guard against a bf16 problem view
        # ever reaching this refactorization (round-2 ADVICE)
        factor = woodbury.factorize(_E32(prob.E), free, _wb_ratio(cfg))
        ginv = jnp.where(do[:, None, None], _ginv_store(factor.ginv, cfg),
                         state.ginv)
    else:
        ginv = state.ginv

    ns = state._replace(
        free=free, fixed_val=fixed_val, f_eff=f_eff,
        sum_fix_obj=sum_fix_obj, done=done,
        x_prev=jnp.where(do[:, None], state.x, state.x_prev),   # :1225
        ex=ex, ginv=ginv,
    )
    # f_eff/ex changed -> the carried E^T w product is stale
    return refresh_et_next(ns, prob, cfg)


def fix_decision_host(state: LpState, vec, cfg: SolverConfig,
                      min_fix: Optional[int] = None):
    """Host mirror of apply_fix's newly/do decision.

    Returns numpy ``(do, new_free)``: which instances will actually
    fix this round and the post-fix free mask -- what a host-side
    refactorization (ops/struct_ginv.build_struct_ginv(free=...))
    needs BEFORE calling ``apply_fix(..., ginv=...)``."""
    import numpy as np

    if min_fix is None:
        min_fix = cfg.min_fix
    free = np.asarray(state.free)
    done = np.asarray(state.done)
    v = np.asarray(vec)
    want = free & (v >= 0.0) & ~done[:, None]
    do = want.sum(-1) > min_fix
    newly = want & do[:, None]
    return do, free & ~newly


def rule_fix_vec(state: LpState, cfg: SolverConfig) -> jnp.ndarray:
    """Decision vector from the consistency counters (ADMM_lp_iters_fix).

    Variables whose iterate moved <= fix_threshold for ``consistency``
    consecutive iterations are fixed to round(x) (:1861-1870, :2012).
    Returns (B, n) in the +1/0/-1 convention of apply_fix.
    """
    flag = state.free & (state.fix_count >= cfg.consistency)
    val = (state.x >= 0.5).astype(state.x.dtype)
    return jnp.where(flag, val, -1.0)


def solution(state: LpState) -> jnp.ndarray:
    """Full-width binary solution scattered to original indices.

    Free vars are rounded at 0.5, fixed vars keep their fixed value
    (reference get_x_sol, :1648-1665).
    """
    rounded = (state.x >= 0.5).astype(state.x.dtype)
    return jnp.where(state.free, rounded, state.fixed_val)


def objective(state: LpState) -> jnp.ndarray:
    """Total binary objective = sum_fix_obj + cur_obj (cal_obj, :1630-1642)."""
    any_free = jnp.any(state.free, axis=-1)
    return jnp.where(any_free, state.sum_fix_obj + state.cur_obj,
                     state.sum_fix_obj)


def infeasible_rows(state: LpState, prob: LpProblem) -> jnp.ndarray:
    """Count constraint rows violated by the restored full solution
    (check_infeasible_l2f, :1593-1612)."""
    x_full = solution(state)
    ex = _emv("bmn,bn->bm", prob.E, x_full)
    viol = (ex > prob.f) & prob.row_mask
    return jnp.sum(viol, axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "max_iters", "window",
                                             "rule_fixing"))
def solve(prob: LpProblem, cfg: SolverConfig,
          max_iters: Optional[int] = None, window: int = 100,
          rule_fixing: bool = False) -> LpState:
    """Plain (or rule-fixing) full solve to convergence.

    Runs window-quantized iterations inside a ``lax.while_loop`` until
    every instance is done or ``max_iters`` is reached -- the TPU
    equivalent of ADMM_lp_iters(0, max_iters) (:766) and, with
    ``rule_fixing``, of ADMM_lp_iters_fix (:1689).
    """
    if max_iters is None:
        max_iters = cfg.max_iters
    state = init_state(prob, cfg)

    def cond(s):
        return jnp.logical_and(s.it < max_iters, ~jnp.all(s.done))

    def body(s):
        s, _ = solve_window(s, prob, cfg, window, record=False,
                            skip_cvg_at=0, rule_fixing=rule_fixing)
        if rule_fixing:
            s = apply_fix(s, prob, rule_fix_vec(s, cfg), cfg)
        return s

    return jax.lax.while_loop(cond, body, state)


def solve_blocked(prob: LpProblem, cfg: SolverConfig, block: int = 8,
                  max_iters: Optional[int] = None, window: int = 500,
                  stream: bool = False,
                  gram: Optional[jnp.ndarray] = None,
                  ginv: Optional[jnp.ndarray] = None
                  ) -> Tuple[LpState, list]:
    """Host-driven blocked solve with per-block early exit.

    ``solve``'s single ``while_loop`` gates every instance on the
    batch's slowest straggler (convergence iteration counts vary ~2x
    across CA instances).  Here the batch is split into blocks of
    ``block`` instances; each block runs window-quantized jit
    dispatches until all ITS instances converge, so finished blocks
    stop paying for stragglers elsewhere -- the XLA-path counterpart
    of the fused Pallas kernel's in-kernel per-block all-done exit.
    Host dispatches also keep single-dispatch duration bounded (the
    axon remote executor has crashed on a 20k-iteration xl-rung
    while_loop).  All blocks share one compiled executable (identical
    shapes).

    Returns the merged state (``it`` = max over blocks) and the
    per-block iteration counts.
    """
    if max_iters is None:
        max_iters = cfg.max_iters
    B = prob.batch
    assert B % block == 0, (B, block)

    if stream:
        # single-E-stream Pallas sweep (ops/pallas_stream): the HBM-
        # bound large rungs' fast path; TPU only (interpret elsewhere)
        from ..ops import pallas_stream

        @functools.partial(jax.jit, static_argnames=("c", "w", "skip"))
        def win(s, p, c, w, skip):
            return pallas_stream.lp_window_stream(s, p, c, w,
                                                  skip_cvg_at=skip)
    else:
        @functools.partial(jax.jit, static_argnames=("c", "w", "skip"))
        def win(s, p, c, w, skip):
            s, _ = solve_window(s, p, c, w, record=False,
                                skip_cvg_at=skip)
            return s

    jinit = jax.jit(init_state, static_argnames=("cfg",))
    if block == B:
        # single block: skip the per-block slice -- a[0:B] on device
        # arrays COPIES, doubling E's HBM footprint (fatal at the
        # (1000, 1e5) rung where E alone is ~4 GB)
        probs, grams, ginvs = [prob], [gram], [ginv]
    else:
        probs = [jax.tree_util.tree_map(lambda a: a[lo:lo + block], prob)
                 for lo in range(0, B, block)]
        grams = [None if gram is None else gram[lo:lo + block]
                 for lo in range(0, B, block)]
        # tree_map: ginv may be a structured pytree (StructGinv), whose
        # NamedTuple [] would slice FIELDS, not the batch axis
        ginvs = [None if ginv is None else
                 jax.tree_util.tree_map(lambda a: a[lo:lo + block], ginv)
                 for lo in range(0, B, block)]
    states = [jinit(p, cfg, gram=g, ginv=gi)
              for p, g, gi in zip(probs, grams, ginvs)]
    iters = [0] * len(probs)
    live = set(range(len(probs)))
    first = True
    while live:
        # Queue one window for EVERY live block before syncing: JAX
        # dispatch is async, so the per-dispatch tunnel latency of the
        # axon remote executor is paid once per ROUND, not once per
        # block (the sequential-block version spent ~half the mid-rung
        # wall on host round-trips).
        for k in sorted(live):
            states[k] = win(states[k], probs[k], cfg, window,
                            0 if first else None)
        first = False
        flags = jax.device_get([(states[k].it, jnp.all(states[k].done))
                                for k in sorted(live)])
        for k, (it, done) in zip(sorted(live), flags):
            iters[k] = int(it)
            if bool(done) or int(it) >= max_iters:
                live.discard(k)
    merged = jax.tree_util.tree_map(
        lambda *xs: (jnp.max(jnp.stack(xs)) if xs[0].ndim == 0
                     else jnp.concatenate(xs, axis=0)), *states)
    return merged, iters


def solve_auto(prob: LpProblem, cfg: SolverConfig,
               max_iters: Optional[int] = None,
               bf16_iter_cap: int = 12000,
               bf16_bytes_min: int = 2 * 1024 * 1024,
               blocked_bytes_min: int = 1024 * 1024,
               ) -> Tuple[LpState, str]:
    """Plain solve through the measured-best path for the problem shape.

    Dispatch rule (TPU v5e ladder measurements, STATUS.md):

    - per-instance VMEM footprint admits an instance block of >= 2
      -> fused Pallas window kernel (``ops/pallas_lp.solve_fused``,
      in-kernel all-done early exit; bt=2 measured best at both the
      (100,500) and (200,1000) rungs);
    - per-instance E over ``blocked_bytes_min`` -> host round-robin
      blocked solve (per-block early exit, one sync per round), with
      bf16 constraint storage + 3-limb split once E exceeds
      ``bf16_bytes_min`` (HBM-bandwidth-bound regime; iteration-capped
      at ``bf16_iter_cap`` -- the bf16 trajectory rarely satisfies the
      strict 1e-4 dual stop, incumbent selection carries quality);
    - otherwise the single ``while_loop`` solve.

    Returns ``(state, path)`` where ``path`` names the dispatch taken.
    The fused kernel is TPU-only (interpret mode on CPU is test-speed);
    on non-TPU backends the XLA paths are used.
    """
    from ..ops import pallas_lp
    if max_iters is None:
        max_iters = cfg.max_iters
    if sparse_ops.is_sparse(prob.E):
        # O(nnz) storage: VMEM kernels and bf16 streaming don't apply;
        # blocked dispatch still pays off (per-block early exit)
        if prob.batch >= 8 and prob.batch % 8 == 0:
            st, _ = solve_blocked(prob, cfg, block=8, window=500,
                                  max_iters=max_iters)
            return st, "blocked-sparse"
        return solve(prob, cfg, max_iters=max_iters), "xla-sparse"
    B, m, n = prob.batch, prob.m, prob.n
    e_bytes = 4 * m * n
    on_tpu = jax.default_backend() not in ("cpu",)
    bt = pallas_lp.auto_bt(B, m, n)
    if on_tpu and bt >= 2:
        st = pallas_lp.solve_fused(prob, cfg, max_iters=max_iters,
                                   window=100, bt=min(bt, 2))
        return st, f"fused(bt={min(bt, 2)})"
    # f32 E does not admit bt=2, but the kernel's bf16 E storage
    # (exact for 0/1 constraint matrices) might: prefer the
    # VMEM-resident kernel over HBM streaming when it does
    bt16 = pallas_lp.auto_bt(B, m, n, e_bytes=2)
    if on_tpu and bt16 >= 2 and jnp.all((prob.E == 0) | (prob.E == 1)):
        st = pallas_lp.solve_fused(
            prob, cfg.replace(matvec_dtype="bfloat16"),
            max_iters=max_iters, window=100, bt=2)
        return st, "fused-bf16(bt=2)"
    if e_bytes >= blocked_bytes_min and B >= 8 and B % 8 == 0:
        cfg_b = cfg
        cap = max_iters
        if e_bytes >= bf16_bytes_min:
            cfg_b = cfg.replace(matvec_dtype="bfloat16")
            cap = min(max_iters, bf16_iter_cap)
        st, _ = solve_blocked(prob, cfg_b, block=8, window=500,
                              max_iters=cap)
        tag = "-bf16" if cfg_b is not cfg else ""
        return st, f"blocked{tag}"
    return solve(prob, cfg, max_iters=max_iters), "xla"


def compact(state: LpState, prob: LpProblem, cfg: SolverConfig,
            n_new: int, m_new: Optional[int] = None
            ) -> Tuple[LpState, LpProblem, jnp.ndarray]:
    """Physically shrink the problem to ``n_new`` columns and (optionally)
    ``m_new`` constraint rows (bucketed).

    The mask-based fixing keeps shapes static, so a masked iteration
    still costs O(m * n) regardless of how many variables are fixed --
    unlike the reference's physical shrink (:1124-1335) whose per-
    iteration cost drops with n.  This restores that speedup the TPU
    way: gather the free columns (plus enough fixed ones as padding)
    into a smaller statically-shaped problem at a window boundary, and
    drop constraint rows whose free-column support is empty (they no
    longer couple to the remaining variables; their feasibility is
    fully determined by the fixed values and re-checked on the original
    problem at the end).  One recompile per bucket size, amortized
    across the batch.

    Returns (state', prob', orig_idx) where orig_idx (B, n_new) maps
    compacted columns to original indices; use ``scatter_solution`` to
    reassemble the full-width solution.  Requires every instance to
    have at most ``n_new`` free variables (and, if ``m_new`` is given,
    at most ``m_new`` rows with free support).
    """
    if sparse_ops.is_sparse(prob.E):
        raise ValueError("compact requires a dense E (column gather); "
                         "sparse problems iterate mask-based")
    B, n = state.x.shape
    order = jnp.argsort(~state.free, axis=-1, stable=True)   # free first
    idx = order[:, :n_new]

    def take(a):
        return jnp.take_along_axis(a, idx, axis=-1)

    E2 = jnp.take_along_axis(
        prob.E, jnp.broadcast_to(idx[:, None, :],
                                 (B, prob.m, n_new)), axis=-1)
    free2 = take(state.free)
    # Zero the columns of already-fixed (padding) variables: their
    # constraint contribution is baked into f_eff == prob2.f, so a later
    # apply_fix on the compacted problem must not re-subtract them when
    # it recomputes f_eff from E2 @ ((~free) * fixed_val).
    E2 = E2 * free2[:, None, :].astype(E2.dtype)
    f2 = state.f_eff
    rmask2 = prob.row_mask
    y3_2, z4_2 = state.y3, state.z4
    if m_new is not None and m_new < prob.m:
        support = jnp.any(
            (jnp.abs(E2) > 0) & free2[:, None, :], axis=-1) \
            & prob.row_mask
        rorder = jnp.argsort(~support, axis=-1, stable=True)
        ridx = rorder[:, :m_new]

        def rtake(a):
            return jnp.take_along_axis(a, ridx, axis=-1)

        E2 = jnp.take_along_axis(
            E2, jnp.broadcast_to(ridx[:, :, None],
                                 (B, m_new, n_new)), axis=1)
        f2 = rtake(f2)
        rmask2 = rtake(support)
        y3_2 = rtake(y3_2)
        z4_2 = rtake(z4_2)
    prob2 = LpProblem(b=take(prob.b), E=E2, f=f2,
                      row_mask=rmask2, var_mask=free2)
    if cfg.linsolve == "woodbury":
        factor = woodbury.factorize(E2, free2, _wb_ratio(cfg))
        ginv2 = _ginv_store(factor.ginv, cfg)
    else:
        ginv2 = state.ginv
    dt = state.x.dtype
    ex2 = jnp.einsum("bmn,bn->bm", E2, free2.astype(dt) * take(state.x),
                     preferred_element_type=jnp.float32, precision=HI)
    state2 = state._replace(
        x=take(state.x), y1=take(state.y1), y2=take(state.y2),
        y3=y3_2, z4=z4_2, f_eff=f2,
        z1=take(state.z1), z2=take(state.z2),
        free=free2, fixed_val=take(state.fixed_val),
        best_sol=take(state.best_sol), x_prev=take(state.x_prev),
        fix_count=take(state.fix_count),
        ex=ex2, ginv=ginv2,
        et_next=jnp.zeros_like(take(state.et_next)))
    state2 = refresh_et_next(state2, prob2, cfg)
    return state2, prob2, idx


def scatter_solution(state_c: LpState, idx: jnp.ndarray,
                     fixed_val_full: jnp.ndarray,
                     free_full: jnp.ndarray) -> jnp.ndarray:
    """Reassemble the full-width binary solution after compaction.

    ``fixed_val_full``/``free_full`` are the full-width fixing snapshot
    taken at compaction time; columns selected into the compacted
    problem are overwritten by its solution (get_x_sol scatter,
    reference :1648-1665).
    """
    sol_c = solution(state_c)
    base = jnp.where(free_full, 0.0, fixed_val_full)

    def put(b, i, v):
        return b.at[i].set(v)

    return jax.vmap(put)(base, idx, sol_c)


def objective_best(state: LpState) -> jnp.ndarray:
    """Objective of the best incumbent rounding seen during the solve.

    The reference tracks best_bin_obj/best_sol (:1008-1011) but reports
    the last iterate's rounding (allres.csv writes cur_obj, :1081); this
    accessor exposes the better incumbent -- a strict quality
    improvement available to callers who don't need reference parity.
    Falls back to the last rounding while no (feasible) incumbent has
    been recorded yet.
    """
    any_free = jnp.any(state.free, axis=-1)
    best = jnp.where(state.best_bin_obj >= _BEST_INIT, state.cur_obj,
                     state.best_bin_obj)
    return jnp.where(any_free, state.sum_fix_obj + best,
                     state.sum_fix_obj)


def solution_best(state: LpState) -> jnp.ndarray:
    """Full-width rounding of the best incumbent iterate (falls back to
    the last iterate while no incumbent has been recorded)."""
    src = jnp.where((state.best_bin_obj >= _BEST_INIT)[:, None],
                    state.x, state.best_sol)
    rounded = (src >= 0.5).astype(state.x.dtype)
    return jnp.where(state.free, rounded, state.fixed_val)


def select_solution(prob: LpProblem, sol_last: jnp.ndarray,
                    sol_best: jnp.ndarray, repair_rounds: int = 0,
                    swap_rounds: int = 0, drop_rounds: int = 0):
    """Pick, per instance, between the final rounding and the best
    feasible incumbent rounding (both full-width, original indices).

    The incumbent wins when it is feasible on the ORIGINAL problem and
    either improves the objective or the final rounding is itself
    infeasible.  Returns (sol, obj, infeasible_rows) of the selection.
    A strict quality improvement over the reference, which always
    reports the last rounding (allres.csv, :1081).

    ``repair_rounds > 0`` additionally polishes the selected solution
    with the greedy set-packing refill (ops/repair.greedy_repair):
    flips in up-to-that-many still-fitting bids, never degrading the
    objective or feasibility.  ``swap_rounds > 0`` follows with 1-for-1
    swap rounds (ops/repair.swap_repair) that can also remove a
    blocking bid for a better one.  ``drop_rounds > 0`` FIRST evicts
    bids covering violated rows (ops/repair.drop_to_feasible) so an
    infeasible final rounding -- e.g. an iteration-capped solve whose
    incumbent never turned feasible -- becomes a reportable feasible
    solution the refill/swap can then improve.  Keep all three equal on
    both sides of any gap comparison (reporting semantics must match).
    """
    sols = jnp.stack([sol_last, sol_best], axis=1)          # (B, 2, n)
    ex = _emv("bmn,bkn->bkm", prob.E, sols)
    viol = (ex > prob.f[:, None]) & prob.row_mask[:, None]
    infeas = jnp.sum(viol, axis=-1)                          # (B, 2)
    obj = jnp.einsum("bn,bkn->bk", prob.b, sols,
                     preferred_element_type=jnp.float32, precision=HI)
    use_best = (infeas[:, 1] == 0) \
        & ((obj[:, 1] <= obj[:, 0]) | (infeas[:, 0] > 0))
    k = use_best.astype(jnp.int32)
    sol = jnp.take_along_axis(sols, k[:, None, None], axis=1)[:, 0]
    obj_sel = jnp.take_along_axis(obj, k[:, None], axis=1)[:, 0]
    inf_sel = jnp.take_along_axis(infeas, k[:, None], axis=1)[:, 0]
    if repair_rounds or swap_rounds or drop_rounds:
        if sparse_ops.is_sparse(prob.E):
            raise ValueError(
                "greedy/swap repair needs a dense E (per-column slack "
                "comparisons); call select_solution without repair on "
                "sparse problems")
        from ..ops.repair import (drop_to_feasible, greedy_repair,
                                  swap_repair)
        if drop_rounds:
            sol = drop_to_feasible(prob, sol, rounds=drop_rounds)
        if repair_rounds:
            sol = greedy_repair(prob, sol, rounds=repair_rounds)
        if swap_rounds:
            sol = swap_repair(prob, sol, rounds=swap_rounds)
        obj_sel = jnp.einsum("bn,bn->b", prob.b, sol,
                             preferred_element_type=jnp.float32,
                             precision=HI)
        exr = jnp.einsum("bmn,bn->bm", prob.E, sol,
                         preferred_element_type=jnp.float32,
                         precision=HI)
        inf_sel = jnp.sum((exr > prob.f) & prob.row_mask, axis=-1)
    return sol, obj_sel, inf_sel
