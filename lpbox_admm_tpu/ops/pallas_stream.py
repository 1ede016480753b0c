"""Single-stream Pallas kernel for HBM-bound LP rungs.

The two-pass XLA iteration (core/lp.py) streams E from HBM exactly
twice per iteration: a stacked forward pass F:[rhs, x0] and a stacked
transpose pass T:[u, Ex0, w_keep, w_exact].  At the large ladder rungs
(e.g. (800, 4000), reference instance table at
cython_solver/LPboxADMMsolver.cpp:2461-2486) the iteration sits at the
HBM bandwidth floor of THAT scheme (STATUS r2 probe).  This kernel
fuses BOTH passes into ONE stream of E per iteration:

* the sweep is COLUMN-blocked: each grid cell loads an (m, NB) tile of
  E into VMEM once and uses it twice -- a transpose contraction that
  completes iteration t, and a forward contraction that pre-pays
  iteration t+1;
* iteration t's x is finalized PER COLUMN BLOCK (x[j] needs only the
  transpose outputs of block j), so the same tile can immediately
  produce the forward products of iteration t+1 for those columns;
* the two global couplings that would forbid this are deferred:
  - the PCG warm-start "keep" decision (a global residual norm) is
    resolved AFTER the sweep, so the kernel computes BOTH branch
    hypotheses (keep = x0 / exact) for all per-column state -- extra
    VPU/MXU work, zero extra HBM;
  - the sphere projection's global norm enters the next rhs linearly
    (rhs = base + rho*s*shift with s a per-instance scalar), so the
    forward pass carries separate base/shift products that the host
    glue combines once s is known from the sweep's accumulators.

Per iteration the only HBM traffic is E once (bf16-capable), G^{-1}
once (the m^2 Woodbury solve, XLA glue), and O(n) state vectors --
~25MB/iteration at (1664, 4096) vs ~40MB for the two-pass scheme.

Semantics match core/lp.step's woodbury path exactly (verified
pointwise in tests): projections, rhs assembly, exact Woodbury solve
with the PCG warm-start early exit, dual ascent, y1/y2 + objective-std
stopping with per-instance freezing, (feasible-)incumbent tracking
with stride gating.  Rule-fixing counters are not updated (as with
ops/pallas_lp).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SolverConfig

_EPS = 2.2204e-16
HI = jax.lax.Precision.HIGHEST

#: accumulator slots (per instance, per branch where noted)
#: 0 r0sq  1 rhssq  2/3 shiftsq k/e  4/5 c1sq k/e  6/7 c2sq k/e
#: 8/9 xnsq k/e  10/11 obj k/e  12/13 objbin k/e
_NACC = 16
#: forward-product rows per branch: base, shift, y1(=next x0), rounded
_NF = 4


class StreamCarry(NamedTuple):
    state: object          # core.lp.LpState
    rhs: jnp.ndarray       # (B, n) current iteration's rhs
    x0: jnp.ndarray        # (B, n) warm start = free * y1
    shift: jnp.ndarray     # (B, n) masked sphere shift (for y2)
    s: jnp.ndarray         # (B,) sphere scale of the current iteration
    M: jnp.ndarray         # (B, 4, m) transpose stack [u, Ex0, w_k, w_e]
    exk: jnp.ndarray       # (B, m) E @ x0 (keep-branch ex)
    exe: jnp.ndarray       # (B, m) E @ x_exact (exact-branch ex)


def _sweep_kernel(sc_ref, E_ref, M_ref, rhs_ref, x0_ref, shift_ref,
                  z1_ref, z2_ref, b_ref, free_ref,
                  # outputs
                  xk_o, xe_o, z1k_o, z1e_o, z2k_o, z2e_o,
                  y1k_o, y1e_o, bask_o, base_o, shfk_o, shfe_o,
                  F_o, acc_o):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        F_o[...] = jnp.zeros(F_o.shape, F_o.dtype)
        acc_o[...] = jnp.zeros(acc_o.shape, acc_o.dtype)

    # Mosaic-friendly layout discipline: every vector stays RANK-2
    # (1, NB) end to end -- no rank-1 ops, no .at[].set scatter; A and
    # acc assemble by concatenation.  Operand layouts keep the LAST TWO
    # dims of every block equal to the array's (or (8k, 128k)): n-vectors
    # arrive rank-4 (B, nbc, 1, nb) so the per-cell block is (1,1,1,nb).
    rho = sc_ref[0, 0, 0]
    gamma = sc_ref[0, 0, 1]
    rho_nx = sc_ref[0, 0, 2]
    s_t = sc_ref[0, 0, 3]
    c = rho + rho

    E_t = E_ref[0]
    if E_t.dtype != jnp.float32:
        E_t = E_t.astype(jnp.float32)          # exact for 0/1 entries
    M = M_ref[0]                               # (4, m)
    # ---- transpose contraction for iteration t: (4, m) @ (m, NB) ----
    T = jax.lax.dot_general(M, E_t, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    etu, etex0 = T[0:1], T[1:2]                # (1, NB) each
    etw_b = (T[2:3], T[3:4])

    rhs = rhs_ref[0, 0]                        # (1, NB)
    x0 = x0_ref[0, 0]
    shift_t = shift_ref[0, 0]
    z1 = z1_ref[0, 0]
    z2 = z2_ref[0, 0]
    bb = b_ref[0, 0]
    fr = free_ref[0, 0]                        # f32 mask

    y2 = 0.5 + s_t * shift_t                   # shift is free-masked
    x_b2 = (x0,                                # keep branch (= free*y1)
            fr * (rhs - etu) / c)              # exact branch

    # keep test pieces: r0 = rhs - free*(c x0 + rho EtEx0)
    r0 = rhs - fr * (c * x0 + rho * etex0)

    def ssum(v):
        return jnp.sum(v).reshape(1, 1)

    acc = [ssum(r0 * r0), ssum(rhs * rhs)]
    per = {k: [] for k in range(6)}            # shift/c1/c2/xn/obj/objbin
    A_rows = []
    for bi in range(2):
        x_b, etw = x_b2[bi], etw_b[bi]
        z1n = z1 + gamma * rho * fr * (x_b - x0)
        z2n = z2 + gamma * rho * fr * (x_b - y2)
        y1n = jnp.clip(x_b + z1n / rho_nx, 0.0, 1.0)
        shfn = fr * (x_b + z2n / rho_nx - 0.5)
        base = fr * (rho_nx * y1n + rho_nx * 0.5
                     - (bb + z1n + z2n) + etw)
        rounded = fr * (x_b >= 0.5).astype(jnp.float32)
        A_rows += [base, shfn, fr * y1n, rounded]
        d1 = fr * (x_b - x0)
        d2 = fr * (x_b - y2)
        per[0].append(ssum(shfn * shfn))
        per[1].append(ssum(d1 * d1))
        per[2].append(ssum(d2 * d2))
        per[3].append(ssum(fr * x_b * x_b))
        per[4].append(ssum(bb * fr * x_b))
        per[5].append(ssum(bb * rounded))
        outs = ((xk_o, z1k_o, z2k_o, y1k_o, bask_o, shfk_o) if bi == 0
                else (xe_o, z1e_o, z2e_o, y1e_o, base_o, shfe_o))
        for o, v in zip(outs, (x_b, z1n, z2n, y1n, base, shfn)):
            o[...] = v.reshape(o.shape)

    for k in range(6):
        acc += per[k]
    acc += [jnp.zeros((1, 1), jnp.float32)] * (_NACC - len(acc))
    A = jnp.concatenate(A_rows, axis=0)        # (8, NB)

    # ---- forward contraction for iteration t+1: (8, NB) x (m, NB) ---
    F_o[...] += jax.lax.dot_general(
        A, E_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)[None]
    acc_o[...] += jnp.concatenate(acc, axis=1).reshape(acc_o.shape)


def _pick_nb(n: int, nb: Optional[int] = None) -> int:
    if nb is not None:
        assert n % nb == 0, (n, nb)
        return nb
    for cand in (1024, 512, 256, 128):
        if n % cand == 0:
            return cand
    raise ValueError(f"n={n} not a multiple of 128")


def _rho_gamma(it, cfg: SolverConfig):
    from .schedule import gamma_at, rho_at

    return rho_at(it, cfg), gamma_at(it, cfg)


def _w_vec(f_eff, ex, z4, rho4):
    y3 = jnp.maximum(f_eff - ex - z4 / rho4, 0.0)
    return rho4 * (f_eff - y3) - z4


def _sphere_scale(shift_sq, n_act, p: int):
    nrm = jnp.maximum(jnp.sqrt(shift_sq), _EPS)
    return (n_act ** (1.0 / p)) / (2.0 * nrm)


def _bootstrap(state, prob, cfg: SolverConfig):
    """Build the pipeline operands for the state's CURRENT iteration
    (the front half of core/lp.step, two explicit E passes -- paid once
    per window)."""
    from ..core import lp as lp_core

    dt = state.x.dtype
    free_f = state.free.astype(dt)
    it = state.it
    rho, gamma = _rho_gamma(it, cfg)
    c = rho + rho
    y1 = jnp.clip(state.x + state.z1 / rho, 0.0, 1.0)
    shift = free_f * (state.x + state.z2 / rho - 0.5)
    n_act = jnp.sum(free_f, axis=-1)
    s = _sphere_scale(jnp.sum(shift * shift, axis=-1), n_act,
                      cfg.projection_lp)
    y2 = 0.5 + s[:, None] * shift
    rhs = free_f * (rho * y1 + rho * y2
                    - (prob.b + state.z1 + state.z2) + state.et_next)
    x0 = free_f * y1
    fw = lp_core._emv("bmn,bkn->bkm", prob.E,
                      jnp.stack([rhs, x0], axis=1))
    Erhs, Ex0 = fw[:, 0], fw[:, 1]
    u = lp_core._emv("bmk,bk->bm", state.ginv, Erhs)
    ratio = lp_core._wb_ratio(cfg)
    Ex_exact = (ratio / c) * u
    rho_nx, _ = _rho_gamma(it + 1, cfg)
    y3 = jnp.maximum(state.f_eff - state.ex - state.z4 / rho, 0.0)
    z4_k = state.z4 + gamma * rho * (Ex0 + y3 - state.f_eff)
    z4_e = state.z4 + gamma * rho * (Ex_exact + y3 - state.f_eff)
    w_k = _w_vec(state.f_eff, Ex0, z4_k, rho_nx)
    w_e = _w_vec(state.f_eff, Ex_exact, z4_e, rho_nx)
    M = jnp.stack([u, Ex0, w_k, w_e], axis=1)          # (B, 4, m)
    return StreamCarry(state=state, rhs=rhs, x0=x0, shift=shift, s=s,
                       M=M, exk=Ex0, exe=Ex_exact)


def _glue(carry: StreamCarry, outs, prob, cfg: SolverConfig,
          skip_cvg_at, Gp=None, interpret=False):
    """Resolve the sweep: select the keep/exact branch, finish iteration
    t's convergence/incumbent bookkeeping, and prepare iteration t+1's
    pipeline operands (all O(n)/O(m) XLA work + one G^{-1} matmul)."""
    from ..core import lp as lp_core

    st = carry.state
    B, n = st.x.shape
    (xk, xe, z1k, z1e, z2k, z2e, y1k, y1e, bask, base, shfk, shfe,
     F, acc) = outs
    acc = acc.reshape(B, _NACC)

    def nflat(a):
        return a.reshape(B, n)

    it = st.it
    rho, gamma = _rho_gamma(it, cfg)
    rho_nx, _ = _rho_gamma(it + 1, cfg)
    rho_n2, _ = _rho_gamma(it + 2, cfg)
    c = rho + rho
    ratio = lp_core._wb_ratio(cfg)
    active = ~st.done
    act = active[:, None]

    keep = acc[:, 0] < acc[:, 1] * (cfg.pcg_tol ** 2)
    ksel = keep.astype(jnp.int32)

    def pick_n(a_k, a_e):
        return jnp.where(keep[:, None], nflat(a_k), nflat(a_e))

    def pick_s(i_k, i_e):
        return jnp.where(keep, acc[:, i_k], acc[:, i_e])

    x_new = pick_n(xk, xe)
    z1_new = pick_n(z1k, z1e)
    z2_new = pick_n(z2k, z2e)
    y1_next = pick_n(y1k, y1e)
    base_n = pick_n(bask, base)
    shift_n = pick_n(shfk, shfe)
    ex_new = jnp.where(keep[:, None], carry.exk, carry.exe)

    # F rows: [base, shift, y1, rounded] per branch
    Fk, Fe = F[:, :_NF], F[:, _NF:]
    Fsel = jnp.where(keep[:, None, None], Fk, Fe)
    E_base, E_shift, E_y1n, E_round = (Fsel[:, 0], Fsel[:, 1],
                                       Fsel[:, 2], Fsel[:, 3])

    # ---- convergence of iteration t (matches core/lp.step) ----------
    xn = jnp.maximum(jnp.sqrt(pick_s(8, 9)), _EPS)
    c1 = jnp.sqrt(pick_s(4, 5)) / xn
    c2 = jnp.sqrt(pick_s(6, 7)) / xn
    cvg = (c1 <= cfg.stop_threshold) & (c2 <= cfg.stop_threshold)
    if skip_cvg_at is not None:
        cvg = cvg & (it != skip_cvg_at)
    obj_val = pick_s(10, 11)
    push = active & ~cvg
    H = cfg.history_size
    slot = jnp.mod(st.obj_count, H)
    onehot = slot[:, None] == jnp.arange(H)[None, :]
    obj_ring = jnp.where(push[:, None] & onehot, obj_val[:, None],
                         st.obj_ring)
    obj_count = st.obj_count + push.astype(jnp.int32)
    mean = jnp.mean(obj_ring, axis=-1, keepdims=True)
    var = jnp.sum((obj_ring - mean) ** 2, axis=-1) / (H - 1)
    rel = jnp.sqrt(var) / jnp.maximum(jnp.abs(obj_val), _EPS)
    rel = jnp.where(obj_count >= H, rel, 1.0)
    std_stop = push & (rel <= cfg.std_threshold)
    newly_done = active & (cvg | std_stop)

    # ---- incumbent ---------------------------------------------------
    track = active & ~newly_done
    if cfg.incumbent_stride > 1:
        track = track & jnp.equal(jnp.mod(it, cfg.incumbent_stride), 0)
    obj_bin = pick_s(12, 13)
    cur_obj = jnp.where(track, obj_bin, st.cur_obj)
    better = track & (st.best_bin_obj >= obj_bin)
    if cfg.feasible_incumbent:
        feas = jnp.all((E_round <= st.f_eff + 1e-6) | ~prob.row_mask,
                       axis=-1)
        better = better & feas
    best_bin_obj = jnp.where(better, obj_bin, st.best_bin_obj)
    best_sol = jnp.where(better[:, None], x_new, st.best_sol)

    # ---- dual z4 / next-iteration operands ---------------------------
    y3 = jnp.maximum(st.f_eff - st.ex - st.z4 / rho, 0.0)
    z4_new = st.z4 + gamma * rho * (ex_new + y3 - st.f_eff)

    upd = lambda new, old: jnp.where(act, new, old)
    updm = lambda new, old: jnp.where(act, new, old)
    ns = st._replace(
        x=upd(x_new, st.x),
        z1=upd(z1_new, st.z1), z2=upd(z2_new, st.z2),
        z4=updm(z4_new, st.z4),
        y1=upd(carry.x0, st.y1),
        y2=upd(0.5 + carry.s[:, None] * carry.shift, st.y2),
        y3=updm(y3, st.y3),
        ex=updm(ex_new, st.ex),
        obj_ring=obj_ring, obj_count=obj_count,
        it=it + 1, done=st.done | newly_done,
        cur_obj=cur_obj, best_bin_obj=best_bin_obj, best_sol=best_sol,
        x_prev=upd(x_new, st.x_prev))

    # pipeline operands for iteration t+1
    n_act = jnp.sum(st.free, axis=-1).astype(jnp.float32)
    s_n = _sphere_scale(pick_s(2, 3), n_act, cfg.projection_lp)
    rhs_n = base_n + rho_nx * s_n[:, None] * shift_n
    Erhs_n = E_base + rho_nx * s_n[:, None] * E_shift
    if Gp is not None and cfg.ginv_apply == "packed-sym":
        # triangular-read symmetric apply, pure XLA (ops/symm_xla):
        # exact f32, 0.54x the packed bytes; a net win iff XLA
        # sibling-fuses the two reductions over the one packed read
        from . import symm_xla
        u_n = symm_xla.symm_matvec(Gp, Erhs_n)
    elif Gp is not None:
        # triangular-read symmetric G^{-1} apply: ~0.54x the dense
        # einsum's HBM traffic, the iteration's second-largest stream
        # (ops/pallas_symm; G^{-1} is cho_solve-symmetric to ~1e-7)
        from . import pallas_symm
        u_n = pallas_symm.symm_matvec(Gp, Erhs_n, interpret=interpret)
    else:
        u_n = lp_core._emv("bmk,bk->bm", st.ginv, Erhs_n)
    c_nx = rho_nx + rho_nx
    Ex_exact_n = (ratio / c_nx) * u_n
    Ex0_n = E_y1n
    y3_n = jnp.maximum(st.f_eff - ex_new - z4_new / rho_nx, 0.0)
    z4k_n = z4_new + _rho_gamma(it + 1, cfg)[1] * rho_nx * (
        Ex0_n + y3_n - st.f_eff)
    z4e_n = z4_new + _rho_gamma(it + 1, cfg)[1] * rho_nx * (
        Ex_exact_n + y3_n - st.f_eff)
    w_k = _w_vec(st.f_eff, Ex0_n, z4k_n, rho_n2)
    w_e = _w_vec(st.f_eff, Ex_exact_n, z4e_n, rho_n2)
    M_n = jnp.stack([u_n, Ex0_n, w_k, w_e], axis=1)
    return StreamCarry(state=ns, rhs=rhs_n, x0=y1_next, shift=shift_n,
                       s=s_n, M=M_n, exk=Ex0_n, exe=Ex_exact_n)


@functools.partial(jax.jit, static_argnames=("cfg", "window", "nb",
                                             "skip_cvg_at", "interpret"))
def lp_window_stream(state, prob, cfg: SolverConfig, window: int,
                     nb: Optional[int] = None,
                     skip_cvg_at: Optional[int] = None,
                     interpret: Optional[bool] = None):
    """Run ``window`` woodbury-mode iterations at one E stream each.

    Drop-in equivalent of ``core.lp.solve_window(record=False)`` for
    the HBM-bound rungs; early-exits when every instance is done.
    """
    from ..core import lp as lp_core

    assert cfg.linsolve == "woodbury"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, m, n = prob.E.shape
    nb = _pick_nb(n, nb)
    E_op = prob.E
    if cfg.matvec_dtype == "bfloat16" and E_op.dtype != jnp.bfloat16:
        E_op = E_op.astype(jnp.bfloat16)

    carry0 = _bootstrap(state, prob, cfg)
    # pack G^{-1}'s lower-triangle blocks once per window (loop-
    # invariant; XLA hoists it) for the triangular-read apply
    Gp = None
    # LPBOX_SYMM=1 opts INTO the triangular-read kernel.  Measured
    # 2026-08-18 on the chip at (800,4000): exact (symm_check rel err
    # 5e-7) but the END-TO-END stream solve ran 2.6 inst/s with it vs
    # 3.4 without -- the one-hot masked select/accumulate (the v4
    # no-dynamic-indexing workaround for Mosaic) spends more VPU time
    # than the halved G^-1 DMA saves.  Default is the dense einsum.
    if cfg.ginv_apply == "packed-sym":
        if cfg.ginv_dtype == "bfloat16":
            # pack_tril upcasts to f32, so the packed read (0.54x
            # dense-f32 bytes) would be LARGER than the bf16 dense
            # apply (0.5x) -- the two byte-cut options silently cancel
            # (ADVICE r3).  Refuse the combination instead.
            raise ValueError(
                "ginv_apply='packed-sym' with ginv_dtype='bfloat16' "
                "reads MORE bytes than the bf16 dense apply (the "
                "packed layout is f32); pick one byte-cut, not both")
        from . import symm_xla
        if symm_xla.packable(m):
            Gp = symm_xla.pack_tril(
                state.ginv.astype(jnp.float32))
    elif m % 128 == 0 and os.environ.get("LPBOX_SYMM"):
        from . import pallas_symm
        Gp = pallas_symm.pack_tril_blocks(state.ginv)

    def cond(c):
        t, carry = c
        return jnp.logical_and(t < window, ~jnp.all(carry.state.done))

    def body(c):
        t, carry = c
        outs = _run_sweep_ops(carry, E_op, prob, cfg, nb, interpret)
        carry = _glue(carry, outs, prob, cfg, skip_cvg_at, Gp=Gp,
                      interpret=interpret)
        return t + 1, carry

    _, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), carry0))
    # the carried E^T w product for any XLA step that follows
    return lp_core.refresh_et_next(carry.state, prob, cfg)


def _run_sweep_ops(carry: StreamCarry, E_op, prob, cfg: SolverConfig,
                   nb: int, interpret: bool):
    """pallas_call wrapper (separated so the b operand comes from the
    problem, not the carry)."""
    B, m, n = E_op.shape
    nbc = n // nb
    st = carry.state
    it = st.it
    rho, gamma = _rho_gamma(it, cfg)
    rho_nx, _ = _rho_gamma(it + 1, cfg)
    sc = jnp.stack([
        jnp.broadcast_to(rho, (B,)).astype(jnp.float32),
        jnp.broadcast_to(gamma, (B,)).astype(jnp.float32),
        jnp.broadcast_to(rho_nx, (B,)).astype(jnp.float32),
        carry.s.astype(jnp.float32),
        jnp.full((B,), cfg.pcg_tol ** 2, jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.float32),
    ], axis=1)[:, None, :]                     # (B, 1, 8)

    # Mosaic's lowering requires each block's LAST TWO dims to equal the
    # array's (or divide (8, 128)); n-vectors therefore travel rank-4
    # (B, nbc, 1, nb) so the per-cell (1, 1, 1, nb) block complies.
    def nsplit(a):
        return a.reshape(B, nbc, 1, nb)

    nspec = pl.BlockSpec((1, 1, 1, nb), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, 8), lambda b, j: (b, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, m, nb), lambda b, j: (b, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, m), lambda b, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        nspec, nspec, nspec, nspec, nspec, nspec, nspec,
    ]
    nshape = jax.ShapeDtypeStruct((B, nbc, 1, nb), jnp.float32)
    out_shapes = [nshape] * 12 + [
        jax.ShapeDtypeStruct((B, 2 * _NF, m), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, _NACC), jnp.float32),
    ]
    out_specs = [nspec] * 12 + [
        pl.BlockSpec((1, 2 * _NF, m), lambda b, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, _NACC), lambda b, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    free_f = st.free.astype(jnp.float32)
    return pl.pallas_call(
        _sweep_kernel,
        grid=(B, nbc),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(sc, E_op, carry.M, nsplit(carry.rhs), nsplit(carry.x0),
      nsplit(carry.shift), nsplit(st.z1), nsplit(st.z2),
      nsplit(prob.b), nsplit(free_f))
