"""Fused Pallas TPU kernel: a full LP ADMM window with VMEM-resident E.

The batched LP iteration is HBM-bandwidth-bound: the XLA version streams
the (B, m, n) constraint matrix from HBM three times per iteration
(core/lp.py).  This kernel keeps an instance block's E (plus G^{-1} and
all state vectors) resident in VMEM and runs the ENTIRE ``window``
iterations inside one kernel launch -- E is read from HBM once per
window instead of 3 x window times, a ~300x reduction in constraint-
matrix traffic (pallas_guide.md: HBM -> VMEM -> compute).

Per grid cell: a block of ``bt`` instances.  The contractions are
written as VPU multiply-reduce over the (bt, m, n) block (per-instance
mat-vecs have MXU width 1 and are better on the VPU; measured: a
batched in-kernel dot_general is ~5x slower and a pairs-trick MXU
matmul loses f32 precision to bf16 accumulation).  Above a ~2MB
temporary the mat-vecs run in 128-row chunks accumulated into VMEM
scratch, so the Mosaic stack never materialises an E-sized broadcast
product; this is what lets bt=8 fit at the compacted l2f residual
shapes and bt=1-4 (rank-3 vector blocks with a unit sublane dim) fit
the scale-ladder rungs.  Semantics match
core/lp.step's woodbury path: box/sphere projections, y3 slack, rhs
assembly, exact Woodbury solve with the PCG warm-start early exit, dual
ascent, y1/y2 + objective-std stopping with per-instance freezing, and
(feasible-)incumbent tracking (best_bin_obj/best_sol).  NOT updated by
the kernel: the rule-fixing counters x_prev/fix_count -- use the XLA
path (core.lp.solve(rule_fixing=True)) for rule-based fixing.

Memory budget per instance at (m, n) = (256, 512):
E 512KB + G^{-1} 256KB + vectors ~25KB; bt = 8 fits comfortably in a
16MB VMEM core.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SolverConfig

_EPS = 2.2204e-16


def auto_bt(B: int, m: int, n: int, extra_per_inst: int = 0,
            budget: int = 12 * 1024 * 1024, nside: bool = False,
            e_bytes: int = 4) -> int:
    """Largest power-of-two instance block that (a) divides B and (b)
    keeps the per-grid-cell VMEM footprint under ``budget``.

    Small (compacted) problems want large blocks: a bt=8 cell at
    (m, n) = (128, 128) does little work per E-pass and launch overhead
    dominates.  Footprint per instance: E (m n) + G^{-1} (m m) (or
    H^{-1} + EtE, 2 n^2, in nside mode) + vectors, all f32.  The
    chunked mat-vec helpers in the kernel cap the broadcast-product
    temporaries (``OVERHEAD``), so the per-instance term no longer
    carries 2 extra E-sized stack temporaries; physical VMEM is 16MB
    per core, the default budget leaves margin for code + spills.

    Returns 0 when nothing fits (bt=1 over budget): callers fall back
    to the XLA path.  bt < 8 is lowerable via the rank-3 vector block
    layout (unit sublane dim) in ``lp_window_fused``.
    """
    mats = 2 * n * n if nside else m * m
    per = e_bytes * m * n \
        + 4 * (mats + 10 * n + 8 * m + extra_per_inst)
    overhead = 3 * 1024 * 1024
    bt, c = 0, 1
    while c <= B and B % c == 0 and per * c + overhead <= budget:
        bt = c
        c *= 2
    return bt


def _window_kernel(E_ref, ginv_ref, b_ref, vmask_ref, rmask_ref,
                   x_ref, z1_ref, z2_ref, z4_ref, feff_ref, free_ref,
                   ring_ref, count_ref, done_ref, curobj_ref,
                   bestobj_ref, bestsol_ref, it_ref,
                   *rest, cfg: SolverConfig, window: int,
                   skip_cvg_at, record: bool = False,
                   nside: bool = False, r3: bool = False,
                   chunk: bool = False, unroll: int = 2):
    # remaining refs: [ete (nside only)] + outputs + [traj (record
    # only)] + 2 VMEM scratch buffers (chunked mat-vec accumulators)
    k = 0
    if nside:
        ete_ref = rest[0]
        k = 1
    (x_out, z1_out, z2_out, z4_out, ring_out, count_out,
     done_out, curobj_out, bestobj_out, bestsol_out,
     y1_out, y2_out, y3_out, ex_out) = rest[k:k + 14]
    k += 14
    traj_out = rest[k] if record else None
    k += 1 if record else 0
    sm_ref, sn_ref, s2_ref = rest[k], rest[k + 1], rest[k + 2]

    if r3:
        # vectors arrive as (bt, 1, k) blocks (unit sublane dim keeps
        # bt < 8 lowerable); squeeze on load, expand on store
        def ld(ref):
            return ref[...].reshape(ref.shape[0], ref.shape[-1])
    else:
        def ld(ref):
            return ref[...]

    def st(ref, v):
        ref[...] = v.reshape(ref.shape)

    def _f32(a):
        # E may be stored bfloat16 in VMEM (halves its footprint so an
        # instance block of 2 fits the mid ladder rungs); its 0/1
        # entries upcast exactly, so the f32 VPU math is bit-identical
        # to f32 storage -- no limb split needed (unlike the XLA dot
        # path, core/lp._emv, where the VECTOR operand must be bf16).
        return a.astype(jnp.float32) if a.dtype != jnp.float32 else a

    def bmv(mref, v, sref):
        # out[i] = M[i, :] @ v per instance: (bt, I, J) x (bt, J) ->
        # (bt, I).  When ``chunk``, slice the VMEM-resident matrix ref
        # in 128-row chunks and accumulate into scratch so the
        # broadcast product temporary is (bt, 128, J) instead of
        # (bt, I, J) -- the Mosaic stack is the VMEM budget killer.
        I = mref.shape[1]
        if not chunk or I <= 128 or I % 128:
            return jnp.sum(_f32(mref[...]) * v[:, None, :], axis=-1)
        for i0 in range(0, I, 128):
            sref[:, i0:i0 + 128] = jnp.sum(
                _f32(mref[:, i0:i0 + 128, :]) * v[:, None, :], axis=-1)
        return sref[:, :I]

    def bmv_t(mref, w, sref):
        # out[j] = M[:, j] @ w per instance (transpose pass), chunked
        # over the output (lane) axis in 128-column slices
        J = mref.shape[2]
        if not chunk or J <= 128 or J % 128:
            return jnp.sum(_f32(mref[...]) * w[:, :, None], axis=1)
        for j0 in range(0, J, 128):
            sref[:, j0:j0 + 128] = jnp.sum(
                _f32(mref[:, :, j0:j0 + 128]) * w[:, :, None], axis=1)
        return sref[:, :J]

    b = ld(b_ref)
    free_f = ld(free_ref)               # stored as f32 mask
    free = free_f > 0.5
    rmask = ld(rmask_ref) > 0.5
    f_eff = ld(feff_ref)

    n_act = jnp.sum(free_f, axis=-1, keepdims=True)
    sqrt_n = jnp.sqrt(n_act)
    tol2 = cfg.pcg_tol * cfg.pcg_tol

    def fwd(v):
        # E @ v per instance: (bt, m, n) x (bt, n) -> (bt, m)
        return bmv(E_ref, v, sm_ref)

    def tps(w):
        # E^T @ w per instance: (bt, m, n) x (bt, m) -> (bt, n)
        return bmv_t(E_ref, w, sn_ref)

    def body(t, carry):
        (x, z1, z2, z4, ring, count, done,
         y1c, y2c, y3c, exc) = carry
        # count/done/cur_obj are carried as (bt, 1) -- TPU Pallas
        # requires rank-2 blocks; squeeze views for row-wise logic
        done_r = done[:, 0] > 0.5
        count_r = count[:, 0]
        it = it_ref[0] + t
        kf = (it // cfg.rho_change_step).astype(jnp.float32)
        # Mosaic cannot lower powf; use exp(k * log(base))
        import math
        # no rho cap here: woodbury mode requires an uncapped shared
        # schedule (core.lp._wb_ratio raises otherwise)
        rho = cfg.initial_rho * jnp.exp(
            kf * math.log(cfg.learning_fact))
        gamma = jnp.maximum(
            cfg.gamma0 * jnp.exp(kf * math.log(cfg.gamma_factor)), 1.0)
        rho1 = rho2 = rho4 = rho
        c = rho1 + rho2

        active = ~done_r
        act = active[:, None]

        # --- y updates ------------------------------------------------
        y1 = jnp.clip(x + z1 / rho1, 0.0, 1.0)
        shift = jnp.where(free, x + z2 / rho2 - 0.5, 0.0)
        nrm = jnp.sqrt(jnp.sum(shift * shift, axis=-1, keepdims=True))
        y2 = shift * sqrt_n / (2.0 * jnp.maximum(nrm, _EPS)) + 0.5
        y2 = jnp.where(free, y2, x)
        y3 = jnp.maximum(f_eff - exc - z4 / rho4, 0.0)

        # --- rhs + exact solve ----------------------------------------
        et_term = tps(rho4 * (f_eff - y3) - z4)
        rhs = free_f * (rho1 * y1 + rho2 * y2 - (b + z1 + z2) + et_term)
        x0 = free_f * y1
        if nside:
            # direct n-side inverse (ops/woodbury.factorize_nside):
            # (c I + rho4 EtE)^{-1} rhs = H^{-1} rhs / rho4 -- one
            # (n, n) pass replaces fwd + (m, m) pass + two tps passes
            x_exact = free_f * bmv(ginv_ref, rhs, sn_ref) / rho4
            EtEx0 = bmv(ete_ref, x0, s2_ref)
        else:
            # scratch discipline: each bmv result is consumed by the
            # next op before its scratch buffer is rewritten
            Erhs = fwd(rhs)                      # -> sm
            u = bmv(ginv_ref, Erhs, s2_ref)      # -> s2
            # E @ x_exact via the Woodbury identity (core/lp.step):
            # E_f E_f^T u = (G - ratio I) u => E x_exact = u / rho4;
            # consumes u before s2 is rewritten below
            ex_exact = u / rho4
            EtU = tps(u)                         # -> sn
            Ex0 = fwd(x0)                        # -> sm
            EtEx0 = bmv_t(E_ref, Ex0, s2_ref)    # -> s2
            x_exact = free_f * (rhs - EtU) / c
        # PCG warm-start early exit (reference :204-209 semantics)
        Mx0 = free_f * (c * x0 + rho4 * EtEx0)
        r0 = rhs - Mx0
        keep = jnp.sum(r0 * r0, axis=-1) \
            < tol2 * jnp.sum(rhs * rhs, axis=-1)
        x_new = jnp.where(keep[:, None], x0, x_exact)
        x_new = jnp.where(act, x_new, x)
        if nside:
            ex_new = fwd(x_new)
        else:
            # one fewer E pass: both branches' products are in hand
            ex_new = jnp.where(keep[:, None], Ex0, ex_exact)
        ex_new = jnp.where(act, ex_new, exc)

        # --- dual ascent ----------------------------------------------
        z1n = z1 + gamma * rho1 * free_f * (x_new - y1)
        z2n = z2 + gamma * rho2 * free_f * (x_new - y2)
        z4n = z4 + gamma * rho4 * (ex_new + y3 - f_eff)

        # --- convergence ----------------------------------------------
        xn = jnp.maximum(jnp.sqrt(jnp.sum(
            jnp.where(free, x_new * x_new, 0.0), axis=-1)), _EPS)
        d1 = jnp.where(free, x_new - y1, 0.0)
        d2 = jnp.where(free, x_new - y2, 0.0)
        c1 = jnp.sqrt(jnp.sum(d1 * d1, axis=-1)) / xn
        c2 = jnp.sqrt(jnp.sum(d2 * d2, axis=-1)) / xn
        cvg = (c1 <= cfg.stop_threshold) & (c2 <= cfg.stop_threshold)
        if skip_cvg_at is not None:
            cvg = cvg & (it != skip_cvg_at)

        obj_val = jnp.sum(b * free_f * x_new, axis=-1)
        push = active & ~cvg
        H = cfg.history_size
        slot = jnp.mod(count_r, H)
        onehot = slot[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, H), 1)
        ring_n = jnp.where(push[:, None] & onehot, obj_val[:, None], ring)
        count_n = count_r + push.astype(jnp.int32)
        mean = jnp.mean(ring_n, axis=-1, keepdims=True)
        var = jnp.sum((ring_n - mean) ** 2, axis=-1) / (H - 1)
        rel = jnp.sqrt(var) / jnp.maximum(jnp.abs(obj_val), _EPS)
        rel = jnp.where(count_n >= H, rel, 1.0)
        std_stop = push & (rel <= cfg.std_threshold)
        newly_done = active & (cvg | std_stop)

        # incumbent (best rounding seen), matching core/lp.step; updated
        # in-place in the output refs so the (strided) feasibility pass
        # over E is genuinely skipped on non-sample iterations
        def update_incumbent():
            track = active & ~newly_done
            rounded = free_f * (x_new >= 0.5).astype(x.dtype)
            obj_bin = jnp.sum(b * rounded, axis=-1)
            cur_prev = ld(curobj_out)[:, 0]
            best_prev = ld(bestobj_out)[:, 0]
            st(curobj_out, jnp.where(track, obj_bin, cur_prev)[:, None])
            better = track & (best_prev >= obj_bin)
            if cfg.feasible_incumbent:
                exr = fwd(rounded)
                feas = jnp.all((exr <= f_eff + 1e-6) | ~rmask, axis=-1)
                better = better & feas
            st(bestobj_out, jnp.where(better, obj_bin,
                                      best_prev)[:, None])
            st(bestsol_out, jnp.where(better[:, None], x_new,
                                      ld(bestsol_out)))

        if cfg.incumbent_stride > 1:
            pl.when(jnp.equal(
                jnp.mod(it, cfg.incumbent_stride), 0))(update_incumbent)
        else:
            update_incumbent()

        if record:
            traj_out[:, pl.ds(t, 1), :] = x_new[:, None, :]
        upd = lambda new, old: jnp.where(act, new, old)
        done_n = done_r | newly_done
        return (upd(x_new, x), upd(z1n, z1), upd(z2n, z2),
                jnp.where(act, z4n, z4),
                ring_n, count_n[:, None],
                done_n[:, None].astype(jnp.float32),
                upd(y1, y1c), upd(y2, y2c), jnp.where(act, y3, y3c),
                ex_new)

    x_init = ld(x_ref)
    ex0 = fwd(free_f * x_init)
    # incumbents live in the output refs (updated in-place by the loop)
    st(curobj_out, ld(curobj_ref))
    st(bestobj_out, ld(bestobj_ref))
    st(bestsol_out, ld(bestsol_ref))
    carry = (x_init, ld(z1_ref), ld(z2_ref), ld(z4_ref),
             ld(ring_ref), ld(count_ref), ld(done_ref),
             x_init, x_init, f_eff, ex0)
    if record:
        carry = jax.lax.fori_loop(0, window, body, carry)
    else:
        # early exit once every instance in the block is done: the
        # residual phase is straggler-dominated (most instances converge
        # long before the last), so done blocks stop paying for the
        # window.  Not used with record=True, where callers expect the
        # full (bt, window, n) trajectory buffer to be written.
        # The body is unrolled ``unroll``x per trip: per-trip loop
        # overhead is a real cost at small (compacted) shapes, and an
        # extra masked iteration after all-done is a mathematical
        # no-op.  Large/chunked shapes use unroll=1 -- their loop
        # overhead is amortised and the remote Mosaic compile helper
        # is unreliable on big kernel bodies.
        bt = free_f.shape[0]
        assert window % unroll == 0, (window, unroll)

        def wcond(c):
            t, st = c
            return jnp.logical_and(t < window, jnp.sum(st[6]) < bt)

        def wbody(c):
            t, st = c
            for j in range(unroll):
                st = body(t + j, st)
            return t + unroll, st

        _, carry = jax.lax.while_loop(wcond, wbody,
                                      (jnp.int32(0), carry))
    (x, z1, z2, z4, ring, count, done,
     y1, y2, y3, ex) = carry
    st(x_out, x)
    st(z1_out, z1)
    st(z2_out, z2)
    st(z4_out, z4)
    st(ring_out, ring)
    st(count_out, count)
    st(done_out, done)
    st(y1_out, y1)
    st(y2_out, y2)
    st(y3_out, y3)
    st(ex_out, ex)


@functools.partial(jax.jit, static_argnames=("cfg", "window", "bt",
                                             "skip_cvg_at", "interpret",
                                             "record"))
def lp_window_fused(state, prob, cfg: SolverConfig, window: int,
                    bt: int = 8, skip_cvg_at: Optional[int] = None,
                    interpret: Optional[bool] = None, record: bool = False,
                    nfactor=None):
    """Run ``window`` woodbury-mode ADMM iterations via the fused kernel.

    Drop-in faster equivalent of ``core.lp.solve_window`` for the
    solver hot path.  With ``record=True`` additionally returns the
    (B, n, window) iterate trajectory for the policy (written from
    VMEM per iteration).  Requires ``cfg.linsolve == 'woodbury'``.

    ``nfactor``: optional ``(hinv, ete)`` pair from
    ``ops.woodbury.factorize_nside`` -- switches the x-update to the
    direct n-side solve (right side when n <= m, e.g. the compacted
    l2f residual problem); ``state.ginv`` is then unused.
    """
    assert cfg.linsolve == "woodbury"
    # cfg.matvec_dtype == "bfloat16" stores the VMEM-resident E in
    # bf16 (halving its footprint -> larger instance blocks fit the
    # ladder rungs); exact for 0/1 constraint matrices (see _f32 in
    # the kernel).  G^{-1}/H^{-1}/EtE always stay f32.
    assert cfg.matvec_dtype in ("float32", "bfloat16"), cfg.matvec_dtype
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, m, n = prob.E.shape
    assert B % bt == 0, (B, bt)
    nside = nfactor is not None
    grid = (B // bt,)
    # bt < 8 cannot satisfy Mosaic's sublane-multiple-of-8 rule with
    # (bt, k) vector blocks; switch vectors to a (bt, 1, k) layout
    # whose trailing dims equal the array dims (always lowerable)
    r3 = bt < 8
    # chunk the in-kernel mat-vecs once any single broadcast-product
    # temporary would exceed ~2MB of Mosaic stack
    mats = 2 * n * n if nside else m * m
    chunk = 4 * bt * max(m * n, mats) > 2 * 1024 * 1024
    # small unchunked shapes pay per-trip loop overhead -> unroll 2x;
    # big/chunked bodies stay unrolled 1x (compile size)
    unroll = 1 if chunk or window % 2 else 2

    def bs(shape_tail):
        if r3 and len(shape_tail) == 1:
            shape_tail = (1,) + shape_tail
        rank = len(shape_tail)
        return pl.BlockSpec((bt,) + shape_tail,
                            lambda i: (i,) + (0,) * rank,
                            memory_space=pltpu.VMEM)

    def vec(a):
        # (B, k) vector operand -> rank-3 layout when needed
        return a[:, None, :] if r3 else a

    H = cfg.history_size
    kernel = functools.partial(_window_kernel, cfg=cfg, window=window,
                               skip_cvg_at=skip_cvg_at, record=record,
                               nside=nside, r3=r3, chunk=chunk,
                               unroll=unroll)
    free_f = state.free.astype(jnp.float32)
    done_f = state.done.astype(jnp.float32)

    def vshape(k, dtype=jnp.float32):
        shp = (B, 1, k) if r3 else (B, k)
        return jax.ShapeDtypeStruct(shp, dtype)

    out_shapes = [
        vshape(n),              # x
        vshape(n),              # z1
        vshape(n),              # z2
        vshape(m),              # z4
        vshape(H),              # ring
        vshape(1, jnp.int32),   # count
        vshape(1),              # done
        vshape(1),              # cur_obj
        vshape(1),              # best_bin_obj
        vshape(n),              # best_sol
        vshape(n),              # y1
        vshape(n),              # y2
        vshape(m),              # y3
        vshape(m),              # ex
    ]
    if record:
        out_shapes.append(
            jax.ShapeDtypeStruct((B, window, n), jnp.float32))
    in_specs = [
        bs((m, n)),   # E
        bs((n, n)) if nside else bs((m, m)),   # hinv / ginv
        bs((n,)),     # b
        bs((n,)),     # vmask
        bs((m,)),     # rmask
        bs((n,)),     # x
        bs((n,)),     # z1
        bs((n,)),     # z2
        bs((m,)),     # z4
        bs((m,)),     # f_eff
        bs((n,)),     # free
        bs((H,)),     # ring
        bs((1,)),     # count
        bs((1,)),     # done
        bs((1,)),     # cur_obj
        bs((1,)),     # best_bin_obj
        bs((n,)),     # best_sol
        pl.BlockSpec(memory_space=pltpu.SMEM),  # it (scalar)
    ]
    E_op = prob.E
    if cfg.matvec_dtype == "bfloat16":
        E_op = E_op.astype(jnp.bfloat16)
    operands = [
        E_op, nfactor[0] if nside else state.ginv, vec(prob.b),
        vec(prob.var_mask.astype(jnp.float32)),
        vec(prob.row_mask.astype(jnp.float32)),
        vec(state.x), vec(state.z1), vec(state.z2), vec(state.z4),
        vec(state.f_eff), vec(free_f),
        vec(state.obj_ring), vec(state.obj_count[:, None]),
        vec(done_f[:, None]),
        vec(state.cur_obj[:, None]), vec(state.best_bin_obj[:, None]),
        vec(state.best_sol), jnp.array([state.it], jnp.int32)]
    if nside:
        in_specs.append(bs((n, n)))             # ete
        operands.append(nfactor[1])
    out_specs = [bs(x.shape[1:]) for x in out_shapes]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((bt, m), jnp.float32),            # sm (fwd)
            pltpu.VMEM((bt, n), jnp.float32),            # sn (tps)
            pltpu.VMEM((bt, max(m, n)), jnp.float32),    # s2
        ],
        interpret=interpret,
    )(*operands)

    if r3:
        outs = [o.reshape((o.shape[0],) + o.shape[2:])
                if i < 14 else o for i, o in enumerate(outs)]
    (x, z1, z2, z4, ring, count, done, cur_obj, best_obj, best_sol,
     y1, y2, y3, ex) = outs[:14]
    new_state = state._replace(
        x=x, y1=y1, y2=y2, y3=y3, z1=z1, z2=z2, z4=z4,
        obj_ring=ring, obj_count=count[:, 0],
        it=state.it + window,
        done=done[:, 0] > 0.5, cur_obj=cur_obj[:, 0],
        best_bin_obj=best_obj[:, 0], best_sol=best_sol, ex=ex)
    # keep the carried E^T w product consistent for any XLA step that
    # follows a fused window (the kernel recomputes its own E^T term
    # in VMEM; one HBM pass per window is noise)
    from ..core import lp as lp_core
    new_state = lp_core.refresh_et_next(new_state, prob, cfg)
    if record:
        # (B, W, n) -> (B, n, W) to match core.lp.solve_window
        return new_state, jnp.swapaxes(outs[14], 1, 2)
    return new_state


@functools.partial(jax.jit, static_argnames=("cfg", "max_iters", "window",
                                             "bt", "interpret"))
def solve_fused(prob, cfg: SolverConfig, max_iters: Optional[int] = None,
                window: int = 100, bt: int = 8,
                interpret: Optional[bool] = None):
    """Plain full solve using the fused window kernel."""
    from ..core import lp as lp_core

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if max_iters is None:
        max_iters = cfg.max_iters
    state = lp_core.init_state(prob, cfg)

    def cond(s):
        return jnp.logical_and(s.it < max_iters, ~jnp.all(s.done))

    def body(s):
        return lp_window_fused(s, prob, cfg, window, bt=bt,
                               skip_cvg_at=0, interpret=interpret)

    return jax.lax.while_loop(cond, body, state)


@functools.partial(jax.jit, static_argnames=("cfg", "max_iters", "window",
                                             "bt", "interpret"))
def solve_fused_from(state, prob, cfg: SolverConfig,
                     max_iters: Optional[int] = None, window: int = 100,
                     bt: int = 8, interpret: Optional[bool] = None,
                     nfactor=None):
    """Continue an existing solve to convergence with the fused kernel
    (used after l2f compaction for the residual problem).  Pass
    ``nfactor`` from ``woodbury.factorize_nside`` to use the direct
    n-side x-update (the right side once compaction makes n <= m)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if max_iters is None:
        max_iters = cfg.max_iters

    def cond(s):
        return jnp.logical_and(s.it < max_iters, ~jnp.all(s.done))

    def body(s):
        return lp_window_fused(s, prob, cfg, window, bt=bt,
                               interpret=interpret, nfactor=nfactor)

    return jax.lax.while_loop(cond, body, state)
