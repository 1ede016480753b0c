"""Fused Pallas TPU kernel: segmentation ADMM window, stencil-resident.

STATUS: experimental -- correct (interpret + compiled parity) but
currently ~30x SLOWER than the XLA path on a v5e chip.  Unlike the LP
kernel (ops/pallas_lp.py), the seg iteration is not HBM-bound: XLA's
stencil fusion already keeps traffic low, and its CG ``while_loop``
exits after a handful of iterations, whereas this kernel's in-kernel
``fori_loop`` always runs ``cg_iters`` masked steps.  Kept as a
starting point for a future version with an in-kernel early-exit
while_loop; the XLA path (core/qp.py) is the production seg solver
(34 ms per 50-iteration window for 16 x 1e4-px images).

Original design: the segmentation QP iteration (core/qp.py) is a
9-point stencil CG inside an ADMM loop; this kernel keeps an image
block's weight planes and all state grids VMEM-resident and runs the
whole ``window`` of ADMM iterations in one launch.

Grid note: images must be padded so H is a multiple of 8 and W a
multiple of 128 (adapters.segmentation.make_problem(align=True)); the
~1e4-pixel standard config pads to about (104, 128).

Semantics match core/qp.step with one bounded difference: CG runs at
most ``cg_iters`` iterations (default 30) instead of the reference's
1e3 cap -- the Jacobi-preconditioned stencil systems here converge in
well under 30 iterations (diagonally dominant), and the per-instance
early exit keeps the same tolerance semantics.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SolverConfig
from .stencil import OFFSETS

_EPS = 2.2204e-16


def _shift(x, dr, dc):
    """result[i, j] = x[i+dr, j+dc], zero outside (ops/stencil.shift).

    Uses pltpu.roll (Mosaic cannot lower jnp.roll here) with edge
    masking."""
    H, W = x.shape[-2], x.shape[-1]
    out = x
    if dr:
        out = pltpu.roll(out, -dr % H, axis=out.ndim - 2)
    if dc:
        out = pltpu.roll(out, -dc % W, axis=out.ndim - 1)
    if dr or dc:
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ok = jnp.ones((H, W), dtype=bool)
        if dr == 1:
            ok &= rows < H - 1
        elif dr == -1:
            ok &= rows >= 1
        if dc == 1:
            ok &= cols < W - 1
        elif dc == -1:
            ok &= cols >= 1
        out = jnp.where(ok[None], out, 0.0)
    return out


def _window_kernel(w_ref, deg_ref, beff_ref, free_ref,
                   x_ref, y1_ref, y2_ref, z1_ref, z2_ref,
                   ring_ref, count_ref, done_ref, curobj_ref, it_ref,
                   x_out, y1_out, y2_out, z1_out, z2_out,
                   ring_out, count_out, done_out, curobj_out,
                   *, cfg: SolverConfig, window: int, cg_iters: int):
    w = w_ref[...]                     # (bt, 8, H, W)
    deg = deg_ref[...]                 # (bt, H, W)
    b_eff = beff_ref[...]
    free_f = free_ref[...]
    free = free_f > 0.5

    def msum(v):
        # two-step reduction: Mosaic SIGABRTs on multi-axis reductions
        # of 3D operands (sum lanes first, then the 2D remainder)
        return jnp.sum(jnp.sum(v, axis=-1), axis=-1)

    def a_mv(p):
        """A' p = deg * p - W p on the free submatrix."""
        pf = free_f * p
        acc = deg * pf
        for d, (dr, dc) in enumerate(OFFSETS):
            acc = acc - w[:, d] * _shift(pf, dr, dc)
        return free_f * acc

    n_act = msum(free_f)[:, None, None]
    sqrt_n = jnp.sqrt(n_act)
    tol2 = cfg.pcg_tol * cfg.pcg_tol

    def body(t, carry):
        (x, y1c, y2c, z1, z2, ring, count, done, cur_obj) = carry
        # scalar rows ride as (bt, 1, 1) and the ring as (bt, 1, H) so
        # every block is >=3D (rank-2 blocks constrain bt to multiples
        # of 8, which overflows VMEM on large grids)
        done_r = done[:, 0, 0] > 0.5
        count_r = count[:, 0, 0]
        it = it_ref[0] + t
        kf = (it // cfg.rho_change_step).astype(jnp.float32)
        rho = cfg.initial_rho * jnp.exp(kf * math.log(cfg.learning_fact))
        if cfg.rho_upper_limit is not None:
            rho = jnp.minimum(rho, cfg.rho_upper_limit)
        gamma = jnp.maximum(
            cfg.gamma0 * jnp.exp(kf * math.log(cfg.gamma_factor)), 1.0)
        c = 2.0 * rho

        active = ~done_r
        act = active[:, None, None]

        y1 = jnp.clip(x + z1 / rho, 0.0, 1.0)
        shift_v = jnp.where(free, x + z2 / rho - 0.5, 0.0)
        nrm = jnp.sqrt(msum(shift_v * shift_v))[:, None, None]
        y2 = shift_v * sqrt_n / (2.0 * jnp.maximum(nrm, _EPS)) + 0.5
        y2 = jnp.where(free, y2, x)

        rhs = free_f * (rho * y1 + rho * y2 - (b_eff + z1 + z2))

        # --- masked bounded CG: (2A' + c I) xk = rhs, warm start y1 ---
        inv_diag = 1.0 / jnp.where(free, 2.0 * deg + c, 1.0)
        xk = free_f * y1
        r = rhs - (2.0 * a_mv(xk) + c * free_f * xk)
        rhs2 = msum(rhs * rhs)
        thr = jnp.maximum(tol2 * rhs2, 1e-30)
        r2 = msum(r * r)
        run = active & (r2 >= thr)
        p = inv_diag * r
        # loop carries must be >= 2D for Mosaic: per-image scalars ride
        # as (bt, 1)
        absn2 = msum(r * p)[:, None]
        run2 = run[:, None].astype(jnp.float32)
        thr2 = thr[:, None]

        def cg_body(k, cgc):
            xk, r, p, absn2, run2 = cgc
            runb = run2[:, 0] > 0.5
            absn = absn2[:, 0]
            tmp = 2.0 * a_mv(p) + c * free_f * p
            ptmp = msum(p * tmp)
            alpha = jnp.where(runb, absn / jnp.where(ptmp == 0, 1.0,
                                                     ptmp), 0.0)
            xk = xk + alpha[:, None, None] * p
            r = r - alpha[:, None, None] * tmp
            r2 = msum(r * r)
            still = runb & (r2 >= thr2[:, 0])
            z = inv_diag * r
            newabs = msum(r * z)
            beta = newabs / jnp.where(absn == 0, 1.0, absn)
            p = jnp.where(still[:, None, None],
                          z + beta[:, None, None] * p, p)
            absn = jnp.where(still, newabs, absn)
            return (xk, r, p, absn[:, None],
                    still[:, None].astype(jnp.float32))

        xk, r, p, absn2, run2 = jax.lax.fori_loop(
            0, cg_iters, cg_body, (xk, r, p, absn2, run2))
        x_new = jnp.where(act, free_f * xk, x)

        z1n = z1 + gamma * rho * free_f * (x_new - y1)
        z2n = z2 + gamma * rho * free_f * (x_new - y2)

        xn = jnp.maximum(jnp.sqrt(msum(jnp.where(
            free, x_new * x_new, 0.0))), _EPS)
        d1 = jnp.where(free, x_new - y1, 0.0)
        d2 = jnp.where(free, x_new - y2, 0.0)
        c1 = jnp.sqrt(msum(d1 * d1)) / xn
        c2 = jnp.sqrt(msum(d2 * d2)) / xn
        cvg = (c1 <= cfg.stop_threshold) & (c2 <= cfg.stop_threshold)

        ax = a_mv(x_new)
        obj_val = msum(x_new * ax) + msum(b_eff * free_f * x_new)
        push = active & ~cvg
        H_ = cfg.history_size
        slot = jnp.mod(count_r, H_)
        onehot = slot[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, H_), 1)           # (bt, H_)
        ring_n = jnp.where((push[:, None] & onehot)[:, None, :],
                           obj_val[:, None, None], ring)
        count_n = count_r + push.astype(jnp.int32)
        mean = jnp.mean(ring_n, axis=-1, keepdims=True)
        var = jnp.sum((ring_n - mean) ** 2, axis=-1)[:, 0] / (H_ - 1)
        rel = jnp.sqrt(var) / jnp.maximum(jnp.abs(obj_val), _EPS)
        rel = jnp.where(count_n >= H_, rel, 1.0)
        std_stop = push & (rel <= cfg.std_threshold)
        newly_done = active & (cvg | std_stop)

        track = active & ~newly_done
        rounded = free_f * (x_new >= 0.5).astype(x.dtype)
        obj_bin = msum(rounded * a_mv(rounded)) \
            + msum(b_eff * rounded)
        cur_obj_n = jnp.where(track, obj_bin, cur_obj[:, 0, 0])

        upd = lambda new, old: jnp.where(act, new, old)
        done_n = done_r | newly_done
        return (upd(x_new, x), upd(y1, y1c), upd(y2, y2c),
                upd(z1n, z1), upd(z2n, z2),
                ring_n, count_n[:, None, None],
                done_n[:, None, None].astype(jnp.float32),
                cur_obj_n[:, None, None])

    carry = (x_ref[...], y1_ref[...], y2_ref[...], z1_ref[...],
             z2_ref[...], ring_ref[...], count_ref[...], done_ref[...],
             curobj_ref[...])
    carry = jax.lax.fori_loop(0, window, body, carry)
    (x, y1, y2, z1, z2, ring, count, done, cur_obj) = carry
    x_out[...] = x
    y1_out[...] = y1
    y2_out[...] = y2
    z1_out[...] = z1
    z2_out[...] = z2
    ring_out[...] = ring
    count_out[...] = count
    done_out[...] = done
    curobj_out[...] = cur_obj


@functools.partial(jax.jit, static_argnames=("cfg", "window", "bt",
                                             "cg_iters", "interpret"))
def qp_window_fused(state, prob, cfg: SolverConfig, window: int,
                    bt: int = 8, cg_iters: int = 30,
                    interpret: Optional[bool] = None):
    """Run ``window`` seg-ADMM iterations via the fused stencil kernel.

    Faster equivalent of core.qp.solve_window(record=False); the image
    grid must be tile-aligned (H % 8 == 0, W % 128 == 0).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B = prob.batch
    Hg, Wg = prob.grid
    # auto-shrink the instance block to the VMEM budget (weights 8
    # planes + ~14 state/temp grids, double-buffered by the pipeline)
    per_image = (8 + 14) * Hg * Wg * 4
    budget = 7 * 1024 * 1024
    while bt > 1 and bt * per_image > budget:
        bt -= 1
    bt = min(bt, B)
    while B % bt:
        bt -= 1
    assert Hg % 8 == 0 and Wg % 128 == 0, (Hg, Wg)
    grid = (B // bt,)

    def bs(shape_tail):
        rank = len(shape_tail)
        return pl.BlockSpec((bt,) + shape_tail,
                            lambda i: (i,) + (0,) * rank,
                            memory_space=pltpu.VMEM)

    Hs = cfg.history_size
    kernel = functools.partial(_window_kernel, cfg=cfg, window=window,
                               cg_iters=cg_iters)
    free_f = state.free.astype(jnp.float32)
    done_f = state.done.astype(jnp.float32)

    out_shapes = [
        jax.ShapeDtypeStruct((B, Hg, Wg), jnp.float32),   # x
        jax.ShapeDtypeStruct((B, Hg, Wg), jnp.float32),   # y1
        jax.ShapeDtypeStruct((B, Hg, Wg), jnp.float32),   # y2
        jax.ShapeDtypeStruct((B, Hg, Wg), jnp.float32),   # z1
        jax.ShapeDtypeStruct((B, Hg, Wg), jnp.float32),   # z2
        jax.ShapeDtypeStruct((B, 1, Hs), jnp.float32),    # ring
        jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),       # count
        jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),     # done
        jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),     # cur_obj
    ]
    in_specs = [
        bs((8, Hg, Wg)),   # weights
        bs((Hg, Wg)),      # degree
        bs((Hg, Wg)),      # b_eff
        bs((Hg, Wg)),      # free
        bs((Hg, Wg)),      # x
        bs((Hg, Wg)),      # y1
        bs((Hg, Wg)),      # y2
        bs((Hg, Wg)),      # z1
        bs((Hg, Wg)),      # z2
        bs((1, Hs)),       # ring
        bs((1, 1)),        # count
        bs((1, 1)),        # done
        bs((1, 1)),        # cur_obj
        pl.BlockSpec(memory_space=pltpu.SMEM),   # it
    ]
    out_specs = [bs(x.shape[1:]) for x in out_shapes]

    outs = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
    )(prob.stencil.weights, prob.stencil.degree, state.b_eff, free_f,
      state.x, state.y1, state.y2, state.z1, state.z2,
      state.obj_ring[:, None, :], state.obj_count[:, None, None],
      done_f[:, None, None], state.cur_obj[:, None, None],
      jnp.array([state.it], jnp.int32))

    (x, y1, y2, z1, z2, ring, count, done, cur_obj) = outs
    return state._replace(
        x=x, y1=y1, y2=y2, z1=z1, z2=z2,
        obj_ring=ring[:, 0, :], obj_count=count[:, 0, 0],
        it=state.it + window, done=done[:, 0, 0] > 0.5,
        cur_obj=cur_obj[:, 0, 0])


@functools.partial(jax.jit, static_argnames=("cfg", "max_iters", "window",
                                             "bt", "cg_iters",
                                             "interpret"))
def solve_fused(prob, cfg: SolverConfig, max_iters: Optional[int] = None,
                window: int = 50, bt: int = 8, cg_iters: int = 30,
                interpret: Optional[bool] = None):
    """Plain full seg solve on the fused stencil kernel."""
    from ..core import qp as qp_core

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if max_iters is None:
        max_iters = cfg.max_iters
    state = qp_core.init_state(prob, cfg)

    def cond(s):
        return jnp.logical_and(s.it < max_iters, ~jnp.all(s.done))

    def body(s):
        return qp_window_fused(s, prob, cfg, window, bt=bt,
                               cg_iters=cg_iters, interpret=interpret)

    return jax.lax.while_loop(cond, body, state)
