"""MXU-routed sparse matvecs: gather/scatter as iota-one-hot matmuls.

Why this exists: XLA's TPU lowering of an ELL gather serializes (~40
cycles/element measured by scripts/probe_sparse_ops.py -- at
(1000,10000)x8 the gather mv+mtv pair cost 33.6 ms where the dense bf16
einsum pair cost 1.77 ms), which left ``ops/sparse.py`` correct but
TPU-dead (VERDICT r3 weak 4/5).  The reference covers this regime with
Eigen CSR expression matvecs on the CPU
(LinerProgramming/.../cython_solver/LPboxADMMsolver.cpp:115-162, ladder
to (2000 items, 1e6 bids) at :2461-2486); the TPU-native equivalent
here re-casts both sparse matvec directions as small dense matmuls the
MXU executes at full rate:

* the m-side vector lives in ``(M1, 128)`` lane tiles;
* each nonzero's row index ``i`` splits as ``i = hi*W + lo``;
* **gather** (``E^T u``): ``onehot(hi) @ u-tiles`` selects each
  nonzero's tile row on the MXU, then a VPU one-hot select picks lane
  ``lo`` -- exactly ``u[i]`` (a one-hot dot has a single nonzero term);
* **scatter** (``E v``): the transposed contraction
  ``onehot(hi)^T @ (onehot(lo) * w)`` accumulates every nonzero's
  contribution into tile ``(hi, lo)`` -- duplicate indices sum inside
  the f32 MXU accumulator, no serialized scatter anywhere.

One-hots are generated on the fly from the integer indices
(broadcasted_iota + compare) in bfloat16 (0/1 is bf16-exact, half the
materialized dot-operand traffic of f32 -- the r4a probe measured the
one-hot HBM traffic, not the MACs, as the bound).  The m-side payload
is carried as THREE bf16 limbs contracted in the same dot (f32
accumulation), the same f32-equivalence construction as the dense bf16
path (core/lp._emv): one limb's 4e-3 rounding enters the dual ascent
scaled by rho and diverges; three limbs give ~24 mantissa bits.

``mv_many``/``mtv_many`` take a (B, k, .) STACK of vectors and share
one one-hot materialization across the stack -- the solver iteration's
stacked ``_emv`` calls (rhs+x0 forward pass, dual+lookahead transpose
pass) cost one index pass instead of k.

The scatter's lane one-hot ``Z = onehot(lo) * w`` materializes
(T, k*3*W) per chunk, so its traffic scales with the lo-width ``W``;
``W=128`` is right for large m (hi-matrix small), small-m blocks (the
CA item block, m1 ~ 1024) pass ``W=16`` to shrink Z ~5x while the
hi-matrix stays tiny.  Chunked ``lax.scan`` over the nonzero axis
bounds all temporaries at a few MB.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import sparse as sparse_ops


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _limbs3(x: jnp.ndarray) -> jnp.ndarray:
    """Split f32 ``x`` into 3 bf16 limbs stacked on a NEW last axis:
    x ~ l0 + l1 + l2 to ~24 mantissa bits (f32-equivalent).

    The rounding MUST go through ``lax.reduce_precision``, not
    ``astype(bf16).astype(f32)``: the XLA TPU pipeline folds the
    convert round-trip to identity, which cancels the residual
    subtraction and silently degrades the split to a SINGLE limb --
    measured on-chip as 1.7e-3 matvec error (exactly one bf16 ulp)
    where CPU emulation of the same program gave 8e-8
    (scripts/diag_struct_tpu.py, r4c).  reduce_precision is the
    documented non-foldable rounding primitive; the subsequent astype
    is exact because the value is already bf16-representable."""
    x = x.astype(jnp.float32)
    l0f = jax.lax.reduce_precision(x, 8, 7)
    r = x - l0f
    l1f = jax.lax.reduce_precision(r, 8, 7)
    r2 = r - l1f
    l2f = jax.lax.reduce_precision(r2, 8, 7)
    return jnp.stack([l0f.astype(jnp.bfloat16),
                      l1f.astype(jnp.bfloat16),
                      l2f.astype(jnp.bfloat16)], axis=-1)


def _flat_chunks(idx: jnp.ndarray, payload: jnp.ndarray, chunk: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, int, int]:
    """Flatten (B, n, Kc[, ...]) nnz arrays to padded (NC, B, T[, ...])
    chunks; pad slots are idx 0 / payload 0 (contribute exact zeros)."""
    B, n, Kc = idx.shape
    L = n * Kc
    T = min(chunk, max(128, L))
    NC = _cdiv(L, T)
    pad = NC * T - L
    tail = payload.shape[3:]
    idx = idx.reshape(B, L)
    payload = payload.reshape((B, L) + tail)
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        payload = jnp.pad(payload,
                          ((0, 0), (0, pad)) + ((0, 0),) * len(tail))
    idx_c = idx.reshape(B, NC, T).transpose(1, 0, 2)
    payload_c = payload.reshape((B, NC, T) + tail)
    payload_c = jnp.moveaxis(payload_c, 1, 0)
    return idx_c, payload_c, NC, T


# m at or below this bound uses the DIRECT one-hot form FOR THE
# GATHER (mtv) only: the full (T, m) one-hot is the dot operand, so
# the (T, k*nl*128) f32 lane-spread tensor disappears (item mtv
# 4.46 -> 2.76 ms at the mega rung).  The scatter (mv) measured the
# OPPOSITE (2.55 -> 4.90 ms: contracting the one-hot over the T axis
# makes XLA materialize its transpose), so mv always keeps the
# two-stage hi/lo form.  Probe lineage: logs/tpu_r4{e,f}.log.
SMALL_M_DIRECT = 2048


def _auto_chunk(B: int) -> int:
    """Per-chunk temporaries scale with B (the mtv gather's R tensor is
    (B, T, k*nl*128) f32): at B=4 the default T=8192 spilled past VMEM
    and the b4 mega solve ran 2.4x worse per instance-iteration than
    B=1 (struct_schur_b4, r4d).  Scale T down with B to hold the
    footprint roughly constant."""
    return max(1024, 8192 // max(B, 1))


def _limbs(x: jnp.ndarray, exact: bool) -> jnp.ndarray:
    """(…,) -> (…, nl): identity f32 limb (exact) or 3 bf16 limbs."""
    return x[..., None] if exact else _limbs3(x)


@functools.partial(jax.jit, static_argnames=("chunk", "exact"))
def _direct_mtv_many(S: sparse_ops.SparseEll, Wk: jnp.ndarray,
                     chunk: Optional[int], exact: bool) -> jnp.ndarray:
    """Small-m gather: one full-width (T, m) one-hot dot per chunk."""
    B, n, Kc = S.col_idx.shape
    if chunk is None:
        chunk = _auto_chunk(B)
    k = Wk.shape[1]
    m = S.m
    Mp = _cdiv(m, 128) * 128
    nl = 1 if exact else 3
    oh_dt = jnp.float32 if exact else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if exact else None
    Wp = Wk.astype(jnp.float32)
    if Mp > m:
        Wp = jnp.pad(Wp, ((0, 0), (0, 0), (0, Mp - m)))
    U = _limbs(Wp, exact)                     # (B, k, Mp, nl)
    U = U.transpose(0, 2, 1, 3).reshape(B, Mp, k * nl)
    idx_c, val_c, NC, T = _flat_chunks(S.col_idx, S.col_val, chunk)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Mp), 2)

    def step(_, args):
        idx, val = args                                    # (B, T)
        oh = (idx[:, :, None] == rows).astype(oh_dt)       # (B, T, Mp)
        R = jax.lax.dot_general(
            oh, U, (((2,), (1,)), ((0,), (0,))),
            precision=prec,
            preferred_element_type=jnp.float32)            # (B, T, k*nl)
        g = R.reshape(B, T, k, nl).sum(-1)
        return None, val[:, :, None] * g

    _, parts = jax.lax.scan(step, None, (idx_c, val_c))    # (NC,B,T,k)
    flat = parts.transpose(1, 0, 2, 3).reshape(B, NC * T, k)
    flat = flat[:, : n * Kc]
    return jnp.sum(flat.reshape(B, n, Kc, k), axis=2).transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("chunk", "exact"))
def _direct_mv_many(S: sparse_ops.SparseEll, Vk: jnp.ndarray,
                    chunk: Optional[int], exact: bool) -> jnp.ndarray:
    """Small-m scatter: contrib = onehot(idx)^T @ w_limbs per chunk --
    no lane-spreading Z tensor at all."""
    B, n, Kc = S.col_idx.shape
    if chunk is None:
        chunk = _auto_chunk(B)
    k = Vk.shape[1]
    m = S.m
    Mp = _cdiv(m, 128) * 128
    nl = 1 if exact else 3
    oh_dt = jnp.float32 if exact else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if exact else None
    wk = S.col_val[:, None, :, :] * Vk.astype(jnp.float32)[:, :, :, None]
    wl = _limbs(wk, exact)              # (B, k, n, Kc, nl)
    wl = wl.transpose(0, 2, 3, 1, 4)    # (B, n, Kc, k, nl)
    idx_c, w_c, NC, T = _flat_chunks(
        S.col_idx, wl.reshape(B, n, Kc, k * nl), chunk)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Mp), 2)

    def step(acc, args):
        idx, w = args                   # (B, T), (B, T, k*nl)
        oh = (idx[:, :, None] == rows).astype(oh_dt)       # (B, T, Mp)
        contrib = jax.lax.dot_general(
            oh, w.astype(oh_dt), (((1,), (1,)), ((0,), (0,))),
            precision=prec,
            preferred_element_type=jnp.float32)            # (B,Mp,k*nl)
        return acc + contrib, None

    acc0 = jnp.zeros((B, Mp, k * nl), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (idx_c, w_c))
    acc = acc.reshape(B, Mp, k, nl).sum(-1)                # limb sum
    return acc.transpose(0, 2, 1)[:, :, :m]


@functools.partial(jax.jit, static_argnames=("chunk", "exact"))
def mtv_many(S: sparse_ops.SparseEll, Wk: jnp.ndarray,
             chunk: Optional[int] = None,
             exact: bool = False) -> jnp.ndarray:
    """``M^T @ w`` for a stack: (B, k, m) -> (B, k, n).

    One shared bf16 one-hot per chunk gathers all k vectors' 3 limbs in
    a single MXU dot (lane axis = k*3*128).  ``exact=True`` keeps the
    payload f32 and runs the dot at HIGHEST precision (the r4a v1
    semantics: a one-hot row has a single nonzero product, so the
    gather is bit-exact u[i]) -- the mega-scale A/B discriminator."""
    if S.m <= SMALL_M_DIRECT:
        return _direct_mtv_many(S, Wk, chunk, exact)
    B, n, Kc = S.col_idx.shape
    if chunk is None:
        chunk = _auto_chunk(B)
    k = Wk.shape[1]
    m = S.m
    nl = 1 if exact else 3
    M1 = _cdiv(m, 128)
    pad = M1 * 128 - m
    Wp = Wk.astype(jnp.float32)
    if pad:
        Wp = jnp.pad(Wp, ((0, 0), (0, 0), (0, pad)))
    # (B, k, M1*128) -> limbs (B, k, M1, 128, nl) -> (B, M1, k*nl*128)
    if exact:
        U = Wp.reshape(B, k, M1, 128)[..., None]
    else:
        U = _limbs3(Wp.reshape(B, k, M1, 128))
    U = U.transpose(0, 2, 1, 4, 3).reshape(B, M1, k * nl * 128)
    idx_c, val_c, NC, T = _flat_chunks(S.col_idx, S.col_val, chunk)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, 128), 4)
    oh_dt = jnp.float32 if exact else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if exact else None

    def step(_, args):
        idx, val = args                                    # (B, T)
        hi = idx // 128
        lo = idx % 128
        oh = (hi[:, :, None]
              == jax.lax.broadcasted_iota(jnp.int32, (1, 1, M1), 2)
              ).astype(oh_dt)                              # (B, T, M1)
        R = jax.lax.dot_general(
            oh, U, (((2,), (1,)), ((0,), (0,))),
            precision=prec,
            preferred_element_type=jnp.float32)            # (B,T,k*nl*128)
        R = R.reshape(B, T, k, nl, 128)
        g = jnp.sum(jnp.where(lo[:, :, None, None, None] == lanes,
                              R, 0.0), axis=(3, 4))        # (B, T, k)
        return None, val[:, :, None] * g

    _, parts = jax.lax.scan(step, None, (idx_c, val_c))    # (NC,B,T,k)
    flat = parts.transpose(1, 0, 2, 3).reshape(B, NC * T, k)
    flat = flat[:, : n * Kc]
    return jnp.sum(flat.reshape(B, n, Kc, k), axis=2).transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("chunk", "lo_width", "exact"))
def mv_many(S: sparse_ops.SparseEll, Vk: jnp.ndarray,
            chunk: Optional[int] = None, lo_width: int = 128,
            exact: bool = False) -> jnp.ndarray:
    """``M @ v`` for a stack: (B, k, n) -> (B, k, m).

    Scatter-accumulate via ``onehot(hi)^T @ (onehot(lo) * w_limbs)``;
    ``lo_width`` trades hi-matrix size against the Z payload width
    (pass a small power of two when m is small).  ``exact=True``: f32
    payload, HIGHEST-precision dot (v1 semantics)."""
    B, n, Kc = S.col_idx.shape
    if chunk is None:
        chunk = _auto_chunk(B)
    k = Vk.shape[1]
    m = S.m
    W = lo_width
    nl = 1 if exact else 3
    assert 128 % W == 0 or W % 128 == 0
    H = _cdiv(m, W)                     # hi space
    # per-slot payload w = val * v[col] -- slot-aligned broadcast
    wk = S.col_val[:, None, :, :] * Vk.astype(jnp.float32)[:, :, :, None]
    if exact:
        wl = wk[..., None]              # (B, k, n, Kc, 1)
    else:
        wl = _limbs3(wk)                # (B, k, n, Kc, 3)
    wl = wl.transpose(0, 2, 3, 1, 4)    # (B, n, Kc, k, nl)
    idx_c, w_c, NC, T = _flat_chunks(
        S.col_idx, wl.reshape(B, n, Kc, k * nl), chunk)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, W), 3)
    oh_dt = jnp.float32 if exact else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if exact else None

    def step(acc, args):
        idx, w = args                   # (B, T), (B, T, k*nl)
        hi = idx // W
        lo = idx % W
        oh_hi = (hi[:, :, None]
                 == jax.lax.broadcasted_iota(jnp.int32, (1, 1, H), 2)
                 ).astype(oh_dt)                           # (B, T, H)
        Z = jnp.where(lo[:, :, None, None] == lanes,
                      w[:, :, :, None], 0.0)               # (B,T,knl,W)
        Z = Z.astype(oh_dt).reshape(B, T, k * nl * W)
        contrib = jax.lax.dot_general(
            oh_hi, Z, (((1,), (1,)), ((0,), (0,))),
            precision=prec,
            preferred_element_type=jnp.float32)            # (B,H,k*nl*W)
        return acc + contrib, None

    acc0 = jnp.zeros((B, H, k * nl * W), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (idx_c, w_c))
    acc = acc.reshape(B, H, k, nl, W).sum(3)               # limb sum
    out = acc.transpose(0, 2, 1, 3).reshape(B, k, H * W)
    return out[:, :, :m]


def mtv(S: sparse_ops.SparseEll, w: jnp.ndarray,
        chunk: Optional[int] = None, exact: bool = False) -> jnp.ndarray:
    """``M^T @ w``: (B, m) -> (B, n)."""
    return mtv_many(S, w[:, None], chunk=chunk, exact=exact)[:, 0]


def mv(S: sparse_ops.SparseEll, v: jnp.ndarray,
       chunk: Optional[int] = None, lo_width: int = 128,
       exact: bool = False) -> jnp.ndarray:
    """``M @ v``: (B, n) -> (B, m)."""
    return mv_many(S, v[:, None], chunk=chunk, lo_width=lo_width,
                   exact=exact)[:, 0]
