"""Fused Pallas TPU kernel for the early-fixing policy forward pass.

The l2f loop scores millions of per-variable trajectory rows per solve
(reference ``_get_fix_vec``, LinerProgramming/.../trainer.py:216-252).
The natural (rows, tokens, features) layout wastes >85% of every tile
(token/head dims of 20/16 vs the (8, 128) tile), and the transposed
XLA path (models/fast_policy.py) still round-trips every intermediate
through HBM -- ~0.4M rows/s.

This kernel uses a third layout: **tokens ride the sublane (M) axis**.
Hidden state is one (T*R, E) block -- token t of row r lives at sublane
t*R + r -- so every dense op (embed, QKV, W_out, FF, classifier) is a
single well-shaped (T*R, 128)-by-(128, N) MXU matmul, and attention's
cross-token mixing becomes segment matmuls with a 0/1 head-segment
matrix (q.k per head = (q*k) @ S with S[e, h] = [e//K == h]).  All
activations and packed weights stay resident in VMEM for the whole
forward; HBM traffic is one read of the rows and one write of the
sigmoids.

Evaluates the SAME math as models/policy.GraphAttentionEncoder /
MLPEncoder in eval mode (BatchNorm folded to per-feature affine, the
reference's init-shift quirk applied at pack time), for both window
modes: ``chunk`` (LP/attack, token t = row[t*C:(t+1)*C]) and
``sliding`` (segmentation, token t = row[t:t+C], mha.py:228-236 / Seg
trainer.py:718-725).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .policy import position_encoding

_BN_EPS = 1e-5  # flax.linen.BatchNorm default, matches torch 1e-5


class PackedPolicy(NamedTuple):
    """Weights re-packed for the tokens-in-sublanes kernel layout."""

    w_top: jnp.ndarray   # (C, E) embed weights for the data channels
    peb: jnp.ndarray     # (T, E) PE @ embed_bottom + embed bias, per token
    seg: jnp.ndarray     # (E, H) 0/1 head-segment matrix
    segT: jnp.ndarray    # (H, E) its transpose
    wqkv: jnp.ndarray    # (L, E, 3E) q|k|v projections, lane = h*K + k
    wo: jnp.ndarray      # (L, E, E) out projection, sublane = h*K + k
    g1: jnp.ndarray      # (L, 1, E) BN1 folded scale
    c1: jnp.ndarray      # (L, 1, E) BN1 folded shift
    w1: jnp.ndarray      # (L, E, F) FF up
    b1: jnp.ndarray      # (L, 1, F)
    w2: jnp.ndarray      # (L, F, E) FF down
    b2: jnp.ndarray      # (L, 1, E)
    g2: jnp.ndarray      # (L, 1, E) BN2 folded scale
    c2: jnp.ndarray      # (L, 1, E)
    wc0: jnp.ndarray     # (T*E, 256) classifier, sliced per token block
    bc0: jnp.ndarray     # (1, 256)
    wc1: jnp.ndarray     # (256, 128)
    bc1: jnp.ndarray     # (1, 128)
    wc2: jnp.ndarray     # (128, 16)
    bc2: jnp.ndarray     # (1, 16)
    w3: jnp.ndarray      # (1, 16) final logit weights
    b3: jnp.ndarray      # (1, 1) final logit bias


def _fold_bn(bn_params, bn_stats):
    g = bn_params["scale"] * jax.lax.rsqrt(bn_stats["var"] + _BN_EPS)
    c = bn_params["bias"] - bn_stats["mean"] * g
    return g[None, :], c[None, :]


def pack_policy_weights(variables: Dict[str, Any], node_size: int,
                        chunk_dim: int, pe_dim: int) -> PackedPolicy:
    """Pack flax policy variables (MHA or MLP encoder) for the kernel.

    Pure jnp -- safe to call inside jit (constant-folded per compile).
    The reference's attention init subtracts stdv from the raw uniform
    params at call time (policy.py ``param``); that shift is applied
    here once.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    T, C, P = node_size, chunk_dim, pe_dim

    Wemb = params["Dense_0"]["kernel"]            # (C+P, E)
    bemb = params["Dense_0"]["bias"]
    E = Wemb.shape[1]
    w_top = Wemb[:C]
    pe = position_encoding(T, P)                  # (T, P)
    peb = pe @ Wemb[C:] + bemb[None, :]

    layer_keys = sorted(k for k in params if k.startswith("MHALayer"))
    L = len(layer_keys)
    H = 8
    wqkv, wo, g1, c1, w1, b1, w2, b2, g2, c2 = ([] for _ in range(10))
    for lk in layer_keys:
        lp_ = params[lk]
        lst = stats[lk]
        att = lp_["MultiHeadAttention_0"]

        def shifted(name):
            w = att[name]
            return w - 1.0 / np.sqrt(w.shape[-1])

        Wq, Wk, Wv = shifted("W_query"), shifted("W_key"), shifted("W_val")
        Wout = shifted("W_out")                   # (H, K, E)
        H = Wq.shape[0]
        # (H, E, K) -> (E, H*K): lane index h*K + k
        to_lanes = lambda w: jnp.transpose(w, (1, 0, 2)).reshape(E, E)
        wqkv.append(jnp.concatenate(
            [to_lanes(Wq), to_lanes(Wk), to_lanes(Wv)], axis=1))
        wo.append(Wout.reshape(E, E))             # sublane index h*K + k
        a, b_ = _fold_bn(lp_["BatchNorm_0"], lst["BatchNorm_0"])
        g1.append(a), c1.append(b_)
        w1.append(lp_["Dense_0"]["kernel"])
        b1.append(lp_["Dense_0"]["bias"][None, :])
        w2.append(lp_["Dense_1"]["kernel"])
        b2.append(lp_["Dense_1"]["bias"][None, :])
        a, b_ = _fold_bn(lp_["BatchNorm_1"], lst["BatchNorm_1"])
        g2.append(a), c2.append(b_)

    if L == 0:   # MLP encoder: embed + classifier only (placeholders)
        zeros = lambda *s: jnp.zeros(s, jnp.float32)
        wqkv, wo = [zeros(E, 3 * E)], [zeros(E, E)]
        g1 = c1 = g2 = c2 = [zeros(1, E)]
        w1, b1 = [zeros(E, 1)], [zeros(1, 1)]
        w2, b2 = [zeros(1, E)], [zeros(1, E)]

    K = E // H
    lane = jnp.arange(E)
    seg = (lane[:, None] // K == jnp.arange(H)[None, :]).astype(jnp.float32)

    cl = params["Classifier_0"]
    return PackedPolicy(
        w_top=w_top, peb=peb, seg=seg, segT=seg.T,
        wqkv=jnp.stack(wqkv), wo=jnp.stack(wo),
        g1=jnp.stack(g1), c1=jnp.stack(c1),
        w1=jnp.stack(w1), b1=jnp.stack(b1),
        w2=jnp.stack(w2), b2=jnp.stack(b2),
        g2=jnp.stack(g2), c2=jnp.stack(c2),
        wc0=cl["Dense_0"]["kernel"], bc0=cl["Dense_0"]["bias"][None, :],
        wc1=cl["Dense_1"]["kernel"], bc1=cl["Dense_1"]["bias"][None, :],
        wc2=cl["Dense_2"]["kernel"], bc2=cl["Dense_2"]["bias"][None, :],
        w3=cl["Dense_3"]["kernel"].T, b3=cl["Dense_3"]["bias"][None, :])


def _policy_kernel(rows_ref, wtop_ref, peb_ref, seg_ref, segT_ref,
                   wqkv_ref, wo_ref, g1_ref, c1_ref, w1_ref, b1_ref,
                   w2_ref, b2_ref, g2_ref, c2_ref,
                   wc0_ref, bc0_ref, wc1_ref, bc1_ref, wc2_ref, bc2_ref,
                   w3_ref, b3_ref,
                   out_ref, h_scr, qkv_scr, att_scr,
                   *, T: int, C: int, stride: int, E: int, H: int,
                   L: int, R: int, attention: bool):
    f32 = jnp.float32
    dot = functools.partial(jnp.dot, preferred_element_type=f32)

    # ---- embed: h[t] = rows[:, t*stride : +C] @ W_top + peb[t] ----------
    wtop = wtop_ref[...]
    for t in range(T):
        x_t = rows_ref[:, t * stride:t * stride + C]
        h_scr[t * R:(t + 1) * R, :] = dot(x_t, wtop) + peb_ref[t:t + 1, :]

    if attention:
        scale = 1.0 / np.sqrt(E // H)
        S = seg_ref[...]
        St = segT_ref[...]
        for l in range(L):
            qkv_scr[...] = dot(h_scr[...], wqkv_ref[l])
            k_all = qkv_scr[:, E:2 * E]
            v_all = qkv_scr[:, 2 * E:3 * E]
            for t in range(T):
                q_t = qkv_scr[t * R:(t + 1) * R, 0:E]
                q_rep = jnp.concatenate([q_t] * T, axis=0)   # (T*R, E)
                logits = dot(q_rep * k_all, S) * scale       # (T*R, H)
                lg = logits.reshape(T, R, H)
                m = jnp.max(lg, axis=0)
                e = jnp.exp(lg - m[None])
                den = jnp.sum(e, axis=0)
                attn = (e / den[None]).reshape(T * R, H)
                a_exp = dot(attn, St)                        # (T*R, E)
                heads = jnp.sum((a_exp * v_all).reshape(T, R, E), axis=0)
                att_scr[t * R:(t + 1) * R, :] = heads
            h1 = h_scr[...] + dot(att_scr[...], wo_ref[l])
            h1 = h1 * g1_ref[l] + c1_ref[l]
            ff = dot(jnp.maximum(dot(h1, w1_ref[l]) + b1_ref[l], 0.0),
                     w2_ref[l]) + b2_ref[l]
            h2 = h1 + ff
            h_scr[...] = h2 * g2_ref[l] + c2_ref[l]

    # ---- classifier (Net2): sum of per-token-block matmuls --------------
    z = jnp.broadcast_to(bc0_ref[...], (R, bc0_ref.shape[-1]))
    for t in range(T):
        z = z + dot(h_scr[t * R:(t + 1) * R, :],
                    wc0_ref[t * E:(t + 1) * E, :])
    z = jnp.maximum(z, 0.0)
    z = jnp.maximum(dot(z, wc1_ref[...]) + bc1_ref[...], 0.0)
    z = jnp.maximum(dot(z, wc2_ref[...]) + bc2_ref[...], 0.0)  # (R, 16)
    logit = jnp.sum(z * w3_ref[...], axis=-1, keepdims=True) \
        + b3_ref[...]
    out_ref[...] = jax.nn.sigmoid(logit)


@functools.partial(jax.jit, static_argnames=(
    "node_size", "chunk_dim", "stride", "attention", "block_rows",
    "interpret"))
def pallas_policy_scores(packed: PackedPolicy, rows: jnp.ndarray,
                         node_size: int, chunk_dim: int, stride: int,
                         attention: bool = True, block_rows: int = 64,
                         interpret: bool = False) -> jnp.ndarray:
    """Sigmoid scores for (Rtot, ws) trajectory rows via the fused
    kernel.  ``stride`` = chunk_dim for 'chunk' windows, 1 for
    'sliding'.  Rows are padded up to ``block_rows``; one grid program
    scores one block."""
    Rtot, ws = rows.shape
    T, C = node_size, chunk_dim
    assert (T - 1) * stride + C <= ws, (T, C, stride, ws)
    R = block_rows
    pad = (-Rtot) % R
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
    n_blocks = rows.shape[0] // R

    E = packed.w_top.shape[1]
    H = packed.seg.shape[1]
    L = packed.wqkv.shape[0]
    F = packed.w1.shape[-1]

    kernel = functools.partial(
        _policy_kernel, T=T, C=C, stride=stride, E=E, H=H, L=L, R=R,
        attention=attention)

    def row_spec():
        return pl.BlockSpec((R, ws), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full(a):
        rank = a.ndim
        return pl.BlockSpec(a.shape, lambda i: (0,) * rank,
                            memory_space=pltpu.VMEM)

    in_specs = [row_spec()] + [full(a) for a in packed]
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows.shape[0], 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T * R, E), jnp.float32),       # h
            pltpu.VMEM((T * R, 3 * E), jnp.float32),   # qkv
            pltpu.VMEM((T * R, E), jnp.float32),       # attention heads
        ],
        interpret=interpret,
    )(rows, *packed)
    return out[:Rtot, 0]


def policy_scores_pallas(variables: Dict[str, Any], rows: jnp.ndarray,
                         pcfg, interpret: bool = False,
                         block_rows: int = 64) -> jnp.ndarray:
    """Drop-in scorer for train.l2f: packs weights (constant-folded
    under jit) and runs the fused kernel."""
    packed = pack_policy_weights(variables, pcfg.node_size,
                                 pcfg.chunk_dim, pcfg.pe_dim)
    stride = pcfg.chunk_dim if pcfg.window_mode == "chunk" else 1
    attention = any(k.startswith("MHALayer")
                    for k in variables["params"])
    return pallas_policy_scores(packed, rows, pcfg.node_size,
                                pcfg.chunk_dim, stride,
                                attention=attention,
                                block_rows=block_rows,
                                interpret=interpret)
