"""Fast transposed inference path for the early-fixing MHA policy.

The natural (R, tokens, features) layout scores ~0.15M rows/s on TPU:
with node_size = 20 tokens and 16-wide heads, every attention tensor's
minor dims are far below the (8, 128) tile, so 87%+ of each tile is
padding.  This module evaluates the SAME network (same parameters,
same math as models/policy.GraphAttentionEncoder in eval mode) in a
transposed layout with the ROW dimension minor -- every matmul becomes
(128k, ...) @ (..., R) with lane-aligned operands, and the tiny
token/head dims ride in the batch/sublane positions.

Used by the l2f loop's policy scoring where millions of per-variable
trajectory rows are scored per solve.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .policy import position_encoding


def _bn_inference(params, stats, h):
    """BatchNorm in eval mode on (T, E, R): normalize feature axis E."""
    mean = stats["mean"][None, :, None]
    var = stats["var"][None, :, None]
    scale = params["scale"][None, :, None]
    bias = params["bias"][None, :, None]
    return (h - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


def mha_scores_transposed(variables: Dict[str, Any], rows: jnp.ndarray,
                          node_size: int = 20, chunk_dim: int = 5,
                          pe_dim: int = 5) -> jnp.ndarray:
    """Sigmoid scores for (R, ws) trajectory rows via the transposed
    evaluation of GraphAttentionEncoder (chunk window mode).

    ``variables`` are the standard flax variables of the policy.
    Returns (R,) sigmoids identical (to f32 rounding) to
    ``model.apply(variables, tokens, train=False)``.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    R = rows.shape[0]
    T = node_size

    # tokens (R, T, C) -> (T, C, R); concat PE broadcast over R
    x = rows.reshape(R, T, chunk_dim).transpose(1, 2, 0)
    pe = position_encoding(T, pe_dim)                     # (T, P)
    pe_b = jnp.broadcast_to(pe[:, :, None], (T, pe_dim, R))
    x = jnp.concatenate([x, pe_b], axis=1)                # (T, C+P, R)

    # init embed: h[t] = W^T x[t] + b
    W = params["Dense_0"]["kernel"]                       # (C+P, E)
    b = params["Dense_0"]["bias"]
    h = jnp.einsum("de,tdr->ter", W, x,
                   preferred_element_type=jnp.float32) + b[None, :, None]

    E = h.shape[1]
    n_layers = len([k for k in params if k.startswith("MHALayer")])
    for li in range(n_layers):
        lp_ = params[f"MHALayer_{li}"]
        lstats = stats.get(f"MHALayer_{li}", {})
        att = lp_["MultiHeadAttention_0"]
        # reference init subtracts stdv from the raw uniform params
        def att_w(name):
            w = att[name]
            return w - 1.0 / np.sqrt(w.shape[-1])

        Wq, Wk, Wv = att_w("W_query"), att_w("W_key"), att_w("W_val")
        Wo = att_w("W_out")                               # (H, K, E)
        H, _, K = Wq.shape

        q = jnp.einsum("hek,ter->htkr", Wq, h,
                       preferred_element_type=jnp.float32)
        k = jnp.einsum("hek,ter->htkr", Wk, h,
                       preferred_element_type=jnp.float32)
        v = jnp.einsum("hek,ter->htkr", Wv, h,
                       preferred_element_type=jnp.float32)

        # logits[h, t, s, r]: contract k with r in lanes -- computed as
        # T stacked elementwise-reduce ops, all R-minor
        scale = 1.0 / np.sqrt(K)
        logits = jnp.einsum("htkr,hskr->htsr", q, k,
                            preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(logits, axis=2)             # over s
        heads = jnp.einsum("htsr,hskr->htkr", attn, v,
                           preferred_element_type=jnp.float32)
        out = jnp.einsum("hke,htkr->ter", Wo, heads,
                         preferred_element_type=jnp.float32)
        h = h + out
        h = _bn_inference(lp_["BatchNorm_0"], lstats["BatchNorm_0"], h)
        # FF 512 with skip
        W1 = lp_["Dense_0"]["kernel"]
        b1 = lp_["Dense_0"]["bias"]
        W2 = lp_["Dense_1"]["kernel"]
        b2 = lp_["Dense_1"]["bias"]
        f = jnp.einsum("ef,ter->tfr", W1, h,
                       preferred_element_type=jnp.float32) \
            + b1[None, :, None]
        f = jax.nn.relu(f)
        f = jnp.einsum("fe,tfr->ter", W2, f,
                       preferred_element_type=jnp.float32) \
            + b2[None, :, None]
        h = h + f
        h = _bn_inference(lp_["BatchNorm_1"], lstats["BatchNorm_1"], h)

    # classifier on flattened (T*E, R)
    flat = h.reshape(T * E, R)
    cl = params["Classifier_0"]
    z = flat
    for i, name in enumerate(["Dense_0", "Dense_1", "Dense_2", "Dense_3"]):
        Wc = cl[name]["kernel"]
        bc = cl[name]["bias"]
        z = jnp.einsum("df,dr->fr", Wc, z,
                       preferred_element_type=jnp.float32) \
            + bc[:, None]
        if i < 3:
            z = jax.nn.relu(z)
    return jax.nn.sigmoid(z[0])


def fast_policy_scores(variables, rows: jnp.ndarray, pcfg,
                       row_chunk: int = 32768) -> jnp.ndarray:
    """Chunked fast scorer (drop-in for train.l2f.policy_scores when the
    policy is the chunk-mode GraphAttentionEncoder)."""
    R = rows.shape[0]
    score = functools.partial(mha_scores_transposed,
                              node_size=pcfg.node_size,
                              chunk_dim=pcfg.chunk_dim,
                              pe_dim=pcfg.pe_dim)
    if R <= row_chunk:
        return score(variables, rows)
    pad = (-R) % row_chunk
    rp = jnp.pad(rows, ((0, pad), (0, 0)))
    rp = rp.reshape(-1, row_chunk, rows.shape[-1])
    sig = jax.lax.map(lambda rc: score(variables, rc), rp).reshape(-1)
    return sig[:R]
