"""Early-fixing policy networks (flax).

TPU-native re-implementations of the reference's policy encoders
(LinerProgramming/LinearProgramming/mha.py):

* ``GraphAttentionEncoder`` (:202-253): per-variable trajectory chunks
  (B, node_size, 5) + sinusoidal positional encoding (dim 5, concat) ->
  linear embed 128 -> 2 x MultiHeadAttentionLayer (8 heads, FF 512,
  BatchNorm, skip connections, :157-183) -> flatten -> ``Net2`` MLP
  256-128-16-1 -> (logit, sigmoid).
* ``MLPEncoder`` (:255-304): identical minus the attention layers.
* ``FixingEncoder`` (:307-367): 11-way variant (vestigial in the
  reference but part of its API surface).

``node_size`` is 20 for LP (ws=100), 5 for segmentation (ws=10 sliding
windows of 5) and 10 for the sparse attack (ws=50), with the classifier
input width ``node_size*128`` being the only delta between the three
reference copies (mha.py:188).

Everything runs in (batched) jit; attention over <=20 tokens of dim 128
is a pure MXU workload.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


def position_encoding(n_pos: int, d: int) -> jnp.ndarray:
    """Sinusoidal positional encoding (reference common/utils.py:20-32).

    Row 0 is zeroed before sin/cos are applied, so its cos slots are 1 --
    faithfully reproducing the reference's quirk."""
    pe = np.array(
        [[pos / np.power(10000, 2 * (j // 2) / d) for j in range(d)]
         if pos != 0 else np.zeros(d) for pos in range(n_pos)])
    pe[:, 0::2] = np.sin(pe[:, 0::2])
    pe[:, 1::2] = np.cos(pe[:, 1::2])
    return jnp.asarray(pe, dtype=jnp.float32)


class MultiHeadAttention(nn.Module):
    """Self-attention with per-head projection tensors (mha.py:20-122)."""

    n_heads: int = 8
    embed_dim: int = 128

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        B, T, D = h.shape
        key_dim = self.embed_dim // self.n_heads

        def param(name, shape):
            # reference init: U(-1/sqrt(last_dim), 1/sqrt(last_dim))
            stdv = 1.0 / np.sqrt(shape[-1])
            init = nn.initializers.uniform(scale=2.0 * stdv)
            return self.param(name, init, shape) - stdv

        Wq = param("W_query", (self.n_heads, D, key_dim))
        Wk = param("W_key", (self.n_heads, D, key_dim))
        Wv = param("W_val", (self.n_heads, D, key_dim))
        Wo = param("W_out", (self.n_heads, key_dim, self.embed_dim))

        q = jnp.einsum("btd,hdk->bhtk", h, Wq)
        k = jnp.einsum("btd,hdk->bhtk", h, Wk)
        v = jnp.einsum("btd,hdk->bhtk", h, Wv)
        logits = jnp.einsum("bhtk,bhsk->bhts", q, k) / np.sqrt(key_dim)
        attn = jax.nn.softmax(logits, axis=-1)
        heads = jnp.einsum("bhts,bhsk->bhtk", attn, v)
        out = jnp.einsum("bhtk,hke->bte", heads, Wo)
        return out


class MHALayer(nn.Module):
    """Skip(MHA) -> BatchNorm -> Skip(FF 512) -> BatchNorm (mha.py:157-183)."""

    n_heads: int = 8
    embed_dim: int = 128
    feed_forward_hidden: int = 512

    @nn.compact
    def __call__(self, h: jnp.ndarray, train: bool) -> jnp.ndarray:
        h = h + MultiHeadAttention(self.n_heads, self.embed_dim)(h)
        B, T, D = h.shape
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=None)(h.reshape(B * T, D)).reshape(B, T, D)
        ff = nn.Sequential([
            nn.Dense(self.feed_forward_hidden), nn.relu,
            nn.Dense(self.embed_dim)])
        h = h + ff(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=None)(h.reshape(B * T, D)).reshape(B, T, D)
        return h


class Classifier(nn.Module):
    """``Net2``: node_size*128 -> 256 -> 128 -> 16 -> out (mha.py:185-199)."""

    out_dim: int = 1

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(256)(h))
        h = nn.relu(nn.Dense(128)(h))
        h = nn.relu(nn.Dense(16)(h))
        return nn.Dense(self.out_dim)(h)


class GraphAttentionEncoder(nn.Module):
    """MHA policy (mha.py:202-253). Input (B, node_size, chunk_dim)."""

    n_heads: int = 8
    embed_dim: int = 128
    n_layers: int = 2
    pe_dim: int = 5
    feed_forward_hidden: int = 512
    out_dim: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T, D = x.shape
        pe = position_encoding(T, self.pe_dim)
        pe = jnp.broadcast_to(pe[None], (B, T, self.pe_dim))
        x = jnp.concatenate([x, pe], axis=-1)
        h = nn.Dense(self.embed_dim)(x)
        for _ in range(self.n_layers):
            h = MHALayer(self.n_heads, self.embed_dim,
                         self.feed_forward_hidden)(h, train)
        h = h.reshape(B, T * self.embed_dim)
        logit = Classifier(self.out_dim)(h)
        return logit, jax.nn.sigmoid(logit)


class MLPEncoder(nn.Module):
    """MLP ablation: embed + flatten + classify, no attention
    (mha.py:255-304)."""

    embed_dim: int = 128
    pe_dim: int = 5
    out_dim: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T, D = x.shape
        pe = position_encoding(T, self.pe_dim)
        pe = jnp.broadcast_to(pe[None], (B, T, self.pe_dim))
        x = jnp.concatenate([x, pe], axis=-1)
        h = nn.Dense(self.embed_dim)(x)
        h = h.reshape(B, T * self.embed_dim)
        logit = Classifier(self.out_dim)(h)
        return logit, jax.nn.sigmoid(logit)


class FixingEncoder(nn.Module):
    """11-way fixing head variant (mha.py:307-367)."""

    embed_dim: int = 128
    pe_dim: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T, D = x.shape
        pe = position_encoding(T, self.pe_dim)
        pe = jnp.broadcast_to(pe[None], (B, T, self.pe_dim))
        x = jnp.concatenate([x, pe], axis=-1)
        h = nn.Dense(self.embed_dim)(x)
        h = h.reshape(B, T * self.embed_dim)
        logit = Classifier(11)(h)
        return logit, jax.nn.sigmoid(logit)


def build_policy(net: str, out_dim: int = 1):
    """Factory mirroring the reference's ``-net mha|mlp`` flag
    (experiments/run.py:27-36)."""
    if net == "mha":
        return GraphAttentionEncoder(out_dim=out_dim)
    if net == "mlp":
        return MLPEncoder(out_dim=out_dim)
    if net == "fixing":
        return FixingEncoder()
    raise ValueError(f"unknown net {net!r}; expected 'mha'|'mlp'|'fixing'")
