"""Symmetric matvec reading only the lower-triangle blocks.

The Woodbury x-update applies the symmetric (B, m, m) ``G^{-1}`` to one
m-vector per ADMM iteration.  At the HBM-bound ladder rungs that read
is ~43% of the single-stream iteration's traffic (E bf16 13.6 MB +
G^{-1} f32 11.1 MB per instance at (1664, 4096)); symmetry makes
almost half of it redundant.  This kernel streams only the
L = T(T+1)/2 lower blocks:

* ``pack_tril_blocks`` reshuffles G^{-1} ONCE per solve window into a
  dense (L, B, bm, bm) array of the lower-triangle blocks (row-major:
  slot l holds block-row i, block-col j with l = i(i+1)/2 + j, j <= i);
* the kernel walks a linear (L,) grid -- the block coordinates are
  recovered from ``l`` by the triangular-number inverse, so the index
  maps stay pure functions (no scalar prefetch);
* the BATCH lives inside each grid step: one step DMAs the (B, bm, bm)
  slab (MBs, amortizing the per-step grid overhead -- a (B, L) grid of
  per-instance (bm, bm) matvecs measured 3x SLOWER than the dense
  einsum from ~0.5 us/step overhead x B*L steps) and performs batched
  MXU dots; ``v`` and ``y`` stay whole in VMEM ((B, m) f32 is KBs);
* each step accumulates ``y[:, i] += G_l @ v[:, j]`` and, off the
  diagonal, ``y[:, j] += G_l^T @ v[:, i]`` at 128-aligned dynamic
  sublane offsets.

Result: G^{-1} HBM traffic x0.54 (plus the diagonal's m*bm/2 slack).
Exactness: uses the lower triangle as truth; ``cho_solve``'s inverse is
symmetric to f32 rounding (~1e-7 relative), within the solver's noise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_tril_blocks(G: jnp.ndarray, bm: int = 128) -> jnp.ndarray:
    """(B, m, m) -> (L, B, bm, bm) lower-triangle blocks, row-major."""
    B, m, m2 = G.shape
    assert m == m2 and m % bm == 0, (G.shape, bm)
    T = m // bm
    ii, jj = np.tril_indices(T)
    Gb = G.reshape(B, T, bm, T, bm).transpose(0, 1, 3, 2, 4)
    return Gb[:, ii, jj].transpose(1, 0, 2, 3)   # (L, B, bm, bm)


def _block_coords(l):
    """Invert l = i(i+1)/2 + j (j <= i); exact for l < ~1e6 despite the
    f32 sqrt thanks to the +-1 corrections."""
    lf = l.astype(jnp.float32)
    i = ((jnp.sqrt(8.0 * lf + 1.0) - 1.0) * 0.5).astype(jnp.int32)
    i = jnp.where((i + 1) * (i + 2) // 2 <= l, i + 1, i)
    i = jnp.where(i * (i + 1) // 2 > l, i - 1, i)
    j = l - i * (i + 1) // 2
    return i, j


def _symm_kernel(G_ref, v_ref, y_ref, *, bm: int):
    # v4: ZERO dynamic indexing.  v/y stay whole in VMEM as (B, T, bm)
    # (constant index maps); block i/j selection is a one-hot masked
    # reduce over the T axis and the accumulate is a one-hot masked
    # broadcast-add -- pure iota-compare / mul / reduce / dot_general
    # patterns Mosaic always lowers.  (History: v1's N=1 matvecs
    # mis-executed on-chip; v2's lane-dim dynamic slices and v3's
    # sublane dynamic reads + dynamic-offset accumulates both crashed
    # the Mosaic compiler, HTTP 500.)  The masked ops touch B*T*bm
    # VMEM elements per step -- noise next to the (B, bm, bm) DMA this
    # kernel exists to halve.
    l = pl.program_id(0)
    T = y_ref.shape[1]

    @pl.when(l == 0)
    def _():
        y_ref[...] = jnp.zeros(y_ref.shape, y_ref.dtype)

    i, j = _block_coords(l)
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, bm), 0)
    mi = (rows == i).astype(jnp.float32)[None]   # (1, T, bm)
    mj = (rows == j).astype(jnp.float32)[None]
    G = G_ref[0]                               # (B, bm, bm)
    # Mosaic only implements batched matvecs whose contracting dim is
    # the LAST dim of both operands ("rhs must be vector-like [B, K]"),
    # so the transpose-side product materializes G^T in registers
    # rather than using a dim-1-contracting dot_general.
    bdims = (((2,), (1,)), ((0,), (0,)))       # G @ v_blk, batched
    v = v_ref[...]                             # (B, T, bm)
    vj = jnp.sum(v * mj, axis=1)               # (B, bm)
    yi = jax.lax.dot_general(G, vj, bdims,
                             preferred_element_type=jnp.float32)
    y_ref[...] += yi[:, None, :] * mi

    @pl.when(i != j)
    def _():
        vi = jnp.sum(v * mi, axis=1)
        Gt = jnp.swapaxes(G, 1, 2)
        yj = jax.lax.dot_general(Gt, vi, bdims,
                                 preferred_element_type=jnp.float32)
        y_ref[...] += yj[:, None, :] * mj


@functools.partial(jax.jit, static_argnames=("bm", "interpret"))
def symm_matvec(Gp: jnp.ndarray, v: jnp.ndarray, bm: int = 128,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """y = G @ v from the packed lower-triangle blocks ``Gp``.

    Gp: (L, B, bm, bm) from ``pack_tril_blocks``; v: (B, m) f32.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    L, B, bm1, bm2 = Gp.shape
    assert bm1 == bm and bm2 == bm, (Gp.shape, bm)
    m = v.shape[-1]
    T = m // bm
    assert T * (T + 1) // 2 == L, (m, bm, L)
    y = pl.pallas_call(
        functools.partial(_symm_kernel, bm=bm),
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, B, bm, bm), lambda l: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T, bm), lambda l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, T, bm), lambda l: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, bm), jnp.float32),
        interpret=interpret,
    )(Gp, v.astype(jnp.float32).reshape(B, T, bm))
    return y.reshape(B, m)
