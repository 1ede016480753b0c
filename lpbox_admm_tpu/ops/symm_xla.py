"""Symmetric (B, m, m) matvec that reads only the lower triangle.

Pure-XLA counterpart of ``ops/pallas_symm`` (whose Mosaic one-hot
workarounds cost more VPU time than the halved DMA saved).  The matrix
is packed once per solve window into its lower-triangle 128x128 blocks
``(B, L, bm, bm)`` with ``L = mb(mb+1)/2`` -- 0.54x the dense bytes at
m=1664 -- and the per-iteration apply forms

    u_r += G_rc @ v_c        (all packed blocks)
    u_c += G_rc^T @ v_r      (off-diagonal blocks; G_cr = G_rc^T)

as two multiply+reduce pairs over the SAME packed tensor.  Both
reductions are written as broadcast-multiply + ``sum`` (not
``dot_general``) so XLA can sibling-fuse them into one pass over the
packed blocks; whether it actually does is a measured property of the
backend (see STATUS.md).  Block gather/scatter use one-hot matmuls --
no dynamic indexing anywhere.

Exact in f32 up to reassociation (~1e-7 at ladder shapes), unlike the
bfloat16 G^{-1} storage option (config.SolverConfig.ginv_dtype).

Reference context: the x-update solve this feeds is the PCG of
LinerProgramming/.../cython_solver/LPboxADMMsolver.cpp:26-335 (solved
there to 1e-3; here exactly via the Woodbury inverse).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BM = 128


def _block_index(mb: int):
    blocks = [(r, c) for r in range(mb) for c in range(r + 1)]
    ridx = np.array([r for r, _ in blocks], np.int32)
    cidx = np.array([c for _, c in blocks], np.int32)
    return ridx, cidx


def packable(m: int, bm: int = BM) -> bool:
    return m % bm == 0 and m // bm >= 2


def pack_tril(ginv: jnp.ndarray, bm: int = BM) -> jnp.ndarray:
    """(B, m, m) symmetric -> (B, L, bm, bm) lower-triangle blocks.

    Packed once per solve window (loop-invariant; XLA hoists it out of
    the iteration ``while_loop``), so the pack's own full read is
    amortized over the window length.
    """
    B, m, m2 = ginv.shape
    assert m == m2 and packable(m, bm), (m, m2, bm)
    mb = m // bm
    ridx, cidx = _block_index(mb)
    return jnp.stack(
        [ginv[:, r * bm:(r + 1) * bm, c * bm:(c + 1) * bm]
         for r, c in zip(ridx, cidx)], axis=1)


@functools.partial(jax.jit, static_argnames=("bm",))
def symm_matvec(Gp: jnp.ndarray, v: jnp.ndarray,
                bm: int = BM) -> jnp.ndarray:
    """u = G @ v from the packed lower-triangle blocks (G symmetric)."""
    B, L, bm1, bm2 = Gp.shape
    assert bm1 == bm and bm2 == bm
    m = v.shape[-1]
    mb = m // bm
    assert L == mb * (mb + 1) // 2, (L, mb)
    ridx, cidx = _block_index(mb)
    dt = v.dtype
    # one-hot gather/scatter operators ((L, mb) / (mb, L) constants)
    sel_c = jnp.asarray(np.eye(mb, dtype=np.float32)[cidx])   # (L, mb)
    sel_r = jnp.asarray(np.eye(mb, dtype=np.float32)[ridx])
    off = jnp.asarray((ridx != cidx).astype(np.float32))      # (L,)

    V = v.reshape(B, mb, bm).astype(jnp.float32)
    Vc = jnp.einsum("lk,bki->bli", sel_c, V)                  # (B, L, bm)
    Vr = jnp.einsum("lk,bki->bli", sel_r, V)
    G32 = Gp.astype(jnp.float32)
    # multiply+reduce (NOT dot_general): both reductions consume the
    # same broadcasted read of G32 so the backend may emit one fused
    # pass with two outputs.
    P1 = jnp.sum(G32 * Vc[:, :, None, :], axis=-1)            # rows ridx
    P2 = jnp.sum(G32 * Vr[:, :, :, None], axis=-2) \
        * off[None, :, None]                                  # rows cidx
    U = jnp.einsum("kl,bli->bki", sel_r.T, P1) \
        + jnp.einsum("kl,bli->bki", sel_c.T, P2)              # (B, mb, bm)
    return U.reshape(B, m).astype(dt)
