"""Batched sparse matrices in ELL (fixed-nnz gather) layout.

The reference stores constraint/objective matrices in Eigen CSR and
evaluates chained sparse matvecs through matrix-expression lists
(LinerProgramming/.../cython_solver/LPboxADMMsolver.cpp:115-162; the
generic Seg path consumes arbitrary sparse A/C/E the same way,
Segmentation/.../LPboxADMMsolver.cpp:1384-1834).  CSR's variable row
lengths are hostile to XLA (dynamic shapes, serial row loops), so the
TPU-native analogue used here is ELL: every row padded to the batch
max nnz, indices+values as dense (B, rows, K) arrays.

Both the ROW layout (for ``M @ v``) and the COLUMN layout (for
``M^T @ w``) are precomputed at build time, so both hot matvecs are
pure *gathers* -- no scatter appears in any iteration loop (TPU
scatter-adds serialize on duplicate indices; gathers vectorize).
Memory is O(nnz_padded), vs O(m n) for the dense paths, which is what
lifts the general solver past a few thousand variables and the LP
ladder past the dense-E rungs (VERDICT r2 missing items 1-2).

Padding convention: unused slots carry ``idx = 0, val = 0`` -- they
gather a real element but multiply it by zero, so no masking is needed
in the matvecs.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _mxu_route() -> bool:
    """Route matvecs through the MXU one-hot kernels (ops/mxu_sparse)?

    Default: yes on every non-CPU backend (the XLA TPU gather lowering
    serializes at ~40 cycles/element; the one-hot matmul form runs at
    MXU rate -- see ops/mxu_sparse.py).  On CPU the direct gather wins.
    Override with LPBOX_SPARSE=gather|mxu for A/B measurements.
    """
    forced = os.environ.get("LPBOX_SPARSE")
    if forced == "gather":
        return False
    if forced == "mxu":
        return True
    return jax.default_backend() != "cpu"


def _mxu_exact() -> bool:
    """Run the MXU route in exact (f32/HIGHEST) payload mode instead of
    the 3-limb bf16 fast mode.  Read at trace time; set LPBOX_MXU_EXACT=1
    before the first dispatch of a given shape (mega-scale A/B:
    struct_mega r4b failed at the cap with the fast payloads where the
    f32 v1 run converged)."""
    return os.environ.get("LPBOX_MXU_EXACT", "0") == "1"


class SparseEll(NamedTuple):
    """Batched (B, m, n) sparse matrix, ELL row + column layouts."""

    row_idx: jnp.ndarray   # (B, m, Kr) int32: column index of each nnz
    row_val: jnp.ndarray   # (B, m, Kr)
    col_idx: jnp.ndarray   # (B, n, Kc) int32: row index of each nnz
    col_val: jnp.ndarray   # (B, n, Kc)

    @property
    def batch(self) -> int:
        return self.row_idx.shape[0]

    @property
    def m(self) -> int:
        return self.row_idx.shape[1]

    @property
    def n(self) -> int:
        return self.col_idx.shape[1]

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.batch, self.m, self.n)


def is_sparse(M) -> bool:
    """SparseEll, or any structured type carrying the
    ``is_sparse_matrix`` marker + mv/mtv(+many)/colsq methods
    (ops/ca_sparse.CaStructE)."""
    return isinstance(M, SparseEll) \
        or getattr(M, "is_sparse_matrix", False)


def _gather_rows(v: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """v (B, n) gathered at idx (B, r, K) -> (B, r, K)."""
    return jax.vmap(lambda vb, ib: vb[ib])(v, idx)


def mv(S: SparseEll, v: jnp.ndarray) -> jnp.ndarray:
    """M @ v: (B, n) -> (B, m).

    CPU: one gather + one reduction.  TPU: MXU one-hot scatter
    (ops/mxu_sparse.mv) -- the direct gather serializes there."""
    if not isinstance(S, SparseEll):
        return S.mv(v)
    if S.m == 0 or S.n == 0:     # zero-row/col block (absent constraints)
        return jnp.zeros((v.shape[0], S.m), jnp.float32)
    if _mxu_route():
        from . import mxu_sparse
        return mxu_sparse.mv(S, v, exact=_mxu_exact())
    g = _gather_rows(v.astype(jnp.float32), S.row_idx)
    return jnp.sum(S.row_val * g, axis=-1)


def mtv(S: SparseEll, w: jnp.ndarray) -> jnp.ndarray:
    """M^T @ w: (B, m) -> (B, n).

    CPU: gather via the column layout.  TPU: MXU one-hot gather
    (ops/mxu_sparse.mtv)."""
    if not isinstance(S, SparseEll):
        return S.mtv(w)
    if S.m == 0 or S.n == 0:
        return jnp.zeros((w.shape[0], S.n), jnp.float32)
    if _mxu_route():
        from . import mxu_sparse
        return mxu_sparse.mtv(S, w, exact=_mxu_exact())
    g = _gather_rows(w.astype(jnp.float32), S.col_idx)
    return jnp.sum(S.col_val * g, axis=-1)


def mv_many(S: SparseEll, Vk: jnp.ndarray) -> jnp.ndarray:
    """Stacked ``M @ v``: (B, k, n) -> (B, k, m).  On the MXU route the
    k vectors share one one-hot materialization per chunk."""
    if not isinstance(S, SparseEll):
        return S.mv_many(Vk)
    if S.m == 0 or S.n == 0:
        return jnp.zeros(Vk.shape[:2] + (S.m,), jnp.float32)
    if _mxu_route():
        from . import mxu_sparse
        return mxu_sparse.mv_many(S, Vk, exact=_mxu_exact())
    return jnp.stack([mv(S, Vk[:, k]) for k in range(Vk.shape[1])],
                     axis=1)


def mtv_many(S: SparseEll, Wk: jnp.ndarray) -> jnp.ndarray:
    """Stacked ``M^T @ w``: (B, k, m) -> (B, k, n)."""
    if not isinstance(S, SparseEll):
        return S.mtv_many(Wk)
    if S.m == 0 or S.n == 0:
        return jnp.zeros(Wk.shape[:2] + (S.n,), jnp.float32)
    if _mxu_route():
        from . import mxu_sparse
        return mxu_sparse.mtv_many(S, Wk, exact=_mxu_exact())
    return jnp.stack([mtv(S, Wk[:, k]) for k in range(Wk.shape[1])],
                     axis=1)


def colsq(S: SparseEll) -> jnp.ndarray:
    """Per-column squared norms diag(M^T M) -> (B, n)."""
    if not isinstance(S, SparseEll):
        return S.colsq()
    return jnp.sum(S.col_val * S.col_val, axis=-1)


def rowsq(S: SparseEll) -> jnp.ndarray:
    """Per-row squared norms diag(M M^T) -> (B, m)."""
    return jnp.sum(S.row_val * S.row_val, axis=-1)


def diag(S: SparseEll) -> jnp.ndarray:
    """Main diagonal of a square sparse matrix -> (B, n)."""
    r = jnp.arange(S.m)[None, :, None]
    return jnp.sum(jnp.where(S.row_idx == r, S.row_val, 0.0), axis=-1)


def gram(S: SparseEll, free: Optional[jnp.ndarray] = None
         ) -> jnp.ndarray:
    """Dense Gram matrix ``M_f M_f^T`` (B, m, m), columns masked by
    ``free`` (B, n).

    m x m is small whenever sparse storage is worth it (constraint
    rows << variables), so the output is dense; built by scatter-adding
    each column's Kc x Kc outer product -- an O(nnz * Kc) one-time cost
    at factorization, never in the iteration loop.  This is what lets
    the LP Woodbury path consume a sparse E (ops/woodbury.factorize_gram).
    """
    if not isinstance(S, SparseEll):
        raise ValueError(
            "on-device Gram assembly is not provided for structured "
            "sparse types; pass a host-side gram/ginv to init_state "
            "(scripts/bench_sparse_rung.py::host_gram_ginv)")
    cv = S.col_val
    if free is not None:
        cv = cv * free.astype(cv.dtype)[:, :, None]
    m = S.m

    def one(ci, cvb):                       # (n, Kc) each
        i1 = jnp.broadcast_to(ci[:, :, None], ci.shape + ci.shape[-1:])
        i2 = jnp.broadcast_to(ci[:, None, :], i1.shape)
        vv = cvb[:, :, None] * cvb[:, None, :]
        G = jnp.zeros((m, m), jnp.float32)
        return G.at[i1.reshape(-1), i2.reshape(-1)].add(vv.reshape(-1))

    return jax.vmap(one)(S.col_idx, cv)


def to_dense(S: SparseEll) -> jnp.ndarray:
    """Materialize (B, m, n) -- tests/small problems only."""
    m, n = S.m, S.n

    def one(ri, rv):
        D = jnp.zeros((m, n), jnp.float32)
        rows = jnp.broadcast_to(jnp.arange(m)[:, None], ri.shape)
        return D.at[rows.reshape(-1), ri.reshape(-1)].add(rv.reshape(-1))

    return jax.vmap(one)(S.row_idx, S.row_val)


# --------------------------------------------------------------------------
# Host-side constructors (numpy; problems are assembled on host)
# --------------------------------------------------------------------------

def _ell_pack(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
              nrows: int, K: Optional[int] = None
              ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Pack COO (by ``rows``) into ELL (nrows, K) idx/val arrays."""
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    counts = np.bincount(rows, minlength=nrows)
    k = int(counts.max()) if counts.size and counts.max() > 0 else 1
    K = max(K or 0, k, 1)
    idx = np.zeros((nrows, K), np.int32)
    val = np.zeros((nrows, K), np.float32)
    # position of each nnz within its row
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(rows)) - starts[rows]
    idx[rows, pos] = cols
    val[rows, pos] = vals
    return idx, val, K


def from_coo(coos: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
             shape: Tuple[int, int]) -> SparseEll:
    """Build a batched SparseEll from per-instance COO triplets
    ``(rows, cols, vals)`` sharing one (m, n) shape.  K is the max nnz
    per row/column across the whole batch (shared static shape)."""
    m, n = shape
    packed = []
    Kr = Kc = 1
    for rows, cols, vals in coos:
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        vals = np.asarray(vals, np.float32)
        Kr = max(Kr, int(np.bincount(rows, minlength=m).max())
                 if rows.size else 1)
        Kc = max(Kc, int(np.bincount(cols, minlength=n).max())
                 if cols.size else 1)
        packed.append((rows, cols, vals))
    ri = np.zeros((len(coos), m, Kr), np.int32)
    rv = np.zeros((len(coos), m, Kr), np.float32)
    ci = np.zeros((len(coos), n, Kc), np.int32)
    cv = np.zeros((len(coos), n, Kc), np.float32)
    for b, (rows, cols, vals) in enumerate(packed):
        ri[b], rv[b], _ = _ell_pack(rows, cols, vals, m, Kr)
        ci[b], cv[b], _ = _ell_pack(cols, rows, vals, n, Kc)
    return SparseEll(row_idx=jnp.asarray(ri), row_val=jnp.asarray(rv),
                     col_idx=jnp.asarray(ci), col_val=jnp.asarray(cv))


def from_dense(M: np.ndarray, tol: float = 0.0) -> SparseEll:
    """Convert a dense (B, m, n) batch (tests / interop)."""
    M = np.asarray(M)
    coos = []
    for b in range(M.shape[0]):
        rows, cols = np.nonzero(np.abs(M[b]) > tol)
        coos.append((rows, cols, M[b][rows, cols]))
    return from_coo(coos, M.shape[-2:])


def empty(batch: int, m: int, n: int) -> SparseEll:
    """Zero-row / zero-matrix block (absent constraints)."""
    return SparseEll(
        row_idx=jnp.zeros((batch, m, 1), jnp.int32),
        row_val=jnp.zeros((batch, m, 1), jnp.float32),
        col_idx=jnp.zeros((batch, n, 1), jnp.int32),
        col_val=jnp.zeros((batch, n, 1), jnp.float32))
