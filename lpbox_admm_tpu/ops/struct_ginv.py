"""Schur-structured Woodbury inverse for the struct CA layout.

At the reference's very-large CA rungs
(cython_solver/LPboxADMMsolver.cpp:2461-2486) the Woodbury Gram
``G = ratio I + C C^T`` is (m, m) with m ~ 2e4, dominated by DUMMY
rows; the dense explicit inverse is 1.6 GB/instance (the main HBM
stream of every iteration) and its host LAPACK build took 171 s per
instance (r4b logs).  In the struct layout (ops/ca_sparse: m-axis =
[item rows | dummy rows]) the dummy rows have DISJOINT column
supports, so the dummy-dummy Gram block is ``C2 C2^T = diag`` and G is

    G = [[ A,   Bm  ],        A  (m1, m1) dense, m1 ~ n_items
         [ Bm^T, D  ]]        D  (m2,) DIAGONAL, Bm (m1, m2)

Block elimination with the (m1, m1) Schur complement
``S = A - Bm D^{-1} Bm^T`` applies G^{-1} exactly:

    z2' = D^{-1} r2
    z1  = S^{-1} (r1 - Bm z2')
    z2  = D^{-1} (r2 - Bm^T z1)

Per-apply device cost: two passes over Bm (m1 * m2, ~77 MB f32 at the
(1000, 1e5) rung -- 20x less than the dense (m, m) read) + one (m1, m1)
matvec; host build cost: one (m1, m1) Cholesky instead of (m, m) --
seconds instead of minutes.  Everything is exact f32 algebra; no
approximation anywhere.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

HI = jax.lax.Precision.HIGHEST


class StructGinv(NamedTuple):
    """Structured explicit inverse of ``ratio I + C C^T`` in the
    struct row layout.  Drop-in for the dense (B, m, m) ``ginv`` of
    ``core/lp`` (dispatched via ``is_struct_ginv``)."""

    sinv: jnp.ndarray   # (B, m1p, m1p) f32 Schur complement inverse
    b12: jnp.ndarray    # (B, m1p, m2p) f32 item-dummy coupling block
    dinv: jnp.ndarray   # (B, m2p) f32 inverse diagonal dummy block

    is_struct_ginv = True

    @property
    def m(self) -> int:
        return self.sinv.shape[1] + self.dinv.shape[1]

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        """G^{-1} r: (B, m) -> (B, m) by block elimination."""
        m1 = self.sinv.shape[1]
        r1, r2 = r[:, :m1], r[:, m1:]
        z2p = self.dinv * r2
        t = r1 - jnp.einsum("bij,bj->bi", self.b12, z2p,
                            preferred_element_type=jnp.float32,
                            precision=HI)
        z1 = jnp.einsum("bij,bj->bi", self.sinv, t,
                        preferred_element_type=jnp.float32, precision=HI)
        z2 = self.dinv * (r2 - jnp.einsum("bij,bi->bj", self.b12, z1,
                                          preferred_element_type=jnp.float32,
                                          precision=HI))
        return jnp.concatenate([z1, z2], axis=-1)


def build_struct_ginv(
    coos: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    shapes: Sequence[Tuple[int, int]],
    row_maps: Sequence[np.ndarray],
    m1p: int, m2p: int, n: int, ratio: float,
    free: Optional[np.ndarray] = None,
) -> StructGinv:
    """Host-side build from per-instance COO triplets in the SAME
    struct layout as ``ca_sparse.build`` (``row_maps`` comes from it:
    original row -> struct row, items then dummies).

    ``free``: optional (B, n) bool mask -- the Gram uses only free
    columns (the early-fixing refactorization; core/lp.apply_fix takes
    the result via its ``ginv=`` argument).

    Asserts the dummy block really is diagonal (disjoint supports) --
    the struct detector guarantees it, this guards layout drift.
    """
    import scipy.sparse as sp
    from scipy.linalg import cho_factor, cho_solve

    B = len(coos)
    sinv = np.zeros((B, m1p, m1p), np.float32)
    b12 = np.zeros((B, m1p, m2p), np.float32)
    dinv = np.zeros((B, m2p), np.float32)
    for b, ((r, c, v), rm) in enumerate(zip(coos, row_maps)):
        sr = rm[np.asarray(r)]
        v = np.asarray(v, np.float64)
        if free is not None:
            v = v * np.asarray(free[b], np.float64)[np.asarray(c)]
        C = sp.csr_matrix((v, (sr, np.asarray(c))),
                          shape=(m1p + m2p, n))
        C1, C2 = C[:m1p], C[m1p:]
        G22 = (C2 @ C2.T).tocoo()
        off = G22.row != G22.col
        assert not np.any(np.abs(G22.data[off]) > 0), \
            "dummy rows are not support-disjoint; struct layout drifted"
        d = np.full(m2p, ratio, np.float64)
        d[G22.row[~off]] += G22.data[~off]
        Bm = (C1 @ C2.T).toarray()
        A = (C1 @ C1.T).toarray() + ratio * np.eye(m1p)
        S = A - (Bm / d[None, :]) @ Bm.T
        sinv[b] = cho_solve(cho_factor(S, lower=True),
                            np.eye(m1p)).astype(np.float32)
        b12[b] = Bm.astype(np.float32)
        dinv[b] = (1.0 / d).astype(np.float32)
    return StructGinv(sinv=jnp.asarray(sinv), b12=jnp.asarray(b12),
                      dinv=jnp.asarray(dinv))
