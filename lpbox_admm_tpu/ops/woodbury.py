"""Exact x-update via Woodbury identity + batched Cholesky (MXU fast path).

The LP x-update solves ``(c I + rho4 E_f^T E_f) x = rhs`` on the free
coordinates, where ``c = rho1 + rho2`` and ``E_f`` is the column-masked
constraint matrix.  The reference uses loose PCG for this
(LPboxADMMsolver.cpp:891-895, tol 1e-3).  On TPU, with m << n and dense
batched matmuls on the MXU, the Woodbury identity gives an *exact* solve:

    (c I + rho4 E^T E)^{-1} rhs
        = (1/c) * (rhs - E^T G^{-1} E rhs),   G = (c/rho4) I_m + E E^T

Under the reference's LP schedule rho1 = rho2 = rho4 share the same
multiplicative updates, so ``c/rho4 = 2`` is constant across the whole
solve: ``G`` depends only on the free-column mask and needs refactoring
only at early-fix events, not on rho changes.

``G^{-1}`` is materialised explicitly (Cholesky once per fix event, in
f32-HIGHEST), so each ADMM iteration's x-update is three batched MXU
matmuls -- no sequential triangular solves in the hot loop.  G is
strongly diagonally dominant here (diag >= 2 + row weight), so the
explicit inverse is numerically benign.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST


class WoodburyFactor(NamedTuple):
    ginv: jnp.ndarray   # (B, m, m) explicit inverse of G
    ratio: float        # c / rho4 used to build G (static under LP schedule)
    # NOTE: E @ x_exact needs no extra matrix: with u = G^{-1} E rhs,
    # E_f E_f^T u = (G - ratio I) u = E rhs - ratio u (core/lp.step).


def factorize(E, free: jnp.ndarray, ratio: float) -> WoodburyFactor:
    """Invert ``G = ratio * I + E_f E_f^T`` for the current free mask.

    Args:
      E: (B, m, n) dense constraint matrix (padded rows are zero), or a
        ``ops.sparse.SparseEll`` (the Gram matrix is then built by
        per-column outer-product scatter -- an O(nnz * K) one-time
        cost, so the exact Woodbury x-update works at sparse-ladder
        scale where dense E would not fit HBM).
      free: (B, n) bool mask of free (not fixed) columns.
      ratio: ``(rho1 + rho2) / rho4`` (constant = 2 for the LP preset).
    """
    from . import sparse as sparse_ops

    if sparse_ops.is_sparse(E):
        G = sparse_ops.gram(E, free)
    else:
        Ef = E * free[:, None, :].astype(E.dtype)
        # bf16-stored E (asserted bf16-exact, core/lp._E32): native MXU
        # bf16 x bf16 -> f32 accumulation is exact for 0/1 entries;
        # HIGHEST there could make XLA materialize an f32 upcast of E
        # (8 GB at the (1000, 1e5) rung), which bf16 storage exists to
        # avoid.
        prec = None if E.dtype == jnp.bfloat16 else HI
        G = jnp.einsum("bmn,bkn->bmk", Ef, Ef,
                       preferred_element_type=jnp.float32, precision=prec)
    return factorize_from_gram(G, ratio)


def factorize_from_gram(G: jnp.ndarray, ratio: float) -> WoodburyFactor:
    """WoodburyFactor from a precomputed UNSHIFTED Gram ``E_f E_f^T``.

    At the very-large rungs the on-device Gram einsum is O(m^2 n)
    (~4e16 MACs at the (1000, 1e5) rung); host-side scipy sparse
    ``C @ C.T`` is O(nnz * K) and finishes in under a second, so
    drivers assemble G on the host and ship the (B, m, m) result
    (core/lp.init_state(gram=...))."""
    m = G.shape[-1]
    G = G.astype(jnp.float32) + ratio * jnp.eye(m, dtype=jnp.float32)
    chol = jnp.linalg.cholesky(G)
    eye = jnp.broadcast_to(jnp.eye(m, dtype=jnp.float32), G.shape)
    ginv = jax.scipy.linalg.cho_solve((chol, True), eye)
    return WoodburyFactor(ginv=ginv, ratio=ratio)


class NsideFactor(NamedTuple):
    """Direct n-side inverse of the x-update system (see factorize_nside)."""
    hinv: jnp.ndarray   # (B, n, n) (ratio I + E_f^T E_f)^{-1}
    ete: jnp.ndarray    # (B, n, n) E_f^T E_f (for the warm-start residual)
    ratio: float


def factorize_nside(E: jnp.ndarray, free: jnp.ndarray,
                    ratio: float) -> NsideFactor:
    """Direct inverse of ``(c I + rho4 E_f^T E_f)`` on the n side.

    After l2f compaction the residual problem has n <= m, so the
    Woodbury detour through the (m, m) Gram matrix is the WRONG side:
    ``(c I + rho4 EtE)^{-1} = (1/rho4) (ratio I + EtE)^{-1}`` with
    ``ratio = c/rho4`` constant under the shared LP rho schedule, so a
    single (n, n) inverse serves the whole solve.  The x-update becomes
    ONE (n, n) pass instead of fwd + (m, m) pass + transpose-pass.
    Fixed (zeroed) columns decouple: their EtE rows/cols are zero, the
    diagonal is ``ratio``, and the solver masks x by ``free`` anyway.
    """
    Ef = E * free[:, None, :].astype(E.dtype)
    EtE = jnp.einsum("bmn,bmk->bnk", Ef, Ef,
                     preferred_element_type=jnp.float32, precision=HI)
    n = EtE.shape[-1]
    H = EtE + ratio * jnp.eye(n, dtype=EtE.dtype)
    chol = jnp.linalg.cholesky(H)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=H.dtype), H.shape)
    hinv = jax.scipy.linalg.cho_solve((chol, True), eye)
    return NsideFactor(hinv=hinv, ete=EtE, ratio=ratio)


def solve(factor: WoodburyFactor, E: jnp.ndarray, free: jnp.ndarray,
          rhs: jnp.ndarray, c: jnp.ndarray,
          precision=HI) -> jnp.ndarray:
    """Apply ``(c I + rho4 E_f^T E_f)^{-1}`` to ``rhs`` (masked to free).

    ``c`` may be a scalar or (B,) array; ``rho4`` enters via
    ``factor.ratio = c / rho4``.  Three batched matmuls, all MXU.
    """
    free_f = free.astype(rhs.dtype)
    rhs = rhs * free_f
    Erhs = jnp.einsum("bmn,bn->bm", E, rhs,
                      preferred_element_type=jnp.float32,
                      precision=precision)
    u = jnp.einsum("bmk,bk->bm", factor.ginv, Erhs,
                   preferred_element_type=jnp.float32, precision=precision)
    corr = jnp.einsum("bmn,bm->bn", E, u,
                      preferred_element_type=jnp.float32,
                      precision=precision)
    c = jnp.asarray(c)
    c_col = c[..., None] if c.ndim == 1 else c
    return free_f * (rhs - corr) / c_col
