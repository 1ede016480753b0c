"""Batched diagonally-preconditioned conjugate gradient.

TPU-native equivalent of the reference's ``_conjugate_gradient``
(LinerProgramming/.../cython_solver/LPboxADMMsolver.cpp:26-96 and the
matrix-expression variants :169-335).  Differences by design:

* natively **batched** over a leading instance axis (B, n) -- one CG
  runs for the whole vmapped/sharded instance batch, with per-instance
  convergence masks instead of separate solves;
* the matvec is a closure (typically a fused
  ``free * ((rho1+rho2) p + rho4 E^T (E (free*p)))`` expression --
  the reference's ``calculate_mat_expr_multiplication`` trick,
  :115-162 -- or a stencil convolution for segmentation), evaluated as
  dense batched matmuls on the MXU;
* the reference's ``alpha < 0`` loss-of-positive-definiteness abort
  (:307) is reported per instance through the returned ``failed`` mask.

Semantics matched to the reference: relative tolerance against
``tol^2 * ||rhs||^2``, Jacobi preconditioning, initial iterate supplied
by the caller (the reference warm-starts at y1).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

_TINY = jnp.finfo(jnp.float32).tiny


class CGResult(NamedTuple):
    x: jnp.ndarray          # (B, n) solution
    iters: jnp.ndarray      # (B,) iterations this row actually ran
    rel_residual: jnp.ndarray  # (B,) final ||r|| / ||rhs||
    failed: jnp.ndarray     # (B,) bool: p^T A p <= 0 encountered


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def pcg(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    rhs: jnp.ndarray,
    x0: jnp.ndarray,
    precond_diag: jnp.ndarray,
    tol: float,
    maxiters: int,
    active: Optional[jnp.ndarray] = None,
) -> CGResult:
    """Solve ``M x = rhs`` per batch row with Jacobi-preconditioned CG.

    Args:
      matvec: batched linear operator ``(B, n) -> (B, n)``; must be SPD
        on the active subspace and return zeros on masked-out coordinates.
      rhs: (B, n) right-hand sides (already masked to active coords).
      x0: (B, n) initial iterate.
      precond_diag: (B, n) diagonal of the preconditioner; entries for
        inactive coordinates must be positive (e.g. 1) to avoid division
        by zero -- they never influence the active solution.
      tol: relative tolerance (reference ``pcg_tol``).
      maxiters: iteration cap (reference ``pcg_maxiters``).
      active: optional (B,) bool; rows with ``active=False`` are returned
        unchanged (their CG is frozen from the start).
    """
    B = rhs.shape[0]
    inv_diag = 1.0 / precond_diag

    rhs_norm2 = _dot(rhs, rhs)
    zero_rhs = rhs_norm2 == 0.0
    threshold = jnp.maximum(tol * tol * rhs_norm2, _TINY)

    x = jnp.where(zero_rhs[:, None], 0.0, x0)
    r = rhs - matvec(x)
    r = jnp.where(zero_rhs[:, None], 0.0, r)
    r_norm2 = _dot(r, r)

    run = r_norm2 >= threshold
    if active is not None:
        run = run & active
        x = jnp.where((~active)[:, None], x0, x)
    run = run & ~zero_rhs

    p = inv_diag * r
    abs_new = _dot(r, p)

    def cond(carry):
        x, r, p, abs_new, r_norm2, run, failed, i, row_iters = carry
        return jnp.logical_and(i < maxiters, jnp.any(run))

    def body(carry):
        x, r, p, abs_new, r_norm2, run, failed, i, row_iters = carry
        row_iters = row_iters + run.astype(jnp.int32)
        tmp = matvec(p)
        ptmp = _dot(p, tmp)
        bad = run & (ptmp <= 0.0)
        safe_ptmp = jnp.where(ptmp == 0.0, 1.0, ptmp)
        alpha = abs_new / safe_ptmp
        step = jnp.where(run & ~bad, alpha, 0.0)
        x = x + step[:, None] * p
        r = r - step[:, None] * tmp
        new_r_norm2 = _dot(r, r)
        r_norm2 = jnp.where(run, new_r_norm2, r_norm2)
        done_now = r_norm2 < threshold
        z = inv_diag * r
        abs_old = abs_new
        new_abs = _dot(r, z)
        beta = new_abs / jnp.where(abs_old == 0.0, 1.0, abs_old)
        still = run & ~done_now & ~bad
        p = jnp.where(still[:, None], z + beta[:, None] * p, p)
        abs_new = jnp.where(still, new_abs, abs_new)
        failed = failed | bad
        run = still
        return (x, r, p, abs_new, r_norm2, run, failed, i + 1, row_iters)

    failed0 = jnp.zeros((B,), dtype=bool)
    carry = (x, r, p, abs_new, r_norm2, run, failed0, jnp.int32(0),
             jnp.zeros((B,), jnp.int32))
    (x, r, p, abs_new, r_norm2, run, failed, _, row_iters
     ) = jax.lax.while_loop(cond, body, carry)

    rel = jnp.sqrt(r_norm2 / jnp.maximum(rhs_norm2, _TINY))
    return CGResult(x=x, iters=row_iters, rel_residual=rel, failed=failed)
