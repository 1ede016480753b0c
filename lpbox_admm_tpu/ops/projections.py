"""Projection operators of the Lp-Box ADMM splitting.

TPU-native (pure jnp, batched, mask-aware) equivalents of the reference's
projection routines (LinerProgramming/.../LPboxADMMsolver.cpp:379-428):

* ``project_box``             -- clamp to the unit box [0,1]^n
* ``project_shifted_lp_ball`` -- projection onto the shifted Lp sphere
  {x : ||x - 0.5||_p^p = n / 2^p}; for p=2 this is
  y = (x - 0.5) * n^(1/p) / (2 ||x - 0.5||) + 0.5
* ``project_nonneg``          -- y = max(0, x)  (project_vec_less_than(...,0,0))

All functions accept an optional boolean ``mask`` selecting the *active*
(free, not early-fixed) coordinates: masked-out entries do not contribute
to norms/counts and are passed through unchanged.  This is what replaces
the reference's physical problem shrinking with static-shape math.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

_EPS = 2.2204e-16  # matches the reference's use of DBL_EPSILON guards


def project_box(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp to [0, 1] elementwise (reference ``project_box``)."""
    return jnp.clip(x, 0.0, 1.0)


def project_shifted_lp_ball(
    x: jnp.ndarray,
    p: int = 2,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Project onto the shifted Lp sphere of the n-cube.

    ``y = (x - 0.5) * n^(1/p) / (2 * ||x - 0.5||_2) + 0.5`` where ``n`` is
    the number of active coordinates (reference
    ``project_shifted_Lp_ball``, LPboxADMMsolver.cpp:423-428 -- note the
    reference always uses the 2-norm of the shift regardless of p, and
    only p enters through ``n^(1/p)``; we reproduce that behaviour).

    Norms and counts are taken over the trailing axis.  With ``mask``,
    masked-out entries contribute nothing and are returned unchanged.
    """
    shift = x - 0.5
    if mask is not None:
        shift = jnp.where(mask, shift, 0.0)
        n_active = jnp.sum(mask, axis=-1, keepdims=True).astype(x.dtype)
    else:
        n_active = jnp.asarray(x.shape[-1], dtype=x.dtype)
    norm = jnp.sqrt(jnp.sum(shift * shift, axis=-1, keepdims=True))
    norm = jnp.maximum(norm, _EPS)
    y = shift * (n_active ** (1.0 / p)) / (2.0 * norm) + 0.5
    if mask is not None:
        y = jnp.where(mask, y, x)
    return y


def project_nonneg(x: jnp.ndarray) -> jnp.ndarray:
    """``max(0, x)`` (reference ``project_vec_less_than(x, x, 0, 0)``)."""
    return jnp.maximum(x, 0.0)
