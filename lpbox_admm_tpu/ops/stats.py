"""Convergence machinery: objective history, relative std stop, masked norms.

TPU-native equivalents of the reference's convergence helpers
(LinerProgramming/.../LPboxADMMsolver.cpp:358-377 ``std_dev``,
:459-469 ``compute_std_obj``, :931-995 dual stopping criteria).

The reference keeps an unbounded ``std::vector`` of objectives and
evaluates the sample standard deviation of the last ``history_size``
entries relative to |last objective|.  Here the history is a fixed-size
ring buffer carried in the solver state (static shapes for ``jit``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

_EPS = 2.2204e-16


def masked_norm(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """L2 norm over the trailing axis, restricted to ``mask``."""
    if mask is not None:
        x = jnp.where(mask, x, 0.0)
    return jnp.sqrt(jnp.sum(x * x, axis=-1))


def ring_push(ring: jnp.ndarray, count: jnp.ndarray, value: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Push ``value`` (B,) into ring buffer ``ring`` (B, H) at slot count % H."""
    H = ring.shape[-1]
    slot = jnp.mod(count, H)
    ring = ring.at[..., slot].set(value)
    return ring, count + 1


def rel_std_obj(ring: jnp.ndarray, count: jnp.ndarray, last: jnp.ndarray
                ) -> jnp.ndarray:
    """Relative sample std of the objective history.

    Matches ``compute_std_obj`` semantics when the ring is full
    (count >= H): std over the last H values with Bessel's correction,
    divided by |last objective|.  When the ring is not yet full the
    reference leaves ``std_obj`` at its initial value 1; callers should
    gate on ``count >= H``.
    """
    H = ring.shape[-1]
    mean = jnp.mean(ring, axis=-1, keepdims=True)
    var = jnp.sum((ring - mean) ** 2, axis=-1) / (H - 1)
    std = jnp.sqrt(var)
    rel = std / jnp.maximum(jnp.abs(last), _EPS)
    return jnp.where(count >= H, rel, 1.0)


def dual_residuals(x: jnp.ndarray, y1: jnp.ndarray, y2: jnp.ndarray,
                   mask: Optional[jnp.ndarray] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``(||x-y1||/||x||, ||x-y2||/||x||)`` with the reference's eps guard."""
    xnorm = jnp.maximum(masked_norm(x, mask), _EPS)
    c1 = masked_norm(x - y1, mask) / xnorm
    c2 = masked_norm(x - y2, mask) / xnorm
    return c1, c2
