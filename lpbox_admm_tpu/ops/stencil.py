"""Grid-stencil operator for segmentation QPs.

The reference stores the pixel-pair affinity matrix W sparsely and does
sparse matvecs in Eigen (Segmentation/.../image_segmentation_utils.cpp
``get_binary_cost``/``get_A_b_from_cost``).  On TPU a pixel grid's
A' = D - W (D = diag(W 1)) is a *stencil*: the matvec is a sum of 8
shifted elementwise multiplies -- pure VPU/HBM work, no sparse format,
batched over images (SURVEY.md section 7, design delta 5).

Edge weights are stored as (B, 8, H, W) planes: ``w[:, d, i, j]`` is the
weight between pixel (i, j) and its neighbour in direction
``OFFSETS[d]``.  Out-of-bounds / masked-out neighbours carry weight 0.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

#: 8-neighbourhood offsets (row, col)
OFFSETS: Tuple[Tuple[int, int], ...] = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 1),
    (1, -1), (1, 0), (1, 1),
)


def shift(x: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """Shift (B, H, W) so that result[i, j] = x[i + dr, j + dc], zero
    outside."""
    out = jnp.roll(x, shift=(-dr, -dc), axis=(-2, -1))
    H, W = x.shape[-2], x.shape[-1]
    if dr == 1:
        out = out.at[..., H - 1, :].set(0.0)
    elif dr == -1:
        out = out.at[..., 0, :].set(0.0)
    if dc == 1:
        out = out.at[..., :, W - 1].set(0.0)
    elif dc == -1:
        out = out.at[..., :, 0].set(0.0)
    return out


class Stencil(NamedTuple):
    """A' = diag(degree) - W as neighbour weight planes."""

    weights: jnp.ndarray   # (B, 8, H, W)
    degree: jnp.ndarray    # (B, H, W) = sum of incident weights

    @property
    def grid(self) -> Tuple[int, int]:
        return self.weights.shape[-2], self.weights.shape[-1]

    def w_matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """(W x) for x of shape (B, H, W)."""
        out = jnp.zeros_like(x)
        for d, (dr, dc) in enumerate(OFFSETS):
            out = out + self.weights[:, d] * shift(x, dr, dc)
        return out

    def a_matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """(A' x) = degree * x - W x."""
        return self.degree * x - self.w_matvec(x)

    def a_diag(self) -> jnp.ndarray:
        """diag(A') = degree (W has empty diagonal)."""
        return self.degree


def build_stencil(weights: jnp.ndarray) -> Stencil:
    """Build the operator from weight planes, computing degrees."""
    degree = jnp.sum(weights, axis=1)
    return Stencil(weights=weights, degree=degree)


def quad_form(st: Stencil, x: jnp.ndarray) -> jnp.ndarray:
    """x^T A' x per batch element, x of shape (B, H, W)."""
    ax = st.a_matvec(x)
    return jnp.sum(x * ax, axis=(-2, -1))
