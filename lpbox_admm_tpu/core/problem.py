"""Canonical batched problem containers.

The reference solver consumes a per-instance ``MatrixInfo`` of Eigen
sparse matrices (LinerProgramming/.../LPboxADMMsolver.h:42-86).  The TPU
framework makes the *instance batch* the primary axis: problems are
dense, padded, statically-shaped pytrees, so a whole batch is one
``jit``-compiled program vmapped/sharded across chips.

Padding contract:
  * padded constraint rows have ``E`` row = 0, ``f`` = 1, ``row_mask`` = False
  * padded variables have ``b`` = 0, ``E`` column = 0, ``var_mask`` = False;
    the solver treats them as fixed-to-0 from the start.

CA constraint matrices are ~5 nnz/column; at n=500 a dense (B, m, n)
layout on the MXU beats any sparse format on TPU (SURVEY.md section 7,
design delta 5).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax.numpy as jnp


class LpProblem(NamedTuple):
    """Batched binary LP: min b.x  s.t.  E x <= f,  x in {0,1}^n."""

    b: jnp.ndarray         # (B, n) objective (minimization form)
    E: jnp.ndarray         # (B, m, n) inequality constraint matrix
    f: jnp.ndarray         # (B, m) rhs
    row_mask: jnp.ndarray  # (B, m) bool, valid constraint rows
    var_mask: jnp.ndarray  # (B, n) bool, valid variables

    @property
    def batch(self) -> int:
        return self.b.shape[0]

    @property
    def n(self) -> int:
        return self.b.shape[-1]

    @property
    def m(self) -> int:
        return self.f.shape[-1]


class QpProblem(NamedTuple):
    """Batched unconstrained BQP: min x.A x + b.x,  x in {0,1}^n.

    ``A`` is represented implicitly by a matvec-friendly stencil for
    segmentation (see adapters.segmentation) or densely for small n.
    This container carries the dense form; stencil problems use
    ``StencilQp`` in adapters.segmentation.
    """

    A: jnp.ndarray         # (B, n, n) symmetric
    b: jnp.ndarray         # (B, n)
    var_mask: jnp.ndarray  # (B, n)
    const: jnp.ndarray     # (B,) additive constant (Seg's unary offset c)


def pad_to(x: np.ndarray, shape: Sequence[int]) -> np.ndarray:
    """Zero-pad ``x`` up to ``shape`` (trailing padding per axis)."""
    pads = [(0, t - s) for s, t in zip(x.shape, shape)]
    return np.pad(x, pads)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def stack_lp_instances(
    bs: Sequence[np.ndarray],
    Es: Sequence[np.ndarray],
    fs: Optional[Sequence[np.ndarray]] = None,
    n_pad: Optional[int] = None,
    m_pad: Optional[int] = None,
    align: int = 128,
    dtype=np.float32,
) -> LpProblem:
    """Stack heterogeneous dense LP instances into one padded batch.

    Shapes are padded up to the batch maximum, rounded to ``align`` for
    MXU-friendly tiling (pallas_guide: lane dim 128).
    """
    B = len(bs)
    ns = [b.shape[0] for b in bs]
    ms = [E.shape[0] for E in Es]
    n = n_pad or round_up(max(ns), align)
    m = m_pad or round_up(max(ms), align)

    b_arr = np.zeros((B, n), dtype=dtype)
    E_arr = np.zeros((B, m, n), dtype=dtype)
    f_arr = np.ones((B, m), dtype=dtype)
    rmask = np.zeros((B, m), dtype=bool)
    vmask = np.zeros((B, n), dtype=bool)
    for i, (bi, Ei) in enumerate(zip(bs, Es)):
        ni, mi = ns[i], ms[i]
        b_arr[i, :ni] = bi
        E_arr[i, :mi, :ni] = Ei
        if fs is not None:
            f_arr[i, :mi] = fs[i]
        rmask[i, :mi] = True
        vmask[i, :ni] = True
    return LpProblem(
        b=jnp.asarray(b_arr), E=jnp.asarray(E_arr), f=jnp.asarray(f_arr),
        row_mask=jnp.asarray(rmask), var_mask=jnp.asarray(vmask))
