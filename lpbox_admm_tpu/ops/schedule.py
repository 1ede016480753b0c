"""Penalty (rho) and over-relaxation (gamma) schedules.

The reference mutates ``rho``/``gamma`` in place every ``rho_change_step``
iterations (LinerProgramming/.../LPboxADMMsolver.cpp:951-970): at the end
of iteration ``i`` with ``(i+1) % step == 0`` it multiplies rho by
``learning_fact`` and decays gamma toward 1.  Both are therefore pure
functions of the global iteration index -- on TPU we compute them
closed-form instead of carrying mutable scalars through the loop, which
keeps the ``lax.scan`` carry minimal.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SolverConfig


def n_bumps(it: jnp.ndarray, step: int) -> jnp.ndarray:
    """Number of rho updates applied before executing iteration ``it``."""
    return it // step


def rho_at(it: jnp.ndarray, cfg: SolverConfig) -> jnp.ndarray:
    """rho(iteration) = initial_rho * learning_fact^{floor(it/step)}."""
    k = n_bumps(it, cfg.rho_change_step).astype(jnp.float32)
    rho = cfg.initial_rho * jnp.power(jnp.float32(cfg.learning_fact), k)
    if cfg.rho_upper_limit is not None:
        rho = jnp.minimum(rho, cfg.rho_upper_limit)
    return rho


def gamma_at(it: jnp.ndarray, cfg: SolverConfig) -> jnp.ndarray:
    """gamma(iteration) = max(gamma0 * gamma_factor^{floor(it/step)}, 1)."""
    k = n_bumps(it, cfg.rho_change_step).astype(jnp.float32)
    g = cfg.gamma0 * jnp.power(jnp.float32(cfg.gamma_factor), k)
    return jnp.maximum(g, 1.0)
