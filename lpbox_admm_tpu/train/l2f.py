"""Learned-early-fixing inference loop (the framework's core capability).

The reference alternates on the host between C++ solver windows and a
GPU policy (trainer.py:483-597 ``_valid_2``): each round trips
solver -> numpy copy -> GPU -> numpy fix vector -> solver.  Here the
whole alternation is ONE jitted ``lax.while_loop``: the body runs a
``ws``-iteration solver window via ``lax.scan`` (trajectory stays in
device memory), applies the jitted policy to the (B*n, node, chunk)
trajectory windows, thresholds into a fix vector
(``deter_fix_2``, trainer.py:101-135), and updates the free masks --
zero host round trips (SURVEY.md section 7, design delta 4).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import PolicyConfig, SolverConfig
from ..core import lp
from ..core.problem import LpProblem


def policy_scores(model, variables, traj: jnp.ndarray, node_size: int,
                  row_chunk: int = 8192) -> jnp.ndarray:
    """Apply the policy to per-variable trajectory windows.

    ``traj`` is (R, ws); rows are reshaped to (R, node_size, ws/node_size)
    (trainer.py:527-529) and scored in ``row_chunk`` chunks to bound
    activation memory, mirroring ``_get_fix_vec``'s 10k batching
    (trainer.py:216-252).  Returns sigmoid scores (R,).
    """
    R, ws = traj.shape
    chunk = ws // node_size
    x = traj.reshape(R, node_size, chunk)
    if R <= row_chunk:
        _, sig = model.apply(variables, x, train=False)
        return sig[:, 0]
    # pad to a multiple of row_chunk and scan over chunks
    pad = (-R) % row_chunk
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    xp = xp.reshape(-1, row_chunk, node_size, chunk)

    def score(xc):
        _, sig = model.apply(variables, xc, train=False)
        return sig[:, 0]

    sig = jax.lax.map(score, xp).reshape(-1)
    return sig[:R]


def scores_to_vec(sig: jnp.ndarray, confidence: float) -> jnp.ndarray:
    """``deter_fix_2``: sigma > C -> fix 1; sigma < 1-C -> fix 0; else -1
    (trainer.py:101-135)."""
    return jnp.where(sig > confidence, 1.0,
                     jnp.where(sig < 1.0 - confidence, 0.0, -1.0))


@functools.partial(jax.jit, static_argnames=("model", "cfg", "pcfg", "ws",
                                             "max_iter", "row_chunk"))
def l2f_solve(prob: LpProblem, model, variables, cfg: SolverConfig,
              pcfg: PolicyConfig, ws: int = 100,
              max_iter: Optional[int] = None,
              row_chunk: int = 8192) -> lp.LpState:
    """Windowed solve with the policy fixing variables between windows.

    Equivalent of the reference's ``_valid_2`` alternation loop
    (trainer.py:516-535) with mask-based fixing.  ``ws`` must be
    divisible by ``pcfg.node_size``.
    """
    if max_iter is None:
        max_iter = cfg.max_iters
    assert ws % pcfg.node_size == 0, (ws, pcfg.node_size)
    state = lp.init_state(prob, cfg)
    B, n = prob.batch, prob.n

    def cond(s):
        return jnp.logical_and(s.it < max_iter, ~jnp.all(s.done))

    def body(s):
        s, traj = lp.solve_window(s, prob, cfg, ws, record=True)
        rows = traj.reshape(B * n, ws)
        sig = policy_scores(model, variables, rows, pcfg.node_size,
                            row_chunk)
        vec = scores_to_vec(sig, pcfg.fix_confidence).reshape(B, n)
        # never fix padding: apply_fix already restricts to free vars
        s = lp.apply_fix(s, prob, vec, cfg)
        return s

    return jax.lax.while_loop(cond, body, state)


def l2f_metrics(state: lp.LpState, prob: LpProblem,
                oracle_obj: jnp.ndarray,
                labels: Optional[jnp.ndarray] = None) -> dict:
    """Evaluation metrics of the accelerated solve against the plain
    oracle: objective gap, infeasible rows, fix counts and fix errors
    (trainer.py:431-453, 559-560)."""
    obj = lp.objective(state)
    gap = (obj - oracle_obj) / jnp.abs(oracle_obj)
    fixed = (~state.free) & prob.var_mask
    out = {
        "obj": obj,
        "obj_gap": gap,
        "iterations": state.it,
        "infeasible": lp.infeasible_rows(state, prob),
        "n_fixed": jnp.sum(fixed, axis=-1),
    }
    if labels is not None:
        sol = lp.solution(state)
        agree = (sol == labels) & prob.var_mask
        out["fix_errors"] = jnp.sum(fixed & (state.fixed_val != labels),
                                    axis=-1)
        out["sol_1_to_0"] = jnp.sum(
            ((labels == 1) & (sol == 0)) & prob.var_mask, axis=-1)
        out["sol_0_to_1"] = jnp.sum(
            ((labels == 0) & (sol == 1)) & prob.var_mask, axis=-1)
        out["sol_agree"] = jnp.sum(agree, axis=-1)
    return out
