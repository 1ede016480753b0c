"""Fused Pallas policy-scorer kernel vs the flax model (interpret mode).

The kernel must reproduce models/policy.GraphAttentionEncoder /
MLPEncoder eval-mode sigmoids exactly (to f32 rounding) in every
configuration the three workloads use, including the sliding-window
segmentation tokens and the MLP ablation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lpbox_admm_tpu.config import PolicyConfig
from lpbox_admm_tpu.models.pallas_policy import (pack_policy_weights,
                                                 policy_scores_pallas)
from lpbox_admm_tpu.models.policy import build_policy
from lpbox_admm_tpu.train.l2f import traj_to_tokens


CONFIGS = [
    ("lp-mha", "mha", PolicyConfig(net="mha"), 100),
    ("attack-mha", "mha", PolicyConfig(net="mha", node_size=10), 50),
    ("seg-mha-sliding", "mha",
     PolicyConfig(net="mha", node_size=5, window_mode="sliding"), 10),
    ("lp-mlp", "mlp", PolicyConfig(net="mlp"), 100),
]


@pytest.mark.parametrize("name,net,pcfg,ws", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_matches_flax_model(name, net, pcfg, ws):
    model = build_policy(net)
    rows = jax.random.uniform(jax.random.PRNGKey(3), (200, ws))
    toks = traj_to_tokens(rows, pcfg)
    variables = model.init(jax.random.PRNGKey(0), toks[:2], train=True)
    _, sig_ref = model.apply(variables, toks, train=False)
    sig = policy_scores_pallas(variables, rows, pcfg, interpret=True)
    np.testing.assert_allclose(np.asarray(sig),
                               np.asarray(sig_ref[:, 0]),
                               rtol=0, atol=1e-5)


def test_nontrivial_batch_stats():
    """BatchNorm folding must use the running statistics, not the
    initializers -- train a few steps so mean/var move off 0/1."""
    pcfg = PolicyConfig(net="mha")
    model = build_policy("mha")
    rows = jax.random.uniform(jax.random.PRNGKey(1), (128, 100)) * 3.0
    toks = traj_to_tokens(rows, pcfg)
    variables = model.init(jax.random.PRNGKey(0), toks[:2], train=True)
    # run train-mode applies to update batch_stats
    for _ in range(3):
        _, mut = model.apply(variables, toks, train=True,
                             mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mut["batch_stats"]}
    stats_leaves = jax.tree_util.tree_leaves(variables["batch_stats"])
    assert any(float(jnp.abs(l).max()) > 1e-3 for l in stats_leaves)
    _, sig_ref = model.apply(variables, toks, train=False)
    sig = policy_scores_pallas(variables, rows, pcfg, interpret=True)
    np.testing.assert_allclose(np.asarray(sig),
                               np.asarray(sig_ref[:, 0]),
                               rtol=0, atol=1e-5)


def test_row_padding():
    """Row counts that don't divide block_rows are padded and cropped."""
    pcfg = PolicyConfig(net="mha")
    model = build_policy("mha")
    rows = jax.random.uniform(jax.random.PRNGKey(2), (67, 100))
    toks = traj_to_tokens(rows, pcfg)
    variables = model.init(jax.random.PRNGKey(0), toks[:2], train=True)
    _, sig_ref = model.apply(variables, toks, train=False)
    sig = policy_scores_pallas(variables, rows, pcfg, interpret=True,
                               block_rows=64)
    assert sig.shape == (67,)
    np.testing.assert_allclose(np.asarray(sig),
                               np.asarray(sig_ref[:, 0]),
                               rtol=0, atol=1e-5)


def test_pack_is_jittable():
    """pack_policy_weights is pure jnp: usable inside jitted phases."""
    pcfg = PolicyConfig(net="mha")
    model = build_policy("mha")
    toks = jnp.zeros((2, pcfg.node_size, pcfg.chunk_dim))
    variables = model.init(jax.random.PRNGKey(0), toks, train=True)

    @jax.jit
    def packed_peb(v):
        return pack_policy_weights(v, pcfg.node_size, pcfg.chunk_dim,
                                   pcfg.pe_dim).peb

    out = packed_peb(variables)
    assert out.shape == (pcfg.node_size, 128)
