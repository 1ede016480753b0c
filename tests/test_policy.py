"""Tests for the policy nets, l2f loop, and imitation trainer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lpbox_admm_tpu.adapters import ca
from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
from lpbox_admm_tpu.core import lp
from lpbox_admm_tpu.models.policy import (GraphAttentionEncoder, MLPEncoder,
                                          build_policy, position_encoding)
from lpbox_admm_tpu.train import imitation, l2f


def test_position_encoding_matches_reference_formula():
    pe = np.asarray(position_encoding(20, 5))
    assert pe.shape == (20, 5)
    # pos 0 is zeroed *before* sin/cos are applied, so cos slots become 1
    # (reference common/utils.py:27-30)
    np.testing.assert_allclose(pe[0], [0.0, 1.0, 0.0, 1.0, 0.0])
    # pos 1: sin/cos of 1/10000^(2*(j//2)/5)
    angles = [1 / 10000 ** (2 * (j // 2) / 5) for j in range(5)]
    expected = [np.sin(angles[0]), np.cos(angles[1]), np.sin(angles[2]),
                np.cos(angles[3]), np.sin(angles[4])]
    np.testing.assert_allclose(pe[1], expected, rtol=1e-6)


@pytest.mark.parametrize("net", ["mha", "mlp"])
def test_policy_forward_shapes(net):
    model = build_policy(net)
    x = jnp.zeros((7, 20, 5))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    logit, sig = model.apply(variables, x, train=False)
    assert logit.shape == (7, 1)
    assert sig.shape == (7, 1)
    assert bool(jnp.all((sig >= 0) & (sig <= 1)))


def test_policy_train_reduces_loss():
    # tiny synthetic imitation task: label = whether the last chunk mean
    # is above 0.5 -- learnable from the trajectory window
    rng = np.random.RandomState(0)
    x = rng.rand(256, 20, 5).astype(np.float32)
    labels = (x[:, -1, :].mean(-1) > 0.5).astype(np.float32)
    model = build_policy("mlp")
    pcfg = PolicyConfig(net="mlp", lr=1e-3)
    tr = imitation.PolicyTrainer(model, pcfg)
    ts = tr.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]))
    w = jnp.ones((256,))
    losses = []
    for _ in range(60):
        ts, loss = tr._train_step(ts, jnp.asarray(x), jnp.asarray(labels), w)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses[::20]


def test_scores_to_vec():
    sig = jnp.array([0.95, 0.05, 0.5, 0.91, 0.09])
    vec = l2f.scores_to_vec(sig, 0.9)
    np.testing.assert_allclose(np.asarray(vec), [1.0, 0.0, -1.0, 1.0, 0.0])


@pytest.fixture(scope="module")
def lp_setup():
    rng = np.random.RandomState(11)
    insts = [ca.generate_cauction(rng, n_items=20, n_bids=60)
             for _ in range(3)]
    prob = ca.make_problem(insts)
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    ds = imitation.build_dataset(prob, cfg, record_iters=1000)
    return prob, cfg, ds


def test_build_dataset(lp_setup):
    prob, cfg, ds = lp_setup
    B, n = prob.batch, prob.n
    assert ds.traj.shape == (B, n, 1000)
    assert ds.labels.shape == (B, n)
    assert set(np.unique(np.asarray(ds.labels))).issubset({0.0, 1.0})
    # trajectory's first window should differ from its last (it moves)
    assert float(jnp.abs(ds.traj[..., 0] - ds.traj[..., 999]).max()) > 0.01
    assert np.all(np.asarray(ds.oracle_obj) < 0)


def test_episode_batch_weights(lp_setup):
    prob, cfg, ds = lp_setup
    pcfg = PolicyConfig()
    x, labels, weight = imitation.episode_batch(ds, pcfg, ws=100,
                                                n_episodes=10)
    B, n = prob.batch, prob.n
    assert x.shape == (10 * B * n, 20, 5)
    assert labels.shape == weight.shape == (10 * B * n,)
    w = np.asarray(weight).reshape(10, B, n)
    mask = np.asarray(prob.var_mask)
    # episode i has weight 1/i on valid vars, 0 on padding
    for i in range(10):
        np.testing.assert_allclose(w[i][mask], 1.0 / (i + 1), rtol=1e-6)
        np.testing.assert_allclose(w[i][~mask], 0.0)


def test_l2f_untrained_policy_no_fix(lp_setup):
    """An untrained policy outputs sigma ~ 0.5 => nothing fixed, result
    identical to the plain solve."""
    prob, cfg, ds = lp_setup
    model = build_policy("mlp")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 20, 5)), train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    pcfg = PolicyConfig(net="mlp", fix_confidence=0.999999)
    state = l2f.l2f_solve(prob, model, variables, cfg, pcfg, ws=100,
                          max_iter=4000)
    assert int(jnp.sum(~state.free & prob.var_mask)) == 0


def test_l2f_oracle_policy_accelerates(lp_setup):
    """A 'perfect' fixing decision (the labels themselves) must converge
    faster than plain ADMM at near-zero objective gap -- validates the
    mask-based problem-reduction math end-to-end."""
    prob, cfg, ds = lp_setup
    plain_iters = int(ds.oracle_iters)

    state = lp.init_state(prob, cfg)
    state, _ = lp.solve_window(state, prob, cfg, 100, record=True)
    vec = jnp.where(prob.var_mask, ds.labels, -1.0)
    state = lp.apply_fix(state, prob, vec, cfg)
    # everything fixed to the oracle labels => instantly done
    assert bool(jnp.all(state.done))
    obj = np.asarray(lp.objective(state))
    # expected: the labels' own objective (ds.oracle_obj may be a
    # better feasible incumbent that fixing to labels can't recover)
    expect = np.asarray(jnp.sum(prob.b * ds.labels, axis=-1))
    gap = np.abs(obj - expect) / np.maximum(np.abs(expect), 1.0)
    np.testing.assert_array_less(gap, 1e-5)
    assert np.all(np.asarray(ds.oracle_obj) <= expect + 1e-3)
    infeas = np.asarray(lp.infeasible_rows(state, prob))
    np.testing.assert_array_equal(infeas, 0)


def test_l2f_partial_fix_math(lp_setup):
    """Fix half the variables to their labels, let ADMM finish the rest:
    objective must stay within a few % of the plain oracle."""
    prob, cfg, ds = lp_setup
    state = lp.init_state(prob, cfg)
    state, _ = lp.solve_window(state, prob, cfg, 200, record=False,
                               skip_cvg_at=0)
    B, n = prob.batch, prob.n
    half = np.zeros((B, n), dtype=bool)
    half[:, ::2] = True
    vec = jnp.where(jnp.asarray(half) & prob.var_mask, ds.labels, -1.0)
    state = lp.apply_fix(state, prob, vec, cfg)

    def cond(s):
        return jnp.logical_and(s.it < 20000, ~jnp.all(s.done))

    def body(s):
        s, _ = lp.solve_window(s, prob, cfg, 100, record=False)
        return s

    state = jax.lax.while_loop(cond, body, state)
    obj = np.asarray(lp.objective(state))
    oracle = np.asarray(ds.oracle_obj)
    gap = (obj - oracle) / np.abs(oracle)
    assert np.all(gap < 0.10), (obj, oracle)
    # solution scatter keeps the fixed values
    sol = np.asarray(lp.solution(state))
    lab = np.asarray(ds.labels)
    np.testing.assert_allclose(sol[half & np.asarray(prob.var_mask)],
                               lab[half & np.asarray(prob.var_mask)])


def test_trainer_end_to_end_small(lp_setup, tmp_path):
    """Two epochs of imitation training on real trajectories: loss drops
    and checkpoints round-trip."""
    prob, cfg, ds = lp_setup
    model = build_policy("mlp")
    pcfg = PolicyConfig(net="mlp")
    tr = imitation.PolicyTrainer(model, pcfg, cfg, ws=100,
                                 save_dir=str(tmp_path))
    ts = tr.init(jax.random.PRNGKey(0), jnp.zeros((2, 20, 5)))
    ts, loss0 = tr.train_epoch(ts, [ds])
    for _ in range(5):
        ts, loss = tr.train_epoch(ts, [ds])
    assert loss < loss0, (loss0, loss)
    tr.save(ts, 0)
    ts2 = tr.load(str(tmp_path / "checkpoint" / "checkpoint_0.npz"))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b)),
        ts.params, ts2.params)


def test_l2f_compact_matches_masked(lp_setup):
    """The compacting l2f solve produces the same quality as the
    mask-only l2f solve with the same (oracle-ish) policy behaviour.

    Uses an artificial always-confident policy derived from the
    dataset labels so fixing is deterministic."""
    import flax.linen as nn
    from lpbox_admm_tpu.train.l2f import l2f_solve, l2f_solve_compact

    prob, cfg, ds = lp_setup

    class OraclePolicy(nn.Module):
        # scores 1 for label-1 rows, 0 for label-0 rows, keyed by the
        # last trajectory value's proximity to the converged label --
        # mimics a well-trained net deterministically
        @nn.compact
        def __call__(self, x, train=False):
            last = x[:, -1, -1]
            logit = jnp.where(last >= 0.5, 20.0, -20.0)[:, None]
            return logit, jax.nn.sigmoid(logit)

    model = OraclePolicy()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 20, 5)))
    pcfg = PolicyConfig(net="mha")

    masked = l2f_solve(prob, model, variables, cfg, pcfg, ws=100,
                       max_iter=4000)
    state_c, out = l2f_solve_compact(prob, model, variables, cfg, pcfg,
                                     ws=100, max_iter=4000,
                                     min_bucket=32)
    o1 = np.asarray(lp.objective(masked))
    o2 = np.asarray(out["obj"])
    gap = np.abs(o1 - o2) / np.abs(o1)
    assert np.all(gap < 0.06), (o1, o2)
    sol = np.asarray(out["solution"])
    assert set(np.unique(sol)).issubset({0.0, 1.0})
    # compaction changes nothing about feasibility: identical counts to
    # the masked path (the naive test policy may fix conflicting bids;
    # what matters is path equivalence)
    np.testing.assert_array_equal(
        np.asarray(out["infeasible"]),
        np.asarray(lp.infeasible_rows(masked, prob)))
    # either the problem compacted, or the policy fixed everything
    # within the policy phase (then there is nothing left to shrink)
    assert state_c.x.shape[-1] < prob.n or bool(state_c.done.all())


def test_fast_scorer_matches_forward():
    """Transposed fast scorer == standard forward (eval mode)."""
    from lpbox_admm_tpu.models.fast_policy import fast_policy_scores

    model = build_policy("mha")
    rng = np.random.RandomState(0)
    x = rng.rand(256, 20, 5).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]),
                           train=True)
    _, mut = model.apply(variables, jnp.asarray(x), train=True,
                         mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mut["batch_stats"]}
    _, ref = model.apply(variables, jnp.asarray(x), train=False)
    pcfg = PolicyConfig(net="mha")
    fast = fast_policy_scores(variables, jnp.asarray(x.reshape(256, 100)),
                              pcfg)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref[:, 0]),
                               atol=2e-6)


def test_fix_agree_gate_reduces_fixing():
    """fix_agree_gate=2 (endpoint+stability veto) can only reduce the
    fixed count vs the ungated policy (plumbing check; the quality/
    throughput A/B lives in scripts/sweep_agree_gate.py + STATUS)."""
    import numpy as np
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import l2f
    from lpbox_admm_tpu.train.imitation import PolicyTrainer

    rng = np.random.RandomState(5)
    insts = [ca.generate_cauction(rng, n_items=20, n_bids=60)
             for _ in range(2)]
    prob = ca.make_problem(insts)
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    model = build_policy("mlp")
    fixed = {}
    for g in (0, 2):
        pcfg = PolicyConfig(net="mlp", fix_confidence=0.6,
                            node_size=8, chunk_dim=5,
                            fix_agree_gate=g)
        trainer = PolicyTrainer(model, pcfg, cfg, ws=40)
        import jax
        import jax.numpy as jnp
        sample = jnp.zeros((2, pcfg.node_size, pcfg.chunk_dim))
        variables = trainer.variables(
            trainer.init(jax.random.PRNGKey(0), sample))
        _, out = l2f.l2f_solve_compact(
            prob, model, variables, cfg, pcfg, ws=40,
            policy_windows=2, max_iter=2000)
        fixed[g] = int(np.asarray(out["n_fixed"]).sum())
    assert fixed[2] <= fixed[0], fixed


def test_damage_weights_semantics():
    """damage_weights: oracle-1 bids weigh |b|; oracle-0 bids weigh the
    displaced occupier prices minus their own; padding 0; mean 1."""
    import jax.numpy as jnp
    from lpbox_admm_tpu.core.problem import LpProblem
    from lpbox_admm_tpu.train.imitation import damage_weights

    # rows: r0 covers bids 0,1; r1 covers bids 1,2.  Oracle selects
    # bid 0 (price 10) and bid 2 (price 6); bid 1 (price 4) would
    # displace both -> disp = 10 + 6 - 4 = 12.
    E = jnp.asarray([[[1.0, 1, 0, 0], [0, 1, 1, 0]]])
    b = jnp.asarray([[-10.0, -4.0, -6.0, 0.0]])
    prob = LpProblem(b=b, E=E, f=jnp.ones((1, 2)),
                     row_mask=jnp.ones((1, 2), bool),
                     var_mask=jnp.asarray([[True, True, True, False]]))
    labels = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    w = np.asarray(damage_weights(prob, labels, alpha=1.0))[0]
    assert w[3] == 0.0                       # padding
    raw = np.array([10.0, 12.0, 6.0])
    np.testing.assert_allclose(w[:3], raw / raw.mean(), rtol=1e-5)
    # alpha=0.5 damps the spread but keeps the order
    w5 = np.asarray(damage_weights(prob, labels, alpha=0.5))[0]
    assert w5[1] > w5[0] > w5[2]
    assert (w5.max() - w5.min()) < (w.max() - w.min())


def test_fix_margins_risk_calibration():
    """fix_margins: gate=0 is the constant 1-C; gate>0 shrinks the
    margin linearly with the |b| rank (top-price bid tightest)."""
    import jax.numpy as jnp
    from lpbox_admm_tpu.config import PolicyConfig
    from lpbox_admm_tpu.train.l2f import fix_margins

    b = jnp.asarray([[-1.0, -9.0, -5.0, -3.0]])
    vm = jnp.ones((1, 4), bool)
    p0 = PolicyConfig(fix_confidence=0.98, damage_gate=0.0)
    m0 = np.asarray(fix_margins(b, vm, p0))
    np.testing.assert_allclose(m0, 0.02, rtol=1e-6)
    p1 = PolicyConfig(fix_confidence=0.98, damage_gate=0.75)
    m1 = np.asarray(fix_margins(b, vm, p1))[0]
    # ranks by |b|: idx0 lowest (margin 0.02), idx1 highest (0.005)
    np.testing.assert_allclose(m1[0], 0.02, rtol=1e-5)
    np.testing.assert_allclose(m1[1], 0.02 * 0.25, rtol=1e-5)
    assert m1[2] > m1[1] and m1[2] < m1[3] < m1[0]


def test_ensemble_veto_reduces_fixing():
    """A second net can only VETO fixes (never add): with variables2 an
    untrained random net (sigmas near 0.5) and veto < 0.5, the fixed
    count cannot exceed the single-net run; veto=1.0 disables the veto
    and reproduces it exactly."""
    import numpy as np
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import l2f
    from lpbox_admm_tpu.train.imitation import PolicyTrainer

    rng = np.random.RandomState(7)
    insts = [ca.generate_cauction(rng, n_items=20, n_bids=60)
             for _ in range(2)]
    prob = ca.make_problem(insts)
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    model = build_policy("mlp")
    import jax
    import jax.numpy as jnp

    pcfg = PolicyConfig(net="mlp", fix_confidence=0.6, node_size=8,
                        chunk_dim=5)
    trainer = PolicyTrainer(model, pcfg, cfg, ws=40)
    sample = jnp.zeros((2, pcfg.node_size, pcfg.chunk_dim))
    v1 = trainer.variables(trainer.init(jax.random.PRNGKey(0), sample))
    v2 = trainer.variables(trainer.init(jax.random.PRNGKey(1), sample))

    def run(variables2, veto):
        _, out = l2f.l2f_solve_compact(
            prob, model, v1, cfg, pcfg.replace(ensemble_veto=veto),
            ws=40, policy_windows=2, max_iter=2000,
            variables2=variables2)
        return int(np.asarray(out["n_fixed"]).sum())

    solo = run(None, 0.5)
    assert run(v2, 1.0) == solo          # veto disabled
    assert run(v2, 0.25) <= solo         # veto can only remove fixes
