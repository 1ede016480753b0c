"""Fused Pallas LP window kernel vs the XLA reference path.

Runs in interpreter mode on CPU (pallas_guide.md: interpret=True); the
compiled path is exercised on real TPU by bench.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lpbox_admm_tpu.adapters import ca
from lpbox_admm_tpu.config import LP_CONFIG
from lpbox_admm_tpu.core import lp
from lpbox_admm_tpu.ops import pallas_lp


@pytest.fixture(scope="module")
def prob():
    rng = np.random.RandomState(7)
    insts = [ca.generate_cauction(rng, n_items=20, n_bids=60)
             for _ in range(4)]
    return ca.make_problem(insts)


CFG = LP_CONFIG.replace(linsolve="woodbury")


def test_fused_window_matches_xla(prob):
    state0 = lp.init_state(prob, CFG)
    ref, _ = lp.solve_window(state0, prob, CFG, 30, record=False,
                             skip_cvg_at=0)
    fused = pallas_lp.lp_window_fused(state0, prob, CFG, 30, bt=2,
                                      skip_cvg_at=0, interpret=True)
    assert int(fused.it) == int(ref.it) == 30
    # same trajectory to f32 reduction-order noise over 30 iters
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(ref.x),
                               rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(fused.z4), np.asarray(ref.z4),
                               rtol=5e-2, atol=2e-1)
    np.testing.assert_array_equal(np.asarray(fused.done),
                                  np.asarray(ref.done))


def test_fused_solve_quality(prob):
    """Full fused solve converges to the same objectives as the XLA
    path (chaotic dynamics => compare converged objectives)."""
    ref = lp.solve(prob, CFG, max_iters=20000, window=50)
    fused = pallas_lp.solve_fused(prob, CFG, max_iters=20000, window=50,
                                  bt=2, interpret=True)
    assert bool(jnp.all(fused.done))
    o_ref = np.asarray(lp.objective(ref))
    o_fused = np.asarray(lp.objective(fused))
    gap = np.abs(o_fused - o_ref) / np.abs(o_ref)
    assert np.all(gap < 0.05), (o_fused, o_ref)
    infeas = np.asarray(lp.infeasible_rows(fused, prob))
    np.testing.assert_array_equal(infeas, 0)


def test_fused_respects_done_freezing(prob):
    state = lp.solve(prob, CFG, max_iters=20000, window=50)
    assert bool(jnp.all(state.done))
    again = pallas_lp.lp_window_fused(state, prob, CFG, 10, bt=2,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(again.x),
                               np.asarray(state.x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(again.cur_obj),
                               np.asarray(state.cur_obj), atol=1e-5)


def test_fused_window_records_trajectory(prob):
    state0 = lp.init_state(prob, CFG)
    ref_state, ref_traj = lp.solve_window(state0, prob, CFG, 20,
                                          record=True, skip_cvg_at=0)
    f_state, f_traj = pallas_lp.lp_window_fused(
        state0, prob, CFG, 20, bt=2, skip_cvg_at=0, interpret=True,
        record=True)
    assert f_traj.shape == ref_traj.shape
    np.testing.assert_allclose(np.asarray(f_traj), np.asarray(ref_traj),
                               rtol=5e-2, atol=5e-3)
