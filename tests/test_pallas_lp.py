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


def test_fused_nside_matches_mside(prob):
    """The direct n-side x-update (factorize_nside) is the same exact
    solve as the Woodbury m-side detour -- identical windows."""
    from lpbox_admm_tpu.ops import woodbury

    state0 = lp.init_state(prob, CFG)
    nf = woodbury.factorize_nside(prob.E, state0.free, lp._wb_ratio(CFG))
    mside = pallas_lp.lp_window_fused(state0, prob, CFG, 30, bt=2,
                                      skip_cvg_at=0, interpret=True)
    nside = pallas_lp.lp_window_fused(state0, prob, CFG, 30, bt=2,
                                      skip_cvg_at=0, interpret=True,
                                      nfactor=(nf.hinv, nf.ete))
    np.testing.assert_allclose(np.asarray(nside.x), np.asarray(mside.x),
                               rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(nside.best_bin_obj),
                               np.asarray(mside.best_bin_obj),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(nside.done),
                                  np.asarray(mside.done))


def test_fused_incumbent_stride_matches_xla(prob):
    """incumbent_stride > 1 samples the incumbent identically in the
    fused kernel (pl.when path) and the XLA step."""
    cfg = CFG.replace(incumbent_stride=4)
    state0 = lp.init_state(prob, cfg)
    ref, _ = lp.solve_window(state0, prob, cfg, 30, record=False,
                             skip_cvg_at=0)
    fused = pallas_lp.lp_window_fused(state0, prob, cfg, 30, bt=2,
                                      skip_cvg_at=0, interpret=True)
    np.testing.assert_allclose(np.asarray(fused.best_bin_obj),
                               np.asarray(ref.best_bin_obj),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.cur_obj),
                               np.asarray(ref.cur_obj),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.best_sol),
                               np.asarray(ref.best_sol),
                               rtol=5e-2, atol=5e-3)


def test_fused_stride_solve_quality(prob):
    """A full solve with a strided incumbent stays feasible and within
    a few percent of the stride-1 objectives."""
    cfg = CFG.replace(incumbent_stride=8)
    ref = pallas_lp.solve_fused(prob, CFG, max_iters=20000, window=50,
                                bt=2, interpret=True)
    strided = pallas_lp.solve_fused(prob, cfg, max_iters=20000, window=50,
                                    bt=2, interpret=True)
    o_ref = np.asarray(lp.objective_best(ref))
    o_str = np.asarray(lp.objective_best(strided))
    gap = np.abs(o_str - o_ref) / np.abs(o_ref)
    assert np.all(gap < 0.05), (o_str, o_ref)


def test_l2f_compact_fused_nside_end_to_end():
    """l2f_solve_compact(use_fused=True) exercises the full pipeline:
    fused policy windows, compaction, n-side factorization, fused
    residual -- and stays within a few % of the unfused path."""
    import flax.linen as nn
    import jax

    from lpbox_admm_tpu.config import PolicyConfig
    from lpbox_admm_tpu.train.l2f import l2f_solve_compact

    rng = np.random.RandomState(3)
    insts = [ca.generate_cauction(rng, n_items=20, n_bids=60)
             for _ in range(8)]
    p = ca.make_problem(insts)
    cfg = CFG.replace(incumbent_stride=4)

    class OraclePolicy(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            last = x[:, -1, -1]
            logit = jnp.where(last >= 0.5, 20.0, -20.0)[:, None]
            return logit, jax.nn.sigmoid(logit)

    model = OraclePolicy()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 20, 5)))
    pcfg = PolicyConfig(net="mha")

    _, out_f = l2f_solve_compact(p, model, variables, cfg, pcfg,
                                 ws=100, max_iter=4000, min_bucket=32,
                                 use_fused=True, scorer="model")
    _, out_x = l2f_solve_compact(p, model, variables, cfg, pcfg,
                                 ws=100, max_iter=4000, min_bucket=32,
                                 use_fused=False, scorer="model")
    o_f, o_x = np.asarray(out_f["obj"]), np.asarray(out_x["obj"])
    gap = np.abs(o_f - o_x) / np.abs(o_x)
    assert np.all(gap < 0.06), (o_f, o_x)
    assert set(np.unique(np.asarray(out_f["solution"]))) <= {0.0, 1.0}

    # tail-only rho cut (bench's rs12 headline row): schedule and cap
    # rescaled together; converged objectives must stay within a few %
    _, out_rs = l2f_solve_compact(p, model, variables, cfg, pcfg,
                                  ws=100, max_iter=2000, min_bucket=32,
                                  use_fused=False, scorer="model",
                                  tail_rho_step=12)
    o_rs = np.asarray(out_rs["obj"])
    gap_rs = np.abs(o_rs - o_x) / np.abs(o_x)
    assert np.all(gap_rs < 0.08), (o_rs, o_x)
    assert int(out_rs["iterations"]) <= 2100


def _big_problem(B=2, m=512, n=512, seed=0):
    """Shape large enough that lp_window_fused picks the chunked
    mat-vec path (4*bt*m*n > 2MB at bt=2)."""
    from lpbox_admm_tpu.core.problem import LpProblem

    rng = np.random.RandomState(seed)
    E = (rng.rand(B, m, n) < 0.02).astype(np.float32)
    b = -rng.rand(B, n).astype(np.float32)
    f = np.maximum(E.sum(-1) * 0.3, 1.0).astype(np.float32)
    return LpProblem(E=jnp.asarray(E), b=jnp.asarray(b),
                     f=jnp.asarray(f),
                     var_mask=jnp.ones((B, n), bool),
                     row_mask=jnp.ones((B, m), bool))


def test_fused_chunked_mside_matches_xla():
    """At shapes where the broadcast-product temporary exceeds the
    chunk threshold, the 128-row chunked bmv/bmv_t path is exact."""
    p = _big_problem()
    state0 = lp.init_state(p, CFG)
    ref, _ = lp.solve_window(state0, p, CFG, 10, record=False,
                             skip_cvg_at=0)
    fused = pallas_lp.lp_window_fused(state0, p, CFG, 10, bt=2,
                                      skip_cvg_at=0, interpret=True)
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(ref.x),
                               rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(fused.ex), np.asarray(ref.ex),
                               rtol=5e-2, atol=5e-3)


def test_fused_chunked_nside_matches_xla():
    from lpbox_admm_tpu.ops import woodbury

    p = _big_problem(m=640, n=512)
    state0 = lp.init_state(p, CFG)
    nf = woodbury.factorize_nside(p.E, state0.free, lp._wb_ratio(CFG))
    ref, _ = lp.solve_window(state0, p, CFG, 10, record=False,
                             skip_cvg_at=0)
    fused = pallas_lp.lp_window_fused(state0, p, CFG, 10, bt=2,
                                      skip_cvg_at=0, interpret=True,
                                      nfactor=(nf.hinv, nf.ete))
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(ref.x),
                               rtol=5e-2, atol=5e-3)


def test_fused_bt1_lowerable_layout():
    """bt=1 (rank-3 vector blocks) matches the XLA window -- the
    layout the scale-ladder rungs need."""
    p = _big_problem(B=2, m=256, n=256)
    state0 = lp.init_state(p, CFG)
    ref, _ = lp.solve_window(state0, p, CFG, 10, record=False,
                             skip_cvg_at=0)
    fused = pallas_lp.lp_window_fused(state0, p, CFG, 10, bt=1,
                                      skip_cvg_at=0, interpret=True)
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(ref.x),
                               rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(fused.best_bin_obj),
                               np.asarray(ref.best_bin_obj),
                               rtol=1e-3, atol=1e-3)


def test_auto_bt_model():
    """auto_bt: compacted l2f shape gets bt>=8; ladder rungs get small
    but nonzero bt; the xl rung overflows to 0 (XLA fallback)."""
    assert pallas_lp.auto_bt(128, 256, 256, nside=True) >= 8
    assert pallas_lp.auto_bt(128, 256, 512) >= 8
    assert pallas_lp.auto_bt(64, 512, 1024) >= 1
    assert pallas_lp.auto_bt(64, 640, 1536) >= 1
    assert pallas_lp.auto_bt(32, 1664, 4096) == 0


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


def test_fused_bf16_storage_bit_exact(prob):
    """bf16 E storage in the kernel is BIT-exact vs f32 storage: 0/1
    entries upcast exactly and all arithmetic stays f32 (unlike the
    XLA bf16 dot path which needs the 3-limb vector split)."""
    state0 = lp.init_state(prob, CFG)
    f32 = pallas_lp.lp_window_fused(state0, prob, CFG, 30, bt=2,
                                    skip_cvg_at=0, interpret=True)
    bf16 = pallas_lp.lp_window_fused(
        state0, prob, CFG.replace(matvec_dtype="bfloat16"), 30, bt=2,
        skip_cvg_at=0, interpret=True)
    np.testing.assert_array_equal(np.asarray(bf16.x), np.asarray(f32.x))
    np.testing.assert_array_equal(np.asarray(bf16.z4),
                                  np.asarray(f32.z4))
    np.testing.assert_array_equal(np.asarray(bf16.best_bin_obj),
                                  np.asarray(f32.best_bin_obj))


def test_auto_bt_bf16_admits_larger_blocks():
    assert pallas_lp.auto_bt(64, 640, 1536, e_bytes=2) >= \
        pallas_lp.auto_bt(64, 640, 1536)
    assert pallas_lp.auto_bt(64, 640, 1536, e_bytes=2) >= 2
