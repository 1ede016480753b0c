"""ops/pallas_stream.py vs the two-pass XLA iteration (core/lp)."""

import numpy as np
import jax
import jax.numpy as jnp

from lpbox_admm_tpu.adapters import ca
from lpbox_admm_tpu.config import LP_CONFIG
from lpbox_admm_tpu.core import lp
from lpbox_admm_tpu.ops import pallas_stream


def _batch(seed=21, count=4):
    rng = np.random.RandomState(seed)
    insts = [ca.generate_cauction(rng, n_items=20, n_bids=60)
             for _ in range(count)]
    return ca.make_problem(insts)


def test_stream_window_matches_xla_pointwise():
    """20 iterations: the single-stream pipeline computes the same
    iterates/duals/bookkeeping as core/lp.step.  Exact at W=1;
    divergence beyond ~25 iterations is chaotic amplification of f32
    summation-order differences (CLAUDE.md), not a defect -- the
    converged-quality test below covers the long run."""
    prob = _batch()
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    st0 = lp.init_state(prob, cfg)
    ref, _ = lp.solve_window(st0, prob, cfg, 20, record=False,
                             skip_cvg_at=0)
    got = pallas_stream.lp_window_stream(st0, prob, cfg, 20,
                                         skip_cvg_at=0, interpret=True)
    for name in ("x", "z1", "z2", "z4", "ex"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref, name)),
            rtol=6e-3, atol=6e-3, err_msg=name)
    np.testing.assert_array_equal(np.asarray(got.done),
                                  np.asarray(ref.done))
    np.testing.assert_allclose(np.asarray(got.cur_obj),
                               np.asarray(ref.cur_obj),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.best_bin_obj),
                               np.asarray(ref.best_bin_obj),
                               rtol=1e-4, atol=1e-3)
    assert int(got.it) == int(ref.it) == 20


def test_stream_solve_quality():
    """Window-quantized stream solve converges like the XLA solve:
    same iteration count to within one window, equal selection-reported
    objectives on most instances (chaotic trajectories legitimately
    land on different local roundings occasionally), batch mean within
    a few %, feasible everywhere."""
    prob = _batch(seed=22, count=4)
    cfg = LP_CONFIG.replace(linsolve="woodbury")

    ref = lp.solve(prob, cfg, window=100, max_iters=20000)
    _, robj, _ = lp.select_solution(prob, lp.solution(ref),
                                    lp.solution_best(ref))

    st = lp.init_state(prob, cfg)
    first = True
    for _ in range(200):
        st = pallas_stream.lp_window_stream(
            st, prob, cfg, 100, skip_cvg_at=0 if first else None,
            interpret=True)
        first = False
        if bool(np.asarray(jnp.all(st.done))) or int(st.it) >= 20000:
            break
    assert bool(np.asarray(jnp.all(st.done)))
    # iteration counts only broadly comparable: the triangular-read
    # G^{-1} apply (ops/pallas_symm) differs from the dense einsum at
    # ~1e-7, which the chaotic trajectory amplifies into a different
    # (equally valid) stop window (CLAUDE.md: compare objectives,
    # never iterates/stop luck)
    assert abs(int(st.it) - int(ref.it)) <= 0.15 * int(ref.it), (
        int(st.it), int(ref.it))
    _, sobj, sinf = lp.select_solution(prob, lp.solution(st),
                                       lp.solution_best(st))
    assert np.all(np.asarray(sinf) == 0)
    robj, sobj = np.asarray(robj), np.asarray(sobj)
    assert abs(sobj.mean() - robj.mean()) / (abs(robj.mean()) + 1.0) \
        < 0.05, (sobj, robj)


def test_stream_bf16_storage_runs():
    """bf16 E storage streams half the bytes; 0/1 entries upcast
    exactly, so a short window matches f32 storage closely."""
    prob = _batch(seed=23, count=2)
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    st0 = lp.init_state(prob, cfg)
    a = pallas_stream.lp_window_stream(st0, prob, cfg, 20,
                                       skip_cvg_at=0, interpret=True)
    b = pallas_stream.lp_window_stream(
        st0, prob, cfg.replace(matvec_dtype="bfloat16"), 20,
        skip_cvg_at=0, interpret=True)
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x),
                               rtol=2e-3, atol=2e-3)
