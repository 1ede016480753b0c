"""Correctness of the mega-rung l2f driver's host-side fix+compact
(scripts/mega_l2f.host_fix_compact): the struct->reduced-dense reduction
must reproduce the tested masked apply_fix path (core/lp) pointwise over
a short post-fix horizon and in the reported solution semantics.

The reduction algebra mirrors core/lp.compact (itself the reference's
physical shrink, cython_solver/LPboxADMMsolver.cpp:1124-1335); this test
pins the host re-implementation to the in-jit one.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from lpbox_admm_tpu.adapters import ca
from lpbox_admm_tpu.config import LP_CONFIG
from lpbox_admm_tpu.core import lp

import mega_l2f


@pytest.fixture(scope="module")
def small_inst():
    rng = np.random.RandomState(5)
    return ca.generate_cauction(rng, n_items=50, n_bids=300,
                                return_coo=True)


def _fix_vec_from_x(x, n_valid, lo=0.1, hi=0.9):
    v = np.full(x.shape[-1], -1.0, np.float32)
    xv = np.asarray(x)[0]
    v[:n_valid] = np.where(xv[:n_valid] > hi, 1.0,
                           np.where(xv[:n_valid] < lo, 0.0, -1.0))
    return v


def test_host_fix_compact_matches_masked_apply_fix(small_inst):
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    p, (r, c, v, shape) = small_inst
    n_valid = len(p)

    # dense reference path: same instance, masked apply_fix
    C = np.zeros(tuple(shape), np.float64)
    C[np.asarray(r), np.asarray(c)] = np.asarray(v)
    prob_d = ca.make_problem([(p, C)])
    state_d = lp.init_state(prob_d, cfg)
    state_d, _ = lp.solve_window(state_d, prob_d, cfg, 30, record=False,
                                 skip_cvg_at=0)

    # struct path, identical first 30 iterations (within f32 noise --
    # before the ~40-iteration chaotic divergence horizon)
    prob_s, ginv_s, row_maps = mega_l2f.build_struct(small_inst,
                                                     width_cap=12)
    state_s = lp.init_state(prob_s, cfg, ginv=ginv_s)
    state_s, _ = lp.solve_window(state_s, prob_s, cfg, 30, record=False,
                                 skip_cvg_at=0)
    np.testing.assert_allclose(
        np.asarray(state_s.x)[0, :n_valid],
        np.asarray(state_d.x)[0, :n_valid], atol=2e-3)

    vec = _fix_vec_from_x(state_s.x, n_valid)
    n_fixed = int((vec >= 0).sum())
    assert n_fixed > cfg.min_fix, "test needs a real fix event"

    # (a) masked fixing on the dense problem (tested core path)
    vec_d = np.full((1, prob_d.n), -1.0, np.float32)
    vec_d[0, :n_valid] = vec[:n_valid]
    state_d2 = lp.apply_fix(state_d, prob_d, jnp.asarray(vec_d), cfg)
    state_d2, _ = lp.solve_window(state_d2, prob_d, cfg, 10,
                                  record=False)

    # (b) host fix+compact -> reduced dense problem
    state_red, prob_red, carry = mega_l2f.host_fix_compact(
        state_s, prob_s, small_inst, row_maps[0], vec, cfg,
        align=128, e_dtype="float32")
    assert prob_red.n < prob_d.n   # (m both floor at the pad align here)
    state_red, _ = lp.solve_window(state_red, prob_red, cfg, 10,
                                   record=False)

    # pointwise iterate agreement on the surviving free columns
    free_cols = carry["free_cols"]
    x_red = np.asarray(state_red.x)[0, :len(free_cols)]
    x_ref = np.asarray(state_d2.x)[0, free_cols]
    np.testing.assert_allclose(x_red, x_ref, atol=5e-3)

    # fixed-objective accounting matches the masked path
    np.testing.assert_allclose(np.asarray(state_red.sum_fix_obj),
                               np.asarray(state_d2.sum_fix_obj),
                               rtol=1e-5)

    # reported full-width solution/objective/feasibility agree with the
    # masked path's select_solution on the original problem
    out = mega_l2f.report_full(state_red, carry)
    sol_d, obj_d, inf_d = lp.select_solution(
        prob_d, lp.solution(state_d2), lp.solution_best(state_d2))
    assert out["infeasible"] == int(np.asarray(inf_d)[0])
    np.testing.assert_allclose(out["obj"], float(np.asarray(obj_d)[0]),
                               rtol=1e-5)


def test_reduced_schur_ginv_matches_dense(small_inst):
    """The Schur-structured reduced inverse (m1_full route) must be
    numerically the same operator as the dense reduced Cholesky: same
    post-fix iterates and reported solution."""
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    p, (r, c, v, shape) = small_inst
    n_valid = len(p)
    prob_s, ginv_s, row_maps = mega_l2f.build_struct(small_inst,
                                                     width_cap=12)
    state_s = lp.init_state(prob_s, cfg, ginv=ginv_s)
    state_s, _ = lp.solve_window(state_s, prob_s, cfg, 30, record=False,
                                 skip_cvg_at=0)
    vec = _fix_vec_from_x(state_s.x, n_valid)

    outs = []
    for m1_full in (None, prob_s.E.m1):
        st, pr, carry = mega_l2f.host_fix_compact(
            state_s, prob_s, small_inst, row_maps[0], vec, cfg,
            align=128, e_dtype="float32", m1_full=m1_full)
        st, _ = lp.solve_window(st, pr, cfg, 10, record=False)
        x = np.asarray(st.x)[0, :len(carry["free_cols"])]
        outs.append((x, mega_l2f.report_full(st, carry)))
    (x_d, out_d), (x_s, out_s) = outs
    np.testing.assert_allclose(x_s, x_d, atol=1e-4)
    np.testing.assert_allclose(out_s["obj"], out_d["obj"], rtol=1e-6)
    assert out_s["infeasible"] == out_d["infeasible"]


def test_host_fix_compact_second_event(small_inst):
    """A second fix+compact (prior fixes present) keeps the accounting:
    fixed values persist through the snapshot and sum_fix_obj
    accumulates."""
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    p, (r, c, v, shape) = small_inst
    n_valid = len(p)
    prob_s, ginv_s, row_maps = mega_l2f.build_struct(small_inst,
                                                     width_cap=12)
    state_s = lp.init_state(prob_s, cfg, ginv=ginv_s)
    state_s, _ = lp.solve_window(state_s, prob_s, cfg, 30, record=False,
                                 skip_cvg_at=0)
    vec1 = _fix_vec_from_x(state_s.x, n_valid, lo=0.02, hi=0.98)
    state_red, prob_red, carry = mega_l2f.host_fix_compact(
        state_s, prob_s, small_inst, row_maps[0], vec1, cfg,
        align=128, e_dtype="float32")
    state_red, _ = lp.solve_window(state_red, prob_red, cfg, 20,
                                   record=False)
    # second event: fix more, on the REDUCED problem via the tested
    # masked path, then compare the reassembled solution against a
    # single-shot fixing of the union on the dense problem
    free_cols = carry["free_cols"]
    sfo1 = float(np.asarray(state_red.sum_fix_obj)[0])
    vec2_red = _fix_vec_from_x(state_red.x, len(free_cols))
    vec2_full = np.full((1, prob_red.n), -1.0, np.float32)
    vec2_full[0, :len(free_cols)] = vec2_red[:len(free_cols)]
    state_red2 = lp.apply_fix(state_red, prob_red,
                              jnp.asarray(vec2_full), cfg, min_fix=0)
    sfo2 = float(np.asarray(state_red2.sum_fix_obj)[0])
    b = carry["b_orig"]
    newly2 = (vec2_red >= 0)[:len(free_cols)]
    expect = sfo1 + float(
        (b[free_cols] * np.clip(vec2_red[:len(free_cols)], 0, 1)
         * newly2).sum())
    np.testing.assert_allclose(sfo2, expect, rtol=1e-5)


def test_l2f_solve_struct_library(small_inst):
    """Package-level orchestrator (train/l2f_struct.l2f_solve_struct):
    full policy->compact->residual pipeline with a trajectory-derived
    pseudo-scorer; the reported solution must be feasible and the
    stage walls populated."""
    from lpbox_admm_tpu.train import l2f_struct
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    prob, ginv, row_maps = mega_l2f.build_struct(small_inst,
                                                 width_cap=12)

    def score(rows):
        return jnp.clip(rows[:, -1], 0.0, 1.0)   # last iterate value

    out = l2f_struct.l2f_solve_struct(
        prob, ginv, small_inst, row_maps[0], score, cfg,
        conf=0.9, policy_windows=3, ws=30, cap=4000, window=200)
    assert out["infeasible"] == 0
    assert out["n_fixed"] > 0
    assert out["iterations"] > 90
    assert out["policy_s"] > 0 and out["tail_s"] >= 0
