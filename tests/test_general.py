"""Tests for the generic constrained-BQP solver (eq/ineq/both)."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from lpbox_admm_tpu.config import SolverConfig
from lpbox_admm_tpu.core import general

CFG = SolverConfig(initial_rho=5.0, learning_fact=1.03, rho_change_step=5,
                   stop_threshold=1e-3, std_threshold=1e-7, history_size=5,
                   gamma0=1.0, gamma_factor=0.99, max_iters=4000)


def brute_force(A, b, C=None, d=None, E=None, f=None):
    """Exhaustive optimum over feasible binary vectors (n <= 14)."""
    n = b.shape[0]
    best, best_x = np.inf, None
    for bits in itertools.product([0.0, 1.0], repeat=n):
        x = np.array(bits)
        if C is not None and not np.allclose(C @ x, d):
            continue
        if E is not None and np.any(E @ x > f + 1e-9):
            continue
        v = x @ A @ x + b @ x
        if v < best:
            best, best_x = v, x
    return best, best_x


def random_qp(rng, n):
    M = rng.randn(n, n) * 0.5
    A = (M + M.T) / 2
    b = rng.randn(n) * 2
    return A, b


def test_unconstrained_matches_brute_force(rng):
    n = 10
    A, b = random_qp(rng, n)
    prob = general.make_general(A=A[None], b=b[None])
    st = general.solve(prob, CFG, window=50)
    obj = float(general.objective(st, prob)[0])
    opt, _ = brute_force(A, b)
    # local heuristic: within 20% of the global optimum range, and never
    # better than optimal
    assert obj >= opt - 1e-4
    spread = abs(opt) + 1.0
    assert obj - opt <= 0.5 * spread, (obj, opt)


def test_equality_constraint_satisfied(rng):
    n = 12
    A, b = random_qp(rng, n)
    # cardinality constraint: sum x = 4
    C = np.ones((1, n))
    d = np.array([4.0])
    prob = general.make_general(A=A[None], b=b[None], C=C[None], d=d[None])
    st = general.solve(prob, CFG, window=50)
    x = np.asarray(general.solution(st))[0]
    eq, _ = general.constraint_violation(st, prob)
    assert x.sum() == pytest.approx(4.0), x
    assert float(eq[0]) < 1e-6


def test_inequality_constraint_satisfied(rng):
    n = 12
    A, b = random_qp(rng, n)
    b = b - 2.0   # bias toward ones so constraints bind
    E = np.ones((1, n))
    f = np.array([5.0])
    prob = general.make_general(A=A[None], b=b[None], E=E[None], f=f[None])
    st = general.solve(prob, CFG, window=50)
    x = np.asarray(general.solution(st))[0]
    _, ineq = general.constraint_violation(st, prob)
    assert int(ineq[0]) == 0, x.sum()
    assert x.sum() <= 5


def test_both_constraints(rng):
    n = 12
    A, b = random_qp(rng, n)
    C = np.zeros((1, n))
    C[0, :6] = 1.0       # sum of first half = 2
    d = np.array([2.0])
    E = np.ones((1, n))
    f = np.array([6.0])
    prob = general.make_general(A=A[None], b=b[None], C=C[None],
                                d=d[None], E=E[None], f=f[None])
    st = general.solve(prob, CFG, window=50)
    x = np.asarray(general.solution(st))[0]
    eq, ineq = general.constraint_violation(st, prob)
    assert float(eq[0]) < 1e-6, x
    assert int(ineq[0]) == 0
    assert x[:6].sum() == pytest.approx(2.0)


def test_equality_quality_vs_brute_force(rng):
    """Objective quality under an equality constraint, averaged over
    several instances: close to the exhaustive optimum."""
    n = 12
    gaps = []
    for trial in range(4):
        A, b = random_qp(rng, n)
        C = np.ones((1, n))
        d = np.array([4.0])
        prob = general.make_general(A=A[None], b=b[None], C=C[None],
                                    d=d[None])
        st = general.solve(prob, CFG, window=50)
        x = np.asarray(general.solution(st))[0]
        if x.sum() != 4.0:
            continue
        obj = float(general.objective(st, prob)[0])
        opt, _ = brute_force(A, b, C, d)
        gaps.append((obj - opt) / (abs(opt) + 1.0))
    assert len(gaps) >= 2
    assert np.mean(gaps) < 0.35, gaps


def test_rule_fixing_path(rng):
    n = 12
    A, b = random_qp(rng, n)
    prob = general.make_general(A=A[None], b=b[None])
    st = general.solve(prob, CFG, window=50, rule_fixing=True)
    x = np.asarray(general.solution(st))[0]
    assert set(np.unique(x)).issubset({0.0, 1.0})


def test_apply_fix_fold_in(rng):
    """Fixing half the variables reproduces the reduced problem: solving
    the remainder equals brute-forcing the conditional problem."""
    n = 10
    A, b = random_qp(rng, n)
    prob = general.make_general(A=A[None], b=b[None])
    st = general.init_state(prob, CFG)
    st, _ = general.solve_window(st, prob, CFG, 3, record=False)
    assert not bool(st.done[0])    # fix while still running
    vec = np.full((1, n), -1.0)
    vec[0, :5] = [1, 0, 1, 0, 1]
    st = general.apply_fix(st, prob, jnp.asarray(vec), CFG, min_fix=0)
    st, _ = general.solve_window(st, prob, CFG, 2000, record=False)
    x = np.asarray(general.solution(st))[0]
    np.testing.assert_allclose(x[:5], [1, 0, 1, 0, 1])
    obj = float(general.objective(st, prob)[0])
    # brute-force the conditional optimum over the free half
    best = np.inf
    for bits in itertools.product([0.0, 1.0], repeat=5):
        xx = np.concatenate([[1, 0, 1, 0, 1], bits])
        best = min(best, xx @ A @ xx + b @ xx)
    assert obj >= best - 1e-4
    assert obj - best <= 0.5 * (abs(best) + 1.0), (obj, best)
