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


def _coo_of(M, tol=1e-12):
    rows, cols = np.nonzero(np.abs(M) > tol)
    return rows, cols, M[rows, cols].astype(np.float32)


def test_sparse_general_matches_dense(rng):
    """SparseEll A/C/E path equals the dense path on the same problem
    (eq + ineq; converged objectives compared -- iterates are
    chaotic)."""
    n = 12
    B = 2
    As, bs = [], []
    for _ in range(B):
        A, b = random_qp(rng, n)
        A[np.abs(A) < 0.4] = 0.0            # sparsify, keep symmetry
        As.append(A)
        bs.append(b)
    A = np.stack(As)
    b = np.stack(bs).astype(np.float32)
    C = np.ones((B, 1, n), np.float32)
    d = np.full((B, 1), 4.0, np.float32)
    E = np.zeros((B, 1, n), np.float32)
    E[:, 0, : n // 2] = 1.0
    f = np.full((B, 1), 3.0, np.float32)

    dprob = general.make_general(A=A, b=b, C=C, d=d, E=E, f=f)
    sprob = general.make_sparse_general(
        b, A_coo=[_coo_of(A[i]) for i in range(B)],
        C_coo=[_coo_of(C[i]) for i in range(B)], d=d,
        E_coo=[_coo_of(E[i]) for i in range(B)], f=f)

    dst = general.solve(dprob, CFG, window=50)
    sst = general.solve(sprob, CFG, window=50)
    dobj = np.asarray(general.objective(dst, dprob))
    sobj = np.asarray(general.objective(sst, sprob))
    seq, sineq = general.constraint_violation(sst, sprob)
    assert np.all(np.asarray(sineq) == 0)
    assert np.all(np.asarray(seq) < 1.0)
    denom = np.abs(dobj) + 1.0
    assert np.all(np.abs(sobj - dobj) / denom < 0.1), (sobj, dobj)


def test_sparse_general_brute_force(rng):
    """Sparse path quality vs the exhaustive optimum (small n)."""
    n = 10
    A, b = random_qp(rng, n)
    A[np.abs(A) < 0.3] = 0.0
    C = np.ones((1, n))
    d = np.array([4.0])
    prob = general.make_sparse_general(
        b[None].astype(np.float32), A_coo=[_coo_of(A)],
        C_coo=[_coo_of(C)], d=d[None])
    st = general.solve(prob, CFG, window=50)
    x = np.asarray(general.solution(st))[0]
    assert x.sum() == pytest.approx(4.0), x
    obj = float(general.objective(st, prob)[0])
    opt, _ = brute_force(A, b, C, d)
    assert obj >= opt - 1e-4
    assert obj - opt <= 0.5 * (abs(opt) + 1.0), (obj, opt)


def test_sparse_general_100k_vars():
    """1e5-variable eq+ineq problem with a sparse quadratic term solves
    through the O(nnz) path (the reference's Eigen-sparse ADMM_bqp
    regime, Seg cpp:1384-1834; dense A would need 40 GB)."""
    rng = np.random.RandomState(7)
    n = 100_000
    # chain graph Laplacian-style A = D - W (PSD, ~3 nnz/row)
    wgt = rng.rand(n - 1).astype(np.float32) * 2.0
    rows = np.concatenate([np.arange(n - 1), np.arange(1, n),
                           np.arange(n)])
    cols = np.concatenate([np.arange(1, n), np.arange(n - 1),
                           np.arange(n)])
    deg = np.zeros(n, np.float32)
    np.add.at(deg, np.arange(n - 1), wgt)
    np.add.at(deg, np.arange(1, n), wgt)
    vals = np.concatenate([-wgt, -wgt, deg])
    b = ((rng.rand(n) - 0.45) * 4).astype(np.float32)
    # eq: sum x = 42000; ineq: at most 20000 ones in the first half.
    # Rows are NORMALIZED to unit norm (mathematically equivalent):
    # an unnormalized 1e5-wide cardinality row makes the dual force
    # rho3*z3 dwarf b by ~4 orders of magnitude and the ADMM
    # oscillates instead of converging.
    sC = 1.0 / np.sqrt(n)
    sE = 1.0 / np.sqrt(n // 2)
    C = np.full((1, n), sC)
    d = np.array([42000.0 * sC])
    E = np.zeros((1, n))
    E[0, : n // 2] = sE
    f = np.array([20000.0 * sE])
    prob = general.make_sparse_general(
        b[None], A_coo=[(rows, cols, vals)],
        C_coo=[_coo_of(C)], d=d[None],
        E_coo=[_coo_of(E)], f=f[None])
    cfg = CFG.replace(max_iters=1500)
    st = general.solve(prob, cfg, window=100)
    assert bool(np.asarray(st.done)[0])          # converged, not capped
    x = np.asarray(general.solution(st))[0]
    assert set(np.unique(x)).issubset({0.0, 1.0})
    eq, ineq = general.constraint_violation(st, prob)
    assert abs(float(np.asarray(eq)[0]) / sC) < 0.01 * 42000
    assert float(np.asarray(ineq)[0]) == 0
    obj = float(np.asarray(general.objective(st, prob))[0])
    assert np.isfinite(obj) and obj < 0          # found the good vars


def _grid_weights(rng, B, H, W):
    """Random nonneg symmetric 8-neighbour weights for a (H, W) grid."""
    from lpbox_admm_tpu.ops.stencil import OFFSETS

    w = np.zeros((B, 8, H, W), np.float32)
    base = rng.rand(B, 8, H, W).astype(np.float32)
    # symmetrize: w[d][i,j] must equal w[opp(d)][i+dr, j+dc]
    for d, (dr, dc) in enumerate(OFFSETS):
        opp = OFFSETS.index((-dr, -dc))
        if d < opp:
            w[:, d] = base[:, d]
    for d, (dr, dc) in enumerate(OFFSETS):
        opp = OFFSETS.index((-dr, -dc))
        if d > opp:
            src = np.roll(w[:, opp], shift=(dr, dc), axis=(-2, -1))
            w[:, d] = src
    # zero out-of-bounds neighbours
    for d, (dr, dc) in enumerate(OFFSETS):
        if dr == -1:
            w[:, d, 0, :] = 0
        if dr == 1:
            w[:, d, H - 1, :] = 0
        if dc == -1:
            w[:, d, :, 0] = 0
        if dc == 1:
            w[:, d, :, W - 1] = 0
    return w


def _dense_from_stencil(w):
    """Materialize A = diag(W 1) - W from (8, H, W) planes."""
    from lpbox_admm_tpu.ops.stencil import OFFSETS

    _, H, W = w.shape[-3:]
    n = H * W
    A = np.zeros((n, n))
    for d, (dr, dc) in enumerate(OFFSETS):
        for i in range(H):
            for j in range(W):
                i2, j2 = i + dr, j + dc
                if 0 <= i2 < H and 0 <= j2 < W:
                    A[i * W + j, i2 * W + j2] -= w[d, i, j]
    np.fill_diagonal(A, w.sum(axis=0).reshape(-1))
    return A


def test_grid_general_matches_dense(rng):
    """Stencil-A path equals the dense path on a small grid (same
    problem, both eq + ineq constraints; converged objectives compared
    -- iterates are chaotic)."""
    B, H, W = 2, 4, 4
    n = H * W
    w = _grid_weights(rng, B, H, W)
    b = rng.randn(B, n).astype(np.float32) * 2
    C = np.ones((B, 1, n), np.float32)
    d = np.full((B, 1), 6.0, np.float32)
    E = np.zeros((B, 1, n), np.float32)
    E[:, 0, : n // 2] = 1.0
    f = np.full((B, 1), 4.0, np.float32)

    gprob = general.make_grid_general(w, b, C=C, d=d, E=E, f=f)
    A_dense = np.stack([_dense_from_stencil(w[i]) for i in range(B)])
    dprob = general.make_general(A=A_dense, b=b, C=C, d=d, E=E, f=f)

    gst = general.solve(gprob, CFG, window=50)
    dst = general.solve(dprob, CFG, window=50)
    gobj = np.asarray(general.objective(gst, gprob))
    dobj = np.asarray(general.objective(dst, dprob))
    geq, gineq = general.constraint_violation(gst, gprob)
    assert np.all(np.asarray(gineq) == 0)
    assert np.all(np.asarray(geq) < 1.0)
    # same algorithm, same data: converged objectives agree to a few %
    denom = np.abs(dobj) + 1.0
    assert np.all(np.abs(gobj - dobj) / denom < 0.1), (gobj, dobj)


def test_grid_general_10k_vars():
    """1e4-variable constrained grid problem solves without dense A
    (the reference ADMM_bqp sparse regime, Seg cpp:1384-1834)."""
    rng = np.random.RandomState(5)
    B, H, W = 1, 100, 100
    n = H * W
    w = _grid_weights(rng, B, H, W) * 3.0
    b = (rng.rand(B, n).astype(np.float32) - 0.45) * 4
    # cardinality equality sum(x) = 4000 + budget on the top half
    C = np.ones((B, 1, n), np.float32)
    d = np.full((B, 1), 4000.0, np.float32)
    E = np.zeros((B, 1, n), np.float32)
    E[:, 0, : n // 2] = 1.0
    f = np.full((B, 1), 1500.0, np.float32)
    prob = general.make_grid_general(w, b, C=C, d=d, E=E, f=f)
    cfg = CFG.replace(max_iters=3000)
    st = general.solve(prob, cfg, window=100)
    x = np.asarray(general.solution(st))[0]
    assert set(np.unique(x)).issubset({0.0, 1.0})
    eq, ineq = general.constraint_violation(st, prob)
    # soft-constraint ADMM: near-feasible at convergence
    assert abs(float(np.asarray(eq)[0])) < 0.02 * 4000
    assert float(np.asarray(ineq)[0]) == 0
    obj = float(np.asarray(general.objective(st, prob))[0])
    assert np.isfinite(obj)
