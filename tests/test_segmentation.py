"""Tests for the stencil operator, QP core, and segmentation adapter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lpbox_admm_tpu.adapters import segmentation as seg
from lpbox_admm_tpu.config import SEG_CONFIG, PolicyConfig
from lpbox_admm_tpu.core import qp
from lpbox_admm_tpu.models.policy import build_policy
from lpbox_admm_tpu.ops.stencil import OFFSETS, build_stencil
from lpbox_admm_tpu.train import imitation, l2f


def dense_from_stencil(weights):
    """Materialize the (H*W, H*W) W matrix from weight planes (test
    oracle)."""
    _, H, W = weights.shape
    n = H * W
    M = np.zeros((n, n))
    for d, (dr, dc) in enumerate(OFFSETS):
        for i in range(H):
            for j in range(W):
                r, c = i + dr, j + dc
                if 0 <= r < H and 0 <= c < W:
                    M[i * W + j, r * W + c] = weights[d, i, j]
    return M


def test_stencil_matvec_matches_dense(rng):
    H, W = 5, 7
    weights = rng.rand(1, 8, H, W).astype(np.float32)
    # zero out-of-bounds edges as the builder would
    for d, (dr, dc) in enumerate(OFFSETS):
        if dr == -1:
            weights[:, d, 0, :] = 0
        if dr == 1:
            weights[:, d, -1, :] = 0
        if dc == -1:
            weights[:, d, :, 0] = 0
        if dc == 1:
            weights[:, d, :, -1] = 0
    st = build_stencil(jnp.asarray(weights))
    x = rng.rand(1, H, W).astype(np.float32)
    Wm = dense_from_stencil(weights[0])
    D = np.diag(Wm.sum(axis=1))
    expected = ((D - Wm) @ x.reshape(-1)).reshape(H, W)
    got = np.asarray(st.a_matvec(jnp.asarray(x)))[0]
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_binary_weights_symmetric(rng):
    I = rng.rand(6, 8)
    w = seg.binary_weights(I)
    # weight of edge (p -> q) equals (q -> p): plane d at p equals
    # opposite plane at q
    opp = {0: 7, 1: 6, 2: 5, 3: 4, 4: 3, 5: 2, 6: 1, 7: 0}
    for d, (dr, dc) in enumerate(OFFSETS):
        for i in range(6):
            for j in range(8):
                r, c = i + dr, j + dc
                if 0 <= r < 6 and 0 <= c < 8:
                    assert w[d, i, j] == w[opp[d], r, c]
                else:
                    assert w[d, i, j] == 0


def test_unary_cost_formula():
    I = np.array([[0.2, 0.6]])
    U1, U2 = seg.unary_cost(I)
    # at I = b = 0.6 the background cost hits its minimum; at I = f1 =
    # 0.2 the foreground cost hits its minimum
    assert U2[0, 0] < U2[0, 1]
    assert U1[0, 1] < U1[0, 0]
    assert np.all(U1 == np.round(U1))


@pytest.fixture(scope="module")
def seg_batch():
    paths = seg.reference_image_paths()[:3]
    prob = seg.load_problem(paths, num_nodes=400)
    return prob


def test_reference_images_load(seg_batch):
    prob = seg_batch
    assert prob.batch == 3
    H, W = prob.grid
    assert 300 <= int(prob.mask[0].sum()) <= 500


def test_qp_plain_solve(seg_batch):
    prob = seg_batch
    state = qp.solve(prob, SEG_CONFIG, max_iters=2000, window=50)
    sol = np.asarray(qp.solution(state))
    assert set(np.unique(sol)).issubset({0.0, 1.0})
    e = np.asarray(qp.energy(state, prob))
    # energy must beat the trivial all-background labelling (x = 0,
    # energy = c) -- the solver found structure
    np.testing.assert_array_less(e, np.asarray(prob.const) + 1e-3)
    # padding untouched
    assert np.all(sol[~np.asarray(prob.mask)] == 0)


def test_qp_matches_numpy_oracle(seg_batch):
    """Cross-implementation agreement on one small image: independent
    float64 dense implementation of the same math."""
    prob = seg_batch
    i = 0
    msk = np.asarray(prob.mask[i])
    H, W = prob.grid
    weights = np.asarray(prob.stencil.weights[i])
    b = np.asarray(prob.b[i], dtype=np.float64)
    Wm = dense_from_stencil(weights)
    valid = msk.reshape(-1)
    A = np.diag(Wm.sum(1)) - Wm
    A = A[np.ix_(valid, valid)]
    bv = b.reshape(-1)[valid]
    n = int(valid.sum())
    cfg = SEG_CONFIG

    x = np.zeros(n)
    z1 = np.zeros(n)
    z2 = np.zeros(n)
    cur = 0.0
    obj_hist = []
    for it in range(2000):
        k = it // cfg.rho_change_step
        rho = min(cfg.initial_rho * cfg.learning_fact ** k,
                  cfg.rho_upper_limit)
        gamma = max(cfg.gamma0 * cfg.gamma_factor ** k, 1.0)
        y1 = np.clip(x + z1 / rho, 0, 1)
        s = x + z2 / rho - 0.5
        y2 = s * np.sqrt(n) / (2 * max(np.linalg.norm(s), 1e-300)) + 0.5
        rhs = rho * y1 + rho * y2 - (bv + z1 + z2)
        M = 2 * A + 2 * rho * np.eye(n)
        x = np.linalg.solve(M, rhs)
        z1 += gamma * rho * (x - y1)
        z2 += gamma * rho * (x - y2)
        xn = max(np.linalg.norm(x), 2.2204e-16)
        if np.linalg.norm(x - y1) / xn <= cfg.stop_threshold \
                and np.linalg.norm(x - y2) / xn <= cfg.stop_threshold:
            break
        obj_hist.append(x @ (A @ x) + bv @ x)
        if len(obj_hist) >= cfg.history_size:
            w = np.array(obj_hist[-cfg.history_size:])
            if np.std(w, ddof=1) / abs(w[-1]) <= cfg.std_threshold:
                break
    r = (x >= 0.5).astype(float)
    oracle_energy = r @ (A @ r) + bv @ r + float(prob.const[i])

    state = qp.solve(prob, cfg, max_iters=2000, window=50)
    jx = float(qp.energy(state, prob)[i])
    assert abs(jx - oracle_energy) / max(abs(oracle_energy), 1.0) < 0.05, \
        (jx, oracle_energy, it)


def test_qp_fix_math(seg_batch):
    """Fixing pixels to the converged labels reproduces the oracle
    energy -- validates the quadratic b_eff fold-in."""
    prob = seg_batch
    cfg = SEG_CONFIG
    ds = imitation.build_dataset_qp(prob, cfg, record_iters=50)
    H, W = prob.grid
    labels = ds.labels.reshape(prob.batch, H, W)

    state = qp.init_state(prob, cfg)
    state, _ = qp.solve_window(state, prob, cfg, 20, record=False)
    vec = jnp.where(prob.mask, labels, -1.0)
    state = qp.apply_fix(state, prob, vec, cfg)
    assert bool(jnp.all(state.done))
    e = np.asarray(qp.energy(state, prob))
    # expected: the labels' own energy (ds.oracle_obj may be the better
    # incumbent's energy, which fixing to the labels cannot reproduce)
    x = labels * prob.mask
    expect = np.asarray(
        jnp.sum(x * prob.stencil.a_matvec(x), axis=(-2, -1))
        + jnp.sum(prob.b * x, axis=(-2, -1)) + prob.const)
    np.testing.assert_allclose(e, expect, rtol=1e-5)
    assert np.all(np.asarray(ds.oracle_obj) <= expect + 1e-4)


def test_sliding_tokens():
    rows = jnp.arange(20, dtype=jnp.float32).reshape(2, 10)
    pcfg = PolicyConfig(node_size=5, chunk_dim=5, window_mode="sliding")
    toks = l2f.traj_to_tokens(rows, pcfg)
    assert toks.shape == (2, 5, 5)
    np.testing.assert_allclose(np.asarray(toks[0, 0]), [0, 1, 2, 3, 4])
    np.testing.assert_allclose(np.asarray(toks[0, 4]), [4, 5, 6, 7, 8])


def test_seg_l2f_loop_runs(seg_batch):
    """End-to-end seg l2f with an untrained policy at moderate
    confidence: runs, fixes some pixels, produces a valid solution."""
    prob = seg_batch
    cfg = SEG_CONFIG
    pcfg = PolicyConfig(net="mlp", node_size=5, chunk_dim=5,
                        window_mode="sliding", fix_confidence=0.9)
    model = build_policy("mlp")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 5, 5)),
                           train=True)
    state = l2f.l2f_solve(prob, model, variables, cfg, pcfg, ws=10,
                          max_iter=30)
    assert int(state.it) <= 30
    sol = np.asarray(qp.solution(state))
    assert set(np.unique(sol)).issubset({0.0, 1.0})


def test_boundary_margins_band():
    """qp_boundary_margins: gate=1 zeroes the margin exactly within
    ``boundary_band`` 8-neighbour hops of a label change; interior
    margins are untouched."""
    H = W = 8
    x = jnp.zeros((1, H, W), jnp.float32).at[:, :, 4:].set(1.0)
    mask = jnp.ones((1, H, W), bool)
    base = jnp.full((1, H, W), 0.1, jnp.float32)
    pcfg = PolicyConfig(boundary_gate=1.0, boundary_band=2)
    m = np.asarray(l2f.qp_boundary_margins(x, mask, base, pcfg))
    # label change between cols 3|4: band-1 flags cols 3,4; the extra
    # dilation round reaches cols 2 and 5
    assert (m[0, :, 2:6] == 0.0).all()
    np.testing.assert_allclose(m[0, :, :2], 0.1, rtol=1e-6)
    np.testing.assert_allclose(m[0, :, 6:], 0.1, rtol=1e-6)
    # band=1: only the two columns adjacent to the change
    m1 = np.asarray(l2f.qp_boundary_margins(
        x, mask, base, pcfg.replace(boundary_band=1)))
    assert (m1[0, :, 3:5] == 0.0).all()
    np.testing.assert_allclose(m1[0, :, 2], 0.1, rtol=1e-6)
    np.testing.assert_allclose(m1[0, :, 5], 0.1, rtol=1e-6)
    # band=0 disables the gate entirely (ADVICE r4)
    m0 = np.asarray(l2f.qp_boundary_margins(
        x, mask, base, pcfg.replace(boundary_band=0)))
    np.testing.assert_allclose(m0, 0.1, rtol=1e-6)


def test_boundary_margins_mask_edge():
    """Out-of-mask pixels must not flag as boundary: a uniform label-1
    region touching the mask edge has NO label change, so no in-mask
    pixel is gated even with band >= 2 (ADVICE r4 fix)."""
    H = W = 8
    x = jnp.ones((1, H, W), jnp.float32)
    mask = jnp.zeros((1, H, W), bool).at[:, 2:6, 2:6].set(True)
    base = jnp.full((1, H, W), 0.1, jnp.float32)
    pcfg = PolicyConfig(boundary_gate=1.0, boundary_band=3)
    m = np.asarray(l2f.qp_boundary_margins(x, mask, base, pcfg))
    np.testing.assert_allclose(m, 0.1, rtol=1e-6)


def test_seg_l2f_boundary_gate(seg_batch):
    """boundary_gate=1 blocks fixes in the contested band: the gated
    solve fixes no MORE pixels than the ungated one and stays valid."""
    prob = seg_batch
    cfg = SEG_CONFIG
    model = build_policy("mlp")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 5, 5)),
                           train=True)
    fixed = {}
    for gate in (0.0, 1.0):
        pcfg = PolicyConfig(net="mlp", node_size=5, chunk_dim=5,
                            window_mode="sliding", fix_confidence=0.9,
                            boundary_gate=gate, boundary_band=2)
        st = l2f.l2f_solve(prob, model, variables, cfg, pcfg, ws=10,
                           max_iter=30)
        sol = np.asarray(qp.solution(st))
        assert set(np.unique(sol)).issubset({0.0, 1.0})
        fixed[gate] = int(np.asarray(~st.free & prob.mask).sum())
    assert fixed[1.0] <= fixed[0.0]


def test_seg_l2f_traj_fix(seg_batch):
    """PolicyConfig.traj_fix_thr: extremity fixing fixes MORE pixels
    than the (untrained-net) sigmoid alone, the fixed values equal the
    rounded iterate at the fix event for pixels the net did not decide,
    and traj_fix_only ignores the net entirely (fires even at an
    impossible sigmoid confidence)."""
    prob = seg_batch
    cfg = SEG_CONFIG
    model = build_policy("mlp")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 5, 5)),
                           train=True)
    pcfg0 = PolicyConfig(net="mlp", node_size=5, chunk_dim=5,
                         window_mode="sliding", fix_confidence=0.9)
    fixed = {}
    for thr in (0.0, 0.45):
        pcfg = pcfg0.replace(traj_fix_thr=thr)
        st = l2f.l2f_solve(prob, model, variables, cfg, pcfg, ws=10,
                           max_iter=30)
        sol = np.asarray(qp.solution(st))
        assert set(np.unique(sol)).issubset({0.0, 1.0})
        # fixed values are binary and inside the mask
        fv = np.asarray(st.fixed_val)
        fx = np.asarray(~st.free & prob.mask)
        assert np.all(np.isin(fv[fx], [0.0, 1.0]))
        fixed[thr] = int(fx.sum())
    assert fixed[0.45] >= fixed[0.0]

    # traj_fix_only at confidence 1.0 (sigmoid can never clear the
    # bar): only the extremity path can fix, and it does
    pcfg = pcfg0.replace(fix_confidence=1.0, traj_fix_thr=0.45,
                         traj_fix_only=True)
    st = l2f.l2f_solve(prob, model, variables, cfg, pcfg, ws=10,
                       max_iter=30)
    assert int(np.asarray(~st.free & prob.mask).sum()) > 0


def test_qp_rule_fixing_solve(seg_batch):
    """qp.solve(rule_fixing=True): the consistency-counter fixing works
    on the grid core, stays binary, and matches the plain solve's
    energy to a few %."""
    prob = seg_batch
    st_plain = qp.solve(prob, SEG_CONFIG, max_iters=2000, window=50)
    st_rule = qp.solve(prob, SEG_CONFIG, max_iters=2000, window=50,
                       rule_fixing=True)
    n_fixed = np.asarray((~st_rule.free) & prob.mask).sum((-2, -1))
    assert n_fixed.max() > 0, "rule fixing never fired"
    assert int(st_rule.it) <= int(st_plain.it)
    sol = np.asarray(qp.solution(st_rule))
    assert set(np.unique(sol)).issubset({0.0, 1.0})
    ep = np.asarray(qp.energy(st_plain, prob))
    er = np.asarray(qp.energy(st_rule, prob))
    assert np.all((er - ep) / (np.abs(ep) + 1.0) < 0.10), (er, ep)


def _fix_some(state, prob, rng, frac=0.5):
    """Randomly fix ``frac`` of the pixels to their rounded value."""
    H, W = prob.grid
    B = prob.batch
    take = rng.rand(B, H, W) < frac
    val = (np.asarray(state.x) >= 0.5).astype(np.float32)
    vec = np.where(take, val, -1.0).astype(np.float32)
    return qp.apply_fix(state, prob, jnp.asarray(vec), SEG_CONFIG,
                        min_fix=0)


def test_qp_compact_sparse_A_matches_dense(seg_batch):
    """qp.compact's in-jit ELL rows equal the dense A' restricted to
    free-free pairs at the gathered positions."""
    from lpbox_admm_tpu.ops import sparse as sparse_ops

    prob = seg_batch
    rng = np.random.RandomState(3)
    state = qp.init_state(prob, SEG_CONFIG)
    state, _ = qp.solve_window(state, prob, SEG_CONFIG, 10, record=False)
    state = _fix_some(state, prob, rng)
    H, W = prob.grid
    n_free = int(np.asarray(state.free.sum(axis=(-2, -1))).max())
    n_new = 1
    while n_new < n_free:
        n_new *= 2
    gstate, gprob, idx = qp.compact(state, prob, SEG_CONFIG, n_new)
    Ac = np.asarray(sparse_ops.to_dense(gprob.A))
    for bi in range(prob.batch):
        Wm = dense_from_stencil(np.asarray(prob.stencil.weights[bi]))
        Ad = np.diag(Wm.sum(1)) - Wm
        ii = np.asarray(idx[bi])
        free_flat = np.asarray(state.free[bi]).reshape(-1)
        sub = Ad[np.ix_(ii, ii)]
        fc = free_flat[ii]
        sub = sub * fc[:, None] * fc[None, :]    # zero fixed rows/cols
        np.testing.assert_allclose(Ac[bi], sub, rtol=1e-4, atol=1e-5)
        # b of the compacted problem is the gathered b_eff
        np.testing.assert_allclose(
            np.asarray(gprob.b[bi]),
            np.asarray(state.b_eff[bi]).reshape(-1)[ii],
            rtol=1e-5, atol=1e-5)


def test_qp_compact_iteration_equivalence(seg_batch):
    """Iterating the compacted flat problem (core.general) equals the
    masked full-grid iteration pointwise over a short window."""
    prob = seg_batch
    rng = np.random.RandomState(4)
    state = qp.init_state(prob, SEG_CONFIG)
    state, _ = qp.solve_window(state, prob, SEG_CONFIG, 10, record=False)
    state = _fix_some(state, prob, rng)
    H, W = prob.grid
    n_free = int(np.asarray(state.free.sum(axis=(-2, -1))).max())
    n_new = 1
    while n_new < n_free:
        n_new *= 2
    gstate, gprob, idx = qp.compact(state, prob, SEG_CONFIG, n_new)

    ref, _ = qp.solve_window(state, prob, SEG_CONFIG, 8, record=False)
    got, _ = __import__(
        "lpbox_admm_tpu.core.general", fromlist=["general"]
    ).solve_window(gstate, gprob, SEG_CONFIG, 8, record=False)

    x_ref = np.asarray(ref.x)
    x_got = np.asarray(got.x)
    for bi in range(prob.batch):
        ii = np.asarray(idx[bi])
        fc = np.asarray(gstate.free[bi])
        np.testing.assert_allclose(
            x_got[bi][fc], x_ref[bi].reshape(-1)[ii][fc],
            rtol=5e-3, atol=5e-3)
    # incumbent bookkeeping stays aligned
    np.testing.assert_allclose(np.asarray(got.best_bin_obj),
                               np.asarray(ref.best_bin_obj),
                               rtol=5e-2, atol=5e-2)


def test_l2f_compact_qp_matches_l2f_solve(seg_batch):
    """The compacted seg l2f path returns (near-)identical quality to
    the full-grid l2f_solve: same reporting interface, energy within
    1%, pixel agreement >= 99% (f32 summation-order drift on chaotic
    trajectories prevents exact equality)."""
    prob = seg_batch
    cfg = SEG_CONFIG
    # C=0.53 makes the untrained policy fix ~half the pixels per window
    # (its sigmoids sit in [0.45, 0.55]), so the compacted windows are
    # genuinely exercised
    pcfg = PolicyConfig(node_size=5, chunk_dim=5, window_mode="sliding",
                        fix_confidence=0.53)
    model = build_policy("mlp")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 5, 5)),
                           train=True)
    st_a = l2f.l2f_solve(prob, model, variables, cfg, pcfg, ws=10,
                         max_iter=30)
    st_b = l2f.l2f_solve_compact_qp(prob, model, variables, cfg, pcfg,
                                    ws=10, max_iter=30, min_bucket=64)
    sol_a, e_a = qp.select_solution(st_a, prob)
    sol_b, e_b = qp.select_solution(st_b, prob)
    m = np.asarray(prob.mask)
    agree = np.asarray(sol_a == sol_b)[m].mean()
    assert agree >= 0.99, agree
    ea, eb = np.asarray(e_a), np.asarray(e_b)
    assert np.all(np.abs(eb - ea) / (np.abs(ea) + 1.0) < 0.01), (ea, eb)
    # the compact path actually fixed pixels and iterated compacted
    assert int(np.asarray((~st_b.free) & prob.mask).sum()) > 0
    # fixes made INSIDE the flat problem must survive re-compaction
    # (regression: slots fixed in window 2 were dropped by the smaller
    # bucket and reassembly zeroed their values -- 1e5-px quality
    # collapsed until _persist_fix_snapshot)
    np.testing.assert_array_equal(
        np.asarray((~st_b.free) & prob.mask).sum((-2, -1)),
        np.asarray((~st_a.free) & prob.mask).sum((-2, -1)))
    same_fix = np.asarray(st_a.free == st_b.free)[m].mean()
    assert same_fix >= 0.995, same_fix
    both_fixed = np.asarray(~st_a.free & ~st_b.free & prob.mask)
    np.testing.assert_allclose(
        np.asarray(st_b.fixed_val)[both_fixed],
        np.asarray(st_a.fixed_val)[both_fixed])


def test_qp_refine_boundary(seg_batch):
    """The post-fix boundary refinement re-frees only boundary-band
    fixed pixels, keeps the interior fixed, and never worsens the
    selection-reported energy."""
    prob = seg_batch
    cfg = SEG_CONFIG
    pcfg = PolicyConfig(node_size=5, chunk_dim=5, window_mode="sliding",
                        fix_confidence=0.53)
    model = build_policy("mlp")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 5, 5)),
                           train=True)
    st = l2f.l2f_solve(prob, model, variables, cfg, pcfg, ws=10,
                       max_iter=30)
    n_fixed0 = np.asarray((~st.free) & prob.mask).sum((-2, -1))
    assert n_fixed0.max() > 0
    _, e0 = qp.select_solution(st, prob, repair_sweeps=4)
    st2 = l2f.qp_refine_boundary(st, prob, cfg, iters=10)
    _, e1 = qp.select_solution(st2, prob, repair_sweeps=4)
    # interior pixels stay fixed; something was re-freed (there is a
    # boundary in any non-trivial segmentation)
    n_fixed1 = np.asarray((~st2.free) & prob.mask).sum((-2, -1))
    assert np.all(n_fixed1 <= n_fixed0)
    assert np.any(n_fixed1 < n_fixed0)
    # energy never degrades (incumbent selection protects the floor)
    assert np.all(np.asarray(e1) <= np.asarray(e0) + 1e-3), (e0, e1)


def test_save_img(tmp_path, seg_batch):
    prob = seg_batch
    state = qp.solve(prob, SEG_CONFIG, max_iters=200, window=50)
    sol = np.asarray(qp.solution(state))[0]
    path = str(tmp_path / "out.png")
    seg.save_img(sol, np.asarray(prob.mask[0]), path)
    from PIL import Image
    img = np.asarray(Image.open(path))
    assert img.shape == sol.shape
    assert set(np.unique(img)).issubset({0, 255})

def test_icm_descent(seg_batch):
    """The 4-coloured one-flip polish (ops/repair.icm_descent) never
    increases energy, reaches a 1-flip local optimum, and leaves masked
    pixels untouched."""
    from lpbox_admm_tpu.ops.repair import icm_descent

    prob = seg_batch
    state = qp.solve(prob, SEG_CONFIG, max_iters=60, window=20)

    def en(x):
        ax = prob.stencil.a_matvec(x)
        return (jnp.sum(x * ax, axis=(-2, -1))
                + jnp.sum(prob.b * x, axis=(-2, -1)) + prob.const)

    sol0 = qp.solution(state) * prob.mask.astype(state.x.dtype)
    e0 = np.asarray(en(sol0))
    sol1 = icm_descent(prob.stencil, prob.b, prob.mask, sol0, sweeps=12)
    e1 = np.asarray(en(sol1))
    assert np.all(e1 <= e0 + 1e-4)
    assert np.any(e1 < e0 - 1e-3)  # the truncated solve is improvable
    # masked-out (padding) pixels untouched
    assert np.all(np.asarray(sol1)[~np.asarray(prob.mask)] == 0)
    # 1-flip local optimality: no single flip improves any instance
    sol1_np = np.asarray(sol1)
    ax = np.asarray(prob.stencil.a_matvec(jnp.asarray(sol1_np)))
    s = 1.0 - 2.0 * sol1_np
    delta = (np.asarray(prob.stencil.degree)
             + s * (2.0 * ax + np.asarray(prob.b)))
    assert np.all(delta[np.asarray(prob.mask)] >= -1e-4)


def test_select_solution_repair_qp(seg_batch):
    """qp.select_solution(repair_sweeps=N) lowers (or equals) the
    reported energy and returns a consistent (sol, energy) pair."""
    prob = seg_batch
    state = qp.solve(prob, SEG_CONFIG, max_iters=60, window=20)
    sol_a, e_a = qp.select_solution(state, prob)
    sol_b, e_b = qp.select_solution(state, prob, repair_sweeps=8)
    assert np.all(np.asarray(e_b) <= np.asarray(e_a) + 1e-4)
    ax = prob.stencil.a_matvec(sol_b)
    e_chk = (jnp.sum(sol_b * ax, axis=(-2, -1))
             + jnp.sum(prob.b * sol_b, axis=(-2, -1)) + prob.const)
    np.testing.assert_allclose(np.asarray(e_chk), np.asarray(e_b),
                               rtol=1e-5, atol=1e-3)


def test_pair_descent_escapes_icm_fixed_point():
    """A 2-pixel island with strong mutual affinity and mildly negative
    unaries: each single flip increases the energy (ICM is stuck at
    all-zeros) but flipping the pair together decreases it."""
    import jax.numpy as jnp
    import numpy as np
    from lpbox_admm_tpu.ops.repair import icm_descent, pair_descent
    from lpbox_admm_tpu.ops.stencil import build_stencil, quad_form

    H = W = 4
    w = np.zeros((1, 8, H, W), np.float32)
    # east/west symmetric edge between (1,1)-(1,2) with weight 5
    w[0, 4, 1, 1] = 5.0   # east of (1,1)
    w[0, 3, 1, 2] = 5.0   # west of (1,2)
    st = build_stencil(jnp.asarray(w))
    b = np.zeros((1, H, W), np.float32)
    b[0, 1, 1] = b[0, 1, 2] = -2.0
    b = jnp.asarray(b)
    mask = jnp.ones((1, H, W), bool)
    x0 = jnp.zeros((1, H, W), jnp.float32)

    def energy(x):
        return float(quad_form(st, x)[0] + jnp.sum(b * x))

    x_icm = icm_descent(st, b, mask, x0, sweeps=4)
    assert energy(x_icm) == energy(x0)          # stuck
    x_pair = pair_descent(st, b, mask, x0, sweeps=2)
    assert energy(x_pair) < energy(x0) - 1.0    # pair flip taken
    np.testing.assert_array_equal(
        np.asarray(x_pair[0, 1, 1:3]), np.ones(2, np.float32))
    # never increases on a random instance
    rng = np.random.RandomState(0)
    wr = np.zeros((2, 8, 8, 8), np.float32)
    e = rng.rand(2, 8, 8).astype(np.float32) * 3
    wr[:, 4, :, :-1] = e[:, :, :-1]
    wr[:, 3, :, 1:] = e[:, :, :-1]
    st2 = build_stencil(jnp.asarray(wr))
    b2 = jnp.asarray(rng.randn(2, 8, 8).astype(np.float32))
    m2 = jnp.ones((2, 8, 8), bool)
    xr = jnp.asarray((rng.rand(2, 8, 8) > 0.5).astype(np.float32))
    def en2(x):
        return np.asarray(quad_form(st2, x) + jnp.sum(b2 * x, (-2, -1)))
    xp = pair_descent(st2, b2, m2, xr, sweeps=3)
    assert np.all(en2(xp) <= en2(xr) + 1e-4)


def test_pair_descent_monotone_adjacent_dominoes():
    """Round-2 advisor counterexample: a w=1 chain with
    b=[2,-4,1.5,0] where the old 4-colouring let two OVERLAPPING
    horizontal dominoes fire in one colour step (an unevaluated triple
    flip that raised the energy 0.0 -> +0.5).  The orientation-specific
    8-colouring must be monotone from EVERY one of the 16 starting
    configurations (batched as B=16)."""
    import itertools

    import jax.numpy as jnp
    import numpy as np
    from lpbox_admm_tpu.ops.repair import pair_descent
    from lpbox_admm_tpu.ops.stencil import build_stencil, quad_form

    H, W = 1, 4
    B = 16
    w = np.zeros((B, 8, H, W), np.float32)
    for c in range(W - 1):                  # chain edges, weight 1
        w[:, 4, 0, c] = 1.0                 # east of (0, c)
        w[:, 3, 0, c + 1] = 1.0             # west of (0, c+1)
    st = build_stencil(jnp.asarray(w))
    b = jnp.asarray(
        np.tile(np.array([[2.0, -4.0, 1.5, 0.0]], np.float32)
                .reshape(1, H, W), (B, 1, 1)))
    mask = jnp.ones((B, H, W), bool)
    x0 = jnp.asarray(np.array(
        list(itertools.product([0.0, 1.0], repeat=4)),
        np.float32).reshape(B, H, W))

    def en(x):
        return np.asarray(quad_form(st, x) + jnp.sum(b * x, (-2, -1)))

    xp = pair_descent(st, b, mask, x0, sweeps=4)
    e0, ep = en(x0), en(xp)
    assert np.all(ep <= e0 + 1e-5), (e0, ep)


def test_seg_l2f_fix_values_override(seg_batch):
    """The label-floor override (l2f_solve fix_values): the policy
    keeps its confident selection but every fixed value equals the
    supplied labels -- zero fix errors by construction."""
    prob = seg_batch
    cfg = SEG_CONFIG
    # low confidence so even the untrained net decides confidently
    pcfg = PolicyConfig(net="mlp", node_size=5, chunk_dim=5,
                        window_mode="sliding", fix_confidence=0.55)
    model = build_policy("mlp")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 5, 5)),
                           train=True)
    labels = (jnp.arange(prob.grid[0] * prob.grid[1]).reshape(
        prob.grid) % 2).astype(jnp.float32)[None]
    labels = jnp.broadcast_to(labels, (prob.batch,) + prob.grid)
    state = l2f.l2f_solve(prob, model, variables, cfg, pcfg, ws=10,
                          max_iter=30, fix_values=labels)
    fixed = np.asarray(~state.free & prob.mask)
    fv = np.asarray(state.fixed_val)
    lb = np.asarray(labels)
    assert fixed.sum() > 0, "floor test needs some fixes"
    np.testing.assert_array_equal(fv[fixed], lb[fixed])
