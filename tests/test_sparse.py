"""ops/sparse.py: ELL layout vs dense reference on random batches."""

import numpy as np
import jax.numpy as jnp

from lpbox_admm_tpu.ops import sparse


def _random_coo(rng, m, n, density=0.15):
    mask = rng.rand(m, n) < density
    rows, cols = np.nonzero(mask)
    vals = rng.randn(len(rows)).astype(np.float32)
    return rows, cols, vals


def _dense_of(coo, m, n):
    D = np.zeros((m, n), np.float32)
    D[coo[0], coo[1]] = coo[2]
    return D


def test_mv_mtv_match_dense():
    rng = np.random.RandomState(0)
    B, m, n = 3, 7, 13
    coos = [_random_coo(rng, m, n) for _ in range(B)]
    D = np.stack([_dense_of(c, m, n) for c in coos])
    S = sparse.from_coo(coos, (m, n))
    v = rng.randn(B, n).astype(np.float32)
    w = rng.randn(B, m).astype(np.float32)
    np.testing.assert_allclose(np.asarray(sparse.mv(S, jnp.asarray(v))),
                               np.einsum("bmn,bn->bm", D, v),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sparse.mtv(S, jnp.asarray(w))),
                               np.einsum("bmn,bm->bn", D, w),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sparse.to_dense(S)), D,
                               rtol=1e-6, atol=1e-6)


def test_from_dense_roundtrip():
    rng = np.random.RandomState(1)
    D = rng.randn(2, 5, 9).astype(np.float32)
    D[np.abs(D) < 0.8] = 0.0
    S = sparse.from_dense(D)
    np.testing.assert_allclose(np.asarray(sparse.to_dense(S)), D,
                               rtol=1e-6, atol=1e-6)


def test_colsq_rowsq_diag():
    rng = np.random.RandomState(2)
    B, nsq = 2, 8
    coos = [_random_coo(rng, nsq, nsq, 0.3) for _ in range(B)]
    D = np.stack([_dense_of(c, nsq, nsq) for c in coos])
    S = sparse.from_coo(coos, (nsq, nsq))
    np.testing.assert_allclose(np.asarray(sparse.colsq(S)),
                               (D ** 2).sum(axis=1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sparse.rowsq(S)),
                               (D ** 2).sum(axis=2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sparse.diag(S)),
                               np.stack([np.diag(D[b]) for b in range(B)]),
                               rtol=1e-6, atol=1e-6)


def test_gram_masked():
    rng = np.random.RandomState(3)
    B, m, n = 2, 6, 11
    coos = [_random_coo(rng, m, n, 0.25) for _ in range(B)]
    D = np.stack([_dense_of(c, m, n) for c in coos])
    S = sparse.from_coo(coos, (m, n))
    free = rng.rand(B, n) > 0.3
    Df = D * free[:, None, :]
    want = np.einsum("bmn,bkn->bmk", Df, Df)
    got = np.asarray(sparse.gram(S, jnp.asarray(free)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    got_unmasked = np.asarray(sparse.gram(S))
    np.testing.assert_allclose(got_unmasked,
                               np.einsum("bmn,bkn->bmk", D, D),
                               rtol=1e-4, atol=1e-5)


def test_lp_sparse_matches_dense_woodbury():
    """core/lp with SparseEll E computes the SAME iteration as the
    dense path: pointwise x agreement over a short window (before
    chaotic divergence sets in, CLAUDE.md), batch-mean converged
    objective within a few %, and feasibility.  Exercises the sparse
    Gram Woodbury factorization."""
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp

    rng = np.random.RandomState(11)
    insts = [ca.generate_cauction(rng, n_items=20, n_bids=60)
             for _ in range(6)]
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    dprob = ca.make_problem(insts)
    sprob = ca.make_sparse_problem(insts)
    # pointwise: 20 iterations, identical math modulo summation order
    dst = lp.init_state(dprob, cfg)
    sst = lp.init_state(sprob, cfg)
    dst, _ = lp.solve_window(dst, dprob, cfg, 20, record=False)
    sst, _ = lp.solve_window(sst, sprob, cfg, 20, record=False)
    np.testing.assert_allclose(np.asarray(sst.x), np.asarray(dst.x),
                               rtol=2e-3, atol=2e-3)
    # converged: mean objective parity (per-instance roundings are
    # chaotic; individual instances legitimately land on different
    # local solutions)
    dst = lp.solve(dprob, cfg, window=100)
    sst = lp.solve(sprob, cfg, window=100)
    dobj = np.asarray(lp.objective(dst))
    sobj = np.asarray(lp.objective(sst))
    assert np.all(np.asarray(lp.infeasible_rows(sst, sprob)) == 0)
    assert abs(sobj.mean() - dobj.mean()) / (abs(dobj.mean()) + 1.0) \
        < 0.05, (sobj, dobj)


def test_lp_sparse_matches_dense_cg():
    """Same through the CG path (the sparse matvec closure)."""
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp

    rng = np.random.RandomState(12)
    insts = [ca.generate_cauction(rng, n_items=20, n_bids=60)
             for _ in range(4)]
    cfg = LP_CONFIG.replace(linsolve="cg")
    dprob = ca.make_problem(insts)
    sprob = ca.make_sparse_problem(insts)
    dst = lp.init_state(dprob, cfg)
    sst = lp.init_state(sprob, cfg)
    dst, _ = lp.solve_window(dst, dprob, cfg, 20, record=False)
    sst, _ = lp.solve_window(sst, sprob, cfg, 20, record=False)
    # tolerance admits dot-reassociation between the matvec routes
    # (gather vs MXU one-hot, LPBOX_SPARSE) amplified through 20
    # CG-in-ADMM iterations
    np.testing.assert_allclose(np.asarray(sst.x), np.asarray(dst.x),
                               rtol=5e-3, atol=5e-3)
    dst = lp.solve(dprob, cfg, window=100, max_iters=12000)
    sst = lp.solve(sprob, cfg, window=100, max_iters=12000)
    dobj = np.asarray(lp.objective(dst))
    sobj = np.asarray(lp.objective(sst))
    assert np.all(np.asarray(lp.infeasible_rows(sst, sprob)) == 0)
    assert abs(sobj.mean() - dobj.mean()) / (abs(dobj.mean()) + 1.0) \
        < 0.05, (sobj, dobj)


def test_lp_sparse_apply_fix():
    """apply_fix folds fixed columns into f_eff identically through the
    sparse matvec; select_solution (no repair) works on sparse E."""
    import jax.numpy as jnp
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp

    rng = np.random.RandomState(13)
    insts = [ca.generate_cauction(rng, n_items=20, n_bids=60)
             for _ in range(2)]
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    dprob = ca.make_problem(insts)
    sprob = ca.make_sparse_problem(insts)
    dst = lp.init_state(dprob, cfg)
    sst = lp.init_state(sprob, cfg)
    dst, _ = lp.solve_window(dst, dprob, cfg, 50, record=False)
    sst, _ = lp.solve_window(sst, sprob, cfg, 50, record=False)
    n = dprob.n
    vec = np.full((2, n), -1.0, np.float32)
    vec[:, :10] = 0.0
    vec[:, 3] = 1.0
    dst2 = lp.apply_fix(dst, dprob, jnp.asarray(vec), cfg, min_fix=0)
    sst2 = lp.apply_fix(sst, sprob, jnp.asarray(vec), cfg, min_fix=0)
    np.testing.assert_allclose(np.asarray(sst2.f_eff),
                               np.asarray(dst2.f_eff),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sst2.sum_fix_obj),
                               np.asarray(dst2.sum_fix_obj),
                               rtol=1e-5, atol=1e-5)
    # finish the solve; select without repair works on sparse
    sst2, _ = lp.solve_window(sst2, sprob, cfg, 3000, record=False)
    sol, obj, inf = lp.select_solution(
        sprob, lp.solution(sst2), lp.solution_best(sst2))
    assert np.all(np.asarray(inf) == 0)


def test_empty_block():
    S = sparse.empty(2, 0, 5)
    out = sparse.mv(S, jnp.ones((2, 5)))
    assert out.shape == (2, 0)
    out_t = sparse.mtv(S, jnp.zeros((2, 0)))
    np.testing.assert_array_equal(np.asarray(out_t), np.zeros((2, 5)))


def test_coo_generator_matches_dense():
    """generate_cauction(return_coo=True) produces the same instance as
    the dense path (same RNG stream), and make_sparse_problem accepts
    both forms in one batch."""
    import jax.numpy as jnp
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp

    p1, C = ca.generate_cauction(np.random.RandomState(5), 20, 60)
    p2, coo = ca.generate_cauction(np.random.RandomState(5), 20, 60,
                                   return_coo=True)
    np.testing.assert_allclose(p1, p2)
    r, c, v, shape = coo
    D = np.zeros(shape)
    D[r, c] = v
    np.testing.assert_allclose(D, C)
    prob = ca.make_sparse_problem([(p1, C), (p2, coo)])
    st = lp.solve(prob, LP_CONFIG.replace(linsolve="woodbury"),
                  window=100, max_iters=3000)
    obj = np.asarray(lp.objective(st))
    # identical instances -> identical objectives
    assert obj[0] == obj[1]

def test_lp_dense_bf16_storage_matches_cast_path():
    """A problem STORED with bf16 E (adapters.ca.make_dense_bf16_problem,
    the very-large-rung layout that never materializes f32 E) runs the
    identical iteration as the f32-stored problem under
    matvec_dtype='bfloat16' (which casts the same 0/1 values to the
    same bf16 bits): pointwise x agreement over a short window, and
    the bf16-input Gram factorization (core/lp._E32 passthrough +
    woodbury.factorize native-precision branch) is exact for 0/1 E."""
    import jax.numpy as jnp
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.ops import woodbury

    rng = np.random.RandomState(13)
    insts = [ca.generate_cauction(rng, n_items=20, n_bids=60)
             for _ in range(4)]
    cfg = LP_CONFIG.replace(linsolve="woodbury",
                            matvec_dtype="bfloat16")
    fprob = ca.make_problem(insts)
    bprob = ca.make_dense_bf16_problem(insts)
    assert bprob.E.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(bprob.E, np.float32), np.asarray(fprob.E))
    np.testing.assert_array_equal(np.asarray(bprob.var_mask),
                                  np.asarray(fprob.var_mask))
    # Gram from bf16 E == Gram from f32 E (0/1 entries, f32 accumulate)
    free = jnp.asarray(np.asarray(fprob.var_mask))
    gf = woodbury.factorize(fprob.E, free, 2.0)
    gb = woodbury.factorize(bprob.E, free, 2.0)
    np.testing.assert_allclose(np.asarray(gb.ginv), np.asarray(gf.ginv),
                               rtol=1e-5, atol=1e-6)
    # identical short-window trajectories (same bf16 bits streamed)
    fst = lp.init_state(fprob, cfg)
    bst = lp.init_state(bprob, cfg)
    fst, _ = lp.solve_window(fst, fprob, cfg, 20, record=False)
    bst, _ = lp.solve_window(bst, bprob, cfg, 20, record=False)
    np.testing.assert_allclose(np.asarray(bst.x), np.asarray(fst.x),
                               rtol=2e-3, atol=2e-3)


def test_make_dense_bf16_problem_from_coo():
    """COO-tuple instances (the >20k-bid generator output) assemble the
    same device matrix as the dense-array form."""
    from lpbox_admm_tpu.adapters import ca

    rng = np.random.RandomState(17)
    p1, C1 = ca.generate_cauction(rng, n_items=15, n_bids=40)
    rows, cols = np.nonzero(C1)
    coo_inst = (p1, (rows.astype(np.int64), cols.astype(np.int64),
                     C1[rows, cols].astype(np.float32), C1.shape))
    a = ca.make_dense_bf16_problem([(p1, C1)])
    b = ca.make_dense_bf16_problem([coo_inst])
    np.testing.assert_array_equal(np.asarray(a.E, np.float32),
                                  np.asarray(b.E, np.float32))
    np.testing.assert_array_equal(np.asarray(a.b), np.asarray(b.b))


# --------------------------------------------------------------------------
# ops/mxu_sparse.py: the MXU one-hot matvec route (TPU default; runs
# anywhere -- it is plain XLA)
# --------------------------------------------------------------------------

def test_mxu_matvecs_match_gather_and_dense():
    from lpbox_admm_tpu.ops import mxu_sparse
    rng = np.random.RandomState(5)
    # shapes straddle the 128-lane tile boundary and force multi-chunk
    # scans (chunk < n*Kc); duplicate row indices per column exercise
    # the scatter accumulation
    for B, m, n, density, chunk in ((2, 7, 13, 0.4, 4096),
                                    (3, 128, 96, 0.15, 128),
                                    (1, 200, 300, 0.05, 256),
                                    (2, 260, 128, 0.10, 4096)):
        coos = [_random_coo(rng, m, n, density) for _ in range(B)]
        D = np.stack([_dense_of(c, m, n) for c in coos])
        S = sparse.from_coo(coos, (m, n))
        v = rng.randn(B, n).astype(np.float32)
        w = rng.randn(B, m).astype(np.float32)
        got_mv = np.asarray(mxu_sparse.mv(S, jnp.asarray(v), chunk=chunk))
        got_mtv = np.asarray(mxu_sparse.mtv(S, jnp.asarray(w),
                                            chunk=chunk))
        np.testing.assert_allclose(got_mv, np.einsum("bmn,bn->bm", D, v),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got_mtv, np.einsum("bmn,bm->bn", D, w),
                                   rtol=1e-5, atol=1e-5)
        # the gather route computes the same numbers
        np.testing.assert_allclose(got_mv, np.asarray(
            sparse.mv(S, jnp.asarray(v))), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got_mtv, np.asarray(
            sparse.mtv(S, jnp.asarray(w))), rtol=1e-5, atol=1e-5)


def test_mxu_gather_is_exact():
    """A one-hot gather dot has a single nonzero term per limb, and the
    3 bf16 limbs reconstruct f32 to ~24 mantissa bits: mtv must
    reproduce u[idx] to f32-equivalence (sub-ulp-scale error only) --
    the solver trajectories are chaotic, so a consistently perturbed
    operator converges somewhere else (the bf16-G^-1 lesson, STATUS
    r3); the limb construction is the same one core/lp._emv uses for
    the dense bf16 path."""
    from lpbox_admm_tpu.ops import mxu_sparse
    rng = np.random.RandomState(6)
    B, m, n = 2, 300, 150
    # one nnz per column with val 1.0 -> mtv(w) == w[idx] exactly
    cols = np.arange(n)
    coos = []
    idxs = []
    for _ in range(B):
        ridx = rng.randint(0, m, n)
        idxs.append(ridx)
        coos.append((ridx, cols, np.ones(n, np.float32)))
    S = sparse.from_coo(coos, (m, n))
    w = (rng.randn(B, m) * 1e3).astype(np.float32)
    got = np.asarray(mxu_sparse.mtv(S, jnp.asarray(w), chunk=64))
    want = np.stack([w[b][idxs[b]] for b in range(B)])
    np.testing.assert_allclose(got, want, rtol=3e-7, atol=0)


def test_mxu_many_and_lo_width():
    """Stacked mv_many/mtv_many (shared one-hot) and the small-m
    lo_width scatter variant agree with per-vector results."""
    from lpbox_admm_tpu.ops import mxu_sparse
    rng = np.random.RandomState(9)
    B, m, n, k = 2, 200, 260, 3
    coos = [_random_coo(rng, m, n, 0.08) for _ in range(B)]
    D = np.stack([_dense_of(c, m, n) for c in coos])
    S = sparse.from_coo(coos, (m, n))
    V = rng.randn(B, k, n).astype(np.float32)
    W = rng.randn(B, k, m).astype(np.float32)
    want_mv = np.einsum("bmn,bkn->bkm", D, V)
    want_mtv = np.einsum("bmn,bkm->bkn", D, W)
    np.testing.assert_allclose(
        np.asarray(mxu_sparse.mv_many(S, jnp.asarray(V), chunk=512)),
        want_mv, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mxu_sparse.mtv_many(S, jnp.asarray(W), chunk=512)),
        want_mtv, rtol=1e-5, atol=1e-5)
    for lw in (16, 32):
        np.testing.assert_allclose(
            np.asarray(mxu_sparse.mv_many(S, jnp.asarray(V), chunk=512,
                                          lo_width=lw)),
            want_mv, rtol=1e-5, atol=1e-5)


def test_sparse_route_env_override(monkeypatch):
    monkeypatch.setenv("LPBOX_SPARSE", "mxu")
    assert sparse._mxu_route()
    monkeypatch.setenv("LPBOX_SPARSE", "gather")
    assert not sparse._mxu_route()
    monkeypatch.delenv("LPBOX_SPARSE")
    import jax
    assert sparse._mxu_route() == (jax.default_backend() != "cpu")
