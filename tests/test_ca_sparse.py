"""ops/ca_sparse.py: structure-aware CA sparse matvecs + solver parity."""

import numpy as np
import jax.numpy as jnp

from lpbox_admm_tpu.adapters import ca
from lpbox_admm_tpu.config import LP_CONFIG
from lpbox_admm_tpu.core import lp
from lpbox_admm_tpu.ops import ca_sparse, sparse


def _dense_from_coo(coo, m, n):
    D = np.zeros((m, n), np.float32)
    D[coo[0], coo[1]] = coo[2]
    return D


def _ca_coos(seed=0, B=3, n_items=20, n_bids=60):
    rng = np.random.RandomState(seed)
    insts = [ca.generate_cauction(rng, n_items=n_items, n_bids=n_bids,
                                  return_coo=True) for _ in range(B)]
    coos = [(r, c, v) for _, (r, c, v, _) in insts]
    shapes = [s for _, (_, _, _, s) in insts]
    return insts, coos, shapes


def test_detect_interval_suffix():
    # rows 0-1 generic; rows 2-4 disjoint ascending intervals
    rows = np.array([0, 0, 1, 1, 2, 2, 2, 3, 3, 4])
    cols = np.array([0, 5, 2, 3, 0, 1, 2, 3, 4, 6])
    assert ca_sparse.detect_interval_suffix(rows, cols, 5) == 2
    # overlap between suffix rows breaks the suffix
    rows2 = np.array([0, 1, 1, 2, 2])
    cols2 = np.array([0, 1, 2, 2, 3])        # row 2 starts inside row 1
    assert ca_sparse.detect_interval_suffix(rows2, cols2, 3) == 2
    # a pure ascending interval matrix is all suffix
    rows3 = np.array([0, 0, 1, 1, 1])
    cols3 = np.array([0, 1, 2, 3, 4])
    assert ca_sparse.detect_interval_suffix(rows3, cols3, 2) == 0
    # descending starts violate the ascending requirement (CA dummies
    # always ascend with the bid index): only the last row qualifies
    rows4 = np.array([0, 0, 1, 1, 1])
    cols4 = np.array([3, 4, 0, 1, 2])
    assert ca_sparse.detect_interval_suffix(rows4, cols4, 2) == 1


def test_struct_matvecs_match_dense():
    insts, coos, shapes = _ca_coos()
    n = 64
    for cap, exact in ((2, False), (4, False), (32, False), (4, True)):
        S, row_maps = ca_sparse.build(coos, shapes, n, width_cap=cap,
                                      td=32, align=128, exact=exact)
        B, m, _ = S.shape
        D = np.zeros((B, m, n), np.float32)
        for b, (coo, (mi, ni)) in enumerate(zip(coos, shapes)):
            Db = _dense_from_coo(coo, mi, ni)
            D[b][row_maps[b], :ni] = Db
        rng = np.random.RandomState(1)
        v = rng.randn(B, n).astype(np.float32)
        w = rng.randn(B, m).astype(np.float32)
        np.testing.assert_allclose(np.asarray(S.mv(jnp.asarray(v))),
                                   np.einsum("bmn,bn->bm", D, v),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(S.mtv(jnp.asarray(w))),
                                   np.einsum("bmn,bm->bn", D, w),
                                   rtol=1e-5, atol=1e-5)
        Vk = rng.randn(B, 3, n).astype(np.float32)
        Wk = rng.randn(B, 2, m).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(sparse.mv_many(S, jnp.asarray(Vk))),
            np.einsum("bmn,bkn->bkm", D, Vk), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sparse.mtv_many(S, jnp.asarray(Wk))),
            np.einsum("bmn,bkm->bkn", D, Wk), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sparse.colsq(S)), (D ** 2).sum(axis=1),
            rtol=1e-5, atol=1e-6)
        assert sparse.is_sparse(S)


def _host_gram_ginv(coos, shapes, row_maps, m, n, ratio=2.0):
    import scipy.sparse as sp
    from scipy.linalg import cho_factor, cho_solve

    B = len(coos)
    ginv = np.zeros((B, m, m), np.float32)
    for i, ((r, c, v), (mi, ni)) in enumerate(zip(coos, shapes)):
        C = sp.csr_matrix(
            (np.asarray(v, np.float64), (row_maps[i][r], c)),
            shape=(m, n))
        G = (C @ C.T).toarray() + ratio * np.eye(m)
        ginv[i] = cho_solve(cho_factor(G, lower=True),
                            np.eye(m)).astype(np.float32)
    return ginv


def test_struct_solve_matches_dense():
    """Full woodbury solve through CaStructE (host ginv, struct row
    layout) converges to the dense path's objectives."""
    insts, coos, shapes = _ca_coos(seed=7, B=3)
    sprob, row_maps = ca.make_struct_problem(insts)
    dprob = ca.make_problem(
        [(p, _dense_from_coo(coo, *s))
         for (p, _), coo, s in zip(insts, coos, shapes)])
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    ginv = _host_gram_ginv(coos, shapes, row_maps, sprob.m, sprob.n)

    dst = lp.solve(dprob, cfg, window=100, max_iters=12000)
    sst = lp.init_state(sprob, cfg, ginv=jnp.asarray(ginv))
    it = 0
    while it < 12000:
        sst, _ = lp.solve_window(sst, sprob, cfg, 500, record=False,
                                 skip_cvg_at=0 if it == 0 else None)
        it = int(sst.it)
        if bool(np.asarray(sst.done).all()):
            break
    dobj = np.asarray(lp.objective(dst))
    sobj = np.asarray(lp.objective(sst))
    assert np.all(np.asarray(lp.infeasible_rows(sst, sprob)) == 0)
    # chaotic trajectories: converged objectives agree to a few %
    assert abs(sobj.mean() - dobj.mean()) / (abs(dobj.mean()) + 1.0) \
        < 0.05, (sobj, dobj)


def test_mxu_two_stage_paths_match_direct(monkeypatch):
    """Matrices at m <= SMALL_M_DIRECT route to the direct one-hot
    form, so the two-stage (hi-tile + lane-select) path -- the one the
    LARGE-m rungs use -- needs explicit coverage: force it by patching
    the threshold and compare against the direct path."""
    from lpbox_admm_tpu.ops import mxu_sparse

    insts, coos, shapes = _ca_coos(seed=2, B=2)
    S, _ = ca_sparse.build(coos, shapes, 64, width_cap=4, td=32)
    item = S.item
    rng = np.random.RandomState(0)
    Vk = jnp.asarray(rng.randn(2, 3, item.n).astype(np.float32))
    Wk = jnp.asarray(rng.randn(2, 2, item.m).astype(np.float32))
    for exact in (False, True):
        # mv routes two-stage at every m (the direct scatter measured
        # slower on chip, r4f); call the direct form explicitly so
        # both scatter forms stay parity-covered
        direct_mv = np.asarray(mxu_sparse._direct_mv_many(
            item, Vk, None, exact))
        direct_mtv = np.asarray(mxu_sparse.mtv_many(item, Wk,
                                                    exact=exact))
        monkeypatch.setattr(mxu_sparse, "SMALL_M_DIRECT", 0)
        # distinct chunk: same (shape, static) as the direct call would
        # HIT ITS JIT CACHE and never trace the two-stage path
        two_mv = np.asarray(mxu_sparse.mv_many(item, Vk, chunk=64,
                                               lo_width=16, exact=exact))
        two_mtv = np.asarray(mxu_sparse.mtv_many(item, Wk, chunk=64,
                                                 exact=exact))
        monkeypatch.undo()
        np.testing.assert_allclose(two_mv, direct_mv, rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(two_mtv, direct_mtv, rtol=1e-5,
                                   atol=1e-5)


def test_limbs3_reconstructs_f32_exactly():
    """3 bf16 limbs carry 24 explicit mantissa bits -- reconstruction
    must be BIT-exact for f32 inputs.  The rounding goes through
    lax.reduce_precision: the astype(bf16).astype(f32) formulation was
    folded to identity by the XLA TPU pipeline, silently degrading the
    split to one limb (1.7e-3 on-chip matvec error, diag r4c)."""
    from lpbox_admm_tpu.ops.mxu_sparse import _limbs3

    rng = np.random.RandomState(0)
    x = (rng.randn(4096).astype(np.float32)
         * np.logspace(-6, 6, 4096).astype(np.float32))
    L = np.asarray(_limbs3(jnp.asarray(x)), np.float64)
    np.testing.assert_array_equal(L.sum(-1).astype(np.float32), x)
    # all three limbs must actually carry information (fold regression)
    assert np.count_nonzero(L[:, 1]) > 3500
    assert np.count_nonzero(L[:, 2]) > 3000


def test_struct_ginv_matches_dense_inverse():
    """Schur block elimination (ops/struct_ginv) applies exactly the
    same inverse as the dense host LAPACK ginv."""
    from lpbox_admm_tpu.ops.struct_ginv import build_struct_ginv

    insts, coos, shapes = _ca_coos(seed=3, B=2)
    sprob, row_maps = ca.make_struct_problem(insts)
    E = sprob.E
    dense = _host_gram_ginv(coos, shapes, row_maps, sprob.m, sprob.n)
    sg = build_struct_ginv(coos, shapes, row_maps, E.m1, E.m2,
                           sprob.n, ratio=2.0)
    rng = np.random.RandomState(0)
    r = rng.randn(2, sprob.m).astype(np.float32)
    z_dense = np.einsum("bmk,bk->bm", dense, r)
    z_schur = np.asarray(sg.apply(jnp.asarray(r)))
    np.testing.assert_allclose(z_schur, z_dense, rtol=2e-4, atol=2e-5)


def test_struct_solve_with_schur_ginv():
    """Full solve through StructGinv tracks the dense-ginv struct solve
    pointwise over the first window and matches converged objectives
    (same algebra, different evaluation order)."""
    from lpbox_admm_tpu.ops.struct_ginv import build_struct_ginv

    insts, coos, shapes = _ca_coos(seed=5, B=2)
    sprob, row_maps = ca.make_struct_problem(insts)
    E = sprob.E
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    dense = _host_gram_ginv(coos, shapes, row_maps, sprob.m, sprob.n)
    sg = build_struct_ginv(coos, shapes, row_maps, E.m1, E.m2,
                           sprob.n, ratio=2.0)

    st_d = lp.init_state(sprob, cfg, ginv=jnp.asarray(dense))
    st_s = lp.init_state(sprob, cfg, ginv=sg)
    st_d, _ = lp.solve_window(st_d, sprob, cfg, 20, record=False,
                              skip_cvg_at=0)
    st_s, _ = lp.solve_window(st_s, sprob, cfg, 20, record=False,
                              skip_cvg_at=0)
    np.testing.assert_allclose(np.asarray(st_s.x), np.asarray(st_d.x),
                               rtol=5e-3, atol=5e-3)

    # blocked dispatch slices the structured pytree correctly (block=1)
    st_b, _ = lp.solve_blocked(sprob, cfg, block=1, window=500,
                               max_iters=6000, ginv=sg)
    obj_b = np.asarray(lp.objective(st_b))
    assert np.all(np.isfinite(obj_b))
    it = 20
    while it < 6000 and not bool(np.asarray(st_s.done).all()):
        st_s, _ = lp.solve_window(st_s, sprob, cfg, 500, record=False)
        it = int(st_s.it)
    obj_s = np.asarray(lp.objective(st_s))
    assert abs(obj_b.mean() - obj_s.mean()) \
        / (abs(obj_s.mean()) + 1.0) < 0.05, (obj_b, obj_s)


def test_struct_refactorize_masked_inverse_exact():
    """build_struct_ginv(free=...) must equal the dense inverse of
    ``ratio I + C_free C_free^T`` -- the algebra behind host-side
    early-fix refactorization on the struct path."""
    from lpbox_admm_tpu.ops.struct_ginv import build_struct_ginv

    insts, coos, shapes = _ca_coos(seed=9, B=2)
    sprob, row_maps = ca.make_struct_problem(insts)
    E = sprob.E
    rng = np.random.RandomState(3)
    free = rng.rand(2, sprob.n) > 0.4          # arbitrary fix pattern
    sg = build_struct_ginv(coos, shapes, row_maps, E.m1, E.m2,
                           sprob.n, ratio=2.0, free=free)
    masked = [(r, c, v * free[b][c]) for b, (r, c, v)
              in enumerate(coos)]
    dense = _host_gram_ginv(masked, shapes, row_maps, sprob.m, sprob.n)
    r = rng.randn(2, sprob.m).astype(np.float32)
    np.testing.assert_allclose(np.asarray(sg.apply(jnp.asarray(r))),
                               np.einsum("bmk,bk->bm", dense, r),
                               rtol=2e-4, atol=2e-5)


def test_struct_apply_fix_host_refactorize_mechanics():
    """apply_fix(ginv=StructGinv) merges the caller's refactorized
    inverse per the per-instance skip decision, the host decision
    mirror matches the device mask, and the post-fix solve stays
    finite and feasible."""
    from lpbox_admm_tpu.ops.struct_ginv import build_struct_ginv

    insts, coos, shapes = _ca_coos(seed=9, B=2)
    sprob, row_maps = ca.make_struct_problem(insts)
    E = sprob.E
    cfg = LP_CONFIG.replace(linsolve="woodbury", min_fix=0)
    sg = build_struct_ginv(coos, shapes, row_maps, E.m1, E.m2,
                           sprob.n, ratio=2.0)
    st = lp.init_state(sprob, cfg, ginv=sg)
    st, _ = lp.solve_window(st, sprob, cfg, 300, record=False,
                            skip_cvg_at=0)
    # force a fix round: fix every variable whose iterate is extreme
    x = np.asarray(st.x)
    vec = np.where(x > 0.95, 1.0, np.where(x < 0.05, 0.0, -1.0)
                   ).astype(np.float32)
    vec = np.where(np.asarray(sprob.var_mask), vec, -1.0)
    do, new_free = lp.fix_decision_host(st, vec, cfg)
    assert do.any(), "fixture must fix something"
    sg2 = build_struct_ginv(coos, shapes, row_maps, E.m1, E.m2,
                            sprob.n, ratio=2.0, free=new_free)
    st = lp.apply_fix(st, sprob, jnp.asarray(vec), cfg, ginv=sg2)
    np.testing.assert_array_equal(np.asarray(st.free), new_free)
    # merged ginv leaves: instances that fixed carry sg2's blocks
    for new, merged in zip(sg2, st.ginv):
        got = np.asarray(merged)[do]
        np.testing.assert_array_equal(got, np.asarray(new)[do])
    it = int(st.it)
    while it < 6000 and not bool(np.asarray(st.done).all()):
        st, _ = lp.solve_window(st, sprob, cfg, 500, record=False)
        it = int(st.it)
    _, obj, infeas = lp.select_solution(sprob, lp.solution(st),
                                        lp.solution_best(st))
    assert np.all(np.isfinite(np.asarray(obj)))
    assert int(np.asarray(infeas).sum()) == 0


def test_struct_first_window_matches_dense_pointwise():
    """Before chaos sets in (20 iterations) the struct matvec path must
    track the dense x iterates pointwise -- catches any layout or
    precision bug that objective-level parity would blur."""
    insts, coos, shapes = _ca_coos(seed=11, B=2)
    sprob, row_maps = ca.make_struct_problem(insts)
    dprob = ca.make_problem(
        [(p, _dense_from_coo(coo, *s))
         for (p, _), coo, s in zip(insts, coos, shapes)])
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    ginv = _host_gram_ginv(coos, shapes, row_maps, sprob.m, sprob.n)
    sst = lp.init_state(sprob, cfg, ginv=jnp.asarray(ginv))
    dst = lp.init_state(dprob, cfg)
    sst, _ = lp.solve_window(sst, sprob, cfg, 20, record=False,
                             skip_cvg_at=0)
    dst, _ = lp.solve_window(dst, dprob, cfg, 20, record=False,
                             skip_cvg_at=0)
    n = min(sprob.n, dprob.n)
    np.testing.assert_allclose(np.asarray(sst.x)[:, :n],
                               np.asarray(dst.x)[:, :n],
                               rtol=5e-3, atol=5e-3)
