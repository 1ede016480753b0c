"""Unit tests for projections, schedules, stats, CG, and Woodbury solve."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lpbox_admm_tpu.config import LP_CONFIG, SEG_CONFIG
from lpbox_admm_tpu.ops import cg as cg_ops
from lpbox_admm_tpu.ops import woodbury
from lpbox_admm_tpu.ops.projections import (project_box, project_nonneg,
                                            project_shifted_lp_ball)
from lpbox_admm_tpu.ops.schedule import gamma_at, rho_at
from lpbox_admm_tpu.ops.stats import rel_std_obj, dual_residuals


def test_project_box():
    x = jnp.array([[-0.5, 0.3, 1.7, 0.0, 1.0]])
    np.testing.assert_allclose(project_box(x),
                               [[0.0, 0.3, 1.0, 0.0, 1.0]])


def test_project_nonneg():
    x = jnp.array([[-2.0, 0.0, 3.0]])
    np.testing.assert_allclose(project_nonneg(x), [[0.0, 0.0, 3.0]])


def test_sphere_projection_formula(rng):
    # y = (x-0.5) * n^(1/p) / (2||x-0.5||) + 0.5 (LPboxADMMsolver.cpp:423-428)
    n = 64
    x = rng.rand(2, n).astype(np.float32)
    y = project_shifted_lp_ball(jnp.asarray(x), 2)
    shift = x - 0.5
    norm = np.linalg.norm(shift, axis=-1, keepdims=True)
    expected = shift * np.sqrt(n) / (2 * norm) + 0.5
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5)
    # the result lies on the sphere of radius sqrt(n)/2 around 0.5
    r = np.linalg.norm(np.asarray(y) - 0.5, axis=-1)
    np.testing.assert_allclose(r, np.sqrt(n) / 2, rtol=1e-5)


def test_sphere_projection_masked(rng):
    n = 16
    x = rng.rand(1, n).astype(np.float32)
    mask = jnp.asarray(np.arange(n) < 10)[None, :]
    y = project_shifted_lp_ball(jnp.asarray(x), 2, mask=mask)
    # masked-out entries pass through
    np.testing.assert_allclose(np.asarray(y)[0, 10:], x[0, 10:], rtol=1e-6)
    # active entries use the active count and active-only norm
    shift = np.where(np.arange(n) < 10, x[0] - 0.5, 0.0)
    norm = np.linalg.norm(shift)
    expected = shift[:10] * np.sqrt(10) / (2 * norm) + 0.5
    np.testing.assert_allclose(np.asarray(y)[0, :10], expected, rtol=1e-5)


def test_rho_gamma_schedule():
    cfg = LP_CONFIG
    # before first bump (iters 0..24): initial values
    assert float(rho_at(jnp.int32(0), cfg)) == pytest.approx(25.0)
    assert float(rho_at(jnp.int32(24), cfg)) == pytest.approx(25.0)
    # reference bumps at end of iter 24 => iter 25 uses rho*1.01
    assert float(rho_at(jnp.int32(25), cfg)) == pytest.approx(25.0 * 1.01)
    assert float(rho_at(jnp.int32(75), cfg)) == pytest.approx(
        25.0 * 1.01 ** 3)
    assert float(gamma_at(jnp.int32(0), cfg)) == pytest.approx(1.6)
    assert float(gamma_at(jnp.int32(25), cfg)) == pytest.approx(1.6 * 0.95)
    # gamma floors at 1.0
    assert float(gamma_at(jnp.int32(25 * 100), cfg)) == pytest.approx(1.0)
    # Seg caps rho at 1000
    assert float(rho_at(jnp.int32(10_000), SEG_CONFIG)) == pytest.approx(
        1000.0)


def test_rel_std_obj_matches_reference_semantics(rng):
    H = 10
    vals = rng.randn(H).astype(np.float32)
    ring = jnp.asarray(vals)[None, :]
    count = jnp.array([H], dtype=jnp.int32)
    out = rel_std_obj(ring, count, jnp.array([vals[-1]]))
    expected = np.std(vals, ddof=1) / abs(vals[-1])
    np.testing.assert_allclose(float(out[0]), expected, rtol=1e-5)
    # not enough history -> stays at 1 (reference init std_obj = 1)
    out2 = rel_std_obj(ring, jnp.array([H - 1], dtype=jnp.int32),
                       jnp.array([vals[-1]]))
    assert float(out2[0]) == 1.0


def test_dual_residuals_masked(rng):
    x = jnp.asarray(rng.rand(1, 8).astype(np.float32))
    y = x.at[0, 0].add(0.1)
    mask = jnp.asarray(np.arange(8) >= 1)[None, :]
    c1, _ = dual_residuals(x, y, x, mask)
    assert float(c1[0]) == pytest.approx(0.0, abs=1e-7)


def _random_spd_system(rng, B, n, m, rho4=25.0, c=50.0):
    E = rng.randn(B, m, n).astype(np.float32) * 0.3
    M = np.einsum("bmn,bmk->bnk", E, E) * rho4
    M += c * np.eye(n)[None]
    rhs = rng.randn(B, n).astype(np.float32)
    return E, M, rhs


def test_pcg_solves_spd_system(rng):
    B, n, m = 3, 40, 16
    E, M, rhs = _random_spd_system(rng, B, n, m)
    Mj = jnp.asarray(M)

    def matvec(p):
        return jnp.einsum("bnk,bk->bn", Mj, p)

    diag = jnp.asarray(np.stack([np.diag(M[i]) for i in range(B)]))
    res = cg_ops.pcg(matvec, jnp.asarray(rhs), jnp.zeros((B, n)), diag,
                     tol=1e-6, maxiters=500)
    expected = np.stack([np.linalg.solve(M[i], rhs[i]) for i in range(B)])
    np.testing.assert_allclose(np.asarray(res.x), expected, rtol=1e-3,
                               atol=1e-4)
    assert not bool(res.failed.any())


def test_pcg_inactive_rows_frozen(rng):
    B, n, m = 2, 20, 8
    E, M, rhs = _random_spd_system(rng, B, n, m)
    Mj = jnp.asarray(M)
    x0 = jnp.asarray(rng.randn(B, n).astype(np.float32))
    active = jnp.array([True, False])
    res = cg_ops.pcg(lambda p: jnp.einsum("bnk,bk->bn", Mj, p),
                     jnp.asarray(rhs), x0,
                     jnp.ones((B, n)), 1e-6, 500, active=active)
    np.testing.assert_allclose(np.asarray(res.x)[1], np.asarray(x0)[1])


def test_pcg_detects_indefinite(rng):
    B, n = 1, 8
    M = -np.eye(n, dtype=np.float32)[None]
    rhs = rng.randn(B, n).astype(np.float32)
    res = cg_ops.pcg(lambda p: jnp.einsum("bnk,bk->bn", jnp.asarray(M), p),
                     jnp.asarray(rhs), jnp.zeros((B, n)),
                     jnp.ones((B, n)), 1e-6, 50)
    assert bool(res.failed[0])


def test_woodbury_matches_dense_solve(rng):
    B, n, m = 2, 48, 12
    rho4, c = 25.0, 50.0
    E = rng.randn(B, m, n).astype(np.float32) * 0.5
    free = rng.rand(B, n) > 0.3
    rhs = (rng.randn(B, n) * free).astype(np.float32)

    factor = woodbury.factorize(jnp.asarray(E), jnp.asarray(free),
                                ratio=c / rho4)
    x = woodbury.solve(factor, jnp.asarray(E), jnp.asarray(free),
                       jnp.asarray(rhs), jnp.float32(c))
    for i in range(B):
        Ef = E[i] * free[i][None, :]
        M = c * np.eye(n) + rho4 * Ef.T @ Ef
        expected = np.linalg.solve(M, rhs[i])
        got = np.asarray(x[i])
        np.testing.assert_allclose(got[free[i]], expected[free[i]],
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(got[~free[i]], 0.0, atol=1e-6)
