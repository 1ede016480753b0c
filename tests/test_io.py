"""Tests for observability IO and the native C++ runtime."""

import numpy as np
import pytest

from lpbox_admm_tpu.utils import io as uio


def test_allres_roundtrip(tmp_path):
    path = str(tmp_path / "allres.csv")
    uio.append_allres(path, 1, -1316.05, 7100, 1.23)
    uio.append_allres(path, 2, -1562.63, 165, 0.08)
    info = uio.read_allres(path)
    assert len(info) == 2
    # stored as [idx, -obj, iters, time] (positive auction revenue)
    assert info[0][0] == 1 and abs(info[0][1] - 1316.05) < 1e-6
    assert info[1][2] == 165


def test_xiter_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    traj = rng.rand(7, 13)
    path = str(tmp_path / "x.csv")
    uio.write_xiter_csv(path, traj)
    back = uio.read_xiter_csv(path)
    np.testing.assert_allclose(back, traj, atol=1e-6)
    with open(path) as f:
        first = f.readline()
    assert first.startswith("Iter1,")


def test_native_io_build_and_parity(tmp_path):
    """The C++ runtime builds and agrees with the Python parsers."""
    native = pytest.importorskip("lpbox_admm_tpu.runtime.io")
    rng = np.random.RandomState(1)
    # dense vec
    vec = rng.randn(50)
    vp = str(tmp_path / "v.txt")
    with open(vp, "w") as f:
        for v in vec:
            f.write(f"{v}\n")
    got = native.read_dense_vec(vp)
    np.testing.assert_allclose(got, vec, atol=1e-6)
    # coo
    cp = str(tmp_path / "c.txt")
    rows = rng.randint(1, 20, 100)
    cols = rng.randint(1, 30, 100)
    vals = rng.rand(100)
    with open(cp, "w") as f:
        for r, c, v in zip(rows, cols, vals):
            f.write(f"{r},{c},{v}\n")
    r2, c2, v2 = native.read_coo(cp)
    np.testing.assert_array_equal(r2, rows)
    np.testing.assert_array_equal(c2, cols)
    np.testing.assert_allclose(v2, vals, atol=1e-6)
    # xiter writer parity with the python reader
    traj = rng.rand(5, 9)
    xp = str(tmp_path / "x.csv")
    native.write_xiter(xp, traj, start_iter=3)
    back = uio.read_xiter_csv(xp)
    np.testing.assert_allclose(back, traj, atol=1e-6)
    with open(xp) as f:
        assert f.readline().startswith("Iter4,")


def test_solver_log(tmp_path):
    path = str(tmp_path / "log.txt")
    with uio.SolverLog(path) as log:
        log.iteration(1, x_sol=1.234, y1=0.5)
        log.message("Stop because y1_y2")
    text = open(path).read()
    assert "Iteration: 1" in text
    assert "norm of x_sol" in text
    assert "Stop because y1_y2" in text


def test_solver_state_checkpoint_resume(tmp_path):
    """Interrupt a batched solve, checkpoint the state pytree, restore,
    resume: identical to the uninterrupted solve."""
    import jax.numpy as jnp
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.utils.checkpoint import (load_meta, load_pytree,
                                                 save_pytree)

    rng = np.random.RandomState(2)
    prob = ca.make_problem([ca.generate_cauction(rng, 10, 30)
                            for _ in range(2)])
    cfg = LP_CONFIG.replace(linsolve="woodbury")

    st = lp.init_state(prob, cfg)
    st, _ = lp.solve_window(st, prob, cfg, 40, record=False)
    path = str(tmp_path / "solver_state.ckpt")
    save_pytree(path, st, meta={"it": int(st.it)})
    assert load_meta(path)["it"] == 40

    st2 = load_pytree(path, lp.init_state(prob, cfg))
    assert int(st2.it) == 40
    a, _ = lp.solve_window(st, prob, cfg, 40, record=False)
    b, _ = lp.solve_window(st2, prob, cfg, 40, record=False)
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x))
    np.testing.assert_allclose(np.asarray(lp.objective(a)),
                               np.asarray(lp.objective(b)))


def test_checkpoint_shape_mismatch_error(tmp_path):
    """Loading a checkpoint into a differently-shaped example must fail
    at load time with a descriptive error naming the leaf (round-2
    ADVICE), not later with an opaque shape error."""
    import jax.numpy as jnp
    import pytest
    from lpbox_admm_tpu.utils.checkpoint import load_pytree, save_pytree

    tree = {"a": np.zeros((3, 4), np.float32), "b": np.arange(5)}
    path = str(tmp_path / "t.ckpt")
    save_pytree(path, tree)
    bad_shape = {"a": np.zeros((3, 5), np.float32), "b": np.arange(5)}
    with pytest.raises(ValueError, match="leaf 0"):
        load_pytree(path, bad_shape)
    bad_dtype = {"a": np.zeros((3, 4), np.float64), "b": np.arange(5)}
    with pytest.raises(ValueError, match="dtype"):
        load_pytree(path, bad_dtype)
    ok = load_pytree(path, {"a": np.ones((3, 4), np.float32),
                            "b": np.zeros(5, np.int64)})
    np.testing.assert_array_equal(ok["a"], tree["a"])


def test_phase_timer():
    import time as _t

    import jax.numpy as jnp

    from lpbox_admm_tpu.utils.profiling import PhaseTimer, perturb

    with PhaseTimer() as t:
        with t.phase("a"):
            _t.sleep(0.01)
            t.sync(jnp.ones((4,)))
        with t.phase("a"):
            _t.sleep(0.01)
    assert t.counts["a"] == 2
    assert t.totals["a"] >= 0.02
    assert "a" in t.report() and "TOTAL" in t.report()

    rng = np.random.RandomState(0)
    x = jnp.ones((8, 8))
    y = perturb(rng, x)
    assert np.all(np.asarray(y) != np.asarray(x) * 0.999999999)
    assert np.allclose(np.asarray(y), 1.0, atol=1e-4)
