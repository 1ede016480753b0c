"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md section 4:
the standard JAX fake-backend pattern for multi-chip logic)."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lpbox_admm_tpu.adapters import ca
from lpbox_admm_tpu.config import LP_CONFIG
from lpbox_admm_tpu.core import lp
from lpbox_admm_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                          replicate_pytree,
                                          shard_batch_pytree)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return make_mesh(8)


@pytest.fixture(scope="module")
def batch16():
    rng = np.random.RandomState(3)
    insts = [ca.generate_cauction(rng, n_items=12, n_bids=32)
             for _ in range(16)]
    return ca.make_problem(insts)


def test_sharded_solve_matches_local(mesh, batch16):
    """Solving a sharded batch gives the same result as unsharded --
    instances are independent, the mesh only partitions them."""
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    local = lp.solve(batch16, cfg, max_iters=4000, window=50)

    sharded_prob = shard_batch_pytree(batch16, mesh)
    # verify placement actually sharded the batch axis
    assert sharded_prob.E.sharding.is_equivalent_to(
        batch_sharding(mesh), ndim=3)
    sharded = lp.solve(sharded_prob, cfg, max_iters=4000, window=50)

    np.testing.assert_allclose(np.asarray(lp.objective(local)),
                               np.asarray(lp.objective(sharded)),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(local.done),
                                  np.asarray(sharded.done))


def test_dp_gradients_match_single_device(mesh, batch16):
    """Data-parallel policy gradients (sharded batch, replicated params)
    equal single-device gradients -- the jit-inserted psum is correct."""
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train.imitation import weighted_bce

    model = build_policy("mlp")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(64, 20, 5).astype(np.float32))
    labels = jnp.asarray((rng.rand(64) > 0.5).astype(np.float32))
    weight = jnp.ones((64,))
    variables = model.init(jax.random.PRNGKey(0), x[:2], train=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    def grads_of(params, x, labels, weight):
        def loss_fn(p):
            out, _ = model.apply({"params": p, "batch_stats": bstats},
                                 x, train=True, mutable=["batch_stats"])
            logits, _ = out
            return weighted_bce(logits[:, 0], labels, weight)

        return jax.grad(loss_fn)(params)

    g_local = jax.jit(grads_of)(params, x, labels, weight)

    bs = batch_sharding(mesh)
    xs = jax.device_put(x, bs)
    ls = jax.device_put(labels, bs)
    wss = jax.device_put(weight, bs)
    ps = replicate_pytree(params, mesh)
    g_sharded = jax.jit(grads_of)(ps, xs, ls, wss)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        g_local, g_sharded)


def test_graft_entry_points():
    """The driver contract: entry() compiles; dryrun_multichip runs a
    full dp training step on the 8-device mesh."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 1)
    ge.dryrun_multichip(8)


def test_dp_train_epoch_matches_single(mesh, batch16):
    """A FULL imitation epoch (dataset build -> episode batches ->
    optimizer steps) with sharded data + replicated params reproduces
    the single-device epoch (VERDICT r1 item 10)."""
    from lpbox_admm_tpu.config import PolicyConfig
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import imitation

    cfg = LP_CONFIG.replace(linsolve="woodbury")
    pcfg = PolicyConfig(net="mlp", node_size=4, chunk_dim=5)
    model = build_policy("mlp")
    trainer = imitation.PolicyTrainer(model, pcfg, cfg, ws=20)
    ds = imitation.build_dataset(batch16, cfg, record_iters=200)

    ts0 = trainer.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 5)))
    ts_local, loss_local = trainer.train_epoch(ts0, [ds], n_episodes=5)

    from lpbox_admm_tpu.parallel.mesh import (replicate_pytree,
                                              shard_batch_pytree)
    ds_sh = shard_batch_pytree(ds, mesh)
    ts_rep = replicate_pytree(ts0, mesh)
    ts_sh, loss_sh = trainer.train_epoch(ts_rep, [ds_sh], n_episodes=5)

    np.testing.assert_allclose(float(loss_local), float(loss_sh),
                               rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-5),
        ts_local.params, ts_sh.params)


def test_sharded_l2f_eval_matches_local(mesh, batch16):
    """The full l2f eval loop (windowed solve + policy + masked fixing)
    on a sharded batch equals the local run."""
    from lpbox_admm_tpu.config import PolicyConfig
    from lpbox_admm_tpu.models.policy import build_policy
    from lpbox_admm_tpu.train import l2f

    cfg = LP_CONFIG.replace(linsolve="woodbury")
    pcfg = PolicyConfig(net="mlp", node_size=4, chunk_dim=5)
    model = build_policy("mlp")
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((2, 4, 5)), train=True)

    local = l2f.l2f_solve(batch16, model, variables, cfg, pcfg, ws=20,
                          max_iter=2000)
    sh = l2f.l2f_solve(shard_batch_pytree(batch16, mesh), model,
                       variables, cfg, pcfg, ws=20, max_iter=2000)
    np.testing.assert_allclose(
        np.asarray(lp.objective(local)), np.asarray(lp.objective(sh)),
        rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(local.free),
                                  np.asarray(sh.free))


def test_bench_shape_sharded_matches_local_and_scales(mesh):
    """VERDICT r3 weak 7: rehearse the BENCH-SHAPED sharded run (the
    real 128 x CA-500 batch over the 8-device mesh).  A fixed
    300-iteration window must produce identical metrics sharded vs
    local (tolerance covers fusion-order drift only), and the
    dp_scaling_table runs at this shape."""
    import __graft_entry__ as ge
    from lpbox_admm_tpu.parallel.mesh import dp_scaling_table

    prob = ge._bench_shape_problem()
    assert prob.batch == 128 and prob.E.shape[-2:] == (256, 512)
    cfg = LP_CONFIG.replace(linsolve="woodbury")

    @jax.jit
    def win300(p):
        st = lp.init_state(p, cfg)
        st, _ = lp.solve_window(st, p, cfg, 300, record=False,
                                skip_cvg_at=0)
        return lp.objective(st), lp.infeasible_rows(st, p)

    obj_l, inf_l = win300(prob)
    obj_s, inf_s = win300(shard_batch_pytree(prob, mesh))
    np.testing.assert_allclose(np.asarray(obj_l), np.asarray(obj_s),
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(inf_l), np.asarray(inf_s))

    table = dp_scaling_table(prob, cfg, iters=50,
                             device_counts=(1, 8), reps=1)
    assert [r["n"] for r in table] == [1, 8]
    assert all(np.isfinite(r["wall_s"]) and r["wall_s"] > 0
               for r in table)


def test_multiprocess_dp_rehearsal(tmp_path):
    """2 OS processes x 4 virtual CPU devices each join one
    jax.distributed cluster (parallel/mesh.init_distributed); the
    8-device mesh shards the batch ACROSS processes, and the sharded
    solve + DP policy gradient step agree between the workers and with
    this (single-process, 8-device) run -- the standard multi-host
    rehearsal, since no real multi-chip hardware is available here
    (VERDICT r2 item 9)."""
    import json
    import socket
    import subprocess
    import sys as _sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "dp_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(i), str(port), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    res = [json.load(open(o)) for o in outs]
    assert res[0]["n_devices"] == 8 and res[0]["n_local"] == 4
    # both workers computed the same global results
    np.testing.assert_allclose(res[0]["objs"], res[1]["objs"],
                               rtol=1e-5)
    assert res[0]["loss"] == pytest.approx(res[1]["loss"], rel=1e-5)
    assert res[0]["param0"] == pytest.approx(res[1]["param0"],
                                             rel=1e-4)

    # single-process 8-device reference of the same sharded solve
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.parallel.mesh import host_to_global, make_mesh

    rng = np.random.RandomState(3)
    insts = [ca.generate_cauction(rng, n_items=20, n_bids=60)
             for _ in range(8)]
    prob = ca.make_problem(insts)
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    gprob = host_to_global(
        jax.tree_util.tree_map(np.asarray, prob), make_mesh())

    @jax.jit
    def solve200(p):
        st = lp.init_state(p, cfg)
        st, _ = lp.solve_window(st, p, cfg, 200, record=False,
                                skip_cvg_at=0)
        return lp.objective(st)

    ref = np.asarray(solve200(gprob))
    np.testing.assert_allclose(res[0]["objs"], ref, rtol=1e-4)
