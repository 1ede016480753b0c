"""Probe: which batched-matvec formulations lower in Mosaic (TPU Pallas).

a) batched dot_general ((bt,m,n) @ (bt,n) with bt as batch dim)
b) pairs trick: one 2D MXU matmul (bt*m, n) @ (n, bt) + diagonal select
c) VPU broadcast-reduce (current kernel) as the baseline

Run on TPU (default env) or CPU (interpret): scripts/cpu-env.sh python ...
"""
import os, sys, time
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

INTERPRET = jax.default_backend() == "cpu"
bt, m, n = 8, 256, 256
rng = np.random.RandomState(0)
E = jnp.asarray(rng.rand(bt, m, n).astype(np.float32))
v = jnp.asarray(rng.rand(bt, n).astype(np.float32))
want = np.einsum("bmn,bn->bm", np.asarray(E), np.asarray(v))


def run(name, kernel):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bt, m), jnp.float32),
            interpret=INTERPRET,
        )(E, v)
        err = float(np.abs(np.asarray(out) - want).max())
        print(f"{name}: OK maxerr={err:.2e}", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
        return False


def k_batched(E_ref, v_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        E_ref[...], v_ref[...],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def k_pairs(E_ref, v_ref, o_ref):
    Ef = E_ref[...].reshape(bt * m, n)
    P = jax.lax.dot_general(
        Ef, v_ref[...].T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(bt, m, bt)
    sel = jax.lax.broadcasted_iota(jnp.int32, (bt, 1, bt), 0) \
        == jax.lax.broadcasted_iota(jnp.int32, (bt, 1, bt), 2)
    o_ref[...] = jnp.sum(jnp.where(sel, P, 0.0), axis=-1)


def k_vpu(E_ref, v_ref, o_ref):
    o_ref[...] = jnp.sum(E_ref[...] * v_ref[...][:, None, :], axis=-1)


print("backend:", jax.default_backend(), "interpret:", INTERPRET, flush=True)
ok_b = run("batched_dot", k_batched)
ok_p = run("pairs", k_pairs)
ok_v = run("vpu", k_vpu)

# timing (TPU only): which is fastest per call at this shape
if not INTERPRET:
    def timeit(name, kernel):
        try:
            f = lambda E, v: pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct((bt, m), jnp.float32),
                interpret=False)(E, v)
            jf = jax.jit(f)
            np.asarray(jf(E, v))
            reps = 200
            t0 = time.time()
            out = None
            for i in range(reps):
                out = jf(E * (1.0 + 1e-6 * i), v)
            np.asarray(out)
            dt = (time.time() - t0) / reps
            print(f"{name}: {dt*1e6:.1f} us/call", flush=True)
        except Exception as e:
            print(f"{name}: time FAIL {type(e).__name__}", flush=True)
    for nm, k, ok in (("batched_dot", k_batched, ok_b),
                      ("pairs", k_pairs, ok_p), ("vpu", k_vpu, ok_v)):
        if ok:
            timeit(nm, k)
