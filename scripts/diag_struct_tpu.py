"""On-chip discriminator for the r4b struct-mega convergence failure.

CPU evidence (scripts/diag_struct_mega.py): no layout bug -- struct
matvecs are f32-accurate (8e-8) on the real mega instance and struct /
generic trajectories track to 2e-5 over 60 iterations.  So the failure
(struct obj -43321 at the 20000 cap vs generic -98266 converged at
13500) is either TPU-lowering-specific numerics or long-horizon
divergence of the 3-limb bf16 payload mode (mxu_sparse v2) -- the same
signature as the dense bf16-E mega failure (STATUS 2b).

This script, on the real chip:
  1. measures struct fast / struct exact / generic matvec errors vs
     host f64 (a large error = TPU miscompile, found immediately);
  2. runs the mega solve in struct-fast and struct-exact modes with the
     objective + infeasibility traced every 2000 iterations.

Expected outcomes:
  * exact converges, fast stalls  -> limb payloads are the culprit on
    real MXU numerics; ship exact for mega (still 3.6x faster per-iter
    than generic from the struct layout).
  * both stall                    -> TPU lowering bug in the struct
    dummy-block (vmap dynamic slices); bisect per block.
  * both converge                 -> r4b environmental; re-measure.
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import scipy.sparse as sp

from lpbox_admm_tpu.adapters import ca
from lpbox_admm_tpu.config import LP_CONFIG
from lpbox_admm_tpu.core import lp

print(f"backend: {jax.default_backend()}", flush=True)

z = np.load(os.path.join(ROOT, "bench_cache/ca_coo_1000_100000_1.npz"))
price, (r, c, v, shape) = z["p0"], (z["r0"], z["c0"], z["v0"],
                                    tuple(z["s0"]))
insts = [(price, (r, c, v, shape))]
m0, n0 = shape
C64 = sp.csr_matrix((v.astype(np.float64), (r, c)), shape=shape)

sprob_f, row_maps = ca.make_struct_problem(insts)              # fast
sprob_e, _ = ca.make_struct_problem(insts, exact=True)         # exact
print(f"struct m={sprob_f.m} n={sprob_f.n}", flush=True)

# ---- 1) on-chip matvec error vs host f64 ---------------------------
rng = np.random.RandomState(0)
x = rng.randn(n0)
w = rng.randn(m0)
ref_mv, ref_mtv = C64 @ x, C64.T @ w
xs = np.zeros(sprob_f.n, np.float32)
xs[:n0] = x
ws = np.zeros(sprob_f.m, np.float32)
ws[row_maps[0]] = w


def rel(a, b):
    return np.abs(a - b).max() / np.abs(b).max()


for tag, prob in (("fast", sprob_f), ("exact", sprob_e)):
    mv = np.asarray(prob.E.mv(jnp.asarray(xs)[None]))[0]
    mtv = np.asarray(prob.E.mtv(jnp.asarray(ws)[None]))[0]
    print(f"struct-{tag} on-chip: mv err {rel(mv[row_maps[0]], ref_mv):.3e}"
          f"  mtv err {rel(mtv[:n0], ref_mtv):.3e}", flush=True)

# ---- 2) trajectory A/B ----------------------------------------------
ginv = np.load(os.path.join(
    ROOT, "bench_cache/host_ginv_struct_1000_100000_1.npy"))
cfg = LP_CONFIG.replace(linsolve="woodbury")


def trace_solve(prob, tag, cap=20000, every=2000, window=500):
    st = lp.init_state(prob, cfg, ginv=jnp.asarray(ginv))
    t0 = time.time()
    it = 0
    while it < cap:
        st, _ = lp.solve_window(st, prob, cfg, window, record=False,
                                skip_cvg_at=0 if it == 0 else None)
        it = int(st.it)
        if it % every == 0 or bool(np.asarray(st.done).all()):
            _, obj, infeas = lp.select_solution(
                prob, lp.solution(st), lp.solution_best(st))
            print(f"  {tag} it={it} obj={float(np.asarray(obj)[0]):.1f} "
                  f"infeas={int(np.asarray(infeas).sum())} "
                  f"done={bool(np.asarray(st.done).all())} "
                  f"[{time.time()-t0:.0f}s]", flush=True)
        if bool(np.asarray(st.done).all()):
            break
    return st


if "--errors-only" in sys.argv:
    sys.exit(0)

print("== struct-exact trace", flush=True)
trace_solve(sprob_e, "exact")
print("== struct-fast trace", flush=True)
trace_solve(sprob_f, "fast")
