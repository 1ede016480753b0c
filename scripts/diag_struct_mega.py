"""Diagnose the struct-route mega convergence failure (r4b).

The struct (CaStructE) run at (1000, 1e5) hit the 20000-iter cap at
obj -43321 where the generic ELL route (mxu_sparse v1, f32 one-hots)
converged to -98266 at 13500.  Hypotheses:

  H1  mxu_sparse v2's 3-limb bf16 payloads lose precision the mega
      dual ascent cannot tolerate (same signature as the dense bf16-E
      mega failure, STATUS 2b).
  H2  a CaStructE layout bug that only triggers at mega shapes.

Discriminators, all CPU, on the real cached mega instance:

  1. single-matvec relative error of struct vs scipy f64 (H2: large
     error; H1: ~1e-7 per op);
  2. short-trajectory pointwise drift struct vs generic ELL (both
     32-bit routes should track each other for ~20 iters).

Run with scripts/cpu-env.sh.
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import scipy.sparse as sp

z = np.load(os.path.join(ROOT, "bench_cache/ca_coo_1000_100000_1.npz"))
price = z["p0"]
r, c, v, shape = z["r0"], z["c0"], z["v0"], tuple(z["s0"])
insts = [(price, (r, c, v, shape))]
m0, n0 = shape
print(f"instance: m={m0} n={n0} nnz={len(r)}")

C64 = sp.csr_matrix((v.astype(np.float64), (r, c)), shape=shape)

from lpbox_admm_tpu.adapters import ca
from lpbox_admm_tpu.ops import sparse as sparse_ops

import jax.numpy as jnp

t0 = time.time()
sprob, row_maps = ca.make_struct_problem(insts)
gprob = ca.make_sparse_problem(insts)
print(f"built struct m={sprob.m} n={sprob.n}, generic m={gprob.m} "
      f"({time.time()-t0:.1f}s)")

rng = np.random.RandomState(0)
x = rng.randn(n0).astype(np.float64)
w = rng.randn(m0).astype(np.float64)

ref_mv = C64 @ x                      # (m0,)
ref_mtv = C64.T @ w                   # (n0,)

# struct layout: rows permuted by row_maps[0]
xs = np.zeros(sprob.n, np.float32)
xs[:n0] = x
ws = np.zeros(sprob.m, np.float32)
ws[row_maps[0]] = w

t0 = time.time()
s_mv = np.asarray(sprob.E.mv(jnp.asarray(xs)[None]))[0]
s_mtv = np.asarray(sprob.E.mtv(jnp.asarray(ws)[None]))[0]
print(f"struct matvecs {time.time()-t0:.1f}s")

xg = np.zeros(gprob.n, np.float32)
xg[:n0] = x
wg = np.zeros(gprob.m, np.float32)
wg[:m0] = w
g_mv = np.asarray(sparse_ops.mv(gprob.E, jnp.asarray(xg)[None]))[0]
g_mtv = np.asarray(sparse_ops.mtv(gprob.E, jnp.asarray(wg)[None]))[0]


def rel(a, b):
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-30)


print(f"struct mv rel err vs f64:  {rel(s_mv[row_maps[0]], ref_mv):.3e}")
print(f"struct mtv rel err vs f64: {rel(s_mtv[:n0], ref_mtv):.3e}")
print(f"generic mv rel err vs f64: {rel(g_mv[:m0], ref_mv):.3e}")
print(f"generic mtv rel err:       {rel(g_mtv[:n0], ref_mtv):.3e}")

# 2) short-trajectory pointwise drift: struct vs generic ELL
from lpbox_admm_tpu.config import LP_CONFIG
from lpbox_admm_tpu.core import lp

ratio = 2.0
gc = os.path.join(ROOT, "bench_cache/host_ginv_1000_100000_1.npy")
gcs = os.path.join(ROOT, "bench_cache/host_ginv_struct_1000_100000_1.npy")
ginv_g = np.load(gc)
ginv_s = np.load(gcs)
cfg = LP_CONFIG.replace(linsolve="woodbury")

t0 = time.time()
sst = lp.init_state(sprob, cfg, ginv=jnp.asarray(ginv_s))
gst = lp.init_state(gprob, cfg, ginv=jnp.asarray(ginv_g))
for it in (5, 20, 60):
    sst, _ = lp.solve_window(sst, sprob, cfg, it - int(sst.it),
                             record=False, skip_cvg_at=0)
    gst, _ = lp.solve_window(gst, gprob, cfg, it - int(gst.it),
                             record=False, skip_cvg_at=0)
    sx = np.asarray(sst.x)[0, :n0]
    gx = np.asarray(gst.x)[0, :n0]
    d = np.abs(sx - gx).max()
    print(f"iter {it}: max|x_struct - x_generic| = {d:.3e} "
          f"(|x| max {np.abs(gx).max():.3f}) [{time.time()-t0:.0f}s]")
