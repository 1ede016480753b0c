"""Per-component timing of the struct-mega iteration (TPU).

The struct route's full iteration measured 9.4 ms at (1000, 1e5) B=1
(r4b probe).  The ADMM step spends: one stacked forward mv (k=2), one
G^-1 apply, one stacked transpose mtv (k=4), n-side vector ops, and an
E pass every incumbent_stride iterations.  This probe times each piece
so optimization goes where the milliseconds are:

    python scripts/probe_struct_ops.py [--rung 1000x100000] [--batch 1]

Methodology: perturbed inputs per rep (axon dedup hazard), host fetch
inside the timed region, min over reps (utils/profiling rules).
"""

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rung", default="1000x100000")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--exact", action="store_true")
    args = ap.parse_args()
    n_items, n_bids = map(int, args.rung.split("x"))

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench_sparse_rung import get_instances
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.ops import ca_sparse, mxu_sparse
    from lpbox_admm_tpu.ops.struct_ginv import build_struct_ginv

    print(f"backend: {jax.default_backend()}", flush=True)
    insts = get_instances(n_items, n_bids, args.batch)
    prob, row_maps = ca.make_struct_problem(insts, exact=args.exact)
    E = prob.E
    B, m, n = E.shape
    print(f"struct m1={E.m1} m2={E.m2} n={n} B={B}", flush=True)

    coos = [(Ci[0], Ci[1], Ci[2]) for _, Ci in insts]
    shp = [Ci[3] for _, Ci in insts]
    sg = build_struct_ginv(coos, shp, row_maps, E.m1, E.m2, n, ratio=2.0)

    rng = np.random.RandomState(0)
    LOOPS = 50

    def timeit(name, op, x0, proj):
        """Time ``op`` LOOPS times inside ONE dispatch: the axon
        round-trip is ~40 ms, so per-call timing is meaningless.  The
        carry is re-projected to the input shape through ``proj`` (data
        dependence defeats both reordering and the dedup cache)."""

        @jax.jit
        def loop(x):
            def body(c, _):
                y = op(c)
                return proj(y, c), None
            c, _ = jax.lax.scan(body, x, None, length=LOOPS)
            return c

        jax.block_until_ready(loop(x0))           # compile
        best = np.inf
        for rep in range(args.reps):
            xr = x0 * (1.0 + 1e-6 * rep)
            t0 = time.time()
            np.asarray(jax.tree_util.tree_leaves(loop(xr))[0]).ravel()[0]
            best = min(best, time.time() - t0)
        print(f"{name}: {best / LOOPS * 1e3:.2f} ms", flush=True)
        return best / LOOPS

    import functools

    vn2 = jnp.asarray(rng.randn(B, 2, n).astype(np.float32))
    wm4 = jnp.asarray(rng.randn(B, 4, m).astype(np.float32))
    wi4 = jnp.asarray(rng.randn(B, 4, E.m1).astype(np.float32))
    rm = jnp.asarray(rng.randn(B, m).astype(np.float32))

    # mv: (B,2,n) -> (B,2,m); feed back by slicing m -> n cyclically
    timeit("full mv_many k=2  ",
           lambda v: ca_sparse._mv_many(E, v),
           vn2, lambda y, c: c * 0.999 + 1e-3 * jnp.pad(
               y, ((0, 0), (0, 0), (0, n - m)))[:, :, :n])
    timeit("full mtv_many k=4 ",
           lambda w: ca_sparse._mtv_many(E, w),
           wm4, lambda y, c: c * 0.999 + 1e-3 * y[:, :, :m])
    timeit("item mv k=2       ",
           functools.partial(mxu_sparse.mv_many, E.item, lo_width=16,
                             exact=args.exact),
           vn2, lambda y, c: c * 0.999 + 1e-3 * jnp.pad(
               y, ((0, 0), (0, 0), (0, n - E.m1)))[:, :, :n])
    timeit("item mtv k=4      ",
           functools.partial(mxu_sparse.mtv_many, E.item,
                             exact=args.exact),
           wi4, lambda y, c: c * 0.999 + 1e-3 * y[:, :, :E.m1])
    timeit("schur ginv apply  ", sg.apply, rm,
           lambda y, c: c * 0.999 + 1e-3 * y)

    # lo-width sweep of the item scatter (two-stage form): W trades
    # the Z payload width against the hi-matrix height
    for w in (8, 16, 32, 64):
        timeit(f"item mv W={w:<3}      ",
               functools.partial(mxu_sparse.mv_many, E.item,
                                 lo_width=w, exact=args.exact),
               vn2, lambda y, c: c * 0.999 + 1e-3 * jnp.pad(
                   y, ((0, 0), (0, 0), (0, n - E.m1)))[:, :, :n])

    # dummy-block share = full minus item (same one-hot structure)
    print("(dummy block = full - item at each direction)", flush=True)


if __name__ == "__main__":
    main()
