"""Component-level TPU timings for the sparse (ELL gather) LP path.

The (1000,10000) sparse rung ran at 0.168 s/iteration on the chip --
slower per-iteration than the CPU f64 oracle -- while the same ops are
fine on CPU.  This probe times each candidate bottleneck in isolation
so the redesign targets the real one:

  * sparse mv / mtv (the XLA gather lowering)
  * dense-bf16 E passes on the same instances (the MXU alternative)
  * the Woodbury G^-1 apply
  * one full sparse solve_window step

Methodology per CLAUDE.md: chain state through a fori_loop inside one
jit (defeats the axon dedup cache), host-fetch inside the timed
region, report the best of 3.

    python scripts/probe_sparse_ops.py [--rung 1000x10000] [--batch 8]
"""

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))


def timed(fn, arg, reps=3):
    best = np.inf
    out = fn(arg)
    np.asarray(jax_leaf(out))          # warm compile
    for rep in range(reps):
        a = perturb_arg(arg, rep)
        t0 = time.time()
        out = fn(a)
        np.asarray(jax_leaf(out))
        best = min(best, time.time() - t0)
    return best


def jax_leaf(x):
    import jax
    return jax.tree_util.tree_leaves(x)[0]


def perturb_arg(arg, rep):
    from lpbox_admm_tpu.utils.profiling import perturb
    rng = np.random.RandomState(100 + rep)
    import jax
    return jax.tree_util.tree_map(
        lambda a: perturb(rng, a)
        if a.dtype.kind == "f" and a.ndim >= 1 else a, arg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rung", default="1000x10000")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--loops", type=int, default=100)
    ap.add_argument("--skip-gather", action="store_true",
                    help="skip the serialized-gather baseline (minutes "
                         "at the mega rung)")
    ap.add_argument("--chunks", default="2048,4096,8192,16384",
                    help="mxu_sparse chunk sizes to sweep")
    args = ap.parse_args()
    n_items, n_bids = map(int, args.rung.split("x"))

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from bench_sparse_rung import get_instances
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp
    from lpbox_admm_tpu.ops import sparse as sparse_ops

    print(f"backend: {jax.default_backend()}", flush=True)
    insts = get_instances(n_items, n_bids, args.batch)
    sprob = ca.make_sparse_problem(insts)
    S = sprob.E
    B, m, n = S.shape
    L = args.loops
    print(f"sparse E: m={m} n={n} Kr={S.row_idx.shape[-1]} "
          f"Kc={S.col_idx.shape[-1]}", flush=True)

    # --- sparse gather round trip: x <- normalize(mtv(mv(x))) --------
    x0 = jnp.ones((B, n), jnp.float32)
    if not args.skip_gather:
        os.environ["LPBOX_SPARSE"] = "gather"   # read at trace time

        @jax.jit
        def sp_chain(x):
            def body(_, x):
                y = sparse_ops.mv(S, x)
                x = sparse_ops.mtv(S, y)
                return x / jnp.linalg.norm(x, axis=-1, keepdims=True)
            return jax.lax.fori_loop(0, L, body, x)

        t = timed(sp_chain, x0)
        print(f"sparse gather mv+mtv: {1e3 * t / L:.2f} ms/pair "
              f"({B * L / t:.0f} inst-pairs/s)", flush=True)
        os.environ.pop("LPBOX_SPARSE", None)

    # --- MXU one-hot route (ops/mxu_sparse), chunk sweep ---------------
    from lpbox_admm_tpu.ops import mxu_sparse
    for chunk in map(int, args.chunks.split(",")):
        @jax.jit
        def mxu_chain(x, _c=chunk):
            def body(_, x):
                y = mxu_sparse.mv(S, x, chunk=_c)
                x = mxu_sparse.mtv(S, y, chunk=_c)
                return x / jnp.linalg.norm(x, axis=-1, keepdims=True)
            return jax.lax.fori_loop(0, L, body, x)

        try:
            t = timed(mxu_chain, x0)
        except Exception as e:
            print(f"mxu mv+mtv chunk={chunk}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        macs = 2 * B * S.col_idx.shape[1] * S.col_idx.shape[2] \
            * ((m + 127) // 128 * 128)
        print(f"mxu mv+mtv chunk={chunk}: {1e3 * t / L:.2f} ms/pair "
              f"({B * L / t:.0f} inst-pairs/s, "
              f"~{macs * L / t / 1e12:.1f} TMAC/s)", flush=True)

    # --- dense bf16 E passes on the same instances --------------------
    if not isinstance(insts[0][1], tuple):
        # E must be a jit ARGUMENT: a closure capture becomes an HLO
        # constant and overflows the axon remote-compile request limit
        # (HTTP 413; CLAUDE.md)
        Ebf = ca.make_dense_bf16_problem(insts).E

        @jax.jit
        def de_chain(x, E):
            def body(_, x):
                y = jnp.einsum("bmn,bn->bm", E, x.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                x = jnp.einsum("bmn,bm->bn", E, y.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                return x / jnp.linalg.norm(x, axis=-1, keepdims=True)
            return jax.lax.fori_loop(0, L, body, x)

        t = timed(lambda x: de_chain(x, Ebf), x0)
        gb = 2 * B * m * n * 2 / 1e9
        print(f"dense bf16 mv+mtv: {1e3 * t / L:.2f} ms/pair "
              f"(~{gb * L / t:.0f} GB/s)", flush=True)

    # --- Woodbury G^-1 apply ------------------------------------------
    if m > 8192:
        # the remote XLA compiler fails on the m~2e4 cholesky program
        # and the on-device sparse gram is a serialized scatter; the
        # mega-shape end-to-end numbers come from bench_sparse_rung
        # --probe --host-ginv instead
        print("skipping on-device factorize/full-step sections "
              f"(m={m} > 8192)", flush=True)
        return
    from lpbox_admm_tpu.ops import woodbury
    factor = woodbury.factorize(S, jnp.ones((B, n), bool), 2.0)
    ginv = factor.ginv              # argument, not capture (413 hazard)

    @jax.jit
    def gi_chain(u, G):
        def body(_, u):
            u = jnp.einsum("bij,bj->bi", G, u,
                           preferred_element_type=jnp.float32)
            return u / jnp.linalg.norm(u, axis=-1, keepdims=True)
        return jax.lax.fori_loop(0, L, body, u)

    u0 = jnp.ones((B, m), jnp.float32)
    t = timed(lambda u: gi_chain(u, ginv), u0)
    print(f"ginv apply: {1e3 * t / L:.2f} ms/apply", flush=True)

    # --- full sparse step ---------------------------------------------
    import functools
    cfg = LP_CONFIG.replace(linsolve="woodbury")

    @functools.partial(jax.jit, static_argnames=("w",))
    def win(s, w):
        s, _ = lp.solve_window(s, sprob, cfg, w, record=False)
        return s

    from lpbox_admm_tpu.utils.profiling import perturb
    st = lp.init_state(sprob, cfg)
    st = win(st, 10)
    np.asarray(st.x)
    best = np.inf
    for rep in range(3):
        # perturb only x: big leaves (ginv) would crawl through the
        # tunnel re-upload; x alone defeats the dedup cache
        s2 = st._replace(x=perturb(np.random.RandomState(rep), st.x))
        t0 = time.time()
        s2 = win(s2, L)
        np.asarray(s2.x)
        best = min(best, time.time() - t0)
    print(f"sparse full step: {1e3 * best / L:.2f} ms/iter "
          f"({B * L / best:.0f} inst-iters/s)", flush=True)


if __name__ == "__main__":
    main()
