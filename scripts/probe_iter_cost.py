"""Fixed-iteration per-iteration cost probe for the XLA LP step.

Ladder rung walls are confounded by per-block early-exit luck (the
chaotic trajectory decides when blocks converge).  This probe times a
FIXED window of iterations -- per-iteration work in the XLA path is
shape-static regardless of `done` masks -- so two solver revisions can
be compared honestly:

    python scripts/probe_iter_cost.py --rung 300x1500 --iters 2000

Prints wall seconds and instance-iterations/s plus implied HBM GB/s
for the dominant streams.
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
    ap.add_argument("--rung", default="300x1500")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--path", default="xla", choices=["xla", "stream"],
                    help="xla = two-pass core/lp step; stream = the "
                         "single-E-stream Pallas sweep "
                         "(ops/pallas_stream)")
    ap.add_argument("--nb", type=int, default=0,
                    help="stream kernel column-block width (0 = auto)")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import functools
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from bench_ladder import get_instances, RUNG_BATCH  # noqa: E402
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp

    n_items, n_bids = (int(v) for v in args.rung.split("x"))
    B = args.batch or RUNG_BATCH.get((n_items, n_bids), 64)
    insts = get_instances(n_items, n_bids, B)
    prob = ca.make_problem(insts)
    m, n = prob.m, prob.n
    cfg = LP_CONFIG.replace(linsolve="woodbury", matvec_dtype=args.dtype,
                            incumbent_stride=8)
    print(f"devices={jax.devices()} rung=({n_items},{n_bids}) B={B} "
          f"E=({m},{n}) dtype={args.dtype} iters={args.iters}",
          flush=True)

    if args.path == "stream":
        from lpbox_admm_tpu.ops import pallas_stream

        nb = args.nb or None

        @functools.partial(jax.jit, static_argnames=("c", "w"))
        def run(s, p, c, w):
            return pallas_stream.lp_window_stream(
                s, p, c, w, nb=nb, interpret=False)
    else:
        @functools.partial(jax.jit, static_argnames=("c", "w"))
        def run(s, p, c, w):
            s, _ = lp.solve_window(s, p, c, w, record=False)
            return s

    rng = np.random.RandomState(5)

    def perturbed():
        f = 1.0 + 1e-5 * rng.rand(*prob.b.shape).astype(np.float32)
        return prob._replace(b=prob.b * jnp.asarray(f))

    jinit = jax.jit(lp.init_state, static_argnames=("cfg",))
    t0 = time.time()
    s = run(jinit(perturbed(), cfg), perturbed(), cfg, args.iters)
    np.asarray(s.x)
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)

    best = 1e30
    for _ in range(args.repeats):
        p = perturbed()
        s0 = jinit(p, cfg)
        np.asarray(s0.x)
        t0 = time.time()
        s = run(s0, p, cfg, args.iters)
        np.asarray(s.x)
        best = min(best, time.time() - t0)
    ii = B * args.iters / best
    eb = 2 if args.dtype == "bfloat16" else 4
    if args.path == "stream":
        # single-stream: E once + G^{-1} once (incumbent rides the
        # fused forward stack for free)
        traffic = eb * m * n + 4 * m * m
    else:
        # two-pass: 2x E + 1x G^{-1} (+ E/stride for the incumbent
        # feasibility pass)
        traffic = (2 + 1.0 / cfg.incumbent_stride) * eb * m * n \
            + 4 * m * m
    print(f"wall={best:.3f}s  {ii:,.0f} inst-iters/s  "
          f"implied {ii * traffic / 1e9:,.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
