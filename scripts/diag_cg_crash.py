"""Bisect the ladder-scale CG TPU worker crash (VERDICT r2 item 8).

Round 2 observed the batched Jacobi-PCG while_loop crashing the axon
TPU worker at (B, m, n) = (64, 512, 1024) inside a long solve dispatch
(commit bf78c61); the workaround was to ship CG off-by-default on TPU.
This script bisects the failing configuration by escalating one axis
at a time -- batch, shape, window length, pcg_maxiters -- with a HOST
FETCH after every dispatch so the first hanging/crashing config is
identified exactly.

RUN THIS LAST in a TPU session: a worker crash can wedge the axon
tunnel for ~1h (CLAUDE.md).

    python scripts/diag_cg_crash.py [--stage N]   # resume at stage N
"""

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))


#: (B, n_items, n_bids, window, pcg_maxiters) escalation ladder;
#: each stage changes ONE axis vs a previous passing stage
STAGES = [
    (8, 100, 500, 100, 1000),      # 0 small, known-good regime
    (8, 200, 1000, 100, 1000),     # 1 shape up
    (8, 200, 1000, 500, 1000),     # 2 window up
    (64, 200, 1000, 100, 1000),    # 3 batch up (the crash config's B)
    (64, 200, 1000, 500, 1000),    # 4 batch + window (crash config)
    (64, 200, 1000, 500, 200),     # 5 crash config, capped inner CG
    (8, 300, 1500, 500, 1000),     # 6 bigger shape, small batch
    (32, 800, 4000, 500, 1000),    # 7 xl rung
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--iters", type=int, default=1000,
                    help="total iterations per stage (window-quantized)")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    import functools

    import jax.numpy as jnp
    from bench_ladder import get_instances
    from lpbox_admm_tpu.adapters import ca
    from lpbox_admm_tpu.config import LP_CONFIG
    from lpbox_admm_tpu.core import lp

    print(f"devices={jax.devices()}", flush=True)

    @functools.partial(jax.jit, static_argnames=("c", "w"))
    def win(s, p, c, w):
        s, _ = lp.solve_window(s, p, c, w, record=False)
        return s

    for si in range(args.stage, len(STAGES)):
        B, ni, nb, window, pcgmax = STAGES[si]
        cfg = LP_CONFIG.replace(linsolve="cg", pcg_maxiters=pcgmax)
        insts = get_instances(ni, nb, B)
        prob = ca.make_problem(insts)
        print(f"stage {si}: B={B} rung=({ni},{nb}) E=({prob.m},"
              f"{prob.n}) window={window} pcg_maxiters={pcgmax}",
              flush=True)
        t0 = time.time()
        s = jax.jit(lp.init_state, static_argnames=("cfg",))(prob, cfg)
        np.asarray(s.x)
        it = 0
        while it < args.iters:
            s = win(s, prob, cfg, window)
            # host fetch EVERY dispatch: the crash point is then the
            # last printed line
            cg_fail = int(np.asarray(s.cg_fail).sum())
            it = int(np.asarray(s.it))
            print(f"  it={it} cg_fail={cg_fail} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        print(f"stage {si}: PASSED in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
