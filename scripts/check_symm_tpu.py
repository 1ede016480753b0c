"""ON-CHIP numeric validation of ops/pallas_symm.

Interpret mode is NOT sufficient evidence for this kernel: the v1
(per-instance grid) kernel passed interpret-mode tests yet produced
wrong numbers on the real chip (2026-08-18 ladder_stream_symm run:
30/32 infeasible).  Run this BEFORE any perf measurement that includes
symm_matvec.

    python scripts/check_symm_tpu.py
"""

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from lpbox_admm_tpu.ops import pallas_symm

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    ok = True
    for B, m in [(32, 1664), (64, 640), (8, 2944), (1, 2048)]:
        A = rng.randn(B, m, m).astype(np.float32)
        G = (A + A.transpose(0, 2, 1)) / 2
        v = rng.randn(B, m).astype(np.float32)
        Gp = pallas_symm.pack_tril_blocks(jnp.asarray(G))
        got = np.asarray(pallas_symm.symm_matvec(
            Gp, jnp.asarray(v), interpret=False))
        want = np.einsum("bij,bj->bi", G, v)
        rel = np.abs(got - want).max() / np.abs(want).max()
        good = rel < 1e-4
        ok &= good
        print(f"(B={B}, m={m}): max rel err {rel:.2e} "
              f"{'OK' if good else 'FAIL'}", flush=True)
    print("SYMM_TPU_OK" if ok else "SYMM_TPU_FAIL", flush=True)


if __name__ == "__main__":
    main()
