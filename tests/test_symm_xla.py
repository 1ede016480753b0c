"""ops/symm_xla.py: packed lower-triangle symmetric matvec (XLA) and
the bf16 G^{-1} storage option (config.ginv_dtype)."""

import numpy as np
import jax.numpy as jnp

from lpbox_admm_tpu.adapters import ca
from lpbox_admm_tpu.config import LP_CONFIG
from lpbox_admm_tpu.core import lp
from lpbox_admm_tpu.ops import pallas_stream, symm_xla


def test_symm_matvec_matches_dense():
    rng = np.random.RandomState(0)
    for B, m in ((3, 256), (2, 384)):
        A = rng.randn(B, m, m).astype(np.float32)
        G = A + np.swapaxes(A, 1, 2)                 # symmetric
        v = rng.randn(B, m).astype(np.float32)
        Gp = symm_xla.pack_tril(jnp.asarray(G))
        L = (m // 128) * (m // 128 + 1) // 2
        assert Gp.shape == (B, L, 128, 128)
        got = np.asarray(symm_xla.symm_matvec(Gp, jnp.asarray(v)))
        want = np.einsum("bij,bj->bi", G, v)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def _batch(seed=31, count=2):
    rng = np.random.RandomState(seed)
    insts = [ca.generate_cauction(rng, n_items=60, n_bids=200)
             for _ in range(count)]
    # force a packable row count (m % 128 == 0, >= 2 blocks)
    return ca.make_problem(insts, m_pad=256)


def test_stream_packed_sym_matches_dense_apply():
    """The packed-symmetric G^{-1} read computes the same window as the
    dense einsum (reassociation-level differences only at W=10)."""
    prob = _batch()
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    st0 = lp.init_state(prob, cfg)
    ref = pallas_stream.lp_window_stream(st0, prob, cfg, 10,
                                         skip_cvg_at=0, interpret=True)
    got = pallas_stream.lp_window_stream(
        st0, prob, cfg.replace(ginv_apply="packed-sym"), 10,
        skip_cvg_at=0, interpret=True)
    for name in ("x", "z1", "z2", "z4", "ex"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref, name)),
            rtol=5e-4, atol=5e-4, err_msg=name)


def test_stream_rejects_packed_sym_bf16_combo():
    """packed-sym + bf16 G^{-1} silently cancel (pack_tril upcasts to
    f32, making the packed read LARGER than the bf16 dense apply);
    lp_window_stream must refuse the combination (ADVICE r3)."""
    import pytest

    prob = _batch(seed=33)
    cfg = LP_CONFIG.replace(linsolve="woodbury", ginv_apply="packed-sym",
                            ginv_dtype="bfloat16")
    st0 = lp.init_state(prob, cfg)
    with pytest.raises(ValueError, match="packed-sym"):
        pallas_stream.lp_window_stream(st0, prob, cfg, 10,
                                       skip_cvg_at=0, interpret=True)


def test_stream_ginv_bf16_short_window_close():
    """bf16 G^{-1} storage plumbing.  The ~4e-3 entry rounding is
    amplified ~100x by the x-update's rhs - E^T u cancellation
    (measured here: ~18% relative x deviation after 10 iterations, the
    r2b rejection's mechanism), so this only gates finiteness and the
    deviation SCALE; whether the drop-to-feasible repair absorbs it at
    the capped xl operating point is a measured TPU property
    (STATUS.md)."""
    prob = _batch(seed=32)
    cfg = LP_CONFIG.replace(linsolve="woodbury")
    st0 = lp.init_state(prob, cfg)
    a = pallas_stream.lp_window_stream(st0, prob, cfg, 10,
                                       skip_cvg_at=0, interpret=True)
    cfg16 = cfg.replace(ginv_dtype="bfloat16")
    st16 = lp.init_state(prob, cfg16)
    assert st16.ginv.dtype == jnp.bfloat16
    b = pallas_stream.lp_window_stream(st16, prob, cfg16, 10,
                                       skip_cvg_at=0, interpret=True)
    ax, bx = np.asarray(a.x), np.asarray(b.x)
    assert np.isfinite(bx).all()
    # pointwise agreement decays chaotically (CLAUDE.md: never compare
    # iterates); gate on the mean deviation staying at the inexact-
    # solve scale, not on the tail
    assert np.abs(ax - bx).mean() < 0.1, np.abs(ax - bx).mean()
