"""ops/pallas_symm: triangular-read symmetric matvec vs dense einsum."""

import numpy as np
import jax.numpy as jnp

from lpbox_admm_tpu.ops import pallas_symm


def _sym(rng, B, m):
    A = rng.randn(B, m, m).astype(np.float32)
    return (A + A.transpose(0, 2, 1)) / 2


def test_block_coords_exact():
    import jax
    ls = jnp.arange(20000, dtype=jnp.int32)
    i, j = jax.jit(pallas_symm._block_coords)(ls)
    i, j = np.asarray(i), np.asarray(j)
    want_i, want_j = [], []
    ii = 0
    for l in range(20000):
        while (ii + 1) * (ii + 2) // 2 <= l:
            ii += 1
        want_i.append(ii)
        want_j.append(l - ii * (ii + 1) // 2)
    np.testing.assert_array_equal(i, want_i)
    np.testing.assert_array_equal(j, want_j)


def test_symm_matvec_matches_dense():
    rng = np.random.RandomState(0)
    for B, m, bm in [(2, 256, 128), (3, 640, 128), (1, 128, 128),
                     (2, 384, 128)]:
        G = _sym(rng, B, m)
        v = rng.randn(B, m).astype(np.float32)
        Gp = pallas_symm.pack_tril_blocks(jnp.asarray(G), bm)
        assert Gp.shape == ((m // bm) * (m // bm + 1) // 2, B, bm, bm)
        got = np.asarray(pallas_symm.symm_matvec(Gp, jnp.asarray(v), bm))
        want = np.einsum("bij,bj->bi", G, v)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pack_tril_roundtrip_diag():
    rng = np.random.RandomState(1)
    B, m, bm = 2, 384, 128
    G = _sym(rng, B, m)
    Gp = np.asarray(pallas_symm.pack_tril_blocks(jnp.asarray(G), bm))
    # diagonal blocks land at l = i(i+1)/2 + i
    for i in range(m // bm):
        l = i * (i + 1) // 2 + i
        np.testing.assert_array_equal(
            Gp[l], G[:, i * bm:(i + 1) * bm, i * bm:(i + 1) * bm])
