"""CA generator semantics (adapters/ca.py): the bundle_mask indexing
ruling and the CPLEX .lp interop format."""

import numpy as np

from lpbox_admm_tpu.adapters import ca


def test_choose_next_item_uses_bundle_rows():
    """Pin the RULING of VERDICT r3 weak 6: the next-item distribution
    averages the compatibility rows of the items IN THE BUNDLE
    (boolean-mask semantics), not rows 0/1 repeated (the reference's
    int fancy indexing at generate_instances.py:186)."""
    rng = np.random.RandomState(7)
    n = 12
    compats = np.triu(rng.rand(n, n), k=1)
    compats = compats + compats.T
    compats = compats / compats.sum(1)
    interests = rng.rand(n)
    bundle_mask = np.zeros(n)
    bundle_mask[[3, 8, 9]] = 1          # bundle rows != {0, 1}

    want = (1 - bundle_mask) * interests \
        * compats[[3, 8, 9], :].mean(axis=0)
    want = want / want.sum()
    # the reference's int-indexing distribution, for contrast
    ref_quirk = (1 - bundle_mask) * interests \
        * compats[bundle_mask.astype(int), :].mean(axis=0)
    ref_quirk = ref_quirk / ref_quirk.sum()
    assert not np.allclose(want, ref_quirk)   # the divergence is real

    # pin: with a fixed rng state, the draw matches the boolean-mask
    # distribution's draw exactly
    got = ca.choose_next_item(bundle_mask, interests, compats,
                              np.random.RandomState(123))
    want_draw = np.random.RandomState(123).choice(n, p=want)
    quirk_draw = np.random.RandomState(123).choice(n, p=ref_quirk)
    assert got == want_draw
    # guard the guard: the two distributions disagree on this draw
    assert want_draw != quirk_draw


def test_lp_file_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    prices, C = ca.generate_cauction(rng, n_items=10, n_bids=25)
    path = str(tmp_path / "inst.lp")
    ca.write_instance_lp(path, prices, C)
    p2, C2 = ca.read_instance_lp(path)
    np.testing.assert_allclose(p2, prices, rtol=1e-12)
    np.testing.assert_array_equal(C2, C)
    # format spot checks (reference emits maximize/subject to/binary
    # sections, generate_instances.py:317-334)
    text = open(path).read()
    assert text.startswith("maximize\nOBJ:")
    assert "subject to" in text and "binary" in text
    assert text.count("<= 1") == C.shape[0]


def test_write_instance_emits_lp(tmp_path):
    rng = np.random.RandomState(4)
    prices, C = ca.generate_cauction(rng, n_items=8, n_bids=20)
    prefix = str(tmp_path / "instance_1")
    ca.write_instance(prefix, prices, C)
    import os
    assert os.path.exists(prefix + ".lp")
    b2, C2 = ca.read_instance(prefix)
    p3, C3 = ca.read_instance_lp(prefix + ".lp")
    np.testing.assert_allclose(p3, b2, rtol=1e-6)
    np.testing.assert_array_equal(C3, C2)
