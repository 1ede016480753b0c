"""Tests for the sparse adversarial attack silo."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lpbox_admm_tpu.adapters import attack, slic
from lpbox_admm_tpu.config import ATTACK_CONFIG, PolicyConfig
from lpbox_admm_tpu.models.cifarnet import (CifarNet, init_victim,
                                            load_torch_state_dict)
from lpbox_admm_tpu.models.policy import build_policy

CIFAR_DIR = "/root/reference/SparseAttack/SparseAttack/data"


def load_cifar_images(n=2):
    import glob
    from PIL import Image
    paths = sorted(glob.glob(CIFAR_DIR + "/*.png"))[:n]
    imgs, labels = [], []
    for p in paths:
        im = np.asarray(Image.open(p).convert("RGB"),
                        dtype=np.float32) / 255.0
        imgs.append(im.transpose(2, 0, 1))
        # filename convention {label}_{idx}.png (main_mha.py:80-87)
        labels.append(int(p.split("/")[-1].split("_")[0]))
    return np.stack(imgs), np.array(labels), paths


def test_cifarnet_shapes():
    model, variables = init_victim()
    x = jnp.zeros((2, 3, 32, 32))
    logits = model.apply(variables, x)
    assert logits.shape == (2, 10)


def test_cifarnet_matches_torch():
    """Weight-converted flax CifarNet agrees with the torch reference
    architecture on random weights + random input."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    class TorchCifarNet(nn.Module):
        # independent re-statement of the reference architecture
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 3)
            self.conv2 = nn.Conv2d(64, 64, 3)
            self.conv3 = nn.Conv2d(64, 128, 3)
            self.conv4 = nn.Conv2d(128, 128, 3)
            self.pool = nn.MaxPool2d(2, 2)
            self.relu = nn.ReLU()
            self.fc1 = nn.Linear(3200, 256)
            self.fc2 = nn.Linear(256, 256)
            self.fc3 = nn.Linear(256, 10)

        def forward(self, x):
            x = self.relu(self.conv1(x))
            x = self.pool(self.relu(self.conv2(x)))
            x = self.relu(self.conv3(x))
            x = self.pool(self.relu(self.conv4(x)))
            x = x.reshape(-1, 3200)
            x = self.relu(self.fc1(x))
            x = self.relu(self.fc2(x))
            return self.fc3(x)

    tm = TorchCifarNet().eval()
    variables = load_torch_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    model = CifarNet()
    x = np.random.RandomState(0).rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        expected = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_slic_partition():
    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    seg = slic.slic(img, n_segments=150)
    assert seg.shape == (32, 32)
    K = seg.max() + 1
    assert 50 <= K <= 200
    B = slic.segment_masks(img, n_segments=150)
    assert B.shape == (K, 3, 32, 32)
    # masks partition the image: each pixel in exactly one mask
    np.testing.assert_allclose(B.sum(axis=0), 1.0)


def test_cw_loss_zero_when_confidently_fooled():
    model, variables = init_victim()
    imgs, labels, _ = load_cifar_images(1)
    images = jnp.asarray(imgs)
    # target = current prediction => other_max - real < 0 => loss 0
    pred = int(jnp.argmax(model.apply(
        variables, attack.normalize(images)), -1)[0])
    loss = attack.cnn_loss(model, variables, images,
                           jnp.array([pred]), jnp.zeros_like(images),
                           jnp.ones_like(images), ATTACK_CONFIG)
    assert float(loss[0]) == 0.0


def test_group_shrink_kills_small_groups():
    B = jnp.zeros((1, 2, 1, 2, 2))
    B = B.at[0, 0, 0, 0, :].set(1.0)     # group 0: first row
    B = B.at[0, 1, 0, 1, :].set(1.0)     # group 1: second row
    C = jnp.array([[[[10.0, 10.0], [1e-4, 1e-4]]]])
    y3 = attack.group_shrink(C, B, rho3=1.0, lambda2=1e-2)
    # big group survives (slightly shrunk), tiny group zeroed
    assert float(y3[0, 0, 0, 0]) > 9.9
    assert float(y3[0, 0, 1, 0]) == 0.0


@pytest.fixture(scope="module")
def small_attack_setup():
    imgs, labels, _ = load_cifar_images(2)
    model, variables = init_victim(seed=3)
    Bm = np.stack([slic.segment_masks(
        (im.transpose(1, 2, 0) * 255).astype(np.uint8), n_segments=40)
        for im in imgs])
    # pad segment counts to the max
    S = max(b.shape[0] for b in Bm) if Bm.ndim == 1 else Bm.shape[1]
    targets = (labels + 1) % 10
    nw = np.ones_like(imgs)
    return model, variables, imgs, targets, Bm, nw


def test_attack_contract_cifarnet(small_attack_setup):
    """Shortened attack against the CifarNet victim: output contract
    (binary G, L0 <= ~k, bounded pixels).  Success is not required --
    a random-init victim has near-zero gradients (the reference attacks
    a trained net)."""
    model, variables, imgs, targets, Bm, nw = small_attack_setup
    cfg = ATTACK_CONFIG.replace(maxIter_e=200, maxIter_g=60,
                                lambda1_search_times=2, k=200)
    res = attack.attack_with_search(
        model, variables, jnp.asarray(imgs), jnp.asarray(targets),
        jnp.asarray(Bm), jnp.asarray(nw), cfg)
    assert res["G"].shape == imgs.shape
    assert set(np.unique(res["G"])).issubset({0.0, 1.0})
    assert res["L0"].shape == (2,)
    assert np.all(res["L0"] == res["G"].reshape(2, -1).sum(-1))
    assert np.all(res["Li"] <= 1.0 + 1e-6)
    # the cardinality dual keeps the mask near/below the budget
    assert np.all(res["L0"] <= 1.5 * cfg.k), res["L0"]


def test_attack_succeeds_on_linear_victim(small_attack_setup):
    """End-to-end success check against a victim with informative
    gradients: a linear classifier.  The lambda1 search must find a
    successful sparse attack."""
    import flax.linen as nn

    class LinearNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(10)(x.reshape(x.shape[0], -1))

    _, _, imgs, targets, Bm, nw = small_attack_setup
    model = LinearNet()
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 3, 32, 32)))
    # the cardinality dual needs ~1000+ G iterations to equilibrate at
    # sum(G) ~= k; short budgets collapse G to zero
    # 6 search rounds (the reference default) escalate lambda1 to ~100,
    # which the weak linear gradients need
    cfg = ATTACK_CONFIG.replace(maxIter_e=400, maxIter_g=1500,
                                lambda1_search_times=6, k=200)
    res = attack.attack_with_search(
        model, variables, jnp.asarray(imgs), jnp.asarray(targets),
        jnp.asarray(Bm), jnp.asarray(nw), cfg)
    assert res["asr"] >= 0.5, (res["asr"], res["lambda1"])
    assert np.all(res["L0"] <= 1.5 * cfg.k)


def test_attack_l2f_policy_path(small_attack_setup):
    """The l2f G-update path runs with an untrained policy (nothing
    reset at high confidence) and returns a valid mask."""
    model, variables, imgs, targets, Bm, nw = small_attack_setup
    pcfg = PolicyConfig(net="mlp", node_size=10, chunk_dim=5,
                        window_mode="chunk", fix_confidence=0.95)
    pmodel = build_policy("mlp")
    pvars = pmodel.init(jax.random.PRNGKey(0), jnp.zeros((2, 10, 5)),
                        train=True)
    cfg = ATTACK_CONFIG.replace(maxIter_e=30, maxIter_g=150, k=200)
    res = attack.attack_single(
        model, variables, jnp.asarray(imgs), jnp.asarray(targets),
        jnp.asarray(Bm), jnp.asarray(nw), cfg,
        jnp.full((2,), cfg.lambda1), use_l2f=True, policy_model=pmodel,
        policy_variables=pvars, pcfg=pcfg)
    G = np.asarray(res["G"])
    assert set(np.unique(G)).issubset({0.0, 1.0})


def test_compute_sensitive_types():
    rng = np.random.RandomState(0)
    img = rng.rand(3, 8, 8).astype(np.float32)
    ones = attack.compute_sensitive(img, "none")
    np.testing.assert_allclose(ones, 1.0)
    for wt in ["variance", "variance_mean", "contrast", "contrast_mean"]:
        w = attack.compute_sensitive(img, wt)
        assert w.shape == img.shape
        assert np.all((w >= 0) & (w <= 1)), wt
        # per-channel min-max normalisation spans [0, 1]
        for k in range(3):
            assert w[k].min() == 0.0 and w[k].max() == 1.0
    try:
        import scipy  # noqa: F401
        w = attack.compute_sensitive(img, "gradient")
        assert np.all((w >= 0) & (w <= 1))
    except ImportError:
        pass
    with pytest.raises(ValueError):
        attack.compute_sensitive(img, "bogus")


def test_cardinality_repair(small_attack_setup):
    """L0 repair on the linear victim: when the mask overshoots the
    budget and the attack still succeeds on the reduced mask, the
    repaired mask has L0 <= k; success never degrades, and no new
    entries activate."""
    import flax.linen as nn

    class LinearNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(10)(x.reshape(x.shape[0], -1))

    _, _, imgs, targets, _, nw = small_attack_setup
    model = LinearNet()
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 3, 32, 32)))
    cfg = ATTACK_CONFIG.replace(maxIter_e=400, k=50)
    rng = np.random.RandomState(7)
    # an overshooting mask: 120 active entries, strong epsilon
    G = np.zeros((2, 3 * 32 * 32), np.float32)
    for i in range(2):
        G[i, rng.choice(3 * 32 * 32, 120, replace=False)] = 1.0
    G = jnp.asarray(G.reshape(imgs.shape))
    eps = jnp.asarray(rng.randn(*imgs.shape).astype(np.float32)) * G
    eps = attack.update_epsilon(model, variables, jnp.asarray(imgs),
                                jnp.asarray(targets), eps, G,
                                jnp.asarray(nw), cfg, finetune=True)
    pred0, _ = attack.predictions(model, variables, jnp.asarray(imgs),
                                  eps, G, cfg)
    G2, eps2 = attack.cardinality_repair(
        model, variables, jnp.asarray(imgs), jnp.asarray(targets),
        eps, G, jnp.asarray(nw), cfg)
    l0_0 = np.asarray(G.reshape(2, -1).sum(-1))
    l0_2 = np.asarray(G2.reshape(2, -1).sum(-1))
    pred2, _ = attack.predictions(model, variables, jnp.asarray(imgs),
                                  eps2, G2, cfg)
    succ0 = np.asarray(pred0) == targets
    succ2 = np.asarray(pred2) == targets
    # never degrades L0 or success
    assert np.all(l0_2 <= l0_0)
    assert np.all(succ2 >= succ0)
    # repaired images meet the budget; unrepaired kept the original mask
    repaired = l0_2 < l0_0
    assert np.all(l0_2[repaired] <= cfg.k)
    assert np.all(l0_2[~repaired] == l0_0[~repaired])
    # no new entries activated
    assert np.all((np.asarray(G2) <= np.asarray(G)))
