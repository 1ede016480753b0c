"""CifarNet victim model (flax).

Re-implementation of the reference's frozen CIFAR-10 classifier
(SparseAttack/SparseAttack/model.py:3-37): 4 valid convs (3->64->64,
pool, 64->128->128, pool) + 3 FC (3200->256->256->10) with ReLU and
dropout 0.5 between fc1 and fc2 (inactive in the frozen/eval attack
setting).

The reference loads pretrained ``cifar_best.pth`` weights, which the
repo does not ship; this module therefore also provides
``load_torch_state_dict`` for users who have the .pth, plus
``train_cifarnet`` to fit a victim from data.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


class CifarNet(nn.Module):
    """Input (B, 3, 32, 32) in NCHW (matching the reference's layout);
    returns logits (B, 10)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.transpose(x, (0, 2, 3, 1))           # NCHW -> NHWC
        x = nn.relu(nn.Conv(64, (3, 3), padding="VALID", name="conv1")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding="VALID", name="conv2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(128, (3, 3), padding="VALID", name="conv3")(x))
        x = nn.relu(nn.Conv(128, (3, 3), padding="VALID", name="conv4")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # torch's view(-1, 3200) flattens NCHW: transpose back first
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(256, name="fc1")(x))
        if train:
            x = nn.Dropout(0.5, deterministic=False)(x)
        x = nn.relu(nn.Dense(256, name="fc2")(x))
        return nn.Dense(10, name="fc3")(x)


def init_victim(seed: int = 0) -> Tuple[CifarNet, Dict[str, Any]]:
    model = CifarNet()
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 3, 32, 32)))
    return model, variables


def load_torch_state_dict(state_dict: Dict[str, "np.ndarray"]
                          ) -> Dict[str, Any]:
    """Convert a torch CifarNet state dict (reference model.py) into
    flax variables.  Conv weights (out,in,kh,kw) -> (kh,kw,in,out);
    linear weights (out,in) -> (in,out)."""

    def conv(name):
        w = np.asarray(state_dict[f"{name}.weight"])
        b = np.asarray(state_dict[f"{name}.bias"])
        return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b)}

    def dense(name):
        w = np.asarray(state_dict[f"{name}.weight"])
        b = np.asarray(state_dict[f"{name}.bias"])
        return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}

    params = {
        "conv1": conv("conv1"), "conv2": conv("conv2"),
        "conv3": conv("conv3"), "conv4": conv("conv4"),
        "fc1": dense("fc1"), "fc2": dense("fc2"), "fc3": dense("fc3"),
    }
    return {"params": params}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load the reference's cifar_best.pth directly (torch-cpu)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return load_torch_state_dict(sd)


def train_cifarnet(images: np.ndarray, labels: np.ndarray,
                   epochs: int = 5, batch: int = 64, lr: float = 1e-3,
                   seed: int = 0) -> Tuple[CifarNet, Dict[str, Any]]:
    """Fit a victim classifier from (N,3,32,32) images in [0,1] (the
    attack normalizes with mean 0.5/std 1, main_mha.py:33-36)."""
    import optax

    model, variables = init_victim(seed)
    params = variables["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    rng = np.random.RandomState(seed)

    @jax.jit
    def step(params, opt_state, xb, yb, dropout_rng):
        def loss_fn(p):
            logits = model.apply({"params": p}, xb - 0.5, train=True,
                                 rngs={"dropout": dropout_rng})
            onehot = jax.nn.one_hot(yb, 10)
            return -jnp.mean(jnp.sum(
                onehot * jax.nn.log_softmax(logits), axis=-1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed + 1)
    n = images.shape[0]
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - batch + 1, batch):
            idx = order[i:i + batch]
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(images[idx]),
                jnp.asarray(labels[idx]), sub)
    return model, {"params": params}
