"""Image segmentation adapter: image -> pixel-grid binary QP.

TPU-native equivalent of the reference's image->QP cost builder
(Segmentation/Segmentation/cython/src/image_segmentation_utils.cpp and
the inlined copy in Seg LPboxADMMsolver.cpp:658-810):

* grayscale load + area-preserving resize to ~``num_nodes`` pixels,
  intensities scaled by 1/263 (Seg LPboxADMMsolver.cpp:705-727)
* ``get_unary_cost``: Gaussian log-likelihood fg/bg potentials with
  sigma=0.1, b=0.6, f1=f2=0.2, rounded (utils.cpp:15-41)
* ``get_binary_cost``: neighbour affinities round(3*exp(-(Ii-Ij)^2 /
  sigma_img)) with sigma_img the sample std of the image
  (utils.cpp:134-184)
* ``get_A_b_from_cost``: b = U2 - U1, A = 2(diag(W 1) - W), stored /2,
  constant c = sum U1 (utils.cpp:186-208, solver stores A/2 at :751-758)

Design deltas (documented divergences from reference quirks):
  - the reference's pair generator uses ``a != b`` (utils.cpp:115),
    dropping the two main-diagonal neighbour directions, and mixes
    row-major pair indices with column-major image vectorization
    (utils.cpp:150-152), scrambling the graph for non-square images; we
    build the intended full 8-neighbour grid affinity consistently.
  - A is kept in stencil form (ops/stencil.py): the CG matvec is a
    9-point stencil on the (B, H, W) grid, no sparse matrices.

Output: thresholded PNG via PIL (save_img, Seg :812-837).
"""

from __future__ import annotations

import glob
import math
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from PIL import Image

from ..core.qp import QpProblem
from ..ops.stencil import OFFSETS, build_stencil


def load_image(path: str, num_nodes: int = 10_000) -> np.ndarray:
    """Grayscale load + resize so H*W ~= num_nodes, intensities /263
    (Seg LPboxADMMsolver.cpp:705-727)."""
    img = Image.open(path).convert("L")
    w, h = img.size
    scale = math.sqrt(num_nodes / float(w * h))
    new_w, new_h = round(scale * w), round(scale * h)
    img = img.resize((new_w, new_h), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float64)
    return arr / 263.0


def unary_cost(I: np.ndarray, sigma: float = 0.1, b: float = 0.6,
               f1: float = 0.2, f2: float = 0.2
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Gaussian fg/bg unary potentials (utils.cpp:15-41), rounded as in
    the solver (Seg LPboxADMMsolver.cpp:744).  Returns (alpha_b, alpha_f)
    = (U1, U2) on the image grid."""
    c = math.log(2.0 * math.pi) / 2.0 + math.log(sigma)
    alpha_b = (I - b) ** 2 / (2 * sigma * sigma) + c
    aa = (np.exp(-(I - f1) ** 2 / (2 * sigma * sigma))
          + np.exp(-(I - f2) ** 2 / (2 * sigma * sigma)))
    alpha_f = -np.log(aa + np.finfo(np.float64).eps) + c + math.log(2.0)
    return np.round(alpha_b), np.round(alpha_f)


def binary_weights(I: np.ndarray, lam: float = 3.0) -> np.ndarray:
    """8-neighbour affinity planes (8, H, W):
    w = round(lam * exp(-(Ii - Ij)^2 / sigma_img)) with sigma_img the
    sample std of the image intensities (utils.cpp:134-160)."""
    H, W = I.shape
    sigma = float(np.std(I, ddof=1))
    planes = np.zeros((8, H, W))
    for d, (dr, dc) in enumerate(OFFSETS):
        shifted = np.full((H, W), np.nan)
        r0, r1 = max(0, -dr), min(H, H - dr)
        c0, c1 = max(0, -dc), min(W, W - dc)
        shifted[r0:r1, c0:c1] = I[r0 + dr:r1 + dr, c0 + dc:c1 + dc]
        diff = (I - shifted) ** 2 / sigma
        w = np.round(lam * np.exp(-diff))
        planes[d] = np.where(np.isnan(shifted), 0.0, w)
    return planes


def image_to_qp(I: np.ndarray) -> Tuple[np.ndarray, np.ndarray, float]:
    """Full cost construction for one image.

    Returns (weights (8,H,W) of A' = D - W, linear b (H,W), constant c)
    with A stored /2 as in the reference (org_A = _A/2, Seg :751-758):
    _A = 2(D - W) so A' = D - W; b = U2 - U1; c = sum U1.
    """
    U1, U2 = unary_cost(I)
    w = binary_weights(I)
    b = U2 - U1
    c = float(U1.sum())
    return w, b, c


def make_problem(images: Sequence[np.ndarray],
                 h_pad: Optional[int] = None,
                 w_pad: Optional[int] = None,
                 align: bool = False,
                 dtype=np.float32) -> QpProblem:
    """Batch images of (possibly) different sizes into one padded grid
    QP; padded pixels have zero weights/costs and mask False.

    ``align=True`` additionally pads H to a multiple of 8 and W to a
    multiple of 128 (TPU (8, 128) tile alignment, useful when feeding
    the grids to custom kernels)."""
    B = len(images)
    Hs = [im.shape[0] for im in images]
    Ws = [im.shape[1] for im in images]
    H = h_pad or max(Hs)
    W = w_pad or max(Ws)
    if align:
        H = ((H + 7) // 8) * 8
        W = ((W + 127) // 128) * 128
    weights = np.zeros((B, 8, H, W), dtype=dtype)
    bs = np.zeros((B, H, W), dtype=dtype)
    consts = np.zeros((B,), dtype=dtype)
    mask = np.zeros((B, H, W), dtype=bool)
    for i, im in enumerate(images):
        wi, bi, ci = image_to_qp(im)
        h, w = im.shape
        weights[i, :, :h, :w] = wi
        bs[i, :h, :w] = bi
        consts[i] = ci
        mask[i, :h, :w] = True
    return QpProblem(
        stencil=build_stencil(jnp.asarray(weights)),
        b=jnp.asarray(bs), const=jnp.asarray(consts),
        mask=jnp.asarray(mask))


def load_problem(paths: Sequence[str], num_nodes: int = 10_000,
                 **kw) -> QpProblem:
    return make_problem([load_image(p, num_nodes) for p in paths], **kw)


def reference_image_paths(root: Optional[str] = None) -> List[str]:
    """The 201 images shipped with the reference
    (Segmentation/Segmentation/cython/data/{i}.jpg)."""
    root = root or "/root/reference/Segmentation/Segmentation/cython/data"
    paths = sorted(glob.glob(os.path.join(root, "*.jpg")),
                   key=lambda p: int(os.path.splitext(
                       os.path.basename(p))[0]))
    return paths


def save_img(solution: np.ndarray, mask: np.ndarray, path: str,
             orig_shape: Optional[Tuple[int, int]] = None):
    """Threshold at 0.5 -> {0, 255} PNG (save_img, Seg :812-837).

    ``solution``/``mask`` are one (H, W) grid (padding removed via
    ``orig_shape`` when given).
    """
    img = (np.asarray(solution) >= 0.5).astype(np.uint8) * 255
    if orig_shape is not None:
        img = img[:orig_shape[0], :orig_shape[1]]
    Image.fromarray(img, mode="L").save(path)
