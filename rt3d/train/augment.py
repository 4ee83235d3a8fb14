"""Device-side photometric augmentation for detector training.

The synthetic dataset is small (a few hundred rendered frames — rendering
is host-bound), so the classifier head memorizes per-scene appearance
(round-4 smoke run: train cls BCE 0.0003 while held-out scenes drew ~15
false positives/frame).  Per-STEP random photometric jitter makes every
epoch see each frame under a fresh gain / per-channel balance / bias /
sensor-noise draw — geometry-free augmentation, so the dense box/mask
targets stay exact.  Runs inside the jitted train step on the staged
letterboxed images (pixels in [0, 1]).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from rt3d.models.yolo.model import STRIDES


def photometric_augment(key: jax.Array, images: jax.Array) -> jax.Array:
    """(B, H, W, 3) images in [0, 1] -> jittered images, same shape.

    Per sample: global gain U(0.7, 1.3), per-channel scale U(0.9, 1.1),
    brightness bias U(-0.06, 0.06), Gaussian pixel noise with per-sample
    sigma U(0, 0.03).  Ranges bracket the hard domain's own per-scene
    lighting gain (0.75-1.15) and sensor noise (0.01-0.03) so the model
    is trained across a superset of the rendered conditions.
    """
    b = images.shape[0]
    k_gain, k_ch, k_bias, k_sig, k_noise = jax.random.split(key, 5)
    gain = jax.random.uniform(k_gain, (b, 1, 1, 1), minval=0.7, maxval=1.3)
    ch = jax.random.uniform(k_ch, (b, 1, 1, 3), minval=0.9, maxval=1.1)
    bias = jax.random.uniform(k_bias, (b, 1, 1, 1), minval=-0.06,
                              maxval=0.06)
    sigma = jax.random.uniform(k_sig, (b, 1, 1, 1), minval=0.0, maxval=0.03)
    noise = jax.random.normal(k_noise, images.shape, images.dtype)
    out = images * gain * ch + bias + noise * sigma
    return jnp.clip(out, 0.0, 1.0)


def anchor_flip_perm(input_hw) -> np.ndarray:
    """(A,) permutation of the flattened anchor index under a horizontal
    image mirror: within each stride level's (gh, gw) grid, column j maps
    to gw-1-j. Host-side, computed once."""
    h, w = input_hw
    parts, base = [], 0
    for s in STRIDES:
        gh, gw = h // s, w // s
        idx = (np.arange(gh * gw).reshape(gh, gw)[:, ::-1].reshape(-1)
               + base)
        parts.append(idx)
        base += gh * gw
    return np.concatenate(parts).astype(np.int32)


def random_hflip(key: jax.Array, images: jax.Array, targets: dict,
                 perm: jax.Array, input_w: int, p: float = 0.5):
    """Per-sample horizontal flip of images AND dense targets.

    Geometry-exact: anchors permute by `anchor_flip_perm`, per-anchor ltrb
    distances swap l<->r, instance masks mirror, instance boxes reflect
    about the input width.  Only valid when the letterbox pad is
    horizontally symmetric (pad_w even — true for the shipped 384x640
    input from 720x1280, where pad_w = 0); the caller checks.
    Returns (images, targets) with the same structure.
    """
    b = images.shape[0]
    flip = jax.random.bernoulli(key, p, (b,))

    def sel(orig, flipped):
        fl = flip.reshape((b,) + (1,) * (orig.ndim - 1))
        return jnp.where(fl, flipped, orig)

    out_img = sel(images, images[:, :, ::-1, :])
    t = dict(targets)
    box_f = targets["box"][:, perm][:, :, jnp.asarray([2, 1, 0, 3])]
    t["box"] = sel(targets["box"], box_f)
    t["box_w"] = sel(targets["box_w"], targets["box_w"][:, perm])
    t["inst_id"] = sel(targets["inst_id"], targets["inst_id"][:, perm])
    t["inst_mask"] = sel(targets["inst_mask"],
                         targets["inst_mask"][..., ::-1])
    ib = targets["inst_box"]
    ib_f = jnp.stack([input_w - ib[..., 2], ib[..., 1],
                      input_w - ib[..., 0], ib[..., 3]], axis=-1)
    # keep PADDED instance slots all-zero (mirroring zeros would invent
    # a degenerate [W, 0, W, 0] box; downstream ignores weight-0 slots,
    # but canonical zeros keep flip(flip(x)) == x)
    ib_f = jnp.where((jnp.abs(ib).sum(-1, keepdims=True) > 0), ib_f,
                     jnp.zeros_like(ib_f))
    t["inst_box"] = sel(ib, ib_f)
    return out_img, t
