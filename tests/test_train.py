"""Training-path test: the seg-detection objective is minimizable
end-to-end (gradients flow through backbone, heads, and proto)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from rt3d.models.yolo.model import YoloSeg
from rt3d.models.yolo.postprocess import anchor_grid
from rt3d.train.step import make_train_step


def _targets_for_box(model, box, cls_id, nc):
    """Dense targets: anchors inside `box` are positives."""
    a = model.num_anchors
    pts, strides = anchor_grid(model.input_hw)
    px = np.asarray(pts[:, 0]) * np.asarray(strides)
    py = np.asarray(pts[:, 1]) * np.asarray(strides)
    x1, y1, x2, y2 = box
    inside = (px >= x1) & (px < x2) & (py >= y1) & (py < y2)
    cls = np.zeros((a, nc), np.float32)
    cls[inside, cls_id] = 1.0
    ltrb = np.stack(
        [px - x1, py - y1, x2 - px, y2 - py], axis=-1
    ) / np.asarray(strides)[:, None]
    ltrb = np.clip(ltrb, 0, 15.0 - 1e-3).astype(np.float32)
    return cls, ltrb, inside.astype(np.float32)


def test_overfit_single_box():
    nc = 4
    model = YoloSeg(variant="n", num_classes=nc, input_hw=(64, 96))
    init_fn, step_fn = make_train_step(model, optax.adam(2e-3))
    state = init_fn(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32)
    img[:, 20:48, 30:70] += 1.0  # bright object region
    cls_t, box_t, w = _targets_for_box(model, (30, 20, 70, 48), 2, nc)
    mask_t = np.zeros((1, 16, 24), np.float32)
    mask_t[:, 5:12, 7:18] = 1.0

    batch = {
        "images": jnp.asarray(img),
        "cls": jnp.asarray(cls_t)[None],
        "box": jnp.asarray(box_t)[None],
        "box_w": jnp.asarray(w)[None],
        "mask": jnp.asarray(mask_t),
    }
    losses, cls_hist = [], []
    for _ in range(200):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
        cls_hist.append(float(metrics["cls"]))
    assert np.isfinite(losses).all()
    # the DFL box CE has an entropy floor (soft two-bin targets), so total
    # loss halves rather than vanishes; classification drives toward its
    # own floor (sum/num_pos normalization keeps ~500 negative-anchor BCE
    # terms over ~18 positives in the metric, so the absolute value stays
    # O(1) even converged — assert the DECREASE, not an absolute endpoint;
    # fp partitioning differences across device counts perturb trajectories)
    assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])
    assert cls_hist[-1] < 0.15 * cls_hist[0], (cls_hist[0], cls_hist[-1])

    # the trained model should now score the positive region's class higher
    from rt3d.models.yolo.postprocess import decode_predictions

    box_l, cls_l, _, _ = model.forward(state.params, jnp.asarray(img))
    _, scores = decode_predictions(model, box_l, cls_l)
    s = np.asarray(scores[0])
    pos = w > 0
    assert s[pos, 2].mean() > 2 * s[~pos, 2].mean()


def test_train_checkpoint_resume_bitexact(tmp_path):
    """Mid-run checkpoint -> resume continues the EXACT trajectory (the
    whole optimizer state is explicit pytree data; nothing hides)."""
    from rt3d.runtime.checkpoint import load_pytree, save_pytree

    nc = 4
    model = YoloSeg(variant="n", num_classes=nc, input_hw=(64, 96))
    init_fn, step_fn = make_train_step(model, optax.adamw(1e-3))
    state = init_fn(jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32)
    cls_t, box_t, w = _targets_for_box(model, (30, 20, 70, 48), 1, nc)
    batch = {
        "images": jnp.asarray(img),
        "cls": jnp.asarray(cls_t)[None],
        "box": jnp.asarray(box_t)[None],
        "box_w": jnp.asarray(w)[None],
        "mask": jnp.zeros((1, 16, 24), jnp.float32),
    }
    for _ in range(3):
        state, _ = step_fn(state, batch)
    ckpt = str(tmp_path / "train.npz")
    save_pytree(ckpt, state)

    lossesA = []
    for _ in range(3):
        state, m = step_fn(state, batch)
        lossesA.append(float(m["loss"]))

    resumed = load_pytree(ckpt, jax.eval_shape(init_fn, jax.random.PRNGKey(0)))
    assert int(resumed.step) == 3
    lossesB = []
    for _ in range(3):
        resumed, m = step_fn(resumed, batch)
        lossesB.append(float(m["loss"]))
    np.testing.assert_array_equal(np.asarray(lossesA), np.asarray(lossesB))


def test_photometric_augment_bounds_and_determinism():
    from rt3d.train.augment import photometric_augment

    key = jax.random.PRNGKey(3)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 48, 3))
    a = photometric_augment(key, imgs)
    b = photometric_augment(key, imgs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.min(a)) >= 0.0 and float(jnp.max(a)) <= 1.0
    # different keys actually jitter
    c = photometric_augment(jax.random.PRNGKey(4), imgs)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_random_hflip_is_geometry_exact():
    """Flipping the IMAGE and flipping the TARGETS commute: dense targets
    built from mirrored masks equal the flipped dense targets built from
    the original masks (pad_w == 0 for this 2:1 aspect input)."""
    from rt3d.models.yolo.model import YoloSeg
    from rt3d.models.yolo.postprocess import letterbox_params
    from rt3d.train.augment import anchor_flip_perm, random_hflip
    from rt3d.train.data import targets_for_masks

    hw, input_hw = (180, 320), (96, 160)
    meta = letterbox_params(hw, input_hw)
    assert (input_hw[1] - meta.new_hw[1]) == 0  # symmetric (zero) pad
    rng = np.random.default_rng(0)
    masks = np.zeros((2, *hw), bool)
    masks[0, 40:90, 60:130] = True
    masks[1, 100:150, 200:290] = True
    classes = np.array([39, 41])
    t = targets_for_masks(masks, classes, meta, input_hw, 80, 4)
    t_flip_direct = targets_for_masks(
        masks[:, :, ::-1], classes, meta, input_hw, 80, 4)

    perm = jnp.asarray(anchor_flip_perm(input_hw))
    batch = {k: jnp.asarray(v)[None] for k, v in t.items() if k != "cls"}
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, *input_hw, 3))
    # p=1: always flip
    out_img, out_t = random_hflip(jax.random.PRNGKey(1), imgs, batch,
                                  perm, input_hw[1], p=1.0)
    np.testing.assert_array_equal(
        np.asarray(out_img[0]), np.asarray(imgs[0, :, ::-1, :]))
    # pixel mirroring maps centre x -> sw-1-x while the continuous mirror
    # is sw-x: the on-mask anchor constraint can flip assignment for the
    # single anchor column AT a mask edge. Anchors must agree away from
    # that 1-px parity band, and boxes must agree wherever both assign.
    w_a = np.asarray(out_t["box_w"][0]) > 0
    w_b = t_flip_direct["box_w"] > 0
    union = (w_a | w_b).sum()
    agree = (w_a & w_b)
    assert (w_a != w_b).sum() <= max(2, 0.1 * union), (w_a.sum(), w_b.sum())
    np.testing.assert_allclose(
        np.asarray(out_t["box"][0])[agree], t_flip_direct["box"][agree],
        atol=1e-5)
    # nearest-sampled proto masks can differ on BOUNDARY cells only: at
    # ratio 0.5 every sample position lands exactly on x.5, so the
    # round-half-even tie resolves one pixel apart under mirroring — a
    # <=1-sample edge effect at 8x-downsampled resolution, immaterial as
    # supervision. Interior must agree.
    diff = np.abs(np.asarray(out_t["inst_mask"][0])
                  - t_flip_direct["inst_mask"])
    assert diff.mean() < 0.02, diff.mean()
    np.testing.assert_allclose(
        np.asarray(out_t["inst_box"][0]), t_flip_direct["inst_box"],
        atol=1e-4)
