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
