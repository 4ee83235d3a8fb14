"""BoT-SORT extensions: appearance (ReID) association + camera-motion
compensation, vectorized on the fixed-slot tracker state.

Reference: `trackers/botsort.yaml` (sparseOptFlow GMC, `with_reid: True`,
proximity 0.5, appearance 0.25 — `botsort.yaml:14-19`). BoT-SORT layers two
mechanisms over ByteTrack:

* appearance gating in the first association: embedding cosine distance
  halved, clipped to 1 beyond `appearance_thresh` or where IoU proximity
  fails, then `cost = min(iou_cost, appearance_cost)`;
* per-track smoothed appearance features (EMA, alpha 0.9, re-normalized);
* GMC: predicted track boxes are warped by the estimated inter-frame
  camera motion before matching. The original uses sparse optical flow +
  RANSAC affine on the CPU; here we estimate translation by FFT phase
  correlation on a downsampled grayscale pair — fully jittable, exact for
  the dominant (pan/shake) motion component. Documented divergence:
  rotation/zoom components of camera motion are not compensated.

Detection embeddings come from `rt3d.models.yolo`'s neck features pooled at
box centres (see `pipeline.step.Pipeline.detect` with
`TrackerConfig.with_reid`) instead of an external ReID network.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def embedding_distance(track_emb: jax.Array, det_emb: jax.Array) -> jax.Array:
    """Cosine distance matrix (S, D); embeddings are L2-normalized."""
    sim = jnp.einsum(
        "se,de->sd", track_emb, det_emb, preferred_element_type=jnp.float32
    )
    return 1.0 - sim


def botsort_fuse_costs(
    iou_cost: jax.Array,        # (S, D) = 1 - IoU (optionally score-fused)
    emb_cost: jax.Array,        # (S, D) cosine distance
    proximity_thresh: float,
    appearance_thresh: float,
) -> jax.Array:
    """BOTSORT.get_dists fusion: emb/2, clipped to 1 beyond the appearance
    threshold or where IoU proximity fails; final cost = min(iou, emb)."""
    emb = emb_cost / 2.0
    emb = jnp.where(emb > appearance_thresh, 1.0, emb)
    emb = jnp.where(iou_cost > proximity_thresh, 1.0, emb)
    return jnp.minimum(iou_cost, emb)


def update_smooth_features(
    track_emb: jax.Array,     # (S, E)
    det_emb: jax.Array,       # (D, E)
    slot_det: jax.Array,      # (S,) det index matched to each slot, -1 none
    fresh: jax.Array,         # (S,) bool: slot newly created this frame
    alpha: float = 0.9,
) -> jax.Array:
    """EMA feature update (STrack.update_features): new tracks take the
    detection feature, matched tracks blend and re-normalize."""
    d = det_emb.shape[0]
    di = jnp.clip(slot_det, 0, d - 1)
    f_new = det_emb[di]
    matched = slot_det >= 0
    blended = alpha * track_emb + (1 - alpha) * f_new
    blended = blended / jnp.maximum(
        jnp.linalg.norm(blended, axis=-1, keepdims=True), 1e-6
    )
    out = jnp.where(matched[:, None] & ~fresh[:, None], blended, track_emb)
    out = jnp.where(fresh[:, None] & matched[:, None], f_new, out)
    return out


def estimate_translation_gmc(
    prev_gray: jax.Array, cur_gray: jax.Array, max_shift: int = 32
) -> jax.Array:
    """Global translation (dx, dy) in pixels via FFT phase correlation on
    downsampled grayscale frames. Positive values mean the scene content
    moved right/down between prev and cur."""
    f1 = jnp.fft.rfft2(prev_gray.astype(jnp.float32))
    f2 = jnp.fft.rfft2(cur_gray.astype(jnp.float32))
    cross = f1 * jnp.conj(f2)
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-9)
    corr = jnp.fft.irfft2(cross, s=prev_gray.shape)
    h, w = prev_gray.shape
    idx = jnp.argmax(corr)
    dy = (idx // w).astype(jnp.int32)
    dx = (idx % w).astype(jnp.int32)
    dy = jnp.where(dy > h // 2, dy - h, dy)
    dx = jnp.where(dx > w // 2, dx - w, dx)
    dx = jnp.clip(dx, -max_shift, max_shift)
    dy = jnp.clip(dy, -max_shift, max_shift)
    return jnp.stack([-dx, -dy]).astype(jnp.float32)


def apply_gmc_to_tracks(mean: jax.Array, shift_xy: jax.Array) -> jax.Array:
    """Shift predicted track centres by the camera-motion estimate."""
    return mean.at[:, 0].add(shift_xy[0]).at[:, 1].add(shift_xy[1])
