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


def _hann2d(h: int, w: int) -> jax.Array:
    wy = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(h) / (h - 1))
    wx = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(w) / (w - 1))
    return wy[:, None] * wx[None, :]


def _phase_corr_shift(prev: jax.Array, cur: jax.Array, max_shift: int):
    """FFT phase-correlation peak of one grayscale pair.

    Returns ((dx, dy) f32, peak strength f32). Positive = scene content
    moved right/down between prev and cur. A Hann window suppresses the
    spectral leakage of the non-cyclic patch boundaries (without it the
    whitened cross-power spectrum locks onto the frame edges and returns
    zero shift for small patches)."""
    win = _hann2d(*prev.shape)
    f1 = jnp.fft.rfft2(prev.astype(jnp.float32) * win)
    f2 = jnp.fft.rfft2(cur.astype(jnp.float32) * win)
    cross = f1 * jnp.conj(f2)
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-9)
    corr = jnp.fft.irfft2(cross, s=prev.shape)
    h, w = prev.shape
    idx = jnp.argmax(corr)
    peak = corr.reshape(-1)[idx]
    dy = (idx // w).astype(jnp.int32)
    dx = (idx % w).astype(jnp.int32)
    dy = jnp.where(dy > h // 2, dy - h, dy)
    dx = jnp.where(dx > w // 2, dx - w, dx)
    dx = jnp.clip(dx, -max_shift, max_shift)
    dy = jnp.clip(dy, -max_shift, max_shift)
    return jnp.stack([-dx, -dy]).astype(jnp.float32), peak


def estimate_translation_gmc(
    prev_gray: jax.Array, cur_gray: jax.Array, max_shift: int = 32
) -> jax.Array:
    """Global translation (dx, dy) in pixels via FFT phase correlation on
    downsampled grayscale frames."""
    shift, _ = _phase_corr_shift(prev_gray, cur_gray, max_shift)
    return shift


def identity_warp() -> jax.Array:
    return jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)


def translation_warp(shift_xy: jax.Array) -> jax.Array:
    """(2,) shift -> (2, 3) affine warp [A | b] with A = I."""
    return identity_warp().at[:, 2].set(shift_xy)


def estimate_affine_gmc(
    prev_gray: jax.Array,
    cur_gray: jax.Array,
    grid: tuple[int, int] = (3, 4),
    max_shift: int = 24,
    prior_strength: float = 0.05,
) -> jax.Array:
    """Affine camera-motion estimate: (2, 3) warp [A | b] mapping prev-frame
    pixel coordinates to cur-frame coordinates.

    The reference's BoT-SORT config asks for sparseOptFlow GMC
    (`trackers/botsort.yaml:14`): cv2 goodFeaturesToTrack + pyramidal LK +
    RANSAC-estimated partial affine — pointer-chasing host code. The
    TPU-native equivalent: a fixed GRID of patches, batched FFT phase
    correlation per patch (the dense analog of sparse flow — one motion
    vector per patch, peak strength as confidence), then an
    outlier-reweighted weighted least-squares affine fit (two closed-form
    3x3 solves; the smooth analog of RANSAC). Everything is static-shape
    vector math under jit.

    A Tikhonov prior toward identity (weight `prior_strength` of the total
    patch weight) keeps textureless / degenerate frames from producing wild
    warps: with no signal the estimate decays to the identity.
    """
    gy, gx = grid
    h, w = prev_gray.shape
    ph, pw = h // gy, w // gx
    hc, wc = gy * ph, gx * pw

    def patches(img):
        return (
            img[:hc, :wc].reshape(gy, ph, gx, pw)
            .transpose(0, 2, 1, 3).reshape(gy * gx, ph, pw)
        )

    p_prev, p_cur = patches(prev_gray), patches(cur_gray)
    # remove per-patch DC so flat-ish patches don't correlate at 0-lag
    p_prev = p_prev - p_prev.mean(axis=(1, 2), keepdims=True)
    p_cur = p_cur - p_cur.mean(axis=(1, 2), keepdims=True)
    shifts, peaks = jax.vmap(
        lambda a, b: _phase_corr_shift(a, b, max_shift)
    )(p_prev, p_cur)  # (P, 2), (P,)

    cy = (jnp.arange(gy, dtype=jnp.float32) + 0.5) * ph
    cx = (jnp.arange(gx, dtype=jnp.float32) + 0.5) * pw
    centers = jnp.stack(
        [jnp.tile(cx, gy), jnp.repeat(cy, gx)], axis=-1
    )  # (P, 2) as (x, y)
    targets = centers + shifts  # where each patch centre landed

    x1 = jnp.concatenate(
        [centers, jnp.ones((centers.shape[0], 1), jnp.float32)], axis=-1
    )  # (P, 3)
    w0 = jnp.maximum(peaks, 0.0)

    # identity-prior coefficient rows: x-row -> (1,0,0), y-row -> (0,1,0)
    prior = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]], jnp.float32)

    def solve(weights):
        lam = prior_strength * jnp.sum(weights) + 1e-6
        n = x1.T @ (weights[:, None] * x1) + lam * jnp.eye(3, dtype=jnp.float32)
        rhs = x1.T @ (weights[:, None] * targets) + lam * prior
        return jnp.linalg.solve(n, rhs)  # (3, 2): rows [a_x a_y; b_x b_y; t]

    coef = solve(w0)
    # one robust reweighting pass (soft RANSAC): downweight patches whose
    # motion disagrees with the consensus warp
    resid = jnp.sum((x1 @ coef - targets) ** 2, axis=-1)
    sigma2 = jnp.maximum(jnp.median(resid), 1.0)
    coef = solve(w0 / (1.0 + resid / sigma2))
    return coef.T  # (2, 3) = [A | b]


def rescale_warp(warp: jax.Array, scale: float, offset_xy) -> jax.Array:
    """Convert a warp estimated in DOWNSAMPLED-LETTERBOXED coordinates
    (p_small = scale * p_orig + offset) into ORIGINAL-pixel coordinates.

    For a scalar scale the linear part is conjugation-invariant; only the
    translation transforms: b_orig = (A @ offset + b - offset) / scale."""
    a = warp[:, :2]
    b = warp[:, 2]
    o = jnp.asarray(offset_xy, jnp.float32)
    b_o = (a @ o + b - o) / scale
    return jnp.concatenate([a, b_o[:, None]], axis=1)


def apply_gmc_to_tracks(mean: jax.Array, warp: jax.Array,
                        cov: jax.Array = None):
    """Warp predicted track states by the camera-motion estimate.

    ``warp`` is a (2, 3) affine [A | b] (use `translation_warp` for pure
    shifts). On the xyah Kalman state: centres map affinely, heights scale
    by sqrt(|det A|) (aspect is scale-invariant), and velocities rotate by
    A without translation — the same treatment BoT-SORT's multi_gmc applies
    to its state. When ``cov`` is given, it transforms as M P M^T with M
    the (8, 8) linearization of the same map (multi_gmc's
    ``R8x8 @ cov @ R8x8.T``); without it the uncertainty ellipses would
    stay oriented to the pre-warp frame under camera rotation."""
    a = warp[:, :2]
    b = warp[:, 2]
    c = mean[:, 0:2] @ a.T + b
    scale = jnp.sqrt(jnp.abs(jnp.linalg.det(a)))
    v = mean[:, 4:6] @ a.T
    new_mean = (
        mean.at[:, 0:2].set(c)
        .at[:, 3].mul(scale)
        .at[:, 4:6].set(v)
        .at[:, 7].mul(scale)
    )
    if cov is None:
        return new_mean
    m = jnp.eye(8, dtype=cov.dtype)
    m = m.at[0:2, 0:2].set(a)
    m = m.at[3, 3].set(scale)
    m = m.at[4:6, 4:6].set(a)
    m = m.at[7, 7].set(scale)
    new_cov = jnp.einsum("ij,njk,lk->nil", m, cov, m)
    return new_mean, new_cov
