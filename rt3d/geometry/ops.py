"""Core padded-buffer point-cloud ops (backprojection, voxel dedupe, crop).

Design notes (TPU-first, not a translation of the reference):

* The reference back-projects by *gathering* depth at `torch.nonzero(mask)`
  indices (`2cam/vision_pipeline_utils.py:19-36`).  On TPU we instead compute
  the back-projection **densely over the whole pixel grid once per camera**
  (pure VPU elementwise work) and treat instance masks as validity planes.
  This keeps every shape static and lets one computation be shared by all
  detections in the frame.

* The reference voxel-downsamples with `round(pc/voxel)*voxel` followed by
  `torch.unique(dim=0)` (`vision_pipeline_utils.py:40-44`), a data-dependent
  shape. We reproduce the exact same voxel semantics (round-half-to-even,
  lexicographically sorted unique output) with ONE shared lexicographic sort
  of quantized voxel keys per camera per frame; every detection's dedupe then
  rides on that sort as a segmented "first-masked-element-per-run" scan.

* Compaction into fixed-capacity output buffers uses cumsum + out-of-bounds
  dropping scatter, so overflow beyond the configured capacity degrades
  gracefully (points dropped, overflow count reported) instead of erroring.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

_INT_SENTINEL = jnp.iinfo(jnp.int32).max


@struct.dataclass
class PointBuffer:
    """A padded point cloud: fixed capacity, `valid` marks live rows.

    ``valid`` is the source of truth: consumers must mask by it, never
    assume live rows are front-contiguous. Most producers in this module do
    compact survivors to the front, but `voxel_downsample_grid` leaves
    holes where window-missed duplicates sorted adjacent to their twin, and
    ``count`` is always a mask sum, not a prefix length.
    """

    points: jax.Array  # (N, 3) float32
    valid: jax.Array   # (N,) bool

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    @property
    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "PointBuffer":
        return PointBuffer(
            points=jnp.zeros((capacity, 3), dtype=dtype),
            valid=jnp.zeros((capacity,), dtype=bool),
        )

    @staticmethod
    def from_dense(points: jax.Array, valid: Optional[jax.Array] = None) -> "PointBuffer":
        if valid is None:
            valid = jnp.ones(points.shape[:-1], dtype=bool)
        return PointBuffer(points=points.astype(jnp.float32), valid=valid)


# ---------------------------------------------------------------------------
# Back-projection & rigid transforms
# ---------------------------------------------------------------------------


def backproject_depth_grid(
    depth: jax.Array,
    fx: jax.Array | float,
    fy: jax.Array | float,
    cx: jax.Array | float,
    cy: jax.Array | float,
) -> Tuple[jax.Array, jax.Array]:
    """Dense pinhole back-projection of a (H, W) depth map.

    Returns ``(xyz, valid)`` with ``xyz: (H, W, 3)`` in the camera frame and
    ``valid: (H, W)`` false where depth is <= 0 / NaN / Inf — the same
    validity rule as the reference gather path
    (`vision_pipeline_utils.py:26`), applied densely.
    """
    h, w = depth.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    z = depth.astype(jnp.float32)
    valid = (z > 0) & jnp.isfinite(z)
    zs = jnp.where(valid, z, 0.0)
    x = (u - cx) * zs / fx
    y = (v - cy) * zs / fy
    return jnp.stack([x, y, zs], axis=-1), valid


def strided_grid_downsample(x: jax.Array, s: int) -> jax.Array:
    """``x[:, ::s, ::s]`` for a (C, H, W) float grid, TPU-fast.

    A lane-strided slice has no fast lowering on TPU — XLA emits a gather
    that runs at ~0.6 GB/s (1.6 ms for 2x720x1280 f32, profiler-measured).
    Rows are regrouped for free via reshape; columns are selected on the
    MXU with a 0/1 selection matrix. With one nonzero per output column and
    HIGHEST precision (exact 3-term bf16 decomposition of f32), every
    FINITE output equals its input bit-for-bit (asserted in
    `tests/test_geometry_ops.py`).

    Non-finite inputs become 0.0: ``NaN*0=NaN`` / ``Inf*0=NaN`` would
    otherwise poison the entire output row through the dot product. Depth
    maps mark invalid pixels with NaN/Inf (`backproject_depth_grid`'s
    validity rule, above), and a 0 depth is rejected by the same
    ``(z > 0) & isfinite(z)`` rule, so for depth grids the substitution is
    validity-preserving.
    """
    if s == 1:
        return x
    c, h, w = x.shape
    if h % s or w % s:
        return x[:, ::s, ::s]
    rows = x.reshape(c, h // s, s, w)[:, :, 0, :]
    rows = jnp.where(jnp.isfinite(rows), rows, jnp.zeros((), x.dtype))
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (w, w // s), 0)
        == s * jax.lax.broadcasted_iota(jnp.int32, (w, w // s), 1)
    ).astype(x.dtype)
    return jnp.einsum(
        "chw,wk->chk", rows, sel, precision=jax.lax.Precision.HIGHEST
    )


def rigid_transform(points: jax.Array, rotation: jax.Array, translation: jax.Array) -> jax.Array:
    """p -> R @ p + t over the last axis (reference `torch.mm(R, p.T).T + t`,
    `vision_pipeline_utils.py:239-240` and the transposed form `:301`).

    Full f32 precision: geometry must not ride the default bf16 matmul path
    (a 3-wide contraction costs nothing on the MXU either way)."""
    rt = jnp.matmul(
        points, rotation.T.astype(points.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    return rt + translation.astype(points.dtype)


def aabb_mask(
    points: jax.Array,
    x_bounds: Tuple[float, float],
    y_bounds: Tuple[float, float],
    z_bounds: Tuple[float, float],
) -> jax.Array:
    """Inclusive axis-aligned bounding-box membership
    (reference `crop_point_cloud_gpu`, `vision_pipeline_utils.py:78-84`)."""
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    return (
        (x >= x_bounds[0]) & (x <= x_bounds[1])
        & (y >= y_bounds[0]) & (y <= y_bounds[1])
        & (z >= z_bounds[0]) & (z <= z_bounds[1])
    )


def point_clouds_equal(a: jax.Array, b: jax.Array) -> jax.Array:
    """Exact array equality (reference `point_clouds_equal`,
    `vision_pipeline_utils.py:62-63` — its fusion-dedup bookkeeping; rt3d's
    fusion tracks matches by slot index instead, see fusion.py)."""
    return jnp.array_equal(a, b)


def masked_centroid(points: jax.Array, valid: jax.Array) -> jax.Array:
    """Mean over valid rows (reference `calculate_centroid`,
    `vision_pipeline_utils.py:74-75`). Returns zeros for empty clouds."""
    vf = valid.astype(points.dtype)[..., None]
    n = jnp.maximum(jnp.sum(vf, axis=-2), 1.0)
    return jnp.sum(points * vf, axis=-2) / n


# ---------------------------------------------------------------------------
# Compaction
# ---------------------------------------------------------------------------


def compact_points(
    points: jax.Array, emit: jax.Array, capacity: int,
    shared_source: bool = False,
) -> Tuple[PointBuffer, jax.Array]:
    """Stream-compact rows of ``points`` where ``emit`` into a fixed-capacity
    buffer. Returns ``(buffer, overflow_count)``. Valid rows are contiguous.

    Default is scatter-based (rank -> row); composed into big jitted
    programs this is ~12 ms faster than the searchsorted gather at our
    sizes. Set ``shared_source=True`` when calling under a `vmap` whose
    batch axis does NOT touch ``points`` — there the scatter would make XLA
    materialize a (batch, N, 3) broadcast of the updates (~19 GB at HD720 x
    20 detections) and the gather form must be used instead.
    """
    del shared_source  # the flag-sort form is safe and fast everywhere
    (x, y, z), count, overflow, valid = compact_scalars(
        emit, (points[:, 0], points[:, 1], points[:, 2]), capacity
    )
    out = jnp.where(valid[:, None], jnp.stack([x, y, z], axis=-1), 0.0)
    return PointBuffer(points=out.astype(points.dtype), valid=valid), overflow


# ---------------------------------------------------------------------------
# Voxel downsampling (exact `round(p/v)*v` + unique semantics)
#
# Two implementations with identical semantics:
#  * packed: quantized (qx,qy,qz) fold into ONE int32 linear key -> a single
#    1-key sort (the hot path; ~2x faster than the 3-key lexicographic sort
#    and it lets the detection mask bits ride the sort as payload). Needs
#    the voxel grid within `bound_m` of the origin to fit 2^31 keys.
#  * lex: 3-key lexicographic `lax.sort`, unbounded coordinates (fallback,
#    auto-selected when the packed grid would overflow int32 — e.g. 1 mm
#    voxels with wide bounds).
# Both emit voxels in lexicographic (qx,qy,qz) order, matching the
# reference's `torch.unique(dim=0)` (`vision_pipeline_utils.py:40-44`).
# ---------------------------------------------------------------------------

DEFAULT_DEDUPE_BOUND_M = 2.56


def packed_cells(voxel_size: float, bound_m: float) -> int:
    """Cells per axis for the packed grid: indices in [-half, half]."""
    import math

    half = int(math.ceil(bound_m / voxel_size))
    return 2 * half + 1


def packed_fits(voxel_size: float, bound_m: float) -> bool:
    n = packed_cells(voxel_size, bound_m)
    return n ** 3 < 2 ** 31 - 1


def _quantize_packed(points: jax.Array, valid: jax.Array, voxel_size: float,
                     bound_m: float):
    """int32 linear voxel key per point; out-of-range/invalid -> sentinel.

    Documented divergence from the reference: points beyond +-bound_m of the
    robot origin are dropped (counted in overflow) instead of kept — the
    workspace crop bounds make this vacuous for every reference config.
    """
    n = packed_cells(voxel_size, bound_m)
    half = (n - 1) // 2
    q = jnp.round(points.astype(jnp.float32) / voxel_size).astype(jnp.int32)
    in_range = jnp.all((q >= -half) & (q <= half), axis=-1) & valid
    qo = q + half
    key = (qo[..., 0] * n + qo[..., 1]) * n + qo[..., 2]
    key = jnp.where(in_range, key, _INT_SENTINEL)
    return key, n, half


def _decode_packed(key: jax.Array, n: int, half: int, voxel_size: float):
    qz = key % n
    qy = (key // n) % n
    qx = key // (n * n)
    q = jnp.stack([qx, qy, qz], axis=-1) - half
    return q.astype(jnp.float32) * voxel_size


def packed2_fits(voxel_size: float, bound_m: float) -> bool:
    """Two-word grid bound: the hi word packs (qx, qy) -> needs n^2 int32.
    At 1 mm this holds out to ~23 m bounds — every reference config fits."""
    n = packed_cells(voxel_size, bound_m)
    return n * n < 2 ** 31 - 1


def _quantize_packed2(points: jax.Array, valid: jax.Array, voxel_size: float,
                      bound_m: float):
    """TWO int32 words per voxel: ``hi = (qx+half)*n + (qy+half)``,
    ``lo = qz + half``. Lexicographic order of (hi, lo) equals lexicographic
    order of (qx, qy, qz), so a 2-operand `lax.sort` replaces the 3-key
    fallback wherever the single-word grid overflows int32 (1 mm voxels,
    BASELINE stretch config) — each sort operand costs ~40% (NOTES.md).
    Out-of-range/invalid rows get the sentinel in BOTH words (sorts last,
    never equal to an in-range pair)."""
    n = packed_cells(voxel_size, bound_m)
    half = (n - 1) // 2
    q = jnp.round(points.astype(jnp.float32) / voxel_size).astype(jnp.int32)
    in_range = jnp.all((q >= -half) & (q <= half), axis=-1) & valid
    qo = q + half
    hi = jnp.where(in_range, qo[..., 0] * n + qo[..., 1], _INT_SENTINEL)
    lo = jnp.where(in_range, qo[..., 2], _INT_SENTINEL)
    return hi, lo, n, half


def _decode_packed2(hi: jax.Array, lo: jax.Array, n: int, half: int,
                    voxel_size: float):
    q = jnp.stack([hi // n, hi % n, lo], axis=-1) - half
    return q.astype(jnp.float32) * voxel_size


def _pair_run_starts(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Run-start flags for a (hi, lo)-sorted key pair."""
    same = (hi == jnp.roll(hi, 1)) & (lo == jnp.roll(lo, 1))
    return jnp.logical_not(same).at[0].set(True)


def lower_bound(c: jax.Array, q: jax.Array) -> jax.Array:
    """First index i with c[i] >= q, for nondecreasing c. Unrolled binary
    search built from plain gathers.

    Why not `jnp.searchsorted` or a scatter: on TPU (measured via profiler
    traces at N ~ 1e6) the searchsorted lowering becomes a `while` op
    costing ~9 ms, and rank-scatters cost ~8.5 ms / 1.8M updates; this
    unrolled form is ~log2(N) vectorized gathers (~0.1 ms), and it is
    vmap-safe (gathers never broadcast their source)."""
    import math

    n = c.shape[0]
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, n, jnp.int32)
    # search interval is [0, n] — n+1 states — plus one guard iteration
    for _ in range(max(1, math.ceil(math.log2(n + 2)) + 1)):
        mid = (lo + hi) // 2
        v = c[jnp.clip(mid, 0, n - 1)]
        ge = v >= q
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    return lo


def _live_block_indices(blk_any: jax.Array, nb_cap: int):
    """(bsafe, bvalid): indices of the first `nb_cap` live blocks in
    ascending order, plus their validity.

    ONE masked-iota single-operand unstable sort (live indices are unique,
    so unstable is deterministic): dead blocks mask to the sentinel and
    sort to the back; the first `nb_cap` sorted entries ARE the live block
    indices in order. Replaces `lower_bound` over the cumsum — a
    log2(nb)-iteration binary search whose per-iteration vector gathers
    cost ~0.21 ms at the masks-path width (chip trace, round 5) vs
    ~0.02 ms for the sort. Selection is bit-identical."""
    nb = blk_any.shape[0]
    idx = jnp.where(blk_any, jnp.arange(nb, dtype=jnp.int32), _INT_SENTINEL)
    (sidx,) = jax.lax.sort((idx,), num_keys=1, is_stable=False)
    if nb >= nb_cap:
        sel = sidx[:nb_cap]
    else:
        sel = jnp.pad(sidx, (0, nb_cap - nb), constant_values=_INT_SENTINEL)
    bvalid = sel != _INT_SENTINEL
    return jnp.clip(sel, 0, nb - 1), bvalid


def compact_scalars(emit: jax.Array, payloads, capacity: int):
    """Compact (N,) arrays by an emit mask into (capacity,) buffers using a
    STABLE flag sort (emitted rows first, order preserved).

    TPU rationale (profiler-measured): every alternative is pointer-chasing
    — `searchsorted` lowers to a ~9 ms `while`, rank-scatters run ~8.5 ms /
    1.8M updates, and random gathers ~34M elem/s (an unrolled binary search
    costs ~1.2 ms PER STEP at 40 K queries). The one thing this chip does
    fast with data-dependent order is `lax.sort` (~2 ms / 230 K rows), so
    compaction IS a sort: key = !emit, payloads ride along.

    Returns (compacted_payload_tuple, count, overflow).
    """
    n = emit.shape[0]
    # flag and rank fused into ONE unique int32 key (emitted rows sort to
    # the front, input order preserved within each class) so the sort can
    # be UNSTABLE — a stable flag sort would carry an implicit iota payload
    # (~+40% per extra operand, NOTES.md). Unique keys make the unstable
    # result identical to the stable one.
    assert n < (1 << 30), "fused flag|rank key needs 2n < 2^31"
    rank = jax.lax.iota(jnp.int32, n)
    key = rank + jnp.where(emit, 0, jnp.int32(n))
    sorted_ops = jax.lax.sort((key, *payloads), num_keys=1, is_stable=False)
    total = jnp.sum(emit.astype(jnp.int32))
    count = jnp.minimum(total, capacity)
    valid = jnp.arange(capacity) < count
    pad = max(capacity - n, 0)
    outs = tuple(
        jnp.pad(op, (0, pad))[:capacity] if pad else op[:capacity]
        for op in sorted_ops[1:]
    )
    return outs, count, jnp.maximum(total - capacity, 0), valid


def compact_scalar(values: jax.Array, emit: jax.Array, capacity: int,
                   fill=0):
    """Single-payload convenience wrapper over `compact_scalars`."""
    (out,), count, overflow, valid = compact_scalars(emit, (values,), capacity)
    out = jnp.where(valid, out, fill).astype(values.dtype)
    return out, count, overflow


def _compact_emitted_keys(key_sorted, emit, capacity, n, half, voxel_size):
    """Compact emitted sorted keys -> decoded snapped coords.

    Emitted keys are UNIQUE and already ascending, so masking the dropped
    rows to the sentinel and re-sorting IS the compaction — a single-operand
    unstable sort, where the generic `compact_scalars` would pay a second
    (rank-key) operand. Under capacity pressure both keep the lex-smallest
    `capacity` keys (ascending truncation == first-emitted truncation)."""
    masked = jnp.where(emit, key_sorted, _INT_SENTINEL)
    (skey,) = jax.lax.sort((masked,), num_keys=1, is_stable=False)
    total = jnp.sum(emit.astype(jnp.int32))
    count = jnp.minimum(total, capacity)
    valid = jnp.arange(capacity) < count
    pts = jnp.where(
        valid[:, None], _decode_packed(skey[:capacity], n, half, voxel_size), 0.0
    )
    return PointBuffer(points=pts, valid=valid), total - count


def _quantize(points: jax.Array, valid: jax.Array, voxel_size: float):
    """Quantize to int32 voxel indices; invalid rows get the int sentinel so
    they sort to the end. `jnp.round` is round-half-to-even, matching
    `torch.round` in the reference (`vision_pipeline_utils.py:42`)."""
    q = jnp.round(points.astype(jnp.float32) / voxel_size).astype(jnp.int32)
    qx = jnp.where(valid, q[..., 0], _INT_SENTINEL)
    qy = jnp.where(valid, q[..., 1], _INT_SENTINEL)
    qz = jnp.where(valid, q[..., 2], _INT_SENTINEL)
    return qx, qy, qz


def segmented_or_scan(word: jax.Array, start: jax.Array) -> jax.Array:
    """Inclusive segmented OR-scan: position i gets the OR of `word` over
    its run (runs delimited by `start` flags), up to and including i.

    Hillis-Steele doubling with CONTIGUOUS shifts (one pad-slice concat
    per pass). `jax.lax.associative_scan` lowers its odd/even recursion to
    lane-strided slices, which are gathers on TPU (~0.6 GB/s) — measured
    0.51 ms at 131072 rows in the masks path vs ~0.15 ms for this form.
    """
    n = word.shape[0]
    w, s = word, start
    k = 1
    while k < n:
        wp = jnp.concatenate([jnp.zeros((k,), w.dtype), w[:-k]])
        sp = jnp.concatenate([jnp.zeros((k,), jnp.bool_), s[:-k]])
        w = jnp.where(s, w, wp | w)
        s = s | sp
        k *= 2
    return w


def segmented_sum_scan(val: jax.Array, start: jax.Array) -> jax.Array:
    """Inclusive segmented SUM-scan, same Hillis-Steele contiguous-shift
    form as `segmented_or_scan` (the (value, start-flag) segmented semiring
    is associative for any monoid op; only the combine differs). Replaces
    `lax.associative_scan` in the accumulator merge, where its strided
    odd/even slices would gather at the 2 M-row stretch scale."""
    n = val.shape[0]
    v, s = val, start
    k = 1
    while k < n:
        vp = jnp.concatenate([jnp.zeros((k,), v.dtype), v[:-k]])
        sp = jnp.concatenate([jnp.zeros((k,), jnp.bool_), s[:-k]])
        v = jnp.where(s, v, vp + v)
        s = s | sp
        k *= 2
    return v


def _run_starts(sx, sy, sz):
    """Boundary flags of equal-key runs in lexicographically sorted keys."""
    same = (
        (sx == jnp.roll(sx, 1)) & (sy == jnp.roll(sy, 1)) & (sz == jnp.roll(sz, 1))
    )
    return jnp.logical_not(same).at[0].set(True)


def voxel_downsample(
    points: jax.Array,
    valid: jax.Array,
    voxel_size: float,
    capacity: int,
    bound_m: float = DEFAULT_DEDUPE_BOUND_M,
) -> Tuple[PointBuffer, jax.Array]:
    """Exact voxel-grid downsample of one padded cloud.

    Semantics match the reference `downsample_point_cloud_gpu`
    (`vision_pipeline_utils.py:40-44`): each surviving point is
    ``round(p/voxel)*voxel``, output is the unique set in lexicographic
    order. Implemented as sort + run-head emit + compaction (shapes static).
    """
    if packed_fits(voxel_size, bound_m):
        key, ncells, half = _quantize_packed(points, valid, voxel_size, bound_m)
        # unstable: keys-only dedupe sort (stable would ride a hidden iota)
        (skey,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
        start = jnp.logical_not(skey == jnp.roll(skey, 1)).at[0].set(True)
        emit = start & (skey != _INT_SENTINEL)
        if capacity >= skey.shape[0]:
            # nothing can be dropped: the deduped rows ARE the output (valid
            # mask non-contiguous, like voxel_downsample_grid's fast path) —
            # skips the whole compaction sort
            pad = capacity - skey.shape[0]
            if pad:
                skey = jnp.pad(skey, (0, pad), constant_values=_INT_SENTINEL)
                emit = jnp.pad(emit, (0, pad))
            pts = jnp.where(
                emit[:, None], _decode_packed(skey, ncells, half, voxel_size), 0.0
            )
            return PointBuffer(points=pts, valid=emit), jnp.int32(0)
        return _compact_emitted_keys(skey, emit, capacity, ncells, half, voxel_size)

    if packed2_fits(voxel_size, bound_m):
        # 1 mm stretch path: 2-operand sort instead of the 3-key fallback
        hi, lo, n2, half = _quantize_packed2(points, valid, voxel_size, bound_m)
        shi, slo = jax.lax.sort((hi, lo), num_keys=2, is_stable=False)
        emit = _pair_run_starts(shi, slo) & (shi != _INT_SENTINEL)
        if capacity >= shi.shape[0]:
            # capacity covers the input (the 1 mm workspace sizing): skip
            # the compaction sort, return the deduped rows in place
            pad = capacity - shi.shape[0]
            if pad:
                shi = jnp.pad(shi, (0, pad), constant_values=_INT_SENTINEL)
                slo = jnp.pad(slo, (0, pad), constant_values=_INT_SENTINEL)
                emit = jnp.pad(emit, (0, pad))
            pts = jnp.where(
                emit[:, None], _decode_packed2(shi, slo, n2, half, voxel_size), 0.0
            )
            return PointBuffer(points=pts, valid=emit), jnp.int32(0)
        # masked re-sort compaction (see _compact_emitted_keys): emitted
        # (hi, lo) pairs are unique+ascending, so this is 2 operands where
        # compact_scalars' rank key would make it 3
        hm = jnp.where(emit, shi, _INT_SENTINEL)
        lm = jnp.where(emit, slo, _INT_SENTINEL)
        h2, l2 = jax.lax.sort((hm, lm), num_keys=2, is_stable=False)
        total = jnp.sum(emit.astype(jnp.int32))
        count = jnp.minimum(total, capacity)
        validc = jnp.arange(capacity) < count
        pts = jnp.where(
            validc[:, None],
            _decode_packed2(h2[:capacity], l2[:capacity], n2, half, voxel_size),
            0.0,
        )
        return PointBuffer(points=pts, valid=validc), total - count

    qx, qy, qz = _quantize(points, valid, voxel_size)
    # unstable: equal triples are interchangeable for dedupe (stable would
    # ride a hidden iota operand)
    sx, sy, sz = jax.lax.sort((qx, qy, qz), num_keys=3, is_stable=False)
    starts = _run_starts(sx, sy, sz)
    emit = starts & (sx != _INT_SENTINEL)
    snapped = (
        jnp.stack([sx, sy, sz], axis=-1).astype(jnp.float32) * voxel_size
    )
    return compact_points(snapped, emit, capacity)


def _window_duplicate_mask(kg: jax.Array, window_dy: int, window_dx: int) -> jax.Array:
    """(H, W) bool: key equals some ROW-MAJOR-PRECEDING key inside the
    window. Pure static shifts (pad+slice) — no gathers, no sorts."""
    h, w = kg.shape

    def shifted(dy, dx):
        # predecessor at (r-dy, c-dx); out-of-bounds -> sentinel (never
        # equal to an in-range key; sentinel==sentinel rows are invalid
        # anyway and get re-sentineled by the caller)
        top, bottom = dy, 0
        left, right = max(dx, 0), max(-dx, 0)
        p = jnp.pad(kg, ((top, bottom), (left, right)),
                    constant_values=_INT_SENTINEL)
        return p[: h, right: right + w] if dx <= 0 else p[: h, : w]

    dup = jnp.zeros((h, w), bool)
    for dy in range(window_dy + 1):
        xs = range(1, window_dx + 1) if dy == 0 else range(-window_dx, window_dx + 1)
        for dx in xs:
            dup = dup | (kg == shifted(dy, dx))
    return dup


def _window_dedupe(kg: jax.Array, window_dy: int, window_dx: int) -> jax.Array:
    """Keys with row-major-window duplicates replaced by the sentinel.
    Pallas on TPU (one pass through VMEM); XLA shifted-compare fallback
    elsewhere (`tests/test_geometry_ops.py` proves them identical)."""
    from rt3d.geometry.pallas_ops import pallas_available, window_dedupe_pallas

    if pallas_available():
        out = window_dedupe_pallas(kg, int(_INT_SENTINEL), window_dy, window_dx)
        if out is not None:
            return out
    dup = _window_duplicate_mask(kg, window_dy, window_dx)
    return jnp.where(dup, _INT_SENTINEL, kg)


def voxel_downsample_grid(
    points: jax.Array,      # (H, W, 3)
    valid: jax.Array,       # (H, W)
    voxel_size: float,
    capacity: int,
    bound_m: float = DEFAULT_DEDUPE_BOUND_M,
    window_dy: int = 4,
    window_dx: int = 6,
) -> Tuple[PointBuffer, jax.Array]:
    """`voxel_downsample` specialized to IMAGE-GRID clouds (one point per
    pixel). Exact same semantics; ~2x faster.

    A pinhole camera sees each voxel through a compact cone, so all pixels
    hitting one voxel form a small image-space blob (<= ~voxel*f/z_min
    pixels across). A windowed first-occurrence test therefore removes
    ~every duplicate with pure shifts BEFORE sorting, which turns the
    round-1 pipeline (full-width key sort + second full-width stable flag
    sort for compaction) into ONE single-operand sort + truncation.
    Exactness does NOT depend on the window: survivors of an undersized
    window sort adjacent to their twin and are re-deduped after the sort;
    the window only affects how many pre-capacity slots duplicates waste
    (counted in overflow like any capacity drop).
    """
    h, w = valid.shape
    if not packed_fits(voxel_size, bound_m):
        return voxel_downsample(
            points.reshape(-1, 3), valid.reshape(-1), voxel_size, capacity,
            bound_m=bound_m,
        )
    key, ncells, half = _quantize_packed(
        points.reshape(-1, 3), valid.reshape(-1), voxel_size, bound_m
    )
    key2 = _window_dedupe(key.reshape(h, w), window_dy, window_dx).reshape(-1)
    # unstable: equal keys are interchangeable, and a stable lax.sort
    # silently rides an extra iota payload (profiler-visible)
    (skey,) = jax.lax.sort((key2,), num_keys=1, is_stable=False)
    if skey.shape[0] < capacity:  # tiny grids: pad up to the output size
        skey = jnp.pad(skey, (0, capacity - skey.shape[0]),
                       constant_values=_INT_SENTINEL)
    live = skey != _INT_SENTINEL
    first = jnp.logical_not(skey == jnp.roll(skey, 1)).at[0].set(True)
    total_unique = jnp.sum((first & live).astype(jnp.int32))
    kc = skey[:capacity]
    uniq = (first & live)[:capacity]
    pts = jnp.where(uniq[:, None], _decode_packed(kc, ncells, half, voxel_size), 0.0)
    kept = jnp.sum(uniq.astype(jnp.int32))
    return PointBuffer(points=pts, valid=uniq), total_unique - kept


def voxel_downsample_masks(
    points: jax.Array,
    valid: jax.Array,
    masks: jax.Array,
    voxel_size: float,
    capacity: int,
    bound_m: float = DEFAULT_DEDUPE_BOUND_M,
    stage1_capacity: int = 0,
    union_capacity: int = 0,
    grid_hw: Optional[Tuple[int, int]] = None,
) -> Tuple[PointBuffer, jax.Array]:
    """Voxel-downsample D masked subsets of one dense cloud with ONE sort.

    ``points: (N, 3)``, ``valid: (N,)``, ``masks: (D, N)`` bool. Returns a
    batched ``PointBuffer`` with leading dim D (and per-detection overflow
    counts — EXACT attribution: drops in the shared stage-1/union buffers
    are charged only to the detections whose pixels were dropped, via
    bit-histogram differences of the packed mask words; see
    `_attributed_drops`). For each detection d, the output is exactly
    ``unique(round(points[masks[d] & valid]/voxel))*voxel`` in lexicographic
    order — the per-object downsample of the reference mask path
    (`vision_pipeline_utils.py:292-304`) for every object at once.

    Hot path (packed): the D masks bit-pack into one int32 word per point
    that rides the single-key sort as payload; "first masked point of each
    voxel run, per detection" is then ONE segmented exclusive OR-scan over
    the words (all 20 detections in bit-parallel), and compaction is
    two-stage (shared compact of any-emit rows, then per-detection selects
    on the small buffer). Eliminates the (D, N) gather/cumsum that
    dominated the naive formulation.

    ``grid_hw``: when the N points are an (H, W) image grid, a windowed
    per-bit first-occurrence pass (image-space voxel locality, see
    `voxel_downsample_grid`) removes ~all duplicates before the sort, which
    turns the post-sort compaction into a truncation.
    """
    n = points.shape[0]
    d = masks.shape[0]
    if d <= 31 and packed_fits(voxel_size, bound_m):
        # the pre-sort buffer must hold the union of all RAW mask pixels
        # (pre-dedupe) — size it generously relative to the frame
        default_s1 = max(2 * d * capacity, min(n // 4, 131072))
        return _voxel_masks_packed(
            points, valid, masks, voxel_size, capacity, bound_m,
            stage1_capacity or default_s1,
            union_capacity or min(d * capacity, stage1_capacity or default_s1),
            grid_hw,
        )
    if d <= 31 and packed2_fits(voxel_size, bound_m):
        default_s1 = max(2 * d * capacity, min(n // 4, 131072))
        return _voxel_masks_packed2(
            points, valid, masks, voxel_size, capacity, bound_m,
            stage1_capacity or default_s1,
            union_capacity or min(d * capacity, stage1_capacity or default_s1),
        )
    return _voxel_masks_lex(points, valid, masks, voxel_size, capacity)


def _window_prev_or(kg: jax.Array, wg: jax.Array, window_dy: int,
                    window_dx: int) -> jax.Array:
    """(H, W) int32: OR of mask words of ROW-MAJOR-PRECEDING pixels inside
    the window that share this pixel's voxel key. Bit-parallel across all
    detections; pure static shifts."""
    h, w = kg.shape

    def shifted(a, dy, dx, fill):
        top, left, right = dy, max(dx, 0), max(-dx, 0)
        p = jnp.pad(a, ((top, 0), (left, right)), constant_values=fill)
        return p[: h, right: right + w] if dx <= 0 else p[: h, : w]

    prev = jnp.zeros_like(wg)
    for dy in range(window_dy + 1):
        xs = range(1, window_dx + 1) if dy == 0 else range(-window_dx, window_dx + 1)
        for dx in xs:
            same = kg == shifted(kg, dy, dx, _INT_SENTINEL)
            prev = prev | jnp.where(same, shifted(wg, dy, dx, 0), 0)
    return prev


def _window_prev_or_dispatch(kg, wg, window_dy, window_dx):
    """Pallas on TPU, XLA shifted-compare fallback elsewhere."""
    from rt3d.geometry.pallas_ops import pallas_available, window_prev_or_pallas

    if pallas_available():
        out = window_prev_or_pallas(kg, wg, window_dy, window_dx)
        if out is not None:
            return out
    return _window_prev_or(kg, wg, window_dy, window_dx)


def _bit_histogram(word: jax.Array, d: int) -> jax.Array:
    """(d,) int32: how many elements of `word` have bit i set (d <= 31).

    Used to attribute capacity drops to detections exactly: every dropped
    pixel still carries its mask word, so per-detection drop counts are
    bit-histogram differences between the pre- and post-drop buffers."""
    bits = (word[:, None] >> jnp.arange(d, dtype=jnp.int32)[None, :]) & 1
    return jnp.sum(bits, axis=0)


def _attributed_drops(d, word, w1, emit_word, w2, have_drops):
    """(d,) int32 per-detection counts for the two shared-buffer drops in
    the packed mask-downsample paths (stage-1 block compaction + union
    shrink). Exact — not the former every-detection broadcast of the
    scalar totals. Gated on an actual drop via `lax.cond` so the
    overflow==0 steady state (every benched config) never pays the
    full-grid histogram read."""

    def _exact():
        return (_bit_histogram(word, d) - _bit_histogram(w1, d)
                + _bit_histogram(emit_word, d) - _bit_histogram(w2, d))

    return jax.lax.cond(
        have_drops, _exact, lambda: jnp.zeros((d,), jnp.int32))


def _voxel_masks_packed(points, valid, masks, voxel_size, capacity, bound_m,
                        stage1_capacity, union_capacity, grid_hw=None,
                        window_dy=4, window_dx=6):
    """Pipeline: bitpack D masks -> (grid) windowed per-bit pre-dedupe ->
    block-compact the emitting pixels -> sort the SMALL buffer ->
    bit-parallel segmented OR-scan -> per-det compact. The block
    pre-compaction is the big win: the sort (the single most expensive op,
    ~13.6 ms at 921 K keys) only sees 128-pixel blocks that touch some mask
    (<= stage1_capacity pixels, 131 K default). Block-granular gathers stay
    fast where a per-pixel rank scatter costs ~8.5 ms (profiler-measured).
    With ``grid_hw``, the windowed first-occurrence pass (image-space voxel
    locality, `voxel_downsample_grid`) pre-removes ~every duplicate, so the
    post-sort shrink to `union_capacity` is a truncation instead of a second
    full-width stable flag sort (stragglers the window missed sort adjacent
    to their twin and are OR-merged by the segmented scan — exactness never
    depends on the window size)."""
    n = points.shape[0]
    d = masks.shape[0]
    key, ncells, half = _quantize_packed(points, valid, voxel_size, bound_m)
    word = jnp.sum(
        masks.astype(jnp.int32) << jnp.arange(d, dtype=jnp.int32)[:, None],
        axis=0,
    )
    # mask-union pixels, quantized in-range
    sel = (word != 0) & (key != _INT_SENTINEL)
    key = jnp.where(sel, key, _INT_SENTINEL)
    word = jnp.where(sel, word, 0)
    if grid_hw is not None:
        h, w = grid_hw
        prev = _window_prev_or_dispatch(
            key.reshape(h, w), word.reshape(h, w), window_dy, window_dx
        )
        word = (word.reshape(h, w) & ~prev).reshape(-1)
        sel = word != 0
        key = jnp.where(sel, key, _INT_SENTINEL)

    blk = 128
    pad = (-n) % blk
    if pad:
        key = jnp.pad(key, (0, pad), constant_values=_INT_SENTINEL)
        word = jnp.pad(word, (0, pad))
        sel = jnp.pad(sel, (0, pad))
    nb = key.shape[0] // blk
    nb_cap = max(stage1_capacity // blk, 1)
    sel_b = sel.reshape(nb, blk)
    blk_any = jnp.any(sel_b, axis=1)
    blk_cnt = jnp.sum(sel_b.astype(jnp.int32), axis=1)
    bsafe, bvalid = _live_block_indices(blk_any, nb_cap)
    k1 = jnp.where(
        bvalid[:, None], key.reshape(nb, blk)[bsafe], _INT_SENTINEL
    ).reshape(-1)
    w1 = jnp.where(bvalid[:, None], word.reshape(nb, blk)[bsafe], 0).reshape(-1)
    taken = jnp.sum(jnp.where(bvalid, blk_cnt[bsafe], 0))
    drop_a = jnp.sum(blk_cnt) - taken

    # unstable: the OR-scan merges whole equal-key runs, so within-run
    # order is irrelevant (stable would add a hidden iota payload)
    skey, sword = jax.lax.sort((k1, w1), num_keys=1, is_stable=False)
    start = jnp.logical_not(skey == jnp.roll(skey, 1)).at[0].set(True)

    # segmented inclusive OR-scan of mask words over voxel runs
    or_incl = segmented_or_scan(sword, start)
    prev = jnp.where(start, 0, jnp.roll(or_incl, 1))
    emit_word = sword & ~prev
    emit_word = jnp.where(skey != _INT_SENTINEL, emit_word, 0)

    # shrink to the union of emitted voxels; `union_capacity` bounds the
    # per-det batched sort's width (overflow counted like any capacity)
    s2 = min(union_capacity, stage1_capacity)
    any_emit = emit_word != 0
    if grid_hw is not None:
        # window pre-dedupe already excluded non-emitting pixels before the
        # sort, so live rows are contiguous at the front: shrink = truncate.
        # (Dead rows inside the front — stragglers the OR-scan merged —
        # carry w=0 and only waste slots, counted below.)
        k2 = skey[:s2]
        w2 = emit_word[:s2]
        drop2 = jnp.sum(any_emit.astype(jnp.int32)) - jnp.sum(
            any_emit[:s2].astype(jnp.int32)
        )
    else:
        # masked re-sort compaction: emitted keys are unique+ascending, so
        # sorting (key_masked, word) is the compaction at 2 operands where
        # compact_scalars' rank key would cost 3 (see _compact_emitted_keys)
        km = jnp.where(any_emit, skey, _INT_SENTINEL)
        wm = jnp.where(any_emit, emit_word, 0)
        k2f, w2f = jax.lax.sort((km, wm), num_keys=1, is_stable=False)
        total2 = jnp.sum(any_emit.astype(jnp.int32))
        cnt2 = jnp.minimum(total2, s2)
        valid2 = jnp.arange(s2) < cnt2
        k2 = jnp.where(valid2, k2f[:s2], _INT_SENTINEL)
        w2 = jnp.where(valid2, w2f[:s2], 0)
        drop2 = total2 - cnt2

    bits = ((w2[None, :] >> jnp.arange(d, dtype=jnp.int32)[:, None]) & 1) == 1
    # single-operand unstable select: k2 is already ascending, so masking
    # non-members to the sentinel and sorting THE KEY ALONE yields each
    # detection's members in lex order (replaces a stable 2-operand
    # flag-sort + hidden iota — 3x the data movement)
    keym = jnp.where(bits, jnp.broadcast_to(k2, (d, s2)), _INT_SENTINEL)
    (skeys_d,) = jax.lax.sort((keym,), num_keys=1, dimension=1,
                              is_stable=False)
    counts = jnp.sum(bits.astype(jnp.int32), axis=1)
    countc = jnp.minimum(counts, capacity)
    valid_d = jnp.arange(capacity)[None, :] < countc[:, None]
    pts = jnp.where(
        valid_d[..., None],
        _decode_packed(skeys_d[:, :capacity], ncells, half, voxel_size),
        0.0,
    )
    buf = PointBuffer(points=pts, valid=valid_d)
    # exact per-detection attribution of the shared-buffer drops
    # (VERDICT r4 #10: the former scalar broadcast charged every
    # detection for any drop, which could mask one object starving)
    drop_d = _attributed_drops(d, word, w1, emit_word, w2,
                               (drop_a + drop2) > 0)
    overflow = jnp.maximum(counts - capacity, 0) + drop_d
    return buf, overflow


def _voxel_masks_packed2(points, valid, masks, voxel_size, capacity, bound_m,
                         stage1_capacity, union_capacity):
    """`_voxel_masks_packed` with the TWO-WORD voxel key (1 mm stretch path:
    the single-word grid overflows int32). Same pipeline — bitpack D masks,
    block-compact emitting pixels, sort the small buffer, bit-parallel
    segmented OR-scan, per-det compact — with `num_keys=2` sorts and pair
    equality for run detection. The image-grid windowed pre-dedupe is
    deliberately absent: at 1 mm a voxel's image-space footprint is
    sub-pixel, so a spatial window removes ~nothing (the 5 mm rationale in
    `voxel_downsample_grid` inverts)."""
    n = points.shape[0]
    d = masks.shape[0]
    hi, lo, ncells, half = _quantize_packed2(points, valid, voxel_size,
                                             bound_m)
    word = jnp.sum(
        masks.astype(jnp.int32) << jnp.arange(d, dtype=jnp.int32)[:, None],
        axis=0,
    )
    sel = (word != 0) & (hi != _INT_SENTINEL)
    hi = jnp.where(sel, hi, _INT_SENTINEL)
    lo = jnp.where(sel, lo, _INT_SENTINEL)
    word = jnp.where(sel, word, 0)

    blk = 128
    pad = (-n) % blk
    if pad:
        hi = jnp.pad(hi, (0, pad), constant_values=_INT_SENTINEL)
        lo = jnp.pad(lo, (0, pad), constant_values=_INT_SENTINEL)
        word = jnp.pad(word, (0, pad))
        sel = jnp.pad(sel, (0, pad))
    nb = hi.shape[0] // blk
    nb_cap = max(stage1_capacity // blk, 1)
    sel_b = sel.reshape(nb, blk)
    blk_any = jnp.any(sel_b, axis=1)
    blk_cnt = jnp.sum(sel_b.astype(jnp.int32), axis=1)
    bsafe, bvalid = _live_block_indices(blk_any, nb_cap)
    hi1 = jnp.where(
        bvalid[:, None], hi.reshape(nb, blk)[bsafe], _INT_SENTINEL
    ).reshape(-1)
    lo1 = jnp.where(
        bvalid[:, None], lo.reshape(nb, blk)[bsafe], _INT_SENTINEL
    ).reshape(-1)
    w1 = jnp.where(bvalid[:, None], word.reshape(nb, blk)[bsafe], 0).reshape(-1)
    taken = jnp.sum(jnp.where(bvalid, blk_cnt[bsafe], 0))
    drop_a = jnp.sum(blk_cnt) - taken

    shi, slo, sword = jax.lax.sort((hi1, lo1, w1), num_keys=2,
                                   is_stable=False)
    start = _pair_run_starts(shi, slo)
    or_incl = segmented_or_scan(sword, start)
    prev = jnp.where(start, 0, jnp.roll(or_incl, 1))
    emit_word = sword & ~prev
    emit_word = jnp.where(shi != _INT_SENTINEL, emit_word, 0)

    s2 = min(union_capacity, stage1_capacity)
    any_emit = emit_word != 0
    # masked re-sort compaction (see _compact_emitted_keys): 3 operands
    # (2 keys + word) where compact_scalars' rank key would cost 4
    hm2 = jnp.where(any_emit, shi, _INT_SENTINEL)
    lm2 = jnp.where(any_emit, slo, _INT_SENTINEL)
    wm2 = jnp.where(any_emit, emit_word, 0)
    h2f, l2f, w2f = jax.lax.sort((hm2, lm2, wm2), num_keys=2, is_stable=False)
    total2 = jnp.sum(any_emit.astype(jnp.int32))
    cnt2 = jnp.minimum(total2, s2)
    valid2 = jnp.arange(s2) < cnt2
    k2h = jnp.where(valid2, h2f[:s2], _INT_SENTINEL)
    k2l = jnp.where(valid2, l2f[:s2], _INT_SENTINEL)
    w2 = jnp.where(valid2, w2f[:s2], 0)
    drop2 = total2 - cnt2

    bits = ((w2[None, :] >> jnp.arange(d, dtype=jnp.int32)[:, None]) & 1) == 1
    # per-detection member select: mask non-members to the sentinel pair and
    # 2-key-sort along the row — members come out in lex voxel order
    hm = jnp.where(bits, jnp.broadcast_to(k2h, (d, s2)), _INT_SENTINEL)
    lm = jnp.where(bits, jnp.broadcast_to(k2l, (d, s2)), _INT_SENTINEL)
    shm, slm = jax.lax.sort((hm, lm), num_keys=2, dimension=1,
                            is_stable=False)
    counts = jnp.sum(bits.astype(jnp.int32), axis=1)
    countc = jnp.minimum(counts, capacity)
    valid_d = jnp.arange(capacity)[None, :] < countc[:, None]
    pts = jnp.where(
        valid_d[..., None],
        _decode_packed2(shm[:, :capacity], slm[:, :capacity], ncells, half,
                        voxel_size),
        0.0,
    )
    buf = PointBuffer(points=pts, valid=valid_d)
    # exact per-detection drop attribution (see _attributed_drops)
    drop_d = _attributed_drops(d, word, w1, emit_word, w2,
                               (drop_a + drop2) > 0)
    overflow = jnp.maximum(counts - capacity, 0) + drop_d
    return buf, overflow


def _voxel_masks_lex(points, valid, masks, voxel_size, capacity):
    n = points.shape[0]
    qx, qy, qz = _quantize(points, valid, voxel_size)
    order = jnp.arange(n, dtype=jnp.int32)
    # `order` is a 4th KEY, not a stable-sort payload: it is unique, so the
    # unstable 4-key sort is deterministic (bit-exact replays) without the
    # stable sort's hidden iota operand
    sx, sy, sz, sorder = jax.lax.sort((qx, qy, qz, order), num_keys=4,
                                      is_stable=False)
    starts = _run_starts(sx, sy, sz)
    key_ok = sx != _INT_SENTINEL

    masks_sorted = jnp.take(masks, sorder, axis=1)  # (D, N)
    m_i = masks_sorted.astype(jnp.int32)
    inclusive = jnp.cumsum(m_i, axis=1)
    # Count of masked elements before the current run, forward-filled from
    # run starts (values at successive run starts are non-decreasing, so a
    # running max implements the fill).
    base_at_start = jnp.where(starts[None, :], inclusive - m_i, -1)
    base = jax.lax.cummax(base_at_start, axis=1)
    within = inclusive - base
    emit = masks_sorted & (within == 1) & key_ok[None, :]

    snapped = jnp.stack([sx, sy, sz], axis=-1).astype(jnp.float32) * voxel_size

    def _compact_one(emit_d):
        return compact_points(snapped, emit_d, capacity, shared_source=True)

    buf, overflow = jax.vmap(_compact_one)(emit)
    return buf, overflow
