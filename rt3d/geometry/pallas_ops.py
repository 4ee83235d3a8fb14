"""Pallas TPU kernels for the point-cloud hot ops.

`min_sqdist_pallas`: fused min-distance contraction for workspace
subtraction. The XLA formulation (rt3d/geometry/subtract.py) materializes
(N, tile) distance blocks in HBM between matmul and row-min; this kernel
keeps every distance tile in VMEM — the only HBM traffic is the two point
buffers in (N*3 + M*3 floats) and the (N,) result out, making the op purely
MXU/VPU-bound. The reference's torch.cdist version allocated the full
N x M matrix and logged the cost (`vision_pipeline_utils.py:175-177`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.4e38
_FAR = 1.0e5  # invalid refs teleport here -> d2 ~ 1e10


def _min_d2_kernel(q_ref, r_ref, cmin_ref, cmax_ref, rmin_ref, rmax_ref,
                   o_ref, *, chunk: int, num_chunks: int, thresh2: float):
    q = q_ref[:]  # (TN, 3)
    # query-tile AABB for chunk pruning (FAR padding rows only widen it on
    # the final tile, which merely disables pruning there)
    qmin = jnp.min(q, axis=0)
    qmax = jnp.max(q, axis=0)

    def compute(i, acc):
        # exact f32 distances on the VPU via coordinate broadcasts — the
        # K=3 matmul identity either rides the MXU in bf16 (1e-3 m error at
        # 1 m range, flips keep/drop decisions) or pays the 6-pass HIGHEST
        # decomposition; three squared-difference planes are cheaper and
        # exact
        r = r_ref[pl.ds(i * chunk, chunk), :]  # (chunk, 3)
        dx = q[:, 0:1] - r[:, 0][None, :]
        dy = q[:, 1:2] - r[:, 1][None, :]
        dz = q[:, 2:3] - r[:, 2][None, :]
        d2 = dx * dx + dy * dy + dz * dz
        return jnp.minimum(acc, jnp.min(d2, axis=1, keepdims=True))

    def body(i, acc):
        # sound pruning for thresholded min-distance: if the chunk's AABB
        # is farther than the threshold from every point in this tile's
        # AABB, the chunk cannot flip any keep/drop decision. Chunks of
        # pure padding (teleported to _FAR) prune instantly.
        cmin = cmin_ref[i, :]
        cmax = cmax_ref[i, :]
        gap = jnp.maximum(jnp.maximum(cmin - qmax, qmin - cmax), 0.0)
        d2a = jnp.sum(gap * gap)
        return jax.lax.cond(
            d2a > thresh2, lambda a: a, lambda a: compute(i, a), acc
        )

    # whole-TILE pruning against the union AABB of all VALID refs: queries
    # are voxel-sort ordered (lexicographic in x), so tiles are spatially
    # coherent and most of the workspace sits farther than the threshold
    # from the handful of object points — those tiles skip the chunk loop
    # entirely (profiler: 0.75 -> ~0.2 ms at 64 K queries x 1 object). A
    # pruned tile reports _BIG, which the threshold contract allows; no
    # valid refs anywhere gives rmin=+inf and every tile prunes.
    rmin = rmin_ref[0, :]
    rmax = rmax_ref[0, :]
    tgap = jnp.maximum(jnp.maximum(rmin - qmax, qmin - rmax), 0.0)
    tile_far = jnp.sum(tgap * tgap) > thresh2

    @pl.when(tile_far)
    def _():
        o_ref[:] = jnp.full((q.shape[0], 1), _BIG, jnp.float32)

    @pl.when(jnp.logical_not(tile_far))
    def _():
        acc = jax.lax.fori_loop(
            0, num_chunks, body, jnp.full((q.shape[0], 1), _BIG, jnp.float32)
        )
        o_ref[:] = jnp.maximum(acc, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold", "tile_n", "chunk"))
def min_sqdist_pallas(
    queries: jax.Array,    # (N, 3) f32
    refs: jax.Array,       # (M, 3) f32
    ref_valid: jax.Array,  # (M,) bool
    threshold: float = 1e4,
    tile_n: int = 512,
    chunk: int = 1024,
) -> jax.Array:
    """Per-query squared distance to the nearest VALID ref point, exact
    wherever it is <= threshold^2 (chunks provably beyond the threshold are
    AABB-pruned and may leave the result at a larger-but-still-beyond
    value). Queries with no valid refs anywhere get ~1e10 (far)."""
    n = queries.shape[0]
    m = refs.shape[0]
    q = queries.astype(jnp.float32)
    r = jnp.where(ref_valid[:, None], refs.astype(jnp.float32), _FAR)

    pad_n = (-n) % tile_n
    pad_m = (-m) % chunk
    if pad_n:
        q = jnp.pad(q, ((0, pad_n), (0, 0)))
    if pad_m:
        r = jnp.pad(r, ((0, pad_m), (0, 0)), constant_values=_FAR)
    np_, mp_ = q.shape[0], r.shape[0]
    num_chunks = mp_ // chunk
    rc = r.reshape(num_chunks, chunk, 3)
    cmin = jnp.min(rc, axis=1)  # (num_chunks, 3)
    cmax = jnp.max(rc, axis=1)
    # union AABB over VALID refs only (teleported rows would widen it to
    # _FAR and defeat tile pruning)
    rmin = jnp.min(jnp.where(ref_valid[:, None], refs, jnp.inf),
                   axis=0)[None, :].astype(jnp.float32)
    rmax = jnp.max(jnp.where(ref_valid[:, None], refs, -jnp.inf),
                   axis=0)[None, :].astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _min_d2_kernel, chunk=chunk, num_chunks=num_chunks,
            thresh2=float(threshold) ** 2,
        ),
        grid=(np_ // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp_, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_chunks, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_chunks, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
    )(q, r, cmin, cmax, rmin, rmax)
    return out[:n, 0]


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# SOR kNN statistic
# ---------------------------------------------------------------------------


def _sor_knn_kernel(q_ref, r_ref, mean_ref, sat_ref, *, k: int):
    q = q_ref[:]                      # (TN, 3)
    tn = q.shape[0]
    # invalid rows are teleported to exactly (_FAR, _FAR, _FAR); a tile of
    # pure padding (common: fused-object slots are 2048-padded around a
    # few hundred voxels) skips the distance matrix and the k extraction
    # passes. Downstream is identical: the caller overwrites saturated
    # rows' means with _BIG anyway (rt3d/geometry/sor.py sor_inlier_mask).
    all_far = jnp.min(q[:, 0]) >= _FAR * 0.5

    @pl.when(all_far)
    def _():
        mean_ref[:] = jnp.full((tn, 1), _BIG, jnp.float32)
        sat_ref[:] = jnp.ones((tn, 1), jnp.float32)

    @pl.when(jnp.logical_not(all_far))
    def _():
        r = r_ref[:]                  # (M, 3) — invalid rows pre-teleported
        q2 = jnp.sum(q * q, axis=1, keepdims=True)
        r2 = jnp.sum(r * r, axis=1)
        cross = jax.lax.dot_general(
            q, r, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d2 = jnp.maximum(q2 + r2[None, :] - 2.0 * cross, 0.0)  # (TN, M) VMEM
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        acc = jnp.zeros((tn,), jnp.float32)
        last = jnp.zeros((tn,), jnp.float32)
        for _ in range(k):  # unrolled; d2 stays VMEM-resident across passes
            mn = jnp.min(d2, axis=1)
            idx = jnp.argmin(d2, axis=1)
            acc = acc + jnp.sqrt(jnp.minimum(mn, 1e30))
            last = mn
            d2 = jnp.where(cols == idx[:, None], _BIG, d2)
        mean_ref[:] = (acc / max(k - 1, 1))[:, None]
        sat_ref[:] = (last >= _FAR * _FAR * 0.25).astype(jnp.float32)[:, None]


@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def sor_knn_mean_pallas(
    points: jax.Array,   # (N, 3) f32
    valid: jax.Array,    # (N,) bool
    k: int = 20,
    tile_n: int = 256,
) -> tuple[jax.Array, jax.Array]:
    """Per-point mean distance to its k nearest neighbours INCLUDING itself
    divided by (k-1) — the Open3D SOR statistic (see rt3d/geometry/sor.py).

    Returns (mean_d (N,), saturated (N,) bool) where `saturated` marks rows
    whose k-NN set ran out of valid points. The (TN, M) distance tile lives
    in VMEM for all k extraction passes; the XLA formulation round-trips
    the full matrix through HBM once per pass (~1.2 ms x k at N=2048,
    profiler-measured)."""
    n = points.shape[0]
    # the kernel's VMEM stack is dominated by the (tile_n, N) distance tile
    # and its iota/select temporaries (~3x d2): tile_n=256 at N=16384 needs
    # 24 MB > the 16 MB Mosaic scoped limit (hit at the 1 mm stretch
    # config). Halve the query tile until d2 stays under 4 MB — the default
    # 2048-point slots keep tile_n=256 (2.1 MB) and the tuned kernel.
    while tile_n > 8 and tile_n * (n + (-n) % tile_n) * 4 > (1 << 22):
        tile_n //= 2
    p = jnp.where(valid[:, None], points.astype(jnp.float32), _FAR)
    pad_n = (-n) % tile_n
    q = jnp.pad(p, ((0, pad_n), (0, 0)), constant_values=_FAR)
    np_ = q.shape[0]

    mean, sat = pl.pallas_call(
        functools.partial(_sor_knn_kernel, k=k),
        grid=(np_ // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        ],
    )(q, q)
    return mean[:n, 0], sat[:n, 0] > 0.5


@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def sor_knn_mean_pallas_slots(
    points: jax.Array,   # (S, K, 3) f32 — one padded cloud per slot
    valid: jax.Array,    # (S, K) bool
    k: int = 20,
    tile_n: int = 256,
) -> tuple[jax.Array, jax.Array]:
    """Slot-batched `sor_knn_mean_pallas`: ONE kernel launch over all S
    slots, each query tile seeing only its OWN slot's K points as
    neighbour candidates.

    Layout trick: slots are folded into a (S*K, 3) array; grid step i's
    query tile starts at row i*tile_n, and its neighbour block is the
    owning slot's K rows via the index map ``i -> (i * tile_n // K, 0)``
    (tile_n divides K, so a tile never straddles slots). The kernel body
    is `_sor_knn_kernel` verbatim — absent/padding slots are teleported
    to _FAR and hit its all-far tile skip at ~zero cost. Replaces the
    fusion stage's sequential per-slot ``lax.map`` (while-loop dispatch,
    ~0.35 ms/step on the x chip trace, fusion.py)."""
    s, cap, _ = points.shape
    while tile_n > 8 and (cap % tile_n or tile_n * cap * 4 > (1 << 22)):
        tile_n //= 2
    if cap % tile_n:  # capacity not a multiple of any tile — caller falls back
        raise ValueError(f"point capacity {cap} not tileable")
    p = jnp.where(valid[..., None], points.astype(jnp.float32), _FAR)
    flat = p.reshape(s * cap, 3)

    mean, sat = pl.pallas_call(
        functools.partial(_sor_knn_kernel, k=k),
        grid=((s * cap) // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, 3), lambda i: (i * tile_n // cap, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s * cap, 1), jnp.float32),
            jax.ShapeDtypeStruct((s * cap, 1), jnp.float32),
        ],
    )(flat, flat)
    return mean.reshape(s, cap), sat.reshape(s, cap) > 0.5


# ---------------------------------------------------------------------------
# Windowed voxel pre-dedupe (image-grid locality)
# ---------------------------------------------------------------------------
#
# The XLA formulations (`ops._window_duplicate_mask` / `ops._window_prev_or`)
# materialize ~58 padded+shifted copies of the (H, W) key grid in HBM — the
# single biggest elementwise cost of the workspace stage (profiler: 1.6 ms
# inside fusion.4 at 2x360x640). These kernels stream each row-band through
# VMEM ONCE and do all window offsets as register-level lane rolls + static
# sublane slices: HBM traffic drops from ~59x to ~2x the grid size.


def _pick_block_rows(h: int, dy_max: int) -> int | None:
    # SMALL blocks on purpose: the kernel materializes ~58 rolled (br, W)
    # temporaries; Mosaic allocates them on the VMEM stack, so br=48 at
    # W=1280 blows the 16 MB scoped limit (measured). br=8 keeps the whole
    # working set ~2.5 MB at W=1280 and the grid pipeline hides the extra
    # program count.
    for br in (8, 16):
        if h % br == 0 and br >= dy_max:
            return br
    return None


def _window_offsets(dy_max: int, dx_max: int):
    for dy in range(dy_max + 1):
        xs = range(1, dx_max + 1) if dy == 0 else range(-dx_max, dx_max + 1)
        for dx in xs:
            yield dy, dx


def _window_body(cur, prev_rows, br, w, dy_max, dx_max, visit):
    """Shared window sweep: calls `visit(eq_mask, dy, dx, shifted_rows_fn)`
    for every ROW-MAJOR-PRECEDING offset. `cur`/`prev_rows` are (BR, W);
    neighbor rows for dy>0 splice the previous block's tail (static slices)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (br, w), 1)
    cache = {}
    for dy, dx in _window_offsets(dy_max, dx_max):
        if dy not in cache:
            cache[dy] = cur if dy == 0 else jnp.concatenate(
                [prev_rows[br - dy:], cur[: br - dy]], axis=0
            )
        nb = cache[dy]
        sh = pltpu.roll(nb, shift=dx % w, axis=1)
        eq = cur == sh
        if dx > 0:
            eq = eq & (col >= dx)
        elif dx < 0:
            eq = eq & (col < w + dx)
        visit(eq, dy, dx, lambda a, _dx=dx: pltpu.roll(a, shift=_dx % w, axis=1))


def _window_dedupe_kernel(ka, kb, out, *, br, w, dy_max, dx_max, sentinel):
    cur = ka[:]
    # an all-sentinel block (no live pixel in these rows — most of a masks
    # grid away from the detections) is a fixed point: every dup found
    # would be rewritten to the sentinel it already is. Skip the ~58-roll
    # window sweep and pass the block through.
    all_sent = jnp.min(cur) == sentinel

    @pl.when(all_sent)
    def _():
        out[:] = cur

    @pl.when(jnp.logical_not(all_sent))
    def _():
        prev_rows = kb[:]
        dup = [jnp.zeros((br, w), jnp.bool_)]

        def visit(eq, dy, dx, _shift):
            dup[0] = dup[0] | eq

        _window_body(cur, prev_rows, br, w, dy_max, dx_max, visit)
        out[:] = jnp.where(dup[0], sentinel, cur)


def _window_prev_or_kernel(ka, kb, wa, wb, out, *, br, w, dy_max, dx_max,
                           sentinel):
    cur = ka[:]
    # all-sentinel block: no live pixel, and downstream only consumes the
    # prev-OR word where the key is live — write zeros, skip the sweep
    all_sent = jnp.min(cur) == sentinel

    @pl.when(all_sent)
    def _():
        out[:] = jnp.zeros((br, w), jnp.int32)

    @pl.when(jnp.logical_not(all_sent))
    def _():
        prev_k = kb[:]
        wcur = wa[:]
        wprev = wb[:]
        por = [jnp.zeros((br, w), jnp.int32)]
        wcache = {}

        def visit(eq, dy, dx, shift):
            if dy not in wcache:
                wcache[dy] = wcur if dy == 0 else jnp.concatenate(
                    [wprev[br - dy:], wcur[: br - dy]], axis=0
                )
            por[0] = por[0] | jnp.where(eq, shift(wcache[dy]), 0)

        _window_body(cur, prev_k, br, w, dy_max, dx_max, visit)
        out[:] = por[0]


def window_dedupe_pallas(kg: jax.Array, sentinel: int, dy_max: int = 4,
                         dx_max: int = 6, interpret: bool = False):
    """Replace every key that equals some row-major-preceding key inside the
    (dy_max, +-dx_max) window with `sentinel`. Exact match for
    `where(ops._window_duplicate_mask(kg), sentinel, kg)`.
    Returns None when the grid shape doesn't fit the kernel layout."""
    h, w = kg.shape
    br = _pick_block_rows(h, dy_max)
    if br is None or w % 128:
        return None
    kp = jnp.pad(kg, ((br, 0), (0, 0)), constant_values=sentinel)
    return pl.pallas_call(
        functools.partial(_window_dedupe_kernel, br=br, w=w, dy_max=dy_max,
                          dx_max=dx_max, sentinel=sentinel),
        grid=(h // br,),
        in_specs=[
            pl.BlockSpec((br, w), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=interpret,
    )(kp, kp)


def window_prev_or_pallas(kg: jax.Array, wg: jax.Array, dy_max: int = 4,
                          dx_max: int = 6, interpret: bool = False):
    """OR of mask words of row-major-preceding pixels sharing this pixel's
    voxel key inside the window. Exact match for `ops._window_prev_or`.
    Returns None when the grid shape doesn't fit the kernel layout."""
    h, w = kg.shape
    br = _pick_block_rows(h, dy_max)
    if br is None or w % 128:
        return None
    kp = jnp.pad(kg, ((br, 0), (0, 0)), constant_values=jnp.int32(2**31 - 1))
    wp = jnp.pad(wg, ((br, 0), (0, 0)))
    return pl.pallas_call(
        functools.partial(_window_prev_or_kernel, br=br, w=w, dy_max=dy_max,
                          dx_max=dx_max, sentinel=2**31 - 1),
        grid=(h // br,),
        in_specs=[
            pl.BlockSpec((br, w), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, w), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=interpret,
    )(kp, kp, wp, wp)
