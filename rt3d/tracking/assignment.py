"""Exact linear assignment in JAX (replaces the `lapx` C++ solver the
reference pulls in transitively through ultralytics, `requirements.txt:42`).

`hungarian` implements the O(n^3) shortest-augmenting-path Kuhn–Munkres
algorithm with row/column potentials as `lax` loops — fully jittable,
validated against `scipy.optimize.linear_sum_assignment` in tests.

`solve_matching` reproduces the tracking-specific
`lap.lapjv(cost, extend_cost=True, cost_limit=thresh)` semantics used by
ByteTrack: entries at/over the threshold are infeasible, the solver first
maximizes the number of feasible matches and then minimizes their total
cost, and unmatched rows/columns are reported as -1.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Large-but-finite infeasible cost. Kept small enough that f32 potential
# arithmetic retains ~1e-4 absolute resolution on real costs in [0, ~2].
BIG = jnp.float32(1e3)
_INF = jnp.float32(1e18)


def hungarian(cost: jax.Array) -> jax.Array:
    """Min-cost perfect assignment of a square (n, n) matrix.

    Returns `col_for_row: (n,) int32`. Every row is assigned (use finite
    sentinel costs for "no match" columns; see `solve_matching`).
    """
    n = cost.shape[0]
    assert cost.shape == (n, n)
    a = jnp.pad(cost.astype(jnp.float32), ((1, 0), (1, 0)))  # 1-indexed

    def solve_row(carry, i):
        u, v, p = carry
        minv = jnp.full(n + 1, _INF)
        used = jnp.zeros(n + 1, bool)
        way = jnp.zeros(n + 1, jnp.int32)
        p = p.at[0].set(i)

        def cond(s):
            _, _, p_, _, _, _, j0 = s
            return p_[j0] != 0

        def body(s):
            u_, v_, p_, minv_, used_, way_, j0 = s
            used_ = used_.at[j0].set(True)
            i0 = p_[j0]
            cur = a[i0] - u_[i0] - v_
            upd = (~used_) & (cur < minv_)
            minv_ = jnp.where(upd, cur, minv_)
            way_ = jnp.where(upd, j0, way_)
            masked = jnp.where(used_, _INF, minv_).at[0].set(_INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            u_ = u_.at[p_].add(jnp.where(used_, delta, 0.0))
            v_ = v_ - jnp.where(used_, delta, 0.0)
            minv_ = jnp.where(used_, minv_, minv_ - delta)
            return (u_, v_, p_, minv_, used_, way_, j1)

        u, v, p, minv, used, way, j0 = jax.lax.while_loop(
            cond, body, (u, v, p, minv, used, way, jnp.int32(0))
        )

        def aug_cond(s):
            j0_, _ = s
            return j0_ != 0

        def aug_body(s):
            j0_, p_ = s
            j1 = way[j0_]
            p_ = p_.at[j0_].set(p_[j1])
            return (j1, p_)

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return (u, v, p), None

    init = (
        jnp.zeros(n + 1, jnp.float32),
        jnp.zeros(n + 1, jnp.float32),
        jnp.zeros(n + 1, jnp.int32),
    )
    (_, _, p), _ = jax.lax.scan(
        solve_row, init, jnp.arange(1, n + 1, dtype=jnp.int32)
    )
    row_for_col = p[1:] - 1  # 0-based
    col_for_row = (
        jnp.zeros(n, jnp.int32)
        .at[row_for_col]
        .set(jnp.arange(n, dtype=jnp.int32))
    )
    return col_for_row


def solve_matching_exact(
    cost: jax.Array, thresh: float
) -> Tuple[jax.Array, jax.Array]:
    """Thresholded rectangular matching (ByteTrack's linear_assignment).

    cost: (R, C); entries >= thresh are infeasible. Returns
    (col_of_row (R,) int32 with -1 unmatched, row_of_col (C,) int32).
    """
    r, c = cost.shape
    s = max(r, c, 1)
    feas = cost < thresh
    padded = jnp.full((s, s), BIG, jnp.float32)
    padded = padded.at[:r, :c].set(jnp.where(feas, cost, BIG))
    col_for_row = hungarian(padded)

    rows = jnp.arange(r)
    assigned = col_for_row[:r]
    ok = (assigned < c) & feas[rows, jnp.clip(assigned, 0, c - 1)]
    col_of_row = jnp.where(ok, assigned, -1).astype(jnp.int32)
    row_of_col = jnp.full((c,), -1, jnp.int32)
    row_of_col = row_of_col.at[jnp.where(ok, assigned, c)].set(
        rows.astype(jnp.int32), mode="drop"
    )
    return col_of_row, row_of_col


def solve_matching_greedy(
    cost: jax.Array, thresh: float
) -> Tuple[jax.Array, jax.Array]:
    """Greedy thresholded matching via mutual-minimum acceptance rounds:
    each round simultaneously claims EVERY feasible pair that is both its
    row's argmin and its column's argmin, then masks the claimed rows and
    columns. Bit-identical to claiming the globally cheapest pair one at
    a time (with argmin's lowest-index tie-break the two orders select
    the same pairs — fuzzed over tie-heavy integer costs in
    tests/test_tracking.py), but the sequential depth drops from
    min(R, C) argmin iterations to the number of acceptance rounds —
    measured mean 2.5 / max 4 on tracking-shaped 40x20 near-binary IoU
    matrices, vs 20 before (the same selection-rounds trick as the NMS
    rewrite).

    TPU-latency rationale: the exact Hungarian solve is nested sequential
    `while` loops — ~100 ms/frame of pure loop latency at 64x20 on a v5e.
    Greedy agrees with the optimal matching whenever costs are
    unambiguous, which tracking IoU matrices essentially always are
    (crossings decided by a few 1e-2-scale IoU differences at most).
    Selectable via TrackerConfig.assignment = 'greedy' (default) |
    'refined' | 'exact'.
    """
    r, c = cost.shape
    if r == 0 or c == 0:
        return (jnp.full((r,), -1, jnp.int32),
                jnp.full((c,), -1, jnp.int32))
    big = jnp.float32(1e9)
    cm = jnp.where(cost < thresh, cost, big)
    rows = jnp.arange(r, dtype=jnp.int32)

    def cond(state):
        _, _, _, progressed, k = state
        # the round counter only bounds adversarial inputs; real matrices
        # exhaust `progressed` in a few rounds
        return progressed & (k < min(r, c))

    def body(state):
        cm_, col_of_row, row_of_col, _, k = state
        rmin = jnp.argmin(cm_, axis=1).astype(jnp.int32)   # (r,)
        cmin = jnp.argmin(cm_, axis=0).astype(jnp.int32)   # (c,)
        mutual = (cm_[rows, rmin] < big) & (cmin[rmin] == rows)
        col_of_row = jnp.where(mutual, rmin, col_of_row)
        # two mutual rows can never claim the same column (each claimed
        # column's argmin is unique), so the scatters below are
        # duplicate-free; non-mutual rows scatter out of bounds -> drop
        tgt = jnp.where(mutual, rmin, c)
        row_of_col = row_of_col.at[tgt].set(rows, mode="drop")
        col_hit = jnp.zeros((c,), bool).at[tgt].set(True, mode="drop")
        cm_ = jnp.where(mutual[:, None] | col_hit[None, :], big, cm_)
        return cm_, col_of_row, row_of_col, mutual.any(), k + 1

    init = (cm, jnp.full((r,), -1, jnp.int32),
            jnp.full((c,), -1, jnp.int32), jnp.bool_(True), jnp.int32(0))
    _, col_of_row, row_of_col, _, _ = jax.lax.while_loop(cond, body, init)
    return col_of_row, row_of_col


def _refine_matching(
    cost: jax.Array, thresh: float,
    col_of_row: jax.Array, row_of_col: jax.Array,
    rounds: int,
) -> Tuple[jax.Array, jax.Array]:
    """Fixed rounds of vectorized local improvement over a matching:

    each round applies the single best of
      * SWAP: matched rows (i, k) exchange their columns when that lowers
        total cost (fixes the classic greedy failure: i stole k's only
        good column),
      * MOVE: a matched or unmatched row takes a FREE feasible column
        when that lowers its cost / extends the matching.

    Every round is O(n^2) dense VPU work (one argmin each) — no
    data-dependent loop lengths, so TPU latency stays flat. With
    near-binary tracking IoU costs a few rounds reach the exact optimum
    in practice (measured in tests/test_assignment_modes.py).
    """
    r, c = cost.shape
    big = jnp.float32(1e9)
    cm = jnp.where(cost < thresh, cost.astype(jnp.float32), big)
    rows = jnp.arange(r)
    cols = jnp.arange(c)

    def cost_of(i, j):
        # cost of row i matched to col j, 0 when unmatched (j < 0)
        return jnp.where(j >= 0, cm[i, jnp.clip(j, 0, c - 1)], 0.0)

    def best_swap(state):
        col_of_row, row_of_col = state
        mcol = jnp.clip(col_of_row, 0, c - 1)
        matched = col_of_row >= 0
        cur = jnp.where(matched, cm[rows, mcol], 0.0)  # (r,)
        # SWAP: delta[i, k] = cost after exchanging i's and k's columns
        ci_ck = cm[:, mcol]  # (r, r): ci_ck[i, k] = cm[i, col_of_row[k]]
        both = matched[:, None] & matched[None, :]
        swap_delta = jnp.where(
            both & (rows[:, None] != rows[None, :]),
            ci_ck + ci_ck.T - cur[:, None] - cur[None, :],
            0.0,
        )
        s_flat = jnp.argmin(swap_delta)
        si, sk = s_flat // r, s_flat % r
        do = swap_delta[si, sk] < -1e-7
        ci, ck = col_of_row[si], col_of_row[sk]
        col_sw = col_of_row.at[si].set(ck).at[sk].set(ci)
        row_sw = row_of_col.at[jnp.clip(ci, 0, c - 1)].set(sk)
        row_sw = row_sw.at[jnp.clip(ck, 0, c - 1)].set(si)
        return (
            jnp.where(do, col_sw, col_of_row),
            jnp.where(do, row_sw, row_of_col),
        )

    def best_move(state):
        col_of_row, row_of_col = state
        mcol = jnp.clip(col_of_row, 0, c - 1)
        matched = col_of_row >= 0
        cur = jnp.where(matched, cm[rows, mcol], 0.0)  # (r,)
        # MOVE: row i -> free feasible column j
        free = row_of_col < 0  # (c,)
        move_delta = jnp.where(free[None, :], cm, big) - cur[:, None]
        # unmatched rows extend the matching: any feasible free column is
        # a gain (bias below every real improvement)
        move_delta = jnp.where(
            matched[:, None], move_delta,
            jnp.where(free[None, :] & (cm < big), cm - big * 0.5, 0.0),
        )
        m_flat = jnp.argmin(move_delta)
        mi, mj = m_flat // c, m_flat % c
        do = move_delta[mi, mj] < -1e-7
        old = col_of_row[mi]
        row_mv = jnp.where(
            old >= 0,
            row_of_col.at[jnp.clip(old, 0, c - 1)].set(-1),
            row_of_col,
        ).at[mj].set(mi)
        col_mv = col_of_row.at[mi].set(mj)
        return (
            jnp.where(do, col_mv, col_of_row),
            jnp.where(do, row_mv, row_of_col),
        )

    def body(_, state):
        # one swap then one move per round: the swap repairs pairwise
        # misassignments, the move then extends/retargets into columns the
        # swap freed — together they emulate length-2/3 augmenting paths
        return best_move(best_swap(state))

    col_of_row, row_of_col = jax.lax.fori_loop(
        0, rounds, body, (col_of_row, row_of_col)
    )
    return col_of_row.astype(jnp.int32), row_of_col.astype(jnp.int32)


def solve_matching_refined(
    cost: jax.Array, thresh: float, rounds: int | None = None
) -> Tuple[jax.Array, jax.Array]:
    """Greedy + local refinement: near-exact matching at vector latency."""
    col_of_row, row_of_col = solve_matching_greedy(cost, thresh)
    r, c = cost.shape
    if r == 0 or c == 0:
        # nothing to refine; _refine_matching's (r, r)/(r, c) argmins
        # don't trace for zero-size matrices, greedy handles them fine
        return col_of_row, row_of_col
    if rounds is None:
        rounds = min(r, c)
    return _refine_matching(cost, thresh, col_of_row, row_of_col, rounds)


def solve_matching(
    cost: jax.Array, thresh: float, method: str = "greedy"
) -> Tuple[jax.Array, jax.Array]:
    if method == "exact":
        return solve_matching_exact(cost, thresh)
    if method == "greedy":
        return solve_matching_greedy(cost, thresh)
    if method == "refined":
        return solve_matching_refined(cost, thresh)
    raise ValueError(
        f"unknown assignment method {method!r}; "
        "expected 'greedy', 'refined', or 'exact'"
    )
