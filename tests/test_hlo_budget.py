"""Sort-budget regression guard on the lowered fused step.

The round-3 sort work (explicit ``is_stable=False`` everywhere it is
semantically safe, operand-count reduction via masked re-sorts, packed
keys, and in-key validity) is invisible to output-equality tests: a
regression — say a helper reverting to ``jnp.sort`` defaults, which adds
a hidden iota payload, or a compaction reintroducing a rank-key payload —
produces identical results but costs ~40% per extra sort operand on the
TPU (NOTES.md, measured). This test lowers the fused pipeline step to
StableHLO and pins the sort structure:

* number of sort ops,
* the single remaining stable sort (bytetrack.py slot ordering — a
  (max_tracks,) array where stability is semantically required and the
  cost is nil),
* the max and total operand counts.

Budgets are the counts as of 2026-08-18 (commits 7f7e025..eb5bd68). If a
legitimate feature adds a sort, update the budget in the same commit and
say why. Note ``lax.cond`` branches both lower, so e.g. the accumulate
evict/no-evict variants BOTH count.
"""

import dataclasses
import re

import jax
import jax.numpy as jnp
import pytest

from tests.tiny import H, W, tiny_config
from rt3d.pipeline.step import CameraCalib, build_pipeline

_SORT_RE = re.compile(r'"stablehlo\.sort"\(([^)]*)\)')


def _sort_stats(cfg):
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    state = pipe.init_state()
    calib = CameraCalib.from_config(cfg)
    c = len(cfg.rig.cameras)
    rgb = jnp.zeros((c, H, W, 3), jnp.uint8)
    depth = jnp.ones((c, H, W), jnp.float32)
    txt = jax.jit(pipe.step).lower(params, state, rgb, depth, calib).as_text()
    operand_counts = [m.count(",") + 1 for m in _SORT_RE.findall(txt)]
    return {
        "n_sorts": len(operand_counts),
        "n_stable": txt.count("is_stable = true"),
        "max_operands": max(operand_counts),
        "total_operands": sum(operand_counts),
    }


def test_fused_step_sort_budget():
    # round 5: +2 single-operand sorts (and -0 operands elsewhere) from
    # `_live_block_indices` — the masks-path block selection trades a
    # log2(nb)-iteration gather loop for one masked-iota sort per packed
    # mask-downsample call, chip-measured -0.2 ms/frame (NOTES.md). The
    # budget exists to catch ACCIDENTAL sort growth; this one is the
    # deliberate fast path.
    s = _sort_stats(tiny_config())
    assert s["n_sorts"] <= 10, s
    assert s["n_stable"] <= 1, s  # bytetrack slot ordering only
    assert s["max_operands"] <= 4, s
    assert s["total_operands"] <= 16, s


@pytest.mark.slow
def test_fused_step_sort_budget_accumulate():
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        pipeline=dataclasses.replace(
            cfg.pipeline,
            workspace_accumulate=True,
            accum_capacity=8192,
            accum_skip_prededupe=True,
        ),
    )
    s = _sort_stats(cfg)
    # +2 sorts / +2 operands: _live_block_indices, as above
    assert s["n_sorts"] <= 12, s
    assert s["n_stable"] <= 1, s
    assert s["max_operands"] <= 4, s
    assert s["total_operands"] <= 27, s


def test_quantized_step_lowering_runs_int8_convs():
    """The int8 params dict must actually lower to s8xs8->s32
    convolutions — a silent fall-through to the f32 path (e.g. a key
    rename breaking the `kernel_q8` detection) passes every accuracy
    test while giving back the 2x MXU rate the path exists for."""
    from rt3d.models.yolo import quant

    cfg = tiny_config()
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    paths = list(quant.collect_conv_meta(pipe.model))
    qparams = quant.quantize_params(
        pipe.model, params, (), act_scales={p: 1.0 for p in paths})
    n_q8 = sum(1 for k in qparams if k.endswith("/kernel_q8"))
    assert n_q8 > 20  # most of the conv stack quantizes

    state = pipe.init_state()
    calib = CameraCalib.from_config(cfg)
    c = len(cfg.rig.cameras)
    rgb = jnp.zeros((c, H, W, 3), jnp.uint8)
    depth = jnp.ones((c, H, W), jnp.float32)
    txt = jax.jit(pipe.step).lower(
        qparams, state, rgb, depth, calib).as_text()
    int8_convs = sum(
        1 for line in txt.splitlines()
        if "stablehlo.convolution" in line and "xi8>" in line
    )
    assert int8_convs == n_q8, (int8_convs, n_q8)
