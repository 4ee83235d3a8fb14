"""Fine-tune YOLO11-seg on the synthetic analytic scene — closes the
detection loop in-environment.

No network means the reference's published `yolo11*-seg.pt`
(`2cams_mask_gpu.py:51`) can't be fetched, so the pipeline's own
detections were previously unproven. This script trains a detector whose
predictions drive the full forward -> NMS -> retina-mask -> object-cloud
chain on the scene family the golden tests use, then evaluates
predicted-mask IoU against the analytic ground truth and saves the
weights as an .npz artifact (fp16) for `cfg.model.weights` / bench.py.

Usage (TPU, ~10 min including compile):
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/train_synth.py \
        --steps 800 --out weights/yolo11n_synth_seg.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variant", default="n")
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--scenes", type=int, default=24)
    p.add_argument("--frames-per-scene", type=int, default=3)
    p.add_argument("--hw", type=int, nargs=2, default=(720, 1280))
    p.add_argument("--input-hw", type=int, nargs=2, default=(384, 640))
    p.add_argument("--out", default="weights/yolo11n_synth_seg.npz")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-frames", type=int, default=10)
    p.add_argument("--domain", default="mix",
                   choices=("easy", "hard", "mix"),
                   help="training scene family (rt3d/io/synthetic.py): "
                        "mix = 3/4 domain-randomized hard scenes "
                        "(occlusion/texture/lighting/distractors), 1/4 easy")
    p.add_argument("--resume", default=None,
                   help="existing .npz to continue from")
    p.add_argument("--warmup", type=int, default=None,
                   help="LR warmup steps (default steps/5 capped at 100)")
    p.add_argument("--f32", action="store_true",
                   help="f32 compute (the BN-folded net trains in bf16 by "
                        "default; deep variants can need f32)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/rt3d_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from rt3d.models.yolo.model import YoloSeg
    from rt3d.models.yolo.postprocess import letterbox_params, preprocess_frame
    from rt3d.train.data import build_synth_dataset
    from rt3d.train.loss import seg_detection_loss
    from rt3d.train.step import TrainState

    if args.f32:
        from rt3d.models.yolo.core import set_compute_dtype

        set_compute_dtype(jnp.float32)

    hw = tuple(args.hw)
    input_hw = tuple(args.input_hw)
    model = YoloSeg(variant=args.variant, num_classes=80, input_hw=input_hw)
    meta = letterbox_params(hw, input_hw)

    print(f"rendering {args.scenes} scenes x {args.frames_per_scene} frames "
          f"x 2 cams at {hw} ...", flush=True)
    t0 = time.time()
    ds = build_synth_dataset(
        model, num_scenes=args.scenes,
        frames_per_scene=args.frames_per_scene, hw=hw, seed=args.seed,
        domain=args.domain,
    )
    n = len(ds["images"])
    print(f"dataset: {n} samples in {time.time() - t0:.1f}s "
          f"(positives/sample mean "
          f"{ds['box_w'].sum(axis=1).mean():.1f})", flush=True)

    # Stage the ENTIRE dataset on device once: the dev relay's
    # host->device path degrades to ~15-30 MB/s after the first jit, so
    # per-step batch uploads would cost ~1 s each; on-device gathers are
    # free. Letterboxing uses the EXACT inference preprocessing.
    pre = jax.jit(jax.vmap(lambda f: preprocess_frame(f, meta)))
    imgs = []
    for s in range(0, n, 16):
        imgs.append(pre(jnp.asarray(ds["images"][s:s + 16])))
    dev = {"images": jnp.concatenate(imgs)}  # (N, h, w, 3) f32, on device
    del ds["images"], imgs
    tkeys = ["box", "box_w", "inst_id", "inst_cls", "inst_mask", "inst_box"]
    for k in tkeys:
        dev[k] = jnp.asarray(ds[k])
    jax.block_until_ready(dev)
    print("dataset staged on device", flush=True)

    warmup = (args.warmup if args.warmup is not None
              else min(100, args.steps // 5))
    optimizer = optax.chain(
        # the BN-folded network has no normalization layers; deep variants
        # can emit a non-finite grad spike early — drop those steps rather
        # than poisoning the params (yolo11x NaN'd at step ~80 without it)
        optax.zero_nans(),
        optax.clip_by_global_norm(5.0),
        optax.adamw(
            optax.warmup_cosine_decay_schedule(
                0.0, args.lr, warmup_steps=warmup,
                decay_steps=args.steps, end_value=args.lr * 0.05,
            ),
            b2=0.95,  # shorter second-moment memory rides out loss spikes
            weight_decay=1e-4,
        ),
    )

    def init_fn(rng):
        params = model.init(rng)
        return TrainState(params=params, opt_state=optimizer.init(params),
                          step=jnp.int32(0))

    from rt3d.train.augment import (
        anchor_flip_perm, photometric_augment, random_hflip,
    )

    # horizontal flip is geometry-exact only under a symmetric letterbox
    # pad (pad_w even; 0 for the shipped 720p -> 384x640 input)
    pad_w = input_hw[1] - meta.new_hw[1]
    can_flip = pad_w % 2 == 0
    flip_perm = jnp.asarray(anchor_flip_perm(input_hw)) if can_flip else None

    @jax.jit
    def step_fn(state, batch):
        # fresh augmentation draw every step (rt3d/train/augment.py) — the
        # rendered dataset is small; without this the cls head memorizes
        # per-scene appearance and ghosts on held-out scenes
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed + 7),
                                 state.step)
        k_photo, k_flip = jax.random.split(key)
        imgs = batch["images"]
        if can_flip:
            imgs, batch = random_hflip(k_flip, imgs, batch, flip_perm,
                                       input_hw[1])
        aug = photometric_augment(k_photo, imgs)

        def loss_fn(p):
            return seg_detection_loss(model, p, aug, batch)

        (loss, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(params=new_params, opt_state=new_opt,
                          step=state.step + 1), {"loss": loss, **parts}

    state = init_fn(jax.random.PRNGKey(args.seed))
    if args.resume and os.path.exists(args.resume):
        from rt3d.models.yolo.convert import load_params

        loaded = {k: jnp.asarray(v, jnp.float32)
                  for k, v in load_params(args.resume).items()}
        state = TrainState(params=loaded, opt_state=state.opt_state,
                           step=state.step)
        print(f"resumed params from {args.resume}", flush=True)

    rng = np.random.default_rng(args.seed + 1)
    t0 = time.time()
    last = None
    for it in range(args.steps):
        sel = jnp.asarray(rng.choice(n, size=args.batch, replace=False))
        batch = {k: jnp.take(v, sel, axis=0) for k, v in dev.items()}
        state, metrics = step_fn(state, batch)
        if it % 50 == 0 or it == args.steps - 1:
            last = {k: float(v) for k, v in metrics.items()}
            print(f"step {it:5d}  loss {last['loss']:.4f}  "
                  f"cls {last['cls']:.4f}  box {last['box']:.4f}  "
                  f"proto {last['proto']:.4f}  "
                  f"({(time.time() - t0):.0f}s)", flush=True)
            if not all(map(__import__("math").isfinite, last.values())):
                # zero_nans masks bad GRADS; a non-finite LOSS means the
                # params themselves are gone — bail loudly, don't burn the
                # remaining steps training nothing
                print("non-finite loss — aborting", flush=True)
                return 2

    # ---- evaluation: the pipeline's OWN detections vs analytic truth ----
    from tools.eval_synth import evaluate_weights

    params_f32 = jax.device_get(state.params)
    # primary eval runs on the HARD held-out family whenever the model saw
    # hard scenes (the capability bar: occlusion/clutter/distractors);
    # the easy family is reported alongside for continuity with rounds 2-3
    primary_domain = "easy" if args.domain == "easy" else "hard"
    stats = evaluate_weights(
        params_f32, variant=args.variant, hw=hw, input_hw=input_hw,
        num_frames=args.eval_frames, seed=args.seed + 777,
        domain=primary_domain,
    )
    print(f"eval[{primary_domain}]:", json.dumps(stats), flush=True)
    stats_easy = stats
    if primary_domain != "easy":
        stats_easy = evaluate_weights(
            params_f32, variant=args.variant, hw=hw, input_hw=input_hw,
            num_frames=args.eval_frames, seed=args.seed + 777,
            domain="easy",
        )
        print("eval[easy]:", json.dumps(stats_easy), flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    from rt3d.models.yolo.convert import save_params

    # fp16 storage halves the artifact; convs run in bf16 anyway and the
    # eval above is re-checked from the saved file by tests
    save_params({k: np.asarray(v, np.float16)
                 for k, v in params_f32.items()}, args.out)
    manifest = {
        "variant": args.variant, "input_hw": list(input_hw),
        "train_hw": list(hw), "steps": args.steps, "batch": args.batch,
        "lr": args.lr, "warmup": warmup, "scenes": args.scenes,
        "seed": args.seed, "domain": args.domain,
        "final_metrics": last, "eval": stats, "eval_easy": stats_easy,
        "dtype": "float16",
        "classes": [39, 41] if args.domain == "easy" else [39, 41, 73, 64],
        "data": "rt3d.train.data.build_synth_dataset (analytic scene)",
    }
    with open(os.path.splitext(args.out)[0] + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"saved {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB)",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
