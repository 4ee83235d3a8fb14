"""Training support: loss + dp x fsdp sharded train step.

The reference never trains (weights come pre-trained from ultralytics);
rt3d ships a fine-tuning path so the model family is self-contained on TPU:
a detection+segmentation objective over the static anchor grid and an
optax-based train step jitted over a {dp, fsdp} mesh.
"""

from rt3d.train.loss import seg_detection_loss  # noqa: F401
from rt3d.train.step import TrainState, make_train_step  # noqa: F401
