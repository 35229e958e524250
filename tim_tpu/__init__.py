"""TIM-TPU: a TPU-native JAX framework for audio-visual time-interval action
understanding, re-designed from scratch with the capabilities of the TIM
reference (Time Interval Machine, CVPR 2024).

Subpackages
-----------
- ``tim_tpu.config``   — unified dataclass config (replaces the reference's
  argparse flag soup, ``recognition/time_interval_machine/utils/parser.py``).
- ``tim_tpu.ops``      — jit-compatible compute primitives (structured
  attention, losses, interval/IoU math, mixup).
- ``tim_tpu.models``   — flax modules: TIM recognition + detection, feature
  extractor backbones.
- ``tim_tpu.data``     — sliding-window dataset pipeline (host-side numpy,
  fixed-shape device batches).
- ``tim_tpu.parallel`` — device mesh / sharding utilities (replaces DDP+NCCL).
- ``tim_tpu.train``    — jit train/eval steps, optimizer schedules, checkpoints.
- ``tim_tpu.evals``    — metrics, window-vote ensembling, NMS, mAP evaluation.
"""

__version__ = "0.1.0"
