"""Device-resident feature banks with on-device window gather.

The reference assembles every batch on the host: per-window fancy-indexing
into RAM-cached numpy banks, then a full H2D copy of the gathered features
(``sliding_window.py:341-375`` + DataLoader workers). At EPIC recognition
shapes that moves ~56 MB per step over PCIe.

TPU-native alternative: upload each split's feature banks to HBM **once**
(videos concatenated along time into one [sum_T, A, D] array), precompute
global row indices per window, and gather windows + augmentation sets
*inside the jit step*. Per-step host->device traffic drops to a few KB of
int32 indices; the gather itself is an HBM-local ``jnp.take`` that XLA
fuses with the embedder matmul.

EPIC-100 scale check: ~700 videos x ~9 h total x 5 feats/s x 2 aug x
2048-d fp32 visual ~= 2.7 GB — comfortably HBM-resident on one chip; use
bf16 banks or shard the bank over the data axis if it isn't.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tim_tpu.data.windows import WindowSet


class DeviceFeatureBank:
    """All per-video [T, A, D] banks of a split, concatenated in HBM."""

    def __init__(self, feats: Dict[str, np.ndarray],
                 dtype=jnp.float32, device=None):
        self.offsets: Dict[str, int] = {}
        parts = []
        offset = 0
        for vid in sorted(feats):
            arr = np.asarray(feats[vid])
            self.offsets[vid] = offset
            offset += arr.shape[0]
            parts.append(arr)
        bank = np.concatenate(parts, axis=0)
        self.num_aug = bank.shape[1]
        self.dim = bank.shape[2]
        arr = jnp.asarray(bank, dtype)
        if device is not None:
            arr = jax.device_put(arr, device)
        self.bank = arr

    def global_indices(self, video_id: str,
                       feat_indices: np.ndarray) -> np.ndarray:
        return np.asarray(feat_indices) + self.offsets[video_id]

    def gather(self, indices: jnp.ndarray,
               aug_indices: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """indices [B, F] global rows (+ optional aug set per token) ->
        [B, F, D]. jit-compatible."""
        rows = jnp.take(self.bank, indices, axis=0)      # [B, F, A, D]
        if aug_indices is None:
            return rows[:, :, 0]
        return jnp.take_along_axis(
            rows, aug_indices[:, :, None, None], axis=2)[:, :, 0]


def window_index_table(windows: WindowSet,
                       bank: DeviceFeatureBank) -> np.ndarray:
    """[num_windows, num_feats] global feature-row indices, precomputed
    once per split."""
    return np.stack([
        bank.global_indices(w.video_id, w.feat_indices)
        for w in windows.windows
    ]).astype(np.int32)


def gather_window_batch(
    v_bank: Optional[DeviceFeatureBank],
    a_bank: Optional[DeviceFeatureBank],
    indices: jnp.ndarray,            # [B, F] global rows
    rng: Optional[jax.Array] = None,
) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Gather (v_feats, a_feats) for a batch of windows on device, sampling
    one augmentation set per feature token like the host dataset
    (``sliding_window.py:355-375``). Pass rng=None for clean set 0."""
    v = a = None
    if v_bank is not None:
        aug = None
        if rng is not None and v_bank.num_aug > 1:
            rng, sub = jax.random.split(rng)
            aug = jax.random.randint(sub, indices.shape, 0, v_bank.num_aug)
        v = v_bank.gather(indices, aug)
    if a_bank is not None:
        aug = None
        if rng is not None and a_bank.num_aug > 1:
            rng, sub = jax.random.split(rng)
            aug = jax.random.randint(sub, indices.shape, 0, a_bank.num_aug)
        a = a_bank.gather(indices, aug)
    return v, a
