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


def _check_aligned_banks(v_bank: Optional[DeviceFeatureBank],
                         a_bank: Optional[DeviceFeatureBank]) -> None:
    """The window tables build ONE global index table and gather BOTH
    banks with it, which is only correct when the two banks have
    identical per-video row layouts. A single extra row in one modality
    of one video would shift every later video's rows — in-bounds
    indices, silently corrupted features — so fail loudly instead."""
    if v_bank is None or a_bank is None:
        return
    if (v_bank.offsets != a_bank.offsets
            or v_bank.bank.shape[0] != a_bank.bank.shape[0]):
        bad = sorted(k for k in (set(v_bank.offsets) | set(a_bank.offsets))
                     if v_bank.offsets.get(k) != a_bank.offsets.get(k))
        raise ValueError(
            "visual/audio feature banks are row-misaligned; the shared "
            "window index table requires identical per-video row counts "
            f"(totals {v_bank.bank.shape[0]} vs {a_bank.bank.shape[0]}; "
            f"first differing videos: {bad[:3]}). Re-extract the two "
            "modalities on a common feature-time grid.")


class DeviceWindowTables:
    """Everything a recognition train step needs, resident on device:
    per-window feature-row indices, normalized times, padded labels. A
    batch is then just [B] window ids — the host does nothing but shuffle
    integers."""

    def __init__(self, windows: WindowSet,
                 v_bank: Optional[DeviceFeatureBank],
                 a_bank: Optional[DeviceFeatureBank],
                 v_feat_times: Optional[Dict[str, np.ndarray]] = None,
                 a_feat_times: Optional[Dict[str, np.ndarray]] = None):
        ws = windows
        nv, na = ws.max_visual_actions, ws.max_audio_actions
        n = len(ws.windows)
        _check_aligned_banks(v_bank, a_bank)
        ref_bank = v_bank or a_bank
        feat_idx = window_index_table(ws, ref_bank)

        nf = feat_idx.shape[1]
        n_mod = (v_bank is not None) + (a_bank is not None)
        t_rows = n_mod * nf + nv + na
        times = np.zeros((n, t_rows, 2), np.float32)
        verb = -np.ones((n, nv), np.int32)
        noun = -np.ones((n, nv), np.int32)
        action = -np.ones((n, nv), np.int32)
        class_id = -np.ones((n, na), np.int32)

        # feature times (reference normalization: (t - start) / window_size,
        # clamped at 0)
        for i, w in enumerate(ws.windows):
            row = 0
            for bank, ft in ((v_bank, v_feat_times), (a_bank, a_feat_times)):
                if bank is None:
                    continue
                assert ft is not None, "feat_times required per modality"
                times[i, row:row + nf] = ft[w.video_id][w.feat_indices, :2]
                row += nf
            vq = np.zeros((nv, 2), np.float32)
            vq[:len(w.v_queries)] = w.v_queries
            aq = np.zeros((na, 2), np.float32)
            aq[:len(w.a_queries)] = w.a_queries
            times[i, row:row + nv] = vq
            times[i, row + nv:] = aq
            times[i] = np.clip(
                (times[i] - w.start_sec) / ws.window_size, 0.0, None)
            verb[i, :len(w.v_labels)] = w.v_labels[:, 0]
            noun[i, :len(w.v_labels)] = w.v_labels[:, 1]
            action[i, :len(w.v_labels)] = w.v_labels[:, 2]
            class_id[i, :len(w.a_labels)] = w.a_labels[:, 3]

        self.feat_indices = jnp.asarray(feat_idx)
        self.times = jnp.asarray(times)
        # host copies stay around for the runners' label prefill
        # (acc.v_labels/a_labels are filled host-side from these once;
        # the vote sums themselves accumulate on device)
        self.labels_host = {"verb": verb, "noun": noun, "action": action,
                            "class_id": class_id}
        self.labels = {k: jnp.asarray(v)
                       for k, v in self.labels_host.items()}
        self.num_windows = n

    def batch(self, window_ids: jnp.ndarray) -> dict:
        """Gather a fixed-shape batch for [B] window ids (jit-compatible)."""
        out = {
            "feat_indices": jnp.take(self.feat_indices, window_ids, axis=0),
            "times": jnp.take(self.times, window_ids, axis=0),
        }
        for k, v in self.labels.items():
            out[k] = jnp.take(v, window_ids, axis=0)
        return out


class DetectionWindowTables:
    """Detection split resident on device: feature-row indices, normalized
    feature times, window-normalized GT segments (+labels), window
    start/size. Mirrors ``DetectionDataset.__getitem__`` semantics
    (round-3 then normalize, zero-padded segments, -1 labels)."""

    def __init__(self, windows: WindowSet,
                 v_bank: Optional[DeviceFeatureBank],
                 a_bank: Optional[DeviceFeatureBank],
                 v_feat_times: Optional[Dict[str, np.ndarray]] = None,
                 a_feat_times: Optional[Dict[str, np.ndarray]] = None,
                 *, verb_only: bool = True,  # reference default
                 include_verb_noun: bool = False,
                 dataset_name: str = "epic"):
        ws = windows
        nv = max(ws.max_visual_actions, 1)
        na = max(ws.max_audio_actions, 1)
        n = len(ws.windows)
        _check_aligned_banks(v_bank, a_bank)
        ref_bank = v_bank or a_bank
        feat_idx = window_index_table(ws, ref_bank)
        nf = feat_idx.shape[1]
        n_mod = (v_bank is not None) + (a_bank is not None)

        times = np.zeros((n, n_mod * nf, 2), np.float32)
        v_seg = np.zeros((n, nv, 2), np.float32)
        a_seg = np.zeros((n, na, 2), np.float32)
        verb = -np.ones((n, nv), np.int32)
        noun = -np.ones((n, nv), np.int32)
        action = -np.ones((n, nv), np.int32)
        class_id = -np.ones((n, na), np.int32)
        win_start = np.zeros(n, np.float32)

        for i, w in enumerate(ws.windows):
            row = 0
            for bank, ft in ((v_bank, v_feat_times), (a_bank, a_feat_times)):
                if bank is None:
                    continue
                t = ft[w.video_id][w.feat_indices, :2]
                times[i, row:row + nf] = np.clip(
                    np.round(t - w.start_sec, 3) / ws.window_size, 0.0,
                    None)
                row += nf
            win_start[i] = w.start_sec
            if len(w.v_queries):
                seg = np.round(w.v_queries - w.start_sec, 3)
                v_seg[i, :len(seg)] = np.clip(seg / ws.window_size, 0.0,
                                              None)
                verb[i, :len(seg)] = w.v_labels[:, 0]
                noun[i, :len(seg)] = w.v_labels[:, 1]
                if dataset_name == "epic" and not include_verb_noun:
                    action[i, :len(seg)] = w.v_labels[:, 0] if verb_only \
                        else w.v_labels[:, 1]
                else:
                    action[i, :len(seg)] = w.v_labels[:, 2]
            if len(w.a_queries):
                seg = np.round(w.a_queries - w.start_sec, 3)
                a_seg[i, :len(seg)] = np.clip(seg / ws.window_size, 0.0,
                                              None)
                class_id[i, :len(seg)] = w.a_labels[:, 3]

        self.feat_indices = jnp.asarray(feat_idx)
        self.times = jnp.asarray(times)
        self.v_gt_segments = jnp.asarray(v_seg)
        self.a_gt_segments = jnp.asarray(a_seg)
        self.labels = {
            "verb": jnp.asarray(verb), "noun": jnp.asarray(noun),
            "action": jnp.asarray(action),
            "class_id": jnp.asarray(class_id),
        }
        self.window_start = jnp.asarray(win_start)
        self.window_size = float(ws.window_size)
        self.num_windows = n

    def batch(self, window_ids: jnp.ndarray) -> dict:
        out = {
            "feat_indices": jnp.take(self.feat_indices, window_ids, axis=0),
            "times": jnp.take(self.times, window_ids, axis=0),
            "v_gt_segments": jnp.take(self.v_gt_segments, window_ids,
                                      axis=0),
            "a_gt_segments": jnp.take(self.a_gt_segments, window_ids,
                                      axis=0),
            "window_start": jnp.take(self.window_start, window_ids, axis=0),
            "window_size": jnp.full(window_ids.shape, self.window_size,
                                    jnp.float32),
        }
        for k, v in self.labels.items():
            out[k] = jnp.take(v, window_ids, axis=0)
        return out


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
