"""Feature-extraction CLI: raw frames/audio -> per-video [T, A, D] npy.

One entry point replacing the reference's three extractor programs
(``omnivore/tools/run_net.py``, ``auditory_slowfast/tools/run_net.py``,
``VideoMAE/feature_extraction.py``) plus their ``make_npyfiles`` reshapers:

    python -m tim_tpu.extract.cli --backbone omnivore \
        --frames_dir ... --feature_times ctx.pkl --checkpoint swinB.torch \
        --out_dir feats/omnivore --split train [--num_aug 2]

    python -m tim_tpu.extract.cli --backbone slowfast \
        --audio_hdf5 EPIC_audio.hdf5 --feature_times a_ctx.pkl ...

Checkpoints are the released torch files; conversion happens in-process.
Multi-host sharding: pass --num_shards/--shard_id to split videos by rank
(the reference shards VideoMAE extraction via SLURM the same way,
``feature_extraction.py:173-181``).
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Dict

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="TIM-TPU feature extraction")
    p.add_argument("--backbone", required=True,
                   choices=["omnivore", "videomae", "slowfast"])
    p.add_argument("--frames_dir", default="",
                   help="<frames_dir>/<video_id>/*.jpg")
    p.add_argument("--audio_hdf5", default="",
                   help="HDF5 with one float waveform dataset per video")
    p.add_argument("--audio_dir", default="",
                   help="directory of <video_id>.wav files")
    p.add_argument("--feature_times", required=True,
                   help="feature-time table pickle (make_framepickle format)")
    p.add_argument("--checkpoint", default="",
                   help="released torch checkpoint to convert + load")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--num_aug", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--fps", type=float, default=50.0)
    p.add_argument("--sampling_rate", type=int, default=24000)
    p.add_argument("--num_frames", type=int, default=32)
    p.add_argument("--frame_stride", type=int, default=2)
    p.add_argument("--crop_size", type=int, default=224)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--shard_id", type=int, default=0)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--flash_attention", default="auto",
                   choices=["auto", "on", "off"],
                   help="Pallas TPU flash/window attention in the ViT and "
                        "Swin backbones (measured 2.6x ViT-L: 38.6 -> 14.7 "
                        "ms/clip); auto = on when the backend is TPU")
    p.add_argument("--quantize_backbone", default="off",
                   choices=["auto", "on", "off"],
                   help="int8 matmuls with dynamic per-row activation "
                        "scales. Measured 0.90x bf16 on VideoMAE ViT-L "
                        "(13.3 vs 14.7 ms/clip b8+flash) but a 16% LOSS "
                        "on Swin-B; auto = on only for --backbone "
                        "videomae on a TPU backend. ~1-2% feature-level "
                        "max-rel delta vs bf16")
    return p


def _load_torch_state(path: str):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("trunk", "model", "state_dict", "model_state"):
        if isinstance(ckpt, dict) and key in ckpt:
            return ckpt[key]
    return ckpt


def _make_visual_apply(args):
    import jax
    import jax.numpy as jnp

    flash = (jax.default_backend() == "tpu"
             if getattr(args, "flash_attention", "auto") == "auto"
             else args.flash_attention == "on")
    qmode = getattr(args, "quantize_backbone", "off")
    # dynamic-int8 wins only on the ViT (docs/PERFORMANCE.md round 4)
    quant_on = (qmode == "on" or
                (qmode == "auto" and args.backbone == "videomae"
                 and jax.default_backend() == "tpu"))
    if args.backbone == "omnivore":
        from tim_tpu.models.backbones import swin3d
        model = swin3d.omnivore_swinB_epic(dtype=args.compute_dtype,
                                           use_flash=flash,
                                           quantized=quant_on)
        variables = swin3d.params_from_torch(
            _load_torch_state(args.checkpoint)) if args.checkpoint else None
    else:
        from tim_tpu.models.backbones import vit
        model = vit.videomae_vit_large(dtype=args.compute_dtype,
                                       use_flash=flash,
                                       quantized=quant_on)
        variables = vit.params_from_torch(
            _load_torch_state(args.checkpoint)) if args.checkpoint else None
    if variables is None:
        rng = jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, args.num_frames, args.crop_size,
                           args.crop_size, 3))
        if quant_on:
            # init the fp32 layout, then quantize (matches the
            # checkpoint path below)
            fp_model = (swin3d.omnivore_swinB_epic(
                            dtype=args.compute_dtype, use_flash=flash)
                        if args.backbone == "omnivore" else
                        vit.videomae_vit_large(
                            dtype=args.compute_dtype, use_flash=flash))
            variables = fp_model.init(rng, dummy)
        else:
            variables = model.init(rng, dummy)
    if quant_on:
        from tim_tpu.ops.quant import quantize_backbone_params
        variables = {"params": quantize_backbone_params(
            variables["params"])}
    # params ride as explicit jit arguments (device buffers), NOT closure
    # captures — captured trees can end up inlined into the lowered
    # program and blow the remote-compile relay's request-size limit
    # (HTTP 413) at ViT-L scale
    variables = jax.device_put(variables)
    jitted = jax.jit(lambda v, clips: model.apply(
        v, clips).astype(jnp.float32))
    return lambda clips: jitted(variables, clips)


def _make_audio_apply(args):
    import jax
    import jax.numpy as jnp

    from tim_tpu.models.backbones import slowfast as sf

    model = sf.AuditorySlowFast()
    if args.checkpoint:
        variables = sf.params_from_torch(_load_torch_state(args.checkpoint))
    else:
        rng = jax.random.PRNGKey(0)
        variables = model.init(rng, jnp.zeros((1, 50, 128, 1)),
                               jnp.zeros((1, 200, 128, 1)), train=False)

    def apply_fn(spectrograms):
        slow, fast = sf.pack_pathways(spectrograms, alpha=model.alpha)
        _, feats = model.apply(variables, slow, fast, train=False)
        return feats.astype(jnp.float32)

    return jax.jit(apply_fn)


def extract_visual(args, table, video_ids):
    from PIL import Image

    from tim_tpu.extract.autoaug import (
        VideoRandAugment, omnivore_clip_augment)
    from tim_tpu.extract.pipeline import (
        extract_features_for_video, omnivore_frame_indices,
        omnivore_test_transform, preprocess_video_clip,
        save_feature_bank)

    apply_fn = _make_visual_apply(args)
    if args.backbone == "omnivore":
        # epickitchens.py:107-123: fresh rand-m15-mstd0.5-inc1 transform
        # per frame, one clip seed; fill = DATA.MEAN, which every feature
        # yaml overrides to ImageNet (0.485, 0.456, 0.406) -> (124,116,104)
        def ra(frames):
            return omnivore_clip_augment(
                frames, crop_size=args.crop_size,
                mean=(0.485, 0.456, 0.406))
    else:
        # feature_extraction.py:104-112: one timm transform per clip
        # over the frame list, bicubic
        ra = VideoRandAugment("rand-m7-n4-mstd0.5-inc1",
                              crop_size=args.crop_size,
                              interpolation="bicubic")

    for vid in video_ids:
        frame_files = sorted(glob.glob(
            os.path.join(args.frames_dir, vid, "*.jpg")))
        if not frame_files:
            print(f"skipping {vid}: no frames")
            continue
        rows = table[table["video_id"] == vid].sort_values("start_sec")

        def clip_fn(t, a):
            row = rows.iloc[t]
            # 'like omnivore' segment-center sampling; indices are 1-based
            # frame numbers (reference jpg naming)
            idx = omnivore_frame_indices(
                int(row["stop_frame"]) - int(row["start_frame"]),
                int(row["start_frame"]), len(frame_files),
                args.num_frames)
            frames = np.stack([
                np.asarray(Image.open(frame_files[i - 1]).convert("RGB"))
                for i in idx])
            if args.backbone == "omnivore":
                # the reference loads frames with cv2 (BGR) and runs
                # BOTH RandAugment and the pixel block on that order,
                # flipping to RGB mid-transform — emulate it exactly
                frames = frames[..., ::-1]
                if a > 0:
                    frames = ra(frames)
                return omnivore_test_transform(
                    frames, size=args.crop_size, input_bgr=True)
            if a > 0:
                frames = ra(frames)
            return preprocess_video_clip(frames, size=args.crop_size)

        bank = extract_features_for_video(
            clip_fn, len(rows), args.num_aug, apply_fn,
            batch_size=args.batch_size)
        save_feature_bank(args.out_dir, args.split, vid, bank)
        print(f"{vid}: {bank.shape}")


def extract_audio(args, table, video_ids):
    from tim_tpu.extract.audio import (
        extract_clip_spectrogram, record_clip_bounds)
    from tim_tpu.extract.augment import spec_augment
    from tim_tpu.extract.pipeline import (
        extract_features_for_video, save_feature_bank)

    apply_fn = _make_audio_apply(args)
    sr = args.sampling_rate

    def load_waveform(vid) -> np.ndarray:
        if args.audio_hdf5:
            import h5py
            with h5py.File(args.audio_hdf5, "r") as f:
                return np.asarray(f[vid], np.float32)
        from scipy.io import wavfile
        rate, data = wavfile.read(
            os.path.join(args.audio_dir, f"{vid}.wav"))
        assert rate == sr, f"{vid}: {rate} != {sr}"
        if data.dtype.kind == "i":
            data = data.astype(np.float32) / np.iinfo(data.dtype).max
        if data.ndim > 1:
            data = data.mean(axis=1)
        return data.astype(np.float32)

    for vid in video_ids:
        samples = load_waveform(vid)
        rows = table[table["video_id"] == vid].sort_values("start_sec")

        def clip_fn(t, a):
            row = rows.iloc[t]
            rec_start = int(round(row["start_sec"] * sr))
            rec_stop = int(round(float(
                row["stop_sec"] if "stop_sec" in row
                else row["start_sec"] + 1.1) * sr))
            clip_size = int(round(0.999 * sr))
            # aug set a = the a-th uniform temporal crop of the record
            # (``epicsounds.py:76-88`` temporal_sample_index), SpecAugment
            # on every set but the clean first one
            start, end = record_clip_bounds(
                rec_start, rec_stop, clip_size, a, args.num_aug)
            spec = extract_clip_spectrogram(
                samples, start, min(end, len(samples)), sampling_rate=sr)
            if a > 0:
                spec = spec_augment(spec)
            return spec[..., None]  # [T, F, 1]

        bank = extract_features_for_video(
            clip_fn, len(rows), args.num_aug, apply_fn,
            batch_size=args.batch_size)
        save_feature_bank(args.out_dir, args.split, vid, bank)
        print(f"{vid}: {bank.shape}")


def main(argv=None):
    import pandas as pd

    args = build_parser().parse_args(argv)
    table = pd.read_pickle(args.feature_times)
    video_ids = sorted(table["video_id"].unique().tolist())
    video_ids = video_ids[args.shard_id::args.num_shards]

    if args.backbone in ("omnivore", "videomae"):
        extract_visual(args, table, video_ids)
    else:
        extract_audio(args, table, video_ids)


if __name__ == "__main__":
    main()
