"""Extraction subsystem: audio frontend invariants, tables, pipeline,
augmentations."""

import os

import numpy as np
import pytest

from tim_tpu.extract import audio as A
from tim_tpu.extract import augment as aug
from tim_tpu.extract import pipeline as P
from tim_tpu.extract import tables as T


def test_mel_filterbank_properties():
    fb = A.mel_filterbank(24000, 2048, 128)
    assert fb.shape == (128, 1025)
    assert (fb >= 0).all()
    # triangular filters: each has one contiguous support region
    for row in fb[::16]:
        nz = np.flatnonzero(row > 0)
        if nz.size:
            assert (np.diff(nz) == 1).all()
    # centers increase monotonically
    centers = fb.argmax(axis=1)
    assert (np.diff(centers.astype(int)) >= 0).all()


def test_log_mel_pure_tone_peaks_at_right_mel():
    sr = 24000
    t = np.arange(sr) / sr
    for freq in (440.0, 2000.0, 8000.0):
        tone = np.sin(2 * np.pi * freq * t).astype(np.float32)
        spec = A.log_mel_spectrogram(tone, sr)
        assert spec.shape[1] == 128
        mean_spec = spec.mean(axis=0)
        peak_mel = mean_spec.argmax()
        # expected mel bin for the tone
        mels = A.hz_to_mel_htk(np.asarray([freq]))[0]
        edges = np.linspace(A.hz_to_mel_htk(0.0), A.hz_to_mel_htk(sr / 2),
                            130)
        expect = int(np.searchsorted(edges, mels)) - 1
        assert abs(int(peak_mel) - expect) <= 2, (freq, peak_mel, expect)


def test_extract_clip_spectrogram_shape_and_padding():
    sr = 24000
    samples = np.random.default_rng(0).normal(
        size=int(sr * 0.999)).astype(np.float32)
    spec = A.extract_clip_spectrogram(samples, 0, len(samples),
                                      sampling_rate=sr, num_frames=200)
    assert spec.shape == (200, 128)
    # short clip -> edge padded
    short = A.extract_clip_spectrogram(samples[:sr // 10], 0, sr // 10,
                                       sampling_rate=sr, num_frames=200)
    assert short.shape == (200, 128)
    np.testing.assert_allclose(short[-1], short[-2])


def test_uniform_clip_indices_golden_vs_reference():
    """Exact vs the reference ``get_start_end_idx``
    (``audio_loader_epic.py:6-34``) executed in-process (librosa stubbed
    out — only the sampling math is under test)."""
    import importlib.util
    import sys
    import types

    import pytest
    pytest.importorskip("torch")
    fake = types.ModuleType("librosa")
    fake.stft = None
    fake.filters = types.SimpleNamespace(mel=None)
    sys.modules.setdefault("librosa", fake)
    spec = importlib.util.spec_from_file_location(
        "ref_audio_loader",
        "/root/reference/feature_extractors/auditory_slowfast/slowfast/"
        "datasets/audio_loader_epic.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    for num_samples, clip, idx, n_clips, start in [
            (1000, 200, 0, 5, 0), (1000, 200, 4, 5, 0),
            (1000, 200, 2, 5, 37), (1000, 200, 0, 1, 0),
            (150, 200, 3, 5, 10), (999, 251, 1, 4, 0)]:
        want_s, want_e = ref.get_start_end_idx(num_samples, clip, idx,
                                               n_clips, start)
        got_s, got_e = A.uniform_clip_indices(num_samples, clip, idx,
                                              n_clips, start)
        assert (got_s, got_e) == (int(want_s), int(want_e)), (
            num_samples, clip, idx, n_clips, start)

    # training path: random start within [0, delta]
    s, e = A.uniform_clip_indices(1000, 200, -1, 5,
                                  rng=np.random.default_rng(0))
    assert 0 <= s <= 800 and e == s + 199


def test_omnivore_frame_indices_matches_reference_formula():
    """Oracle transcription of the reference 'like omnivore' sampler
    (``frame_loader.py:52-60``; the function itself does file I/O so it
    cannot run in-process) evaluated in torch, incl. the 1-based clamp."""
    import pytest
    torch = pytest.importorskip("torch")

    from tim_tpu.extract.pipeline import omnivore_frame_indices

    num_samples = 32
    for start, stop, total in [(100, 155, 10000), (1, 34, 500),
                               (9990, 10045, 10000), (7, 12, 40)]:
        num_frames = stop - start
        seg_size = float(num_frames - 1) / num_samples
        seq = []
        for i in range(num_samples):
            a = int(np.round(seg_size * i))
            b = int(np.round(seg_size * (i + 1)))
            seq.append((a + b) // 2)
        want = torch.clamp(torch.tensor(start + np.array(seq)), 1,
                           total).numpy()
        got = omnivore_frame_indices(num_frames, start, total, num_samples)
        np.testing.assert_array_equal(got, want)


def test_feature_time_table_matches_reference_scheme():
    df = T.build_feature_time_table({"v1": 3.0}, interval=1.1, hop=0.2)
    # starts at 0, hops 0.2 while start+interval < duration
    assert df.iloc[0]["start_sec"] == 0.0
    assert df.iloc[0]["stop_sec"] == 1.1
    assert df.iloc[1]["start_sec"] == 0.2
    assert (df["stop_sec"] - df["start_sec"]).round(2).eq(1.1).all()
    assert df.index[0] == "v1_1"
    assert df.iloc[-1]["stop_sec"] < 3.0 + 1e-9


def test_extract_features_pipeline_and_merge(tmp_path):
    import jax.numpy as jnp

    def clip_fn(t, a):
        return np.full((4, 4), t * 10 + a, np.float32)

    def apply_fn(clips):
        return jnp.mean(clips, axis=(1, 2), keepdims=False)[:, None] * \
            jnp.ones((1, 1024))

    bank = P.extract_features_for_video(clip_fn, 5, 2, apply_fn,
                                        batch_size=3)
    assert bank.shape == (5, 2, 1024)
    assert bank[3, 1, 0] == pytest.approx(31.0)

    # save in two dirs and merge
    for name in ("omni", "mae"):
        P.save_feature_bank(str(tmp_path / name), "train", "v1", bank)
    n = P.merge_feature_dirs(str(tmp_path / "omni"), str(tmp_path / "mae"),
                             str(tmp_path / "merged"))
    assert n == 1
    merged = np.load(tmp_path / "merged" / "train" / "v1.npy")
    assert merged.shape == (5, 2, 2048)


def test_preprocess_video_clip():
    frames = np.random.default_rng(0).integers(
        0, 255, (3, 120, 160, 3)).astype(np.uint8)
    clip = P.preprocess_video_clip(frames, size=96)
    assert clip.shape == (3, 96, 96, 3)
    assert np.isfinite(clip).all()


def test_omnivore_test_transform_golden():
    """Exact parity with the reference pixel block (epickitchens.py:
    126-155 + transform.uniform_crop) executed in-process on torch."""
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_omni_transform",
        "/root/reference/feature_extractors/omnivore/omnivore/"
        "datasets/transform.py")
    ref_tf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_tf)
    import cv2

    mean, std = [0.485, 0.456, 0.406], [0.229, 0.224, 0.225]
    rng = np.random.default_rng(1)
    for h, w, size in [(120, 160, 96), (121, 161, 96), (256, 456, 224)]:
        bgr = rng.integers(0, 255, (3, h, w, 3)).astype(np.uint8)
        # ---- reference block, verbatim semantics ----
        t_frames = torch.from_numpy(bgr)
        scale = size / t_frames.shape[1]
        resized = [cv2.resize(f.numpy(), (0, 0), fx=scale, fy=scale)
                   for f in t_frames]
        arr = np.concatenate([np.expand_dims(f, 0) for f in resized], 0)
        t = torch.from_numpy(np.ascontiguousarray(arr))
        t = torch.flip(t, dims=[3]).float() / 255.0
        t = (t - torch.tensor(mean)) / torch.tensor(std)
        t = t.permute(3, 0, 1, 2)
        ref, _ = ref_tf.uniform_crop(t, size, spatial_idx=1)
        ref = ref.permute(1, 2, 3, 0).numpy()          # back to T H W C
        # ---- ours ----
        mine = P.omnivore_test_transform(bgr, size=size, input_bgr=True)
        np.testing.assert_allclose(ref, mine, atol=1e-6)
        # the NUM_SPATIAL_CROPS=3 crops too (left/right or top/bottom)
        for si in (0, 2):
            ref_si, _ = ref_tf.uniform_crop(t, size, spatial_idx=si)
            np.testing.assert_allclose(
                ref_si.permute(1, 2, 3, 0).numpy(),
                P.omnivore_test_transform(bgr, size=size, input_bgr=True,
                                          spatial_idx=si), atol=1e-6)


def test_spec_augment_preserves_shape_and_mean_fill():
    import random as pyrandom
    rng = pyrandom.Random(0)
    spec = np.random.default_rng(1).normal(size=(200, 128)).astype(
        np.float32)
    out = aug.spec_augment(spec.copy(), rng=rng)
    assert out.shape == spec.shape
    assert np.isfinite(out).all()

    masked = aug.freq_mask(spec.copy(), max_width=27, num_masks=1,
                           rng=pyrandom.Random(3))
    assert masked.shape == spec.shape


def test_random_erasing():
    import random as pyrandom
    frames = np.full((3, 32, 32, 3), 100, np.uint8)
    out = aug.random_erasing(frames, probability=1.0,
                             rng=pyrandom.Random(0))
    assert out.shape == frames.shape
    assert (out != frames).any()          # something was erased
    # consistent across frames (per_frame=False)
    changed = (out != frames).any(-1)
    np.testing.assert_array_equal(changed[0], changed[1])
    # probability 0 -> untouched
    same = aug.random_erasing(frames, probability=0.0,
                              rng=pyrandom.Random(0))
    np.testing.assert_array_equal(same, frames)


def test_rand_augment_runs_all_ops():
    frames = np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3)).astype(np.uint8)
    ra = aug.RandAugment(magnitude=9, num_ops=2)
    out = ra(frames)
    assert out.shape == frames.shape
    # every op individually produces a valid image
    from PIL import Image
    img = Image.fromarray(frames[0])
    for name in aug.RAND_AUGMENT_OPS:
        res = aug._apply_op(img, name, 7.0)
        assert np.asarray(res).shape == (64, 64, 3)


def test_record_clip_bounds_short_record_rule():
    """Short records never read past their end (audio_loader_epic.py:
    74-83); long records follow get_start_end_idx exactly."""
    # short: record of 1000 samples, clip of 23976 -> the record itself
    assert A.record_clip_bounds(500, 1500, 23976, 0, 3) == (500, 1500)
    assert A.record_clip_bounds(500, 1500, 23976, 2, 3) == (500, 1500)
    # long: uniform crops across the record, clip_size - 1 span
    s0, e0 = A.record_clip_bounds(0, 50000, 23976, 0, 3)
    s2, e2 = A.record_clip_bounds(0, 50000, 23976, 2, 3)
    assert (s0, e0) == (0, 23975)
    assert (s2, e2) == (50000 - 23976, 50000 - 1)
    # exact boundary: record == clip size is NOT short
    sb, eb = A.record_clip_bounds(100, 100 + 23976, 23976, 1, 3)
    assert (sb, eb) == (100, 100 + 23975)


def test_random_erasing_per_frame_independent():
    """per_frame=True (the finetune recipe): each frame rolls its own
    probability and region, like timm's batched RandomErasing."""
    import random as pyrandom
    frames = np.full((16, 32, 32, 3), 100, np.uint8)
    out = aug.random_erasing(frames, probability=0.5, per_frame=True,
                             rng=pyrandom.Random(3))
    changed = (out != frames).any(-1)            # [T, H, W]
    per_frame_any = changed.any((1, 2))
    # some frames erased, some untouched (p=0.5 over 16 frames)
    assert 0 < per_frame_any.sum() < 16
    # erased regions differ between (at least some) erased frames
    idx = np.flatnonzero(per_frame_any)
    if len(idx) >= 2:
        masks = [changed[i] for i in idx]
        assert any(not np.array_equal(masks[0], m) for m in masks[1:])
