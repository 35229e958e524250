"""EK100 clip dataset: frame loading golden vs the reference's
``ek100.py`` executed in-process (real JPEG frame dirs), aug pipeline
shapes, and a two-head finetune overfit."""

import importlib.util
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from tim_tpu.extract import clips as C

EK100 = "/root/reference/feature_extractors/VideoMAE/ek100.py"


def _write_frames(tmp_path, video_id="v01", n=37, h=48, w=64):
    """JPEG frames whose mean encodes the frame number (robust to JPEG
    loss), 1-based like the reference's extract_frames output."""
    cv2 = pytest.importorskip("cv2")
    d = tmp_path / video_id
    d.mkdir(parents=True, exist_ok=True)
    for i in range(1, n + 1):
        img = np.full((h, w, 3), min(i * 5, 250), np.uint8)
        cv2.imwrite(str(d / f"img_{i:05d}.jpg"), img)
    return str(tmp_path)


def _load_reference(monkeypatch):
    """Execute the reference dataset module with its heavyweight deps
    stubbed (decord/torchvision/video_transforms are only needed for the
    aug paths, not for load_frame)."""
    pytest.importorskip("torch")
    for name in ("video_transforms", "volume_transforms"):
        mod = types.ModuleType(name)
        mod.Compose = lambda *a, **k: (lambda x: x)
        mod.Resize = mod.CenterCrop = mod.Normalize = \
            mod.ClipToTensor = lambda *a, **k: None
        monkeypatch.setitem(sys.modules, name, mod)
    dec = types.ModuleType("decord")
    dec.VideoReader = object
    dec.cpu = None
    monkeypatch.setitem(sys.modules, "decord", dec)
    re_mod = types.ModuleType("random_erasing")
    re_mod.RandomErasing = lambda *a, **k: (lambda x: x)
    monkeypatch.setitem(sys.modules, "random_erasing", re_mod)
    tv = types.ModuleType("torchvision")
    tv.transforms = types.SimpleNamespace(
        ToPILImage=lambda *a, **k: None, ToTensor=lambda *a, **k: None)
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.transforms",
                        tv.transforms)
    spec = importlib.util.spec_from_file_location("ref_ek100", EK100)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_dataset(ref, tmp_path, data_path, mode, total=30, offset=4,
                 num_frames=16):
    import pandas as pd
    csv = tmp_path / "anno.csv"
    pd.DataFrame([{"video_id": "v01", "start_frame": offset,
                   "stop_frame": offset + total,
                   "verb_class": 3, "noun_class": 7}]).to_csv(csv,
                                                              index=False)
    args = types.SimpleNamespace(reprob=0.0, num_sample=1,
                                 aa="rand-m7-n4-mstd0.5-inc1",
                                 train_interpolation="bicubic")
    return ref.EKRawFrameClsDataset(
        anno_path=str(csv), data_path=data_path, mode=mode,
        clip_len=1, num_segment=num_frames, test_num_segment=5,
        test_num_crop=3, args=args)


@pytest.mark.parametrize("total", [30, 16, 10, 3])
def test_val_frame_loading_golden(tmp_path, monkeypatch, total):
    """Validation-mode frames must match the reference's load_frame
    byte-for-byte (deterministic index math + JPEG decode)."""
    ref = _load_reference(monkeypatch)
    data_path = _write_frames(tmp_path, n=60)
    ds = _ref_dataset(ref, tmp_path, data_path, "validation", total=total)
    want = ds.load_frame(f"{data_path}/v01", total, 4)

    reader = C.jpeg_frame_reader(data_path)
    idx = C.sample_val_indices(total, 16)
    got = reader("v01", idx, 4)
    np.testing.assert_array_equal(got, want)


def test_test_mode_frame_loading_golden(tmp_path, monkeypatch):
    ref = _load_reference(monkeypatch)
    data_path = _write_frames(tmp_path, n=60)
    ds = _ref_dataset(ref, tmp_path, data_path, "test", total=30)
    want = ds.load_frame(f"{data_path}/v01", 30, 4)

    reader = C.jpeg_frame_reader(data_path)
    idx = C.sample_test_indices(30, 16, 5)
    got = reader("v01", idx, 4)
    np.testing.assert_array_equal(got, want)


def test_train_indices_properties():
    rng = np.random.default_rng(0)
    # segment-uniform: one frame per segment bucket
    for total in (64, 33):
        idx = C.sample_train_indices(total, 16, rng)
        avg = total // 16
        assert idx.shape == (16,)
        assert ((idx >= np.arange(16) * avg)
                & (idx < (np.arange(16) + 1) * avg)).all()
    # shorter than segments: 0-padded ramp, reference ek100.py:316-318
    np.testing.assert_array_equal(
        C.sample_train_indices(3, 8, rng), [0] * 5 + [0, 1, 2])


def test_train_mode_shapes_and_aug(tmp_path):
    data_path = _write_frames(tmp_path, n=40)
    import pandas as pd
    anno = pd.DataFrame([{"video_id": "v01", "start_frame": 2,
                          "stop_frame": 38, "verb_class": 1,
                          "noun_class": 2}])
    ds = C.EK100ClipDataset(
        anno, C.jpeg_frame_reader(data_path), mode="train",
        num_frames=8, crop_size=32, short_side_size=40, num_sample=2,
        rng=np.random.default_rng(0))
    ex = ds[0]
    assert ex["video"].shape == (2, 8, 32, 32, 3)
    assert ex["video"].dtype == np.float32
    assert (ex["verb"] == 1).all() and (ex["noun"] == 2).all()
    # the two samples are independently augmented
    assert not np.allclose(ex["video"][0], ex["video"][1])

    val = C.EK100ClipDataset(
        anno, C.jpeg_frame_reader(data_path), mode="validation",
        num_frames=8, crop_size=32, short_side_size=40)
    ev = val[0]
    assert ev["video"].shape == (8, 32, 32, 3)

    test = C.EK100ClipDataset(
        anno, C.jpeg_frame_reader(data_path), mode="test",
        num_frames=8, crop_size=32, short_side_size=40,
        test_num_segment=3, test_num_crop=2)
    assert len(test) == 6
    et = test[0]
    assert et["video"].shape[1:] == (40, 40, 3)


def test_two_head_finetune_overfit(tmp_path):
    """Synthetic class-separable clips: a tiny TwoHeadViT must overfit."""
    import pandas as pd

    from tim_tpu.models.backbones.vit import VideoMAEViT
    from tim_tpu.runner.backbone import (
        BackboneFinetuneRunner, TwoHeadViT)

    rng = np.random.default_rng(0)

    def reader(video_id, indices, frame_offset):
        # class-dependent mean encoded in the pixels
        label = int(video_id[1:])
        base = 60 + 120 * label
        return np.clip(rng.normal(base, 8, size=(len(indices), 32, 32, 3)),
                       0, 255).astype(np.uint8)

    anno = pd.DataFrame([
        {"video_id": f"v{k}", "start_frame": 0, "stop_frame": 32,
         "verb_class": k, "noun_class": 1 - k}
        for k in (0, 1) for _ in range(4)
    ])
    train = C.EK100ClipDataset(anno, reader, mode="train", num_frames=4,
                               crop_size=32, short_side_size=36,
                               num_sample=1, reprob=0.0,
                               rng=np.random.default_rng(1))
    val = C.EK100ClipDataset(anno, reader, mode="validation", num_frames=4,
                             crop_size=32, short_side_size=36)
    model = TwoHeadViT(
        trunk=VideoMAEViT(img_size=32, patch_size=8, embed_dim=32, depth=1,
                          num_heads=2, num_frames=4, tubelet_size=2,
                          dtype=jnp.float32),
        num_verbs=2, num_nouns=2)
    runner = BackboneFinetuneRunner(
        model, train, val, batch_size=8, epochs=12, lr=2e-3,
        mixup_alpha=0.0, smoothing=0.0, warmup_epochs=0)
    runner.init_state()
    runner.fit()
    stats = runner.validate()
    assert stats["verb_top1"] >= 75.0
    assert stats["noun_top1"] >= 75.0