"""Integration golden: the reference Epickitchens dataset's __getitem__
executed in-process (fvcore/torchvision/omnivore-logging stubbed) vs our
composed extraction path (frame sampling + seeded RandAugment + pixel
block). This seals the seams between the per-piece goldens."""

import importlib
import random
import sys
import types
from types import SimpleNamespace as NS

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")
pytest.importorskip("PIL")

DATASETS_DIR = ("/root/reference/feature_extractors/omnivore/omnivore/"
                "datasets")


@pytest.fixture()
def ref_epickitchens(monkeypatch):
    import logging as pylogging

    # --- absolute-import stubs ------------------------------------------
    class _Registry:
        def __init__(self, name):
            self._m = {}

        def register(self):
            def deco(cls):
                self._m[cls.__name__] = cls
                return cls
            return deco

        def get(self, name):
            return self._m[name]

    fv_reg = types.ModuleType("fvcore.common.registry")
    fv_reg.Registry = _Registry
    fv_common = types.ModuleType("fvcore.common")
    fv = types.ModuleType("fvcore")

    class _ToPILImage:
        def __call__(self, arr):
            from PIL import Image
            return Image.fromarray(np.asarray(arr))

    tv_transforms = types.ModuleType("torchvision.transforms")
    tv_transforms.ToPILImage = _ToPILImage
    tv = types.ModuleType("torchvision")
    tv.transforms = tv_transforms

    omni_logging = types.ModuleType("omnivore.utils.logging")
    omni_logging.get_logger = pylogging.getLogger
    omni_utils = types.ModuleType("omnivore.utils")
    omni = types.ModuleType("omnivore")

    pkg = types.ModuleType("refomnids")
    pkg.__path__ = [DATASETS_DIR]

    for name, mod in [
        ("fvcore", fv), ("fvcore.common", fv_common),
        ("fvcore.common.registry", fv_reg),
        ("torchvision", tv), ("torchvision.transforms", tv_transforms),
        ("omnivore", omni), ("omnivore.utils", omni_utils),
        ("omnivore.utils.logging", omni_logging),
        ("refomnids", pkg),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    # drop any previously imported submodules of the throwaway package
    for name in [k for k in sys.modules if k.startswith("refomnids.")]:
        monkeypatch.delitem(sys.modules, name)
    return importlib.import_module("refomnids.epickitchens")


def _write_video_frames(root, participant, video_id, n, h, w, seed):
    d = root / participant / "rgb_frames" / video_id
    d.mkdir(parents=True)
    rng = np.random.default_rng(seed)
    for i in range(1, n + 1):
        bgr = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(d / f"frame_{i:010d}.jpg"), bgr)
    return d


def _cfg(tmp_path, crop, num_frames, num_features, use_ra):
    return NS(
        TEST=NS(NUM_FEATURES=num_features, NUM_SPATIAL_CROPS=1),
        DATA=NS(NUM_FRAMES=num_frames, TEST_CROP_SIZE=crop,
                MEAN=[0.485, 0.456, 0.406], STD=[0.229, 0.224, 0.225],
                FRAME_SAMPLING="like omnivore", USE_RAND_AUGMENT=use_ra),
        EPICKITCHENS=NS(TEST_LIST=str(tmp_path / "ann.pkl"),
                        VISUAL_DATA_DIR=str(tmp_path / "frames")),
    )


@pytest.mark.parametrize("use_ra,h,w", [
    (False, 80, 100), (True, 80, 100),
    (False, 100, 72),   # portrait: height-based scale != short side,
                        # exercises the uniform_crop portrait branch
])
def test_epickitchens_getitem_matches_our_pipeline(
        ref_epickitchens, tmp_path, use_ra, h, w):
    pd = pytest.importorskip("pandas")

    from tim_tpu.extract.autoaug import omnivore_clip_augment
    from tim_tpu.extract.pipeline import (
        omnivore_frame_indices, omnivore_test_transform)

    crop, num_frames = 64, 8
    n_video_frames = 60
    frames_dir = _write_video_frames(
        tmp_path / "frames", "P01", "P01_101", n_video_frames, h, w, 7)

    ann = pd.DataFrame({
        "video_id": ["P01_101", "P01_101"],
        "start_frame": [5, 20],
        "stop_frame": [40, 58],
    }, index=pd.Index(["n0", "n1"], name="narration_id"))
    ann.to_pickle(tmp_path / "ann.pkl")

    # num_features=2 -> clip index 0 clean, 1 augmented (when use_ra)
    cfg = _cfg(tmp_path, crop, num_frames, 2, use_ra)
    ds = ref_epickitchens.Epickitchens(cfg, "test")
    assert len(ds) == 4  # 2 records x 2 temporal clips

    for item_idx in range(len(ds)):
        record = item_idx // 2
        temporal_idx = item_idx % 2

        random.seed(100 + item_idx)
        np.random.seed(200 + item_idx)
        ref_frames, _label, _idx, meta = ds[item_idx]
        ref_clip = ref_frames.permute(1, 2, 3, 0).numpy()  # C,T,H,W->T,H,W,C
        assert meta["narration_id"] == f"n{record}"

        # ---- ours: the extraction pipeline pieces, same ambient RNG ----
        random.seed(100 + item_idx)
        np.random.seed(200 + item_idx)
        start = int(ann.iloc[record]["start_frame"])
        stop = int(ann.iloc[record]["stop_frame"])
        idx = omnivore_frame_indices(stop - start, start,
                                     n_video_frames, num_frames)
        bgr = np.stack([
            cv2.imread(str(frames_dir / f"frame_{i:010d}.jpg"))
            for i in idx])
        if use_ra and temporal_idx != 0:
            bgr = omnivore_clip_augment(bgr, crop_size=crop)
        ours = omnivore_test_transform(bgr, size=crop, input_bgr=True)

        np.testing.assert_allclose(ref_clip, ours, atol=1e-5,
                                   err_msg=f"item {item_idx}")
