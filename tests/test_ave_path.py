"""AVE spatial path end-to-end: AVGA golden vs the reference's own
``pool.py`` executed in-process, flat [T, A, P*Dv] feature banks through
the data layer, and a full train step on synthetic 7x7 maps."""

import importlib.util

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tim_tpu import config as C
from tim_tpu.models.pool import AVGA


def _load_ref(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_avga_golden_vs_reference_pool():
    """Random reference-layout torch weights -> converted flax AVGA must
    reproduce the reference forward ([B, T, 7, 7, Dv] maps)."""
    torch = pytest.importorskip("torch")
    ref = _load_ref("/root/reference/recognition/time_interval_machine/"
                    "models/helpers/pool.py", "ref_pool")
    torch.manual_seed(0)
    a_dim, v_dim, hidden = 16, 24, 24
    ref_pool = ref.AVGA(a_dim=a_dim, v_dim=v_dim, hidden_size=hidden)
    ref_pool.eval()

    b, t = 2, 5
    audio = torch.randn(b, t, a_dim)
    video = torch.randn(b, t, 7, 7, v_dim)
    with torch.no_grad():
        want = ref_pool(audio, video).numpy()

    sd = ref_pool.state_dict()

    def lin(name):
        p = {"kernel": sd[f"{name}.weight"].numpy().T}
        if f"{name}.bias" in sd:
            p["bias"] = sd[f"{name}.bias"].numpy()
        return p

    params = {name: lin(name) for name in
              ("affine_audio", "affine_video", "affine_v", "affine_g",
               "affine_h")}
    got = AVGA(hidden_size=hidden).apply(
        {"params": params},
        jnp.asarray(audio.numpy()),
        jnp.asarray(video.numpy()).reshape(b, t, 49, v_dim))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_flat_spatial_bank_matches_4d():
    """Model-side reshape of flat [B, T, P*Dv] inputs equals explicit 4-D
    maps (the reference stores AVE npys flattened and views in forward)."""
    from tim_tpu.models import TimRecognition

    cfg = C.ave_recognition(
        visual_classes=(4,), audio_classes=4, visual_input_dim=12,
        audio_input_dim=8, d_model=16, nhead=2, num_layers=1, num_feats=5,
        compute_dtype="float32")
    model = TimRecognition(cfg)
    rng = np.random.default_rng(0)
    b, nv, na = 2, 2, 2
    v4 = jnp.asarray(rng.normal(size=(b, 5, 49, 12)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(b, 5, 8)), jnp.float32)
    times = jnp.zeros((b, 10 + nv + na, 2))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, v4, a, times,
                           nv, na, deterministic=True)
    out4, _ = model.apply(variables, v4, a, times, nv, na,
                          deterministic=True)
    flat = v4.reshape(b, 5, 49 * 12)
    out_flat, _ = model.apply(variables, flat, a, times, nv, na,
                              deterministic=True)
    for g4, gf in zip(out4, out_flat):
        if g4 is None:
            assert gf is None
            continue
        np.testing.assert_allclose(np.asarray(gf), np.asarray(g4),
                                   atol=1e-6)


def test_ave_preset_end_to_end_training():
    """Full AVE slice: flat spatial banks -> windows -> runner train step
    + validation (combined head) on synthetic data."""
    from tim_tpu.data import synthetic
    from tim_tpu.data.dataset import FeatureStore, RecognitionDataset
    from tim_tpu.data.windows import (
        build_recognition_windows, normalize_actions)
    from tim_tpu.runner import RecognitionRunner

    p, dv, da = 49, 8, 6
    b = synthetic.synthetic_epic(
        seed=3, num_videos=2, video_seconds=40.0, per_video=6,
        visual_dim=p * dv, audio_dim=da, visual_classes=(4,),
        audio_classes=4)
    # synthetic_epic emits flat visual features [T, A, p*dv] — exactly the
    # reference AVE npy layout. AVE annotations carry one event class_id
    # for both streams.
    b["v_actions"]["class_id"] = b["v_actions"]["action_class"]
    v_norm = normalize_actions(b["v_actions"], "visual", "ave")
    a_norm = normalize_actions(b["a_actions"], "audio", "ave")
    ws = build_recognition_windows(
        v_norm, a_norm, b["video_info"], b["v_feat_times"],
        num_feats=5, feat_stride=2, feat_gap=0.2)
    v_store = FeatureStore(b["v_feats"], b["v_feat_times"])
    a_store = FeatureStore(b["a_feats"], b["a_feat_times"])
    train_ds = RecognitionDataset(ws, v_store, a_store)
    val_ds = RecognitionDataset(ws, v_store, a_store,
                                sample_augmentations=False)

    cfg = C.ave_recognition(
        visual_classes=(4,), audio_classes=4, visual_input_dim=dv,
        audio_input_dim=da, d_model=16, nhead=2, num_layers=1,
        num_feats=5, compute_dtype="float32")
    tcfg = C.TrainConfig(batch_size=8, epochs=1, warmup_epochs=0,
                         lr=1e-3, mixup_alpha=0.0, lambda_drloc=0.0,
                         seed=0)
    runner = RecognitionRunner(cfg, tcfg, train_ds, val_ds,
                               dataset_name="ave", print_freq=10)
    runner.init_state()
    stats = runner.fit(epochs=1)
    assert np.isfinite(stats["loss_action"])
    assert "combined_top1" in stats      # AVE's audio-visual metric
    assert "pool" in jax.tree_util.tree_map(
        lambda x: 0, runner.state.params)