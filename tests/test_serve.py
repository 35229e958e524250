"""DetectionServer: one-call untrimmed-video detection."""

import numpy as np
import jax
import jax.numpy as jnp

from tim_tpu import config as C
from tim_tpu.models import TimDetection, TimRecognition
from tim_tpu.models.queries import generate_query_pyramid
from tim_tpu.serve import DetectionServer, RecognitionServer


def test_classify_intervals_end_to_end():
    cfg = C.ModelConfig(
        visual_classes=(5, 6, 4), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=1, num_feats=6, compute_dtype="float32")
    model = TimRecognition(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, 6, 16)),
        jnp.zeros((1, 6, 12)), jnp.zeros((1, 14, 2)), 1, 1,
        deterministic=True)["params"]

    server = RecognitionServer(cfg, params, feat_stride=2, feat_gap=0.2,
                               ensemble=3, batch_size=8)
    nfeat = 90
    starts = np.linspace(0, 18.0, nfeat).astype(np.float32)
    feat_times = np.stack([starts, starts + 1.1], -1)
    rnd = np.random.default_rng(0)
    v = rnd.normal(size=(nfeat, 16)).astype(np.float32)
    a = rnd.normal(size=(nfeat, 12)).astype(np.float32)
    intervals = np.asarray([[1.0, 2.5], [5.0, 5.8], [15.0, 17.0]],
                           np.float32)

    out = server.classify_intervals(v, a, feat_times, intervals)
    for head, classes in (("verb", 5), ("noun", 6), ("action", 4),
                          ("audio", 3)):
        assert out[head].shape == (3, classes)
        np.testing.assert_allclose(out[head].sum(-1), 1.0, atol=1e-5)


def test_detect_video_end_to_end():
    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=1, num_feats=6, compute_dtype="float32",
        inference_query_size=0.2)
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    model = TimDetection(cfg)
    rng = jax.random.PRNGKey(0)
    t_dummy = jnp.zeros((1, 12 + 2 * nq, 2))
    params = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, 6, 16)),
        jnp.zeros((1, 6, 12)), t_dummy, nq, nq,
        deterministic=True)["params"]

    server = DetectionServer(cfg, params, feat_stride=2, feat_gap=0.2,
                             batch_size=4)
    duration = 20.0
    nfeat = 95
    starts = np.linspace(0, duration - 1.1, nfeat).astype(np.float32)
    feat_times = np.stack([starts, starts + 1.1], -1)
    rnd = np.random.default_rng(0)
    v = rnd.normal(size=(nfeat, 16)).astype(np.float32)
    a = rnd.normal(size=(nfeat, 12)).astype(np.float32)

    dets = server.detect_video(v, a, feat_times, duration,
                               score_threshold=0.01)
    assert dets["segments"].shape[1] == 2
    assert len(dets["segments"]) == len(dets["scores"]) == \
        len(dets["labels"])
    if len(dets["segments"]):
        assert (dets["segments"][:, 1] > dets["segments"][:, 0]).all()
        assert dets["segments"].min() >= -1e-3
        assert dets["segments"].max() <= duration + server.window_size
        # score-sorted
        assert (np.diff(dets["scores"]) <= 1e-6).all()
        assert dets["labels"].max() < 4


def test_detect_video_media_matches_feature_path():
    """Raw-media serving entry: extractor-produced banks must yield the
    identical detections as pre-extracted features."""
    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=1, num_feats=6, compute_dtype="float32",
        inference_query_size=0.2)
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    model = TimDetection(cfg)
    rng = jax.random.PRNGKey(0)
    t_dummy = jnp.zeros((1, 12 + 2 * nq, 2))
    params = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, 6, 16)),
        jnp.zeros((1, 6, 12)), t_dummy, nq, nq,
        deterministic=True)["params"]
    server = DetectionServer(cfg, params, feat_stride=2, feat_gap=0.2,
                             batch_size=4)

    duration = 20.0
    nfeat = 95
    starts = np.linspace(0, duration - 1.1, nfeat).astype(np.float32)
    feat_times = np.stack([starts, starts + 1.1], -1)
    rnd = np.random.default_rng(1)
    clips = rnd.normal(size=(nfeat, 4, 8, 8, 3)).astype(np.float32)
    specs = rnd.normal(size=(nfeat, 16, 8)).astype(np.float32)
    wv = jnp.asarray(rnd.normal(size=(4 * 8 * 8 * 3, 16)) * 0.05,
                     jnp.float32)
    wa = jnp.asarray(rnd.normal(size=(16 * 8, 12)) * 0.05, jnp.float32)
    vx = jax.jit(lambda c: jnp.dot(c.reshape(c.shape[0], -1), wv))
    ax = jax.jit(lambda s: jnp.dot(s.reshape(s.shape[0], -1), wa))

    media = server.detect_video_media(
        clips, specs, feat_times, duration,
        visual_extractor=vx, audio_extractor=ax, extract_batch=16,
        score_threshold=0.01)
    v_bank = np.asarray(vx(jnp.asarray(clips)))
    a_bank = np.asarray(ax(jnp.asarray(specs)))
    feats = server.detect_video(v_bank, a_bank, feat_times, duration,
                                score_threshold=0.01)
    np.testing.assert_allclose(media["segments"], feats["segments"],
                               atol=1e-5)
    np.testing.assert_allclose(media["scores"], feats["scores"],
                               atol=1e-5)
    np.testing.assert_array_equal(media["labels"], feats["labels"])


def test_recognition_server_quantized_agrees():
    """RecognitionServer.quantized (static-int8) produces probabilities
    that agree with the fp path: same top-1 on most intervals, bounded
    probability delta."""
    cfg = C.ModelConfig(
        visual_classes=(5, 6, 4), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=1, num_feats=6, compute_dtype="float32")
    model = TimRecognition(cfg)
    rng = jax.random.PRNGKey(1)
    params = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, 6, 16)),
        jnp.zeros((1, 6, 12)), jnp.zeros((1, 14, 2)), 1, 1,
        deterministic=True)["params"]

    kwargs = dict(feat_stride=2, feat_gap=0.2, ensemble=3, batch_size=8)
    f_server = RecognitionServer(cfg, params, **kwargs)
    q_server = RecognitionServer.quantized(cfg, params, [None], **kwargs)

    nfeat = 90
    starts = np.linspace(0, 18.0, nfeat).astype(np.float32)
    feat_times = np.stack([starts, starts + 1.1], -1)
    rnd = np.random.default_rng(1)
    v = rnd.normal(size=(nfeat, 16)).astype(np.float32)
    a = rnd.normal(size=(nfeat, 12)).astype(np.float32)
    intervals = np.stack([np.linspace(0.5, 15, 8),
                          np.linspace(1.8, 17, 8)], -1).astype(np.float32)

    fo = f_server.classify_intervals(v, a, feat_times, intervals)
    qo = q_server.classify_intervals(v, a, feat_times, intervals)
    agree = total = 0
    for head in fo:
        np.testing.assert_allclose(qo[head].sum(-1), 1.0, atol=1e-5)
        agree += (fo[head].argmax(-1) == qo[head].argmax(-1)).sum()
        total += len(intervals)
        assert np.abs(fo[head] - qo[head]).max() <= 0.25, head
    assert agree / total >= 0.75, f"top-1 agreement {agree}/{total}"


def test_detect_video_topk_matches_dense():
    """DetectionServer(top_k=C) produces identical detections to the
    dense path (the k-best dump covers every above-threshold class)."""
    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=1, num_feats=6, compute_dtype="float32",
        inference_query_size=0.2)
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    model = TimDetection(cfg)
    rng = jax.random.PRNGKey(2)
    t_dummy = jnp.zeros((1, 12 + 2 * nq, 2))
    params = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, 6, 16)),
        jnp.zeros((1, 6, 12)), t_dummy, nq, nq,
        deterministic=True)["params"]

    kwargs = dict(feat_stride=2, feat_gap=0.2, batch_size=4)
    dense = DetectionServer(cfg, params, **kwargs)
    topk = DetectionServer(cfg, params, top_k=4, **kwargs)

    duration = 20.0
    nfeat = 95
    starts = np.linspace(0, duration - 1.1, nfeat).astype(np.float32)
    ft = np.stack([starts, starts + 1.1], -1)
    rnd = np.random.default_rng(2)
    v = rnd.normal(size=(nfeat, 16)).astype(np.float32)
    a = rnd.normal(size=(nfeat, 12)).astype(np.float32)

    d1 = dense.detect_video(v, a, ft, duration, score_threshold=0.005)
    d2 = topk.detect_video(v, a, ft, duration, score_threshold=0.005)
    assert len(d1["scores"]) == len(d2["scores"]) > 0
    np.testing.assert_allclose(d1["segments"], d2["segments"], atol=1e-5)
    np.testing.assert_allclose(d1["scores"], d2["scores"], atol=1e-5)
    np.testing.assert_array_equal(d1["labels"], d2["labels"])


def test_detect_video_frames_matches_media():
    """Overlap-aware raw-frame serving (``detect_video_frames``, frame
    bank + dedup) yields the identical detections as the naive
    ``detect_video_media`` clip path, and ``mode="auto"`` dispatches to
    the measured-best mode per backbone."""
    from tim_tpu.models.backbones.swin3d import SwinTransformer3D
    from tim_tpu.models.backbones.vit import VideoMAEViT
    from tim_tpu.extract import dense_media

    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=1, num_feats=6, compute_dtype="float32",
        inference_query_size=0.2)
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    model = TimDetection(cfg)
    rng = jax.random.PRNGKey(0)
    t_dummy = jnp.zeros((1, 12 + 2 * nq, 2))
    params = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, 6, 16)),
        jnp.zeros((1, 6, 12)), t_dummy, nq, nq,
        deterministic=True)["params"]
    server = DetectionServer(cfg, params, feat_stride=2, feat_gap=0.2,
                             batch_size=4)

    duration = 8.0
    nfeat = 30
    starts = np.linspace(0, duration - 1.1, nfeat).astype(np.float32)
    ft = np.stack([starts, starts + 1.1], -1)

    # dense geometry: 16-frame clips on a 2-frame hop share most frames
    clip_frames = np.stack([np.arange(t * 2, t * 2 + 16)
                            for t in range(nfeat)])
    rnd = np.random.default_rng(3)
    frames = rnd.normal(size=(clip_frames.max() + 1, 16, 16, 3)) \
        .astype(np.float32) * 0.1

    specs = rnd.normal(size=(nfeat, 16, 8)).astype(np.float32)
    wa = jnp.asarray(rnd.normal(size=(16 * 8, 12)) * 0.05, jnp.float32)
    ax = jax.jit(lambda s: jnp.dot(s.reshape(s.shape[0], -1), wa))

    vit = VideoMAEViT(img_size=16, patch_size=8, embed_dim=16, depth=1,
                      num_heads=2, num_frames=16, tubelet_size=2)
    variables = jax.jit(vit.init)(rng, jnp.asarray(frames[clip_frames[:1]]))

    seen_modes = []
    orig = dense_media.extract_dense_visual

    def spy(*a, **kw):
        seen_modes.append(kw.get("mode"))
        return orig(*a, **kw)

    import unittest.mock as mock
    with mock.patch.object(dense_media, "extract_dense_visual", spy):
        got = server.detect_video_frames(
            frames, clip_frames, ft, duration,
            visual_model=vit, visual_variables=variables,
            audio_specs=specs, audio_extractor=ax,
            extract_batch=8, score_threshold=0.01)
    # auto -> stream (upload overlapped with compute; measured fastest)
    assert seen_modes == ["stream"], seen_modes

    vx = jax.jit(lambda c: vit.apply(variables, c))
    want = server.detect_video_media(
        frames[clip_frames], specs, ft, duration,
        visual_extractor=vx, audio_extractor=ax,
        extract_batch=8, score_threshold=0.01)
    assert len(want["scores"]) > 0
    np.testing.assert_allclose(got["segments"], want["segments"],
                               atol=1e-5)
    np.testing.assert_allclose(got["scores"], want["scores"], atol=1e-5)
    np.testing.assert_array_equal(got["labels"], want["labels"])

    # explicit modes pass through unchanged (dispatch only; stubbed)
    swin = SwinTransformer3D(patch_size=(2, 4, 4), embed_dim=8,
                             depths=(1,), num_heads=(2,),
                             window_size=(2, 3, 3))
    seen_modes.clear()

    def stub(*a, **kw):
        seen_modes.append(kw.get("mode"))
        return np.zeros((nfeat, 16), np.float32)

    with mock.patch.object(dense_media, "extract_dense_visual", stub):
        for m in ("pair_embed", "gather", "auto"):
            server.detect_video_frames(
                frames, clip_frames, ft, duration,
                visual_model=swin, visual_variables=None,
                audio_specs=specs, audio_extractor=ax,
                extract_batch=8, mode=m, score_threshold=0.01)
    assert seen_modes == ["pair_embed", "gather", "stream"], seen_modes


def test_detect_video_frames_multi_backbone_concat():
    """Production EPIC visual features are a concat of two backbones
    (Omnivore || VideoMAE, merge_features.py:80-83): a sequence of
    (model, variables, clip_frames) — different clip lengths over the
    same frame bank — must equal extracting each separately and
    concatenating before detect_video."""
    from tim_tpu.models.backbones.vit import VideoMAEViT
    from tim_tpu.extract.dense_media import (build_clip_plan,
                                             extract_dense_visual)

    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=16, audio_input_dim=12, d_model=16, nhead=2,
        num_layers=1, num_feats=6, compute_dtype="float32",
        inference_query_size=0.2)
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    model = TimDetection(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, 6, 16)),
        jnp.zeros((1, 6, 12)), jnp.zeros((1, 12 + 2 * nq, 2)), nq, nq,
        deterministic=True)["params"]
    server = DetectionServer(cfg, params, feat_stride=2, feat_gap=0.2,
                             batch_size=4)

    duration, nfeat = 8.0, 30
    starts = np.linspace(0, duration - 1.1, nfeat).astype(np.float32)
    ft = np.stack([starts, starts + 1.1], -1)
    # backbone A: 16-frame clips; backbone B: 8-frame clips, same bank
    table_a = np.stack([np.arange(t * 2, t * 2 + 16)
                        for t in range(nfeat)])
    table_b = np.stack([np.arange(t * 2, t * 2 + 8) for t in range(nfeat)])
    rnd = np.random.default_rng(5)
    frames = rnd.normal(size=(table_a.max() + 1, 16, 16, 3)) \
        .astype(np.float32) * 0.1
    specs = rnd.normal(size=(nfeat, 16, 8)).astype(np.float32)
    wa = jnp.asarray(rnd.normal(size=(16 * 8, 12)) * 0.05, jnp.float32)
    ax = jax.jit(lambda s: jnp.dot(s.reshape(s.shape[0], -1), wa))

    kw = dict(img_size=16, patch_size=8, embed_dim=8, depth=1,
              num_heads=2, tubelet_size=2)
    vit_a = VideoMAEViT(num_frames=16, **kw)
    vit_b = VideoMAEViT(num_frames=8, **kw)
    var_a = jax.jit(vit_a.init)(rng, jnp.asarray(frames[table_a[:1]]))
    var_b = jax.jit(vit_b.init)(rng, jnp.asarray(frames[table_b[:1]]))

    got = server.detect_video_frames(
        frames, [table_a, table_b], ft, duration,
        visual_model=[vit_a, vit_b], visual_variables=[var_a, var_b],
        audio_specs=specs, audio_extractor=ax,
        extract_batch=8, score_threshold=0.01)

    feats = []
    for m, var, table in ((vit_a, var_a, table_a), (vit_b, var_b, table_b)):
        plan = build_clip_plan(table, tubelet=2)
        feats.append(extract_dense_visual(
            m, var, frames[plan.unique_frames], plan, batch_size=8,
            mode="gather"))
    v = np.concatenate(feats, axis=-1)
    a = np.asarray(ax(jnp.asarray(specs)))
    want = server.detect_video(v, a, ft, duration, score_threshold=0.01)
    assert len(want["scores"]) > 0
    np.testing.assert_allclose(got["segments"], want["segments"],
                               atol=1e-5)
    np.testing.assert_allclose(got["scores"], want["scores"], atol=1e-5)
    np.testing.assert_array_equal(got["labels"], want["labels"])
