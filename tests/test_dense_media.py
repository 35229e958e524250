"""Overlap-aware dense extraction (``extract/dense_media.py``): the
frame-bank gather and pair-embed paths must be EXACTLY equal to the
naive upload-every-clip path for both visual backbones — the dedup is a
pure reuse of identical compute, not an approximation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tim_tpu.extract.dense_media import (
    ClipPlan, build_clip_plan, extract_dense_visual)
from tim_tpu.models.backbones.swin3d import SwinTransformer3D
from tim_tpu.models.backbones.vit import VideoMAEViT


def _dense_clip_table(n_steps=9, span=8, hop=2, n_frames_video=64):
    """0.2s-hop-like geometry: clip t covers frames [t*hop, t*hop+span)
    -> consecutive clips share (span-hop)/span of their frames."""
    return np.stack([np.arange(span) + t * hop for t in range(n_steps)])


def test_build_clip_plan_dedup_counts():
    table = _dense_clip_table(n_steps=9, span=8, hop=2)
    plan = build_clip_plan(table, tubelet=2)
    # frames 0..23 all used once
    np.testing.assert_array_equal(plan.unique_frames, np.arange(24))
    np.testing.assert_array_equal(
        plan.unique_frames[plan.clip_idx], table)
    # pairs: even-offset clips share the even pair grid, odd offsets the
    # odd grid -> 2 interleaved grids over 24 frames = 12+11 pairs... the
    # exact count matters less than reconstruction + a real dedup factor
    np.testing.assert_array_equal(
        plan.unique_frames[plan.pairs[plan.pair_idx].reshape(9, -1)],
        table)
    assert plan.frame_dedup == 9 * 8 / 24
    assert plan.pair_dedup > 1.5


def test_build_clip_plan_rejects_odd_length():
    with pytest.raises(ValueError):
        build_clip_plan(np.zeros((3, 7), np.int64), tubelet=2)


def _check_modes(model, variables, frames, plan, feat_dim, **kwargs):
    ref = extract_dense_visual(model, variables, frames, plan,
                               mode="naive", **kwargs)
    assert ref.shape == (len(plan.clip_idx), feat_dim)
    got_g = extract_dense_visual(model, variables, frames, plan,
                                 mode="gather", **kwargs)
    np.testing.assert_allclose(got_g, ref, atol=1e-6, rtol=1e-6)
    got_p = extract_dense_visual(model, variables, frames, plan,
                                 mode="pair_embed", **kwargs)
    np.testing.assert_allclose(got_p, ref, atol=1e-5, rtol=1e-5)


def test_swin_dense_modes_exact():
    rng = np.random.default_rng(0)
    model = SwinTransformer3D(patch_size=(2, 4, 4), embed_dim=8,
                              depths=(1, 1), num_heads=(2, 2),
                              window_size=(2, 3, 3))
    table = _dense_clip_table(n_steps=7, span=8, hop=2)
    plan = build_clip_plan(table, tubelet=2)
    frames = rng.normal(size=(len(plan.unique_frames), 16, 16, 3)) \
        .astype(np.float32)
    clips = frames[plan.clip_idx[:1]]
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clips))
    _check_modes(model, variables, frames, plan, 16, batch_size=3)


def test_vit_dense_modes_exact():
    """ViT adds the sin-cos position table AFTER clip assembly — the
    pair-embed path must still match (positions depend on where a pair
    sits in its clip, not on the pair identity)."""
    rng = np.random.default_rng(1)
    model = VideoMAEViT(img_size=16, patch_size=8, embed_dim=16, depth=1,
                        num_heads=2, num_frames=8, tubelet_size=2)
    table = _dense_clip_table(n_steps=7, span=8, hop=2)
    plan = build_clip_plan(table, tubelet=2)
    frames = rng.normal(size=(len(plan.unique_frames), 16, 16, 3)) \
        .astype(np.float32)
    clips = frames[plan.clip_idx[:1]]
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clips))
    _check_modes(model, variables, frames, plan, 16, batch_size=3)


def test_irregular_sampler_plan_roundtrip():
    """omnivore_frame_indices-style irregular rows still reconstruct and
    dedup (pairs are whatever the conv would group, per clip)."""
    from tim_tpu.extract.pipeline import omnivore_frame_indices

    rows = [omnivore_frame_indices(55, s, 10_000, num_samples=32)
            for s in range(0, 60, 10)]
    table = np.stack(rows)
    plan = build_clip_plan(table, tubelet=2)
    np.testing.assert_array_equal(
        plan.unique_frames[plan.pairs[plan.pair_idx].reshape(
            len(rows), -1)], table)
    assert plan.frame_dedup > 2.0   # 0.2s hop on a 1.1s interval


def test_vit_embedded_batch_independence():
    """The embedded=True trunk path must treat rows independently
    (guards against accidental batch coupling through the reshape)."""
    rng = np.random.default_rng(2)
    model = VideoMAEViT(img_size=16, patch_size=8, embed_dim=16, depth=1,
                        num_heads=2, num_frames=8, tubelet_size=2)
    emb = jnp.asarray(rng.normal(size=(3, 4, 2, 2, 16)), jnp.float32)
    video = jnp.asarray(rng.normal(size=(1, 8, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), video)
    full = model.apply(variables, emb, embedded=True)
    one = model.apply(variables, emb[1:2], embedded=True)
    np.testing.assert_allclose(np.asarray(full[1:2]), np.asarray(one),
                               atol=1e-6, rtol=1e-6)


def test_scan_dispatch_matches_per_batch():
    """Single-dispatch (lax.map over chunks, one fetch) == per-batch
    dispatch for both bank modes, including ragged tails."""
    import jax
    import jax.numpy as jnp
    from tim_tpu.extract.dense_media import (build_clip_plan,
                                             extract_dense_visual)
    from tim_tpu.models.backbones.vit import VideoMAEViT

    table = np.stack([np.arange(t, t + 16) for t in range(7)])  # 7 % 2 != 0
    plan = build_clip_plan(table, tubelet=2)
    vit = VideoMAEViT(img_size=16, patch_size=8, embed_dim=16, depth=1,
                      num_heads=2, num_frames=16, tubelet_size=2)
    rnd = np.random.default_rng(0)
    frames = rnd.normal(size=(len(plan.unique_frames), 16, 16, 3)) \
        .astype(np.float32) * 0.1
    var = jax.jit(vit.init)(jax.random.PRNGKey(0),
                            jnp.asarray(frames[plan.clip_idx[:1]]))
    for mode in ("gather", "pair_embed"):
        a = extract_dense_visual(vit, var, frames, plan, batch_size=2,
                                 embed_batch=8, mode=mode,
                                 dispatch="per_batch")
        b = extract_dense_visual(vit, var, frames, plan, batch_size=2,
                                 embed_batch=8, mode=mode,
                                 dispatch="scan")
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=mode)


def test_uint8_bank_with_device_normalize_matches_host_normalize():
    """uint8 frame bank + on-device uint8_normalizer == host-normalized
    float frames through every mode (the upload-halving production
    path)."""
    import jax
    import jax.numpy as jnp
    from tim_tpu.extract.dense_media import (
        build_clip_plan, extract_dense_visual, uint8_normalizer)
    from tim_tpu.models.backbones.vit import VideoMAEViT

    table = np.stack([np.arange(t, t + 16) for t in range(5)])
    plan = build_clip_plan(table, tubelet=2)
    vit = VideoMAEViT(img_size=16, patch_size=8, embed_dim=16, depth=1,
                      num_heads=2, num_frames=16, tubelet_size=2)
    rnd = np.random.default_rng(0)
    raw = rnd.integers(0, 256, (len(plan.unique_frames), 16, 16, 3)) \
        .astype(np.uint8)
    tf = uint8_normalizer(dtype="float32")
    host = np.asarray(
        (raw.astype(np.float32) / 255.0
         - np.asarray([0.485, 0.456, 0.406], np.float32))
        / np.asarray([0.229, 0.224, 0.225], np.float32))
    var = jax.jit(vit.init)(jax.random.PRNGKey(0),
                            jnp.asarray(host[plan.clip_idx[:1]]))
    # same function object back -> jit cache hit across calls
    assert uint8_normalizer(dtype="float32") is tf
    for mode in ("naive", "gather", "pair_embed"):
        want = extract_dense_visual(vit, var, host, plan, batch_size=2,
                                    mode=mode)
        got = extract_dense_visual(vit, var, raw, plan, batch_size=2,
                                   mode=mode, frame_transform=tf)
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=mode)


def test_stream_mode_matches_naive():
    """Streamed per-batch mini-banks == naive clip path (exact same
    pixels reach the backbone), incl. a ragged tail and uint8 banks."""
    import jax
    import jax.numpy as jnp
    from tim_tpu.extract.dense_media import (
        build_clip_plan, extract_dense_visual, uint8_normalizer)
    from tim_tpu.models.backbones.vit import VideoMAEViT

    table = np.stack([np.arange(t, t + 16) for t in range(7)])
    plan = build_clip_plan(table, tubelet=2)
    vit = VideoMAEViT(img_size=16, patch_size=8, embed_dim=16, depth=1,
                      num_heads=2, num_frames=16, tubelet_size=2)
    rnd = np.random.default_rng(0)
    frames = rnd.normal(size=(len(plan.unique_frames), 16, 16, 3)) \
        .astype(np.float32) * 0.1
    var = jax.jit(vit.init)(jax.random.PRNGKey(0),
                            jnp.asarray(frames[plan.clip_idx[:1]]))
    want = extract_dense_visual(vit, var, frames, plan, batch_size=2,
                                mode="naive")
    got = extract_dense_visual(vit, var, frames, plan, batch_size=2,
                               mode="stream")
    np.testing.assert_allclose(got, want, atol=1e-6)

    raw = rnd.integers(0, 256, frames.shape).astype(np.uint8)
    tf = uint8_normalizer(dtype="float32")
    a = extract_dense_visual(vit, var, raw, plan, batch_size=2,
                             mode="stream", frame_transform=tf)
    b = extract_dense_visual(vit, var, raw, plan, batch_size=2,
                             mode="gather", frame_transform=tf)
    np.testing.assert_allclose(a, b, atol=1e-5)
