"""VideoMAE pretraining: mask generators golden vs the reference
``masking_generator.py`` executed in-process (deterministic attributes +
structural mask properties), model shapes, loss self-consistency, a tiny
overfit run, and pretrained-encoder -> finetune weight flow."""

import importlib.util

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tim_tpu.extract import masking as M
from tim_tpu.models.backbones.mae import (
    PretrainVideoMAE, patchify, pretrain_loss, pretrain_targets)

REF = ("/root/reference/feature_extractors/VideoMAE/masking_generator.py")


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_masking", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


GRID = (8, 14, 14)


def test_tube_masking_golden_structure():
    ref = pytest.importorskip("torch") and _load_ref()
    r = ref.TemporalConsistencyMaskingGenerator(GRID, 0.9)
    ours = M.TubeMasking(GRID, 0.9)
    assert ours.total_masks == r.total_masks
    assert ours.num_masks_per_frame == r.num_masks_per_frame
    mask = ours(np.random.default_rng(0)).reshape(GRID[0], -1)
    # tube property: identical spatial mask every frame
    assert (mask == mask[0]).all()
    assert mask.sum() == r.total_masks
    ref_mask = np.asarray(r()).reshape(GRID[0], -1)
    assert (ref_mask == ref_mask[0]).all()
    assert ref_mask.sum() == r.total_masks


def test_progressive_masking_golden_vs_reference_behavior():
    """Golden vs the reference's ACTUAL masks: its inclusive topk boundary
    keeps keep-1 patches per frame (its own ``total_masks`` attribute is
    off by ``frames``); we replicate the masks and report the true count."""
    ref = pytest.importorskip("torch") and _load_ref()
    for ratio in (0.75, 0.9):
        r = ref.TemporalProgressiveMaskingGenerator(GRID, ratio)
        ours = M.TemporalProgressiveMasking(GRID, ratio)
        np.testing.assert_array_equal(ours.keep_patches_list,
                                      r.keep_patches_list)
        ref_mask = np.asarray(r()).reshape(GRID[0], -1)
        m = ours(np.random.default_rng(1)).reshape(GRID[0], -1)
        # same per-frame keep counts as the reference's actual masks
        np.testing.assert_array_equal((m == 0).sum(axis=1),
                                      (ref_mask == 0).sum(axis=1))
        assert m.sum() == ours.total_masks == ref_mask.sum()
        # later frames keep a subset of earlier frames (shared field)
        for i in range(1, GRID[0]):
            assert set(np.flatnonzero(m[i] == 0)) <= \
                set(np.flatnonzero(m[i - 1] == 0))


def test_centering_masking_golden_vs_reference_behavior():
    ref = pytest.importorskip("torch") and _load_ref()
    r = ref.TemporalCenteringProgressiveMaskingGenerator(GRID, 0.9)
    ours = M.TemporalCenteringProgressiveMasking(GRID, 0.9)
    np.testing.assert_array_equal(ours.keep_patches_list,
                                  r.keep_patches_list)
    ref_mask = np.asarray(r()).reshape(GRID[0], -1)
    m = ours(np.random.default_rng(2)).reshape(GRID[0], -1)
    np.testing.assert_array_equal((m == 0).sum(axis=1),
                                  (ref_mask == 0).sum(axis=1))
    assert m.sum() == ours.total_masks == ref_mask.sum()


def test_random_masking_counts():
    ref = pytest.importorskip("torch") and _load_ref()
    r = ref.RandomMaskingGenerator(GRID, 0.75)
    ours = M.RandomMasking(GRID, 0.75)
    assert ours.num_mask == r.num_mask
    m = ours(np.random.default_rng(3))
    assert m.sum() == ours.num_mask and m.shape == (8 * 14 * 14,)


def test_batch_mask_indices_static_shapes():
    gen = M.TubeMasking(GRID, 0.9)
    vis, msk = M.batch_mask_indices(gen, 4, np.random.default_rng(0))
    n = 8 * 14 * 14
    assert vis.shape == (4, n - gen.total_masks)
    assert msk.shape == (4, gen.total_masks)
    for v, m in zip(vis, msk):
        assert len(np.intersect1d(v, m)) == 0
        assert len(np.union1d(v, m)) == n


def _tiny_model():
    return PretrainVideoMAE(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        decoder_dim=16, decoder_depth=1, decoder_heads=2,
        num_frames=4, tubelet_size=2)


def test_patchify_roundtrip_order():
    """patchify must flatten tubes in the same order as the Conv patch
    embed (t-major, then rows, then cols)."""
    video = jnp.arange(2 * 4 * 32 * 32 * 3, dtype=jnp.float32).reshape(
        2, 4, 32, 32, 3)
    p = patchify(video, 2, 8)
    assert p.shape == (2, 2 * 4 * 4, 2 * 8 * 8, 3)
    # tube (t=0, row 0, col 1) starts at pixel column 8
    np.testing.assert_array_equal(
        np.asarray(p[0, 1, 0]), np.asarray(video[0, 0, 0, 8]))
    # tube (t=1, ...) starts at frame 2
    np.testing.assert_array_equal(
        np.asarray(p[0, 4 * 4, 0]), np.asarray(video[0, 2, 0, 0]))


def test_pretrain_forward_and_loss():
    model = _tiny_model()
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    gen = M.TubeMasking(model.grid, 0.5)
    vis, msk = M.batch_mask_indices(gen, 2, rng)
    params = model.init(jax.random.PRNGKey(0), video, jnp.asarray(vis),
                        jnp.asarray(msk))["params"]
    pred = model.apply({"params": params}, video, jnp.asarray(vis),
                       jnp.asarray(msk))
    assert pred.shape == (2, msk.shape[1], 2 * 8 * 8 * 3)
    loss = pretrain_loss(pred, video, jnp.asarray(msk), 2, 8)
    assert np.isfinite(float(loss))
    # normalized targets have ~zero mean per tube
    tgt = pretrain_targets(video, jnp.asarray(msk), 2, 8)
    per_tube = np.asarray(tgt).reshape(2, msk.shape[1], 2 * 8 * 8, 3)
    np.testing.assert_allclose(per_tube.mean(axis=2), 0.0, atol=1e-4)


def test_pretrain_overfit_single_batch():
    """A few steps on one batch must drive the reconstruction loss down."""
    from tim_tpu.train.backbone_finetune import make_pretrain_step
    from tim_tpu.train.state import create_train_state

    model = _tiny_model()
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    gen = M.TubeMasking(model.grid, 0.5)
    vis, msk = M.batch_mask_indices(gen, 2, rng)
    vis, msk = jnp.asarray(vis), jnp.asarray(msk)

    params = model.init(jax.random.PRNGKey(0), video, vis, msk)["params"]
    # faithful trunc_normal(0.02) inits (VideoMAE _init_weights) start
    # much smaller than flax defaults, so this tiny overfit needs a
    # slightly higher lr / more steps than it did with lecun_normal
    state = create_train_state(params, optax.adam(1e-2))
    step = jax.jit(make_pretrain_step(model, state.tx))
    first = None
    for _ in range(120):
        state, metrics = step(state, video, vis, msk)
        first = first if first is not None else float(metrics["loss"])
    assert float(metrics["loss"]) < 0.5 * first


def test_pretrained_encoder_loads_into_finetune_vit():
    """Encoder params share names with VideoMAEViT: the shape-matched
    merge must transfer every encoder tensor."""
    from flax import serialization

    from tim_tpu.models.backbones.vit import VideoMAEViT
    from tim_tpu.train.checkpoint import shape_matched_merge

    model = _tiny_model()
    video = jnp.zeros((1, 4, 32, 32, 3))
    gen = M.TubeMasking(model.grid, 0.5)
    vis, msk = M.batch_mask_indices(gen, 1, np.random.default_rng(0))
    pre = model.init(jax.random.PRNGKey(1), video, jnp.asarray(vis),
                     jnp.asarray(msk))["params"]

    vit = VideoMAEViT(img_size=32, patch_size=8, embed_dim=32, depth=2,
                      num_heads=2, num_frames=4, tubelet_size=2)
    ft = vit.init(jax.random.PRNGKey(2), video)["params"]
    merged = shape_matched_merge(serialization.to_state_dict(ft),
                                 serialization.to_state_dict(pre))
    for name in ("patch_embed", "block0", "block1"):
        tr = jax.tree_util.tree_map(
            np.asarray, serialization.to_state_dict(pre)[name])
        got = jax.tree_util.tree_map(np.asarray, merged[name])
        jax.tree_util.tree_map(np.testing.assert_array_equal, got, tr)

def test_pretrain_flash_wiring(monkeypatch):
    """PretrainVideoMAE(use_flash=True) routes BOTH trunks (visible-token
    encoder and full-sequence decoder) through the flash entry point with
    identical math (kernel stands in as exact softmax on CPU; numerics
    are TPU-gated in test_flash_attention.py)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from tests.flash_fake import fake_flash_kernel

    calls = []
    monkeypatch.setattr(fa, "flash_attention",
                        fake_flash_kernel(calls=calls))

    model = _tiny_model()
    rng = np.random.default_rng(3)
    video = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    gen = M.TubeMasking(model.grid, 0.5)
    vis, msk = M.batch_mask_indices(gen, 2, rng)
    vis, msk = jnp.asarray(vis), jnp.asarray(msk)
    params = model.init(jax.random.PRNGKey(0), video, vis, msk)
    want = np.asarray(model.apply(params, video, vis, msk), np.float32)

    flash_model = _tiny_model().clone(use_flash=True)
    got = np.asarray(flash_model.apply(params, video, vis, msk),
                     np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)
    # encoder blocks saw the visible length, decoder blocks the full grid
    n = int(np.prod(model.grid))
    assert vis.shape[1] in calls and n in calls
