"""Backbone finetuning: LLRD grouping, soft CE, mixup targets, overfit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tim_tpu.models.backbones.vit import VideoMAEViT
from tim_tpu.train import backbone_finetune as ft
from tim_tpu.train.state import create_train_state


def test_vit_layer_index():
    assert ft.vit_layer_index(("patch_embed", "kernel"), 4) == 0
    assert ft.vit_layer_index(("block0", "attn"), 4) == 1
    assert ft.vit_layer_index(("block3", "fc1"), 4) == 4
    assert ft.vit_layer_index(("fc_norm", "scale"), 4) == 5
    assert ft.vit_layer_index(("head", "kernel"), 4) == 5


def test_soft_target_ce_matches_manual():
    logits = jnp.asarray([[2.0, 0.0, -1.0]])
    targets = jnp.asarray([[0.7, 0.2, 0.1]])
    logp = np.log(np.exp([2.0, 0.0, -1.0]) / np.exp([2.0, 0.0, -1.0]).sum())
    want = -(np.asarray([0.7, 0.2, 0.1]) * logp).sum()
    got = float(ft.soft_target_cross_entropy(logits, targets))
    assert got == pytest.approx(want, rel=1e-5)


def test_mixup_targets_blend():
    labels = jnp.asarray([0, 1])
    perm = jnp.asarray([1, 0])
    t = np.asarray(ft.mixup_targets(labels, perm, jnp.float32(0.75), 2,
                                    smoothing=0.0))
    np.testing.assert_allclose(t[0], [0.75, 0.25], atol=1e-6)
    np.testing.assert_allclose(t[1], [0.25, 0.75], atol=1e-6)


def test_finetune_step_overfits_tiny_vit():
    num_classes = 3
    model = VideoMAEViT(img_size=32, patch_size=8, embed_dim=32, depth=2,
                        num_heads=4, num_frames=4, tubelet_size=2)
    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (6, 4, 32, 32, 3))
    labels = jnp.asarray([0, 1, 2, 0, 1, 2])

    feat_params = model.init(rng, video)["params"]
    head = jax.random.normal(rng, (32, num_classes)) * 0.01
    params = {"backbone": feat_params, "head": head}

    def apply_fn(p, v, drop_rng):
        feats = model.apply({"params": p["backbone"]}, v)
        return feats @ p["head"]

    tx = ft.make_llrd_optimizer(
        params, depth=2, lr=3e-3, total_steps=100, warmup_steps=5,
        layer_decay=0.75)
    state = create_train_state(params, tx)
    step = jax.jit(ft.make_finetune_step(
        apply_fn, num_classes, tx, mixup_alpha=0.0, smoothing=0.0))

    batch = {"video": video, "label": labels}
    losses = []
    for _ in range(25):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[::5]


@pytest.mark.parametrize("knob", ["remat", "remat_mlp"])
def test_remat_grads_match_plain(knob):
    """``VideoMAEViT(remat=True)`` / ``remat_mlp=True`` are pure memory
    knobs: same params (shared init), same loss, same grads as the plain
    trunk. remat_mlp checkpoints only the LN2+MLP sub-block so it
    composes with the flash custom_vjp (whole-block remat around the
    Pallas kernel crashes the TPU compiler — round 5)."""
    kw = dict(img_size=32, patch_size=16, embed_dim=32, depth=2,
              num_heads=2, num_frames=4, tubelet_size=2)
    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (2, 4, 32, 32, 3))
    plain, remat = VideoMAEViT(**kw), VideoMAEViT(**kw, **{knob: True})
    params = plain.init(rng, video)

    def val_grads(model):
        loss = lambda p: jnp.sum(model.apply(p, video) ** 2)
        return jax.jit(jax.value_and_grad(loss))(params)

    (l0, g0), (l1, g1) = val_grads(plain), val_grads(remat)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_llrd_scales_decrease_with_depth():
    params = {
        "patch_embed": {"kernel": jnp.zeros((2, 2))},
        "block0": {"fc1": {"kernel": jnp.zeros((2, 2))}},
        "block1": {"fc1": {"kernel": jnp.zeros((2, 2))}},
        "fc_norm": {"scale": jnp.zeros((2,))},
    }
    tx = ft.make_llrd_optimizer(params, depth=2, lr=1.0, total_steps=10,
                                warmup_steps=0, layer_decay=0.5,
                                weight_decay=0.0, clip_norm=1e9)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # adam normalizes grads to ~1; layer scale should order the magnitudes
    pe = abs(float(updates["patch_embed"]["kernel"][0, 0]))
    b0 = abs(float(updates["block0"]["fc1"]["kernel"][0, 0]))
    b1 = abs(float(updates["block1"]["fc1"]["kernel"][0, 0]))
    norm = abs(float(updates["fc_norm"]["scale"][0]))
    assert pe < b0 < b1 < norm
