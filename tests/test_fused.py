"""Fused pipeline: raw clips + spectrograms -> TIM logits in one jit."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tim_tpu import config as C
from tim_tpu.models.backbones.slowfast import AuditorySlowFast
from tim_tpu.models.backbones.swin3d import SwinTransformer3D
from tim_tpu.models.backbones.vit import VideoMAEViT
from tim_tpu.models.fused import FusedRecognitionPipeline


@pytest.mark.slow
def test_fused_pipeline_end_to_end():
    # tiny backbones, matching feature widths: swin 8*2^3? embed 8 ->
    # feature 8 * 2^(stages-1): depths (1,1) -> 16; vit embed 16
    swin = SwinTransformer3D(patch_size=(2, 4, 4), embed_dim=8,
                             depths=(1, 1), num_heads=(2, 2),
                             window_size=(2, 3, 3))
    vit = VideoMAEViT(img_size=16, patch_size=8, embed_dim=16, depth=1,
                      num_heads=2, num_frames=4, tubelet_size=2)
    cfg = C.ModelConfig(
        visual_classes=(4,), audio_classes=3, include_verb_noun=False,
        visual_input_dim=16 + 16, audio_input_dim=2304,
        d_model=16, nhead=2, num_layers=1, num_feats=3,
        compute_dtype="float32")
    pipe = FusedRecognitionPipeline(tim_cfg=cfg, swin=swin, vit=vit,
                                    audio_alpha=4)

    b, f, nv, na = 2, 3, 2, 2
    rng = jax.random.PRNGKey(0)
    rnd = np.random.default_rng(0)
    clips = jnp.asarray(rnd.normal(size=(b, f, 4, 16, 16, 3)), jnp.float32)
    specs = jnp.asarray(rnd.normal(size=(b, f, 32, 128)), jnp.float32)
    times = jnp.asarray(rnd.uniform(size=(b, 2 * f + nv + na, 2)),
                        jnp.float32)

    variables = pipe.init({"params": rng, "dropout": rng}, clips, specs,
                          times, nv, na, deterministic=True)
    fwd = jax.jit(lambda v, c, s, t: pipe.apply(
        v, c, s, t, nv, na, deterministic=True))
    (verb, noun, action, audio), ctx = fwd(variables, clips, specs, times)
    assert action.shape == (b, nv, 4)
    assert audio.shape == (b, na, 3)
    assert ctx.shape == (b, 2 * f, 32)
    assert np.isfinite(np.asarray(action)).all()

    # gradients flow through the backbones (end-to-end finetunable)
    def loss(v):
        (vb, nn_, act, aud), _ = pipe.apply(v, clips, specs, times, nv, na,
                                            deterministic=True)
        return jnp.sum(act.astype(jnp.float32) ** 2)

    grads = jax.grad(
        lambda p: loss({**variables, "params": p}))(variables["params"])
    swin_grad = jax.tree_util.tree_leaves(grads["swin"])
    assert any(float(jnp.abs(g).sum()) > 0 for g in swin_grad)
    vit_grad = jax.tree_util.tree_leaves(grads["vit"])
    assert any(float(jnp.abs(g).sum()) > 0 for g in vit_grad)


def test_fused_detection_pipeline_end_to_end():
    """Raw media -> dense detection proposals in one jit graph
    (BASELINE config 5, detection side)."""
    from tim_tpu.models.fused import FusedDetectionPipeline
    from tim_tpu.models.queries import generate_query_pyramid

    swin = SwinTransformer3D(patch_size=(2, 4, 4), embed_dim=8,
                             depths=(1, 1), num_heads=(2, 2),
                             window_size=(2, 3, 3))
    vit = VideoMAEViT(img_size=16, patch_size=8, embed_dim=16, depth=1,
                      num_heads=2, num_frames=4, tubelet_size=2)
    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=16 + 16, audio_input_dim=2304,
        d_model=16, nhead=2, num_layers=1, num_feats=3,
        compute_dtype="float32", inference_query_size=0.25)
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    pipe = FusedDetectionPipeline(tim_cfg=cfg, swin=swin, vit=vit,
                                  audio_alpha=4)

    b, f = 2, 3
    rng = jax.random.PRNGKey(0)
    rnd = np.random.default_rng(0)
    clips = jnp.asarray(rnd.normal(size=(b, f, 4, 16, 16, 3)), jnp.float32)
    specs = jnp.asarray(rnd.normal(size=(b, f, 32, 128)), jnp.float32)
    queries = jnp.asarray(
        np.broadcast_to(generate_query_pyramid(cfg.inference_query_size),
                        (b, nq, 2)))
    times = jnp.concatenate(
        [jnp.asarray(rnd.uniform(size=(b, 2 * f, 2)), jnp.float32),
         queries, queries], axis=1)

    variables = pipe.init({"params": rng, "dropout": rng}, clips, specs,
                          times, nq, nq, deterministic=True)
    fwd = jax.jit(lambda v, c, s, t: pipe.apply(
        v, c, s, t, nq, nq, deterministic=True))
    cls_scores, reg_scores, ctx = fwd(variables, clips, specs, times)
    assert cls_scores[2].shape == (b, nq, 4)
    assert cls_scores[3].shape == (b, nq, 3)
    assert reg_scores[0].shape == (b, nq, 2)
    assert reg_scores[1].shape == (b, nq, 2)
    assert ctx.shape == (b, 2 * f, 32)
    assert np.isfinite(np.asarray(cls_scores[2])).all()
    r = np.asarray(reg_scores[0])
    assert (r >= 0).all() and (r <= 1).all()  # sigmoid reg head
