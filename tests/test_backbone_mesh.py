"""Backbones and the fused pipeline under the device mesh.

The reference parallelizes extraction by SLURM rank sharding only
(``feature_extractors/VideoMAE/feature_extraction.py:173-181``); the
TPU-native story is a data-sharded clip batch over a
``jax.sharding.Mesh``. These tests pin (on the 8-CPU-device suite mesh):

- the Swin flash ``pallas_call`` composes with a data-sharded batch
  inside a plain ``jit`` (GSPMD partitions around the kernel; interpret
  mode stands in for Mosaic on CPU),
- the full Swin/ViT flash model wiring runs with sharded clips,
- a ``FusedDetectionPipeline`` forward with clips+spectrograms sharded
  over the data axis matches the unsharded result.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tim_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    return make_mesh(4, 2)


def _shard(mesh, *arrays):
    sh = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(a, sh) for a in arrays)


def test_swin_flash_kernel_sharded_batch(mesh):
    """window_attention_flash under jit with the window-batch axis
    sharded over 'data' — exact vs the unsharded call."""
    from tim_tpu.ops.pallas_swin import window_attention_flash

    bw, h, n, dh = 8, 2, 8, 4
    rnd = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rnd.normal(size=(bw, h, n, dh)), jnp.float32)
               for _ in range(3))
    ab = jnp.asarray(rnd.normal(size=(2, h, n, n)), jnp.float32)

    fn = functools.partial(window_attention_flash, sm_scale=0.5,
                           interpret=True)
    want = np.asarray(jax.jit(fn)(q, k, v, ab))
    qs, ks, vs = _shard(mesh, q, k, v)
    abr = jax.device_put(ab, NamedSharding(mesh, P()))
    got = np.asarray(jax.jit(fn)(qs, ks, vs, abr))
    np.testing.assert_array_equal(got, want)


def test_swin_flash_model_sharded_clips(mesh, monkeypatch):
    """SwinTransformer3D(use_flash=True) with the clip batch sharded over
    'data' (interpret-mode kernel on CPU) matches the unsharded XLA
    path."""
    from tim_tpu.models.backbones.swin3d import SwinTransformer3D
    from tim_tpu.ops import pallas_swin

    real = pallas_swin.window_attention_flash
    monkeypatch.setattr(
        pallas_swin, "window_attention_flash",
        functools.partial(real, interpret=True))

    kw = dict(patch_size=(2, 4, 4), embed_dim=8, depths=(1, 1),
              num_heads=(2, 2), window_size=(2, 2, 2))
    base = SwinTransformer3D(**kw)
    flash = SwinTransformer3D(use_flash=True, **kw)
    rnd = np.random.default_rng(1)
    clips = jnp.asarray(rnd.normal(size=(8, 4, 8, 8, 3)), jnp.float32)
    params = base.init(jax.random.PRNGKey(0), clips)
    want = np.asarray(base.apply(params, clips), np.float32)
    (clips_sh,) = _shard(mesh, clips)
    got = np.asarray(jax.jit(flash.apply)(params, clips_sh), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)


def test_vit_flash_wiring_sharded_clips(mesh, monkeypatch):
    """VideoMAEViT(use_flash=True) wiring with sharded clips (the kernel
    itself stands in as exact softmax on CPU; numerics are TPU-gated in
    test_flash_attention.py)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from tests.flash_fake import fake_flash_kernel
    from tim_tpu.models.backbones import vit as vit_mod

    monkeypatch.setattr(fa, "flash_attention", fake_flash_kernel())

    kw = dict(img_size=16, patch_size=8, embed_dim=16, depth=1,
              num_heads=2, num_frames=4, tubelet_size=2)
    base = vit_mod.VideoMAEViT(**kw)
    flash = vit_mod.VideoMAEViT(use_flash=True, **kw)
    rnd = np.random.default_rng(2)
    clips = jnp.asarray(rnd.normal(size=(8, 4, 16, 16, 3)) * 0.1,
                        jnp.float32)
    params = base.init(jax.random.PRNGKey(0), clips)
    want = np.asarray(base.apply(params, clips), np.float32)
    (clips_sh,) = _shard(mesh, clips)
    got = np.asarray(jax.jit(flash.apply)(params, clips_sh), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)


@pytest.mark.slow
def test_fused_detection_pipeline_sharded_batch(mesh):
    """One FusedDetectionPipeline forward with the window batch (clips +
    spectrograms + times) sharded over 'data' equals the unsharded
    forward."""
    from tim_tpu import config as C
    from tim_tpu.models.backbones.swin3d import SwinTransformer3D
    from tim_tpu.models.backbones.vit import VideoMAEViT
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

    b, f = 8, 3
    rng = jax.random.PRNGKey(0)
    rnd = np.random.default_rng(3)
    clips = jnp.asarray(rnd.normal(size=(b, f, 4, 16, 16, 3)),
                        jnp.float32)
    specs = jnp.asarray(rnd.normal(size=(b, f, 32, 128)), jnp.float32)
    times = jnp.asarray(rnd.uniform(size=(b, 2 * f + 2 * nq, 2)),
                        jnp.float32)
    variables = pipe.init({"params": rng, "dropout": rng}, clips, specs,
                          times, nq, nq, deterministic=True)

    fwd = jax.jit(lambda c, s, t: pipe.apply(variables, c, s, t, nq, nq,
                                             deterministic=True))
    cls_w, reg_w, _ = fwd(clips, specs, times)
    cs, ss, ts = _shard(mesh, clips, specs, times)
    cls_g, reg_g, _ = fwd(cs, ss, ts)
    outs = [(w, g) for w, g in zip(list(cls_w) + list(reg_w),
                                   list(cls_g) + list(reg_g))
            if w is not None]
    assert outs
    for w, g in outs:
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, rtol=0)
