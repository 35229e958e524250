"""Int8 static backbone serving path (Swin3D / VideoMAE ViT).

TPU-native optimization with no reference counterpart: the raw-media
extraction pipeline is ~99% backbone matmuls, so the static-int8 lever
that won 1.37x on TIM serving is threaded through the backbone qkv /
proj / FFN projections. These tests pin the param-tree transform
(``quantize_backbone_params``), fp32 agreement of the dynamic int8
path, and the calibrate -> compile-time-constant-scale pipeline.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tim_tpu.models.backbones.swin3d import SwinTransformer3D
from tim_tpu.models.backbones.vit import VideoMAEViT
from tim_tpu.ops import quant


def tiny_vit(**kw):
    return VideoMAEViT(img_size=16, patch_size=8, embed_dim=32, depth=2,
                       num_heads=4, num_frames=4, tubelet_size=2, **kw)


def tiny_swin(**kw):
    return SwinTransformer3D(patch_size=(2, 4, 4), embed_dim=16,
                             depths=(1, 1), num_heads=(2, 4),
                             window_size=(2, 2, 2), **kw)


def _strip_act_scales(node):
    if not isinstance(node, dict):
        return node
    return {k: _strip_act_scales(v) for k, v in node.items()
            if k != "act_scale"}


@pytest.fixture(scope="module")
def vit_setup():
    model = tiny_vit()
    rnd = np.random.default_rng(0)
    video = jnp.asarray(rnd.normal(size=(2, 4, 16, 16, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video)["params"]
    return model, params, video


@pytest.fixture(scope="module")
def swin_setup():
    model = tiny_swin()
    rnd = np.random.default_rng(1)
    video = jnp.asarray(rnd.normal(size=(2, 4, 8, 8, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video)["params"]
    return model, params, video


def test_quantize_backbone_params_vit_layout(vit_setup):
    _, params, _ = vit_setup
    qp = quant.quantize_backbone_params(params)
    attn = qp["block0"]["attn"]
    # packed qkv_kernel leaf moved into an Int8Dense-shaped child
    assert "qkv_kernel" not in attn
    assert attn["qkv"]["kernel_q"].dtype == jnp.int8
    assert attn["qkv"]["kernel_scale"].shape == (3 * 32,)
    # q/v biases stay separate (VideoMAE no-k-bias layout)
    assert "q_bias" in attn and "v_bias" in attn
    for mod in ("proj",):
        assert "kernel_q" in attn[mod] and "bias" in attn[mod]
    for mod in ("fc1", "fc2"):
        assert "kernel_q" in qp["block0"][mod]
    # conv patch embed and norms untouched
    assert "kernel" in qp["patch_embed"]
    assert "scale" in qp["block0"]["norm1"]


def test_quantize_backbone_params_swin_layout(swin_setup):
    _, params, _ = swin_setup
    qp = quant.quantize_backbone_params(params)
    blk = qp["layer0_block0"]
    assert "kernel_q" in blk["attn"]["qkv"]
    assert "kernel_q" in blk["attn"]["proj"]
    assert "kernel_q" in blk["fc1"] and "kernel_q" in blk["fc2"]
    # rel-pos bias table, patch merging reduction, norms untouched
    assert "relative_position_bias_table" in blk["attn"]
    assert "kernel" in qp["layer0_downsample"]["reduction"]
    assert "kernel" in qp["patch_embed"]


@pytest.mark.parametrize("which", ["vit", "swin"])
def test_quantized_backbone_agrees_with_fp32(which, vit_setup, swin_setup):
    model, params, video = vit_setup if which == "vit" else swin_setup
    qmodel = (tiny_vit if which == "vit" else tiny_swin)(quantized=True)
    want = np.asarray(model.apply({"params": params}, video), np.float32)
    qp = quant.quantize_backbone_params(params)
    got = np.asarray(qmodel.apply({"params": qp}, video), np.float32)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.08, rel


@pytest.mark.parametrize("which", ["vit", "swin"])
def test_backbone_calibrate_then_static_const(which, vit_setup,
                                              swin_setup):
    """dynamic int8 -> calibrate -> compile-time-constant scales: the
    serving configuration stays close to fp32 and creates no act_scale
    params."""
    model, params, video = vit_setup if which == "vit" else swin_setup
    make = tiny_vit if which == "vit" else tiny_swin
    qmodel = make(quantized=True)
    qp = quant.quantize_backbone_params(params)

    def apply_fn(vs, batch, mutable):
        return qmodel.apply(vs, batch, mutable=mutable)

    calibrated = quant.calibrate_act_scales(
        apply_fn, {"params": qp}, [video])
    scales = quant.act_scales_tuple(calibrated)
    assert scales, "calibration produced no act scales"
    prefix = "block0/attn/qkv" if which == "vit" \
        else "layer0_block0/attn/qkv"
    assert any(p == prefix for p, _ in scales), scales

    smodel = make(quantized=True, act_scales=scales)
    got = np.asarray(
        smodel.apply({"params": _strip_act_scales(calibrated)}, video),
        np.float32)
    want = np.asarray(model.apply({"params": params}, video), np.float32)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.12, rel
