"""Int8 quantized inference: kernel quantization accuracy, param-tree
transform, full detection model agreement with the fp32 path."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tim_tpu import config as C
from tim_tpu.models import TimDetection
from tim_tpu.models.queries import generate_query_pyramid
from tim_tpu.ops import quant


def test_quantize_kernel_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    w_q, scale = quant.quantize_kernel(w)
    assert w_q.dtype == np.int8
    recon = w_q.astype(np.float32) * scale[None]
    err = np.abs(recon - w) / np.abs(w).max()
    assert err.max() < 0.005  # < half an int8 step of the channel max


def test_int8_matmul_close_to_fp():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 64)).astype(np.float32)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    w_q, scale = quant.quantize_kernel(w)
    got = np.asarray(quant.int8_matmul(jnp.asarray(x), jnp.asarray(w_q),
                                       jnp.asarray(scale)))
    want = x @ w
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02


def test_quantized_detection_model_agrees_with_fp32():
    cfg = C.DetectionConfig(
        visual_classes=(13,), audio_classes=7,
        visual_input_dim=32, audio_input_dim=24, d_model=32, nhead=4,
        num_layers=2, num_feats=8, compute_dtype="float32",
        inference_query_size=0.1)
    qcfg = dataclasses.replace(cfg, quantized_inference=True)

    model = TimDetection(cfg)
    qmodel = TimDetection(qcfg)
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    rng = jax.random.PRNGKey(0)
    rnd = np.random.default_rng(0)
    b = 2
    v = jnp.asarray(rnd.normal(size=(b, 8, 32)), jnp.float32)
    a = jnp.asarray(rnd.normal(size=(b, 8, 24)), jnp.float32)
    times = jnp.asarray(rnd.uniform(size=(b, 16 + 2 * nq, 2)), jnp.float32)

    variables = model.init({"params": rng, "dropout": rng}, v, a, times,
                           nq, nq, deterministic=True)
    cls_fp, reg_fp, _ = model.apply(variables, v, a, times, nq, nq,
                                    deterministic=True)

    qparams = {"params": quant.quantize_params(variables["params"])}
    cls_q, reg_q, _ = qmodel.apply(qparams, v, a, times, nq, nq,
                                   deterministic=True)

    # logits agree to quantization noise; argmax classes mostly identical
    fp = np.asarray(cls_fp[2], np.float32)
    q = np.asarray(cls_q[2], np.float32)
    scale = np.abs(fp).max()
    assert np.abs(fp - q).max() / scale < 0.08
    agree = (fp.argmax(-1) == q.argmax(-1)).mean()
    assert agree > 0.9
    # regressions (fp path, unquantized) still match closely
    np.testing.assert_allclose(np.asarray(reg_q[0]), np.asarray(reg_fp[0]),
                               atol=0.03)


def test_static_act_calibration_pipeline():
    """dynamic int8 -> calibrate -> static int8: outputs stay close to
    fp32 and the act_scale params are filled in."""
    cfg = C.DetectionConfig(
        visual_classes=(13,), audio_classes=7,
        visual_input_dim=32, audio_input_dim=24, d_model=32, nhead=4,
        num_layers=1, num_feats=8, compute_dtype="float32",
        inference_query_size=0.2)
    qcfg = dataclasses.replace(cfg, quantized_inference=True)
    scfg = dataclasses.replace(qcfg, quant_static_acts=True)

    model = TimDetection(cfg)
    qmodel = TimDetection(qcfg)
    smodel = TimDetection(scfg)
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    rng = jax.random.PRNGKey(0)
    rnd = np.random.default_rng(0)
    b = 2
    v = jnp.asarray(rnd.normal(size=(b, 8, 32)), jnp.float32)
    a = jnp.asarray(rnd.normal(size=(b, 8, 24)), jnp.float32)
    times = jnp.asarray(rnd.uniform(size=(b, 16 + 2 * nq, 2)), jnp.float32)

    variables = model.init({"params": rng, "dropout": rng}, v, a, times,
                           nq, nq, deterministic=True)
    cls_fp, _, _ = model.apply(variables, v, a, times, nq, nq,
                               deterministic=True)

    qvars = {"params": quant.quantize_params(variables["params"])}

    def apply_fn(vs, batch, mutable):
        return qmodel.apply(vs, *batch, nq, nq, deterministic=True,
                            mutable=mutable)

    calibrated = quant.calibrate_act_scales(
        apply_fn, qvars, [(v, a, times)])
    assert "act_scale" in calibrated["encoder"]["layer0"]["self_attn"]["q"]
    assert float(
        calibrated["encoder"]["layer0"]["self_attn"]["q"]["act_scale"]) > 0

    cls_s, _, _ = smodel.apply({"params": calibrated}, v, a, times, nq, nq,
                               deterministic=True)
    fp = np.asarray(cls_fp[2], np.float32)
    st = np.asarray(cls_s[2], np.float32)
    assert np.abs(fp - st).max() / np.abs(fp).max() < 0.12
    agree = (fp.argmax(-1) == st.argmax(-1)).mean()
    assert agree > 0.85

    # compile-time-constant scales (the fast serving path) must equal the
    # param-based static path exactly
    ccfg = dataclasses.replace(
        scfg, quant_act_scales=quant.act_scales_tuple(calibrated))
    cmodel = TimDetection(ccfg)
    # const path creates no act_scale params; strip them
    def strip(node):
        if not isinstance(node, dict):
            return node
        return {k: strip(v) for k, v in node.items() if k != "act_scale"}
    cls_c, _, _ = cmodel.apply({"params": strip(calibrated)}, v, a, times,
                               nq, nq, deterministic=True)
    np.testing.assert_allclose(np.asarray(cls_c[2]), st, atol=1e-5)


def test_quantized_recognition_model_agrees_with_fp32():
    from tim_tpu.models import TimRecognition

    cfg = C.ModelConfig(
        visual_classes=(5, 6, 4), audio_classes=3,
        visual_input_dim=24, audio_input_dim=16, d_model=32, nhead=4,
        num_layers=2, num_feats=6, compute_dtype="float32")
    qcfg = dataclasses.replace(cfg, quantized_inference=True)
    model = TimRecognition(cfg)
    qmodel = TimRecognition(qcfg)
    b, nv, na = 2, 3, 2
    rng = jax.random.PRNGKey(0)
    rnd = np.random.default_rng(0)
    v = jnp.asarray(rnd.normal(size=(b, 6, 24)), jnp.float32)
    a = jnp.asarray(rnd.normal(size=(b, 6, 16)), jnp.float32)
    times = jnp.asarray(rnd.uniform(size=(b, 12 + nv + na, 2)),
                        jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, v, a, times,
                           nv, na, deterministic=True)
    logits_fp, _ = model.apply(variables, v, a, times, nv, na,
                               deterministic=True)
    qvars = {"params": quant.quantize_params(variables["params"])}
    logits_q, _ = qmodel.apply(qvars, v, a, times, nv, na,
                               deterministic=True)
    for fp, q in zip(logits_fp, logits_q):
        fp, q = np.asarray(fp, np.float32), np.asarray(q, np.float32)
        assert np.abs(fp - q).max() / np.abs(fp).max() < 0.08
        assert (fp.argmax(-1) == q.argmax(-1)).mean() > 0.85


def test_quantize_params_targets_encoder_and_heads_only():
    cfg = C.DetectionConfig(
        visual_classes=(13,), audio_classes=7,
        visual_input_dim=32, audio_input_dim=24, d_model=32, nhead=4,
        num_layers=1, num_feats=8, compute_dtype="float32",
        inference_query_size=0.2)
    model = TimDetection(cfg)
    nq = generate_query_pyramid(cfg.inference_query_size).shape[0]
    rng = jax.random.PRNGKey(0)
    v = jnp.zeros((1, 8, 32))
    a = jnp.zeros((1, 8, 24))
    times = jnp.zeros((1, 16 + 2 * nq, 2))
    params = model.init({"params": rng, "dropout": rng}, v, a, times,
                        nq, nq, deterministic=True)["params"]
    qp = quant.quantize_params(params)
    assert "kernel_q" in qp["encoder"]["layer0"]["self_attn"]["q"]
    assert "kernel_q" in qp["encoder"]["layer0"]["linear1"]
    assert "kernel_q" in qp["cls_head"]["fc_action"]
    # untouched: time mlp, embedders, reg head
    assert "kernel" in qp["time_mlp"]["fc0"]
    assert "kernel" in qp["reg_head"]["reg_visual"]["fc0"]
    assert "kernel" in qp["feature_encoding"]["visual_embedder"]["proj"]
