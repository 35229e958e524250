"""End-to-end parity: random reference-layout torch weights -> converter ->
flax forward must reproduce the torch forward (fp32, eval mode).

This jointly proves the flax TIM math, the sequence layout, the structured
attention, and the checkpoint converter — the same path a released
reference checkpoint takes onto TPU."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from tim_tpu.config import DetectionConfig, ModelConfig  # noqa: E402
from tim_tpu.convert import (  # noqa: E402
    detection_params_from_torch, recognition_params_from_torch)
from tim_tpu.models import TimDetection, TimRecognition  # noqa: E402
from tests import torch_oracle  # noqa: E402


def test_recognition_av_parity():
    dv, da, d, h, layers = 48, 40, 32, 4, 2
    classes = ((9, 11, 13), 7)
    b, f, nv, na = 2, 6, 3, 2
    torch.manual_seed(0)
    oracle = torch_oracle.OracleRecognitionAV(dv, da, d, h, layers, classes)
    oracle.eval()

    v = torch.randn(b, f, dv)
    a = torch.randn(b, f, da)
    times = torch.rand(b, 2 * f + nv + na, 2)
    with torch.no_grad():
        want = oracle(v, a, times, nv, na)

    cfg = ModelConfig(
        visual_classes=classes[0], audio_classes=classes[1],
        visual_input_dim=dv, audio_input_dim=da, d_model=d, nhead=h,
        num_layers=layers, num_feats=f, compute_dtype="float32")
    model = TimRecognition(cfg)
    variables = recognition_params_from_torch(
        oracle.state_dict(), d_model=d, num_layers=layers)

    logits, ctx = model.apply(
        variables, jnp.asarray(v.numpy()), jnp.asarray(a.numpy()),
        jnp.asarray(times.numpy()), nv, na, deterministic=True)

    for got, ref in zip(logits, want[:4]):
        np.testing.assert_allclose(
            np.asarray(got), ref.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ctx), want[4].numpy(), atol=2e-4, rtol=1e-3)


def test_detection_av_parity():
    dv, da, d, h, layers = 48, 40, 32, 4, 2
    classes = ((13,), 7)
    b, f, nv, na = 2, 6, 5, 4
    torch.manual_seed(1)
    oracle = torch_oracle.OracleDetectionAV(dv, da, d, h, layers, classes)
    oracle.eval()

    v = torch.randn(b, f, dv)
    a = torch.randn(b, f, da)
    times = torch.rand(b, 2 * f + nv + na, 2)
    with torch.no_grad():
        want = oracle(v, a, times, nv, na)

    cfg = DetectionConfig(
        visual_classes=classes[0], audio_classes=classes[1],
        visual_input_dim=dv, audio_input_dim=da, d_model=d, nhead=h,
        num_layers=layers, num_feats=f, compute_dtype="float32")
    model = TimDetection(cfg)
    variables = detection_params_from_torch(
        oracle.state_dict(), d_model=d, num_layers=layers)

    cls, reg, ctx = model.apply(
        variables, jnp.asarray(v.numpy()), jnp.asarray(a.numpy()),
        jnp.asarray(times.numpy()), nv, na, deterministic=True)

    np.testing.assert_allclose(np.asarray(cls[2]), want[0].numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cls[3]), want[1].numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(reg[0]), want[2].numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(reg[1]), want[3].numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ctx), want[4].numpy(),
                               atol=2e-4, rtol=1e-3)


def test_converter_strips_ddp_wrapper_prefix():
    """A 'module.'-wrapped state dict (DataParallel save) converts to the
    identical param tree as the bare one."""
    import jax

    from tests import torch_oracle
    from tim_tpu.convert import recognition_params_from_torch

    oracle = torch_oracle.OracleRecognitionAV(16, 12, 16, 2, 1, ((5, 6, 4), 3))
    sd = {k: v for k, v in oracle.state_dict().items()}
    wrapped = {f"module.{k}": v for k, v in sd.items()}
    nested = {f"module._orig_mod.{k}": v for k, v in sd.items()}
    bare = recognition_params_from_torch(sd, d_model=16, num_layers=1)
    conv = recognition_params_from_torch(wrapped, d_model=16, num_layers=1)
    conv2 = recognition_params_from_torch(nested, d_model=16, num_layers=1)
    for tree in (conv, conv2):
        for a, b in zip(jax.tree_util.tree_leaves(bare),
                        jax.tree_util.tree_leaves(tree)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
