"""Gradient parity vs the torch oracle: identical weights + batch through
the reference-equivalent model and loss must produce the same loss AND the
same parameter gradients (dropout/mixup off). This pins the whole training
math — structured attention VJP included — not just forward outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from tim_tpu import config as C  # noqa: E402
from tim_tpu.convert import recognition_params_from_torch  # noqa: E402
from tim_tpu.models import TimRecognition  # noqa: E402
from tim_tpu.ops import losses as L  # noqa: E402
from tests import torch_oracle  # noqa: E402


def test_recognition_loss_and_grad_parity():
    dv, da, d, h, layers = 24, 20, 16, 2, 2
    classes = ((5, 6, 4), 3)
    b, f, nv, na = 3, 5, 2, 2
    torch.manual_seed(0)
    oracle = torch_oracle.OracleRecognitionAV(dv, da, d, h, layers, classes)
    oracle.eval()  # dropout off; grads still flow

    v = torch.randn(b, f, dv)
    a = torch.randn(b, f, da)
    times = torch.rand(b, 2 * f + nv + na, 2)
    rng = np.random.default_rng(0)
    verb = torch.tensor(rng.integers(-1, 5, (b, nv)))
    noun = torch.tensor(rng.integers(-1, 6, (b, nv)))
    action = torch.tensor(rng.integers(0, 4, (b, nv)))  # all valid
    class_id = torch.tensor(rng.integers(-1, 3, (b, na)))

    crit = torch.nn.CrossEntropyLoss(label_smoothing=0.2, ignore_index=-1)
    out = oracle(v, a, times, nv, na)
    t_loss = ((crit(out[0].flatten(0, 1), verb.flatten())
               + crit(out[1].flatten(0, 1), noun.flatten())
               + crit(out[2].flatten(0, 1), action.flatten())) / 3.0
              + 0.5 * crit(out[3].flatten(0, 1), class_id.flatten()))
    t_loss.backward()

    cfg = C.ModelConfig(
        visual_classes=classes[0], audio_classes=classes[1],
        visual_input_dim=dv, audio_input_dim=da, d_model=d, nhead=h,
        num_layers=layers, num_feats=f, compute_dtype="float32")
    model = TimRecognition(cfg)
    variables = recognition_params_from_torch(
        oracle.state_dict(), d_model=d, num_layers=layers)
    jb = {k: jnp.asarray(t.numpy()) for k, t in
          [("v", v), ("a", a), ("times", times)]}
    labels = {k: jnp.asarray(t.numpy()) for k, t in
              [("verb", verb), ("noun", noun), ("action", action),
               ("class_id", class_id)]}

    def loss_fn(params):
        logits, _ = model.apply({"params": params}, jb["v"], jb["a"],
                                jb["times"], nv, na, deterministic=True)
        def ce(lg, lb):
            return L.cross_entropy(lg.reshape(-1, lg.shape[-1]),
                                   lb.reshape(-1), label_smoothing=0.2)
        return ((ce(logits[0], labels["verb"])
                 + ce(logits[1], labels["noun"])
                 + ce(logits[2], labels["action"])) / 3.0
                + 0.5 * ce(logits[3], labels["class_id"]))

    j_loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert float(j_loss) == pytest.approx(
        float(t_loss.detach()), rel=1e-4)

    def check(j_grad, t_param, name, atol=5e-5):
        t_grad = t_param.grad.numpy()
        if t_grad.ndim == 2:
            t_grad = t_grad.T
        np.testing.assert_allclose(np.asarray(j_grad), t_grad, atol=atol,
                                   rtol=1e-3, err_msg=name)

    p = grads
    check(p["cls_head"]["fc_action"]["kernel"],
          oracle.cls_head.fc_visual_action.weight, "action head")
    check(p["cls_head"]["fc_audio"]["kernel"],
          oracle.cls_head.fc_audio_action.weight, "audio head")
    check(p["time_mlp"]["fc0"]["kernel"], oracle.time_mlp[0].weight,
          "time mlp fc0")
    check(p["feature_encoding"]["visual_embedder"]["proj"]["kernel"],
          oracle.feature_encoding.visual_embedder[1].weight,
          "visual embedder")
    check(p["encoder"]["layer0"]["linear1"]["kernel"],
          oracle.transformer_encoder.layers[0].linear1.weight,
          "layer0 ffn")
    # attention in-proj grads: torch packs qkv rows [3d, d]
    t_inproj = oracle.transformer_encoder.layers[0] \
        .self_attn.in_proj_weight.grad.numpy()
    wide = 2 * d
    for i, key in enumerate(("q", "k", "v")):
        np.testing.assert_allclose(
            np.asarray(p["encoder"]["layer0"]["self_attn"][key]["kernel"]),
            t_inproj[i * wide:(i + 1) * wide].T, atol=5e-5, rtol=1e-3,
            err_msg=f"attn {key}")
    # CLS token grads
    check(p["feature_encoding"]["visual_action_cls"],
          oracle.feature_encoding.visual_action_cls, "action cls token")
