"""Golden parity against the ACTUAL reference TIM models executed
in-process.

Every other subsystem is already golden-tested against reference code run
in-process (datasets, meters, metrics, evaluators, backbones, pool,
RandAugment, masking). This file closes the last gap: the flagship models
themselves. The real ``recognition/time_interval_machine/models/tim.py``
and ``detection/time_interval_machine/models/tim.py`` (with their
``helpers/``) are imported read-only, their ``state_dict()`` is pushed
through ``tim_tpu/convert/torch_import.py``, and the flax models must
reproduce forward logits, detection query labeling, and training
gradients. ``tests/torch_oracle.py`` remains as a fast transcription
proxy only.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.reference_loader import reference_tim_module  # noqa: E402
from tim_tpu.config import DetectionConfig, ModelConfig  # noqa: E402
from tim_tpu.convert import (  # noqa: E402
    detection_params_from_torch, recognition_params_from_torch)
from tim_tpu.models import TimDetection, TimRecognition  # noqa: E402
from tim_tpu.models import queries as Q  # noqa: E402
from tim_tpu.ops import losses as L  # noqa: E402

ATOL, RTOL = 2e-4, 1e-3


def _close(got, want, name, atol=ATOL):
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float64),
        np.asarray(want.detach() if hasattr(want, "detach") else want,
                   dtype=np.float64),
        atol=atol, rtol=RTOL, err_msg=name)


# ---------------------------------------------------------------------------
# Recognition
# ---------------------------------------------------------------------------

def test_recognition_av_forward_parity_vs_reference():
    """reference recognition tim.py:147-191 (audio_visual, verb/noun)."""
    dv, da, d, h, layers = 28, 20, 16, 2, 2
    classes = ([5, 6, 4], 3)
    b, f, nv, na = 2, 6, 3, 2
    with reference_tim_module("recognition") as ref:
        torch.manual_seed(0)
        model = ref.TIM(
            classes, visual_input_dim=dv, audio_input_dim=da,
            d_model=d, nhead=h, num_layers=layers,
            input_modality="audio_visual", data_modality="audio_visual",
            num_feats=f, include_verb_noun=True, pool_features=False)
        model.eval()

        v = torch.randn(b, f, dv)
        a = torch.randn(b, f, da)
        times = torch.rand(b, 2 * f + nv + na, 2)
        with torch.no_grad():
            te = model(times, "time_mlp")
            (verb, noun, action, audio), ctx = model(
                [v, a], "encoder", time_encodings=te,
                num_v_queries=nv, num_a_queries=na)
        sd = {k: t.clone() for k, t in model.state_dict().items()}

    cfg = ModelConfig(
        visual_classes=tuple(classes[0]), audio_classes=classes[1],
        visual_input_dim=dv, audio_input_dim=da, d_model=d, nhead=h,
        num_layers=layers, num_feats=f, compute_dtype="float32")
    flax_model = TimRecognition(cfg)
    variables = recognition_params_from_torch(sd, d_model=d,
                                              num_layers=layers)
    logits, j_ctx = flax_model.apply(
        variables, jnp.asarray(v.numpy()), jnp.asarray(a.numpy()),
        jnp.asarray(times.numpy()), nv, na, deterministic=True)

    # reference flattens logits to [B*Nq, C] (head.py:26-36)
    for got, want, name in zip(
            logits, (verb, noun, action, audio),
            ("verb", "noun", "action", "audio")):
        _close(np.asarray(got).reshape(want.shape), want, name)
    _close(j_ctx, ctx, "context tokens")


def test_recognition_visual_only_forward_parity_vs_reference():
    """reference VisualFeatureEncoding + VisualCLSHead path."""
    dv, d, h, layers = 28, 16, 2, 2
    classes = ([5, 6, 4], 3)
    b, f, nv = 2, 6, 3
    with reference_tim_module("recognition") as ref:
        torch.manual_seed(1)
        model = ref.TIM(
            classes, visual_input_dim=dv, d_model=d, nhead=h,
            num_layers=layers, input_modality="visual",
            data_modality="visual", num_feats=f, include_verb_noun=True)
        model.eval()

        v = torch.randn(b, f, dv)
        times = torch.rand(b, f + nv, 2)
        with torch.no_grad():
            te = model(times, "time_mlp")
            (verb, noun, action, audio), ctx = model(
                [v, None], "encoder", time_encodings=te,
                num_v_queries=nv, num_a_queries=0)
        assert audio is None
        sd = {k: t.clone() for k, t in model.state_dict().items()}

    cfg = ModelConfig(
        visual_classes=tuple(classes[0]), audio_classes=classes[1],
        input_modality="visual", data_modality="visual",
        visual_input_dim=dv, d_model=d, nhead=h, num_layers=layers,
        num_feats=f, compute_dtype="float32")
    flax_model = TimRecognition(cfg)
    variables = recognition_params_from_torch(sd, d_model=d,
                                              num_layers=layers)
    logits, j_ctx = flax_model.apply(
        variables, jnp.asarray(v.numpy()), None,
        jnp.asarray(times.numpy()), nv, 0, deterministic=True)

    for got, want, name in zip(logits[:3], (verb, noun, action),
                               ("verb", "noun", "action")):
        _close(np.asarray(got).reshape(want.shape), want, name)
    assert logits[3] is None
    _close(j_ctx, ctx, "context tokens")


def test_recognition_ave_pooled_forward_parity_vs_reference():
    """AVE path: AVGA audio-guided pooling inside forward_encoder
    (recognition tim.py:155-156, pool.py:6-44)."""
    dv, da, d, h, layers = 12, 10, 16, 2, 1
    classes = (4, 4)
    b, f, nv, na = 2, 5, 2, 2
    with reference_tim_module("recognition") as ref:
        torch.manual_seed(2)
        model = ref.TIM(
            classes, visual_input_dim=dv, audio_input_dim=da,
            d_model=d, nhead=h, num_layers=layers,
            input_modality="audio_visual", data_modality="audio_visual",
            num_feats=f, include_verb_noun=False, pool_features=True)
        model.eval()

        v = torch.randn(b, f, 49, dv)
        a = torch.randn(b, f, da)
        times = torch.rand(b, 2 * f + nv + na, 2)
        with torch.no_grad():
            te = model(times, "time_mlp")
            (verb, noun, action, audio), ctx = model(
                [v.clone(), a], "encoder", time_encodings=te,
                num_v_queries=nv, num_a_queries=na)
        sd = {k: t.clone() for k, t in model.state_dict().items()}

    cfg = ModelConfig(
        visual_classes=(classes[0],), audio_classes=classes[1],
        visual_input_dim=dv, audio_input_dim=da, d_model=d, nhead=h,
        num_layers=layers, num_feats=f, include_verb_noun=False,
        apply_feature_pooling=True, compute_dtype="float32")
    flax_model = TimRecognition(cfg)
    variables = recognition_params_from_torch(sd, d_model=d,
                                              num_layers=layers)
    logits, j_ctx = flax_model.apply(
        variables, jnp.asarray(v.numpy()), jnp.asarray(a.numpy()),
        jnp.asarray(times.numpy()), nv, na, deterministic=True)

    _close(np.asarray(logits[2]).reshape(action.shape), action, "action")
    _close(np.asarray(logits[3]).reshape(audio.shape), audio, "audio")
    _close(j_ctx, ctx, "context tokens")


def test_recognition_grad_parity_vs_reference():
    """Loss + parameter gradients through the REAL reference model match
    the flax training math (dropout off)."""
    dv, da, d, h, layers = 20, 16, 16, 2, 2
    classes = ([5, 6, 4], 3)
    b, f, nv, na = 3, 5, 2, 2
    with reference_tim_module("recognition") as ref:
        torch.manual_seed(3)
        model = ref.TIM(
            classes, visual_input_dim=dv, audio_input_dim=da,
            d_model=d, nhead=h, num_layers=layers,
            input_modality="audio_visual", data_modality="audio_visual",
            num_feats=f, include_verb_noun=True)
        model.eval()  # dropout off; grads still flow

        v = torch.randn(b, f, dv)
        a = torch.randn(b, f, da)
        times = torch.rand(b, 2 * f + nv + na, 2)
        rng = np.random.default_rng(0)
        verb = torch.tensor(rng.integers(-1, 5, (b, nv)))
        noun = torch.tensor(rng.integers(-1, 6, (b, nv)))
        action = torch.tensor(rng.integers(0, 4, (b, nv)))
        class_id = torch.tensor(rng.integers(-1, 3, (b, na)))

        crit = torch.nn.CrossEntropyLoss(label_smoothing=0.2,
                                         ignore_index=-1)
        te = model(times, "time_mlp")
        out, _ = model([v, a], "encoder", time_encodings=te,
                       num_v_queries=nv, num_a_queries=na)
        t_loss = ((crit(out[0], verb.flatten())
                   + crit(out[1], noun.flatten())
                   + crit(out[2], action.flatten())) / 3.0
                  + 0.5 * crit(out[3], class_id.flatten()))
        t_loss.backward()
        sd = {k: t.clone() for k, t in model.state_dict().items()}
        t_grads = {k: p.grad.clone() for k, p in model.named_parameters()
                   if p.grad is not None}  # drloc_mlp unused this pass

    cfg = ModelConfig(
        visual_classes=tuple(classes[0]), audio_classes=classes[1],
        visual_input_dim=dv, audio_input_dim=da, d_model=d, nhead=h,
        num_layers=layers, num_feats=f, compute_dtype="float32")
    flax_model = TimRecognition(cfg)
    variables = recognition_params_from_torch(sd, d_model=d,
                                              num_layers=layers)
    jb = {k: jnp.asarray(t.numpy()) for k, t in
          [("v", v), ("a", a), ("times", times)]}
    labels = {k: jnp.asarray(t.numpy()) for k, t in
              [("verb", verb), ("noun", noun), ("action", action),
               ("class_id", class_id)]}

    def loss_fn(params):
        logits, _ = flax_model.apply(
            {"params": params}, jb["v"], jb["a"], jb["times"], nv, na,
            deterministic=True)

        def ce(lg, lb):
            return L.cross_entropy(lg.reshape(-1, lg.shape[-1]),
                                   lb.reshape(-1), label_smoothing=0.2)
        return ((ce(logits[0], labels["verb"])
                 + ce(logits[1], labels["noun"])
                 + ce(logits[2], labels["action"])) / 3.0
                + 0.5 * ce(logits[3], labels["class_id"]))

    j_loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert float(j_loss) == pytest.approx(float(t_loss.detach()), rel=1e-4)

    def check(j_grad, key, name, atol=5e-5):
        t_grad = t_grads[key].numpy()
        if t_grad.ndim == 2:
            t_grad = t_grad.T
        np.testing.assert_allclose(np.asarray(j_grad), t_grad, atol=atol,
                                   rtol=1e-3, err_msg=name)

    p = grads
    check(p["cls_head"]["fc_action"]["kernel"],
          "cls_head.fc_visual_action.weight", "action head")
    check(p["cls_head"]["fc_audio"]["kernel"],
          "cls_head.fc_audio_action.weight", "audio head")
    check(p["time_mlp"]["fc0"]["kernel"], "time_mlp.0.weight",
          "time mlp fc0")
    check(p["feature_encoding"]["visual_embedder"]["proj"]["kernel"],
          "feature_encoding.visual_embedder.1.weight", "visual embedder")
    check(p["encoder"]["layer0"]["linear1"]["kernel"],
          "transformer_encoder.layers.0.linear1.weight", "layer0 ffn")
    check(p["feature_encoding"]["visual_action_cls"],
          "feature_encoding.visual_action_cls", "action cls token")
    t_inproj = t_grads[
        "transformer_encoder.layers.0.self_attn.in_proj_weight"].numpy()
    wide = 2 * d
    for i, key in enumerate(("q", "k", "v")):
        np.testing.assert_allclose(
            np.asarray(p["encoder"]["layer0"]["self_attn"][key]["kernel"]),
            t_inproj[i * wide:(i + 1) * wide].T, atol=5e-5, rtol=1e-3,
            err_msg=f"attn {key}")


# ---------------------------------------------------------------------------
# Detection
# ---------------------------------------------------------------------------

def _ref_detection(ref, classes, dv, da, d, h, layers, f):
    return ref.TIM(
        classes, visual_input_dim=dv, audio_input_dim=da,
        d_model=d, nhead=h, num_layers=layers,
        input_modality="audio_visual", data_modality="audio_visual",
        num_feats=f, include_verb_noun=False,
        iou_threshold=0.6, label_smoothing=0.9)


def _det_target(b, n_act, classes, seed):
    rng = np.random.default_rng(seed)
    starts = rng.uniform(0.0, 0.7, (b, n_act)).astype(np.float32)
    ends = (starts + rng.uniform(0.05, 0.3, (b, n_act))).astype(np.float32)
    return {
        "v_gt_segments": torch.tensor(np.stack([starts, ends], -1)),
        "a_gt_segments": torch.tensor(np.stack([starts, ends], -1)),
        "verb": torch.tensor(rng.integers(0, classes[0], (b, n_act))),
        "noun": torch.tensor(rng.integers(0, classes[0], (b, n_act))),
        "action": torch.tensor(rng.integers(0, classes[0], (b, n_act))),
        "class_id": torch.tensor(rng.integers(0, classes[1], (b, n_act))),
    }


def test_detection_query_pyramid_parity_vs_reference():
    with reference_tim_module("detection") as ref:
        model = _ref_detection(ref, (13, 7), 12, 10, 8, 2, 1, 4)
        ref_pool = model.train_pool[0].numpy()
        ref_grid = model.inference_queries[0].numpy()

    ours_pool = Q.generate_query_pyramid(0.005)
    ours_grid = Q.generate_query_pyramid(0.01)
    assert ours_grid.shape == ref_grid.shape
    np.testing.assert_allclose(ours_grid, ref_grid, atol=1e-6)
    assert ours_pool.shape == ref_pool.shape
    # finest train level can differ by one 0.001 rounding step (1-ulp
    # arange difference, documented in queries.py)
    np.testing.assert_allclose(ours_pool, ref_pool, atol=1.1e-3)
    assert (np.abs(ours_pool - ref_pool) > 5e-4).mean() < 0.03


def test_detection_inference_forward_and_labeling_parity_vs_reference():
    """forward_inference (detection tim.py:339-400) with label_queries=True:
    dense grid logits, regressions, IoU labeling, and smoothed labels."""
    dv, da, d, h, layers = 20, 16, 16, 2, 2
    classes = (13, 7)
    b, f, n_act = 2, 6, 3
    with reference_tim_module("detection") as ref:
        torch.manual_seed(4)
        model = _ref_detection(ref, classes, dv, da, d, h, layers, f)
        model.eval()

        v = torch.randn(b, f, dv)
        a = torch.randn(b, f, da)
        feature_times = torch.rand(b, 2 * f, 2)
        target = _det_target(b, n_act, classes, seed=5)
        with torch.no_grad():
            (cls_scores, reg_scores, ctx), offsets, labels_t, queries, \
                ious = model([v, a], "encoder",
                             feature_times=feature_times, target=target,
                             label_queries=True)
        sd = {k: t.clone() for k, t in model.state_dict().items()}
        nq = model.num_queries

    v_q = queries[0].reshape(b, nq, 2).numpy()
    a_q = queries[1].reshape(b, nq, 2).numpy()

    cfg = DetectionConfig(
        visual_classes=(classes[0],), audio_classes=classes[1],
        visual_input_dim=dv, audio_input_dim=da, d_model=d, nhead=h,
        num_layers=layers, num_feats=f, compute_dtype="float32")
    flax_model = TimDetection(cfg)
    variables = detection_params_from_torch(sd, d_model=d,
                                            num_layers=layers)
    times = jnp.concatenate(
        [jnp.asarray(feature_times.numpy()), jnp.asarray(v_q),
         jnp.asarray(a_q)], axis=1)
    j_cls, j_reg, j_ctx = flax_model.apply(
        variables, jnp.asarray(v.numpy()), jnp.asarray(a.numpy()),
        times, nq, nq, deterministic=True)

    _close(np.asarray(j_cls[2]).reshape(cls_scores[2].shape),
           cls_scores[2], "visual cls")
    _close(np.asarray(j_cls[3]).reshape(cls_scores[3].shape),
           cls_scores[3], "audio cls")
    _close(np.asarray(j_reg[0]).reshape(reg_scores[0].shape),
           reg_scores[0], "visual reg")
    _close(np.asarray(j_reg[1]).reshape(reg_scores[1].shape),
           reg_scores[1], "audio reg")
    _close(j_ctx, ctx, "context tokens")

    # --- labeling parity (detection tim.py:186-270) ---
    gt_v = jnp.asarray(target["v_gt_segments"].numpy())
    # include_verb_noun=False: the reference stacks verb/noun/action but
    # smooths only the action column; our pipeline carries action-only
    gt_labels_v = jnp.asarray(target["action"].numpy())[..., None]
    tgt, lbl, iou = Q.label_queries(jnp.asarray(v_q), gt_v, gt_labels_v,
                                    0.6)
    _close(iou.reshape(-1), ious[0], "visual query ious", atol=1e-5)
    ref_off = offsets[0].numpy()
    got_off = np.asarray(tgt).reshape(-1, 2)
    np.testing.assert_array_equal(np.isinf(got_off), np.isinf(ref_off))
    finite = ~np.isinf(ref_off)
    np.testing.assert_allclose(got_off[finite], ref_off[finite], atol=1e-6)

    smoothed = Q.smooth_detection_labels(
        lbl, (classes[0],), classes[1], 0.9, "visual")
    _close(np.asarray(smoothed[2]).reshape(-1, classes[0]),
           labels_t[0][2], "smoothed visual labels", atol=1e-6)

    gt_labels_a = jnp.asarray(target["class_id"].numpy())[..., None]
    tgt_a, lbl_a, iou_a = Q.label_queries(
        jnp.asarray(a_q), gt_v, gt_labels_a, 0.6)
    _close(iou_a.reshape(-1), ious[1], "audio query ious", atol=1e-5)
    smoothed_a = Q.smooth_detection_labels(
        lbl_a, (classes[0],), classes[1], 0.9, "audio")
    _close(np.asarray(smoothed_a).reshape(-1, classes[1]),
           labels_t[1], "smoothed audio labels", atol=1e-6)


def test_detection_train_forward_parity_vs_reference():
    """forward_train (detection tim.py:272-337): reference samples the
    train-pool queries; we feed the SAME sampled intervals to the flax
    model and must reproduce logits/regressions."""
    dv, da, d, h, layers = 20, 16, 16, 2, 2
    classes = (13, 7)
    b, f, n_act = 2, 6, 3
    with reference_tim_module("detection") as ref:
        torch.manual_seed(6)
        model = _ref_detection(ref, classes, dv, da, d, h, layers, f)
        model.eval()  # dropout off; call forward_train directly

        v = torch.randn(b, f, dv)
        a = torch.randn(b, f, da)
        feature_times = torch.rand(b, 2 * f, 2)
        target = _det_target(b, n_act, classes, seed=7)
        with torch.no_grad():
            (cls_scores, reg_scores, ctx), offsets, labels_t, queries, \
                ious = model.forward_train([v, a], feature_times, target)
        sd = {k: t.clone() for k, t in model.state_dict().items()}
        nq = model.num_queries

    v_q = queries[0].reshape(b, nq, 2).numpy()
    a_q = queries[1].reshape(b, nq, 2).numpy()
    # train sampling draws two different permutations for v and a
    assert not np.allclose(v_q, a_q)

    cfg = DetectionConfig(
        visual_classes=(classes[0],), audio_classes=classes[1],
        visual_input_dim=dv, audio_input_dim=da, d_model=d, nhead=h,
        num_layers=layers, num_feats=f, compute_dtype="float32")
    flax_model = TimDetection(cfg)
    variables = detection_params_from_torch(sd, d_model=d,
                                            num_layers=layers)
    times = jnp.concatenate(
        [jnp.asarray(feature_times.numpy()), jnp.asarray(v_q),
         jnp.asarray(a_q)], axis=1)
    j_cls, j_reg, j_ctx = flax_model.apply(
        variables, jnp.asarray(v.numpy()), jnp.asarray(a.numpy()),
        times, nq, nq, deterministic=True)

    _close(np.asarray(j_cls[2]).reshape(cls_scores[2].shape),
           cls_scores[2], "visual cls")
    _close(np.asarray(j_cls[3]).reshape(cls_scores[3].shape),
           cls_scores[3], "audio cls")
    _close(np.asarray(j_reg[0]).reshape(reg_scores[0].shape),
           reg_scores[0], "visual reg")
    _close(np.asarray(j_reg[1]).reshape(reg_scores[1].shape),
           reg_scores[1], "audio reg")

    # labeling on the sampled train queries
    gt_v = jnp.asarray(target["v_gt_segments"].numpy())
    gt_labels_v = jnp.asarray(target["action"].numpy())[..., None]
    _, lbl, iou = Q.label_queries(jnp.asarray(v_q), gt_v, gt_labels_v, 0.6)
    _close(iou.reshape(-1), ious[0], "train visual ious", atol=1e-5)
    smoothed = Q.smooth_detection_labels(
        lbl, (classes[0],), classes[1], 0.9, "visual")
    _close(np.asarray(smoothed[2]).reshape(-1, classes[0]),
           labels_t[0][2], "train smoothed labels", atol=1e-6)


# ---------------------------------------------------------------------------
# File-level drill: reference-saved checkpoint -> cli --validate
# ---------------------------------------------------------------------------

def test_cli_validate_on_reference_model_checkpoint(tmp_path, monkeypatch):
    """torch.save the REAL reference model's checkpoint dict (the format
    save_checkpoint writes, recognition/.../utils/checkpoint.py:44-71) and
    drive ``cli.py --validate --torch_checkpoint`` on it end-to-end."""
    import pandas as pd  # noqa: F401
    from tim_tpu import cli
    import tim_tpu.cli as cli_mod
    from tim_tpu.data import synthetic

    b = synthetic.synthetic_epic(
        seed=11, num_videos=2, video_seconds=40.0, per_video=6,
        visual_dim=24, audio_dim=16, visual_classes=(5, 6, 4),
        audio_classes=3)
    for split in ("train", "val"):
        os.makedirs(tmp_path / "vfeats" / split, exist_ok=True)
        os.makedirs(tmp_path / "afeats" / split, exist_ok=True)
        for vid, arr in b["v_feats"].items():
            np.save(tmp_path / "vfeats" / split / f"{vid}.npy", arr)
        for vid, arr in b["a_feats"].items():
            np.save(tmp_path / "afeats" / split / f"{vid}.npy", arr)

    import pandas as pd

    def ctx_frame(ft):
        rows = []
        for vid, t in ft.items():
            for s, e in t:
                rows.append({"video_id": vid, "start_sec": float(s),
                             "stop_sec": float(e),
                             "narration_sec": float(s)})
        return pd.DataFrame(rows)

    ctx_frame(b["v_feat_times"]).to_pickle(tmp_path / "v_ctx.pkl")
    ctx_frame(b["a_feat_times"]).to_pickle(tmp_path / "a_ctx.pkl")
    b["v_actions"].to_pickle(tmp_path / "v_actions.pkl")
    b["a_actions"].to_pickle(tmp_path / "a_actions.pkl")
    b["video_info"].to_pickle(tmp_path / "video_info.pkl")

    with reference_tim_module("recognition") as ref:
        torch.manual_seed(8)
        model = ref.TIM(
            ([5, 6, 4], 3), visual_input_dim=24, audio_input_dim=16,
            d_model=16, nhead=2, num_layers=1, num_feats=6,
            include_verb_noun=True)
        state = {"state_dict": model.state_dict(), "epoch": 42}
        ckpt_path = tmp_path / "checkpoint_42.pth.tar"
        torch.save(state, ckpt_path)

    orig = cli_mod.configs_from_args

    def patched(args):
        mcfg, tcfg, mesh = orig(args)
        import dataclasses
        mcfg = dataclasses.replace(mcfg, visual_classes=(5, 6, 4),
                                   audio_classes=3)
        return mcfg, tcfg, mesh

    monkeypatch.setattr(cli_mod, "configs_from_args", patched)
    out = tmp_path / "out"
    cli.main([
        "--video_data_path", str(tmp_path / "vfeats"),
        "--audio_data_path", str(tmp_path / "afeats"),
        "--video_train_action_pickle", str(tmp_path / "v_actions.pkl"),
        "--video_val_action_pickle", str(tmp_path / "v_actions.pkl"),
        "--video_train_context_pickle", str(tmp_path / "v_ctx.pkl"),
        "--video_val_context_pickle", str(tmp_path / "v_ctx.pkl"),
        "--audio_train_action_pickle", str(tmp_path / "a_actions.pkl"),
        "--audio_val_action_pickle", str(tmp_path / "a_actions.pkl"),
        "--audio_train_context_pickle", str(tmp_path / "a_ctx.pkl"),
        "--audio_val_context_pickle", str(tmp_path / "a_ctx.pkl"),
        "--video_info_pickle", str(tmp_path / "video_info.pkl"),
        "--num_feats", "6", "--feat_stride", "2",
        "--d_model", "16", "--nhead", "2", "--num_layers", "1",
        "--visual_input_dim", "24", "--audio_input_dim", "16",
        "--compute_dtype", "float32", "--batch-size", "8",
        "--output_dir", str(out),
        "--torch_checkpoint", str(ckpt_path), "--validate",
    ])
