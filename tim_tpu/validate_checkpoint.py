"""One-command released-checkpoint validation gate.

The reference publishes nine trained checkpoints (4 recognition:
``recognition/README.md:15-20``; 5 detection: ``detection/README.md:24-30``).
Every fast-path accuracy contract in this repo (int8 static,
``fast_scores``, flash) is qualified on synthetic fixtures until those
files are reachable; this gate is the ONE command to run against a real
file the day it is:

    python -m tim_tpu.validate_checkpoint /path/ckpt.pth.tar \
        --task recognition|detection [--nhead 8] [--num_feats 25]

Stages (each prints PASS/FAIL/SKIP; exit code 1 on any FAIL):

  1 load      torch.load, unwrap {"state_dict": ...}
  2 infer     d_model / layers / input dims / class heads / modality read
              off the state_dict shapes (printed for eyeballing)
  3 convert   ``convert.torch_import`` -> flax params, leaf-by-leaf shape
              check against a fresh ``model.init`` at the inferred config
  4 parity    the ACTUAL reference ``models/tim.py`` executed in-process
              with the checkpoint weights vs our converted model on a
              synthetic batch (max |logit delta|); SKIP when the
              reference tree / torch import is unavailable
  5 contract  int8(+``fast_scores``) serving vs the bf16 path ON THE
              REAL WEIGHTS: dense score delta <= 0.1 max / 0.01 mean and
              top-1 agreement >= 98% (the bounds
              ``tests/test_quant_accuracy.py`` qualifies on fixtures)

Fixture-tested end-to-end with a locally torch-saved reference
checkpoint in ``tests/test_validate_checkpoint.py`` so it is proven
runnable before real weights exist.
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, Optional

import numpy as np


class Gate:
    def __init__(self):
        self.failed = []

    def report(self, stage: str, ok: Optional[bool], detail: str = ""):
        tag = "SKIP" if ok is None else ("PASS" if ok else "FAIL")
        print(f"[validate] {stage:<10} {tag}  {detail}", flush=True)
        if ok is False:
            self.failed.append(stage)


def infer_from_state_dict(sd: Dict, task: str) -> Dict:
    """Architecture hyperparameters from checkpoint tensor shapes."""
    info: Dict = {"task": task}
    layer_prefix = ("backbone.layers." if task == "detection"
                    else "transformer_encoder.layers.")
    layers = {int(k[len(layer_prefix):].split(".")[0])
              for k in sd if k.startswith(layer_prefix)}
    if not layers:
        raise ValueError(
            f"no '{layer_prefix}*' keys — is --task {task} right for "
            "this file?")
    info["num_layers"] = max(layers) + 1
    # encoder width = 2 * d_model (concatenated feature+time encodings)
    width = sd[f"{layer_prefix}0.norm1.weight"].shape[0]
    info["d_model"] = width // 2

    mods = []
    for mod in ("visual", "audio"):
        k = f"feature_encoding.{mod}_embedder.1.weight"
        if k in sd:
            info[f"{mod}_input_dim"] = int(sd[k].shape[1])
            mods.append(mod)
    info["input_modality"] = ("audio_visual" if len(mods) == 2
                              else mods[0])

    def head(name):
        k = f"cls_head.{name}.weight"
        return int(sd[k].shape[0]) if k in sd else None

    verb, noun = head("fc_visual_verb"), head("fc_visual_noun")
    action, audio = head("fc_visual_action"), head("fc_audio_action")
    info["include_verb_noun"] = verb is not None
    if verb is not None:
        info["visual_classes"] = (verb, noun, action)
    elif action is not None:
        info["visual_classes"] = (action,)
    else:
        info["visual_classes"] = ()
    info["audio_classes"] = audio or 0
    info["pool_features"] = "pool.affine_audio.weight" in sd
    if task == "detection":
        info["has_visual_reg"] = "reg_head.fc_visual_action.0.weight" in sd
        info["has_audio_reg"] = "reg_head.fc_audio_action.0.weight" in sd
    return info


def build_config(info: Dict, nhead: int, num_feats: int,
                 compute_dtype: str = "float32"):
    from tim_tpu.config import DetectionConfig, ModelConfig

    kw = dict(
        visual_classes=tuple(info["visual_classes"]),
        audio_classes=info["audio_classes"],
        input_modality=info["input_modality"],
        data_modality=info["input_modality"],
        visual_input_dim=info.get("visual_input_dim", 1),
        audio_input_dim=info.get("audio_input_dim", 1),
        d_model=info["d_model"], nhead=nhead,
        num_layers=info["num_layers"], num_feats=num_feats,
        compute_dtype=compute_dtype,
    )
    if info["task"] == "detection":
        return DetectionConfig(**kw)
    return ModelConfig(**kw, include_verb_noun=info["include_verb_noun"])


def _synthetic_batch(cfg, rng, batch=2, nq=3):
    import jax.numpy as jnp

    f = cfg.num_feats
    v = a = None
    n_times = 0
    if "visual" in cfg.input_modality:
        v = jnp.asarray(rng.normal(size=(batch, f, cfg.visual_input_dim)),
                        jnp.float32)
        n_times += f + nq
    if "audio" in cfg.input_modality:
        a = jnp.asarray(rng.normal(size=(batch, f, cfg.audio_input_dim)),
                        jnp.float32)
        n_times += f + nq
    times = jnp.asarray(rng.uniform(size=(batch, n_times, 2)), jnp.float32)
    return v, a, times


def stage_shape_check(gate, cfg, variables, info) -> bool:
    import jax
    import jax.numpy as jnp
    from tim_tpu.models import TimDetection, TimRecognition

    rng = np.random.default_rng(0)
    nq = 3
    v, a, times = _synthetic_batch(cfg, rng, nq=nq)
    model = (TimDetection(cfg) if info["task"] == "detection"
             else TimRecognition(cfg))
    key = jax.random.PRNGKey(0)
    nv = nq if "visual" in cfg.input_modality else 0
    na = nq if "audio" in cfg.input_modality else 0
    ref_vars = model.init({"params": key, "dropout": key}, v, a, times,
                          nv, na, deterministic=True)

    ref_flat = jax.tree_util.tree_leaves_with_path(ref_vars["params"])
    got = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
    missing, bad = [], []
    for path, leaf in ref_flat:
        name = jax.tree_util.keystr(path)
        if path not in got:
            missing.append(name)
        elif tuple(np.shape(got[path])) != tuple(leaf.shape):
            bad.append(f"{name} {np.shape(got[path])}!={tuple(leaf.shape)}")
    ref_paths = {path for path, _ in ref_flat}
    extra = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_leaves_with_path(variables["params"])
             if p not in ref_paths]
    ok = not (missing or bad or extra)
    gate.report("convert", ok,
                f"{len(ref_flat)} leaves"
                + (f"; missing {missing[:3]}" if missing else "")
                + (f"; mismatched {bad[:3]}" if bad else "")
                + (f"; unexpected {extra[:3]}" if extra else ""))
    return ok


def stage_reference_parity(gate, sd, info, cfg, variables, nhead):
    try:
        import torch
        from tests.reference_loader import reference_tim_module
    except Exception as e:  # torch or the reference tree unavailable
        gate.report("parity", None, f"reference oracle unavailable "
                    f"({type(e).__name__})")
        return

    import jax.numpy as jnp
    from tim_tpu.models import TimDetection, TimRecognition

    rng = np.random.default_rng(1)
    nq = 3
    batch = 2
    f = cfg.num_feats
    v, a, times = _synthetic_batch(cfg, rng, batch=batch, nq=nq)
    nv = nq if "visual" in cfg.input_modality else 0
    na = nq if "audio" in cfg.input_modality else 0

    try:
        with reference_tim_module(info["task"]) as ref:
            if info["task"] == "recognition":
                model = ref.TIM(
                    (list(info["visual_classes"]), info["audio_classes"]),
                    visual_input_dim=info.get("visual_input_dim", 1),
                    audio_input_dim=info.get("audio_input_dim", 1),
                    d_model=info["d_model"], nhead=nhead,
                    num_layers=info["num_layers"],
                    input_modality=info["input_modality"],
                    data_modality=info["input_modality"],
                    num_feats=f,
                    include_verb_noun=info["include_verb_noun"],
                    pool_features=info["pool_features"])
            else:
                model = ref.TIM(
                    (info["visual_classes"][0] if info["visual_classes"]
                     else 1, info["audio_classes"]),
                    visual_input_dim=info.get("visual_input_dim", 1),
                    audio_input_dim=info.get("audio_input_dim", 1),
                    d_model=info["d_model"], nhead=nhead,
                    num_layers=info["num_layers"],
                    input_modality=info["input_modality"],
                    data_modality=info["input_modality"],
                    num_feats=f, include_verb_noun=False)
            model.load_state_dict(
                {k: torch.as_tensor(np.asarray(val))
                 for k, val in sd.items()}, strict=True)
            model.eval()

            tv = torch.as_tensor(np.asarray(v)) if v is not None else None
            ta = torch.as_tensor(np.asarray(a)) if a is not None else None
            t_times = torch.as_tensor(np.asarray(times))
            with torch.no_grad():
                if info["task"] == "recognition":
                    te = model(t_times, "time_mlp")
                    ref_logits, _ = model([tv, ta], "encoder",
                                          time_encodings=te,
                                          num_v_queries=nv,
                                          num_a_queries=na)
                    ref_logits = [x for x in ref_logits if x is not None]
                else:
                    # forward_inference uses the model's own 0.01-pyramid
                    # queries (tim.py:339-400); feed the SAME intervals
                    # to the flax model (pyramid parity is separately
                    # golden-tested in test_reference_model_golden.py)
                    n_ft = f * (2 if info["input_modality"]
                                == "audio_visual" else 1)
                    ftimes = t_times[:, :n_ft]
                    (ref_cls, ref_reg, _), _, _, queries, _ = model(
                        [tv, ta], "encoder", feature_times=ftimes,
                        target=None, label_queries=False)
                    nq_ref = model.num_queries
                    parts = [ftimes]
                    for q_t in queries:
                        if q_t is not None:
                            parts.append(q_t.reshape(
                                len(t_times), nq_ref, 2))
                    times = jnp.asarray(
                        torch.cat(parts, dim=1).numpy())
                    nv = nq_ref if tv is not None else 0
                    na = nq_ref if ta is not None else 0
                    ref_logits = ([x for x in ref_cls[2:] if x is not None]
                                  + [x for x in ref_reg if x is not None
                                     and x.numel()])
    except Exception as e:
        gate.report("parity", False,
                    f"reference execution failed: {type(e).__name__}: "
                    f"{str(e)[:200]}")
        return

    # the flax side gets the same per-stage FAIL treatment as the
    # reference side: a shape/size mismatch (e.g. a differently-pooled
    # head) must print "parity FAIL", not crash the gate
    try:
        jmodel = (TimDetection(cfg) if info["task"] == "detection"
                  else TimRecognition(cfg))
        out = jmodel.apply(variables, v, a, times, nv, na,
                           deterministic=True)
        if info["task"] == "recognition":
            logits = [x for x in out[0] if x is not None]
        else:
            j_cls, j_reg, _ = out
            logits = ([x for x in j_cls[2:] if x is not None]
                      + [x for x in j_reg if x is not None and x.size])
        worst = 0.0
        for got, want in zip(logits, ref_logits):
            d = np.abs(np.asarray(got, np.float64).reshape(want.shape)
                       - want.detach().numpy().astype(np.float64)).max()
            worst = max(worst, float(d))
    except Exception as e:
        gate.report("parity", False,
                    f"flax comparison failed: {type(e).__name__}: "
                    f"{str(e)[:200]}")
        return
    gate.report("parity", worst <= 2e-4 and len(logits) == len(ref_logits),
                f"max |logit d| {worst:.2e} over {len(logits)} heads "
                f"(tol 2e-4)")


def stage_contract(gate, info, cfg, variables):
    """The bench headline config (int8-static + ``fast_scores``) vs the
    fp32 path ON THE REAL WEIGHTS, over synthetic feature banks — the
    same quantities ``tests/test_quant_accuracy.py`` bounds on fixtures:
    dense sigmoid/softmax score deltas and top-1 agreement."""
    import dataclasses

    import jax.numpy as jnp

    params = variables["params"]
    rng = np.random.default_rng(2)

    try:
        if info["task"] == "detection":
            from tim_tpu.serve import DetectionServer

            fcfg = dataclasses.replace(cfg, fast_scores=True)
            f_srv = DetectionServer(cfg, params, batch_size=8)
            q_srv = DetectionServer.quantized(fcfg, params, [None],
                                              batch_size=8)
            nfeat, dur = 40, 12.0
            starts_t = np.linspace(0, dur - 1.1, nfeat).astype(np.float32)
            feat_times = np.stack([starts_t, starts_t + 1.1], -1)
            w_starts = f_srv._window_starts(dur)[:8]
            if len(w_starts) < 8:
                w_starts = np.concatenate(
                    [w_starts, np.repeat(w_starts[-1:],
                                         8 - len(w_starts))])
            batch = {}
            times_parts = []
            if "visual" in cfg.input_modality:
                bank = rng.normal(size=(nfeat, cfg.visual_input_dim)) \
                    .astype(np.float32)
                vv, vt = f_srv._assemble(bank, feat_times, w_starts, dur)
                batch["v_feats"] = jnp.asarray(vv)
                times_parts.append(vt)
            if "audio" in cfg.input_modality:
                bank = rng.normal(size=(nfeat, cfg.audio_input_dim)) \
                    .astype(np.float32)
                aa, at = f_srv._assemble(bank, feat_times, w_starts, dur)
                batch["a_feats"] = jnp.asarray(aa)
                times_parts.append(at)
            batch["times"] = jnp.asarray(
                np.concatenate(times_parts, axis=1))
            batch["window_start"] = jnp.asarray(w_starts, jnp.float32)
            batch["window_size"] = jnp.full(
                (8,), f_srv.window_size, jnp.float32)
            fo = f_srv._infer(f_srv.params, batch)
            qo = q_srv._infer(q_srv.params, batch)
            ds_all, agree = [], []
            for key in ("v_scores", "a_scores"):
                if key in fo and fo[key] is not None:
                    sf = np.asarray(fo[key], np.float32)
                    sq = np.asarray(qo[key], np.float32)
                    ds_all.append(np.abs(sf - sq))
                    agree.append(_margin_agreement(
                        sf.reshape(-1, sf.shape[-1]),
                        sq.reshape(-1, sq.shape[-1])))
            d = np.concatenate([x.reshape(-1) for x in ds_all])
            worst_max, worst_mean = float(d.max()), float(d.mean())
            agree_min = float(min(agree))
        else:
            from tim_tpu.models import TimRecognition
            from tim_tpu.ops import quant

            nq = 3
            v, a, times = _synthetic_batch(cfg, rng, batch=8, nq=nq)
            nv = nq if "visual" in cfg.input_modality else 0
            na = nq if "audio" in cfg.input_modality else 0
            qparams = quant.quantize_params(params)
            qcfg = dataclasses.replace(cfg, quantized_inference=True,
                                       fast_scores=True)
            qmodel = TimRecognition(qcfg)

            def calib_apply(vs, batch, mutable):
                return qmodel.apply(vs, v, a, times, nv, na,
                                    deterministic=True, mutable=mutable)

            calibrated = quant.calibrate_act_scales(
                calib_apply, {"params": qparams}, [None])
            scfg = dataclasses.replace(
                qcfg, quant_static_acts=True,
                quant_act_scales=quant.act_scales_tuple(calibrated))
            f_out, _ = TimRecognition(cfg).apply(
                {"params": params}, v, a, times, nv, na,
                deterministic=True)
            q_out, _ = TimRecognition(scfg).apply(
                {"params": qparams}, v, a, times, nv, na,
                deterministic=True)
            ds_all, agree = [], []
            for fl, ql in zip(f_out, q_out):
                if fl is None:
                    continue
                fl = np.asarray(fl, np.float32).reshape(-1, fl.shape[-1])
                ql = np.asarray(ql, np.float32).reshape(-1, ql.shape[-1])
                ds_all.append(np.abs(_softmax(fl) - _softmax(ql)))
                agree.append(_margin_agreement(_softmax(fl),
                                               _softmax(ql)))
            d = np.concatenate([x.reshape(-1) for x in ds_all])
            worst_max, worst_mean = float(d.max()), float(d.mean())
            agree_min = float(min(agree))
    except Exception as e:
        gate.report("contract", False, f"quantized path failed: "
                    f"{type(e).__name__}: {str(e)[:200]}")
        return

    ok = worst_max <= 0.1 and worst_mean <= 0.01 and agree_min >= 0.98
    gate.report("contract", ok,
                f"int8+fast_scores score d max {worst_max:.3f} (<=0.1) "
                f"mean {worst_mean:.4f} (<=0.01), top-1 agree "
                f"{agree_min:.3f} (>=0.98)")


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _margin_agreement(sf: np.ndarray, sq: np.ndarray,
                      margin: float = 0.02) -> float:
    """Top-1 agreement where disagreements among near-ties don't count:
    a flipped argmax is only a real disagreement when the fp32 top-2
    score margin exceeds ``margin`` (2x the contract's max allowed score
    delta would flip any closer pair legitimately). On trained weights
    almost every row clears the margin, so this converges to plain
    agreement; on near-uniform scores it ignores coin-flip ties."""
    same = sf.argmax(-1) == sq.argmax(-1)
    top2 = np.partition(sf, -2, axis=-1)[:, -2:]
    decisive = (top2[:, 1] - top2[:, 0]) > margin
    return float((same | ~decisive).mean())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Validate a released reference checkpoint end-to-end")
    ap.add_argument("checkpoint")
    ap.add_argument("--task", choices=("recognition", "detection"),
                    required=True)
    ap.add_argument("--nhead", type=int, default=8,
                    help="attention heads (not stored in the weights; "
                    "the released models use the parser default 8)")
    ap.add_argument("--num_feats", type=int, default=25,
                    help="feature timesteps per window (parser default)")
    ap.add_argument("--skip_parity", action="store_true")
    ap.add_argument("--skip_contract", action="store_true")
    args = ap.parse_args(argv)

    import jax

    # host-side validation gate: fp32 CPU is the parity reference (the
    # sitecustomize pin would otherwise route through the TPU relay)
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized (in-process test callers)

    gate = Gate()

    # -- 1 load ------------------------------------------------------
    try:
        import torch
        ckpt = torch.load(args.checkpoint, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        sd = {k: np.asarray(t.detach().cpu().numpy()
                            if hasattr(t, "detach") else t)
              for k, t in sd.items()}
        gate.report("load", True, f"{len(sd)} tensors"
                    + (f", epoch {ckpt.get('epoch')}"
                       if isinstance(ckpt, dict) and "epoch" in ckpt
                       else ""))
    except Exception as e:
        gate.report("load", False, f"{type(e).__name__}: {e}")
        return 1

    # -- 2 infer -----------------------------------------------------
    try:
        from tim_tpu.convert.torch_import import _strip_wrapper
        sd = dict(_strip_wrapper(sd))
        info = infer_from_state_dict(sd, args.task)
        gate.report("infer", True, str({k: v for k, v in info.items()
                                        if k != "task"}))
    except Exception as e:
        gate.report("infer", False, f"{type(e).__name__}: {e}")
        return 1

    cfg = build_config(info, args.nhead, args.num_feats)

    # -- 3 convert + shape check --------------------------------------
    from tim_tpu.convert import (detection_params_from_torch,
                                 recognition_params_from_torch)
    conv = (detection_params_from_torch if args.task == "detection"
            else recognition_params_from_torch)
    try:
        variables = conv(sd, d_model=info["d_model"],
                         num_layers=info["num_layers"])
        ok = stage_shape_check(gate, cfg, variables, info)
    except Exception as e:
        gate.report("convert", False, f"{type(e).__name__}: {e}")
        return 1
    if not ok:
        return 1

    # -- 4 parity ------------------------------------------------------
    if args.skip_parity:
        gate.report("parity", None, "--skip_parity")
    else:
        stage_reference_parity(gate, sd, info, cfg, variables, args.nhead)

    # -- 5 contract ----------------------------------------------------
    if args.skip_contract:
        gate.report("contract", None, "--skip_contract")
    else:
        stage_contract(gate, info, cfg, variables)

    if gate.failed:
        print(f"[validate] RESULT: FAIL ({', '.join(gate.failed)})",
              flush=True)
        return 1
    print("[validate] RESULT: PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
