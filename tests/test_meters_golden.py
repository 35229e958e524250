"""Golden: reference InferenceMeter (executed in-process) vs our
WindowVoteAccumulator on identical streamed logits — accuracies equal."""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tim_tpu.evals.meters import WindowVoteAccumulator  # noqa: E402


def _import_ref_meters(monkeypatch):
    # stub fvcore Timer + the package-local logging/misc imports
    timer_mod = types.ModuleType("fvcore.common.timer")

    class Timer:
        def seconds(self):
            return 0.0

        def reset(self):
            pass

        def pause(self):
            pass

    timer_mod.Timer = Timer
    common = types.ModuleType("fvcore.common")
    fvcore = types.ModuleType("fvcore")
    import logging as pylog
    tim_pkg = types.ModuleType("time_interval_machine")
    utils_pkg = types.ModuleType("time_interval_machine.utils")
    log_stub = types.ModuleType("time_interval_machine.utils.logging")
    log_stub.get_logger = lambda name: pylog.getLogger(name)
    misc_stub = types.ModuleType("time_interval_machine.utils.misc")
    misc_stub.cpu_mem_usage = lambda: (0.0, 0.0)
    misc_stub.gpu_mem_usage = lambda: (0.0, 0.0)

    ref_root = "/root/reference/recognition/time_interval_machine"
    spec = importlib.util.spec_from_file_location(
        "time_interval_machine.utils.metrics", f"{ref_root}/utils/metrics.py")
    metrics_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(metrics_mod)

    for name, mod in {
        "fvcore": fvcore, "fvcore.common": common,
        "fvcore.common.timer": timer_mod,
        "time_interval_machine": tim_pkg,
        "time_interval_machine.utils": utils_pkg,
        "time_interval_machine.utils.logging": log_stub,
        "time_interval_machine.utils.misc": misc_stub,
        "time_interval_machine.utils.metrics": metrics_mod,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)

    spec = importlib.util.spec_from_file_location(
        "ref_meters", f"{ref_root}/utils/meters.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Args:
    early_stop_period = -1
    dataset = "epic"
    data_modality = "audio_visual"
    include_verb_noun = True
    num_class = ([6, 7, 5], 5)


def test_inference_meter_golden(monkeypatch):
    ref = _import_ref_meters(monkeypatch)
    num_actions = 12
    meter = ref.InferenceMeter(_Args(), num_actions)
    acc = WindowVoteAccumulator(num_actions,
                                {"verb": 6, "noun": 7, "action": 5,
                                 "audio": 5})

    rng = np.random.default_rng(0)
    # action ids: first 8 visual, last 4 audio (disjoint like the combined
    # annotation table)
    for step in range(7):
        nv, na = 3, 2
        v_ids = rng.integers(0, 8, nv)
        a_ids = rng.integers(8, 12, na)
        verb_lg = rng.normal(size=(nv, 6)).astype(np.float32)
        noun_lg = rng.normal(size=(nv, 7)).astype(np.float32)
        act_lg = rng.normal(size=(nv, 5)).astype(np.float32)
        aud_lg = rng.normal(size=(na, 5)).astype(np.float32)
        v_lab = np.stack([v_ids % 6, v_ids % 7, v_ids % 5], -1)
        a_lab = a_ids % 5

        meter.update(
            torch.tensor(verb_lg), torch.tensor(noun_lg),
            torch.tensor(act_lg), torch.tensor(aud_lg),
            torch.tensor(v_ids), torch.tensor(a_ids),
            torch.tensor(v_lab), torch.tensor(a_lab),
            0.0, 0.0, 0.0, 0.0, 0.0, nv, na)

        acc.update(
            {"verb": verb_lg[None], "noun": noun_lg[None],
             "action": act_lg[None], "audio": aud_lg[None]},
            v_ids[None], a_ids[None],
            {"verb": v_lab[None, :, 0], "noun": v_lab[None, :, 1],
             "action": v_lab[None, :, 2], "class_id": a_lab[None]})

    best_acc1, is_best, stop = meter.update_epoch(0)
    stats = acc.summarize("epic")

    assert stats["action_top1"] == pytest.approx(meter.action_acc[0],
                                                 abs=1e-4)
    assert stats["verb_top1"] == pytest.approx(meter.verb_acc[0], abs=1e-4)
    assert stats["noun_top1"] == pytest.approx(meter.noun_acc[0], abs=1e-4)
    assert stats["verb_noun_top1"] == pytest.approx(
        meter.mt_action_acc[0], abs=1e-4)
    assert stats["audio_top1"] == pytest.approx(meter.aud_acc[0], abs=1e-4)
