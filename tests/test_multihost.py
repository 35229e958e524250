"""Real 2-process multi-host run on CPU (gloo collectives): training +
window-vote validation must match the single-process run. Exercises
``jax.distributed.initialize``, per-process dataset sharding,
``make_array_from_process_local_data`` batch assembly, and the
cross-process metric reduction — the paths the reference covers with
``--num_shards`` + NCCL (``recognition/.../utils/distributed.py``)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")
DET_WORKER = os.path.join(ROOT, "tests", "multihost_det_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(nproc: int, tmp_path, worker=WORKER, mode="host") -> dict:
    out = tmp_path / f"stats_{os.path.basename(worker)}_{nproc}_{mode}.json"
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=ROOT)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(nproc), str(pid), str(port),
             str(out), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(nproc)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=1500)
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"
    with open(out) as f:
        return json.load(f)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["host", "bank"])
def test_two_process_training_matches_single(tmp_path, mode):
    """``bank`` runs the device-bank paths (banked train epoch +
    on-device vote-accumulation scan) as ONE global SPMD program per
    step on every process — ids data-sharded via ``put_ids``, replicated
    outputs — and must be exactly layout-independent. It also does a
    REAL multi-process orbax save + restore-to-sharding round-trip."""
    single = _run(1, tmp_path, mode=mode)
    double = _run(2, tmp_path, mode=mode)

    if mode == "bank":
        assert single["orbax_param_diff"] == 0.0
        assert double["orbax_param_diff"] == 0.0
        # replicated (data-parallel) states stay on the msgpack save
        # path even multi-host, and round-trip exactly
        assert double["msgpack_routed"] == 1.0
        assert double["msgpack_param_diff"] == 0.0

    assert double["process_count"] == 2
    assert double["device_count"] == 4
    keys = sorted(k for k in single
                  if k not in ("process_count", "device_count"))
    assert keys == sorted(k for k in double
                          if k not in ("process_count", "device_count"))
    for k in keys:
        if "top" in k:
            # window-vote accuracies must be EXACT: same logits voted into
            # the same fp64 accumulators, merged across hosts
            np.testing.assert_allclose(
                double[k], single[k], atol=1e-6,
                err_msg=f"accuracy {k} diverged 1- vs 2-process")
        else:
            # per-batch loss averages differ only through the padded
            # duplicate rows each layout appends (the reference's
            # DistributedSampler shares the quirk)
            np.testing.assert_allclose(
                double[k], single[k], rtol=5e-3,
                err_msg=f"loss {k} diverged 1- vs 2-process")


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["host", "bank"])
def test_two_process_detection_matches_single(tmp_path, mode):
    """Detection: 2-process training losses and the assembled dense
    top-k dump must match the single-process run (the dump is
    allgathered + deduped + window-ordered across hosts). ``bank``
    exercises the HBM-resident train/val-scan/extract paths under
    ``process_count == 2`` (global SPMD chunks, data-sharded ids)."""
    single = _run(1, tmp_path, worker=DET_WORKER, mode=mode)
    double = _run(2, tmp_path, worker=DET_WORKER, mode=mode)

    assert double["process_count"] == 2
    assert double["device_count"] == 4
    assert double["n_rows"] == single["n_rows"]
    np.testing.assert_allclose(
        double["action_topk_digest"], single["action_topk_digest"],
        atol=1e-5, err_msg="dense top-k dump diverged 1- vs 2-process")
    np.testing.assert_allclose(double["proposals_sum"],
                               single["proposals_sum"], rtol=1e-5)
    np.testing.assert_allclose(double["action_topk_mean"],
                               single["action_topk_mean"], rtol=1e-5)
    for k in sorted(single):
        if k.startswith(("pre_loss", "post_loss")):
            np.testing.assert_allclose(
                double[k], single[k], rtol=5e-3,
                err_msg=f"{k} diverged 1- vs 2-process")
