"""Worker for the 2-process multi-host DETECTION test
(``test_multihost.py``): one epoch of detection training + loss
validation + a dense top-k extraction on synthetic data; dumps stats +
a dense-dump digest (process 0 only). Invoked as:

    python tests/multihost_det_worker.py NPROC PID PORT OUTFILE
"""

import json
import sys


def main():
    nproc, pid, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    use_bank = len(sys.argv) > 5 and sys.argv[5] == "bank"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_default_matmul_precision", "highest")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc, process_id=pid)

    import numpy as np

    from tim_tpu import config as C
    from tim_tpu.data import synthetic
    from tim_tpu.data.dataset import DetectionDataset, FeatureStore
    from tim_tpu.data.windows import (
        build_detection_windows, normalize_actions)
    from tim_tpu.runner import DetectionRunner

    b = synthetic.synthetic_epic(
        seed=7, num_videos=2, video_seconds=45.0, per_video=8,
        visual_dim=24, audio_dim=16, visual_classes=(5, 6, 4),
        audio_classes=3)
    num_feats = 8
    window_size = num_feats * 2 * 0.2
    v_norm = normalize_actions(b["v_actions"], "visual",
                               detection=True, window_size=window_size)
    a_norm = normalize_actions(b["a_actions"], "audio",
                               detection=True, window_size=window_size)
    ws = build_detection_windows(
        v_norm, a_norm, b["video_info"], b["v_feat_times"],
        num_feats=num_feats, feat_stride=2, feat_gap=0.2)
    v_store = FeatureStore(b["v_feats"], b["v_feat_times"])
    a_store = FeatureStore(b["a_feats"], b["a_feat_times"])
    train_ds = DetectionDataset(ws, v_store, a_store,
                                include_verb_noun=False,
                                dataset_name="synthetic",
                                sample_augmentations=False)
    val_ds = DetectionDataset(ws, v_store, a_store,
                              include_verb_noun=False,
                              dataset_name="synthetic",
                              sample_augmentations=False)

    # dropout off for numeric 1- vs 2-process parity (see the
    # recognition worker's note); train-query sampling uses the shared
    # jit PRNG so it is identical across layouts
    cfg = C.DetectionConfig(
        visual_classes=(4,), audio_classes=3,
        visual_input_dim=24, audio_input_dim=16, d_model=16, nhead=2,
        num_layers=1, num_feats=num_feats, compute_dtype="float32",
        train_query_size=0.1, inference_query_size=0.2,
        enc_dropout=0.0, feat_dropout=0.0, seq_dropout=0.0)
    tcfg = C.TrainConfig(batch_size=8, epochs=1, warmup_epochs=0,
                         lr=1e-3, lambda_drloc=0.0, normaliser_init=10.0,
                         seed=0)
    runner = DetectionRunner(cfg, tcfg, train_ds, val_ds, print_freq=100,
                             use_device_bank=use_bank)
    runner.init_state()
    pre = runner.validate()
    runner.train_epoch(0, jax.random.PRNGKey(0))
    post = runner.validate()

    # dense top-k extraction: every process contributes its shard; the
    # runner allgathers + dedups, so the assembled dump must be
    # layout-independent
    dump = runner.extract_dense_predictions(top_k=2)
    # rows come back in deterministic window order regardless of the
    # host sharding, so direct digests must match across layouts
    digest = {
        "n_rows": int(len(dump["video_ids"])),
        "proposals_sum": float(dump["v_proposals"].sum()),
        "action_topk_mean": float(dump["action_topk_values"].mean()),
        "action_topk_digest": [
            float(x) for x in
            dump["action_topk_values"][:5].reshape(-1)],
    }

    out = {f"pre_{k}": float(v) for k, v in pre.items()}
    out.update({f"post_{k}": float(v) for k, v in post.items()})
    out.update(digest)
    out["process_count"] = jax.process_count()
    out["device_count"] = jax.device_count()
    if jax.process_index() == 0:
        with open(outfile, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
