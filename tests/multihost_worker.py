"""Worker for the 2-process multi-host CPU test (``test_multihost.py``).

Runs one epoch of recognition training + validation on synthetic data and
dumps the final stats JSON (process 0 only). Invoked as:

    python tests/multihost_worker.py NPROC PID PORT OUTFILE
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

    from tim_tpu import config as C
    from tim_tpu.data import synthetic
    from tim_tpu.data.dataset import FeatureStore, RecognitionDataset
    from tim_tpu.data.windows import (
        build_recognition_windows, normalize_actions)
    from tim_tpu.runner import RecognitionRunner

    b = synthetic.synthetic_epic(
        seed=7, num_videos=2, video_seconds=45.0, per_video=8,
        visual_dim=24, audio_dim=16, visual_classes=(5, 6, 4),
        audio_classes=3)
    v_norm = normalize_actions(b["v_actions"], "visual")
    a_norm = normalize_actions(b["a_actions"], "audio")
    ws = build_recognition_windows(
        v_norm, a_norm, b["video_info"], b["v_feat_times"],
        num_feats=6, feat_stride=2, feat_gap=0.2)
    v_store = FeatureStore(b["v_feats"], b["v_feat_times"])
    a_store = FeatureStore(b["a_feats"], b["a_feat_times"])
    train_ds = RecognitionDataset(ws, v_store, a_store,
                                  sample_augmentations=False)
    val_ds = RecognitionDataset(ws, v_store, a_store,
                                sample_augmentations=False)

    # dropout off: its mask is positional, and the 2-process run permutes
    # rows within each global batch — with dropout the runs are only
    # distributionally (not numerically) equivalent, same as DDP ranks
    cfg = C.ModelConfig(
        visual_classes=(5, 6, 4), audio_classes=3,
        visual_input_dim=24, audio_input_dim=16, d_model=16, nhead=2,
        num_layers=1, num_feats=6, compute_dtype="float32",
        enc_dropout=0.0, feat_dropout=0.0, seq_dropout=0.0)
    tcfg = C.TrainConfig(batch_size=8, epochs=1, warmup_epochs=0,
                         lr=1e-3, mixup_alpha=0.0, lambda_drloc=0.0,
                         seed=0)
    runner = RecognitionRunner(cfg, tcfg, train_ds, val_ds, print_freq=100,
                               use_device_bank=use_bank)
    runner.init_state()
    pre = runner.validate()
    runner.train_epoch(0, jax.random.PRNGKey(0))
    post = runner.validate()
    out = {f"pre_{k}": float(v) for k, v in pre.items()}
    out.update({f"post_{k}": float(v) for k, v in post.items()})

    if use_bank:
        # real multi-process orbax round-trip: every process participates
        # in the save; restore-to-sharding must reproduce the live params
        # exactly (compared on device — global arrays are not host-
        # fetchable with process_count > 1)
        import jax.numpy as jnp

        from tim_tpu.parallel import param_shardings
        from tim_tpu.train import checkpoint as ckpt

        ckdir = f"{outfile}.ckpt{nproc}"
        ckpt.save_checkpoint_orbax(ckdir, runner.state, epoch=1)
        sh = param_shardings(runner.state.params, runner.mesh)
        restored = ckpt.load_checkpoint_orbax(
            ckdir, params_shardings=sh)["params"]

        def tree_max_diff(a, b):
            la = jax.tree_util.tree_leaves(a)
            lb = jax.tree_util.tree_leaves(b)
            assert len(la) == len(lb)
            return sum(jnp.max(jnp.abs(x.astype(jnp.float32)
                                       - y.astype(jnp.float32)))
                       for x, y in zip(la, lb))

        out["orbax_param_diff"] = float(
            jax.jit(tree_max_diff)(restored, runner.state.params))

        # data-parallel params are fully REPLICATED, hence host-fetchable
        # even when the mesh spans processes: the save routing must keep
        # the msgpack path (master-only write, best copies, --resume) and
        # the round-trip must be exact on np.asarray'd replicated leaves
        out["msgpack_routed"] = float(ckpt.fully_addressable(runner.state))
        if pid == 0:
            mdir = f"{outfile}.mckpt{nproc}"
            ckpt.save_checkpoint(mdir, runner.state, epoch=1,
                                 is_best="loss")
            payload = ckpt.load_checkpoint(mdir)
            rs = ckpt.restore_train_state(runner.state, payload)
            import numpy as np
            out["msgpack_param_diff"] = max(
                float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
                for x, y in zip(jax.tree_util.tree_leaves(rs.params),
                                jax.tree_util.tree_leaves(
                                    runner.state.params)))
    out["process_count"] = jax.process_count()
    out["device_count"] = jax.device_count()
    if jax.process_index() == 0:
        with open(outfile, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
