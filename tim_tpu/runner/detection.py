"""Detection training/validation/extraction orchestration
(role of ``detection/scripts/{train,test,extract_feats}.py`` plus the
eval_detection chain, as one class)."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tim_tpu.config import DetectionConfig, MeshConfig, TrainConfig
from tim_tpu.data.dataset import DetectionDataset, batch_iterator
from tim_tpu.evals.format_predictions import evaluate_detections
from tim_tpu.evals.meters import LossAverager
from tim_tpu.models import TimDetection
from tim_tpu.models.queries import generate_query_pyramid
from tim_tpu.parallel import make_mesh, shard_batch, shard_train_state
from tim_tpu.parallel.mesh import (
    host_local_rows, prefetch_to_device, put_ids, replicate)
from tim_tpu.parallel.multihost import allgather_host_arrays
from tim_tpu.train import checkpoint as ckpt
from tim_tpu.train import detection as steps
from tim_tpu.train.optim import make_optimizer
from tim_tpu.train.state import create_train_state, training_rng
from tim_tpu.utils.logging import log_json_stats, setup_logging


class DetectionRunner:
    def __init__(
        self,
        cfg: DetectionConfig,
        tcfg: TrainConfig,
        train_ds: Optional[DetectionDataset],
        val_ds: Optional[DetectionDataset],
        *,
        mesh_cfg: MeshConfig = MeshConfig(),
        output_dir: Optional[str] = None,
        print_freq: int = 100,
        use_device_bank: bool = False,
        experiment_logger=None,
    ):
        self.cfg = cfg
        self.tcfg = tcfg
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.output_dir = output_dir
        self.print_freq = print_freq
        self.logger = setup_logging(output_dir)
        self.exp_logger = experiment_logger

        self.model = TimDetection(cfg)
        self.mesh = make_mesh(mesh_cfg.data, mesh_cfg.model)
        if cfg.sequence_parallel:
            # token-axis sharding constraints resolve axis names against
            # the ambient mesh; jax.set_mesh is process-global, so two
            # runners with different SP meshes cannot coexist
            from jax.sharding import get_abstract_mesh
            cur = get_abstract_mesh()
            if not cur.empty and cur != self.mesh.abstract_mesh:
                raise RuntimeError(
                    "sequence_parallel needs the ambient mesh; a "
                    f"different mesh {cur} is already set in this "
                    "process (one SP mesh per process)")
            jax.set_mesh(self.mesh)
        self.num_queries = generate_query_pyramid(
            cfg.inference_query_size).shape[0]

        steps_per_epoch = max(
            len(train_ds) // tcfg.batch_size, 1) if train_ds else 1
        self.tx = make_optimizer(
            tcfg.lr, tcfg.weight_decay,
            total_steps=steps_per_epoch * tcfg.epochs,
            warmup_steps=steps_per_epoch * tcfg.warmup_epochs,
            min_lr=tcfg.min_lr, clip_norm=tcfg.clip_norm)

        # donate the train state: params/optimizer buffers update in place
        self._train_step = jax.jit(steps.make_train_step(
            self.model, cfg, tcfg), donate_argnums=(0,))
        self._val_step = jax.jit(steps.make_val_step(self.model, cfg, tcfg))
        self._infer_step = jax.jit(steps.make_inference_step(
            self.model, cfg))

        # Device-bank path: whole split in HBM, batch = window ids.
        self._bank_step = None
        self._bank_val = None
        self._bank_infer = None
        if use_device_bank and train_ds is not None:
            from tim_tpu.data.device_bank import (
                DetectionWindowTables, DeviceFeatureBank)
            v_bank = (DeviceFeatureBank(train_ds.visual.feats)
                      if train_ds.visual is not None else None)
            a_bank = (DeviceFeatureBank(train_ds.audio.feats)
                      if train_ds.audio is not None else None)
            self._tables = DetectionWindowTables(
                train_ds.windows, v_bank, a_bank,
                train_ds.visual.feat_times
                if train_ds.visual is not None else None,
                train_ds.audio.feat_times
                if train_ds.audio is not None else None,
                verb_only=train_ds.verb_only,
                include_verb_noun=train_ds.include_verb_noun,
                dataset_name=train_ds.dataset_name)
            bank_step = steps.make_bank_train_step(
                self.model, cfg, tcfg, v_bank, a_bank)
            tables = self._tables

            def step_by_ids(state, window_ids, rng):
                return bank_step(state, tables.batch(window_ids), rng)

            self._bank_step = jax.jit(step_by_ids, donate_argnums=(0,))

        if use_device_bank and val_ds is not None:
            from tim_tpu.data.device_bank import (
                DetectionWindowTables, DeviceFeatureBank,
                gather_window_batch)
            vv_bank = (DeviceFeatureBank(val_ds.visual.feats)
                       if val_ds.visual is not None else None)
            va_bank = (DeviceFeatureBank(val_ds.audio.feats)
                       if val_ds.audio is not None else None)
            self._val_tables = DetectionWindowTables(
                val_ds.windows, vv_bank, va_bank,
                val_ds.visual.feat_times
                if val_ds.visual is not None else None,
                val_ds.audio.feat_times
                if val_ds.audio is not None else None,
                verb_only=val_ds.verb_only,
                include_verb_noun=val_ds.include_verb_noun,
                dataset_name=val_ds.dataset_name)
            vtables = self._val_tables
            base_val = self._val_step
            base_infer = self._infer_step

            def _with_feats(ids):
                batch = vtables.batch(ids)
                v, a = gather_window_batch(
                    vv_bank, va_bank, batch.pop("feat_indices"), rng=None)
                if v is not None:
                    batch["v_feats"] = v
                if a is not None:
                    batch["a_feats"] = a
                return batch

            self._bank_val = jax.jit(
                lambda state, ids: base_val(state, _with_feats(ids)))
            self._bank_with_feats = _with_feats
            # replicated outputs: extraction fetches per-chunk arrays with
            # np.asarray, which multi-host requires to be fully replicated
            # (identity on a single device)
            self._bank_infer = jax.jit(
                lambda params, ids: base_infer(params, _with_feats(ids)),
                out_shardings=replicate(self.mesh))

            # whole-split validation as ONE scan: losses sum on device,
            # single fetch (each per-batch fetch costs ~30ms RTT here).
            # Metric keys come from the val step itself via abstract eval
            # so the scan can never drift from the host path.
            loss_keys: list = []

            def _discover_loss_keys(state):
                ids = jnp.zeros((tcfg.batch_size,), jnp.int32)
                shapes = jax.eval_shape(
                    lambda st: base_val(st, _with_feats(ids)), state)
                loss_keys[:] = sorted(
                    k for k in shapes if k.startswith("loss"))

            self._discover_loss_keys = _discover_loss_keys
            self._bank_loss_keys = loss_keys

            def bank_val_scan(state, ids_mat):
                def body(sums, ids):
                    metrics = base_val(state, _with_feats(ids))
                    return ({k: sums[k] + metrics[k].astype(jnp.float32)
                             for k in sums}, None)
                sums0 = {k: jnp.float32(0.0) for k in loss_keys}
                sums, _ = jax.lax.scan(body, sums0, ids_mat)
                return sums

            self._bank_val_scan = jax.jit(bank_val_scan)

        self.state = None
        self.best_loss = float("inf")
        self.last_best_epoch = 0

        # Multi-host: each process loads 1/Nth of every global batch (the
        # reference's ``--num_shards/--shard_id`` + DistributedSampler).
        nproc = jax.process_count()
        assert tcfg.batch_size % nproc == 0, (
            f"batch_size {tcfg.batch_size} not divisible by "
            f"{nproc} processes")
        self._local_bs = tcfg.batch_size // nproc
        self._shard_args = dict(num_shards=nproc,
                                shard_index=jax.process_index())
        # Device-bank paths work with process_count > 1 too: banks and
        # tables are identical closure constants on every process, ids go
        # through ``put_ids`` (one global SPMD program per step/scan), and
        # the fetched outputs are replicated — no per-process state.

    # ------------------------------------------------------------------
    def init_state(self, rng: Optional[jax.Array] = None,
                   pretrained: Optional[str] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.tcfg.seed)
        ds = self.train_ds or self.val_ds
        example = ds[0]
        nf = self.cfg.num_context
        nq = self.num_queries
        n_mod = (2 if self.cfg.data_modality == "audio_visual" else 1)
        t_dummy = jnp.zeros((1, nf + n_mod * nq, 2))
        variables = self.model.init(
            {"params": rng, "dropout": rng},
            jnp.asarray(example["v_feats"])[None]
            if "v_feats" in example else None,
            jnp.asarray(example["a_feats"])[None]
            if "a_feats" in example else None,
            t_dummy,
            nq if "visual" in self.cfg.data_modality else 0,
            nq if "audio" in self.cfg.data_modality else 0,
            deterministic=True)
        params = variables["params"]
        if pretrained:
            payload = ckpt.load_checkpoint(pretrained)
            from flax import serialization
            params = ckpt.shape_matched_merge(
                serialization.to_state_dict(params), payload["params"])
        state = create_train_state(params, self.tx,
                                   normaliser=self.tcfg.normaliser_init)
        self.state = shard_train_state(state, self.mesh)
        return self.state

    def resume(self, path: str) -> int:
        """Full training resume (params + optimizer + step + normaliser),
        returns the epoch to continue from."""
        if self.state is None:
            self.init_state()
        payload = ckpt.load_checkpoint(path)
        self.state = shard_train_state(
            ckpt.restore_train_state(self.state, payload), self.mesh)
        return int(payload.get("epoch", 0))

    def load_torch_checkpoint(self, state_dict):
        from tim_tpu.convert import detection_params_from_torch
        variables = detection_params_from_torch(
            state_dict, d_model=self.cfg.d_model,
            num_layers=self.cfg.num_layers)
        if self.state is None:
            self.init_state()
        state = self.state.replace(params=variables["params"])
        self.state = shard_train_state(state, self.mesh)
        return self.state

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int, rng: jax.Array) -> Dict[str, float]:
        if self._bank_step is not None:
            return self._train_epoch_banked(epoch, rng)
        avg = LossAverager()
        epoch_rng = np.random.default_rng(self.tcfg.seed + epoch)
        def strip_pad(it):
            for b in it:
                b.pop("_pad", None)
                yield b

        for i, batch in enumerate(prefetch_to_device(
                strip_pad(batch_iterator(
                    self.train_ds, self._local_bs, shuffle=True,
                    rng=epoch_rng, **self._shard_args)), self.mesh)):
            self.state, metrics = self._train_step(self.state, batch, rng)
            if i % self.print_freq == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                avg.update(metrics)
                self.logger.info("epoch %d iter %d | loss %.4f | "
                                 "normaliser %.1f", epoch + 1, i,
                                 metrics["loss"], metrics["normaliser"])
        stats = avg.averages()
        log_json_stats(self.logger, {"split": "train", "epoch": epoch + 1,
                                     **stats})
        if self.exp_logger is not None:
            self.exp_logger.log({f"train/{k}": v for k, v in stats.items()})
        return stats

    def _train_epoch_banked(self, epoch: int,
                            rng) -> Dict[str, float]:
        avg = LossAverager()
        epoch_rng = np.random.default_rng(self.tcfg.seed + epoch)
        # seeded identically on every process, so multi-host runs stay in
        # SPMD lockstep: same ids, same step count, same global batches
        order = epoch_rng.permutation(self._tables.num_windows)
        bs = self.tcfg.batch_size
        for i in range(0, len(order) - bs + 1, bs):
            ids = put_ids(order[i:i + bs].astype(np.int32), self.mesh)
            self.state, metrics = self._bank_step(self.state, ids, rng)
            if (i // bs) % self.print_freq == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                avg.update(metrics)
                self.logger.info("epoch %d iter %d | loss %.4f (banked)",
                                 epoch + 1, i // bs, metrics["loss"])
        stats = avg.averages()
        log_json_stats(self.logger, {"split": "train", "epoch": epoch + 1,
                                     **stats})
        if self.exp_logger is not None:
            self.exp_logger.log({f"train/{k}": v for k, v in stats.items()})
        return stats

    # ------------------------------------------------------------------
    def validate(self, epoch: int = 0) -> Dict[str, float]:
        """Validation tracks detection losses on GT windows (the reference
        selects the best model by min val loss, ``detection meters.py:
        425-444``). Uses the train step's loss math without updating."""
        avg = LossAverager()
        self.val_ds.sample_augmentations = False
        if self._bank_val is not None:
            bs = self.tcfg.batch_size
            n = self._val_tables.num_windows
            n_chunks = n // bs           # same drop-last as before
            # multi-host: every process runs this SAME global scan (SPMD
            # lockstep) with the chunk batch dim sharded over the data
            # axis, so the scalar losses are globally consistent — the
            # min-val-loss best-checkpoint and early-stop decisions in
            # fit() stay identical on every process
            if n_chunks > 0:
                if not self._bank_loss_keys:
                    self._discover_loss_keys(self.state)
                ids_mat = put_ids(
                    (np.arange(n_chunks)[:, None] * bs
                     + np.arange(bs)[None]).astype(np.int32),
                    self.mesh, batch_axis=1)
                sums = self._bank_val_scan(self.state, ids_mat)
                avg.update({k: float(v) / n_chunks
                            for k, v in sums.items()})
            return self._log_val(avg, epoch)
        for batch in batch_iterator(self.val_ds, self._local_bs,
                                    shuffle=False, **self._shard_args):
            batch.pop("_pad", None)
            batch = shard_batch(batch, self.mesh)
            metrics = self._val_step(self.state, batch)
            avg.update({k: float(v) for k, v in metrics.items()
                        if k.startswith("loss")})
        return self._log_val(avg, epoch)

    def _log_val(self, avg: LossAverager, epoch: int) -> Dict[str, float]:
        stats = avg.averages()
        log_json_stats(self.logger, {"split": "val", "epoch": epoch + 1,
                                     **stats})
        if self.exp_logger is not None:
            self.exp_logger.log({f"val/{k}": v for k, v in stats.items()})
        return stats

    # ------------------------------------------------------------------
    def fit(self, epochs: Optional[int] = None,
            start_epoch: int = 0,
            eval_mAP_gt=None, eval_mAP_every: int = 5,
            **map_kwargs) -> Dict[str, float]:
        """Train + validate per epoch. ``eval_mAP_gt`` (evaluator GT
        columns) enables periodic in-training mAP over the val split —
        the reference selects models by val loss only and never sees mAP
        until the offline eval chain; here it is one call away
        (``evaluate_mAP``), so surface it during training."""
        epochs = epochs or self.tcfg.epochs
        rng = training_rng(self.tcfg.seed, self.tcfg.rng_impl)
        if self.state is None:
            self.init_state(rng)
        final: Dict[str, float] = {}
        for epoch in range(start_epoch, epochs):
            self.train_epoch(epoch, rng)
            stats = self.validate(epoch)
            if (eval_mAP_gt is not None and eval_mAP_every > 0
                    and (epoch + 1) % eval_mAP_every == 0):
                _, avg, _ = self.evaluate_mAP(eval_mAP_gt, **map_kwargs)
                stats["val_avg_mAP"] = float(avg)
                log_json_stats(self.logger, {
                    "split": "val_mAP", "epoch": epoch + 1,
                    "avg_mAP": float(avg)})
            final = stats
            is_best = "none"
            if stats.get("loss", float("inf")) < self.best_loss:
                self.best_loss = stats["loss"]
                self.last_best_epoch = epoch
                is_best = "loss"
            if self.output_dir:
                extra = {"val_stats": {k: float(v)
                                       for k, v in stats.items()}}
                if not ckpt.fully_addressable(self.state):
                    # cross-host model-parallel shards: orbax writes each
                    # host's shards; every process participates
                    ckpt.save_checkpoint_orbax(
                        self.output_dir, self.state, epoch=epoch + 1,
                        extra=extra)
                elif jax.process_index() == 0:
                    # master-only write: concurrent multi-host writers
                    # would tear the shared checkpoint file
                    ckpt.save_checkpoint(
                        self.output_dir, self.state, epoch=epoch + 1,
                        extra=extra, is_best=is_best)
            if (self.tcfg.early_stop_period > 0 and
                    epoch - self.last_best_epoch >
                    self.tcfg.early_stop_period):
                self.logger.info("early stop at epoch %d", epoch + 1)
                break
        return final

    # ------------------------------------------------------------------
    def extract_dense_predictions(self, dataset=None, top_k=None):
        """Dense per-window proposal dump over *all* windows
        (``detection/scripts/extract_feats.py:68-139``). Returns
        column arrays ready for ``evals.format_predictions``.

        ``top_k``: ship only the k best classes per query
        (``<head>_topk_values`` / ``<head>_topk_classes`` columns) —
        ~C/k x less device->host transfer; identical eval results
        whenever every above-threshold class fits in k
        (``threshold_predictions_topk`` warns otherwise)."""
        ds = dataset or self.val_ds
        ds.sample_augmentations = False
        host_infer, bank_infer = self._infer_step, self._bank_infer
        if top_k is not None:
            if not hasattr(self, "_topk_steps"):
                self._topk_steps = {}
            if top_k not in self._topk_steps:
                base = steps.make_inference_step(self.model, self.cfg,
                                                 top_k)
                bank = None
                if self._bank_infer is not None:
                    wf = self._bank_with_feats
                    bank = jax.jit(lambda p, ids: base(p, wf(ids)),
                                   out_shardings=replicate(self.mesh))
                self._topk_steps[top_k] = (jax.jit(base), bank)
            host_infer, bank_infer = self._topk_steps[top_k]
        win_idx, proposals, queries = [], [], []
        scores: Dict[str, list] = {}

        windows = ds.windows.windows

        head_names = {"v": "action", "verb": "verb", "noun": "noun",
                      "a": "audio"}

        def collect(out, idxs, take):
            win_idx.append(np.asarray(idxs[:take]))
            queries.append(out["queries"][:take])
            if "v_proposals" in out:
                proposals.append(out["v_proposals"][:take])
                if "v_scores" in out:
                    scores.setdefault("action", []).append(
                        out["v_scores"][:take])
                if "verb_scores" in out:
                    scores.setdefault("verb", []).append(
                        out["verb_scores"][:take])
                    scores.setdefault("noun", []).append(
                        out["noun_scores"][:take])
            if "a_proposals" in out:
                if "a_scores" in out:
                    scores.setdefault("audio", []).append(
                        out["a_scores"][:take])
                scores.setdefault("a_proposals", []).append(
                    out["a_proposals"][:take])
            for key, val in out.items():
                if "_topk_" in key:
                    base, suffix = key.split("_topk_")
                    scores.setdefault(
                        f"{head_names[base]}_topk_{suffix}", []).append(
                            val[:take])

        if bank_infer is not None and dataset is None:
            # HBM-resident path: batches are just window-id ranges.
            # Multi-host: every process runs the same global chunks (SPMD
            # lockstep, batch dim data-sharded, replicated outputs); the
            # allgather + win_idx unique below dedups the per-host copies
            bs = self.tcfg.batch_size
            n = self._val_tables.num_windows
            for i in range(0, n, bs):
                ids = np.arange(i, min(i + bs, n))
                pad = bs - len(ids)
                ids_p = np.concatenate([ids, np.full(pad, ids[-1])]) \
                    if pad else ids
                out = bank_infer(self.state.params,
                                 put_ids(ids_p.astype(np.int32),
                                         self.mesh))
                out = {k: np.asarray(v) for k, v in out.items()}
                collect(out, ids_p, len(ids))
        else:
            for batch in batch_iterator(ds, self._local_bs,
                                        shuffle=False, drop_last=False,
                                        with_indices=True,
                                        **self._shard_args):
                pad = batch.pop("_pad", 0)
                idxs = batch.pop("_indices")
                take = self._local_bs - pad
                out = host_infer(self.state.params, shard_batch(
                    batch, self.mesh))
                out = {k: host_local_rows(v) for k, v in out.items()}
                collect(out, idxs, take)

        # multi-host: concatenate every host's shard; then drop the
        # wrap-around duplicates the equal-shard padding introduces
        win_idx = allgather_host_arrays(
            np.concatenate(win_idx).astype(np.int64))
        queries = allgather_host_arrays(np.concatenate(queries))
        # np.unique returns ascending window ids with their first
        # occurrence; keeping THAT order (not np.sort(first), which is
        # concatenation order) makes the dump row order independent of
        # how windows were sharded across hosts
        _, keep = np.unique(win_idx, return_index=True)
        win_idx = win_idx[keep]

        nq = self.num_queries
        video_ids = np.asarray([windows[int(j)].video_id for j in win_idx],
                               object)
        result = {
            "video_ids": np.repeat(video_ids, nq),
            "queries": queries[keep].reshape(-1, 2),
        }
        if proposals:
            result["v_proposals"] = allgather_host_arrays(
                np.concatenate(proposals))[keep].reshape(-1, 2)
        for key, chunks in scores.items():
            arr = allgather_host_arrays(np.concatenate(chunks))[keep]
            result[key] = arr.reshape(-1, arr.shape[-1])
        return result

    def evaluate_mAP(self, gt_columns, dataset=None, *, task="action",
                     score_key="action", proposals_key="v_proposals",
                     top_k=None, **eval_kwargs):
        dump = self.extract_dense_predictions(dataset, top_k=top_k)
        sc = (dump[score_key] if top_k is None else
              (dump[f"{score_key}_topk_values"],
               dump[f"{score_key}_topk_classes"]))
        if top_k is not None:
            # match the head the scores came from: verb/noun heads have
            # their own class counts when include_verb_noun is on
            vc = self.cfg.visual_classes
            head_sizes = {
                "audio": self.cfg.audio_classes,
                "verb": vc[0],
                "noun": vc[1] if len(vc) == 3 else vc[-1],
            }
            eval_kwargs.setdefault(
                "topk_num_classes", head_sizes.get(score_key, vc[-1]))
        return evaluate_detections(
            dump["video_ids"], dump[proposals_key], sc,
            gt_columns, task=task, **eval_kwargs)
