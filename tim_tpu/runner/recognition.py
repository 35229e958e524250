"""Recognition training/validation/extraction orchestration.

High-level driver tying together data, jit steps, sharding, meters, and
checkpoints — the role of ``recognition/scripts/{train,test,
extract_feats}.py`` — as one class instead of three CLI programs.
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tim_tpu.config import MeshConfig, ModelConfig, TrainConfig
from tim_tpu.data.dataset import RecognitionDataset, batch_iterator
from tim_tpu.evals.meters import LossAverager, WindowVoteAccumulator
from tim_tpu.models import TimRecognition
from tim_tpu.parallel import make_mesh, shard_batch, shard_train_state
from tim_tpu.parallel.mesh import (
    host_local_rows, prefetch_to_device, put_ids, replicate)
from tim_tpu.train import checkpoint as ckpt
from tim_tpu.train import recognition as steps
from tim_tpu.train.optim import make_optimizer
from tim_tpu.train.state import create_train_state, training_rng
from tim_tpu.utils.logging import PhaseTimer, log_json_stats, setup_logging


def _head_spec(cfg: ModelConfig) -> Dict[str, int]:
    heads = {}
    if "visual" in cfg.data_modality:
        if cfg.include_verb_noun:
            heads["verb"] = cfg.visual_classes[0]
            heads["noun"] = cfg.visual_classes[1]
        heads["action"] = cfg.visual_classes[-1]
    if "audio" in cfg.data_modality:
        heads["audio"] = cfg.audio_classes
    return heads


class RecognitionRunner:
    def __init__(
        self,
        cfg: ModelConfig,
        tcfg: TrainConfig,
        train_ds: Optional[RecognitionDataset],
        val_ds: Optional[RecognitionDataset],
        *,
        mesh_cfg: MeshConfig = MeshConfig(),
        output_dir: Optional[str] = None,
        dataset_name: str = "epic",
        print_freq: int = 100,
        use_device_bank: bool = False,
        experiment_logger=None,
    ):
        self.cfg = cfg
        self.tcfg = tcfg
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.output_dir = output_dir
        self.dataset_name = dataset_name
        self.print_freq = print_freq
        self.logger = setup_logging(output_dir)
        self.exp_logger = experiment_logger

        ws = (train_ds or val_ds).windows
        self.nv = ws.max_visual_actions
        self.na = ws.max_audio_actions

        self.model = TimRecognition(cfg)
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
        steps_per_epoch = max(
            len(train_ds) // tcfg.batch_size, 1) if train_ds else 1
        self.tx = make_optimizer(
            tcfg.lr, tcfg.weight_decay,
            total_steps=steps_per_epoch * tcfg.epochs,
            warmup_steps=steps_per_epoch * tcfg.warmup_epochs,
            min_lr=tcfg.min_lr, clip_norm=tcfg.clip_norm)

        # donate the train state: params/optimizer buffers update in place
        # (compiler_options must sit on the top-level jit to reach the
        # remote compiler — CLAUDE.md; +10-12% measured on this step)
        train_opts = None
        if tcfg.xla_fusion_cost_model and jax.default_backend() != "cpu":
            train_opts = {
                "xla_tpu_enable_experimental_fusion_cost_model": "true"}
        self._train_step = jax.jit(steps.make_train_step(
            self.model, cfg, tcfg, self.nv, self.na), donate_argnums=(0,),
            compiler_options=train_opts)
        self._eval_step = jax.jit(steps.make_eval_step(
            self.model, cfg, tcfg, self.nv, self.na))

        # Device-bank training path: the whole split lives in HBM and a
        # batch is just window ids (tim_tpu/data/device_bank.py).
        self._bank_step = None
        if use_device_bank and train_ds is not None:
            from tim_tpu.data.device_bank import (
                DeviceFeatureBank, DeviceWindowTables)
            v_bank = (DeviceFeatureBank(train_ds.visual.feats)
                      if train_ds.visual is not None else None)
            a_bank = (DeviceFeatureBank(train_ds.audio.feats)
                      if train_ds.audio is not None else None)
            self._tables = DeviceWindowTables(
                train_ds.windows, v_bank, a_bank,
                train_ds.visual.feat_times
                if train_ds.visual is not None else None,
                train_ds.audio.feat_times
                if train_ds.audio is not None else None)
            bank_step = steps.make_bank_train_step(
                self.model, cfg, tcfg, self.nv, self.na, v_bank, a_bank)
            tables = self._tables

            def step_by_ids(state, window_ids, rng):
                return bank_step(state, tables.batch(window_ids), rng)

            # measured +8-9% on the bank step too (banktrain sweep mode)
            self._bank_step = jax.jit(step_by_ids, donate_argnums=(0,),
                                      compiler_options=train_opts)

        # Device-bank validation/extraction: eval batches assemble in HBM
        # AND window votes accumulate on device (lax.scan over id chunks,
        # scatter-add into [num_actions, C] tables) — one fetch at the
        # end instead of downloading [B, Nq, C] logits per batch, which
        # is what bounds the host loop through the relay.
        self._bank_accum = None
        if use_device_bank and val_ds is not None:
            from tim_tpu.data.dataset import pad_rows
            from tim_tpu.data.device_bank import (
                DeviceFeatureBank, DeviceWindowTables, gather_window_batch)
            ws_val = val_ds.windows
            assert (ws_val.max_visual_actions, ws_val.max_audio_actions) \
                == (self.nv, self.na), (
                "bank validation needs the val split's query maxima to "
                "match the eval step's static shapes")
            vv_bank = (DeviceFeatureBank(val_ds.visual.feats)
                       if val_ds.visual is not None else None)
            va_bank = (DeviceFeatureBank(val_ds.audio.feats)
                       if val_ds.audio is not None else None)
            self._val_tables = DeviceWindowTables(
                ws_val, vv_bank, va_bank,
                val_ds.visual.feat_times
                if val_ds.visual is not None else None,
                val_ds.audio.feat_times
                if val_ds.audio is not None else None)
            vtables = self._val_tables
            base_eval = self._eval_step
            # vote metadata indexed by window id (host + device copies)
            # gate on data_modality (which queries the model answers),
            # NOT on feature-store presence: a modality can be answered
            # from the other modality's features
            self._val_v_ids = (np.stack([
                pad_rows(w.v_action_ids, self.nv, -1, np.int64)
                for w in ws_val.windows])
                if "visual" in cfg.data_modality and self.nv > 0 else None)
            self._val_a_ids = (np.stack([
                pad_rows(w.a_action_ids, self.na, -1, np.int64)
                for w in ws_val.windows])
                if "audio" in cfg.data_modality and self.na > 0 else None)
            v_ids_dev = (jnp.asarray(self._val_v_ids, jnp.int32)
                         if self._val_v_ids is not None else None)
            a_ids_dev = (jnp.asarray(self._val_a_ids, jnp.int32)
                         if self._val_a_ids is not None else None)
            heads = _head_spec(cfg)
            num_actions = ws_val.num_actions
            # loss keys come from the eval step itself (abstract eval, no
            # compile) so the bank scan can never drift from the host path
            loss_keys: list = []

            def _with_feats_rec(params, ids):
                batch = vtables.batch(ids)
                v, a = gather_window_batch(
                    vv_bank, va_bank, batch.pop("feat_indices"), rng=None)
                if v is not None:
                    batch["v_feats"] = v
                if a is not None:
                    batch["a_feats"] = a
                return base_eval(params, batch)

            def _discover_loss_keys(params):
                ids = jnp.zeros((tcfg.batch_size,), jnp.int32)
                shapes = jax.eval_shape(_with_feats_rec, params, ids)
                loss_keys[:] = sorted(shapes[1].keys())

            self._discover_loss_keys = _discover_loss_keys
            self._bank_loss_keys = loss_keys

            def _safe_ids(ids_tab, row_valid, n_per):
                flat_ids = ids_tab.reshape(-1)
                ok = (flat_ids >= 0) & jnp.repeat(row_valid, n_per)
                return jnp.where(ok, flat_ids, 0), ok

            def accum_scan(params, ids_mat, valid_mat):
                def body(carry, inp):
                    sums, seen, loss_sum = carry
                    ids, valid = inp
                    logits, losses = _with_feats_rec(params, ids)
                    if v_ids_dev is not None and self.nv > 0:
                        safe, ok = _safe_ids(
                            jnp.take(v_ids_dev, ids, axis=0), valid,
                            self.nv)
                        for h in ("verb", "noun", "action"):
                            if h in sums and h in logits:
                                flat = logits[h].reshape(
                                    -1, logits[h].shape[-1]).astype(
                                        jnp.float32)
                                sums[h] = sums[h].at[safe].add(
                                    jnp.where(ok[:, None], flat, 0.0))
                        seen = seen.at[safe].add(ok.astype(jnp.float32))
                    if (a_ids_dev is not None and "audio" in sums
                            and self.na > 0):
                        safe, ok = _safe_ids(
                            jnp.take(a_ids_dev, ids, axis=0), valid,
                            self.na)
                        flat = logits["audio"].reshape(
                            -1, logits["audio"].shape[-1]).astype(
                                jnp.float32)
                        sums["audio"] = sums["audio"].at[safe].add(
                            jnp.where(ok[:, None], flat, 0.0))
                        seen = seen.at[safe].add(ok.astype(jnp.float32))
                    loss_sum = {k: loss_sum[k] + losses[k].astype(
                        jnp.float32) for k in loss_sum}
                    return (sums, seen, loss_sum), None

                sums0 = {h: jnp.zeros((num_actions, c), jnp.float32)
                         for h, c in heads.items()}
                seen0 = jnp.zeros((num_actions,), jnp.float32)
                loss0 = {k: jnp.float32(0.0) for k in loss_keys}
                (sums, seen, loss_sum), _ = jax.lax.scan(
                    body, (sums0, seen0, loss0), (ids_mat, valid_mat))
                return sums, seen, loss_sum

            # replicated outputs: the host fetches the vote tables with
            # plain np.asarray, which multi-host requires to be fully
            # replicated (identity on a single device)
            self._bank_accum = jax.jit(
                accum_scan, out_shardings=replicate(self.mesh))

        self.state = None
        self.best = {"visual": 0.0, "visual_mt": 0.0, "audio": 0.0,
                     "combined": 0.0}
        self.last_best_epoch = 0

        # Multi-host: each process loads 1/Nth of every global batch
        # (``--num_shards/--shard_id`` + DistributedSampler in the
        # reference, ``utils/parser.py:160-184``, ``loader.py:50``).
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
        # the vote/loss outputs are replicated — no per-process state.

    # ------------------------------------------------------------------
    def init_state(self, rng: Optional[jax.Array] = None,
                   pretrained: Optional[str] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.tcfg.seed)
        ds = self.train_ds or self.val_ds
        example = ds[0]
        batch = {k: jnp.asarray(v)[None] for k, v in example.items()}
        variables = self.model.init(
            {"params": rng, "dropout": rng}, batch.get("v_feats"),
            batch.get("a_feats"), batch["times"], self.nv, self.na,
            deterministic=True)
        params = variables["params"]
        if pretrained:
            payload = ckpt.load_checkpoint(pretrained)
            from flax import serialization
            params = ckpt.shape_matched_merge(
                serialization.to_state_dict(params), payload["params"])
        state = create_train_state(params, self.tx)
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
        """Load a released reference checkpoint (torch state_dict)."""
        from tim_tpu.convert import recognition_params_from_torch
        variables = recognition_params_from_torch(
            state_dict, d_model=self.cfg.d_model,
            num_layers=self.cfg.num_layers)
        if self.state is None:
            self.init_state()
        state = self.state.replace(params=variables["params"])
        self.state = shard_train_state(state, self.mesh)
        return self.state

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int, rng: jax.Array) -> Dict[str, float]:
        assert self.state is not None
        if self._bank_step is not None:
            return self._train_epoch_banked(epoch, rng)
        timer = PhaseTimer()
        avg = LossAverager()
        epoch_rng = np.random.default_rng(self.tcfg.seed + epoch)
        def strip_pad(it):
            for b in it:
                b.pop("_pad", None)
                yield b

        it = prefetch_to_device(
            strip_pad(batch_iterator(self.train_ds, self._local_bs,
                                     shuffle=True, rng=epoch_rng,
                                     **self._shard_args)),
            self.mesh)
        timer.iter_tic()
        for i, batch in enumerate(it):
            timer.data_toc()
            self.state, metrics = self._train_step(self.state, batch, rng)
            if i % self.print_freq == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                timer.net_toc()
                timer.iter_toc()
                avg.update(metrics)
                from tim_tpu.utils.memory import memory_summary
                self.logger.info(
                    "epoch %d iter %d | loss %.4f | iter %.3fs "
                    "(data %.3fs net %.3fs) | %s",
                    epoch + 1, i, metrics["loss"], timer.iter_time,
                    timer.data_time, timer.net_time, memory_summary())
            timer.iter_tic()
        stats = avg.averages()
        log_json_stats(self.logger, {"split": "train", "epoch": epoch + 1,
                                     **stats})
        if self.exp_logger is not None:
            self.exp_logger.log({f"train/{k}": v for k, v in stats.items()})
        return stats

    def _train_epoch_banked(self, epoch: int,
                            rng: jax.Array) -> Dict[str, float]:
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
    def _run_bank_accum(self, acc, avg=None):
        """One compiled scan over the whole val split: eval + on-device
        vote scatter-add; a single (sums, seen, loss) fetch at the end.
        The final partial chunk repeats its first window (like
        batch_iterator's pad) for loss parity, with those rows masked
        out of the votes."""
        if not self._bank_loss_keys:
            # fills the list accum_scan closes over, before first trace
            self._discover_loss_keys(self.state.params)
        tbl = self._val_tables
        n, bs = tbl.num_windows, self.tcfg.batch_size
        rows, valids = [], []
        for start in range(0, n, bs):
            chunk = np.arange(start, min(start + bs, n))
            take = len(chunk)
            if take < bs:
                chunk = np.concatenate([chunk, np.full(bs - take,
                                                       chunk[0])])
            ok = np.zeros(bs, bool)
            ok[:take] = True
            rows.append(chunk)
            valids.append(ok)
        # multi-host: every process runs this SAME global scan (SPMD
        # lockstep); the chunk batch dim is sharded over the data axis,
        # so the per-chunk compute splits across all devices of all
        # hosts and the replicated outputs are globally consistent —
        # validate() must NOT re-reduce them across processes
        sums, seen, loss_sum = self._bank_accum(
            self.state.params,
            put_ids(np.stack(rows).astype(np.int32), self.mesh,
                    batch_axis=1),
            put_ids(np.stack(valids), self.mesh, batch_axis=1))
        for h in acc.sums:
            acc.sums[h] += np.asarray(sums[h], np.float64)
        acc.seen += np.asarray(seen, np.float64)
        # labels, prefilled from the window tables (same last-write
        # semantics as per-batch update — labels are per-action constants)
        if self._val_v_ids is not None:
            vi = self._val_v_ids.reshape(-1)
            m = vi >= 0
            for col, key in enumerate(("verb", "noun", "action")):
                acc.v_labels[vi[m], col] = \
                    tbl.labels_host[key].reshape(-1)[m]
        if self._val_a_ids is not None and "audio" in acc.sums:
            ai = self._val_a_ids.reshape(-1)
            m = ai >= 0
            acc.a_labels[ai[m]] = \
                tbl.labels_host["class_id"].reshape(-1)[m]
        if avg is not None:
            n_chunks = len(rows)
            avg.update({k: float(v) / n_chunks
                        for k, v in loss_sum.items()})

    def _eval_batches(self, ds):
        """Yield (logits, losses, v_ids, a_ids, labels) per eval batch
        through the host iterator. Rows are truncated to the non-padded
        prefix so padded duplicates never vote twice."""
        ds.sample_augmentations = False
        for batch in batch_iterator(ds, self._local_bs, shuffle=False,
                                    drop_last=False, **self._shard_args):
            pad = batch.pop("_pad", 0)
            take = self._local_bs - pad
            dev_batch = shard_batch(
                {k: v for k, v in batch.items()
                 if k not in ("v_action_ids", "a_action_ids")}, self.mesh)
            logits, losses = self._eval_step(self.state.params, dev_batch)
            # each host votes with its own rows of the global batch
            yield ({k: host_local_rows(v)[:take] for k, v in logits.items()},
                   losses,
                   batch["v_action_ids"][:take]
                   if "v_action_ids" in batch else None,
                   batch["a_action_ids"][:take]
                   if "a_action_ids" in batch else None,
                   {k: batch[k][:take]
                    for k in ("verb", "noun", "action", "class_id")
                    if k in batch})

    def validate(self, epoch: int = 0) -> Dict[str, float]:
        assert self.state is not None
        acc = WindowVoteAccumulator(
            self.val_ds.windows.num_actions, _head_spec(self.cfg))
        avg = LossAverager()
        if self._bank_accum is not None:
            # one global SPMD scan: vote tables and losses come back
            # already replicated/global — re-reducing would double-count
            self._run_bank_accum(acc, avg)
        else:
            for logits, losses, v_ids, a_ids, labels in \
                    self._eval_batches(self.val_ds):
                acc.update(logits, v_ids, a_ids, labels)
                avg.update({k: float(v) for k, v in losses.items()})
            acc.reduce_across_processes()
        stats = acc.summarize(self.dataset_name)
        stats.update(avg.averages())
        log_json_stats(self.logger, {"split": "val", "epoch": epoch + 1,
                                     **stats})
        if self.exp_logger is not None:
            self.exp_logger.log({f"val/{k}": v for k, v in stats.items()})
        return stats

    def _best_tag(self, stats: Dict[str, float], epoch: int) -> str:
        tags = []
        if stats.get("action_top1", 0.0) > self.best["visual"]:
            self.best["visual"] = stats["action_top1"]
            self.last_best_epoch = epoch
            tags.append("visual")
        if stats.get("verb_noun_top1", 0.0) > self.best["visual_mt"]:
            self.best["visual_mt"] = stats["verb_noun_top1"]
            tags.append("mt")
        if stats.get("audio_top1", 0.0) > self.best["audio"]:
            self.best["audio"] = stats["audio_top1"]
            tags.append("audio")
        if stats.get("combined_top1", 0.0) > self.best["combined"]:
            self.best["combined"] = stats["combined_top1"]
            tags.append("combined")
        return "_".join(tags) if tags else "none"

    # ------------------------------------------------------------------
    def fit(self, epochs: Optional[int] = None,
            start_epoch: int = 0) -> Dict[str, float]:
        epochs = epochs or self.tcfg.epochs
        rng = training_rng(self.tcfg.seed, self.tcfg.rng_impl)
        if self.state is None:
            self.init_state(rng)
        final_stats: Dict[str, float] = {}
        for epoch in range(start_epoch, epochs):
            self.train_epoch(epoch, rng)
            stats = self.validate(epoch)
            final_stats = stats
            is_best = self._best_tag(stats, epoch)
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
        return final_stats

    # ------------------------------------------------------------------
    def extract_predictions(self, dataset=None, path: Optional[str] = None):
        """Window-ensembled softmax predictions per GT action — the
        recognition feature dump (``recognition/scripts/extract_feats.py``,
        ``meters.py:739-913``). Returns the dict; optionally pickles it."""
        ds = dataset or self.val_ds
        acc = WindowVoteAccumulator(
            ds.windows.num_actions, _head_spec(self.cfg))
        if self._bank_accum is not None and ds is self.val_ds:
            # global SPMD scan: tables come back already replicated (a
            # re-reduce would be mean-invariant here, but skip it like
            # validate() does)
            self._run_bank_accum(acc)
        else:
            for logits, _, v_ids, a_ids, labels in self._eval_batches(ds):
                acc.update(logits, v_ids, a_ids, labels)
            acc.reduce_across_processes()

        # narration-id tables in action-id order
        v_nid = {}
        a_nid = {}
        for w in ds.windows.windows:
            for i, nid in zip(w.v_action_ids, w.v_narration_ids):
                v_nid[int(i)] = nid
            for i, nid in zip(w.a_action_ids, w.a_narration_ids):
                a_nid[int(i)] = nid

        # extraction completeness ("Actions Missed", meters.py:877-878)
        expected = ds.windows.num_actions
        seen = int((acc.seen > 0).sum())
        if seen < expected:
            self.logger.warning("extraction missed %d / %d actions",
                                expected - seen, expected)

        out: Dict[str, object] = {}
        if "action" in acc.sums:
            scores, _ = acc.ensembled_scores("action")
            out["action"] = scores
            valid = np.flatnonzero(acc.v_labels[:, 2] != -1)
            out["v_narration_ids"] = [v_nid[int(i)] for i in valid]
        if "verb" in acc.sums:
            out["verb"], _ = acc.ensembled_scores("verb")
            out["noun"], _ = acc.ensembled_scores("noun")
        if "audio" in acc.sums:
            scores, _ = acc.ensembled_scores("audio")
            out["audio"] = scores
            valid = np.flatnonzero(acc.a_labels != -1)
            out["a_narration_ids"] = [a_nid[int(i)] for i in valid]
        if path:
            with open(path, "wb") as f:
                pickle.dump(out, f)
        return out
