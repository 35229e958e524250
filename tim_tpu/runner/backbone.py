"""VideoMAE backbone training runners (pretrain + EK100 finetune).

The driver layer of ``feature_extractors/VideoMAE/run_class_finetuning.py``
+ ``engine_for_finetuning.py`` (and the pretraining engine the reference
tree omits), on top of:
- ``tim_tpu/extract/clips.py``       EK100 clip dataset
- ``tim_tpu/extract/masking.py``     pretraining tube masks
- ``tim_tpu/models/backbones/{vit,mae}.py``
- ``tim_tpu/train/backbone_finetune.py``  LLRD optimizer + steps
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn

from tim_tpu.models.backbones.mae import PretrainVideoMAE
from tim_tpu.models.backbones.vit import VideoMAEViT
from tim_tpu.train.backbone_finetune import (
    make_llrd_optimizer, make_pretrain_step, mixup_targets,
    soft_target_cross_entropy)
from tim_tpu.train.state import (
    TrainState, create_train_state, training_rng)
from tim_tpu.utils.logging import setup_logging


class TwoHeadViT(nn.Module):
    """VideoMAE trunk + verb/noun heads (EK100 finetune target,
    ``run_class_finetuning.py`` nb_classes=[97, 300];
    ``engine_for_finetuning.py:22-29`` sums the two CE losses)."""

    trunk: VideoMAEViT
    num_verbs: int = 97
    num_nouns: int = 300
    # reference head init: trunc_normal(0.02) then weight AND bias
    # .mul_(init_scale) (modeling_finetune.py:334-340, --init_scale
    # default 0.001) == trunc_normal(0.02 * init_scale), zero bias
    init_scale: float = 0.001

    @nn.compact
    def __call__(self, video):
        head_init = nn.initializers.truncated_normal(0.02 * self.init_scale)
        feats = self.trunk(video)
        verb = nn.Dense(self.num_verbs, dtype=jnp.float32,
                        kernel_init=head_init,
                        name="head_verb")(feats.astype(jnp.float32))
        noun = nn.Dense(self.num_nouns, dtype=jnp.float32,
                        kernel_init=head_init,
                        name="head_noun")(feats.astype(jnp.float32))
        return verb, noun


def make_two_head_step(model: TwoHeadViT, *, mixup_alpha: float = 0.8,
                       smoothing: float = 0.1):
    """Finetune step: mixup over clips, soft-target CE on both heads."""

    def step(state: TrainState, batch: Dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        rng_mix, rng_lam = jax.random.split(step_rng)
        video, verbs, nouns = batch["video"], batch["verb"], batch["noun"]
        b = video.shape[0]
        if mixup_alpha > 0:
            lam = jax.random.beta(rng_lam, mixup_alpha, mixup_alpha)
            perm = jax.random.permutation(rng_mix, b)
            video = (lam * video
                     + (1.0 - lam) * video[perm]).astype(video.dtype)
        else:
            lam = jnp.float32(1.0)
            perm = jnp.arange(b)
        tv = mixup_targets(verbs, perm, lam, model.num_verbs, smoothing)
        tn = mixup_targets(nouns, perm, lam, model.num_nouns, smoothing)

        def loss_fn(params):
            lv, ln_ = model.apply({"params": params}, video)
            loss = (soft_target_cross_entropy(lv, tv)
                    + soft_target_cross_entropy(ln_, tn))
            metrics = {
                "loss": loss,
                "verb_acc": jnp.mean(
                    (jnp.argmax(lv, -1) == verbs).astype(jnp.float32)),
                "noun_acc": jnp.mean(
                    (jnp.argmax(ln_, -1) == nouns).astype(jnp.float32)),
            }
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), metrics

    return step


def _train_compiler_options(trunk) -> Optional[dict]:
    """Differentiating through the Swin flash kernel needs a larger
    scoped-vmem budget (see ``ops.pallas_swin``); harmless to the rest
    of the program, required for the train step to compile at all."""
    from tim_tpu.models.backbones.swin3d import SwinTransformer3D
    from tim_tpu.ops.pallas_swin import SWIN_FLASH_TRAIN_COMPILER_OPTIONS

    if (isinstance(trunk, SwinTransformer3D)
            and getattr(trunk, "use_flash", False)
            and jax.default_backend() not in ("cpu",)):
        return dict(SWIN_FLASH_TRAIN_COMPILER_OPTIONS)
    return None


def _batches(dataset, batch_size: int, rng: np.random.Generator,
             shuffle: bool = True, drop_last: bool = True):
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    for i in range(0, len(order), batch_size):
        chunk = order[i:i + batch_size]
        if len(chunk) < batch_size and drop_last:
            return
        examples = [dataset[int(j)] for j in chunk]
        batch = {k: np.stack([e[k] for e in examples])
                 for k in examples[0]}
        if batch["video"].ndim == 6:     # [B, num_sample, T, H, W, 3]
            s = batch["video"].shape[1]
            batch = {
                "video": batch["video"].reshape(-1,
                                                *batch["video"].shape[2:]),
                "verb": batch["verb"].reshape(-1),
                "noun": batch["noun"].reshape(-1),
            }
            del s
        yield batch


class BackboneFinetuneRunner:
    """EK100 classification finetune with layer-decayed AdamW."""

    def __init__(self, model: TwoHeadViT, train_ds, val_ds, *,
                 batch_size: int = 2, epochs: int = 1, lr: float = 1e-3,
                 layer_decay: float = 0.75, weight_decay: float = 0.05,
                 mixup_alpha: float = 0.8, smoothing: float = 0.1,
                 warmup_epochs: int = 0, seed: int = 0,
                 rng_impl: str = "rbg",
                 output_dir: Optional[str] = None):
        self.model = model
        self.rng_impl = rng_impl
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.batch_size = batch_size
        self.epochs = epochs
        self.seed = seed
        self.logger = setup_logging(output_dir)
        self._hp = dict(lr=lr, layer_decay=layer_decay,
                        weight_decay=weight_decay,
                        warmup_epochs=warmup_epochs)
        self._step_fn = jax.jit(make_two_head_step(
            model, mixup_alpha=mixup_alpha, smoothing=smoothing),
            donate_argnums=(0,),
            compiler_options=_train_compiler_options(model.trunk))
        self.state = None

    def init_state(self, pretrained_encoder: Optional[dict] = None):
        ds = self.train_ds or self.val_ds
        example = ds[0]["video"]
        video = jnp.zeros((1, *example.shape[-4:]), jnp.float32)
        params = self.model.init(jax.random.PRNGKey(self.seed),
                                 video)["params"]
        if pretrained_encoder is not None:
            from flax import serialization
            from tim_tpu.train.checkpoint import shape_matched_merge
            merged = shape_matched_merge(
                serialization.to_state_dict(params["trunk"]),
                pretrained_encoder)
            params = dict(params)
            params["trunk"] = serialization.from_state_dict(
                params["trunk"], merged)
        steps_per_epoch = max(len(self.train_ds) // self.batch_size, 1) \
            if self.train_ds else 1
        # LLRD over the full tree: trunk params resolve to their block
        # depth, heads (and anything unrecognized) to depth+1
        tx = make_llrd_optimizer(
            params, depth=self.model.trunk.depth,
            lr=self._hp["lr"], weight_decay=self._hp["weight_decay"],
            layer_decay=self._hp["layer_decay"],
            total_steps=steps_per_epoch * self.epochs,
            warmup_steps=steps_per_epoch * self._hp["warmup_epochs"])
        self.state = create_train_state(params, tx)
        return self.state

    def fit(self) -> Dict[str, float]:
        if self.state is None:
            self.init_state()
        # same knob as TrainConfig.rng_impl: "threefry2x32" restores
        # bit-exact historical dropout/mixup draws
        rng = training_rng(self.seed, self.rng_impl)
        metrics = {}
        for epoch in range(self.epochs):
            ep_rng = np.random.default_rng(self.seed + epoch)
            for i, batch in enumerate(_batches(self.train_ds,
                                               self.batch_size, ep_rng)):
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                self.state, metrics = self._step_fn(self.state, batch, rng)
            self.logger.info(
                "finetune epoch %d | loss %.4f | verb %.3f noun %.3f",
                epoch + 1, float(metrics.get("loss", np.nan)),
                float(metrics.get("verb_acc", np.nan)),
                float(metrics.get("noun_acc", np.nan)))
        return {k: float(v) for k, v in metrics.items()}

    def validate(self) -> Dict[str, float]:
        assert self.state is not None

        @jax.jit
        def fwd(params, video):
            return self.model.apply({"params": params}, video)

        n = v_ok = n_ok = 0
        for batch in _batches(self.val_ds, self.batch_size,
                              np.random.default_rng(0), shuffle=False,
                              drop_last=False):
            lv, ln_ = fwd(self.state.params, jnp.asarray(batch["video"]))
            v_ok += int((np.argmax(lv, -1) == batch["verb"]).sum())
            n_ok += int((np.argmax(ln_, -1) == batch["noun"]).sum())
            n += len(batch["verb"])
        return {"verb_top1": 100.0 * v_ok / max(n, 1),
                "noun_top1": 100.0 * n_ok / max(n, 1)}


class BackbonePretrainRunner:
    """MAE pretraining loop: tube masks on host, reconstruction on device."""

    def __init__(self, model: PretrainVideoMAE, dataset, *,
                 mask_ratio: float = 0.9, batch_size: int = 2,
                 epochs: int = 1, lr: float = 1.5e-4,
                 weight_decay: float = 0.05, seed: int = 0,
                 output_dir: Optional[str] = None):
        from tim_tpu.extract.masking import TubeMasking
        self.model = model
        self.dataset = dataset
        self.batch_size = batch_size
        self.epochs = epochs
        self.seed = seed
        self.logger = setup_logging(output_dir)
        self.masking = TubeMasking(model.grid, mask_ratio)
        self.tx = optax.adamw(lr, weight_decay=weight_decay)
        self._step_fn = jax.jit(make_pretrain_step(model, self.tx),
                                donate_argnums=(0,))
        self.state = None

    def init_state(self):
        from tim_tpu.extract.masking import batch_mask_indices
        example = self.dataset[0]["video"]
        video = jnp.zeros((1, *example.shape[-4:]), jnp.float32)
        vis, msk = batch_mask_indices(self.masking, 1,
                                      np.random.default_rng(0))
        params = self.model.init(jax.random.PRNGKey(self.seed), video,
                                 jnp.asarray(vis), jnp.asarray(msk))
        self.state = create_train_state(params["params"], self.tx)
        return self.state

    def fit(self) -> Dict[str, float]:
        from tim_tpu.extract.masking import batch_mask_indices
        if self.state is None:
            self.init_state()
        metrics = {}
        for epoch in range(self.epochs):
            rng = np.random.default_rng(self.seed + epoch)
            for batch in _batches(self.dataset, self.batch_size, rng):
                video = jnp.asarray(batch["video"])
                vis, msk = batch_mask_indices(self.masking, video.shape[0],
                                              rng)
                self.state, metrics = self._step_fn(
                    self.state, video, jnp.asarray(vis), jnp.asarray(msk))
            self.logger.info("pretrain epoch %d | loss %.4f", epoch + 1,
                             float(metrics.get("loss", np.nan)))
        return {k: float(v) for k, v in metrics.items()}
