"""VideoMAE backbone training CLI.

The role of ``feature_extractors/VideoMAE/run_class_finetuning.py`` (and
the pretraining launcher the reference tree references but omits):

    # EK100 classification finetune on extracted frame dirs
    python -m tim_tpu.extract.finetune_cli --mode finetune \
        --anno_train train.csv --anno_val val.csv --data_path frames/ \
        --epochs 50 --batch_size 16 --pretrained mae_encoder.msgpack

    # MAE pretraining (tube masking, pixel reconstruction)
    python -m tim_tpu.extract.finetune_cli --mode pretrain \
        --anno_train train.csv --data_path frames/ --mask_ratio 0.9

Annotation csv schema = the reference's: video_id, start_frame,
stop_frame, verb_class, noun_class.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser():
    p = argparse.ArgumentParser("python -m tim_tpu.extract.finetune_cli")
    p.add_argument("--mode", choices=["finetune", "pretrain"],
                   default="finetune")
    p.add_argument("--anno_train", required=True)
    p.add_argument("--anno_val", default="")
    p.add_argument("--data_path", required=True)
    p.add_argument("--filename_tmpl", default="img_{:05d}.jpg")
    # model (ViT-L defaults, ``run_class_finetuning.py`` vit_large_patch16)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--embed_dim", type=int, default=1024)
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--num_heads", type=int, default=16)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--tubelet_size", type=int, default=2)
    p.add_argument("--num_verbs", type=int, default=97)
    p.add_argument("--num_nouns", type=int, default=300)
    # recipe
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--layer_decay", type=float, default=0.75)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--num_sample", type=int, default=2)
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--mask_ratio", type=float, default=0.9)
    p.add_argument("--pretrained", default="",
                   help="MAE encoder checkpoint (msgpack) to warm-start "
                        "the finetune trunk")
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--flash_attention", default="auto",
                   choices=["auto", "on", "off"],
                   help="Pallas flash attention in the ViT blocks. For "
                        "training it also removes the [B, H, S, S] "
                        "softmax-prob autodiff residuals, which is what "
                        "lets realistic finetune batches fit HBM at all "
                        "(see scripts/bench_finetune_flash.py); auto = "
                        "on when the backend is TPU")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint each ViT block: recompute block "
                        "activations in the backward instead of keeping "
                        "them. Only valid with --flash_attention off "
                        "(wrapping the Pallas custom_vjp crashes the TPU "
                        "compiler); measured it makes the XLA finetune "
                        "path compile at b8/b16 (123.6/123.8 ms/clip — "
                        "a fallback, 1.9x slower than flash b8)")
    p.add_argument("--remat_mlp", default="auto",
                   choices=["auto", "on", "off"],
                   help="jax.checkpoint only the LN2+MLP sub-block "
                        "(composes with flash). Measured: MAE pretrain "
                        "25.6 -> 20.2 ms/clip at b8 and unlocks b12; "
                        "finetune flat. auto = on for pretrain when "
                        "flash is on")
    p.add_argument("--output_dir", type=Path, default=Path("output"))
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    import jax.numpy as jnp
    import pandas as pd

    from tim_tpu.extract.clips import EK100ClipDataset, jpeg_frame_reader
    from tim_tpu.models.backbones.mae import PretrainVideoMAE
    from tim_tpu.models.backbones.vit import VideoMAEViT
    from tim_tpu.runner.backbone import (
        BackboneFinetuneRunner, BackbonePretrainRunner, TwoHeadViT)
    from tim_tpu.train import checkpoint as ckpt

    args = build_parser().parse_args(argv)
    reader = jpeg_frame_reader(args.data_path, args.filename_tmpl)
    anno_train = pd.read_csv(args.anno_train)
    common = dict(num_frames=args.num_frames, crop_size=args.input_size)
    import jax
    flash = (jax.default_backend() == "tpu"
             if args.flash_attention == "auto"
             else args.flash_attention == "on")
    if args.remat and flash:
        raise SystemExit(
            "--remat wraps the flash custom_vjp in jax.checkpoint, which "
            "crashes the TPU compiler (measured round 5). Use "
            "--remat_mlp on (checkpoints only the MLP sub-block) or "
            "--flash_attention off.")
    remat_mlp = (args.mode == "pretrain" and flash
                 if args.remat_mlp == "auto" else args.remat_mlp == "on")
    vit_kw = dict(
        img_size=args.input_size, patch_size=args.patch_size,
        embed_dim=args.embed_dim, depth=args.depth,
        num_heads=args.num_heads, num_frames=args.num_frames,
        tubelet_size=args.tubelet_size, use_flash=flash,
        remat=args.remat, remat_mlp=remat_mlp,
        dtype=jnp.dtype(args.compute_dtype))

    args.output_dir.mkdir(parents=True, exist_ok=True)
    if args.mode == "pretrain":
        # pretraining wants randomly-sampled, randomly-cropped clips but
        # NOT the finetune-only RandAugment/RandomErasing (the reference
        # pretrain transform is multi-scale crop + flip only)
        train_ds = EK100ClipDataset(
            anno_train, reader, mode="train", num_sample=1, reprob=0.0,
            rand_augment=lambda frames: frames, **common)
        runner = BackbonePretrainRunner(
            PretrainVideoMAE(**vit_kw), train_ds,
            mask_ratio=args.mask_ratio, batch_size=args.batch_size,
            epochs=args.epochs, lr=args.lr,
            weight_decay=args.weight_decay, seed=args.seed,
            output_dir=str(args.output_dir))
        stats = runner.fit()
        ckpt.save_checkpoint(str(args.output_dir), runner.state,
                             epoch=args.epochs)
        print(stats)
        return stats

    train_ds = EK100ClipDataset(
        anno_train, reader, mode="train", num_sample=args.num_sample,
        reprob=args.reprob, **common)
    val_ds = EK100ClipDataset(
        pd.read_csv(args.anno_val) if args.anno_val else anno_train,
        reader, mode="validation", **common)
    runner = BackboneFinetuneRunner(
        TwoHeadViT(trunk=VideoMAEViT(**vit_kw), num_verbs=args.num_verbs,
                   num_nouns=args.num_nouns),
        train_ds, val_ds, batch_size=args.batch_size, epochs=args.epochs,
        lr=args.lr, layer_decay=args.layer_decay,
        weight_decay=args.weight_decay, mixup_alpha=args.mixup,
        smoothing=args.smoothing, warmup_epochs=args.warmup_epochs,
        seed=args.seed, output_dir=str(args.output_dir))
    pre = None
    if args.pretrained:
        pre = ckpt.load_checkpoint(args.pretrained)["params"]
    runner.init_state(pretrained_encoder=pre)
    runner.fit()
    stats = runner.validate()
    ckpt.save_checkpoint(str(args.output_dir), runner.state,
                         epoch=args.epochs)
    print(stats)
    return stats


if __name__ == "__main__":
    main()
