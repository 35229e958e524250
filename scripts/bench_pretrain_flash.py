"""VideoMAE MAE-pretrain train-step throughput: flash vs XLA attention.

The pretrain graph has two very different attention regimes: the
encoder runs 24 ViT-L layers on the ~10% VISIBLE tokens (S=160 at tube
mask 0.9 — scores are small, flash should be neutral), while the
decoder runs 12 layers at dim 512 on the FULL S=1568 sequence — the
same [B, H, S, S] score tensors + autodiff residuals that flash
eliminated on the finetune path. Matches the reference pretraining
entry ``feature_extractors/VideoMAE/run_mae_pretraining.py``. Run on
the chip:

    python scripts/bench_pretrain_flash.py [--iters 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batches", type=int, nargs="+", default=[2, 8, 16])
    ap.add_argument("--mask_ratio", type=float, default=0.9)
    ap.add_argument("--remat_mlp", action="store_true",
                    help="MLP-only remat (composes with flash)")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint each ViT block (memory knob)")
    ap.add_argument("--flash_only", action="store_true",
                    help="skip the XLA-attention half of the sweep")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from tim_tpu.extract.masking import TubeMasking, batch_mask_indices
    from tim_tpu.models.backbones.mae import PretrainVideoMAE
    from tim_tpu.train.backbone_finetune import make_pretrain_step
    from tim_tpu.train.state import create_train_state

    print("devices:", jax.devices(), flush=True)
    rnd = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def build(flash, batch):
        model = PretrainVideoMAE(dtype=jnp.bfloat16, use_flash=flash,
                                 remat=args.remat, remat_mlp=args.remat_mlp)
        masking = TubeMasking(model.grid, args.mask_ratio)
        video = jnp.asarray(
            rnd.normal(size=(batch, 16, 224, 224, 3)) * 0.1, jnp.float32)
        vis, msk = batch_mask_indices(masking, batch,
                                      np.random.default_rng(1))
        vis, msk = jnp.asarray(vis), jnp.asarray(msk)
        params = jax.jit(model.init)(key, video[:1], vis[:1], msk[:1])
        tx = optax.adamw(1.5e-4, weight_decay=0.05)
        state = create_train_state(params["params"], tx)
        print(f"[pretrain] Nv={vis.shape[1]} Nm={msk.shape[1]}",
              flush=True)
        return model, tx, state, (video, vis, msk)

    for flash in ((True,) if args.flash_only else (True, False)):
        for batch in args.batches:
            try:
                model, tx, state, batch_d = build(flash, batch)
                step = make_pretrain_step(model, tx)

                @jax.jit
                def run(state, video, vis, msk):
                    def body(i, carry):
                        s, _ = carry
                        s, metrics = step(s, video, vis, msk)
                        return (s, metrics["loss"].astype(jnp.float32))
                    s, loss = jax.lax.fori_loop(
                        0, args.iters, body, (state, jnp.float32(0.0)))
                    return loss + jax.tree_util.tree_leaves(
                        s.params)[0].astype(jnp.float32).sum() * 1e-9
                float(run(state, *batch_d))
                t0 = time.perf_counter()
                float(run(state, *batch_d))
                dt = (time.perf_counter() - t0) / args.iters
                print(f"[pretrain] vit-l b{batch}"
                      f"{' flash' if flash else ' xla'}"
                      f"{' remat' if args.remat else ''}"
                      f"{' remat_mlp' if args.remat_mlp else ''}: "
                      f"{dt * 1e3:.1f} ms/step = "
                      f"{batch / dt:.2f} clips/s "
                      f"({dt / batch * 1e3:.1f} ms/clip)", flush=True)
                del state, batch_d
            except Exception as e:  # OOM at realistic batches is a
                # finding, not a failure — report and keep sweeping
                print(f"[pretrain] vit-l b{batch}"
                      f"{' flash' if flash else ' xla'}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
