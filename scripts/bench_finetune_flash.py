"""VideoMAE finetune train-step throughput: flash vs XLA attention.

The flash kernel's forward won 2.63x on ViT-L inference (round 3); this
measures the TRAINING side, where flash additionally removes the
[B, H, S, S] softmax-prob residuals autodiff must otherwise keep for
the backward (~1.26 GB bf16 per clip-layer at ViT-L's S=1568 — the XLA
path cannot fit realistic finetune batches in 16 GB HBM at all).
Matches the reference finetune entry
``feature_extractors/VideoMAE/run_class_finetuning.py`` (ViT-L, EK100
two-head). Run on the chip:

    python scripts/bench_finetune_flash.py [--iters 5]
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
    ap.add_argument("--parity", action="store_true",
                    help="grad-parity check (depth-2 trunk) only")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint each ViT block (memory knob; "
                         "see VideoMAEViT.remat; INCOMPATIBLE with "
                         "--flash: compiler crash, round 5)")
    ap.add_argument("--remat_mlp", action="store_true",
                    help="MLP-only remat (drops the [B,S,4096] fc1/gelu "
                         "residuals; composes with flash)")
    ap.add_argument("--flash_only", action="store_true",
                    help="skip the XLA-attention half of the sweep")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tim_tpu.models.backbones.vit import VideoMAEViT
    from tim_tpu.runner.backbone import TwoHeadViT, make_two_head_step
    from tim_tpu.train.backbone_finetune import make_llrd_optimizer
    from tim_tpu.train.state import create_train_state

    print("devices:", jax.devices(), flush=True)
    rnd = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def build(flash, batch, depth=24):
        model = TwoHeadViT(trunk=VideoMAEViT(
            dtype=jnp.bfloat16, use_flash=flash, depth=depth,
            remat=args.remat, remat_mlp=args.remat_mlp))
        video = jnp.asarray(
            rnd.normal(size=(batch, 16, 224, 224, 3)) * 0.1, jnp.bfloat16)
        params = jax.jit(model.init)(key, video[:1])["params"]
        batch_d = {
            "video": video,
            "verb": jnp.asarray(rnd.integers(0, 97, batch), jnp.int32),
            "noun": jnp.asarray(rnd.integers(0, 300, batch), jnp.int32),
        }
        tx = make_llrd_optimizer(params, depth=depth, lr=1e-3,
                                 weight_decay=0.05, layer_decay=0.75,
                                 total_steps=1000, warmup_steps=10)
        state = create_train_state(params, tx)
        return model, state, batch_d

    if args.parity:
        # grad parity flash vs XLA at the real S=1568 (depth 2 for cost)
        def grads_for(flash):
            # compare one real step's param deltas (optimizer identical
            # across the two paths, so deltas isolate the grads)
            model, state, batch = build(flash, 2, depth=2)
            step = make_two_head_step(model, mixup_alpha=0.0)
            new_state, metrics = jax.jit(step)(state, batch,
                                               jax.random.PRNGKey(1))
            delta = jax.tree_util.tree_map(
                lambda a, b: np.asarray(a, np.float32)
                - np.asarray(b, np.float32),
                new_state.params, state.params)
            return metrics, delta

        m0, d0 = grads_for(False)
        m1, d1 = grads_for(True)
        num = max(float(np.abs(a - b).max())
                  for a, b in zip(jax.tree_util.tree_leaves(d0),
                                  jax.tree_util.tree_leaves(d1)))
        den = max(float(np.abs(a).max())
                  for a in jax.tree_util.tree_leaves(d0))
        print(f"[finetune] loss xla {float(m0['loss']):.6f} "
              f"flash {float(m1['loss']):.6f}")
        print(f"[finetune] param-update max|d| {num:.3e} "
              f"(max update magnitude {den:.3e})", flush=True)
        return

    for flash in ((True,) if args.flash_only else (True, False)):
        for batch in args.batches:
            try:
                model, state, batch_d = build(flash, batch)
                step = make_two_head_step(model, mixup_alpha=0.8)
                rng = jax.random.PRNGKey(1)

                @jax.jit
                def run(state, batch):
                    def body(i, carry):
                        s, _ = carry
                        s, metrics = step(s, batch, rng)
                        return (s, metrics["loss"].astype(jnp.float32))
                    s, loss = jax.lax.fori_loop(
                        0, args.iters, body, (state, jnp.float32(0.0)))
                    return loss + jax.tree_util.tree_leaves(
                        s.params)[0].astype(jnp.float32).sum() * 1e-9
                float(run(state, batch_d))
                t0 = time.perf_counter()
                float(run(state, batch_d))
                dt = (time.perf_counter() - t0) / args.iters
                print(f"[finetune] vit-l b{batch}"
                      f"{' flash' if flash else ' xla'}"
                      f"{' remat' if args.remat else ''}"
                      f"{' remat_mlp' if args.remat_mlp else ''}: "
                      f"{dt * 1e3:.1f} ms/step = "
                      f"{batch / dt:.2f} clips/s "
                      f"({dt / batch * 1e3:.1f} ms/clip)", flush=True)
                del state, batch_d
            except Exception as e:  # OOM at realistic batches is a
                # finding, not a failure — report and keep sweeping
                print(f"[finetune] vit-l b{batch}"
                      f"{' flash' if flash else ' xla'}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
