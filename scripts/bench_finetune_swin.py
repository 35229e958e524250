"""Swin-B (Omnivore trunk) finetune train-step throughput: flash vs XLA.

The reference's Omnivore trunk is a trainable torch module
(``feature_extractors/omnivore/omnivore/models/swin_transformer.py``).
Round 3's fused window-attention kernel (``ops/pallas_swin.py``) made
the FORWARD fit batch 16 where XLA could not (score tensors, ~4.9 GB
fp32 per clip); this measures the TRAINING side now that the kernel has
a custom_vjp — the flash backward recomputes softmax in VMEM, so none
of the [BW, H, 784, 784] probability residuals autodiff keeps on the
XLA path ever reach HBM. Run on the chip:

    python scripts/bench_finetune_swin.py [--iters 5] [--batches 2 8 16]
"""

import argparse
import functools
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
                    help="param-update parity check (depth (2,2) trunk)")
    ap.add_argument("--flash_only", action="store_true")
    ap.add_argument("--xla_only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from tim_tpu.models.backbones.swin3d import SwinTransformer3D
    from tim_tpu.ops.pallas_swin import SWIN_FLASH_TRAIN_COMPILER_OPTIONS
    from tim_tpu.runner.backbone import TwoHeadViT, make_two_head_step
    from tim_tpu.train.state import create_train_state

    def jit_opts(flash):
        # required for the flash train step to fit the scoped-vmem
        # compile budget (ops/pallas_swin.py)
        return SWIN_FLASH_TRAIN_COMPILER_OPTIONS if flash else None

    print("devices:", jax.devices(), flush=True)
    rnd = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def build(flash, batch, depths=(2, 2, 18, 2),
              num_heads=(4, 8, 16, 32)):
        model = TwoHeadViT(trunk=SwinTransformer3D(
            dtype=jnp.bfloat16, use_flash=flash, depths=depths,
            num_heads=num_heads))
        video = jnp.asarray(
            rnd.normal(size=(batch, 32, 224, 224, 3)) * 0.1, jnp.bfloat16)
        params = jax.jit(model.init)(key, video[:1])["params"]
        batch_d = {
            "video": video,
            "verb": jnp.asarray(rnd.integers(0, 97, batch), jnp.int32),
            "noun": jnp.asarray(rnd.integers(0, 300, batch), jnp.int32),
        }
        tx = optax.adamw(1e-4, weight_decay=0.05)
        state = create_train_state(params, tx)
        return model, state, batch_d

    if args.parity:
        def deltas_for(flash):
            model, state, batch = build(flash, 2, depths=(2, 2),
                                        num_heads=(4, 8))
            step = make_two_head_step(model, mixup_alpha=0.0)
            new_state, metrics = jax.jit(
                step, compiler_options=jit_opts(flash))(
                state, batch, jax.random.PRNGKey(1))
            delta = jax.tree_util.tree_map(
                lambda a, b: np.asarray(a, np.float32)
                - np.asarray(b, np.float32),
                new_state.params, state.params)
            return metrics, delta

        m0, d0 = deltas_for(False)
        m1, d1 = deltas_for(True)
        num = max(float(np.abs(a - b).max())
                  for a, b in zip(jax.tree_util.tree_leaves(d0),
                                  jax.tree_util.tree_leaves(d1)))
        den = max(float(np.abs(a).max())
                  for a in jax.tree_util.tree_leaves(d0))
        print(f"[swin-ft] loss xla {float(m0['loss']):.6f} "
              f"flash {float(m1['loss']):.6f}")
        print(f"[swin-ft] param-update max|d| {num:.3e} "
              f"(max update magnitude {den:.3e})", flush=True)
        return

    flags = ((True,) if args.flash_only else
             (False,) if args.xla_only else (True, False))
    for flash in flags:
        for batch in args.batches:
            try:
                model, state, batch_d = build(flash, batch)
                step = make_two_head_step(model, mixup_alpha=0.8)
                rng = jax.random.PRNGKey(1)

                @functools.partial(
                    jax.jit, compiler_options=jit_opts(flash))
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
                print(f"[swin-ft] swin-b b{batch}"
                      f"{' flash' if flash else ' xla'}: "
                      f"{dt * 1e3:.1f} ms/step = "
                      f"{batch / dt:.2f} clips/s "
                      f"({dt / batch * 1e3:.1f} ms/clip)", flush=True)
                del state, batch_d
            except Exception as e:  # OOM at realistic batches is a
                # finding, not a failure — report and keep sweeping
                print(f"[swin-ft] swin-b b{batch}"
                      f"{' flash' if flash else ' xla'}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
