"""XLA compiler_options sweep over the BACKBONE programs (round 5).

Round 3 swept the three TIM programs and found
``xla_tpu_enable_experimental_fusion_cost_model`` +10-12% on
recognition training (shipped) and a relay-compiler crash on the
detection graph. The backbone programs — 99% of the raw-media
composite — were never swept. This times each hot backbone program
under {baseline, fusion-cost-model} (Swin training adds its required
scoped-vmem option to both arms; a 64M vmem variant probes whether
more scoped head-room helps the backward kernel's scheduling):

  vit_fwd      ViT-L b8 flash forward        (14.7 ms/clip shipped)
  swin_fwd     Swin-B b8 flash forward       (26.1 ms/clip shipped)
  swin_fwd16   Swin-B b16 flash forward      (24.6 ms/clip shipped)
  vit_train    ViT-L b8 flash finetune step  (65.4 ms/clip shipped)
  swin_train   Swin-B b8 flash finetune step (86.5 ms/clip shipped)
  mae_train    MAE pretrain b8 flash+remat_mlp (20.2 ms/clip shipped)

Each (program, options) compiles in this one process; crashes are
caught per-config (the fusion flag is known to kill some graphs).

Run on the chip:
    python scripts/bench_backbone_xla_options.py [--parts ...] [--iters 5]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

FUSION = {"xla_tpu_enable_experimental_fusion_cost_model": "true"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--parts", nargs="+",
                    default=["vit_fwd", "swin_fwd", "swin_fwd16",
                             "vit_train", "swin_train", "mae_train"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from tim_tpu.models.backbones.mae import PretrainVideoMAE
    from tim_tpu.models.backbones.swin3d import SwinTransformer3D
    from tim_tpu.models.backbones.vit import VideoMAEViT
    from tim_tpu.extract.masking import TubeMasking, batch_mask_indices
    from tim_tpu.ops.pallas_swin import SWIN_FLASH_TRAIN_COMPILER_OPTIONS
    from tim_tpu.runner.backbone import TwoHeadViT, make_two_head_step
    from tim_tpu.train.backbone_finetune import make_pretrain_step
    from tim_tpu.train.state import create_train_state

    print("devices:", jax.devices(), flush=True)
    rnd = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    VMEM32 = SWIN_FLASH_TRAIN_COMPILER_OPTIONS
    VMEM64 = {"xla_tpu_scoped_vmem_limit_kib": "65536"}

    def timed(tag, build_fn, opt_variants):
        """build_fn(opts) -> (chained_callable, batch). Times each
        compiler-option variant; per-variant failures reported."""
        for name, opts in opt_variants:
            try:
                run, nclip = build_fn(opts)
                float(run())
                t0 = time.perf_counter()
                float(run())
                dt = (time.perf_counter() - t0) / args.iters
                print(f"[xla-bb] {tag} {name}: {dt * 1e3:.1f} ms = "
                      f"{dt / nclip * 1e3:.2f} ms/clip", flush=True)
            except Exception as e:
                print(f"[xla-bb] {tag} {name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    def fwd_builder(model, batch, frames):
        video = jnp.asarray(
            rnd.normal(size=(batch, frames, 224, 224, 3)) * 0.1,
            jnp.bfloat16)
        params = jax.jit(model.init)(key, video[:1])

        def build(opts):
            # params as a jit ARG, not a closure constant — constants
            # are serialized into the remote-compile request (HTTP 413
            # at ViT-L size)
            @functools.partial(jax.jit, compiler_options=opts)
            def chained(p, v):
                def body(_, carry):
                    out = model.apply(p, v + carry.astype(v.dtype))
                    return jnp.max(out).astype(jnp.float32) * 1e-9
                return jax.lax.fori_loop(0, args.iters, body,
                                         jnp.float32(0))
            return (lambda: chained(params, video)), batch
        return build

    def train_builder(trunk, batch, frames):
        model = TwoHeadViT(trunk=trunk)
        video = jnp.asarray(
            rnd.normal(size=(batch, frames, 224, 224, 3)) * 0.1,
            jnp.bfloat16)
        params = jax.jit(model.init)(key, video[:1])["params"]
        batch_d = {
            "video": video,
            "verb": jnp.asarray(rnd.integers(0, 97, batch), jnp.int32),
            "noun": jnp.asarray(rnd.integers(0, 300, batch), jnp.int32),
        }
        state = create_train_state(params, optax.adamw(1e-4))
        step = make_two_head_step(model, mixup_alpha=0.8)
        rng = jax.random.PRNGKey(1)

        def build(opts):
            @functools.partial(jax.jit, compiler_options=opts)
            def chained(state, b):
                def body(_, carry):
                    s, _ = carry
                    s, m = step(s, b, rng)
                    return (s, m["loss"].astype(jnp.float32))
                s, loss = jax.lax.fori_loop(
                    0, args.iters, body, (state, jnp.float32(0)))
                return loss + jax.tree_util.tree_leaves(
                    s.params)[0].astype(jnp.float32).sum() * 1e-9
            return (lambda: chained(state, batch_d)), batch
        return build

    def mae_builder(batch):
        model = PretrainVideoMAE(dtype=jnp.bfloat16, use_flash=True,
                                 remat_mlp=True)
        masking = TubeMasking(model.grid, 0.9)
        video = jnp.asarray(
            rnd.normal(size=(batch, 16, 224, 224, 3)) * 0.1, jnp.float32)
        vis, msk = batch_mask_indices(masking, batch,
                                      np.random.default_rng(1))
        vis, msk = jnp.asarray(vis), jnp.asarray(msk)
        tx = optax.adamw(1.5e-4, weight_decay=0.05)
        params = jax.jit(model.init)(key, video[:1], vis[:1], msk[:1])
        state = create_train_state(params["params"], tx)
        step = make_pretrain_step(model, tx)

        def build(opts):
            @functools.partial(jax.jit, compiler_options=opts)
            def chained(state, v, vis, msk):
                def body(_, carry):
                    s, _ = carry
                    s, m = step(s, v, vis, msk)
                    return (s, m["loss"].astype(jnp.float32))
                s, loss = jax.lax.fori_loop(
                    0, args.iters, body, (state, jnp.float32(0)))
                return loss + jax.tree_util.tree_leaves(
                    s.params)[0].astype(jnp.float32).sum() * 1e-9
            return (lambda: chained(state, video, vis, msk)), batch
        return build

    base_variants = [("base", None), ("fusion", FUSION)]

    if "vit_fwd" in args.parts:
        timed("vit-l fwd b8",
              fwd_builder(VideoMAEViT(dtype=jnp.bfloat16, use_flash=True),
                          8, 16), base_variants)
    if "swin_fwd" in args.parts:
        timed("swin-b fwd b8",
              fwd_builder(SwinTransformer3D(dtype=jnp.bfloat16,
                                            use_flash=True), 8, 32),
              base_variants)
    if "swin_fwd16" in args.parts:
        timed("swin-b fwd b16",
              fwd_builder(SwinTransformer3D(dtype=jnp.bfloat16,
                                            use_flash=True), 16, 32),
              base_variants)
    if "vit_train" in args.parts:
        timed("vit-l train b8",
              train_builder(VideoMAEViT(dtype=jnp.bfloat16,
                                        use_flash=True), 8, 16),
              base_variants)
    if "swin_train" in args.parts:
        timed("swin-b train b8",
              train_builder(SwinTransformer3D(dtype=jnp.bfloat16,
                                              use_flash=True), 8, 32),
              [("vmem32", VMEM32),
               ("vmem32+fusion", {**VMEM32, **FUSION}),
               ("vmem64", VMEM64)])
    if "mae_train" in args.parts:
        timed("mae pretrain b8 remat_mlp", mae_builder(8), base_variants)


if __name__ == "__main__":
    main()
