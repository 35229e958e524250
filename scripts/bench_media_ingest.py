"""Overlap-aware dense raw-media extraction A/B (upload-INCLUSIVE).

The fused-pipeline composite (bench_fused_pipeline.py) is device-only;
this measures what production raw-media serving actually pays: host ->
device transfer of the clip pixels plus the backbone forwards, per
feature timestep, at the reference's dense geometry (1.1 s clips on a
0.2 s hop, ``make_framepickle.py:37-38``). Three paths per backbone:

  naive      host assembles every clip, uploads each in full
             (detect_video_media behavior): every pixel crosses the
             link ~5x
  gather     unique frames uploaded once, clips gathered on device
  pair_embed gather + each unique frame pair patch-embedded once,
             trunk entered via the embedded=True path

All three produce EXACTLY the same features (tests/test_dense_media.py);
this script reports ms/timestep and the dedup factors. Run on the chip:

    python scripts/bench_media_ingest.py [--steps 25] [--tiny]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def clip_table(n_steps: int, n_samples: int, fps: float = 50.0,
               interval: float = 1.1, hop: float = 0.2,
               rebase: bool = True) -> np.ndarray:
    """Reference dense geometry: omnivore_frame_indices rows at a 0.2s
    hop. ``rebase=True`` rebases THIS table's min to 0 (single-backbone
    use); pass ``rebase=False`` and subtract one SHARED origin when
    several backbones index the same frame bank (per-table mins can
    differ between samplers, silently misaligning the banks)."""
    from tim_tpu.extract.pipeline import omnivore_frame_indices

    span = int(round(interval * fps))
    rows = [omnivore_frame_indices(span, int(round(t * hop * fps)) + 1,
                                   10 ** 9, num_samples=n_samples)
            for t in range(n_steps)]
    table = np.stack(rows) - 1
    return table - table.min() if rebase else table


def bench_one(name, model, variables, frames, plan, batch, iters=3):
    from tim_tpu.extract.dense_media import extract_dense_visual

    results = {}
    for mode in ("naive", "gather", "pair_embed"):
        try:
            # warm (compiles + constant transfers)
            extract_dense_visual(model, variables, frames, plan,
                                 batch_size=batch, mode=mode)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = extract_dense_visual(model, variables, frames, plan,
                                           batch_size=batch, mode=mode)
            dt = (time.perf_counter() - t0) / iters / len(plan.clip_idx)
            results[mode] = (dt, out)
            print(f"[ingest] {name} {mode}: {dt * 1e3:.1f} ms/timestep",
                  flush=True)
        except Exception as e:
            print(f"[ingest] {name} {mode}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
    if "naive" in results and "pair_embed" in results:
        ref, got = results["naive"], results["pair_embed"]
        delta = float(np.abs(ref[1].astype(np.float32)
                             - got[1].astype(np.float32)).max())
        print(f"[ingest] {name}: naive/pair_embed speedup "
              f"{ref[0] / got[0]:.2f}x, max|d| {delta:.2e} "
              f"(frame dedup {plan.frame_dedup:.1f}x, "
              f"pair dedup {plan.pair_dedup:.1f}x)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=25,
                    help="feature timesteps (0.2s apart)")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip_swin", action="store_true")
    ap.add_argument("--skip_vit", action="store_true")
    args = ap.parse_args()

    import jax

    if args.tiny:
        # sitecustomize pins jax_platforms=axon,cpu at interpreter start;
        # the smoke run must not go through the TPU relay
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tim_tpu.extract.dense_media import build_clip_plan
    from tim_tpu.models.backbones.swin3d import SwinTransformer3D
    from tim_tpu.models.backbones.vit import VideoMAEViT

    print("devices:", jax.devices(), flush=True)
    rnd = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    on_tpu = jax.default_backend() == "tpu"

    if args.tiny:
        swin = SwinTransformer3D(patch_size=(2, 4, 4), embed_dim=8,
                                 depths=(1, 1), num_heads=(2, 2),
                                 window_size=(2, 3, 3))
        vit = VideoMAEViT(img_size=16, patch_size=8, embed_dim=16,
                          depth=1, num_heads=2, num_frames=16,
                          tubelet_size=2)
        res = 16
    else:
        swin = SwinTransformer3D(dtype=jnp.bfloat16, use_flash=on_tpu)
        vit = VideoMAEViT(dtype=jnp.bfloat16, use_flash=on_tpu)
        res = 224

    jobs = []
    if not args.skip_swin:
        jobs.append(("swin-b", swin, 32))
    if not args.skip_vit:
        jobs.append(("vit-l", vit, 16))

    for name, model, n_samples in jobs:
        table = clip_table(args.steps, n_samples)
        plan = build_clip_plan(table, tubelet=2)
        frames = rnd.normal(size=(len(plan.unique_frames), res, res, 3)) \
            .astype(np.float32) * 0.1
        if not args.tiny:
            frames = frames.astype(jnp.bfloat16)
        clips0 = frames[plan.clip_idx[:1]]
        variables = jax.jit(model.init)(key, jnp.asarray(clips0))
        naive_mb = plan.clip_idx.size * res * res * 3 * \
            frames.dtype.itemsize / 1e6
        bank_mb = len(plan.unique_frames) * res * res * 3 * \
            frames.dtype.itemsize / 1e6
        print(f"[ingest] {name}: {args.steps} steps, "
              f"{len(plan.unique_frames)} unique frames; upload "
              f"naive {naive_mb:.0f} MB vs bank {bank_mb:.0f} MB",
              flush=True)
        bench_one(name, model, variables, frames, plan, args.batch,
                  iters=args.iters)


if __name__ == "__main__":
    main()
