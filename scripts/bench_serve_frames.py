"""End-to-end raw-media detection serving on the REAL production path
(round 5): ``DetectionServer.detect_video_frames`` with both visual
backbones (Swin-B pair-embed dedup || ViT-L frame-bank gather, flash),
the Auditory SlowFast extractor, and the EPIC-dim TIM detection pyramid
(2048/2304 inputs, 3806 classes) — upload-INCLUSIVE wall clock from
host frames/spectrograms to Soft-NMS'd detections.

Per-backbone A/B factors are in ``bench_media_ingest.py``; this is the
one-call serve surface at the reference's dense geometry (1.1 s clips,
0.2 s hop, ``make_framepickle.py:37-38``; 30 s windows stride 1 s).

Run on the chip:
    python scripts/bench_serve_frames.py [--duration 40] [--iters 1]
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
    ap.add_argument("--duration", type=float, default=40.0,
                    help="video seconds (50 fps synthetic frames)")
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument("--extract_batch", type=int, default=8)
    ap.add_argument("--top_k", type=int, default=0,
                    help="serve with on-device top-k score dumps "
                         "(avoids the dense [B, nq, 3806] download per "
                         "window; byte-identical when every "
                         "above-threshold class fits in k)")
    ap.add_argument("--mode", default="auto",
                    help="extraction mode for all backbones "
                         "(auto | gather | pair_embed | stream)")
    ap.add_argument("--uint8", action="store_true",
                    help="ship the frame bank as uint8 + on-device "
                         "normalize (halves H2D bytes vs bf16)")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tim_tpu import config as C
    from tim_tpu.models import TimDetection
    from tim_tpu.models.backbones.slowfast import (
        AuditorySlowFast, pack_pathways)
    from tim_tpu.models.backbones.swin3d import SwinTransformer3D
    from tim_tpu.models.backbones.vit import VideoMAEViT
    from tim_tpu.models.queries import generate_query_pyramid
    from tim_tpu.serve import DetectionServer
    from scripts.bench_media_ingest import clip_table

    print("devices:", jax.devices(), flush=True)
    on_tpu = jax.default_backend() == "tpu"
    rnd = np.random.default_rng(0)
    rng = jax.random.PRNGKey(0)

    if args.tiny:
        swin = SwinTransformer3D(patch_size=(2, 4, 4), embed_dim=8,
                                 depths=(1, 1), num_heads=(2, 2),
                                 window_size=(2, 3, 3))
        vit = VideoMAEViT(img_size=16, patch_size=8, embed_dim=16,
                          depth=1, num_heads=2, num_frames=16,
                          tubelet_size=2)
        asf = AuditorySlowFast(width=8, depths=(1, 1, 1, 1))
        res, spec_shape = 16, (64, 16)
        # tiny dims: swin 8*2=16 || vit 16 -> 32; asf w=8 -> 8*32*(9/8)=288
        dcfg = C.DetectionConfig(
            visual_classes=(4,), audio_classes=3, visual_input_dim=32,
            audio_input_dim=288, d_model=16, nhead=2, num_layers=1,
            num_feats=6, compute_dtype="float32",
            inference_query_size=0.2)
        server_kw = dict(feat_stride=2, feat_gap=0.2, batch_size=4)
    else:
        swin = SwinTransformer3D(dtype=jnp.bfloat16, use_flash=on_tpu)
        vit = VideoMAEViT(dtype=jnp.bfloat16, use_flash=on_tpu)
        asf = AuditorySlowFast()
        res, spec_shape = 224, (400, 128)
        dcfg = C.epic_detection(compute_dtype="bfloat16",
                                fast_scores=True)
        server_kw = dict(batch_size=16)

    fps = 50.0
    n_steps = int(round(args.duration / 0.2))
    # one SHARED origin for both samplers (per-table mins can differ)
    table_swin = clip_table(n_steps, 32, fps=fps, rebase=False)
    table_vit = clip_table(n_steps, 16, fps=fps, rebase=False)
    origin = int(min(table_swin.min(), table_vit.min()))
    table_swin = table_swin - origin
    table_vit = table_vit - origin
    n_frames = int(max(table_swin.max(), table_vit.max())) + 1
    frame_transform = None
    if args.uint8:
        from tim_tpu.extract.dense_media import uint8_normalizer
        frame_transform = uint8_normalizer(
            dtype="float32" if args.tiny else "bfloat16")
        frames = rnd.integers(0, 256, (n_frames, res, res, 3)) \
            .astype(np.uint8)
    else:
        dt_frames = jnp.bfloat16 if not args.tiny else jnp.float32
        frames = (rnd.normal(size=(n_frames, res, res, 3)) * 0.1) \
            .astype(dt_frames)
    specs = (rnd.normal(size=(n_steps,) + spec_shape) * 0.1) \
        .astype(np.float32)
    starts = (np.arange(n_steps) * 0.2).astype(np.float32)
    feat_times = np.stack([starts, starts + 1.1], -1)
    mb = frames.nbytes / 1e6
    print(f"[serve] {args.duration:.0f}s video: {n_steps} timesteps, "
          f"{n_frames} unique frames ({mb:.0f} MB bank), "
          f"{specs.nbytes / 1e6:.0f} MB specs", flush=True)

    def init_clip(table):
        c = jnp.asarray(frames[table[:1]])
        return frame_transform(c) if frame_transform is not None else c

    sv = jax.jit(swin.init)(rng, init_clip(table_swin))
    vv = jax.jit(vit.init)(rng, init_clip(table_vit))
    slow0, fast0 = pack_pathways(
        jnp.asarray(specs[:1, ..., None]), alpha=4)
    av = jax.jit(functools.partial(asf.init, train=False))(
        rng, slow0, fast0)

    @jax.jit
    def asf_feats(params, batch_specs):
        slow, fast = pack_pathways(batch_specs[..., None], alpha=4)
        _, feats = asf.apply(params, slow, fast, train=False)
        return feats

    audio_extractor = functools.partial(asf_feats, av)

    model = TimDetection(dcfg)
    nq = generate_query_pyramid(dcfg.inference_query_size).shape[0]
    nf = dcfg.num_feats
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, nf, dcfg.visual_input_dim)),
        jnp.zeros((1, nf, dcfg.audio_input_dim)),
        jnp.zeros((1, 2 * nf + 2 * nq, 2)), nq, nq,
        deterministic=True)["params"]
    if args.top_k:
        server_kw["top_k"] = args.top_k
    server = DetectionServer(dcfg, params, **server_kw)

    def run():
        return server.detect_video_frames(
            frames, [table_swin, table_vit], feat_times, args.duration,
            visual_model=[swin, vit], visual_variables=[sv, vv],
            audio_specs=specs, audio_extractor=audio_extractor,
            extract_batch=args.extract_batch, mode=args.mode,
            frame_transform=frame_transform)

    dets = run()        # warm: compiles + bank upload path
    t0 = time.perf_counter()
    for _ in range(args.iters):
        dets = run()
    dt = (time.perf_counter() - t0) / args.iters
    print(f"[serve] {len(dets['scores'])} detections; "
          f"end-to-end {dt:.2f} s for {args.duration:.0f} s of video = "
          f"{args.duration / dt:.2f}x real time "
          f"({dt / n_steps * 1e3:.1f} ms/timestep upload-inclusive)",
          flush=True)


if __name__ == "__main__":
    main()
