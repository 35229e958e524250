"""BASELINE config 5 measured: raw clips+spectrograms -> backbones ->
TIM detection, end-to-end windows/s on one chip.

The production layout (DetectionServer.detect_video_media) extracts each
feature timestep ONCE into an HBM bank, then slides dense-pyramid windows
over the bank — so per 1s-stride window the steady-state cost is
5 new timesteps/modality (0.2s feature hop) through each backbone plus
one TIM window. This script measures each stage at real sizes (Swin-B
32x224x224, ViT-L 16x224x224, ASF-R50 [400, 128] spectrograms, EPIC
detection TIM) and reports the composite:

    t_window = 5*(t_omni + t_vit) + 5*t_asf + t_tim

Run on the chip:  python scripts/bench_fused_pipeline.py [--tiny]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def timeit(tag, fn, *args, iters=10):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*args):
        def body(_, carry):
            out = fn(args[0] + carry, *args[1:])
            return jnp.max(out).astype(jnp.float32) * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"[fused] {tag}: {dt * 1e3:.1f} ms/call", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="small backbones (CPU smoke)")
    ap.add_argument("--batch", type=int, default=8)
    # per-backbone sweet spots measured round 4 (docs/PERFORMANCE.md):
    # Swin-B wants b16 now that flash fits it in HBM (24.6 vs 26.1
    # ms/clip), ViT-L wants b8 + dynamic int8 (13.3 vs 14.7)
    ap.add_argument("--swin_batch", type=int, default=0,
                    help="override --batch for the Swin trunk")
    ap.add_argument("--vit_batch", type=int, default=0,
                    help="override --batch for the ViT trunk")
    ap.add_argument("--vit_quant", action="store_true",
                    help="dynamic-int8 ViT matmuls "
                         "(quantize_backbone_params)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tim_tpu import config as C
    from tim_tpu.models import TimDetection
    from tim_tpu.models.backbones.slowfast import (
        AuditorySlowFast, pack_pathways)
    from tim_tpu.models.backbones.swin3d import SwinTransformer3D
    from tim_tpu.models.backbones.vit import VideoMAEViT
    from tim_tpu.models.queries import generate_query_pyramid

    print("devices:", jax.devices(), flush=True)
    rng = jax.random.PRNGKey(0)
    bs = args.batch

    if args.tiny:
        swin = SwinTransformer3D(patch_size=(2, 4, 4), embed_dim=8,
                                 depths=(1, 1), num_heads=(2, 2),
                                 window_size=(2, 3, 3),
                                 dtype=jnp.bfloat16)
        vit = VideoMAEViT(img_size=16, patch_size=8, embed_dim=16,
                          depth=1, num_heads=2, num_frames=4,
                          tubelet_size=2, dtype=jnp.bfloat16)
        asf = AuditorySlowFast(width=8, depths=(1, 1, 1, 1))
        clip_o = (4, 16, 16, 3)
        clip_v = (4, 16, 16, 3)
        spec = (32, 128)
        dcfg = C.DetectionConfig(
            visual_classes=(16,), audio_classes=8, visual_input_dim=32,
            audio_input_dim=288, d_model=32, nhead=4, num_layers=2,
            num_feats=8, inference_query_size=0.25,
            compute_dtype="bfloat16")
        tim_b = 8
    else:
        on_tpu = jax.default_backend() == "tpu"
        swin = SwinTransformer3D(dtype=jnp.bfloat16,       # Swin-B
                                 use_flash=on_tpu)
        vit = VideoMAEViT(dtype=jnp.bfloat16,              # ViT-L
                          use_flash=on_tpu)
        asf = AuditorySlowFast()                           # R50
        clip_o = (32, 224, 224, 3)
        clip_v = (16, 224, 224, 3)
        spec = (400, 128)
        dcfg = C.epic_detection(compute_dtype="bfloat16",
                                fast_scores=True)
        tim_b = 64

    rnd = np.random.default_rng(0)

    # Params must be TRACED jit arguments, not closed-over constants:
    # embedded weights blow up the serialized program past the remote
    # compiler's upload limit (HTTP 413 measured with Swin-B).

    # ---- omnivore (Swin-B) ----
    bo = args.swin_batch or bs
    co = jnp.asarray(rnd.normal(size=(bo,) + clip_o) * 0.1, jnp.bfloat16)
    sv = swin.init(rng, co)
    t_omni = timeit(
        f"omnivore swin {clip_o} b{bo}",
        lambda c, p: swin.apply(p, c), co, sv) / bo

    # ---- videomae (ViT-L) ----
    bv = args.vit_batch or bs
    cv = jnp.asarray(rnd.normal(size=(bv,) + clip_v) * 0.1, jnp.bfloat16)
    vv = vit.init(rng, cv)
    if args.vit_quant:
        from tim_tpu.ops.quant import quantize_backbone_params
        vit = vit.clone(quantized=True)
        vv = {"params": quantize_backbone_params(vv["params"])}
    t_vit = timeit(
        f"videomae vit {clip_v} b{bv}"
        + (" dyn-int8" if args.vit_quant else ""),
        lambda c, p: vit.apply(p, c), cv, vv) / bv

    # ---- auditory slowfast ----
    sp = jnp.asarray(rnd.normal(size=(bs * 2,) + spec) * 0.1, jnp.float32)
    slow, fast = pack_pathways(sp[..., None], alpha=4)
    av = asf.init(rng, slow, fast, train=False)

    def asf_fwd(slow, fast, params):
        _, feats = asf.apply(params, slow, fast, train=False)
        return feats
    t_asf = timeit(f"asf spec {spec} b{bs * 2}", asf_fwd, slow,
                   fast, av) / (bs * 2)

    # ---- TIM detection window ----
    model = TimDetection(dcfg)
    nq = generate_query_pyramid(dcfg.inference_query_size).shape[0]
    nf = dcfg.num_feats
    v = jnp.asarray(rnd.normal(size=(tim_b, nf, dcfg.visual_input_dim))
                    * 0.1, jnp.float32)
    a = jnp.asarray(rnd.normal(size=(tim_b, nf, dcfg.audio_input_dim))
                    * 0.1, jnp.float32)
    times = jnp.asarray(rnd.uniform(
        size=(tim_b, 2 * nf + 2 * nq, 2)), jnp.float32)
    tv = model.init({"params": rng, "dropout": rng}, v, a, times, nq, nq,
                    deterministic=True)

    def tim_fwd(params, v, a, t):
        cls_scores, reg, _ = model.apply(params, v, a, t, nq, nq,
                                         deterministic=True)
        return cls_scores[2].astype(jnp.float32).max() + reg[0].sum()

    import jax as _jax

    @_jax.jit
    def tim_chained(params, v, a, t):
        def body(_, carry):
            return tim_fwd(params, v + carry * 1e-9, a,
                           t).astype(jnp.float32)
        return _jax.lax.fori_loop(0, 10, body, jnp.float32(0))

    float(tim_chained(tv, v, a, times))
    t0 = time.perf_counter()
    float(tim_chained(tv, v, a, times))
    t_tim = (time.perf_counter() - t0) / 10 / tim_b
    print(f"[fused] tim detection window b{tim_b}: "
          f"{t_tim * 1e3:.2f} ms/window", flush=True)

    # steady-state composite: 5 new timesteps per 1s window stride
    t_window = 5 * (t_omni + t_vit) + 5 * t_asf + t_tim
    print(f"[fused] per-unit: omnivore {t_omni * 1e3:.1f} ms/clip, "
          f"videomae {t_vit * 1e3:.1f} ms/clip, "
          f"asf {t_asf * 1e3:.2f} ms/clip, "
          f"tim {t_tim * 1e3:.2f} ms/window", flush=True)
    print(f"[fused] end-to-end raw-media detection: "
          f"{1.0 / t_window:.2f} windows/s "
          f"({t_window * 1e3:.1f} ms/window steady-state)", flush=True)


if __name__ == "__main__":
    main()
