"""Backbone extraction attribution: where do Swin-B's 58.5 and ViT-L's
38.6 ms/clip go, and can the public Pallas TPU flash-attention kernel
(jax.experimental.pallas.ops.tpu.flash_attention) reclaim the [S,S]
score-tensor HBM traffic in the ViT?

ViT-L at 16x224x224: S = 8*14*14 = 1568 tokens, 24 layers, d=1024.
Hand FLOPs ~1.19 TFLOP/clip; the fp32 [B,16,1568,1568] score tensors
are ~157 MB/clip/layer written+read around the softmax -> ~9.6 GB/clip
of HBM traffic that flash attention eliminates entirely.

Run:  python scripts/bench_backbone_micro.py [--part attn|vit|swin|all]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def chained_time(fn, *args, iters=10, tag=""):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(_, carry):
            out = fn(a[0] + carry.astype(a[0].dtype), *a[1:])
            return jnp.max(out).astype(jnp.float32) * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"[micro] {tag}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def bench_attn():
    """One ViT-L attention core at real shape: [8, 16, 1568, 64]."""
    import jax
    import jax.numpy as jnp

    b, h, s, dh = 8, 16, 1568, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, s, dh)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, s, dh)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, s, dh)) * 0.1, jnp.bfloat16)
    scale = 1.0 / np.sqrt(dh)

    def xla_fp32(q, k, v):
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    def xla_bf16(q, k, v):
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                          preferred_element_type=jnp.bfloat16)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1
                              ).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                          preferred_element_type=jnp.bfloat16)

    t_f32 = chained_time(xla_fp32, q, k, v, tag="xla fp32 scores")
    t_b16 = chained_time(xla_bf16, q, k, v, tag="xla bf16 scores")

    results = {"xla_fp32": t_f32, "xla_bf16": t_b16}
    from jax.experimental.pallas.ops.tpu import flash_attention as fa
    for bq, bkv in ((1568, 1568), (784, 784), (224, 1568), (224, 224)):
        try:
            bs = fa.BlockSizes(
                block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bkv,
                block_k_dkv=bkv, block_q_dkv=bq,
                block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq)

            def flash(q, k, v, bs=bs):
                return fa.flash_attention(q, k, v, sm_scale=scale,
                                          block_sizes=bs)

            t = chained_time(flash, q, k, v,
                             tag=f"pallas flash bq={bq} bkv={bkv}")
            results[f"flash_{bq}_{bkv}"] = t
        except Exception as exc:
            print(f"[micro] flash bq={bq} bkv={bkv} failed: "
                  f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)

    # numeric check at the shipped (full-sequence-block) flash config
    from tim_tpu.models.backbones.vit import _flash_block_sizes
    ref = np.asarray(jax.jit(xla_fp32)(q, k, v), np.float32)
    got = np.asarray(jax.jit(lambda q, k, v: fa.flash_attention(
        q, k, v, sm_scale=scale,
        block_sizes=_flash_block_sizes(s)))(q, k, v), np.float32)
    print(f"[micro] flash vs xla max |d|: {np.abs(ref - got).max():.3e} "
          f"(measured 3.1e-5 at out scale ~2e-3)", flush=True)

    # VERDICT r3 task: 128-multiple tiling via padding S 1568 -> 1664
    # (13*128) with segment_ids masking the 96 pad keys, vs the shipped
    # full-S single block.
    s_pad = 1664
    pad = s_pad - s
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    seg = jnp.pad(jnp.ones((b, s), jnp.int32), ((0, 0), (0, pad)),
                  constant_values=2)
    for bq, bkv in ((128, 128), (416, 416), (832, 832), (1664, 1664)):
        bs = fa.BlockSizes(
            block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bkv,
            block_k_dkv=bkv, block_q_dkv=bq,
            block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq)

        def flash_pad(qp, kp, vp, bs=bs):
            return fa.flash_attention(
                qp, kp, vp, segment_ids=fa.SegmentIds(q=seg, kv=seg),
                sm_scale=scale, block_sizes=bs)

        try:
            t = chained_time(flash_pad, qp, kp, vp,
                             tag=f"pallas flash PAD1664 bq={bq}")
            results[f"flash_pad_{bq}"] = t
        except Exception as exc:
            print(f"[micro] flash pad bq={bq} failed: "
                  f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)
    gotp = np.asarray(jax.jit(
        lambda a, c, d: fa.flash_attention(
            a, c, d, segment_ids=fa.SegmentIds(q=seg, kv=seg),
            sm_scale=scale, block_sizes=fa.BlockSizes(
                block_q=128, block_k_major=128, block_k=128, block_b=1,
                block_q_major_dkv=128, block_k_major_dkv=128,
                block_k_dkv=128, block_q_dkv=128, block_k_major_dq=128,
                block_k_dq=128, block_q_dq=128)))(qp, kp, vp),
        np.float32)[:, :, :s]
    print(f"[micro] padded-128 flash vs xla max |d|: "
          f"{np.abs(ref - gotp).max():.3e}", flush=True)
    return results


def bench_vit():
    import jax.numpy as jnp

    from tim_tpu.models.backbones.vit import VideoMAEViT

    rng = np.random.default_rng(0)
    import jax
    key = jax.random.PRNGKey(0)
    for batch in (8, 16):
        clip = jnp.asarray(rng.normal(size=(batch, 16, 224, 224, 3)) * 0.1,
                           jnp.bfloat16)
        for flash in (False, True):
            vit = VideoMAEViT(dtype=jnp.bfloat16, use_flash=flash)
            params = vit.init(key, clip)
            tag = f"vit-l b{batch}{' flash' if flash else ''}"
            t = chained_time(lambda c, p: vit.apply(p, c), clip, params,
                             tag=tag)
            print(f"[micro] {tag}: {t / batch * 1e3:.2f} ms/clip "
                  f"({1.19 * batch / t:.1f} TF/s hand-counted)",
                  flush=True)


def bench_swin(failures):
    import jax
    import jax.numpy as jnp

    from tim_tpu.models.backbones.swin3d import SwinTransformer3D

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    ref_out = {}
    params = None
    # b16 XLA (non-flash) does not fit: 16.25G > 15.75G HBM on v5e —
    # run each config independently so one OOM doesn't kill the sweep,
    # and compute the b8 parity check before touching b16. Only
    # resource/runtime errors degrade to a skip; shape/tracer bugs raise.
    skippable = (RuntimeError, jax.errors.JaxRuntimeError)
    for batch in (8, 16):
        clip = jnp.asarray(
            rng.normal(size=(batch, 32, 224, 224, 3)) * 0.1, jnp.bfloat16)
        for flash in (False, True):
            swin = SwinTransformer3D(dtype=jnp.bfloat16, use_flash=flash)
            if params is None:
                params = swin.init(key, clip)
            tag = f"swin-b b{batch}{' flash' if flash else ''}"
            try:
                t = chained_time(lambda c, p: swin.apply(p, c), clip,
                                 params, tag=tag)
            except skippable as exc:
                print(f"[micro] {tag} failed: {type(exc).__name__}: "
                      f"{str(exc)[:160]}", flush=True)
                failures.append(tag)
                continue
            print(f"[micro] {tag}: {t / batch * 1e3:.2f} ms/clip",
                  flush=True)
            if batch == 8:
                try:
                    ref_out[flash] = np.asarray(
                        jax.jit(swin.apply)(params, clip[:2]), np.float32)
                except skippable as exc:
                    print(f"[micro] {tag} parity ref failed: "
                          f"{type(exc).__name__}: {str(exc)[:160]}",
                          flush=True)
                    failures.append(tag + " parity")
        if batch == 8 and len(ref_out) == 2:
            d = np.abs(ref_out[True] - ref_out[False]).max()
            print(f"[micro] swin flash vs xla max |d|: {d:.3e} "
                  f"(out scale {np.abs(ref_out[False]).max():.3e})",
                  flush=True)


def bench_int8(failures):
    """int8-static backbone matmuls on top of flash attention (the
    serving config): calibrate on-device, then time b8/b16 and print
    feature-level parity vs the bf16-flash path."""
    import jax
    import jax.numpy as jnp

    from tim_tpu.models.backbones.swin3d import SwinTransformer3D
    from tim_tpu.models.backbones.vit import VideoMAEViT
    from tim_tpu.ops import quant

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    skippable = (RuntimeError, jax.errors.JaxRuntimeError)

    def strip(node):
        if not isinstance(node, dict):
            return node
        return {k: strip(v) for k, v in node.items() if k != "act_scale"}

    cases = [
        ("vit-l", lambda **kw: VideoMAEViT(dtype=jnp.bfloat16,
                                           use_flash=True, **kw),
         (16, 224, 224, 3)),
        ("swin-b", lambda **kw: SwinTransformer3D(dtype=jnp.bfloat16,
                                                  use_flash=True, **kw),
         (32, 224, 224, 3)),
    ]
    for name, make, clip_shape in cases:
        clip8 = jnp.asarray(
            rng.normal(size=(8,) + clip_shape) * 0.1, jnp.bfloat16)
        fp_model = make()
        params = fp_model.init(key, clip8)["params"]
        t_fp = chained_time(
            lambda c, p: fp_model.apply({"params": p}, c), clip8, params,
            tag=f"{name} b8 flash bf16 (control)")

        qp = quant.quantize_backbone_params(params)
        qdyn = make(quantized=True)
        cal = quant.calibrate_act_scales(
            lambda vs, b, m: qdyn.apply(vs, b, mutable=m),
            {"params": qp}, [clip8[:2]])
        scales = quant.act_scales_tuple(cal)
        print(f"[int8] {name}: {len(scales)} calibrated act scales",
              flush=True)
        qmodel = make(quantized=True, act_scales=scales)
        sparams = strip(cal)

        # feature-level parity (the accuracy contract's raw ingredient)
        want = np.asarray(jax.jit(fp_model.apply)(
            {"params": params}, clip8[:2]), np.float32)
        got = np.asarray(jax.jit(qmodel.apply)(
            {"params": sparams}, clip8[:2]), np.float32)
        rel = np.abs(got - want).max() / np.abs(want).max()
        print(f"[int8] {name} feature rel delta vs bf16-flash: {rel:.4f}",
              flush=True)

        for batch in (8, 16):
            clip = clip8 if batch == 8 else jnp.asarray(
                rng.normal(size=(batch,) + clip_shape) * 0.1,
                jnp.bfloat16)
            tag = f"{name} b{batch} flash int8-static"
            try:
                t = chained_time(
                    lambda c, p: qmodel.apply({"params": p}, c), clip,
                    sparams, tag=tag)
            except skippable as exc:
                print(f"[int8] {tag} failed: {type(exc).__name__}: "
                      f"{str(exc)[:160]}", flush=True)
                failures.append(tag)
                continue
            per_clip = t / batch * 1e3
            note = f" ({t_fp / 8 * 1e3:.2f} bf16)" if batch == 8 else ""
            print(f"[int8] {tag}: {per_clip:.2f} ms/clip{note}",
                  flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="all",
                    choices=["attn", "vit", "swin", "int8", "all"])
    args = ap.parse_args()
    import jax
    print("devices:", jax.devices(), flush=True)
    failures = []
    if args.part in ("attn", "all"):
        bench_attn()
    if args.part in ("vit", "all"):
        bench_vit()
    if args.part in ("swin", "all"):
        bench_swin(failures)
    if args.part in ("int8", "all"):
        bench_int8(failures)
    if failures:
        print(f"[micro] PARTIAL SWEEP — {len(failures)} config(s) "
              f"skipped: {failures}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
