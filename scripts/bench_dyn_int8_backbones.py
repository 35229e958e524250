"""Dynamic-int8 backbones vs bf16, both with flash attention (round 4).

`bench_int8_backbone_micro.py` found the static-const act scales (the
TIM-serving trick) are what destroys int8 backbone throughput — the
DYNAMIC per-row path measured 0.90x bf16 at full ViT-L depth (a ~10%
win, no calibration needed). This times the shippable candidate on both
backbones at b8/b16 and prints the feature-level rel delta vs
bf16-flash (the accuracy-contract ingredient).

Run: python scripts/bench_dyn_int8_backbones.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def chained_time(fn, x, params, iters=10, tag=""):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, p):
        def body(i, acc):
            out = fn(x + acc * 1e-12, p)
            return jnp.max(jnp.abs(out)).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(x, params))
    t0 = time.perf_counter()
    float(run(x, params))
    dt = (time.perf_counter() - t0) / iters
    print(f"[dyn-int8] {tag}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from tim_tpu.models.backbones.swin3d import SwinTransformer3D
    from tim_tpu.models.backbones.vit import VideoMAEViT
    from tim_tpu.ops import quant

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

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
        qp = quant.quantize_backbone_params(params)
        qdyn = make(quantized=True)

        want = np.asarray(jax.jit(fp_model.apply)(
            {"params": params}, clip8[:2]), np.float32)
        got = np.asarray(jax.jit(qdyn.apply)(
            {"params": qp}, clip8[:2]), np.float32)
        rel = np.abs(got - want).max() / np.abs(want).max()
        print(f"[dyn-int8] {name} feature rel delta vs bf16-flash: "
              f"{rel:.4f}", flush=True)

        for batch in (8, 16):
            clip = clip8 if batch == 8 else jnp.asarray(
                rng.normal(size=(batch,) + clip_shape) * 0.1,
                jnp.bfloat16)
            t_fp = chained_time(
                lambda c, p: fp_model.apply({"params": p}, c), clip,
                params, tag=f"{name} b{batch} bf16-flash")
            t_q = chained_time(
                lambda c, p: qdyn.apply({"params": p}, c), clip, qp,
                tag=f"{name} b{batch} dyn-int8-flash")
            print(f"[dyn-int8] {name} b{batch}: {t_q / batch * 1e3:.2f} "
                  f"ms/clip dyn-int8 vs {t_fp / batch * 1e3:.2f} bf16 "
                  f"({t_q / t_fp:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
