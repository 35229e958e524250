"""Backbone batch scaling beyond b16 now that flash freed the score HBM.

Round-4 swept b8/b16 only (Swin b16 won -5.6%; ViT preferred b8). Flash
removed the [*,784,784]/[*,1568,1568] score tensors that were the HBM
pressure, so larger extraction batches may now fit — this times Swin-B
b16/b24/b32 and ViT-L b8/b12/b16 (flash, bf16) and prints ms/clip.
OOM/compile failures degrade to a skip per config.

Run: python scripts/bench_batch_scaling.py [--part swin|vit|all]
"""

import argparse
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
            out = fn(x + (acc * 1e-12).astype(x.dtype), p)
            return jnp.max(jnp.abs(out)).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(x, params))
    t0 = time.perf_counter()
    float(run(x, params))
    dt = (time.perf_counter() - t0) / iters
    print(f"[batch] {tag}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def sweep(name, make, clip_shape, batches, failures):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    model = make()
    params = model.init(key, jnp.zeros((2,) + clip_shape, jnp.bfloat16))
    # Relay/tunnel compile failures can surface as arbitrary exception
    # types (HTTP 500 class), not just JaxRuntimeError — degrade any
    # failure to a per-config skip like the sibling bench scripts.
    skippable = Exception
    for batch in batches:
        clip = jnp.asarray(
            rng.normal(size=(batch,) + clip_shape) * 0.1, jnp.bfloat16)
        tag = f"{name} b{batch} flash bf16"
        try:
            t = chained_time(lambda c, p: model.apply(p, c), clip,
                             params, tag=tag)
        except skippable as exc:
            print(f"[batch] {tag} failed: {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)
            failures.append(tag)
            continue
        print(f"[batch] {tag}: {t / batch * 1e3:.2f} ms/clip", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="all", choices=["swin", "vit", "all"])
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    from tim_tpu.models.backbones.swin3d import SwinTransformer3D
    from tim_tpu.models.backbones.vit import VideoMAEViT

    print("devices:", jax.devices(), flush=True)
    failures = []
    if args.part in ("swin", "all"):
        sweep("swin-b",
              lambda: SwinTransformer3D(dtype=jnp.bfloat16, use_flash=True),
              (32, 224, 224, 3), (16, 24, 32), failures)
    if args.part in ("vit", "all"):
        sweep("vit-l",
              lambda: VideoMAEViT(dtype=jnp.bfloat16, use_flash=True),
              (16, 224, 224, 3), (8, 12, 16), failures)
    if failures:
        print(f"[batch] skipped: {failures}", flush=True)


if __name__ == "__main__":
    main()
