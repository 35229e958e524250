"""Cheap dropout masks.

Round-3 attribution (docs/PERFORMANCE.md) found dropout RNG was the
single largest non-matmul cost in the detection train step: threefry
mask bits were ~1/3 of the step, and switching the key impl to XLA's
``RngBitGenerator`` (``TrainConfig.rng_impl="rbg"``) recovered
208->246 win/s. ``jax.random.bernoulli`` still burns 32 random bits +
one fp32 uniform conversion per element; a dropout mask only needs a
keep/drop decision, so drawing uint8 bits and comparing against a
quantized threshold cuts the generated bit volume 4x and skips the
int->float path entirely.

The keep probability is quantized to 1/256 steps (e.g. rate 0.1 ->
keep 230/256 = 0.8984) and the inverse-scale uses the QUANTIZED value,
so the estimator stays unbiased: E[mask * scale] = 1 exactly. This is a
distribution-level change to which elements drop — statistically
equivalent dropout, not bit-exact with ``nn.Dropout`` — gated behind
``ModelConfig.dropout_bits=8`` (default 32 keeps flax semantics).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def coarse_dropout(rng, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """uint8-mask dropout with an exactly-unbiased quantized keep prob."""
    keep_q = int(np.round((1.0 - rate) * 256.0))
    if keep_q >= 256:
        return x
    if keep_q <= 0:
        return jnp.zeros_like(x)
    bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
    keep = bits < jnp.uint8(keep_q)
    scale = jnp.asarray(256.0 / keep_q, x.dtype)
    import os
    if os.environ.get("TIM_TPU_DROPOUT_MUL") == "1":
        # Experiment (VERDICT r4 #7): express the mask as one multiply
        # (mask value scale-or-0) instead of a select, giving XLA a pure
        # mul to fold into the producing matmul/gelu epilogue. Same
        # values exactly (0 * x == select 0 for finite activations).
        return x * (keep.astype(x.dtype) * scale)
    return jnp.where(keep, x * scale, jnp.zeros_like(x))


def dropout(rng, x: jnp.ndarray, rate: float, deterministic: bool,
            bits: int = 32) -> jnp.ndarray:
    """Dropout dispatch: ``bits=32`` reproduces ``nn.Dropout``'s
    bernoulli semantics; ``bits=8`` is the coarse uint8-mask variant."""
    if deterministic or rate == 0.0:
        return x
    if bits == 8:
        return coarse_dropout(rng, x, rate)
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))
