"""Exactness of the fused int8 Pallas kernel vs the XLA reference path
(interpret mode on CPU; same kernel runs compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tim_tpu.ops.pallas_int8 import int8_matmul_fused
from tim_tpu.ops.quant import int8_matmul_static, quantize_kernel


@pytest.mark.parametrize("m,k,n,bm,bn", [
    (64, 128, 256, 32, 128),
    (100, 128, 384, 64, 128),   # non-divisible M
])
def test_fused_matches_xla_static(m, k, n, bm, bn):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, k)) * 0.1, jnp.float32)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
    w_q, w_scale = quantize_kernel(w)
    sx = 0.01

    want = int8_matmul_static(x, jnp.asarray(w_q), jnp.asarray(w_scale),
                              sx)
    got = int8_matmul_fused(
        x, jnp.asarray(w_q), jnp.asarray(w_scale), sx,
        block_m=bm, block_n=bn, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-5)


def test_fused_bias_gelu_epilogue():
    rng = np.random.default_rng(1)
    m, k, n = 32, 128, 256
    x = jnp.asarray(rng.normal(size=(2, m // 2, k)) * 0.1, jnp.float32)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
    w_q, w_scale = quantize_kernel(w)
    bias = jnp.asarray(rng.normal(size=(n,)) * 0.1, jnp.float32)
    sx = 0.01

    base = int8_matmul_static(x, jnp.asarray(w_q), jnp.asarray(w_scale),
                              sx) + bias
    want = jax.nn.gelu(base.astype(jnp.bfloat16), approximate=True)
    got = int8_matmul_fused(
        x, jnp.asarray(w_q), jnp.asarray(w_scale), sx, bias=bias,
        activation="gelu", block_m=32, block_n=128,
        out_dtype=jnp.bfloat16, interpret=True)
    assert got.shape == (2, m // 2, n)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)
