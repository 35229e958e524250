"""Structured TIM attention must equal dense masked attention exactly, and
both must equal torch's MultiheadAttention under the reference mask."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tim_tpu.ops.attention import (
    dense_masked_attention, tim_attention, tim_attention_mask)


@pytest.mark.parametrize("num_ctx,nq", [(20, 0), (20, 7), (100, 399)])
def test_structured_equals_dense(num_ctx, nq):
    b, h, dh = 2, 4, 16
    s = num_ctx + nq
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.float32)

    out_struct = tim_attention(q, k, v, num_ctx)
    allowed = tim_attention_mask(s, num_ctx)
    out_dense = dense_masked_attention(q, k, v, allowed)
    np.testing.assert_allclose(
        np.asarray(out_struct), np.asarray(out_dense), atol=1e-5, rtol=1e-5)


def test_pallas_query_block_matches_jnp():
    """Fused VMEM kernel (interpret mode on CPU) vs the jnp query block."""
    from tim_tpu.ops.pallas_attention import query_block_attention

    b, h, nq, f, dh = 2, 4, 300, 20, 16
    rng = np.random.default_rng(1)
    qq = jnp.asarray(rng.normal(size=(b, h, nq, dh)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(b, h, f, dh)), jnp.float32)
    kq = jnp.asarray(rng.normal(size=(b, h, nq, dh)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(b, h, f, dh)), jnp.float32)
    vq = jnp.asarray(rng.normal(size=(b, h, nq, dh)), jnp.float32)

    got = query_block_attention(qq, kc, kq, vc, vq, tile_q=128,
                                interpret=True)

    # oracle: full structured attention, query rows only
    q = jnp.concatenate([kc * 0, qq], axis=2)  # context rows unused
    k = jnp.concatenate([kc, kq], axis=2)
    v = jnp.concatenate([vc, vq], axis=2)
    want = tim_attention(q, k, v, f)[:, :, f:]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_mask_semantics_match_reference():
    """allowed = context columns + diagonal (tim.py:161-166, inverted)."""
    s, f = 7, 3
    allowed = np.asarray(tim_attention_mask(s, f))
    for i in range(s):
        for j in range(s):
            expect = (j < f) or (i == j)
            assert allowed[i, j] == expect


def test_torch_mha_parity():
    """Feed identical weights into torch.nn.MultiheadAttention with the
    reference boolean mask and into our structured kernel."""
    torch = pytest.importorskip("torch")
    b, s, f, d, h = 3, 30, 20, 64, 4
    torch.manual_seed(0)
    mha = torch.nn.MultiheadAttention(d, h, dropout=0.0)
    mha.eval()

    x = torch.randn(s, b, d)
    mask = torch.ones(s, s)
    mask[:, :f] = 0.0
    mask.fill_diagonal_(0.0)
    mask = mask.unsqueeze(0).repeat_interleave(h * b, dim=0).bool()
    with torch.no_grad():
        torch_out, _ = mha(x, x, x, attn_mask=mask)
    torch_out = torch_out.transpose(0, 1).numpy()  # [B, S, D]

    # Split torch packed in_proj into q/k/v and run our kernel.
    w = mha.in_proj_weight.detach().numpy()
    bias = mha.in_proj_bias.detach().numpy()
    wq, wk, wv = w[:d], w[d:2 * d], w[2 * d:]
    bq, bk, bv = bias[:d], bias[d:2 * d], bias[2 * d:]
    wo = mha.out_proj.weight.detach().numpy()
    bo = mha.out_proj.bias.detach().numpy()

    xb = jnp.asarray(x.transpose(0, 1).numpy())    # [B, S, D]

    def heads(y):
        return y.reshape(b, s, h, d // h).transpose(0, 2, 1, 3)

    q = heads(xb @ wq.T + bq)
    k = heads(xb @ wk.T + bk)
    v = heads(xb @ wv.T + bv)
    out = tim_attention(q, k, v, f)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, d) @ wo.T + bo
    np.testing.assert_allclose(np.asarray(out), torch_out,
                               atol=2e-5, rtol=1e-4)
