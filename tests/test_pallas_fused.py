"""Fused post-attention Pallas block: exactness vs the unfused flax stack
(interpret mode on CPU; the compiled-TPU path shares the kernel body)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tim_tpu import config as C
from tim_tpu.models.transformer import EncoderLayer
from tim_tpu.ops.pallas_fused import fused_post_attention


def _manual_unfused(x, attn, ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                    dtype):
    """The exact op sequence of the deterministic EncoderLayer tail."""
    import flax.linen as nn

    def ln(v, s_, b_):
        mod = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        return mod.apply({"params": {"scale": s_, "bias": b_}}, v)

    y = ln(x + attn, ln1_s, ln1_b).astype(dtype)
    h = jnp.dot(y, w1.astype(dtype), preferred_element_type=jnp.float32)
    h = jax.nn.gelu((h + b1.astype(jnp.float32)).astype(dtype),
                    approximate=False)
    o = jnp.dot(h, w2.astype(dtype), preferred_element_type=jnp.float32)
    o = (o + b2.astype(jnp.float32)).astype(dtype)
    return ln(y + o, ln2_s, ln2_b).astype(dtype)


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 1e-5),
                                        (jnp.bfloat16, 5e-2)])
def test_fused_matches_manual_stack(dtype, atol):
    rng = np.random.default_rng(0)
    b, s, c, ff = 2, 37, 64, 128   # odd S -> partial tail block
    x = jnp.asarray(rng.normal(size=(b, s, c)), dtype)
    attn = jnp.asarray(rng.normal(size=(b, s, c)), dtype)
    ln1_s = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    ln1_b = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
    ln2_s = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    ln2_b = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, ff)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=ff) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(ff, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)

    got = fused_post_attention(x, attn, ln1_s, ln1_b, w1, b1, w2, b2,
                               ln2_s, ln2_b, block_rows=32, interpret=True)
    want = _manual_unfused(x, attn, ln1_s, ln1_b, w1, b1, w2, b2,
                           ln2_s, ln2_b, dtype)
    assert got.dtype == dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=atol)


@pytest.mark.parametrize("dtype,atol", [("float32", 1e-5),
                                        ("bfloat16", 6e-2)])
def test_encoder_layer_fused_branch_matches_unfused(dtype, atol):
    """Same params through both EncoderLayer branches (flag flip)."""
    dt = jnp.dtype(dtype)
    kw = dict(d_model=64, nhead=4, dim_feedforward=128, dropout=0.1,
              dtype=dt)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 29, 64)), dt)

    base = EncoderLayer(**kw)
    params = base.init(jax.random.PRNGKey(0), x, 10, True)["params"]
    want = base.apply({"params": params}, x, 10, True)
    got = EncoderLayer(**kw, fused_ffn=True).apply(
        {"params": params}, x, 10, True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=atol)


def test_fused_init_param_structure_identical():
    """Initializing through the fused branch must create the identical
    param tree (names, shapes, values) as the unfused branch."""
    kw = dict(d_model=64, nhead=4, dim_feedforward=128, dropout=0.1,
              dtype=jnp.float32)
    x = jnp.zeros((1, 12, 64))
    p_base = EncoderLayer(**kw).init(jax.random.PRNGKey(7), x, 4, True)
    p_fused = EncoderLayer(**kw, fused_ffn=True).init(
        jax.random.PRNGKey(7), x, 4, True)
    flat_b = jax.tree_util.tree_leaves_with_path(p_base)
    flat_f = jax.tree_util.tree_leaves_with_path(p_fused)
    assert [p for p, _ in flat_b] == [p for p, _ in flat_f]
    for (_, a), (_, b) in zip(flat_b, flat_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_detection_model_fused_parity():
    """TimDetection inference logits: fused flag on vs off, same params."""
    from tim_tpu.models import TimDetection

    cfg = C.epic_detection(
        d_model=32, num_layers=2, nhead=2, num_feats=6,
        visual_input_dim=16, audio_input_dim=12,
        visual_classes=(11,), audio_classes=5, compute_dtype="float32")
    rng = np.random.default_rng(3)
    nq = 7
    v = jnp.asarray(rng.normal(size=(2, 6, 16)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(2, 6, 12)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(2, 12 + 2 * nq, 2)), jnp.float32)

    model = TimDetection(cfg)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        v, a, t, nq, nq, deterministic=True)["params"]
    cls_w, reg_w, _ = model.apply({"params": params}, v, a, t, nq, nq,
                                  deterministic=True)

    import dataclasses
    fcfg = dataclasses.replace(cfg, use_fused_ffn=True)
    cls_f, reg_f, _ = TimDetection(fcfg).apply(
        {"params": params}, v, a, t, nq, nq, deterministic=True)
    for gw, gf in zip(cls_w, cls_f):
        if gw is None:
            assert gf is None
            continue
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gw),
                                   atol=1e-5)
    for gw, gf in zip(reg_w, reg_f):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gw),
                                   atol=1e-5)
