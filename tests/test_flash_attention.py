"""ViT flash-attention path (Pallas TPU kernel) — exactness vs the XLA
einsum path.

The kernel has no interpret mode, so these tests only run on a real TPU
backend (the suite's conftest pins CPU — run this file directly with
``JAX_PLATFORMS=`` unset on a TPU host). The same check was executed on
the v5e used for the perf numbers: full ViT-L attention core at
[8, 16, 1568, 64] matched the XLA path to max |d| = 3.1e-5 at output
scale ~2e-3 (bf16 rounding), and the full-model b8 forward went
38.6 -> 14.7 ms/clip (docs/PERFORMANCE.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Pallas TPU flash attention has no CPU/interpret fallback")


@requires_tpu
def test_flash_matches_xla_attention_core():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from tim_tpu.models.backbones.vit import _flash_block_sizes

    b, h, s, dh = 2, 4, 256, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.bfloat16)
    scale = 1.0 / np.sqrt(dh)

    def xla(q, k, v):
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                          preferred_element_type=jnp.float32)

    ref = np.asarray(jax.jit(xla)(q, k, v), np.float32)
    got = np.asarray(jax.jit(lambda q, k, v: fa.flash_attention(
        q, k, v, sm_scale=float(scale),
        block_sizes=_flash_block_sizes(s)))(q, k, v), np.float32)
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=0)


@requires_tpu
def test_vit_flash_forward_matches_xla():
    from tim_tpu.models.backbones.vit import VideoMAEViT

    rng = np.random.default_rng(1)
    clip = jnp.asarray(rng.normal(size=(2, 4, 128, 128, 3)) * 0.1,
                       jnp.bfloat16)
    kw = dict(img_size=128, patch_size=16, embed_dim=128, depth=2,
              num_heads=2, num_frames=4, tubelet_size=2,
              dtype=jnp.bfloat16)
    base = VideoMAEViT(**kw)
    params = base.init(jax.random.PRNGKey(0), clip)
    ref = np.asarray(jax.jit(base.apply)(params, clip), np.float32)
    flash = VideoMAEViT(use_flash=True, **kw)
    got = np.asarray(jax.jit(flash.apply)(params, clip), np.float32)
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=0)


def test_vit_flash_wiring_on_cpu(monkeypatch):
    """Execute the ``use_flash=True`` wiring (block-size selection,
    [B,N,H,dh]<->[B,H,N,dh] transposes, qkv unpacking) in the default CPU
    suite by standing in an exact-softmax fake for the TPU-only kernel.
    Numerics of the real kernel stay TPU-gated above; this pins the
    plumbing so a reshape/argument regression can't hide behind the
    skip."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from tim_tpu.models.backbones import vit as vit_mod

    seen = {}

    def fake_flash(q, k, v, *, sm_scale, block_sizes):
        seen["block_sizes"] = block_sizes
        seen["sm_scale"] = sm_scale
        seen["shape"] = tuple(q.shape)
        attn = jnp.einsum("bhqd,bhkd->bhqk",
                          q.astype(jnp.float32) * sm_scale,
                          k.astype(jnp.float32))
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", attn,
                          v.astype(jnp.float32)).astype(q.dtype)

    monkeypatch.setattr(fa, "flash_attention", fake_flash)

    rng = np.random.default_rng(2)
    clip = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)) * 0.1,
                       jnp.float32)
    kw = dict(img_size=32, patch_size=8, embed_dim=32, depth=1,
              num_heads=2, num_frames=4, tubelet_size=2)
    base = vit_mod.VideoMAEViT(**kw)
    params = base.init(jax.random.PRNGKey(0), clip)
    ref = np.asarray(base.apply(params, clip), np.float32)
    got = np.asarray(
        vit_mod.VideoMAEViT(use_flash=True, **kw).apply(params, clip),
        np.float32)

    s = 2 * 4 * 4  # tubelets * 4x4 patches
    assert seen["shape"] == (2, 2, s, 16)  # [B, H, S, dh] layout reached
    assert seen["block_sizes"].block_q == s  # full-sequence block policy
    assert seen["sm_scale"] == pytest.approx(16 ** -0.5)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_flash_flag_off_is_pure_xla_on_cpu():
    """Default path stays CPU-runnable and flag default is off."""
    from tim_tpu.models.backbones.vit import VideoMAEViT

    assert VideoMAEViT().use_flash is False
    clip = jnp.zeros((1, 4, 32, 32, 3))
    vit = VideoMAEViT(img_size=32, patch_size=8, embed_dim=32, depth=1,
                      num_heads=2, num_frames=4)
    params = vit.init(jax.random.PRNGKey(0), clip)
    out = vit.apply(params, clip)
    assert out.shape == (1, 32)
