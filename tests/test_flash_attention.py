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


from tests.flash_fake import fake_flash_kernel


def test_vit_flash_wiring_on_cpu(monkeypatch):
    """Execute the ``use_flash=True`` wiring (pad-to-128 block policy,
    [B,N,H,dh]<->[B,H,N,dh] transposes, qkv unpacking) in the default CPU
    suite by standing in an exact-softmax fake for the TPU-only kernel.
    Numerics of the real kernel stay TPU-gated above; this pins the
    plumbing so a reshape/argument regression can't hide behind the
    skip."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from tim_tpu.models.backbones import vit as vit_mod

    seen = {}
    monkeypatch.setattr(fa, "flash_attention", fake_flash_kernel(seen))

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

    s = 2 * 4 * 4  # tubelets * 4x4 patches, padded to one 128 lane
    assert seen["shape"] == (2, 2, 128, 16)  # [B, H, Spad, dh] reached
    assert seen["block_sizes"].block_q == 128  # full-block policy
    assert seen["block_sizes"].block_q_dkv == 128  # bwd tiles legal
    assert np.asarray(seen["segment_ids"].q).sum() == 2 * s
    assert seen["sm_scale"] == pytest.approx(16 ** -0.5)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_flash_mha_pad_matches_exact_softmax_with_grads(monkeypatch):
    """The pad-to-128 wrapper (tim_tpu.ops.flash.flash_mha) must be
    value- AND grad-exact vs plain softmax attention at an S that is not
    a multiple of 128 — the kernel's backward requires 128-multiple
    blocks, which is exactly why the wrapper pads (finetune/MAE train at
    ViT-L's S=1568 crashed without it). Runs on CPU against the
    segment-id-honoring fake; real-kernel numerics are TPU-gated."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from tim_tpu.ops.flash import flash_mha

    monkeypatch.setattr(fa, "flash_attention", fake_flash_kernel({}))

    b, h, s, dh = 2, 2, 40, 16
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.float32)
    scale = dh ** -0.5

    def ref_loss(q, k, v):
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q * scale, k), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return (out * jnp.cos(out)).sum(), out

    def flash_loss(q, k, v):
        out = flash_mha(q, k, v, sm_scale=scale)
        return (out * jnp.cos(out)).sum(), out

    (l0, o0), g0 = jax.value_and_grad(ref_loss, (0, 1, 2),
                                      has_aux=True)(q, k, v)
    (l1, o1), g1 = jax.value_and_grad(flash_loss, (0, 1, 2),
                                      has_aux=True)(q, k, v)
    assert o1.shape == (b, h, s, dh)  # pad rows sliced off
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               atol=1e-5, rtol=0)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b_ in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=1e-5, rtol=0)
        assert np.isfinite(np.asarray(b_)).all()


@requires_tpu
def test_flash_mha_grads_match_xla_on_tpu():
    """Real-kernel backward at a non-128-multiple S (pads 160 -> 256)."""
    from tim_tpu.ops.flash import flash_mha

    b, h, s, dh = 2, 2, 160, 64
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.float32)
    scale = dh ** -0.5

    def ref_loss(q, k, v):
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q * scale, k), axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v).sum()

    def flash_loss(q, k, v):
        return flash_mha(q, k, v, sm_scale=scale).sum()

    g0 = jax.jit(jax.grad(ref_loss, (0, 1, 2)))(q, k, v)
    g1 = jax.jit(jax.grad(flash_loss, (0, 1, 2)))(q, k, v)
    for a, b_ in zip(g0, g1):
        # measured v5e: max |d| 2.8e-3 at |g|~0.55 (0.5% rel), and
        # ~1e-3 abs on near-zero grads — the kernel's bf16 MXU products
        # vs the XLA fp32 reference
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=3e-3, rtol=1e-2)
        assert np.isfinite(np.asarray(b_)).all()


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
