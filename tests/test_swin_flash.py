"""Fused Swin window-attention kernel (``ops/pallas_swin.py``).

CPU tests run the kernel in Pallas interpret mode against a plain-jnp
oracle of the XLA window-attention math (bias + per-window-type shift
mask + fp32 softmax). The full-backbone flash-vs-XLA parity at real
Swin-B shapes is TPU-gated like ``test_flash_attention.py``
(``TIM_TPU_TEST_TPU=1``).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tim_tpu.ops.pallas_swin import (
    window_attention_flash, window_type_major, window_type_major_inverse)

ON_TPU = os.environ.get("TIM_TPU_TEST_TPU") == "1"


def _oracle(q, k, v, ab, scale):
    """softmax(q k^T * scale + ab[type]) v with a window-type-MAJOR
    batch axis (type = index // (BW // n_types))."""
    bw, h, n, dh = q.shape
    rep = bw // ab.shape[0]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = s + ab[jnp.arange(bw) // rep].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("n_types,rep,h,n,dh", [
    (1, 6, 2, 32, 8),     # no shift mask: one shared bias block
    (4, 3, 2, 32, 8),     # shifted: per-window-type masks
    (2, 2, 3, 24, 16),
])
def test_kernel_interpret_matches_oracle(n_types, rep, h, n, dh):
    rng = np.random.default_rng(0)
    bw = n_types * rep
    q, k, v = (jnp.asarray(rng.normal(size=(bw, h, n, dh)), jnp.float32)
               for _ in range(3))
    ab = jnp.asarray(rng.normal(size=(n_types, h, n, n)) * 2, jnp.float32)
    scale = dh ** -0.5
    got = window_attention_flash(q, k, v, ab, sm_scale=scale,
                                 interpret=True)
    want = _oracle(q, k, v, ab, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_kernel_interpret_with_shift_mask_values():
    """-100 mask entries must zero the masked attention weights."""
    rng = np.random.default_rng(1)
    n_types, rep, h, n, dh = 2, 2, 1, 16, 8
    q, k, v = (jnp.asarray(rng.normal(size=(n_types * rep, h, n, dh)),
                           jnp.float32) for _ in range(3))
    ab = np.zeros((n_types, h, n, n), np.float32)
    ab[1, :, :, n // 2:] = -100.0     # type 1 cannot attend to back half
    out = window_attention_flash(q, k, v, jnp.asarray(ab),
                                 sm_scale=dh ** -0.5, interpret=True)
    # type-1 windows (batch rows rep..) == attention over the front
    # half of the keys only (-100 suppresses the back half)
    scale = dh ** -0.5
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q[rep:]),
                  np.asarray(k[rep:, :, : n // 2])) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    front = np.einsum("bhqk,bhkd->bhqd", p,
                      np.asarray(v[rep:, :, : n // 2]))
    np.testing.assert_allclose(np.asarray(out[rep:]), front,
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("n_types,rep,h,n,dh", [
    (1, 4, 2, 32, 8),     # single bias type: dab sums every window
    (4, 3, 2, 32, 8),     # shifted: dab accumulated per type run
])
def test_kernel_grads_match_oracle(n_types, rep, h, n, dh):
    """custom_vjp backward (interpret mode, fp32) == autodiff of the
    plain-jnp oracle for all four inputs, dab accumulation included."""
    rng = np.random.default_rng(5)
    bw = n_types * rep
    q, k, v = (jnp.asarray(rng.normal(size=(bw, h, n, dh)), jnp.float32)
               for _ in range(3))
    ab = jnp.asarray(rng.normal(size=(n_types, h, n, n)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(bw, h, n, dh)), jnp.float32)
    scale = dh ** -0.5

    def loss_flash(q, k, v, ab):
        out = window_attention_flash(q, k, v, ab, sm_scale=scale,
                                     interpret=True)
        return jnp.sum(out * w)

    def loss_oracle(q, k, v, ab):
        return jnp.sum(_oracle(q, k, v, ab, scale) * w)

    got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, ab)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(q, k, v, ab)
    for g, r, name in zip(got, want, "q k v ab".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-4, rtol=1e-4,
            err_msg=f"d{name}")


def test_swin_module_flash_grads_match_xla_interpret(monkeypatch):
    """Grads of a full tiny SwinTransformer3D (shifted blocks included)
    through the flash path (interpret) == the XLA path: exercises the
    backward through the window-type-major reordering, the bias/mask
    assembly transposes, and the rel-pos-table gather."""
    import tim_tpu.ops.pallas_swin as ps
    from tim_tpu.models.backbones import swin3d

    real = ps.window_attention_flash
    monkeypatch.setattr(
        ps, "window_attention_flash",
        lambda *a, **kw: real(*a, **{**kw, "interpret": True}))

    rng = np.random.default_rng(6)
    kwargs = dict(patch_size=(2, 4, 4), embed_dim=16, depths=(2,),
                  num_heads=(2,), window_size=(2, 3, 3))
    clip = jnp.asarray(rng.normal(size=(1, 4, 24, 24, 3)), jnp.float32)
    ref_model = swin3d.SwinTransformer3D(use_flash=False, **kwargs)
    params = ref_model.init(jax.random.PRNGKey(0), clip)

    def loss(model):
        return lambda p: jnp.sum(model.apply(p, clip) ** 2)

    g_ref = jax.grad(loss(ref_model))(params)
    g_flash = jax.grad(loss(
        swin3d.SwinTransformer3D(use_flash=True, **kwargs)))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_got = jax.tree_util.tree_leaves_with_path(g_flash)
    assert len(flat_ref) == len(flat_got)
    for (path, r), (_, g) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=5e-5, rtol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_window_type_major_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(12, 3, 5)))
    for n_types in (1, 2, 3, 4, 6, 12):
        y = window_type_major(x, n_types)
        # row t*rep+b of the major layout is row b*n_types+t of the input
        rep = x.shape[0] // n_types
        for t in range(n_types):
            for b in range(rep):
                np.testing.assert_array_equal(
                    np.asarray(y[t * rep + b]),
                    np.asarray(x[b * n_types + t]))
        np.testing.assert_array_equal(
            np.asarray(window_type_major_inverse(y, n_types)),
            np.asarray(x))


def test_bad_shapes_raise():
    q = jnp.zeros((6, 2, 16, 8))
    with pytest.raises(ValueError):
        window_attention_flash(q, q, q, jnp.zeros((4, 2, 16, 16)),
                               sm_scale=1.0, interpret=True)
    with pytest.raises(ValueError):
        window_attention_flash(q, q, q, jnp.zeros((2, 2, 16, 8)),
                               sm_scale=1.0, interpret=True)


@pytest.mark.skipif(not ON_TPU, reason="needs the real TPU (set "
                    "TIM_TPU_TEST_TPU=1)")
def test_swin_flash_full_backbone_parity_tpu():
    """SwinTransformer3D(use_flash=True) == the XLA path on the chip,
    at a reduced-depth Swin-B-like config with real (16,7,7) windows."""
    from tim_tpu.models.backbones.swin3d import SwinTransformer3D

    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.normal(size=(2, 32, 224, 224, 3)) * 0.1,
                       jnp.bfloat16)
    kwargs = dict(depths=(2, 2), num_heads=(4, 8), embed_dim=64,
                  dtype=jnp.bfloat16)
    ref_model = SwinTransformer3D(use_flash=False, **kwargs)
    params = ref_model.init(jax.random.PRNGKey(0), clip)
    ref = np.asarray(jax.jit(ref_model.apply)(params, clip), np.float32)
    flash_model = SwinTransformer3D(use_flash=True, **kwargs)
    got = np.asarray(jax.jit(flash_model.apply)(params, clip), np.float32)
    assert np.abs(ref - got).max() <= 5e-3 * max(np.abs(ref).max(), 1.0), (
        np.abs(ref - got).max(), np.abs(ref).max())


@pytest.mark.skipif(not ON_TPU, reason="needs the real TPU (set "
                    "TIM_TPU_TEST_TPU=1)")
def test_swin_flash_backbone_grads_parity_tpu():
    """Grads of a reduced-depth Swin-B-like trunk with real (16,7,7)
    windows: flash backward == XLA backward on the chip (bf16 compute,
    fp32 params)."""
    from tim_tpu.models.backbones.swin3d import SwinTransformer3D

    rng = np.random.default_rng(7)
    clip = jnp.asarray(rng.normal(size=(1, 32, 224, 224, 3)) * 0.1,
                       jnp.bfloat16)
    kwargs = dict(depths=(2,), num_heads=(4,), embed_dim=64,
                  dtype=jnp.bfloat16)
    ref_model = SwinTransformer3D(use_flash=False, **kwargs)
    params = ref_model.init(jax.random.PRNGKey(0), clip)

    def loss(model):
        return lambda p: jnp.sum(
            model.apply(p, clip).astype(jnp.float32) ** 2)

    from tim_tpu.ops.pallas_swin import SWIN_FLASH_TRAIN_COMPILER_OPTIONS

    g_ref = jax.jit(jax.grad(loss(ref_model)))(params)
    # backward kernel needs the raised scoped-vmem budget (pallas_swin)
    g_got = jax.jit(jax.grad(loss(
        SwinTransformer3D(use_flash=True, **kwargs))),
        compiler_options=SWIN_FLASH_TRAIN_COMPILER_OPTIONS)(params)
    for (path, r), (_, g) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_got)):
        r = np.asarray(r, np.float32)
        g = np.asarray(g, np.float32)
        scale = max(np.abs(r).max(), 1e-3)
        assert np.abs(r - g).max() <= 2e-2 * scale, (
            jax.tree_util.keystr(path), np.abs(r - g).max(), scale)


def test_swin_module_flash_matches_xla_interpret(monkeypatch):
    """Full SwinTransformer3D with use_flash routed through interpret
    mode == the XLA path: checks the bias/mask assembly and the
    window-type-major batch reordering end-to-end (shifted blocks
    included)."""
    import tim_tpu.ops.pallas_swin as ps
    from tim_tpu.models.backbones import swin3d

    real = ps.window_attention_flash
    monkeypatch.setattr(
        ps, "window_attention_flash",
        lambda *a, **kw: real(*a, **{**kw, "interpret": True}))

    rng = np.random.default_rng(3)
    # two stages, shifted second blocks; input big enough for 4 window
    # types along each shifted spatial dim
    kwargs = dict(patch_size=(2, 4, 4), embed_dim=16, depths=(2, 2),
                  num_heads=(2, 4), window_size=(2, 3, 3))
    clip = jnp.asarray(rng.normal(size=(2, 4, 24, 24, 3)), jnp.float32)
    ref_model = swin3d.SwinTransformer3D(use_flash=False, **kwargs)
    params = ref_model.init(jax.random.PRNGKey(0), clip)
    ref = ref_model.apply(params, clip)
    got = swin3d.SwinTransformer3D(use_flash=True, **kwargs).apply(
        params, clip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
