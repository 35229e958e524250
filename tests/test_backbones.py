"""Backbone parity: flax backbones + converters vs the reference torch
models executed in-process (timm and friends stubbed)."""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _stub_timm(monkeypatch):
    layers = types.ModuleType("timm.models.layers")

    def drop_path(x, drop_prob=0.0, training=False):
        return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, std=1.0, mean=0.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()

        def forward(self, x):
            return x

    layers.drop_path = drop_path
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath

    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn

    models = types.ModuleType("timm.models")
    models.layers = layers
    models.registry = registry
    timm = types.ModuleType("timm")
    timm.models = models
    for name, mod in {
        "timm": timm, "timm.models": models,
        "timm.models.layers": layers, "timm.models.registry": registry,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_videomae_vit_parity(monkeypatch):
    import jax.numpy as jnp
    from tim_tpu.models.backbones import vit as jvit

    _stub_timm(monkeypatch)
    ref = _load("/root/reference/feature_extractors/VideoMAE/"
                "modeling_finetune.py", "ref_videomae")

    torch.manual_seed(0)
    depth, dim, heads = 2, 32, 4
    model = ref.VisionTransformer(
        img_size=224, patch_size=16, embed_dim=dim, depth=depth,
        num_heads=heads, mlp_ratio=4.0, qkv_bias=True, init_values=0.0,
        all_frames=16, tubelet_size=2, use_mean_pooling=True,
        num_classes=10)
    model.eval()

    x = torch.randn(1, 3, 16, 224, 224)
    with torch.no_grad():
        want = model.forward_features(x).numpy()

    jmodel = jvit.VideoMAEViT(embed_dim=dim, depth=depth, num_heads=heads)
    variables = jvit.params_from_torch(model.state_dict(), depth=depth)
    # flax video layout: [B, T, H, W, C]
    xv = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    got = np.asarray(jmodel.apply(variables, xv))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


class _AttrDict(dict):
    __getattr__ = dict.__getitem__


def _asf_cfg():
    return _AttrDict(
        BN=_AttrDict(NORM_TYPE="batchnorm"),
        MODEL=_AttrDict(ARCH="slowfast", NUM_CLASSES=[5],
                        DROPOUT_RATE=0.0, HEAD_ACT="softmax"),
        RESNET=_AttrDict(
            DEPTH=50, NUM_GROUPS=1, WIDTH_PER_GROUP=8,
            TRANS_FUNC="bottleneck_transform", STRIDE_1X1=False,
            INPLACE_RELU=True,
            NUM_BLOCK_TEMP_KERNEL=[[3, 3], [4, 4], [6, 6], [3, 3]],
            FREQUENCY_STRIDES=[[1, 1], [2, 2], [2, 2], [2, 2]],
            FREQUENCY_DILATIONS=[[1, 1], [1, 1], [1, 1], [1, 1]]),
        SLOWFAST=_AttrDict(ALPHA=4, BETA_INV=4,
                           FUSION_CONV_CHANNEL_RATIO=2,
                           FUSION_KERNEL_SZ=7),
        DATA=_AttrDict(INPUT_CHANNEL_NUM=[1, 1]),
        AUDIO_DATA=_AttrDict(NUM_FRAMES=32, NUM_FREQUENCIES=64),
    )


def _import_ref_slowfast(monkeypatch):
    """Import the reference auditory_slowfast model package with fvcore
    stubbed (the registry is the only fvcore dependency)."""
    registry_mod = types.ModuleType("fvcore.common.registry")

    class Registry:
        def __init__(self, name):
            self._map = {}

        def register(self, obj=None):
            if obj is None:
                def deco(o):
                    self._map[o.__name__] = o
                    return o
                return deco
            self._map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._map[name]

    registry_mod.Registry = Registry
    common = types.ModuleType("fvcore.common")
    common.registry = registry_mod
    fvcore = types.ModuleType("fvcore")
    fvcore.common = common
    for name, mod in {"fvcore": fvcore, "fvcore.common": common,
                      "fvcore.common.registry": registry_mod}.items():
        monkeypatch.setitem(sys.modules, name, mod)

    root = "/root/reference/feature_extractors/auditory_slowfast"
    monkeypatch.syspath_prepend(root)
    for mod in list(sys.modules):
        if mod.startswith("slowfast"):
            monkeypatch.delitem(sys.modules, mod)
    import importlib
    return importlib.import_module("slowfast.models.audio_model_builder")


def test_auditory_slowfast_parity(monkeypatch):
    import jax.numpy as jnp
    from tim_tpu.models.backbones import slowfast as jsf

    ref_mod = _import_ref_slowfast(monkeypatch)
    cfg = _asf_cfg()
    torch.manual_seed(0)
    model = ref_mod.SlowFast(cfg)
    model.eval()

    t, f = 32, 64
    slow = torch.randn(2, 1, t // 4, f)
    fast = torch.randn(2, 1, t, f)
    with torch.no_grad():
        want_logits, want_feat = model([slow.clone(), fast.clone()])

    jmodel = jsf.AuditorySlowFast(
        num_classes=5, width=8, alpha=4, beta_inv=4, dropout_rate=0.0)
    variables = jsf.params_from_torch(model.state_dict())
    got_logits, got_feat = jmodel.apply(
        variables,
        jnp.asarray(slow.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(fast.permute(0, 2, 3, 1).numpy()),
        train=False)
    np.testing.assert_allclose(np.asarray(got_feat), want_feat.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_pack_pathways_matches_reference_subsampling():
    import jax.numpy as jnp
    from tim_tpu.models.backbones.slowfast import pack_pathways

    x = torch.arange(16, dtype=torch.float32).reshape(1, 16, 1, 1)
    want = torch.index_select(
        x, 1, torch.linspace(0, 15, 4).long()).numpy()
    slow, fast = pack_pathways(jnp.asarray(x.numpy()), alpha=4)
    np.testing.assert_allclose(np.asarray(slow), want)
    np.testing.assert_allclose(np.asarray(fast), x.numpy())


def _import_ref_swin(monkeypatch):
    _stub_timm(monkeypatch)
    pkg = types.ModuleType("ref_omni_models")
    pkg.__path__ = [
        "/root/reference/feature_extractors/omnivore/omnivore/models"]
    swin_utils = types.ModuleType("ref_omni_models.swin_utils")
    swin_utils.load_and_broadcast_checkpoint_list = lambda *a, **k: None
    monkeypatch.setitem(sys.modules, "ref_omni_models", pkg)
    monkeypatch.setitem(sys.modules, "ref_omni_models.swin_utils",
                        swin_utils)
    import importlib
    return importlib.import_module("ref_omni_models.swin_transformer")


def test_swin3d_parity(monkeypatch):
    """Exercises window clamping (D < window D), shifted blocks with
    boundary masks, the bias-table row-slice quirk, and patch merging."""
    import jax.numpy as jnp
    from tim_tpu.models.backbones import swin3d as jswin

    ref_mod = _import_ref_swin(monkeypatch)
    torch.manual_seed(0)
    depths, heads = [2, 2], [2, 4]
    model = ref_mod.SwinTransformer3D(
        pretrained=None, pretrained2d=False,
        patch_size=(2, 4, 4), embed_dim=16, depths=depths,
        num_heads=heads, window_size=(8, 3, 3), drop_path_rate=0.0,
        drop_rate=0.0, patch_norm=True)
    model.eval()

    x = torch.randn(2, 3, 8, 24, 24)
    with torch.no_grad():
        want = model(x).numpy()

    jmodel = jswin.SwinTransformer3D(
        patch_size=(2, 4, 4), embed_dim=16, depths=tuple(depths),
        num_heads=tuple(heads), window_size=(8, 3, 3), patch_norm=True)
    variables = jswin.params_from_torch(model.state_dict(), depths=depths)
    xv = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    got = np.asarray(jmodel.apply(variables, xv))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_sinusoid_table_matches_reference(monkeypatch):
    from tim_tpu.models.backbones.vit import sinusoid_position_table

    _stub_timm(monkeypatch)
    ref = _load("/root/reference/feature_extractors/VideoMAE/"
                "modeling_finetune.py", "ref_videomae2")
    want = ref.get_sinusoid_encoding_table(50, 24).numpy()[0]
    got = sinusoid_position_table(50, 24)
    np.testing.assert_allclose(got, want, atol=1e-6)
