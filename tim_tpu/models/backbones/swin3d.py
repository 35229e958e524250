"""Omnivore SwinTransformer3D (visual feature backbone), TPU-native.

Rebuild of the reference video Swin trunk
(``feature_extractors/omnivore/omnivore/models/swin_transformer.py``):
Conv3D patch embedding, stages of (shifted-)3D-window attention with
relative position bias, 2x2 spatial patch merging between stages, final
LayerNorm + spatio-temporal mean pool. Omnivore Swin-B EPIC config:
patch (2,4,4), dim 128, depths (2,2,18,2), heads (4,8,16,32),
window (16,7,7) (``omnivore_model.py:136-176``), 1024-d features.

Everything is static-shape: window partitioning is pure reshape/transpose,
shift masks and relative-position indices are numpy constants baked at
trace time, so XLA sees dense batched matmuls only.

Reference quirks preserved for checkpoint parity:
- effective window sizes clamp to the input extent per dim
  (``get_window_size``, swin_transformer.py:144-157);
- when the effective window is smaller than configured, the relative
  position index table is *row-sliced* ``[:N, :N]`` rather than rebuilt
  (``swin_transformer.py:251-255``).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from tim_tpu.models.common import exact_gelu


def effective_window(x_size, window_size, shift_size):
    """Clamp window dims to input extent; clamped dims don't shift."""
    win = list(window_size)
    shift = list(shift_size)
    for i, s in enumerate(x_size):
        if s <= window_size[i]:
            win[i] = s
            shift[i] = 0
    return tuple(win), tuple(shift)


@lru_cache(maxsize=None)
def relative_position_index(window_size: Tuple[int, int, int]) -> np.ndarray:
    """[N, N] indices into the (2Wd-1)(2Wh-1)(2Ww-1) bias table."""
    wd, wh, ww = window_size
    coords = np.stack(np.meshgrid(
        np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)


@lru_cache(maxsize=None)
def shift_attention_mask(dims, window_size, shift_size) -> np.ndarray:
    """[nW, N, N] additive mask (-100 across shift boundaries), matching
    ``compute_mask`` (swin_transformer.py:468-494)."""
    dp, hp, wp = dims
    img = np.zeros((dp, hp, wp))
    cnt = 0
    # NOTE: slice(-0, None) == the whole dim — for shift-0 dims the last
    # slice overwrites everything, leaving no boundary along that dim.
    # This mirrors the reference exactly (swin_transformer.py:471-487).
    for d in (slice(None, -window_size[0]),
              slice(-window_size[0], -shift_size[0]),
              slice(-shift_size[0], None)):
        for h in (slice(None, -window_size[1]),
                  slice(-window_size[1], -shift_size[1]),
                  slice(-shift_size[1], None)):
            for w in (slice(None, -window_size[2]),
                      slice(-window_size[2], -shift_size[2]),
                      slice(-shift_size[2], None)):
                img[d, h, w] = cnt
                cnt += 1
    windows = _partition_np(img[None, ..., None], window_size)[..., 0]
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _partition_np(x, window):
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // window[0], window[0], h // window[1], window[1],
                  w // window[2], window[2], c)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        -1, window[0] * window[1] * window[2], c)


def window_partition(x, window):
    """[B, D, H, W, C] -> [B*nW, N, C]."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // window[0], window[0], h // window[1], window[1],
                  w // window[2], window[2], c)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        -1, window[0] * window[1] * window[2], c)


def window_reverse(windows, window, b, d, h, w):
    c = windows.shape[-1]
    x = windows.reshape(b, d // window[0], h // window[1], w // window[2],
                        window[0], window[1], window[2], c)
    return x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d, h, w, c)


class WindowAttention3D(nn.Module):
    """``use_flash``: route the window-attention core through the fused
    Mosaic kernel (``ops/pallas_swin.py``) instead of materializing the
    per-window [H, N, N] fp32 score tensors (~4.9 GB per Swin-B clip
    across stages, read/written ~2.5x by the XLA path). Exact softmax
    attention with fp32 scores; the relative-position bias + shift mask
    stay at their natural [n_types, H, N, N] shape. TPU-only — leave
    False on CPU backends (no interpret fallback)."""

    dim: int
    full_window: Tuple[int, int, int]   # configured size (bias table size)
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    quantized: bool = False
    act_scales: tuple = ()

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray]):
        """x: [B*nW, N, C]; mask: [nW, N, N] numpy or None."""
        from tim_tpu.models.common import Int8Dense
        from tim_tpu.ops.quant import scale_for

        bn, n, c = x.shape
        h = self.num_heads
        dh = c // h
        scale = dh ** -0.5
        wd, wh, ww = self.full_window
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), h), jnp.float32)

        if self.quantized:
            def dense(feats, name):
                const = scale_for(self.act_scales, name)
                return Int8Dense(feats, dtype=self.dtype,
                                 static_acts=const > 0.0,
                                 act_scale_const=const, name=name)
        else:
            def dense(feats, name):
                return nn.Dense(feats, dtype=self.dtype,
                                param_dtype=jnp.float32, name=name)

        qkv = dense(3 * c, "qkv")(x)
        qkv = qkv.reshape(bn, n, 3, h, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        idx = relative_position_index(self.full_window)[:n, :n]
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, h)

        if self.use_flash:
            from tim_tpu.ops.pallas_swin import (
                window_attention_flash, window_type_major,
                window_type_major_inverse)

            ab = bias.transpose(2, 0, 1)[None].astype(jnp.float32)
            if mask is not None:
                ab = ab + jnp.asarray(mask)[:, None]
            n_types = ab.shape[0]
            qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            if n_types > 1:
                qh, kh, vh = (window_type_major(t, n_types)
                              for t in (qh, kh, vh))
            out = window_attention_flash(qh, kh, vh, ab, sm_scale=scale)
            if n_types > 1:
                out = window_type_major_inverse(out, n_types)
            out = out.transpose(0, 2, 1, 3).reshape(bn, n, c)
            return dense(c, "proj")(out.astype(self.dtype))

        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bn // nw, nw, h, n, n)
            attn = attn + jnp.asarray(mask)[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bn, h, n, n)

        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(bn, n, c).astype(self.dtype)
        return dense(c, "proj")(out)


class SwinBlock3D(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    shift: bool
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    quantized: bool = False
    act_scales: tuple = ()

    @nn.compact
    def __call__(self, x):
        from tim_tpu.models.common import Int8Dense
        from tim_tpu.ops.quant import filter_scales, scale_for

        b, d, h, w, c = x.shape
        shift_cfg = tuple(i // 2 for i in self.window_size) if self.shift \
            else (0, 0, 0)
        window, shift = effective_window((d, h, w), self.window_size,
                                         shift_cfg)

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        x = x.astype(self.dtype)

        pad_d = (-d) % window[0]
        pad_h = (-h) % window[1]
        pad_w = (-w) % window[2]
        if pad_d or pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w),
                            (0, 0)))
        dp, hp, wp = d + pad_d, h + pad_h, w + pad_w

        if any(s > 0 for s in shift):
            x = jnp.roll(x, (-shift[0], -shift[1], -shift[2]),
                         axis=(1, 2, 3))
            mask = shift_attention_mask((dp, hp, wp), window, shift)
        else:
            mask = None

        windows = window_partition(x, window)
        attn = WindowAttention3D(self.dim, self.window_size, self.num_heads,
                                 self.dtype, use_flash=self.use_flash,
                                 quantized=self.quantized,
                                 act_scales=filter_scales(
                                     self.act_scales, "attn"),
                                 name="attn")(windows, mask)
        x = window_reverse(attn, window, b, dp, hp, wp)

        if any(s > 0 for s in shift):
            x = jnp.roll(x, shift, axis=(1, 2, 3))
        if pad_d or pad_h or pad_w:
            x = x[:, :d, :h, :w]
        x = shortcut + x

        if self.quantized:
            def dense(feats, name):
                const = scale_for(self.act_scales, name)
                return Int8Dense(feats, dtype=self.dtype,
                                 static_acts=const > 0.0,
                                 act_scale_const=const, name=name)
        else:
            def dense(feats, name):
                return nn.Dense(feats, dtype=self.dtype,
                                param_dtype=jnp.float32, name=name)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        y = dense(int(c * self.mlp_ratio), "fc1")(y.astype(self.dtype))
        y = exact_gelu(y)
        y = dense(c, "fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    """2x2 spatial concat -> LayerNorm -> Linear(4C -> 2C)
    (``swin_transformer.py:426-463``)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate([
            x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
            x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="reduction")(
                            x.astype(self.dtype))


class SwinTransformer3D(nn.Module):
    """Video [B, D, H, W, 3] -> feature [B, 8*embed_dim]."""

    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: Tuple[int, int, int] = (16, 7, 7)
    mlp_ratio: float = 4.0
    patch_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    # int8 serving (TPU-native, no reference counterpart): weights from
    # ``ops.quant.quantize_backbone_params``, static activation scales
    # from ``ops.quant.calibrate_act_scales``.
    quantized: bool = False
    act_scales: tuple = ()

    @nn.compact
    def __call__(self, video, pool: bool = True, *,
                 embed_only: bool = False, embedded: bool = False):
        """``embed_only``: return the patch embedding (conv + patch_norm)
        only — a per-temporal-pair map [B, T/pt, H/ph, W/pw, C] with no
        cross-pair coupling (VALID conv, stride == kernel), so dense
        0.2s-hop extraction can embed each unique frame pair ONCE and
        reassemble clips by gather (``extract/dense_media.py``).
        ``embedded``: ``video`` is already that embedding; skip the conv
        (the full param tree still applies — flax ignores unvisited
        params)."""
        from tim_tpu.ops.quant import filter_scales
        if embedded:
            x = video.astype(self.dtype)
        else:
            x = nn.Conv(self.embed_dim, kernel_size=self.patch_size,
                        strides=self.patch_size, padding="VALID",
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="patch_embed")(video.astype(self.dtype))
            if self.patch_norm:
                x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name="patch_norm")(x).astype(self.dtype)
        if embed_only:
            return x

        for i, (depth, heads) in enumerate(zip(self.depths,
                                               self.num_heads)):
            dim = int(self.embed_dim * 2 ** i)
            for j in range(depth):
                x = SwinBlock3D(dim, heads, self.window_size,
                                shift=(j % 2 == 1), mlp_ratio=self.mlp_ratio,
                                dtype=self.dtype, use_flash=self.use_flash,
                                quantized=self.quantized,
                                act_scales=filter_scales(
                                    self.act_scales, f"layer{i}_block{j}"),
                                name=f"layer{i}_block{j}")(x)
            if i < len(self.depths) - 1:
                x = PatchMerging(dim, self.dtype,
                                 name=f"layer{i}_downsample")(x)

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        if pool:
            return jnp.mean(x, axis=(1, 2, 3)).astype(self.dtype)
        return x.astype(self.dtype)


def omnivore_swinB_epic(dtype="float32", use_flash: bool = False,
                        quantized: bool = False) -> SwinTransformer3D:
    """The EPIC-KITCHENS Omnivore trunk config
    (``omnivore_model.py:136-162``).

    ``quantized=True`` (dynamic int8) measured a 16% LOSS on Swin-B
    (30.4 vs 26.1 ms/clip — its per-window matmuls are too small;
    docs/PERFORMANCE.md round 4); available for weight-memory-bound
    deployments only."""
    return SwinTransformer3D(dtype=jnp.dtype(dtype), use_flash=use_flash,
                             quantized=quantized)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _np(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                      else x)


def params_from_torch(state_dict,
                      depths: Sequence[int] = (2, 2, 18, 2)) -> dict:
    """Reference trunk ``state_dict`` (``trunk.*`` stripped) -> flax params.
    """
    sd = state_dict
    params = {
        "patch_embed": {
            "kernel": _np(sd["patch_embed.proj.weight"]).transpose(
                2, 3, 4, 1, 0),
            "bias": _np(sd["patch_embed.proj.bias"]),
        },
        "norm": {"scale": _np(sd["norm.weight"]),
                 "bias": _np(sd["norm.bias"])},
    }
    if "patch_embed.norm.weight" in sd:
        params["patch_norm"] = {
            "scale": _np(sd["patch_embed.norm.weight"]),
            "bias": _np(sd["patch_embed.norm.bias"]),
        }
    for i, depth in enumerate(depths):
        for j in range(depth):
            src = f"layers.{i}.blocks.{j}"
            params[f"layer{i}_block{j}"] = {
                "norm1": {"scale": _np(sd[f"{src}.norm1.weight"]),
                          "bias": _np(sd[f"{src}.norm1.bias"])},
                "norm2": {"scale": _np(sd[f"{src}.norm2.weight"]),
                          "bias": _np(sd[f"{src}.norm2.bias"])},
                "attn": {
                    "relative_position_bias_table": _np(
                        sd[f"{src}.attn.relative_position_bias_table"]),
                    "qkv": {"kernel": _np(sd[f"{src}.attn.qkv.weight"]).T,
                            "bias": _np(sd[f"{src}.attn.qkv.bias"])},
                    "proj": {"kernel": _np(sd[f"{src}.attn.proj.weight"]).T,
                             "bias": _np(sd[f"{src}.attn.proj.bias"])},
                },
                "fc1": {"kernel": _np(sd[f"{src}.mlp.fc1.weight"]).T,
                        "bias": _np(sd[f"{src}.mlp.fc1.bias"])},
                "fc2": {"kernel": _np(sd[f"{src}.mlp.fc2.weight"]).T,
                        "bias": _np(sd[f"{src}.mlp.fc2.bias"])},
            }
        if i < len(depths) - 1:
            params[f"layer{i}_downsample"] = {
                "norm": {
                    "scale": _np(sd[f"layers.{i}.downsample.norm.weight"]),
                    "bias": _np(sd[f"layers.{i}.downsample.norm.bias"])},
                "reduction": {"kernel": _np(
                    sd[f"layers.{i}.downsample.reduction.weight"]).T},
            }
    return {"params": params}
