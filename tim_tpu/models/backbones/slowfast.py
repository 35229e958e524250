"""Auditory SlowFast (audio feature backbone), TPU-native.

Rebuild of the reference's two-pathway audio ResNet
(``feature_extractors/auditory_slowfast/slowfast/models/
{audio_model_builder,resnet_helper,stem_helper,head_helper}.py``):
log-mel spectrograms enter a Slow (temporally subsampled by alpha) and a
Fast pathway of a 2-D ResNet-50 whose convs act on (time, frequency);
Fast->Slow fusion convs after the stem and stages 2-4; the head average-
pools both pathways and concatenates to the 2304-d feature TIM consumes.

Layout is NHWC ([B, T, F, C]); torch checkpoints convert via
``params_from_torch``. EPIC-Sounds config: R50, alpha 4, beta_inv 8,
fusion ratio 2 / kernel 7 (``configs/EPIC-SOUNDS/SLOWFAST_R50.yaml``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

STAGE_DEPTHS_R50 = (3, 4, 6, 3)
# conv1/res2..res5 temporal kernels per pathway (audio_model_builder.py:20-42)
TEMPORAL_KERNELS = {"slow": (1, 1, 1, 3, 3), "fast": (5, 3, 3, 3, 3)}


def _conv(features, kernel, stride, padding, name, dilation=(1, 1)):
    # torch pads dilated convs by `dilation` (resnet_helper.py:193-202);
    # padding entries here are pre-dilation and scale with it.
    pad = tuple((p * d, p * d) for p, d in zip(padding, dilation))
    return nn.Conv(
        features, kernel_size=tuple(kernel), strides=tuple(stride),
        padding=pad, kernel_dilation=tuple(dilation), use_bias=False,
        param_dtype=jnp.float32, name=name)


def _bn(x, name, train):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        param_dtype=jnp.float32, name=name)(x)


def _max_pool_3x3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class Stem(nn.Module):
    """Conv([t,7], stride [2,2]) -> BN -> ReLU -> MaxPool 3x3/2
    (``stem_helper.py:100-174``)."""

    dim_out: int
    temp_kernel: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv(self.dim_out, (self.temp_kernel, 7), (2, 2),
                  (self.temp_kernel // 2, 3), "conv")(x)
        x = _bn(x, "bn", train)
        x = nn.relu(x)
        return _max_pool_3x3s2(x)


class Bottleneck(nn.Module):
    """Tx1 -> 1x3 (freq stride/dilation) -> 1x1, BN after each
    (``resnet_helper.py:107-237``)."""

    dim_out: int
    dim_inner: int
    temp_kernel: int
    stride: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _conv(self.dim_inner, (self.temp_kernel, 1), (1, 1),
                  (self.temp_kernel // 2, 0), "a")(x)
        h = _bn(h, "a_bn", train)
        h = nn.relu(h)
        h = _conv(self.dim_inner, (1, 3), (1, self.stride),
                  (0, 1), "b", dilation=(1, self.dilation))(h)
        h = _bn(h, "b_bn", train)
        h = nn.relu(h)
        h = _conv(self.dim_out, (1, 1), (1, 1), (0, 0), "c")(h)
        return _bn(h, "c_bn", train)


class ResBlock(nn.Module):
    dim_out: int
    dim_inner: int
    temp_kernel: int
    stride: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim_in = x.shape[-1]
        h = Bottleneck(self.dim_out, self.dim_inner, self.temp_kernel,
                       self.stride, self.dilation, name="branch2")(x, train)
        if dim_in != self.dim_out or self.stride != 1:
            x = _conv(self.dim_out, (1, 1), (1, self.stride), (0, 0),
                      "branch1")(x)
            x = _bn(x, "branch1_bn", train)
        return nn.relu(x + h)


class FuseFastToSlow(nn.Module):
    """Strided temporal conv from Fast concatenated onto Slow
    (``audio_model_builder.py:51-108``)."""

    ratio: int
    kernel: int
    alpha: int

    @nn.compact
    def __call__(self, slow, fast, train: bool = False):
        f = _conv(fast.shape[-1] * self.ratio, (self.kernel, 1),
                  (self.alpha, 1), (self.kernel // 2, 0), "conv_f2s")(fast)
        f = _bn(f, "bn", train)
        f = nn.relu(f)
        return jnp.concatenate([slow, f], axis=-1), fast


class AuditorySlowFast(nn.Module):
    """Two-pathway audio ResNet. Input: (slow [B, T/alpha, F, 1],
    fast [B, T, F, 1]). Returns (logits, 2304-d feature)."""

    num_classes: int = 44
    width: int = 64
    alpha: int = 4
    beta_inv: int = 8
    fusion_ratio: int = 2
    fusion_kernel: int = 7
    depths: Sequence[int] = STAGE_DEPTHS_R50
    freq_strides: Sequence[int] = (1, 2, 2, 2)
    freq_dilations: Sequence[int] = (1, 1, 1, 1)
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, slow, fast, *, train: bool = False):
        w, binv = self.width, self.beta_inv
        slow = Stem(w, TEMPORAL_KERNELS["slow"][0],
                    name="s1_pathway0_stem")(slow, train)
        fast = Stem(w // binv, TEMPORAL_KERNELS["fast"][0],
                    name="s1_pathway1_stem")(fast, train)
        slow, fast = FuseFastToSlow(
            self.fusion_ratio, self.fusion_kernel, self.alpha,
            name="s1_fuse")(slow, fast, train)

        stage_dims = [w * 4, w * 8, w * 16, w * 32]
        inner_dims = [w, w * 2, w * 4, w * 8]
        for s, (dim, inner, depth) in enumerate(
                zip(stage_dims, inner_dims, self.depths)):
            t_slow = TEMPORAL_KERNELS["slow"][s + 1]
            t_fast = TEMPORAL_KERNELS["fast"][s + 1]
            for i in range(depth):
                stride = self.freq_strides[s] if i == 0 else 1
                slow = ResBlock(dim, inner, t_slow, stride,
                                self.freq_dilations[s],
                                name=f"s{s + 2}_pathway0_res{i}")(
                                    slow, train)
                fast = ResBlock(dim // binv, inner // binv, t_fast, stride,
                                self.freq_dilations[s],
                                name=f"s{s + 2}_pathway1_res{i}")(
                                    fast, train)
            if s < 3:
                slow, fast = FuseFastToSlow(
                    self.fusion_ratio, self.fusion_kernel, self.alpha,
                    name=f"s{s + 2}_fuse")(slow, fast, train)

        # head (``head_helper.py:76-117``): global avg pool, concat,
        # dropout (training only), linear. The reference applies
        # Dropout(0.5) to the pooled features feeding BOTH the
        # projection and the returned 2304-d feature (it clones x
        # after dropout, ``head_helper.py:88-109``) — match that for
        # end-to-end finetuning parity; eval/extraction is unaffected.
        slow_pool = jnp.mean(slow, axis=(1, 2))
        fast_pool = jnp.mean(fast, axis=(1, 2))
        feature = jnp.concatenate([slow_pool, fast_pool], axis=-1)
        if train and self.dropout_rate > 0.0:
            feature = nn.Dropout(self.dropout_rate,
                                 deterministic=False)(feature)
        logits = nn.Dense(self.num_classes, param_dtype=jnp.float32,
                          name="projection")(feature)
        if not train:
            logits = nn.softmax(logits, axis=-1)
        return logits, feature


def pack_pathways(spectrogram: jnp.ndarray, alpha: int = 4):
    """[B, T, F, 1] -> (slow [B, T/alpha, F, 1], fast) — the temporal
    subsampling of ``utils.pack_pathway_output`` (torch.index_select with
    linspace(0, T-1, T//alpha))."""
    t = spectrogram.shape[1]
    idx = jnp.linspace(0, t - 1, t // alpha).astype(jnp.int32)
    return spectrogram[:, idx], spectrogram


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _np(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                      else x)


def _conv_p(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}


def _bn_p(sd, key):
    return (
        {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])},
        {"mean": _np(sd[f"{key}.running_mean"]),
         "var": _np(sd[f"{key}.running_var"])},
    )


def params_from_torch(state_dict, depths: Sequence[int] = STAGE_DEPTHS_R50):
    """Reference ASF ``state_dict`` -> {'params', 'batch_stats'} tree."""
    sd = state_dict
    params, stats = {}, {}

    def add_bn(dst_params, dst_stats, name, src):
        p, s = _bn_p(sd, src)
        dst_params[name] = p
        dst_stats[name] = s

    for p_idx in (0, 1):
        name = f"s1_pathway{p_idx}_stem"
        params[name] = {"conv": _conv_p(sd, f"s1.pathway{p_idx}_stem.conv")}
        stats[name] = {}
        add_bn(params[name], stats[name], "bn",
               f"s1.pathway{p_idx}_stem.bn")

    for fuse_idx, src in (("s1_fuse", "s1_fuse"), ("s2_fuse", "s2_fuse"),
                          ("s3_fuse", "s3_fuse"), ("s4_fuse", "s4_fuse")):
        params[fuse_idx] = {"conv_f2s": _conv_p(sd, f"{src}.conv_f2s")}
        stats[fuse_idx] = {}
        add_bn(params[fuse_idx], stats[fuse_idx], "bn", f"{src}.bn")

    for s, depth in enumerate(depths):
        for p_idx in (0, 1):
            for i in range(depth):
                src = f"s{s + 2}.pathway{p_idx}_res{i}"
                name = f"s{s + 2}_pathway{p_idx}_res{i}"
                block_p: dict = {"branch2": {}}
                block_s: dict = {"branch2": {}}
                for leaf in ("a", "b", "c"):
                    block_p["branch2"][leaf] = _conv_p(
                        sd, f"{src}.branch2.{leaf}")
                    add_bn(block_p["branch2"], block_s["branch2"],
                           f"{leaf}_bn", f"{src}.branch2.{leaf}_bn")
                if f"{src}.branch1.weight" in sd:
                    block_p["branch1"] = _conv_p(sd, f"{src}.branch1")
                    add_bn(block_p, block_s, "branch1_bn",
                           f"{src}.branch1_bn")
                params[name] = block_p
                stats[name] = block_s

    params["projection"] = {
        "kernel": _np(sd["head.projection.weight"]).T,
        "bias": _np(sd["head.projection.bias"]),
    }
    return {"params": params, "batch_stats": stats}
