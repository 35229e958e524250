"""Feature + CLS-token sequence assembly.

Re-implements the reference encodings
(``recognition/.../models/helpers/encodings.py:7-251`` and the detection
variant without verb/noun CLS tokens) as one flax module:

- per-modality embedder: Dropout -> Linear(D_in -> d) -> GELU -> LayerNorm;
- time encodings are *concatenated* channel-wise (tokens become 2d wide);
- learnable modality embeddings are *added* (audio_visual input only);
- learnable CLS tokens are expanded per query and concatenated with the
  query-interval time encodings.

Sequence layout (audio_visual, recognition):
  [vis*F | aud*F | verb_cls*Nv | noun_cls*Nv | action_cls*Nv | audio_cls*Na]
Detection drops the verb/noun CLS sets. Heads slice from the tail in this
order (``helpers/head.py``).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from tim_tpu.models.common import TorchLinear, cls_token_init, exact_gelu


class FeatureEmbedder(nn.Module):
    """Dropout -> Linear -> GELU -> LayerNorm (``encodings.py:21-26``)."""

    d_model: int
    feat_dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dropout(self.feat_dropout, deterministic=deterministic)(x)
        x = TorchLinear(self.d_model, dtype=self.dtype, name="proj")(x)
        x = exact_gelu(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return x.astype(self.dtype)


class FeatureEncoding(nn.Module):
    """Builds the [B, S, 2*d_model] token sequence for the encoder."""

    d_model: int
    input_modality: str          # visual | audio | audio_visual
    data_modality: str           # visual | audio | audio_visual
    feat_dropout: float = 0.5
    seq_dropout: float = 0.5
    num_feats: int = 50
    use_verb_noun_cls: bool = True   # False for the detection variant
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d, wide = self.d_model, 2 * self.d_model
        if "visual" in self.input_modality:
            self.visual_embedder = FeatureEmbedder(
                d, self.feat_dropout, self.dtype, name="visual_embedder")
        if "audio" in self.input_modality:
            self.audio_embedder = FeatureEmbedder(
                d, self.feat_dropout, self.dtype, name="audio_embedder")

        if self.input_modality == "audio_visual":
            self.visual_modality_encoding = self.param(
                "visual_modality_encoding", cls_token_init, (1, 1, wide))
            self.audio_modality_encoding = self.param(
                "audio_modality_encoding", cls_token_init, (1, 1, wide))

        if "visual" in self.data_modality:
            self.visual_action_cls = self.param(
                "visual_action_cls", cls_token_init, (1, 1, d))
            if self.use_verb_noun_cls:
                self.visual_verb_cls = self.param(
                    "visual_verb_cls", cls_token_init, (1, 1, d))
                self.visual_noun_cls = self.param(
                    "visual_noun_cls", cls_token_init, (1, 1, d))
        if "audio" in self.data_modality:
            self.audio_action_cls = self.param(
                "audio_action_cls", cls_token_init, (1, 1, d))

        self.seq_dropout_layer = nn.Dropout(self.seq_dropout)

    def __call__(
        self,
        v_feats,
        a_feats,
        time_encodings,
        num_v_queries: int,
        num_a_queries: int,
        *,
        deterministic: bool = True,
    ):
        """Args:
          v_feats: [B, F, Dv] or None
          a_feats: [B, F, Da] or None
          time_encodings: [B, T, d] where the first ``num_ctx`` rows encode
            feature times and the rest query intervals (visual then audio).
        Returns [B, S, 2*d_model].
        """
        av = self.input_modality == "audio_visual"
        nf = self.num_feats
        te = time_encodings.astype(self.dtype)

        parts = []
        offset = 0
        if "visual" in self.input_modality:
            vis = self.visual_embedder(
                v_feats.astype(self.dtype), deterministic=deterministic)
            vis = jnp.concatenate([vis, te[:, offset:offset + nf]], axis=-1)
            if av:
                vis = vis + self.visual_modality_encoding.astype(self.dtype)
            parts.append(vis)
            offset += nf
        if "audio" in self.input_modality:
            aud = self.audio_embedder(
                a_feats.astype(self.dtype), deterministic=deterministic)
            aud = jnp.concatenate([aud, te[:, offset:offset + nf]], axis=-1)
            if av:
                aud = aud + self.audio_modality_encoding.astype(self.dtype)
            parts.append(aud)
            offset += nf

        query_te = te[:, offset:]
        batch = time_encodings.shape[0]

        def cls_tokens(token, n, t_enc, modality_enc):
            tok = jnp.broadcast_to(
                token.astype(self.dtype), (batch, n, self.d_model))
            tok = jnp.concatenate([tok, t_enc], axis=-1)
            if modality_enc is not None:
                tok = tok + modality_enc.astype(self.dtype)
            return tok

        if "visual" in self.data_modality and num_v_queries > 0:
            v_te = query_te[:, :num_v_queries]
            v_mod = self.visual_modality_encoding if av else None
            if self.use_verb_noun_cls:
                parts.append(cls_tokens(
                    self.visual_verb_cls, num_v_queries, v_te, v_mod))
                parts.append(cls_tokens(
                    self.visual_noun_cls, num_v_queries, v_te, v_mod))
            parts.append(cls_tokens(
                self.visual_action_cls, num_v_queries, v_te, v_mod))

        if "audio" in self.data_modality and num_a_queries > 0:
            a_te = query_te[:, -num_a_queries:]
            a_mod = self.audio_modality_encoding if av else None
            parts.append(cls_tokens(
                self.audio_action_cls, num_a_queries, a_te, a_mod))

        seq = jnp.concatenate(parts, axis=1)
        seq = self.seq_dropout_layer(seq, deterministic=deterministic)
        return seq
