"""Audio-guided visual attention pooling (AVGA, from AVEL ECCV'18).

Used only for the AVE dataset when ``apply_feature_pooling`` is set
(``recognition/.../models/helpers/pool.py:6-44``): pools 7x7 visual feature
maps into a single vector per timestep, attended by the audio feature.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from tim_tpu.models.common import xavier_uniform


class AVGA(nn.Module):
    hidden_size: int
    map_size: int = 49
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio, video):
        """audio: [B, T, Da]; video: [B, T, P, Dv] (P spatial positions).
        Returns attended video [B, T, Dv]."""
        b, t, p, dv = video.shape
        assert p == self.map_size, (
            f"AVGA requires P == map_size ({self.map_size}); got P={p}. "
            "The AVEL design ties the attention projection to a 7x7 grid "
            "(reference pool.py:10).")
        v = video.reshape(b * t, p, dv).astype(self.dtype)
        a = audio.reshape(b * t, -1).astype(self.dtype)

        def dense(feats, name, use_bias=True):
            return nn.Dense(feats, use_bias=use_bias, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            kernel_init=xavier_uniform, name=name)

        v_h = nn.relu(dense(self.hidden_size, "affine_video")(v))
        a_h = nn.relu(dense(self.hidden_size, "affine_audio")(a))

        content = (dense(self.map_size, "affine_v", use_bias=False)(v_h)
                   + dense(self.map_size, "affine_g", use_bias=False)(a_h)[:, :, None])
        z = dense(1, "affine_h", use_bias=False)(jnp.tanh(content))[..., 0]
        alpha = nn.softmax(z, axis=-1)                       # [B*T, P]
        pooled = jnp.einsum("np,npd->nd", alpha, v)
        return pooled.reshape(b, t, dv)
