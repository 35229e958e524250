"""Exact-softmax stand-in for the TPU-only Pallas flash kernel.

Honors the kernel's call signature and segment-id contract (mask where
``q_seg != kv_seg``) so the pad-to-128 wrapper in ``tim_tpu.ops.flash``
can be pinned on CPU. Real-kernel numerics stay TPU-gated in
tests/test_flash_attention.py.
"""

import jax
import jax.numpy as jnp


def fake_flash_kernel(seen=None, calls=None):
    """Returns a monkeypatch target for ``fa.flash_attention``.

    ``seen`` (dict) records the last call's block sizes / shapes /
    segment ids; ``calls`` (list) appends each call's REAL (unpadded)
    q length — only usable outside jit.
    """

    def fake_flash(q, k, v, ab=None, segment_ids=None, *, sm_scale,
                   block_sizes, causal=False):
        assert ab is None and not causal
        if seen is not None:
            seen["block_sizes"] = block_sizes
            seen["sm_scale"] = sm_scale
            seen["shape"] = tuple(q.shape)
            seen["segment_ids"] = segment_ids
        if calls is not None:
            calls.append(int(segment_ids.q[0].sum())
                         if segment_ids is not None else q.shape[2])
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * sm_scale
        if segment_ids is not None:
            mask = (segment_ids.q[:, None, :, None]
                    == segment_ids.kv[:, None, None, :])
            s = jnp.where(mask, s, -1e30)
        attn = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", attn,
                          v.astype(jnp.float32)).astype(q.dtype)

    return fake_flash
