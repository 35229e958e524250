"""Bisect the Swin flash BACKWARD kernel's Mosaic compile on the chip.

The first on-chip attempt died with a relay-side HTTP 500 (the remote
compiler hides the Mosaic error). Variants, each compiled+run at real
window shapes (N=784, dh=32) and checked against the XLA oracle:

  fwd        forward kernel only (known-good sanity)
  bwd        the shipped backward pallas_call (4 outputs, dab revisited)
  bwd_nodab  same kernel minus the dab output (isolates the revisited-
             output accumulation pattern)
  vjp        full jax.grad through window_attention_flash

Run on the chip:  python scripts/bisect_swin_bwd.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from tim_tpu.ops import pallas_swin as ps

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    n_types, rep, h, n, dh = 2, 2, 2, 784, 32
    bw = n_types * rep
    q, k, v = (jnp.asarray(rng.normal(size=(bw, h, n, dh)) * 0.1,
                           jnp.bfloat16) for _ in range(3))
    ab = jnp.asarray(rng.normal(size=(n_types, h, n, n)), jnp.float32)
    do = jnp.asarray(rng.normal(size=(bw, h, n, dh)) * 0.1, jnp.bfloat16)
    scale = dh ** -0.5

    # the first on-chip failure was a scoped-vmem compile OOM (17.97M >
    # 16M): the flag variants test the documented fix
    VMEM = ps.SWIN_FLASH_TRAIN_COMPILER_OPTIONS

    def attempt(name, fn):
        t0 = time.time()
        try:
            out = jax.tree_util.tree_map(np.asarray, fn())
            print(f"[bisect] {name}: OK ({time.time() - t0:.1f}s)",
                  flush=True)
            return out
        except Exception as e:
            print(f"[bisect] {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            return None

    fwd = attempt("fwd", lambda: jax.jit(
        lambda *a: ps._fwd_call(*a, scale, False))(q, k, v, ab))

    bwd = attempt("bwd", lambda: jax.jit(
        lambda *a: ps._bwd_call(*a, scale, False))(q, k, v, ab, do))
    if bwd is None:
        bwd = attempt("bwd+vmem32M", lambda: jax.jit(
            lambda *a: ps._bwd_call(*a, scale, False),
            compiler_options=VMEM)(q, k, v, ab, do))

    class _DabStub:
        """Swallows the kernel's dab writes so the same body compiles
        without the revisited fourth output."""

        dtype = jnp.float32

        def __setitem__(self, *a):
            pass

        def __getitem__(self, idx):
            return jnp.zeros((), jnp.float32)

    # same kernel body, dab dropped from the outputs
    def _nodab_kernel(q_ref, k_ref, v_ref, ab_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, *, sm_scale, rep):
        ps._bwd_kernel(q_ref, k_ref, v_ref, ab_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, _DabStub(),
                       sm_scale=sm_scale, rep=rep)

    def nodab():
        qkv_spec, ab_spec = ps._specs(bw, h, n, dh, rep)
        return pl.pallas_call(
            functools.partial(_nodab_kernel, sm_scale=scale, rep=rep),
            grid=(h, bw),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, ab_spec, qkv_spec],
            out_specs=[qkv_spec, qkv_spec, qkv_spec],
            out_shape=[jax.ShapeDtypeStruct((bw, h, n, dh), q.dtype)] * 3,
        )(q, k, v, ab, do)

    attempt("bwd_nodab", lambda: jax.jit(nodab)())

    def vjp(opts=None):
        def loss(q, k, v, ab):
            out = ps.window_attention_flash(q, k, v, ab, sm_scale=scale)
            return jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32))
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)),
                       compiler_options=opts)(q, k, v, ab)

    grads = attempt("vjp", vjp)
    if grads is None:
        grads = attempt("vjp+vmem32M", lambda: vjp(VMEM))

    if bwd is not None:
        # numeric check vs the XLA oracle
        def oracle(q, k, v, ab):
            s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * scale
            s = s + ab[jnp.arange(bw) // rep]
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                              preferred_element_type=jnp.float32) \
                .astype(q.dtype)

        def loss_o(q, k, v, ab):
            return jnp.sum(oracle(q, k, v, ab).astype(jnp.float32)
                           * do.astype(jnp.float32))

        want = jax.jit(jax.grad(loss_o, argnums=(0, 1, 2, 3)))(q, k, v, ab)
        for g, w, nm in zip(bwd, jax.tree_util.tree_map(np.asarray, want),
                            "dq dk dv dab".split()):
            d = np.abs(np.asarray(g, np.float32)
                       - np.asarray(w, np.float32)).max()
            sc = max(np.abs(np.asarray(w, np.float32)).max(), 1e-6)
            print(f"[bisect] {nm}: max|d| {d:.3e} (scale {sc:.3e})",
                  flush=True)


if __name__ == "__main__":
    main()
