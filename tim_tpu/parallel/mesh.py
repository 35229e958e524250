"""Device mesh + sharding layout.

Replaces the reference's process-per-GPU DDP/NCCL stack
(``recognition/.../utils/{distributed,multiprocessing}.py``,
``models/build.py:51-63``) with single-controller JAX SPMD:

- a 2-D ``Mesh`` with a ``data`` axis (batch sharding == DDP; gradient
  all-reduce emerges from jit, riding ICI) and an optional ``model`` axis
  (Megatron-style tensor parallelism over attention heads, the FFN hidden
  dim, and the wide classifier heads — the EPIC action head alone is
  1024x3806);
- params carry ``NamedSharding``s; XLA GSPMD inserts the collectives.

The reference's ``all_gather_unaligned`` (pickle-over-gloo) has no role:
ragged metadata stays on the host, and every device-side shape is static.
Multi-host runs use ``jax.distributed.initialize`` +
``multihost_utils.process_allgather`` for host-level aggregation.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data == -1:
        data = len(devices) // model
    assert data * model <= len(devices), (
        f"mesh {data}x{model} needs more than {len(devices)} devices")
    devices = devices[:data * model]
    arr = mesh_utils.create_device_mesh((data, model), devices=devices)
    return Mesh(arr, ("data", "model"))


# (path regex, PartitionSpec) — first match wins; default replicated.
PARTITION_RULES: Tuple[Tuple[str, P], ...] = (
    # attention: shard heads across 'model'
    (r".*self_attn/(q|k|v)/kernel$", P(None, "model")),
    (r".*self_attn/(q|k|v)/bias$", P("model")),
    (r".*self_attn/out/kernel$", P("model", None)),
    # feed-forward: column-parallel then row-parallel
    (r".*linear1/kernel$", P(None, "model")),
    (r".*linear1/bias$", P("model")),
    (r".*linear2/kernel$", P("model", None)),
    # classifier / regression heads: column-parallel over classes
    (r".*cls_head/[^/]+/kernel$", P(None, "model")),
    (r".*cls_head/[^/]+/bias$", P("model")),
)


def _spec_for(path: str) -> P:
    for pattern, spec in PARTITION_RULES:
        if re.match(pattern, path):
            return spec
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _divisible_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop sharding on any dim the array size doesn't divide evenly
    (e.g. a 97-way verb head can't split over model=2 — replicate it)."""
    out = []
    for i, axis in enumerate(spec):
        if axis is None or i >= len(shape):
            out.append(None)
            continue
        if shape[i] % mesh.shape[axis] == 0:
            out.append(axis)
        else:
            out.append(None)
    while out and out[-1] is None:
        out.pop()
    return P(*out)


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree for a param pytree via PARTITION_RULES."""
    def assign(path, leaf):
        spec = _divisible_spec(_spec_for(_path_str(path)),
                               getattr(leaf, "shape", ()), mesh)
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(assign, params)


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Shard every batch array along its leading (batch) axis.

    Single-process: plain ``device_put``. Multi-process: each host holds
    only its local slice of the global batch (the dataset is sharded per
    process, ``data/dataset.py:batch_iterator``), so the global array is
    assembled with ``jax.make_array_from_process_local_data`` — the JAX
    equivalent of DDP's per-rank batches."""
    sh = NamedSharding(mesh, P("data"))
    scalar = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        def put(x):
            x = np.asarray(x)
            if x.ndim >= 1:
                return jax.make_array_from_process_local_data(sh, x)
            return jax.device_put(x, scalar)
        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, sh if np.ndim(x) >= 1 else scalar), batch)


_put_ids_warned = set()


def put_ids(x, mesh: Mesh, batch_axis: int = 0):
    """Place an ids/mask array that is IDENTICAL on every process as a
    global array with ``batch_axis`` sharded over ``data`` (replicated
    when the axis doesn't divide the mesh). This is how the device-bank
    paths compose with multi-host: every process runs ONE identical SPMD
    program over the full id set (a per-process round-robin would give
    each process a different program and break jit lockstep), and the
    data-axis sharding splits the per-chunk compute across all devices.
    Single-process it is a committed ``device_put`` — the same few-KB
    transfer ``jnp.asarray`` would do, plus real data-parallel placement
    on multi-device meshes."""
    x = np.asarray(x)
    axes = [None] * x.ndim
    data = mesh.shape["data"]
    if x.shape[batch_axis] % data == 0:
        axes[batch_axis] = "data"
    elif data > 1:
        key = (x.shape[batch_axis], data)
        if key not in _put_ids_warned:  # once per (size, mesh) pair
            _put_ids_warned.add(key)
            import logging
            logging.getLogger(__name__).warning(
                "put_ids: id axis %d does not divide the data axis (%d) "
                "— falling back to REPLICATED ids, so every device runs "
                "the full batch; pick a batch size divisible by the "
                "data-axis size to data-parallelize the bank paths",
                x.shape[batch_axis], data)
    sh = NamedSharding(mesh, P(*axes))
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def host_local_rows(x) -> np.ndarray:
    """This process's rows of a batch-sharded global array (the rows it
    contributed via ``shard_batch``). Single-process: the whole array."""
    if jax.process_count() == 1:
        return np.asarray(x)
    # outputs replicated over the model axis expose duplicate shards
    # (same index) — keep one copy per distinct row range
    seen = set()
    shards = []
    for sh in x.addressable_shards:
        key = tuple((sl.start, sl.stop) for sl in sh.index)
        if key in seen:
            continue
        seen.add(key)
        # only the leading (batch) axis may be sharded: a non-batch axis
        # split (e.g. a 'model'-sharded class dim GSPMD propagated into
        # the output) would be concatenated along axis 0 below —
        # duplicated rows with half the columns, silently corrupt
        for ax, sl in enumerate(sh.index[1:], start=1):
            if not (sl.start in (None, 0)
                    and sl.stop in (None, x.shape[ax])):
                raise ValueError(
                    "host_local_rows: output is sharded along non-batch "
                    f"axis {ax} (shard index {sh.index}); jit this "
                    "program with replicated out_shardings "
                    "(parallel.mesh.replicate) before fetching")
        shards.append(sh)
    shards.sort(key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def prefetch_to_device(batch_iter, mesh: Mesh, size: int = 2):
    """Overlap host batch assembly + H2D transfer with device compute:
    ``jax.device_put`` is asynchronous, so keeping ``size`` sharded batches
    in flight hides the input pipeline behind the previous step (the role
    of the reference's pinned-memory DataLoader workers)."""
    import collections

    queue = collections.deque()
    for batch in batch_iter:
        queue.append(shard_batch(batch, mesh))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState: params per rules; optimizer moments inherit the
    sharding of the param they track (matched by trailing dict path);
    scalars replicated."""
    p_flat = {
        _path_str(path): NamedSharding(
            mesh, _divisible_spec(_spec_for(_path_str(path)),
                                  getattr(leaf, "shape", ()), mesh))
        for path, leaf
        in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }
    repl = replicate(mesh)

    def assign(path, leaf):
        s = _path_str(path)
        for param_path, sharding in p_flat.items():
            if s.endswith(param_path):
                return jax.device_put(leaf, sharding)
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map_with_path(assign, state)
