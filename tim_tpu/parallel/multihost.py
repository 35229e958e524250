"""Multi-host coordination.

Replaces the reference's torch.distributed surface
(``recognition/.../utils/distributed.py``): NCCL process groups ->
``jax.distributed.initialize``; ``all_gather`` (pad-to-largest) and
``all_gather_unaligned`` (pickle-over-gloo) -> host-level
``process_allgather``; device-side reductions happen inside jit via the
mesh and need no explicit calls.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (no-op when single-process).
    Equivalent of ``dist.init_process_group`` + ``launch_job``
    (``utils/misc.py:88-116``) — but one controller per host, no
    process-per-device spawn."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def process_count() -> int:
    return jax.process_count()


def is_master() -> bool:
    return jax.process_index() == 0


def allgather_host_arrays(x: np.ndarray) -> np.ndarray:
    """Gather a host numpy array from every process and concatenate along
    axis 0 — the role of ``du.all_gather`` for ragged metadata
    (``distributed.py:193-265``). Single-process: identity."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.concatenate(list(gathered), axis=0)


def allreduce_host_scalars(values: dict) -> dict:
    """Mean-reduce a dict of host scalars across processes
    (``du.all_reduce`` average semantics)."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in values.items()}
    from jax.experimental import multihost_utils
    keys = sorted(values)
    arr = np.asarray([float(values[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(arr)
    mean = np.mean(np.asarray(gathered), axis=0)
    return dict(zip(keys, mean.tolist()))


def allreduce_host_array(x: np.ndarray, op: str = "sum") -> np.ndarray:
    """Element-wise reduce a host numpy array across processes (sum/max) —
    used to merge per-host metric accumulators (the reference gathers
    meter tensors with ``du.all_gather`` then ``index_add_``s on rank 0).
    Single-process: identity."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    gathered = np.asarray(multihost_utils.process_allgather(np.asarray(x)))
    return gathered.max(axis=0) if op == "max" else gathered.sum(axis=0)


def barrier(name: str = "barrier") -> None:
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
