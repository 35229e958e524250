"""Checkpoint save/load.

Reference behavior replicated (``recognition/.../utils/checkpoint.py``):
per-epoch full train-state snapshots, "best" copies per metric axis, and a
shape-matched non-strict partial load that logs mismatches (``:20-36``).
Serialization is flax msgpack (host numpy), no torch dependency.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def fully_addressable(state) -> bool:
    """True when every array leaf of ``state`` is host-fetchable by this
    process — the precondition for the msgpack path, whose ``_to_host``
    (np.asarray per leaf) cannot materialize shards held only by other
    hosts. Fully-REPLICATED leaves qualify even when their sharding spans
    other processes (jax serves them from a local shard), so ordinary
    multi-host data-parallel states keep the msgpack path (master-only
    write, best-variant copies, ``--resume`` compatible); only genuinely
    cross-host-sharded (model-parallel) states must go through
    ``save_checkpoint_orbax`` (each host writes its own shards)."""
    return all(
        getattr(leaf, "is_fully_addressable", True)
        or getattr(leaf, "is_fully_replicated", False)
        for leaf in jax.tree_util.tree_leaves(state))


def save_checkpoint(
    path: str,
    state,
    *,
    epoch: int = 0,
    extra: Optional[Dict[str, Any]] = None,
    is_best: str = "none",
) -> None:
    """Write ``<path>/checkpoint.msgpack`` (+ best-variant copies, matching
    the reference's best_<axis>.pyth naming scheme, ``checkpoint.py:53-71``).

    Requires host-addressable state (see ``fully_addressable``); the
    runners route cross-host-sharded states to the orbax backend.
    """
    if not fully_addressable(state):
        raise ValueError(
            "state has shards on other hosts; msgpack save would "
            "deadlock or corrupt — use save_checkpoint_orbax")
    os.makedirs(path, exist_ok=True)
    payload = _state_payload(state, epoch, extra, host=True)
    blob = serialization.msgpack_serialize(payload)
    fname = os.path.join(path, "checkpoint.msgpack")
    with open(fname, "wb") as f:
        f.write(blob)
    if is_best and is_best != "none":
        for tag in is_best.split("_"):
            if not tag:
                continue
            with open(os.path.join(path, f"best_{tag}.msgpack"), "wb") as f:
                f.write(blob)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Read ``<path>/checkpoint.msgpack`` (or a ``.msgpack`` file path).
    Falls back to the newest ``<path>/orbax/<epoch>`` checkpoint when no
    msgpack file exists, so ``--resume``/``--pretrained_model`` work on
    output dirs written by orbax-routed runs (cross-host-sharded saves);
    pass ``params_shardings`` to ``load_checkpoint_orbax`` directly to
    restore large params straight to their mesh placement instead."""
    fname = path if path.endswith(".msgpack") else os.path.join(
        path, "checkpoint.msgpack")
    if (not os.path.exists(fname) and not path.endswith(".msgpack")
            and os.path.isdir(os.path.join(path, "orbax"))):
        return load_checkpoint_orbax(path)
    with open(fname, "rb") as f:
        return serialization.msgpack_restore(f.read())


# ---------------------------------------------------------------------------
# Orbax backend (beyond reference): async, multi-host-coordinated, and
# restore-direct-to-sharding — the production path for large meshes. The
# msgpack path above stays the default (single-host, torch-free, simple).
# ---------------------------------------------------------------------------


def _state_payload(state, epoch: int, extra, *, host: bool):
    """``host=True`` materializes numpy copies (msgpack). ``host=False``
    keeps (possibly sharded) jax.Arrays — orbax writes each host's
    addressable shards directly, so multi-host-sharded params save
    without ever assembling an unsharded copy."""
    conv = _to_host if host else (lambda t: t)
    return {
        "epoch": np.asarray(epoch),
        "step": np.asarray(state.step),
        "params": conv(state.params),
        "opt_state": serialization.to_state_dict(conv(state.opt_state)),
        "normaliser": np.asarray(state.normaliser),
        "extra": extra or {},
    }


def save_checkpoint_orbax(path: str, state, *, epoch: int = 0,
                          extra: Optional[Dict[str, Any]] = None,
                          wait: bool = True, ckptr=None):
    """Write ``<path>/orbax/<epoch>`` with orbax. ``wait=False`` saves
    asynchronously (training continues while the host writes) — pass the
    RETURNED checkpointer back as ``ckptr`` on the next save so
    consecutive saves serialize (orbax blocks a new save until the same
    instance's previous one commits), and call
    ``.wait_until_finished()`` after the last save. Params are handed
    to orbax as-is: sharded (even multi-host-sharded) arrays save each
    host's addressable shards without assembling unsharded copies.
    Multi-host runs coordinate automatically once ``jax.distributed``
    is initialized."""
    import orbax.checkpoint as ocp

    if ckptr is None:
        ckptr = (ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                 if not wait else ocp.StandardCheckpointer())
    target = os.path.join(os.path.abspath(path), "orbax", str(epoch))
    ckptr.save(target, _state_payload(state, epoch, extra, host=False),
               force=True)
    if wait:
        ckptr.wait_until_finished()
    return ckptr


def load_checkpoint_orbax(path: str, epoch: Optional[int] = None,
                          params_shardings: Optional[Any] = None
                          ) -> Dict[str, Any]:
    """Restore ``<path>/orbax/<epoch>`` (latest epoch when None).

    ``params_shardings``: optional pytree of ``NamedSharding`` matching
    the params tree (e.g. from ``parallel.param_shardings``) — params
    then restore DIRECTLY to their mesh placement, never materializing
    unsharded copies on one host. The abstract restore target is rebuilt
    from the checkpoint's own metadata, so the other payload entries
    (step, opt_state, ...) restore unchanged."""
    import orbax.checkpoint as ocp

    root = os.path.join(os.path.abspath(path), "orbax")
    if epoch is None:
        epochs = [int(d) for d in os.listdir(root) if d.isdigit()]
        if not epochs:
            raise FileNotFoundError(f"no orbax checkpoints under {root}")
        epoch = max(epochs)
    ckptr = ocp.StandardCheckpointer()
    target_dir = os.path.join(root, str(epoch))
    if params_shardings is None:
        return ckptr.restore(target_dir)

    meta = dict(ckptr.metadata(target_dir).item_metadata)
    flat_sh = {
        tuple(str(getattr(k, "key", k)) for k in p): s
        for p, s in jax.tree_util.tree_flatten_with_path(
            params_shardings)[0]}

    def abstractify(p, leaf):
        keys = tuple(str(getattr(k, "key", k)) for k in p)
        if not (hasattr(leaf, "shape") and hasattr(leaf, "dtype")):
            return leaf
        sharding = (flat_sh.get(keys[1:])
                    if keys and keys[0] == "params" else None)
        return jax.ShapeDtypeStruct(tuple(leaf.shape), leaf.dtype,
                                    sharding=sharding)

    target = jax.tree_util.tree_map_with_path(abstractify, meta)
    return ckptr.restore(target_dir, target)


def shape_matched_merge(init_params, loaded_params):
    """Keep loaded leaves whose path+shape match the freshly-initialized
    tree; fall back to init values elsewhere, logging both directions
    (non-strict load, ``checkpoint.py:20-36``)."""
    flat_init = _flatten(init_params)
    flat_loaded = _flatten(loaded_params)
    merged = {}
    for key, val in flat_init.items():
        if key in flat_loaded and tuple(np.shape(flat_loaded[key])) == \
                tuple(np.shape(val)):
            merged[key] = np.asarray(flat_loaded[key])
        else:
            if key in flat_loaded:
                logger.warning("shape mismatch for %s: ckpt %s vs init %s",
                               key, np.shape(flat_loaded[key]),
                               np.shape(val))
            else:
                logger.warning("missing from checkpoint: %s", key)
            merged[key] = val
    for key in flat_loaded:
        if key not in flat_init:
            logger.warning("unused checkpoint entry: %s", key)
    return _unflatten(merged)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out["/".join(prefix)] = tree
    return out


def _unflatten(flat):
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def restore_train_state(state, payload):
    """Full resume: params + optimizer + step + normaliser."""
    params = shape_matched_merge(
        serialization.to_state_dict(_to_host(state.params)),
        payload["params"])
    opt_state = serialization.from_state_dict(
        state.opt_state, payload["opt_state"])
    import jax.numpy as jnp
    return state.replace(
        step=jnp.asarray(payload["step"]),
        params=params,
        opt_state=opt_state,
        normaliser=jnp.asarray(payload["normaliser"]),
    )
