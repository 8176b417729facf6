"""Mesh + sharding helpers (data-parallel over ICI).

Replaces the reference's ``torch.nn.DataParallel`` scatter/gather
(tools/train_net.py:127, lib/fcn/train.py:57-60) with the idiomatic JAX
recipe: one ``Mesh`` over the chips, batch arrays sharded over the ``data``
axis via ``NamedSharding``, parameters replicated.  ``jax.jit`` then compiles
the gradient reduction as an XLA all-reduce over ICI — no hand-written
communication layer (SURVEY.md §2.6).

The same helpers serve multi-host setups: ``jax.devices()`` already spans
hosts after ``jax.distributed.initialize``, and ``shard_batch`` only touches
addressable shards.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Device-put a pytree of [B, ...] arrays with B split across the mesh.

    B must be divisible by the mesh size — the CALLER's responsibility:
    training rounds batch_size to a device multiple and uses
    DataLoader(drop_last=True); the sharded evaluator pads trailing
    partial batches itself (engine/evaluate.py).
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
