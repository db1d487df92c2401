"""Device mesh + sharding helpers (the NCCL/DDP replacement).

The reference scales only by batch data-parallelism over NCCL
(SURVEY.md §2.4); here the same axis is a ``jax.sharding.Mesh`` ``dp``
dimension: inputs are sharded on their batch axis, parameters are
replicated, and XLA inserts the gradient all-reduce (psum) over ICI when a
jitted train step consumes dp-sharded data and emits replicated grads. A
``tp`` axis is reserved for tensor/head sharding of the FGT attention.

Rank/world discovery, TCP rendezvous, and free-port probing from the
reference (FGT/utils/dist.py, train.py:17-21) are replaced by
``jax.distributed.initialize`` when running multi-host.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a (dp, tp[, sp]) mesh over the available devices.

    ``sp`` (innermost, so its all-to-alls ride adjacent ICI links) is the
    temporal sequence-parallel axis consumed by ``FGTConfig.seq_axis``;
    the axis is added only when sp > 1 so existing (dp, tp) call sites and
    specs are unchanged.
    """
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // (tp * sp)
    assert dp * tp * sp == len(devices), \
        f"dp({dp}) * tp({tp}) * sp({sp}) != #devices({len(devices)})"
    if sp > 1:
        arr = np.asarray(devices).reshape(dp, tp, sp)
        return Mesh(arr, axis_names=("dp", "tp", "sp"))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_batch(mesh: Mesh, tree):
    """Device-put a host batch with its leading axis sharded over dp."""
    sh = shard_batch(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def put_replicated(mesh: Mesh, tree):
    sh = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
