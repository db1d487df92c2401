"""Tensor-parallel partition rules for the FGT transformer (Megatron-style).

The reference scales only by batch data parallelism (SURVEY.md §2.4 —
DDP/NCCL; no TP/PP/SP anywhere). On TPU, tensor parallelism is pure
sharding *metadata*: we lay out the attention q/k/v projection weights
column-parallel (output features, i.e. heads, split over the ``tp`` mesh
axis), the attention out-projection and fusion-FFN down-projection
row-parallel (input features split), and let XLA's SPMD partitioner
propagate the shardings through the window-attention einsums and insert
the psum after each row-parallel matmul. No model code changes, no
hand-written collectives — this is the idiomatic JAX/XLA equivalent of
Megatron TP.

Head math: ``d_model`` is split into ``(num_heads, head_ch)`` by a
reshape; a tp-sharding of the feature axis therefore lands on the head
axis as long as ``num_heads % tp == 0`` (128-entry head_ch tiles stay
contiguous per device). The fusion FFN's hidden axis is laid out
channel-major over ``kernel_h*kernel_w`` patch positions
(``ops/ffn.py``), so a tp split at multiples of ``k*k`` keeps whole
fold-channels per device; the fold/unfold pair is channel-independent
and SPMD keeps the shard.

Rules are matched against the '/'-joined *suffix* of each leaf path, so
the same table partitions both a params tree and the optax Adam state
(whose mu/nu subtrees mirror the param paths).
"""

from __future__ import annotations

import logging
import re
from typing import Iterable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger("fgt_tpu")

# (path regex, spec). First match wins; no match -> replicated.
# Column-parallel: q/k/v embeddings and FFN up-projection (split output
# features / heads). Row-parallel: attention out and FFN down-projection
# (split input features; XLA inserts the all-reduce on their outputs).
FGT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r"attention/(query|key|value)/kernel$", P(None, "tp")),
    (r"attention/(query|key|value)/bias$", P("tp")),
    (r"attention/out/kernel$", P("tp", None)),
    (r"ffn/conv1/kernel$", P(None, "tp")),
    (r"ffn/conv1/bias$", P("tp")),
    (r"ffn/conv2/kernel$", P("tp", None)),
)


def _flatten_with_paths(tree):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = []
    for path, leaf in leaves_with_paths:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            elif hasattr(p, "name"):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        out.append(("/".join(parts), leaf))
    return out


def _divisible(shape, spec: P, axis_sizes: dict) -> bool:
    for dim, names in zip(shape, spec):
        if names is None:
            continue
        names = names if isinstance(names, tuple) else (names,)
        size = int(np.prod([axis_sizes[n] for n in names]))
        if dim % size != 0:
            return False
    return len(spec) <= len(shape)


def partition_specs(tree, mesh: Mesh,
                    rules: Sequence[Tuple[str, P]] = FGT_TP_RULES):
    """A pytree of PartitionSpecs matching ``tree``, from suffix rules.

    Leaves whose shape is not divisible by the mesh axis size fall back to
    replication with a log line (the reference-scale configs — heads 4,
    hidden multiples of k*k — divide cleanly for tp in {2, 4}).
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def spec_for(path: str, leaf) -> P:
        shape = getattr(leaf, "shape", ())
        for pat, spec in compiled:
            if pat.search(path):
                if _divisible(shape, spec, axis_sizes):
                    return spec
                logger.info("tp: %s shape %s not divisible by %s; "
                            "replicating", path, tuple(shape), spec)
                return P()
        return P()

    flat = _flatten_with_paths(tree)
    specs = [spec_for(path, leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(tree), specs)


def put_partitioned(mesh: Mesh, tree,
                    rules: Sequence[Tuple[str, P]] = FGT_TP_RULES):
    """device_put every leaf with its rule-derived NamedSharding."""
    specs = partition_specs(tree, mesh, rules)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def sharding_tree(mesh: Mesh, tree,
                  rules: Sequence[Tuple[str, P]] = FGT_TP_RULES):
    """NamedSharding pytree (for jit in_shardings/out_shardings)."""
    specs = partition_specs(tree, mesh, rules)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda s: isinstance(s, P))


def tp_param_fraction(mesh: Mesh, tree,
                      rules: Sequence[Tuple[str, P]] = FGT_TP_RULES) -> float:
    """Fraction of parameters (by element count) that are tp-sharded —
    a quick sanity number for logs/tests."""
    specs = partition_specs(tree, mesh, rules)
    flat_x = _flatten_with_paths(tree)
    flat_s = _flatten_with_paths(specs)
    tot = shd = 0
    for (_, leaf), (_, spec) in zip(flat_x, flat_s):
        n = int(np.prod(getattr(leaf, "shape", ())) or 1)
        tot += n
        if any(ax is not None for ax in spec):
            shd += n
    return shd / max(tot, 1)
