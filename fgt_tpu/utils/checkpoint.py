"""Checkpoint I/O: msgpack param trees paired with a YAML model config.

Keeps the reference's deployment contract (tool/video_inpainting.py:200-230):
a checkpoint directory holds exactly one weights file and one ``.yaml`` whose
``model:`` key selects the architecture. Training keeps the reference's
three-file trio semantics (gen / dis / opt — FGT/networks/network.py:225-256)
via :func:`save_train_state` / :func:`load_train_state`.

Format: flax msgpack (``flax.serialization``) — fast, dependency-free, and
pytree-structured so sharded restore can be layered on later via orbax.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Optional, Tuple

import yaml
from flax import serialization


def save_pytree(tree: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def load_pytree(template: Any, path: str) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_model_dir(params: Any, config: dict, ckpt_dir: str,
                   name: str = "model") -> None:
    """Write the (weights, yaml) pair the inference CLI consumes."""
    os.makedirs(ckpt_dir, exist_ok=True)
    save_pytree(params, os.path.join(ckpt_dir, f"{name}.msgpack"))
    with open(os.path.join(ckpt_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f)


def find_model_pair(ckpt_dir: str) -> Tuple[Optional[str], str]:
    """Locate (weights, yaml) inside a checkpoint dir; weights may be absent
    (callers then fall back to random init for smoke runs)."""
    yamls = glob.glob(os.path.join(ckpt_dir, "*.yaml"))
    if not yamls:
        raise FileNotFoundError(f"no config .yaml in {ckpt_dir}")
    weights = (glob.glob(os.path.join(ckpt_dir, "*.msgpack"))
               + glob.glob(os.path.join(ckpt_dir, "*.ckpt")))
    return (weights[0] if weights else None), yamls[0]


def load_model_dir(ckpt_dir: str, template: Any):
    """Load weights (or return the template unchanged if absent) + config."""
    weights, cfg_path = find_model_pair(ckpt_dir)
    with open(cfg_path) as f:
        config = yaml.safe_load(f)
    if weights is None:
        return template, config, False
    return load_pytree(template, weights), config, True
