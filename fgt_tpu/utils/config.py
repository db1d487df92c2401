"""Two-level config system: argparse defaults overridden by YAML.

Mirrors the reference contract (FGT/parse.py:20-76 for training;
tool/video_inpainting.py:423-429 for inference): every hyperparameter has an
argparse default, and keys present in the ``--opt`` YAML file WIN over the
parsed arguments. Path roots (``--datadir/--outputdir``) are prefixed onto
relative dataset paths.
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Optional

import yaml


def load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f) or {}


def merge_args_yaml(args: argparse.Namespace, opt_path: Optional[str]) -> dict:
    """``{**vars(args), **yaml}`` — YAML wins (reference FGT/parse.py:28)."""
    cfg = dict(vars(args))
    if opt_path:
        cfg.update(load_yaml(opt_path))
    return cfg


def apply_yaml_over_args(args: argparse.Namespace, opt_path: Optional[str]):
    """In-place override used by the inference CLI
    (tool/video_inpainting.py:427-429): only keys already present on the
    namespace are overridden."""
    if not opt_path:
        return args
    opts = load_yaml(opt_path)
    for k, v in opts.items():
        if hasattr(args, k):
            setattr(args, k, v)
    return args


def prefix_paths(data_info: dict, datadir: str) -> dict:
    """Prefix a root dir onto relative paths (reference parse.py:6-17)."""
    out = {}
    for k, v in data_info.items():
        if isinstance(v, dict):
            out[k] = prefix_paths(v, datadir)
        elif isinstance(v, str) and ("path" in k or "root" in k) \
                and not os.path.isabs(v):
            out[k] = os.path.join(datadir, v)
        else:
            out[k] = v
    return out


def derive_model_tuples(cfg: dict) -> dict:
    """Assemble the derived tuple params (reference FGT/train.py:63-66)."""
    cfg = dict(cfg)
    if "res_h" in cfg and "res_w" in cfg:
        cfg.setdefault("input_resolution", (cfg["res_h"], cfg["res_w"]))
    if "kernel_size_h" in cfg:
        cfg.setdefault("kernel_size", (cfg["kernel_size_h"], cfg["kernel_size_w"]))
    if "stride_h" in cfg:
        cfg.setdefault("stride", (cfg["stride_h"], cfg["stride_w"]))
    if "pad_h" in cfg:
        cfg.setdefault("padding", (cfg["pad_h"], cfg["pad_w"]))
    return cfg
