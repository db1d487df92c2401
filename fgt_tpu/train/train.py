"""Training CLI for both stages.

Reference entry points (FGT/train.py, LAFC/train.py; argparse surfaces
FGT/inputs.py:4-83, LAFC/flow_inputs.py:4-50) collapse into one:

    python -m fgt_tpu.train.train --model model       --opt cfg.yaml   # FGT
    python -m fgt_tpu.train.train --model lafc        --opt cfg.yaml
    python -m fgt_tpu.train.train --model lafc_single --opt cfg.yaml

YAML keys override argparse defaults (reference parse.py:28). The
mp.spawn/NCCL launcher is gone: data parallelism comes from the local
device mesh, and multi-host runs call ``jax.distributed.initialize``
(driven by --coordinator/--num_processes/--process_id or TPU env).
"""

from __future__ import annotations

import argparse
import os

from fgt_tpu.utils.config import (derive_model_tuples, merge_args_yaml,
                                  prefix_paths)


def args_parser(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="fgt_tpu trainer")
    p.add_argument("--opt", type=str, default=None,
                   help="Path to YAML config (overrides argparse defaults)")
    p.add_argument("--model", type=str, default="model",
                   choices=["model", "fgt", "lafc", "lafc_single"])
    p.add_argument("--name", type=str, default="FGT_train")
    p.add_argument("--outputdir", type=str, default="outputs")
    p.add_argument("--datadir", type=str, default="")
    # default None: each trainer picks its own dataset class unless the
    # CLI/YAML overrides (reference keeps per-tree defaults)
    p.add_argument("--datasetName_train", type=str, default=None)
    p.add_argument("--finetune", type=int, default=0)
    p.add_argument("--gen_state", type=str, default="")
    p.add_argument("--dis_state", type=str, default="")
    p.add_argument("--opt_state", type=str, default="")
    p.add_argument("--record_iter", type=int, default=16)
    p.add_argument("--flow_checkPoint", type=str, default="")
    p.add_argument("--dataMode", type=str, default="resize")
    p.add_argument("--seed", type=int, default=10)
    p.add_argument("--tp", type=int, default=1,
                   help="Megatron tensor-parallel degree for the FGT "
                        "generator (attention heads / FFN hidden + Adam "
                        "state sharded over a tp mesh axis)")
    p.add_argument("--sp", type=int, default=1,
                   help="Ulysses sequence-parallel degree: shard the FGT "
                        "folded temporal frame axis over an sp mesh axis "
                        "(devices = dp*tp*sp)")

    # data
    p.add_argument("--flow2rgb", type=int, default=1)
    p.add_argument("--flow_direction", type=str, default="for",
                   choices=["for", "back", "bi"])
    p.add_argument("--num_frames", type=int, default=5)
    p.add_argument("--num_flows", type=int, default=3)
    p.add_argument("--flow_interval", type=int, default=3)
    p.add_argument("--sample", type=str, default="random",
                   choices=["random", "seq"])
    p.add_argument("--max_val", type=float, default=0.01)
    p.add_argument("--norm", type=int, default=0)

    # model
    p.add_argument("--res_h", type=int, default=240)
    p.add_argument("--res_w", type=int, default=432)
    p.add_argument("--in_channel", type=int, default=4)
    p.add_argument("--cnum", type=int, default=64)
    p.add_argument("--flow_inChannel", type=int, default=2)
    p.add_argument("--flow_cnum", type=int, default=64)
    p.add_argument("--dist_cnum", type=int, default=32)
    p.add_argument("--frame_hidden", type=int, default=512)
    p.add_argument("--flow_hidden", type=int, default=256)
    p.add_argument("--PASSMASK", type=int, default=1)
    p.add_argument("--numBlocks", type=int, default=8)
    p.add_argument("--kernel_size_w", type=int, default=7)
    p.add_argument("--kernel_size_h", type=int, default=7)
    p.add_argument("--stride_h", type=int, default=3)
    p.add_argument("--stride_w", type=int, default=3)
    p.add_argument("--pad_h", type=int, default=3)
    p.add_argument("--pad_w", type=int, default=3)
    p.add_argument("--num_head", type=int, default=4)
    p.add_argument("--conv_type", type=str, default="vanilla",
                   choices=["vanilla", "gated", "partial"])
    p.add_argument("--use_bias", type=int, default=1)
    p.add_argument("--ape", type=int, default=1)
    p.add_argument("--mlp_ratio", type=int, default=40)
    p.add_argument("--drop", type=float, default=0)
    p.add_argument("--init_weights", type=int, default=1)
    p.add_argument("--use_residual", type=int, default=1)
    p.add_argument("--resBlocks", type=int, default=1)
    p.add_argument("--use_edges", type=int, default=0)
    p.add_argument("--gc", type=int, default=0)

    # losses
    p.add_argument("--L1M", type=float, default=1)
    p.add_argument("--L1V", type=float, default=1)
    p.add_argument("--adv", type=float, default=0.01)

    # windows
    p.add_argument("--tw", type=int, default=2)
    p.add_argument("--sw", type=int, default=8)
    p.add_argument("--gd", type=int, default=4)
    p.add_argument("--ref_length", type=int, default=10)
    p.add_argument("--use_valid", action="store_true")

    # distributed (replaces NCCL env sniffing, FGT/utils/dist.py)
    p.add_argument("--coordinator", type=str, default="")
    p.add_argument("--num_processes", type=int, default=0)
    p.add_argument("--process_id", type=int, default=-1)
    return p.parse_args(argv)


def build_opt(args: argparse.Namespace) -> dict:
    opt = merge_args_yaml(args, args.opt)
    opt = derive_model_tuples(opt)
    opt.setdefault("model", args.model)
    opt.setdefault("train", {})
    opt["train"].setdefault("MAX_ITERS", 500000)
    opt["train"].setdefault("lr", 1e-4)
    opt["train"].setdefault("UPDATE_INTERVAL", 300000)
    opt.setdefault("datasets", {})
    if args.datadir and "dataInfo" in opt.get("datasets", {}):
        opt["datasets"]["dataInfo"] = prefix_paths(
            opt["datasets"]["dataInfo"], args.datadir)
    opt.setdefault("path", {})
    for k in ("gen_state", "dis_state", "opt_state"):
        v = getattr(args, k, "")
        if v:
            opt["path"][k] = v
    opt["resume"] = bool(opt["path"].get("gen_state"))
    return opt


def main(argv=None):

    from fgt_tpu.utils.relay import cli_relay_guard

    cli_relay_guard()   # honor cpu requests; fail fast on a dead tunnel
    from fgt_tpu.utils.hostmem import retain_heap

    retain_heap()   # slow-first-touch host: fault the heap once
    args = args_parser(argv)
    if args.coordinator and args.num_processes > 0:
        import jax

        jax.distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)
    opt = build_opt(args)

    from fgt_tpu.train.trainer import FGTTrainer, LAFCTrainer

    model = str(opt.get("model", args.model))
    if model in ("model", "fgt"):
        trainer = FGTTrainer(opt)
    elif model == "lafc":
        trainer = LAFCTrainer(opt)
    elif model == "lafc_single":
        trainer = LAFCTrainer(opt, single=True)
    else:
        raise ValueError(f"unknown model {model}")
    trainer.train()
    return trainer


if __name__ == "__main__":
    main()
