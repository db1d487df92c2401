"""Convert reference PyTorch checkpoints to fgt_tpu (weights, yaml) dirs.

The reference ships `.pth.tar` checkpoints for RAFT / LAFC / LAFC-single /
FGT (git-LFS, user-supplied here). This CLI converts them into the
msgpack+yaml checkpoint dirs the pipeline and trainers consume, via the
golden-parity-tested mappings in fgt_tpu/convert/torch2jax.py.

Usage:
    python tools/convert_weights.py raft  raft-things.pth  checkpoints/raft
    python tools/convert_weights.py lafc  lafc.pth.tar     checkpoints/lafc \
        [--config lafc_config.yaml]
    python tools/convert_weights.py lafc_single single.pth.tar out_dir
    python tools/convert_weights.py fgt   fgt.pth.tar      checkpoints/fgt
    python tools/convert_weights.py i3d   rgb_imagenet.pt  checkpoints/i3d
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["raft", "lafc", "lafc_single", "fgt",
                                     "i3d"])
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--config", default=None,
                    help="model config yaml (defaults to reference scale)")
    args = ap.parse_args(argv)

    from fgt_tpu.convert import torch2jax as t2j
    from fgt_tpu.models.registry import build_model
    from fgt_tpu.utils.checkpoint import save_model_dir, save_pytree

    cfg = {}
    if args.config:
        with open(args.config) as f:
            cfg = yaml.safe_load(f)

    rng = jax.random.PRNGKey(0)
    if args.kind == "raft":
        from fgt_tpu.models import raft as raft_mod

        model = raft_mod.RAFT(raft_mod.RAFTConfig())
        d = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(lambda: model.init(rng, d, d, iters=1))()
        variables = t2j.convert_raft_checkpoint(args.torch_ckpt, variables)
        os.makedirs(args.out_dir, exist_ok=True)
        save_pytree(variables, os.path.join(args.out_dir, "raft.msgpack"))
        print(f"wrote {args.out_dir}/raft.msgpack")
        return

    if args.kind == "i3d":
        from fgt_tpu.core.vfid import I3D, convert_i3d_checkpoint

        model = I3D()
        variables = jax.jit(lambda: model.init(
            rng, jnp.zeros((1, 9, 32, 32, 3))))()
        state = t2j.load_torch_state(args.torch_ckpt)
        variables = convert_i3d_checkpoint(state, variables)
        os.makedirs(args.out_dir, exist_ok=True)
        save_pytree(variables, os.path.join(args.out_dir, "i3d.msgpack"))
        print(f"wrote {args.out_dir}/i3d.msgpack")
        return

    from fgt_tpu.pipeline.video_inpainting import (DEFAULT_FGT_CONFIG,
                                                   DEFAULT_LAFC_CONFIG)

    if args.kind in ("lafc", "lafc_single"):
        base = dict(DEFAULT_LAFC_CONFIG)
        base["model"] = args.kind
        base.update(cfg)
        model = build_model(args.kind, base)
        t = base.get("num_flows", 3)
        df = jnp.zeros((1, t, 64, 64, 2))
        dm = jnp.zeros((1, t, 64, 64, 1))
        if args.kind == "lafc_single":
            df, dm = df[:, 0], dm[:, 0]
        variables = jax.jit(lambda: model.init(rng, df, dm))()
        conv = (t2j.convert_lafc_checkpoint if args.kind == "lafc"
                else t2j.convert_lafc_single_checkpoint)
        variables = conv(args.torch_ckpt, variables,
                         res_blocks=int(base.get("resBlocks", 1)))
    else:  # fgt
        base = dict(DEFAULT_FGT_CONFIG)
        base.update(cfg)
        model = build_model("model", base)
        dfr = jnp.zeros((1, 2, 64, 64, 3))
        dfl = jnp.zeros((1, 2, 64, 64, 2))
        dm = jnp.zeros((1, 2, 64, 64, 1))
        variables = jax.jit(lambda: model.init(rng, dfr, dfl, dm))()
        variables = t2j.convert_fgt_checkpoint(
            args.torch_ckpt, variables,
            num_blocks=int(base.get("numBlocks", 8)))

    save_model_dir(variables, base, args.out_dir, name=args.kind)
    print(f"wrote {args.out_dir}/{args.kind}.msgpack + config.yaml")


if __name__ == "__main__":
    main()
