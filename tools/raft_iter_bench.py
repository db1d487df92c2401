"""Per-component timing of one RAFT refine iteration at bench shape.

The end-to-end A/B (tools/raft_ab.py) shows ~74 ms per GRU iteration at
the bench shape (46 pairs, 60x108 @ 1/8 res, bf16). This tool times the
iteration's two halves IN ISOLATION — the fused correlation lookup
(ops/corr_fused_pallas.py) and the update block (motion encoder +
SepConvGRU + flow head, reference update.py:114-136) — each as its own
jitted 20x lax.scan over the real shapes, so the optimization budget
goes where the time actually is.

    python tools/raft_iter_bench.py --pairs 46 --h8 60 --w8 108
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from fgt_tpu.utils.relay import cli_relay_guard

    cli_relay_guard()
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=46)
    ap.add_argument("--h8", type=int, default=60)
    ap.add_argument("--w8", type=int, default=108)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fgt_tpu.models.raft import (RAFT, RAFTConfig, coords_grid)
    from fgt_tpu.ops.corr_fused_pallas import (lookup_corr_fused,
                                               pad_fmap_pyramid)
    from fgt_tpu.models.raft import build_fmap_pyramid

    B, H, W = args.pairs, args.h8, args.w8
    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)

    def dev(shape, scale=1.0, d=dt):
        return jax.device_put(
            (rng.randn(*shape) * scale).astype(np.float32)).astype(d)

    fmap1 = dev((B, H, W, 256), 0.5)
    fmap2 = dev((B, H, W, 256), 0.5)
    net = dev((B, H, W, 128), 0.5)
    inp = dev((B, H, W, 128), 0.5)
    coords = (coords_grid(B, H, W)
              + dev((B, H, W, 2), 2.0, jnp.float32)).astype(jnp.float32)

    def probe(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0][:1, :1])

    res = {"pairs": B, "h8": H, "w8": W, "iters": args.iters,
           "dtype": args.dtype}

    # --- fused lookup alone, iters x in one scan ------------------------
    @jax.jit
    def run_lookup(f1, f2, c0):
        packed = pad_fmap_pyramid(
            build_fmap_pyramid(f2.astype(jnp.float32), 4), dtype=args.dtype)

        def step(c, _):
            taps = lookup_corr_fused(f1, packed, c, 4)
            # data dependence so the scan can't collapse: nudge coords
            # by a tap-derived epsilon
            c = c + (taps.astype(jnp.float32).mean(-1, keepdims=True)
                     * 1e-6)
            return c, ()

        c, _ = jax.lax.scan(step, c0, None, length=args.iters)
        return c

    probe(run_lookup(fmap1, fmap2, coords))
    t0 = time.perf_counter()
    probe(run_lookup(fmap1, fmap2, coords))
    res["lookup_scan_s"] = round(time.perf_counter() - t0, 4)

    # --- update block alone, iters x in one scan ------------------------
    cfg = RAFTConfig(fused_corr=True, corr_dtype=args.dtype)
    model = RAFT(cfg)
    corr0 = dev((B, H, W, 4 * 81), 0.5)
    flow0 = dev((B, H, W, 2), 1.0, jnp.float32)
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8 * H, 8 * W, 3)),
            jnp.zeros((1, 8 * H, 8 * W, 3)), iters=1))()
    variables = jax.tree_util.tree_map(lambda x: x.astype(dt), variables)

    def update_apply(v, net, inp, corr, flow):
        return model.apply(
            v, net, inp, corr, flow, False,
            method=lambda m, *a: m.update_block(*a))

    @jax.jit
    def run_update(v, net, inp, corr, flow):
        def step(carry, _):
            net, flow = carry
            net, _, delta = update_apply(v, net, inp, corr, flow)
            return (net, flow + delta), ()

        (net, flow), _ = jax.lax.scan(step, (net, flow), None,
                                      length=args.iters)
        return net, flow

    probe(run_update(variables, net, inp, corr0, flow0))
    t0 = time.perf_counter()
    probe(run_update(variables, net, inp, corr0, flow0))
    res["update_scan_s"] = round(time.perf_counter() - t0, 4)

    # --- full refine step (lookup + update), the production composition -
    @jax.jit
    def run_full(v, f1, f2, net, inp, c0):
        packed = pad_fmap_pyramid(
            build_fmap_pyramid(f2.astype(jnp.float32), 4), dtype=args.dtype)

        def step(carry, _):
            net, c = carry
            taps = lookup_corr_fused(f1, packed, c, 4)
            net, _, delta = update_apply(v, net, inp, taps,
                                         (c - coords).astype(jnp.float32))
            return (net, c + delta), ()

        (net, c), _ = jax.lax.scan(step, (net, c0), None,
                                   length=args.iters)
        return net, c

    probe(run_full(variables, fmap1, fmap2, net, inp, coords))
    t0 = time.perf_counter()
    probe(run_full(variables, fmap1, fmap2, net, inp, coords))
    res["full_scan_s"] = round(time.perf_counter() - t0, 4)

    for k in ("lookup_scan_s", "update_scan_s", "full_scan_s"):
        res[k.replace("_scan_s", "_per_iter_ms")] = round(
            res[k] / args.iters * 1000, 2)

    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
