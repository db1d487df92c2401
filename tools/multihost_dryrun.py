"""Two-process multi-host DP dryrun on virtual CPU devices.

Exercises the real multi-host path the single-process tests cannot:
``jax.distributed.initialize`` rendezvous, a global mesh spanning two
processes, host-sharded batch construction via
``jax.make_array_from_process_local_data`` (each process holds only its
half of the global batch — the multi-host loading contract of
fgt_tpu.data.loader.ShardedSampler), and a jitted LAFC train step whose
gradient psum crosses the process boundary.

The parent also runs the identical step single-process on the full batch
and requires the loss AND updated parameters to match — proving the
2-process gradient math equals 1-process (the DDP-equivalence guarantee,
reference FGT/trainer.py:33-45).

Usage:
    python tools/multihost_dryrun.py            # parent: spawn + verify
    (child mode is internal: --child <pid> --port <p>)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4
GLOBAL_BATCH = 8
H = W = 32
SEED = 0


def _force_cpu(n_devices: int):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _batch(np_mod, lo=None, hi=None):
    rng = np_mod.random.RandomState(SEED)
    full = {
        "flows": rng.randn(GLOBAL_BATCH, 3, H, W, 2).astype("float32"),
        "diffused_flows": rng.randn(GLOBAL_BATCH, 3, H, W, 2)
        .astype("float32"),
        "masks": (rng.rand(GLOBAL_BATCH, 3, H, W, 1) > 0.6)
        .astype("float32"),
        "edges": (rng.rand(GLOBAL_BATCH, H, W, 1) > 0.9).astype("float32"),
        "current_frame": rng.rand(GLOBAL_BATCH, H, W, 3).astype("float32"),
        "shift_frame": rng.rand(GLOBAL_BATCH, H, W, 3).astype("float32"),
    }
    if lo is None:
        return full
    return {k: v[lo:hi] for k, v in full.items()}


LAFC_CFG = {"num_flows": 3, "cnum": 8, "in_channel": 3, "PASSMASK": 1,
            "use_residual": 1, "resBlocks": 0, "use_bias": 1,
            "conv_type": "vanilla"}


def _build(jax):
    import jax.numpy as jnp

    from fgt_tpu.models.lafc import Model as LAFCModel
    from fgt_tpu.train.lafc_step import make_lafc_train_step
    from fgt_tpu.train.schedules import make_adam

    model = LAFCModel(config=LAFC_CFG)
    params = jax.jit(model.init)(jax.random.PRNGKey(SEED),
                                 jnp.zeros((1, 3, H, W, 2)),
                                 jnp.zeros((1, 3, H, W, 1)))
    tx = make_adam(lambda s: 1e-3)
    step = make_lafc_train_step(model.apply, tx)
    return params, tx, step


def child(process_id: int, port: int, out_path: str):
    jax = _force_cpu(DEV_PER_PROC)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=N_PROC, process_id=process_id)
    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fgt_tpu.parallel.mesh import make_mesh, put_replicated

    mesh = make_mesh()  # all 8 global devices
    params, tx, step = _build(jax)
    params_r = put_replicated(mesh, params)
    opt_r = put_replicated(mesh, tx.init(params))

    # host-sharded loading: this process materializes ONLY its half
    per = GLOBAL_BATCH // N_PROC
    local = _batch(np, process_id * per, (process_id + 1) * per)
    sh = NamedSharding(mesh, P("dp"))
    batch = {
        k: jax.make_array_from_process_local_data(
            sh, v, (GLOBAL_BATCH,) + v.shape[1:])
        for k, v in local.items()}

    new_params, _, metrics = step(params_r, opt_r, batch)
    loss = float(metrics["loss"])  # cross-process psum inside the step
    leaf0 = np.asarray(jax.tree_util.tree_leaves(new_params)[0])
    if process_id == 0:
        with open(out_path, "w") as f:
            json.dump({"loss": loss,
                       "leaf0_sum": float(leaf0.sum()),
                       "process_count": jax.process_count(),
                       "devices": len(jax.devices())}, f)
    jax.distributed.shutdown()


def parent():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    out_path = os.path.join(tempfile.mkdtemp(prefix="fgt_mh_"), "r0.json")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", str(i),
         "--port", str(port), "--out", out_path],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(N_PROC)]
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        if p.returncode != 0:
            print(logs[i])
            raise SystemExit(f"child {i} failed rc={p.returncode}")
    with open(out_path) as f:
        multi = json.load(f)

    # single-process truth on the full batch
    jax = _force_cpu(GLOBAL_BATCH)
    import numpy as np

    from fgt_tpu.parallel.mesh import make_mesh, put_batch, put_replicated

    mesh = make_mesh()
    params, tx, step = _build(jax)
    import jax.numpy as jnp

    batch = put_batch(mesh, {k: jnp.asarray(v)
                             for k, v in _batch(np).items()})
    new_params, _, metrics = step(put_replicated(mesh, params),
                                  put_replicated(mesh, tx.init(params)),
                                  batch)
    loss1 = float(metrics["loss"])
    leaf0 = float(np.asarray(
        jax.tree_util.tree_leaves(new_params)[0]).sum())

    ok_loss = abs(multi["loss"] - loss1) < 1e-5 * max(1.0, abs(loss1))
    ok_leaf = abs(multi["leaf0_sum"] - leaf0) < 1e-4 * max(1.0, abs(leaf0))
    result = {
        "ok": bool(ok_loss and ok_leaf),
        "processes": multi["process_count"],
        "global_devices": multi["devices"],
        "loss_2proc": multi["loss"], "loss_1proc": loss1,
        "leaf0_sum_2proc": multi["leaf0_sum"], "leaf0_sum_1proc": leaf0,
    }
    print(json.dumps(result))
    if not result["ok"]:
        raise SystemExit("2-process DP does not match single-process")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    if a.child is None:
        parent()
    else:
        child(a.child, a.port, a.out)
