"""Trainer orchestration tests: full CLI-driven LAFC/LAFC-single/FGT
training runs on tiny models + synthetic data, checkpoint trio layout,
and resume semantics. Runs on the virtual 8-device CPU mesh."""

import glob
import json
import os

import imageio.v2 as imageio
import numpy as np
import pytest
import yaml

from fgt_tpu.core.flow_io import write_flow

pytestmark = pytest.mark.heavy  # jit-compile heavy (minutes on a 1-core host)

H, W = 32, 32
N_FRAMES = 8


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_tree")
    frames = root / "frames"
    flows = root / "flows"
    rng = np.random.RandomState(0)
    for video in tuple(f"v{i}" for i in range(8)):
        (frames / video).mkdir(parents=True)
        for d in ("forward_flo", "backward_flo"):
            (flows / video / d).mkdir(parents=True)
        for i in range(N_FRAMES):
            imageio.imwrite(frames / video / f"{i:05d}.jpg",
                            (rng.rand(H, W, 3) * 255).astype(np.uint8))
            if i < N_FRAMES - 1:
                for d in ("forward_flo", "backward_flo"):
                    write_flow(rng.randn(H, W, 2).astype(np.float32),
                               str(flows / video / d / f"{i:05d}.flo"))
    return root


def _write_cfg(path, root, model, extra=None):
    cfg = {
        "model": model,
        "name": f"test_{model}",
        "seed": 7,
        "datasets": {
            "dataInfo": {
                "frame_path": str(root / "frames"),
                "flow_path": str(root / "flows"),
                "name2len": None,
                "flow": {"flow_height": H, "flow_width": W},
                "edge": {"sigma": 1, "low_threshold": 0.1,
                         "high_threshold": 0.2},
            },
            "train": {"batch_size": 1, "n_workers": 0},
        },
        "train": {"MAX_ITERS": 3, "lr": 1e-4, "UPDATE_INTERVAL": 100,
                  "BETA1": 0.9, "BETA2": 0.999, "log_freq": 1,
                  "save_checkpoint_freq": 100},
        "input_resolution": [H, W],
        "res_h": H, "res_w": W,
    }
    cfg.update(extra or {})
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg


LAFC_SMALL = {"cnum": 8, "in_channel": 3, "PASSMASK": 1, "use_residual": 1,
              "resBlocks": 0, "use_bias": 1, "conv_type": "vanilla",
              "num_flows": 3, "flow_interval": 1}
FGT_SMALL = {"cnum": 8, "flow_cnum": 8, "frame_hidden": 32,
             "flow_hidden": 16, "numBlocks": 2, "num_head": 4,
             "mlp_ratio": 2, "tw": 2, "sw": 4, "gd": 2, "dist_cnum": 8,
             "num_frames": 2, "in_channel": 4, "flow_inChannel": 2,
             "PASSMASK": 1}


def _run(tmp_path, tree, model, extra):
    from fgt_tpu.train.train import main

    cfg_path = tmp_path / "cfg.yaml"
    _write_cfg(cfg_path, tree, model, extra)
    out = tmp_path / "out"
    return main(["--opt", str(cfg_path), "--model", model,
                 "--outputdir", str(out)]), out


def test_lafc_trainer_end_to_end(tmp_path, tree):
    trainer, out = _run(tmp_path, tree, "lafc", LAFC_SMALL)
    assert trainer.current_step == 3
    run_dir = out / "test_lafc"
    metrics = [json.loads(l) for l in
               open(run_dir / "tb" / "metrics.jsonl")]
    assert len(metrics) == 3
    assert np.isfinite(metrics[-1]["loss"])
    assert glob.glob(str(run_dir / "checkpoints" / "gen_*.msgpack"))
    assert glob.glob(str(run_dir / "checkpoints" / "opt_*.msgpack"))
    assert os.path.exists(run_dir / "latest" / "config.yaml")


def test_lafc_single_trainer(tmp_path, tree):
    trainer, out = _run(tmp_path, tree, "lafc_single", LAFC_SMALL)
    assert trainer.current_step == 3


def test_fgt_trainer_end_to_end_and_resume(tmp_path, tree):
    trainer, out = _run(tmp_path, tree, "model", FGT_SMALL)
    assert trainer.current_step == 3
    run_dir = out / "test_model"
    gens = sorted(glob.glob(str(run_dir / "checkpoints" / "gen_*.msgpack")))
    dists = sorted(glob.glob(str(run_dir / "checkpoints" / "dist_*.msgpack")))
    opts = sorted(glob.glob(str(run_dir / "checkpoints" / "opt_*.msgpack")))
    assert gens and dists and opts  # the checkpoint trio

    # resume continues the step counter
    from fgt_tpu.train.train import main

    cfg_path = tmp_path / "cfg2.yaml"
    extra = dict(FGT_SMALL)
    extra["name"] = "test_resume"
    _write_cfg(cfg_path, tree, "model", extra)
    trainer2 = main(["--opt", str(cfg_path), "--model", "model",
                     "--outputdir", str(out),
                     "--gen_state", gens[-1], "--dis_state", dists[-1],
                     "--opt_state", opts[-1]])
    assert trainer2.start_epoch >= 0
    assert trainer2.current_step >= 3  # resumed counter, then trained to cap

    # finetune resets counters but loads weights
    trainer3 = main(["--opt", str(cfg_path), "--model", "model",
                     "--outputdir", str(out), "--finetune", "1",
                     "--gen_state", gens[-1]])
    assert trainer3.current_step == 3


def test_fgt_trainer_tp_sp_mesh(tmp_path, tree):
    """The trainer CLI drives the FGT GAN step on a dp x tp x sp mesh:
    generator params + Adam state tp-sharded, folded frame axis
    sp-sharded, losses finite, checkpoint trio still saved (gathered)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    extra = dict(FGT_SMALL)
    extra.update({"name": "test_tpsp", "tp": 2, "sp": 2})
    trainer, out = _run(tmp_path, tree, "model", extra)
    assert trainer.current_step == 3
    assert trainer.mesh.axis_names == ("dp", "tp", "sp")
    assert trainer.mesh.devices.shape == (2, 2, 2)
    # tp really sharded the generator params
    from fgt_tpu.parallel.partition import tp_param_fraction

    assert tp_param_fraction(trainer.mesh, trainer.state.g_params) > 0
    run_dir = out / "test_tpsp"
    metrics = [json.loads(l) for l in
               open(run_dir / "tb" / "metrics.jsonl")]
    assert np.isfinite(metrics[-1]["gen_loss"])
    assert glob.glob(str(run_dir / "checkpoints" / "gen_*.msgpack"))


@pytest.mark.parametrize("bi_mode", ["fuse", "alternate"])
def test_fgt_bi_direction_trains(tmp_path, tree, bi_mode):
    """'bi' flow direction trains with finite losses — the reference
    declares the option but raises NotImplementedError
    (FGT/networks/network.py:106-107); we implement it (fused
    bidirectional velocity or per-step alternation)."""
    extra = dict(FGT_SMALL)
    extra["flow_direction"] = "bi"
    extra["bi_mode"] = bi_mode
    extra["name"] = f"test_bi_{bi_mode}"
    trainer, out = _run(tmp_path, tree, "model", extra)
    assert trainer.current_step == 3
    metrics = [json.loads(l) for l in
               open(out / f"test_bi_{bi_mode}" / "tb" / "metrics.jsonl")]
    assert np.isfinite(metrics[-1]["gen_loss"])
    assert np.isfinite(metrics[-1]["dis_loss"])


def test_lafc_validation_runs(tmp_path, tree):
    """Flow-domain validation computes finite metrics on the tiny tree."""
    import jax

    from fgt_tpu.models.lafc import Model as LAFCModel
    from fgt_tpu.train.validate import validate_lafc

    cfg = dict(LAFC_SMALL)
    model = LAFCModel(config=cfg)
    import jax.numpy as jnp

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, H, W, 2)), jnp.zeros((1, 3, H, W, 1)))
    scores = validate_lafc(model, params, str(tree / "flows"),
                           num_videos=2, resolution=(H, W), mask_size=12,
                           num_flows=3, interval=1,
                           save_dir=str(tmp_path / "viz"))
    assert scores and np.isfinite(scores["psnr"])
    # flow triptychs (completed | GT | diffused) written next to scalars
    pngs = glob.glob(str(tmp_path / "viz" / "*.png"))
    assert pngs, "validation visuals missing"
    img = imageio.imread(pngs[0])
    assert img.shape == (H, 3 * W, 3)


def test_fgt_validation_visuals(tmp_path, tree):
    """validate_fgt writes (result | GT | masked) canvases per video."""
    import jax
    import jax.numpy as jnp

    from fgt_tpu.models.fgt import FGT, FGTConfig
    from fgt_tpu.train.validate import validate_fgt

    cfg = FGTConfig(cnum=8, flow_cnum=8, frame_hidden=32, flow_hidden=16,
                    num_blocks=2, num_heads=4, mlp_ratio=2, tw=2, sw=4,
                    gd=2, input_resolution=(H, W))
    gen = FGT(cfg)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 2, H, W, 3)),
                               jnp.zeros((1, 2, H, W, 2)),
                               jnp.zeros((1, 2, H, W, 1)))
    scores = validate_fgt(gen, params, str(tree / "frames"),
                          str(tree / "flows"), num_videos=1,
                          resolution=(H, W), mask_size=12, pivot=3,
                          num_frames=2, ref_length=4,
                          save_dir=str(tmp_path / "viz"))
    assert scores and np.isfinite(scores["psnr"])
    pngs = glob.glob(str(tmp_path / "viz" / "*.png"))
    assert pngs, "validation canvases missing"
    img = imageio.imread(pngs[0])
    assert img.shape[1] == 3 * W  # result | GT | masked
