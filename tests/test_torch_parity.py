"""Golden activation-parity tests against the reference PyTorch models.

These import the reference implementations from /root/reference (read-only),
instantiate them with random weights, convert the state_dicts with
fgt_tpu.convert.torch2jax, and require the JAX forward pass to reproduce the
torch forward pass. This pins weight-conversion fidelity end to end: with
real pretrained checkpoints the same mappings apply.
"""

import importlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _import_from(path_entries, module):
    """Import `module` with given sys.path entries, purging collisions."""
    for m in list(sys.modules):
        if m == "models" or m.startswith("models."):
            del sys.modules[m]
    old = list(sys.path)
    sys.path[:0] = path_entries
    try:
        return importlib.import_module(module)
    finally:
        sys.path[:] = old


FGT_CFG = {
    "tw": 2, "sw": 8, "gd": 4, "input_resolution": (96, 96), "in_channel": 4,
    "cnum": 64, "flow_inChannel": 2, "flow_cnum": 16, "frame_hidden": 64,
    "flow_hidden": 32, "PASSMASK": 1, "numBlocks": 4, "kernel_size": (7, 7),
    "stride": (3, 3), "padding": (3, 3), "num_head": 4,
    "conv_type": "vanilla", "norm": None, "use_bias": 1, "ape": 1,
    "mlp_ratio": 2, "drop": 0, "init_weights": 1,
}


@pytest.mark.parity
def test_fgt_forward_parity():
    ref_mod = _import_from([f"{REF}/FGT"], "models.model")
    torch.manual_seed(0)
    ref = ref_mod.Model(FGT_CFG).eval()
    state = {k: v for k, v in ref.state_dict().items()}

    from fgt_tpu.convert.torch2jax import apply_mapping, fgt_mapping
    from fgt_tpu.models.fgt import Model as JaxModel

    b, t, h, w = 1, 2, 96, 96
    rng = np.random.RandomState(0)
    frames = rng.randn(b, t, 3, h, w).astype(np.float32)
    flows = rng.randn(b, t, 2, h, w).astype(np.float32)
    masks = (rng.rand(b, t, 1, h, w) > 0.7).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(frames), torch.from_numpy(flows),
                      torch.from_numpy(masks)).numpy()  # [b*t, 3, h, w]

    jm = JaxModel(config=FGT_CFG)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.zeros((b, t, h, w, 3)), jnp.zeros((b, t, h, w, 2)),
                        jnp.zeros((b, t, h, w, 1)))
    variables = apply_mapping(variables, state,
                              fgt_mapping(FGT_CFG["numBlocks"]))
    out = jm.apply(variables,
                   jnp.asarray(frames.transpose(0, 1, 3, 4, 2)),
                   jnp.asarray(flows.transpose(0, 1, 3, 4, 2)),
                   jnp.asarray(masks.transpose(0, 1, 3, 4, 2)))
    out = np.asarray(out).reshape(b * t, h, w, 3).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)


LAFC_CFG = {"num_flows": 3, "cnum": 16, "in_channel": 3, "PASSMASK": 1,
            "use_residual": 1, "resBlocks": 1, "use_bias": 1,
            "conv_type": "vanilla", "init_weights": 1}


@pytest.mark.parity
def test_lafc_forward_parity():
    ref_mod = _import_from([f"{REF}/LAFC"], "models.lafc")
    torch.manual_seed(0)
    ref = ref_mod.Model(LAFC_CFG).eval()
    state = {k: v for k, v in ref.state_dict().items()}

    from fgt_tpu.convert.torch2jax import apply_mapping, lafc_mapping
    from fgt_tpu.models.lafc import Model as JaxModel

    b, t, h, w = 1, 3, 64, 64
    rng = np.random.RandomState(1)
    flows = rng.randn(b, 2, t, h, w).astype(np.float32)
    masks = (rng.rand(b, 1, t, h, w) > 0.7).astype(np.float32)
    with torch.no_grad():
        rf, re = ref(torch.from_numpy(flows), torch.from_numpy(masks))
    jm = JaxModel(config=LAFC_CFG)
    jf = jnp.asarray(flows.transpose(0, 2, 3, 4, 1))
    jm_mask = jnp.asarray(masks.transpose(0, 2, 3, 4, 1))
    variables = jm.init(jax.random.PRNGKey(0), jf, jm_mask)
    variables = apply_mapping(variables, state, lafc_mapping(1))
    of, oe = jm.apply(variables, jf, jm_mask)
    np.testing.assert_allclose(np.asarray(of).transpose(0, 3, 1, 2),
                               rf.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(oe).transpose(0, 3, 1, 2),
                               re.numpy(), atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_lafc_single_forward_parity():
    ref_mod = _import_from([f"{REF}/LAFC"], "models.lafc_single")
    torch.manual_seed(0)
    ref = ref_mod.Model(LAFC_CFG).eval()
    state = {k: v for k, v in ref.state_dict().items()}

    from fgt_tpu.convert.torch2jax import (apply_mapping,
                                           lafc_single_mapping)
    from fgt_tpu.models.lafc_single import Model as JaxModel

    b, h, w = 2, 64, 64
    rng = np.random.RandomState(2)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    mask = (rng.rand(b, 1, h, w) > 0.7).astype(np.float32)
    with torch.no_grad():
        rf, re = ref(torch.from_numpy(flow), torch.from_numpy(mask))
    jm = JaxModel(config=LAFC_CFG)
    jflow = jnp.asarray(flow.transpose(0, 2, 3, 1))
    jmask = jnp.asarray(mask.transpose(0, 2, 3, 1))
    variables = jm.init(jax.random.PRNGKey(0), jflow, jmask)
    variables = apply_mapping(variables, state, lafc_single_mapping(1))
    of, oe = jm.apply(variables, jflow, jmask)
    np.testing.assert_allclose(np.asarray(of).transpose(0, 3, 1, 2),
                               rf.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(oe).transpose(0, 3, 1, 2),
                               re.numpy(), atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_raft_forward_parity():
    import argparse

    raft_pkg = _import_from([REF], "RAFT")
    torch.manual_seed(0)
    args = argparse.Namespace(small=False, mixed_precision=False,
                              alternate_corr=False)
    ref = raft_pkg.RAFT(args).eval()
    state = {k: v for k, v in ref.state_dict().items()}

    from fgt_tpu.convert.torch2jax import apply_mapping, raft_mapping
    from fgt_tpu.models.raft import RAFT as JaxRAFT, RAFTConfig

    # NB: resolution must keep the 4th corr-pyramid level >= 2x2 — the
    # reference's bilinear_sampler divides by (W-1) and emits NaN on a 1x1
    # level (RAFT/utils/utils.py:61-62), which is out of its trained regime.
    rng = np.random.RandomState(3)
    img1 = (rng.rand(1, 3, 128, 136) * 255).astype(np.float32)
    img2 = (rng.rand(1, 3, 128, 136) * 255).astype(np.float32)
    with torch.no_grad():
        _, ref_up = ref(torch.from_numpy(img1), torch.from_numpy(img2),
                        iters=3, test_mode=True)

    jm = JaxRAFT(RAFTConfig(iters=3))
    j1 = jnp.asarray(img1.transpose(0, 2, 3, 1))
    j2 = jnp.asarray(img2.transpose(0, 2, 3, 1))
    variables = jm.init(jax.random.PRNGKey(0), j1, j2, iters=1)
    variables = apply_mapping(variables, state, raft_mapping())
    _, up = jm.apply(variables, j1, j2, iters=3)
    np.testing.assert_allclose(np.asarray(up).transpose(0, 3, 1, 2),
                               ref_up.numpy(), atol=5e-4, rtol=1e-3)


@pytest.mark.parity
def test_discriminator_forward_parity():
    ref_mod = _import_from([f"{REF}/FGT"], "models.temporal_patch_gan")
    torch.manual_seed(0)
    ref = ref_mod.Discriminator(in_channels=3, conv_type="vanilla",
                                dist_cnum=8).eval()
    state = {k: v for k, v in ref.state_dict().items()}

    from fgt_tpu.convert.torch2jax import convert_discriminator_state
    from fgt_tpu.models.discriminator import TemporalPatchGAN

    b, t, h, w = 1, 4, 64, 64
    rng = np.random.RandomState(4)
    x = rng.randn(b * t, 3, h, w).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), t).numpy()  # [b, t, c, h', w']

    jm = TemporalPatchGAN(in_channels=3, dist_cnum=8)
    jx = jnp.asarray(x.reshape(b, t, 3, h, w).transpose(0, 1, 3, 4, 2))
    variables = jm.init(jax.random.PRNGKey(0), jx)
    variables = convert_discriminator_state(state, variables)
    out = jm.apply(variables, jx)  # [b, t, h', w', c]
    out = np.asarray(out).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)


# ---------------- full reference scale (FGT/config/train.yaml:58-85) ----------------

FGT_CFG_FULL = {
    "tw": 2, "sw": 8, "gd": 4, "input_resolution": (240, 432),
    "in_channel": 4, "cnum": 64, "flow_inChannel": 2, "flow_cnum": 64,
    "frame_hidden": 512, "flow_hidden": 256, "PASSMASK": 1, "numBlocks": 8,
    "kernel_size": (7, 7), "stride": (3, 3), "padding": (3, 3),
    "num_head": 4, "conv_type": "vanilla", "norm": None, "use_bias": 1,
    "ape": 1, "mlp_ratio": 40, "drop": 0, "init_weights": 1,
}


@pytest.mark.parity
@pytest.mark.slow
def test_fgt_forward_parity_full_scale():
    """Parity at the published model scale: 240x432, 8 blocks, hidden 512,
    mlp_ratio 40 — the exact config of FGT/config/train.yaml:58-85. The
    toy-scale test above pins the mapping; this pins numerics where error
    could accumulate across all 8 blocks and the 20480-wide FFN."""
    ref_mod = _import_from([f"{REF}/FGT"], "models.model")
    torch.manual_seed(0)
    ref = ref_mod.Model(FGT_CFG_FULL).eval()
    state = {k: v for k, v in ref.state_dict().items()}

    from fgt_tpu.convert.torch2jax import apply_mapping, fgt_mapping
    from fgt_tpu.models.fgt import Model as JaxModel

    b, t, h, w = 1, 2, 240, 432
    rng = np.random.RandomState(0)
    frames = rng.randn(b, t, 3, h, w).astype(np.float32)
    flows = rng.randn(b, t, 2, h, w).astype(np.float32)
    masks = (rng.rand(b, t, 1, h, w) > 0.7).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(frames), torch.from_numpy(flows),
                      torch.from_numpy(masks)).numpy()

    jm = JaxModel(config=FGT_CFG_FULL)
    variables = jax.jit(jm.init)(
        jax.random.PRNGKey(0), jnp.zeros((b, t, h, w, 3)),
        jnp.zeros((b, t, h, w, 2)), jnp.zeros((b, t, h, w, 1)))
    variables = apply_mapping(variables, state,
                              fgt_mapping(FGT_CFG_FULL["numBlocks"]))
    out = jm.apply(variables,
                   jnp.asarray(frames.transpose(0, 1, 3, 4, 2)),
                   jnp.asarray(flows.transpose(0, 1, 3, 4, 2)),
                   jnp.asarray(masks.transpose(0, 1, 3, 4, 2)))
    out = np.asarray(out).reshape(b * t, h, w, 3).transpose(0, 3, 1, 2)
    # Bitwise f32 parity is not achievable across backends at this depth:
    # XLA and torch reassociate the 20480-wide FFN and attention
    # contractions differently, and the resulting ~1e-7 relative noise is
    # amplified through 8 blocks (measured: same magnitude with mlp_ratio=2,
    # so depth-driven, not a mapping bug — the toy-scale test above pins
    # the mapping at 5e-4). Gate on output PSNR over the [-1,1] range;
    # >= 55 dB is ~500x below the 0.1 dB quality budget.
    d = out - ref_out
    rmse = float(np.sqrt((d ** 2).mean()))
    psnr = 20 * np.log10(2.0 / rmse)
    assert psnr >= 55.0, f"full-scale parity PSNR {psnr:.1f} dB"
    assert np.abs(d).max() < 0.05


LAFC_CFG_FULL = {"num_flows": 3, "cnum": 48, "in_channel": 3, "PASSMASK": 1,
                 "use_residual": 1, "resBlocks": 1, "use_bias": 1,
                 "conv_type": "vanilla", "init_weights": 1}


@pytest.mark.parity
@pytest.mark.slow
def test_lafc_forward_parity_full_scale():
    """LAFC parity at the published scale: cnum 48, 240x432 flows
    (LAFC/config/train.yaml)."""
    ref_mod = _import_from([f"{REF}/LAFC"], "models.lafc")
    torch.manual_seed(0)
    ref = ref_mod.Model(LAFC_CFG_FULL).eval()
    state = {k: v for k, v in ref.state_dict().items()}

    from fgt_tpu.convert.torch2jax import apply_mapping, lafc_mapping
    from fgt_tpu.models.lafc import Model as JaxModel

    b, t, h, w = 1, 3, 240, 432
    rng = np.random.RandomState(1)
    flows = rng.randn(b, 2, t, h, w).astype(np.float32)
    masks = (rng.rand(b, 1, t, h, w) > 0.7).astype(np.float32)
    with torch.no_grad():
        rf, re = ref(torch.from_numpy(flows), torch.from_numpy(masks))
    jm = JaxModel(config=LAFC_CFG_FULL)
    jf = jnp.asarray(flows.transpose(0, 2, 3, 4, 1))
    jm_mask = jnp.asarray(masks.transpose(0, 2, 3, 4, 1))
    variables = jax.jit(jm.init)(jax.random.PRNGKey(0), jf, jm_mask)
    variables = apply_mapping(variables, state, lafc_mapping(1))
    of, oe = jm.apply(variables, jf, jm_mask)
    np.testing.assert_allclose(np.asarray(of).transpose(0, 3, 1, 2),
                               rf.numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(oe).transpose(0, 3, 1, 2),
                               re.numpy(), atol=1e-3, rtol=1e-3)


@pytest.mark.parity
def test_raft_small_forward_parity():
    """--small variant parity (reference raft.py:29-58 + SmallEncoder +
    SmallUpdateBlock) with converted random weights."""
    import argparse

    raft_pkg = _import_from([REF], "RAFT")
    torch.manual_seed(0)
    args = argparse.Namespace(small=True, mixed_precision=False,
                              alternate_corr=False, dropout=0)
    ref = raft_pkg.RAFT(args).eval()
    state = {k: v for k, v in ref.state_dict().items()}

    from fgt_tpu.convert.torch2jax import apply_mapping, raft_small_mapping
    from fgt_tpu.models.raft import RAFT as JaxRAFT, RAFTConfig

    rng = np.random.RandomState(3)
    img1 = (rng.rand(1, 3, 128, 136) * 255).astype(np.float32)
    img2 = (rng.rand(1, 3, 128, 136) * 255).astype(np.float32)
    with torch.no_grad():
        _, ref_up = ref(torch.from_numpy(img1), torch.from_numpy(img2),
                        iters=3, test_mode=True)

    jm = JaxRAFT(RAFTConfig(iters=3, small=True))
    j1 = jnp.asarray(img1.transpose(0, 2, 3, 1))
    j2 = jnp.asarray(img2.transpose(0, 2, 3, 1))
    variables = jm.init(jax.random.PRNGKey(0), j1, j2, iters=1)
    variables = apply_mapping(variables, state, raft_small_mapping())
    _, up = jm.apply(variables, j1, j2, iters=3)
    np.testing.assert_allclose(np.asarray(up).transpose(0, 3, 1, 2),
                               ref_up.numpy(), atol=5e-4, rtol=1e-3)
