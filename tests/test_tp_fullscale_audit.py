"""Full-scale (reference dims) dp x tp sharding audit — round-2 verdict #6.

Audits the Megatron partition rules at the REFERENCE scale (8 blocks,
512/256 hidden, mlp_ratio 40, 240x432 — FGT/config/train.yaml:58-85) on a
dp=4 x tp=2 mesh: every attention q/k/v/out and FFN up/down projection in
all 8 blocks (plus the two leading transformer blocks) must receive a tp
spec with no divisibility fallback; the Adam mu/nu mirrors must shard
identically; the tp-sharded parameter fraction and per-device bytes are
asserted (the toy-config 0.13 from round 2 is meaningless at scale — the
20480-wide FusionFFN dominates).

Shapes come from jax.eval_shape: nothing is materialized, so the audit
runs at full scale in seconds on the CPU mesh.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgt_tpu.models.fgt import FGT, FGTConfig
from fgt_tpu.parallel.mesh import make_mesh
from fgt_tpu.parallel.partition import (FGT_TP_RULES, _flatten_with_paths,
                                        partition_specs, tp_param_fraction)
from fgt_tpu.train.schedules import make_adam


@pytest.fixture(scope="module")
def audit():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = FGTConfig()   # reference scale defaults
    model = FGT(cfg)
    h, w = cfg.input_resolution
    b, t = 2, 5

    def init():
        return model.init(jax.random.PRNGKey(0),
                          jnp.zeros((b, t, h, w, 3)),
                          jnp.zeros((b, t, h, w, 2)),
                          jnp.zeros((b, t, h, w, 1)))

    params = jax.eval_shape(init)
    tx = make_adam(lambda s: 1e-4)
    opt_state = jax.eval_shape(lambda: tx.init(params))
    mesh = make_mesh(tp=2, devices=np.array(jax.devices()[:8]))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {"dp": 4, "tp": 2}
    return mesh, params, opt_state


def _rule_matched(path: str) -> bool:
    return any(re.search(pat, path) for pat, _ in FGT_TP_RULES)


def test_every_matched_param_is_sharded_no_fallback(audit):
    """No rule-matched leaf may fall back to replication (divisibility)."""
    mesh, params, _ = audit
    specs = partition_specs(params, mesh)
    flat_p = _flatten_with_paths(params)
    flat_s = dict(_flatten_with_paths(specs))
    matched = 0
    for path, leaf in flat_p:
        if _rule_matched(path):
            matched += 1
            spec = flat_s[path]
            assert any(ax is not None for ax in spec), \
                f"{path} {leaf.shape} matched a tp rule but is replicated"
    # 8 inner blocks x2 attentions + 2 leading transformers, qkv+out+ffn:
    # there must be a substantial rule surface, not a handful
    assert matched >= 8 * 2 * 4, f"only {matched} rule-matched leaves"


def test_ffn_hidden_is_tp_sharded(audit):
    """The mlp_ratio-40 FusionFFN (512 -> mlp_ratio*k*k = 1960 fold
    channels -> 512) dominates the parameter count; its kernels must be
    split over tp in every block."""
    mesh, params, _ = audit
    cfg = FGTConfig()
    hidden = cfg.mlp_ratio * cfg.kernel_size[0] * cfg.kernel_size[1]
    specs = dict(_flatten_with_paths(partition_specs(params, mesh)))
    conv1 = {p: leaf for p, leaf in _flatten_with_paths(params)
             if re.search(r"ffn/conv1/kernel$", p)}
    conv2 = {p: leaf for p, leaf in _flatten_with_paths(params)
             if re.search(r"ffn/conv2/kernel$", p)}
    assert len(conv1) >= 8 and len(conv2) >= 8
    for p, leaf in conv1.items():
        assert max(leaf.shape) == hidden, (p, leaf.shape, hidden)
        assert specs[p][-1] == "tp", f"{p} up-projection not tp-sharded"
    for p, leaf in conv2.items():
        assert specs[p][0] == "tp", f"{p} down-projection not tp-sharded"


def test_adam_state_mirrors_param_shardings(audit):
    """mu/nu subtrees mirror param paths, so the same suffix rules must
    shard them identically (per-device optimizer memory actually drops)."""
    mesh, params, opt_state = audit
    p_specs = {p: s for p, s in
               _flatten_with_paths(partition_specs(params, mesh))}
    o_specs = _flatten_with_paths(partition_specs(opt_state, mesh))
    mirrored = 0
    for path, spec in o_specs:
        m = re.search(r"(?:mu|nu)/(.*)$", path)
        if not m:
            continue
        suffix = m.group(1)
        twin = next((s for p, s in p_specs.items() if p.endswith(suffix)),
                    None)
        if twin is not None:
            assert spec == twin, (path, spec, twin)
            mirrored += 1
    assert mirrored >= 2 * 8 * 2 * 4, f"only {mirrored} mirrored leaves"


def test_tp_fraction_and_per_device_bytes(audit):
    """At reference scale the tp-sharded fraction must be dominant and the
    per-device parameter bytes must drop accordingly (vs replication)."""
    mesh, params, opt_state = audit
    frac = tp_param_fraction(mesh, params)
    assert frac > 0.6, f"tp-sharded fraction {frac:.3f} at full scale"

    tp_size = dict(zip(mesh.axis_names, mesh.devices.shape))["tp"]
    specs = dict(_flatten_with_paths(partition_specs(params, mesh)))
    total = per_dev = 0
    for path, leaf in _flatten_with_paths(params):
        nbytes = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        total += nbytes
        shards = tp_size if any(ax is not None
                                for ax in specs[path]) else 1
        per_dev += nbytes // shards
    # replication would be per_dev == total; the FFN split must cut it
    assert per_dev < 0.7 * total, (per_dev, total)
    print(f"\nfull-scale audit: tp fraction {frac:.3f}, params "
          f"{total / 1e6:.0f} MB -> {per_dev / 1e6:.0f} MB/device "
          f"(tp={tp_size})")

    ofrac = tp_param_fraction(mesh, opt_state)
    assert ofrac > 0.4, f"Adam-state tp fraction {ofrac:.3f}"
