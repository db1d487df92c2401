"""Pallas compile guard: registry behavior + warm-cache signature parity.

The guard (fgt_tpu/utils/pallas_guard.py) only helps if the signature the
cache-warming tool records is BYTE-IDENTICAL to the one the pipeline
computes at run time — a mismatch silently disables every Pallas path on
TPU (this actually happened: ``str(jnp.bfloat16)`` is
``"<class 'ml_dtypes.bfloat16'>"`` while the planner wrote ``"bfloat16"``).
"""

import importlib.util
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from fgt_tpu.utils import pallas_guard as pg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_warm_cache():
    spec = importlib.util.spec_from_file_location(
        "warm_cache_for_test", os.path.join(REPO, "tools", "warm_cache.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["warm_cache_for_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_canonical_dtype_forms():
    for form in ("bfloat16", jnp.bfloat16, str(jnp.bfloat16)):
        assert pg.canonical_dtype(form) == "bfloat16", form
    for form in ("float32", np.float32, jnp.float32, str(jnp.float32)):
        assert pg.canonical_dtype(form) == "float32", form


def test_registry_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("FGT_COMPILE_CACHE", str(tmp_path))
    sig = pg.signature("unit", shape=(1, 2), dtype="bfloat16")
    assert pg.check(sig) is None
    pg.record(sig, True)
    assert pg.check(sig) is True
    pg.record(sig, False)
    assert pg.check(sig) is False
    # allowed() on CPU platforms never blocks regardless of the registry
    assert pg.allowed(sig, "unit") or pg._platform() == "tpu"


def test_signature_embeds_code_fingerprint(monkeypatch):
    """A compute-path source edit must change the signature (else a stale
    registry entry green-lights a fresh in-process Mosaic compile)."""
    fp = pg._code_fingerprint()
    assert fp == pg._code_fingerprint()  # cached + deterministic
    sig_a = pg.signature("unit", shape=(1, 2), dtype="bfloat16")
    monkeypatch.setattr(pg, "_CODE_FP", fp[::-1])
    sig_b = pg.signature("unit", shape=(1, 2), dtype="bfloat16")
    assert sig_a != sig_b


def test_warm_cache_signatures_match_pipeline():
    """The planner's signatures must equal what the pipeline computes with
    its live Models state (dtype passed as the jnp scalar-type repr)."""
    wc = _load_warm_cache()
    args = type("A", (), dict(
        frames=24, imgH=240, imgW=432, raft_iters=20, raft_chunk=None,
        window_batch=None, neighbor_stride=5, step=10, num_ref=-1,
        small=False, alternate_corr=False, bf16=True,
        cpu_frame_upscale=False, fgt_ckpts="/nonexistent",
        lafc_ckpts="/nonexistent", stage="all"))()
    p = wc.plan(args)
    sigs = wc.signatures(args, p)

    from fgt_tpu.pipeline.video_inpainting import (DEFAULT_FGT_CONFIG,
                                                   fgt_scan_signature,
                                                   raft_scan_signature)

    class RC:
        small = False
        alternate_corr = False
        # mirror of Models.__init__: bf16 compute -> bf16 pyramid storage
        corr_dtype = "bfloat16"

    assert sigs["raft"] == raft_scan_signature(
        RC, str(jnp.bfloat16), p["vshape"], p["idx_shape"], 20,
        p["out_hw"], p["flow_hw"])
    assert sigs["fgt"] == fgt_scan_signature(
        dict(DEFAULT_FGT_CONFIG), str(jnp.bfloat16), p["frames_shape"],
        p["ids_k_shape"], p["t_n"])
    # --wire_f32 traces different programs -> must NOT share signatures
    assert sigs["fgt"] != fgt_scan_signature(
        dict(DEFAULT_FGT_CONFIG), str(jnp.bfloat16), p["frames_shape"],
        p["ids_k_shape"], p["t_n"], wire="float32")
    assert sigs["raft"] != raft_scan_signature(
        RC, str(jnp.bfloat16), p["vshape"], p["idx_shape"], 20,
        p["out_hw"], p["flow_hw"], wire="float32")
    args.wire_f32 = True
    sigs32 = wc.signatures(args, wc.plan(args))
    assert sigs32["raft"] != sigs["raft"] and sigs32["fgt"] != sigs["fgt"]
    assert sigs32["raft"] == raft_scan_signature(
        RC, str(jnp.bfloat16), p["vshape"], p["idx_shape"], 20,
        p["out_hw"], p["flow_hw"], wire="float32")
