"""Bounded-time guard for Pallas/Mosaic compiles over remote-device links.

On this image the TPU is reached through a tunnel where a NEW Mosaic
(Pallas) kernel compile can hang indefinitely, while cached executables
load fine (round-2 verdict #5; BASELINE.md). Plain XLA programs are
unaffected. So any program embedding a Pallas kernel (flash window
attention, the RAFT correlation-lookup kernel) must not be compiled
in-process for a signature that has never compiled successfully.

The TPU is also single-process: once the pipeline holds the device, a
probe subprocess cannot attach. The split is therefore:

- ``allowed(sig)`` — called IN the pipeline. CPU platform: always True
  (no Mosaic tunnel risk; pallas runs interpreted/native). TPU: True only
  when the registry records a successful compile of ``sig``; otherwise
  the caller takes the XLA fallback with a log line (never a hang).
- ``probe(sig, argv, timeout)`` — called by ``tools/warm_cache.py``
  BEFORE any pipeline process owns the TPU. Spawns ``argv`` (a child
  that builds + compiles the exact stage program, populating the shared
  persistent XLA cache), kills it on timeout, records ok/fail.

The registry lives next to the persistent cache (pallas_ok.json). A jax
upgrade changes the signature (it embeds jax.__version__), invalidating
stale entries automatically. The reference has no analogue (its dynamic
shape branching at FGT/models/transformer_base/attention_base.py:44-50
pays no compilation at all).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import subprocess
import time

logger = logging.getLogger("fgt_tpu")

_REGISTRY = None  # lazy: {sig: {"ok": bool, "ts": float}}


def _registry_path() -> str:
    from fgt_tpu.utils.compile_cache import _DEFAULT_DIR

    d = os.environ.get("FGT_COMPILE_CACHE", _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "pallas_ok.json")


def _load(reload: bool = False) -> dict:
    global _REGISTRY
    if _REGISTRY is None or reload:
        try:
            with open(_registry_path()) as f:
                _REGISTRY = json.load(f)
        except Exception:
            _REGISTRY = {}
    return _REGISTRY


def _save():
    try:
        with open(_registry_path(), "w") as f:
            json.dump(_REGISTRY, f, indent=1, sort_keys=True)
    except Exception:  # pragma: no cover - read-only cache dir
        pass


def canonical_dtype(dtype) -> str:
    """Canonical dtype name for signatures: 'bfloat16' whether the caller
    holds a string, a numpy dtype, or the jnp scalar type (str() of which
    is \"<class 'ml_dtypes.bfloat16'>\" — a silent signature mismatch)."""
    import numpy as np

    if isinstance(dtype, str) and "'" in dtype:   # repr of a class
        dtype = dtype.split("'")[1].rsplit(".", 1)[-1]
    return np.dtype(dtype).name


_CODE_FP = None


def _code_fingerprint() -> str:
    """Hash of the package sources that define the traced stage programs.

    A shape/config signature alone is not safe across code changes: editing
    a scan body keeps the signature while invalidating the persistent-XLA
    executable, so ``allowed()`` would green-light a FRESH in-process
    Mosaic compile — the exact tunnel hang the guard exists to prevent.
    Folding the source hash in makes any compute-path edit a new signature,
    which the bounded warm-cache probe then re-records before the pipeline
    owns the device (over-invalidation just costs one bounded re-warm)."""
    global _CODE_FP
    if _CODE_FP is None:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha1()
        for sub in ("core", "models", "ops", "parallel", "pipeline"):
            d = os.path.join(pkg, sub)
            if not os.path.isdir(d):
                continue
            for name in sorted(os.listdir(d)):
                if name.endswith(".py"):
                    path = os.path.join(d, name)
                    h.update(name.encode())
                    with open(path, "rb") as f:
                        h.update(f.read())
        _CODE_FP = h.hexdigest()[:12]
    return _CODE_FP


def signature(kind: str, **fields) -> str:
    """Stable signature for a pallas-bearing program: kind + shape/config
    fields + jax version + a hash of the compute-path sources (a jax
    upgrade or a code change invalidates compiled artifacts)."""
    import jax

    if "dtype" in fields:
        fields["dtype"] = canonical_dtype(fields["dtype"])
    blob = json.dumps({"kind": kind, "jax": jax.__version__,
                       "code": _code_fingerprint(), **fields},
                      sort_keys=True, default=str)
    return f"{kind}-" + hashlib.sha1(blob.encode()).hexdigest()[:16]


def record(sig: str, ok: bool):
    reg = _load(reload=True)
    reg[sig] = {"ok": bool(ok), "ts": time.time()}
    _save()


def check(sig: str):
    """True (known-good) / False (known-hang) / None (never probed)."""
    rec = _load().get(sig)
    return None if rec is None else bool(rec.get("ok"))


def _platform() -> str:
    try:
        import jax

        return jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return "cpu"


def allowed(sig: str, what: str = "pallas") -> bool:
    """In-pipeline decision: may this process compile/run the pallas
    program ``sig`` without hang risk? Never probes; never blocks."""
    if os.environ.get("FGT_PALLAS_PROBE") == "1":
        return True            # warm_cache child: the compile IS the probe
    if os.environ.get("FGT_FORCE_PALLAS") == "1":
        return True            # explicit override for non-tunnel TPUs
    if _platform() != "tpu":
        return True            # CPU/interpreter: no Mosaic tunnel hang risk
    known = check(sig)
    if known is None:
        logger.warning(
            "%s signature %s has no recorded compile on this host; using "
            "the XLA fallback (run tools/warm_cache.py to enable the "
            "pallas path for these shapes)", what, sig)
        return False
    if not known:
        logger.warning("%s signature %s previously hung/failed to "
                       "compile; using the XLA fallback", what, sig)
    return known


def probe(sig: str, argv: list[str], timeout_s: float | None = None,
          env_extra: dict | None = None) -> bool:
    """warm_cache parent path: run the compile child under a timeout and
    record the outcome. The parent must NOT have initialized the TPU."""
    if check(sig) is True:
        return True
    timeout_s = timeout_s or float(os.environ.get("FGT_PROBE_TIMEOUT",
                                                  "600"))
    logger.info("probing pallas compile %s (timeout %.0fs)", sig, timeout_s)
    env = dict(os.environ)
    env["FGT_PALLAS_PROBE"] = "1"
    env.update(env_extra or {})
    try:
        proc = subprocess.run(argv, env=env, timeout=timeout_s,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
        ok = proc.returncode == 0
        if not ok:
            logger.warning("pallas probe %s failed (rc=%d):\n%s", sig,
                           proc.returncode, (proc.stdout or "")[-2000:])
    except subprocess.TimeoutExpired:
        ok = False
        logger.warning("pallas probe %s timed out after %.0fs -> XLA "
                       "fallback recorded", sig, timeout_s)
    record(sig, ok)
    return ok
