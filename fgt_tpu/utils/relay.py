"""Axon relay (TPU tunnel) health probes.

The axon PJRT plugin retries a dead relay for many minutes inside backend
init, so anything that will touch ``jax.devices()`` on the tunnel should
probe the relay socket first and decide: fall back, wait, or fail fast
with a useful message (the relay is managed outside this VM and flaps).
"""

from __future__ import annotations

import os
import socket
import sys
import time

RELAY_ADDR = ("127.0.0.1", 8083)


def on_axon() -> bool:
    """True when this process' jax would dial the tunnel."""
    return "axon" in os.environ.get("JAX_PLATFORMS", "")


def relay_up(timeout: float = 3.0) -> bool:
    """One bounded TCP probe of the relay; True when not on axon at all."""
    if not on_axon():
        return True
    try:
        socket.create_connection(RELAY_ADDR, timeout=timeout).close()
        return True
    except OSError:
        return False


def honor_cpu_request() -> bool:
    """Re-assert an explicit CPU request against the axon sitecustomize.

    The sitecustomize force-selects the axon platform through jax.config
    at interpreter start, which overrides the ``JAX_PLATFORMS`` env var —
    so ``JAX_PLATFORMS=cpu python <tool>`` would still dial the tunnel
    (and hang in PJRT retries when the relay is down). CLI entry points
    call this early; returns True when cpu was forced. The test suite's
    conftest does the equivalent for pytest runs."""
    if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
        return False
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - jax absent/odd build
        return False
    return True


def cli_relay_guard():
    """Standard preamble for interactive CLI entry points.

    1. Re-assert an explicit ``JAX_PLATFORMS=cpu`` request (the axon
       sitecustomize overrides the env var — see honor_cpu_request).
    2. On the tunnel, fail fast with a clear message when the relay is
       dead instead of hanging silently in PJRT backend-init retries.
       ``FGT_RELAY_WAIT`` (default 120 s for CLIs; bench harnesses pass
       1800 s themselves) bounds how long to wait for a flap to clear."""
    if honor_cpu_request() or not on_axon():
        return
    try:
        import jax

        # already force-selected cpu in-process (e.g. the test suite's
        # conftest or dryrun_multichip) — nothing will dial the tunnel
        if getattr(jax.config, "jax_platforms", None) == "cpu":
            return
    except Exception:  # pragma: no cover - jax absent/odd build
        pass
    if not wait_for_relay(float(os.environ.get("FGT_RELAY_WAIT", "120"))):
        raise SystemExit(
            "fgt_tpu: the TPU relay (127.0.0.1:8083) is unreachable, so "
            "the axon backend would hang in PJRT init retries. Retry when "
            "the tunnel is back, raise FGT_RELAY_WAIT, or run on CPU with "
            "JAX_PLATFORMS=cpu.")


def wait_for_relay(max_wait: float = 1800.0, poll: float = 15.0) -> bool:
    """Poll until the relay answers or ``max_wait`` elapses. Returns its
    final state. Progress goes to stderr so driver logs show the stall
    cause instead of a silent hang."""
    if relay_up():
        return True
    t0 = time.monotonic()
    print(f"[relay] tunnel down at {RELAY_ADDR}; waiting up to "
          f"{max_wait:.0f}s for it to come back", file=sys.stderr)
    while time.monotonic() - t0 < max_wait:
        time.sleep(poll)
        if relay_up():
            print(f"[relay] back after {time.monotonic() - t0:.0f}s",
                  file=sys.stderr)
            return True
    print(f"[relay] still down after {max_wait:.0f}s", file=sys.stderr)
    return False
