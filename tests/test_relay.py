"""Relay-health probe behavior (fgt_tpu/utils/relay.py)."""

import socket
import threading

import fgt_tpu.utils.relay as relay


def test_not_on_axon_is_always_up(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert relay.relay_up()
    assert relay.wait_for_relay(max_wait=0.01, poll=0.01)


def test_down_relay_probe_and_bounded_wait(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    # point the probe at a port nothing listens on
    monkeypatch.setattr(relay, "RELAY_ADDR", ("127.0.0.1", 1))
    assert not relay.relay_up(timeout=0.2)
    assert not relay.wait_for_relay(max_wait=0.3, poll=0.1)


def test_live_socket_reports_up(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    monkeypatch.setattr(relay, "RELAY_ADDR", srv.getsockname())
    def _accept():
        try:
            srv.accept()
        except OSError:   # racing srv.close() is fine
            pass

    t = threading.Thread(target=_accept, daemon=True)
    t.start()
    try:
        assert relay.relay_up(timeout=1.0)
    finally:
        srv.close()
        t.join(timeout=1.0)
