"""bench.py self-diagnosis machinery (r8 verdict ask #2): the per-query
3x-vs-prior auto-retry, the prior-round baseline recovery (driver-artifact
tail + self-written full baseline), and the adjacent probes before the
store-lifecycle queries.

The r8 driver artifact carried three 14-21x outliers on untouched code that
the three bracketing calibration probes could not explain; these tests pin
the machinery that lets BENCH_r{N}.json decide noise vs regression by
itself: a retry that lands back at the floor is host noise (reproduced:
false), one that stays up is a regression (reproduced: true) and becomes
the new baseline.
"""

from __future__ import annotations

import json
import os

import pytest

import bench


# ---------------------------------------------------------------------------
# prior-round recovery
# ---------------------------------------------------------------------------


def test_driver_artifact_tail_recovers_outlier_queries():
    """The driver stores only a 2000-char stdout tail; the recoverable
    suffix must include the store-lifecycle / dispatch queries — exactly
    where the r8 outliers sat."""
    path = os.path.join(os.path.dirname(bench.__file__), "BENCH_r08.json")
    if not os.path.exists(path):
        pytest.skip("no driver artifact in this checkout")
    got = bench._timings_from_driver_artifact(path, 0.1)
    assert got["stream_bm25_topk"] == 186.475
    assert got["v2_push_decode"] == 12.204
    assert got["rebalance_audit"] == 11.471
    assert got["stream_chat_threads"] == 6.057  # final pair before the brace
    # never non-query scalar fields
    assert not set(got) & bench._BASELINE_KEYS_SKIP


def test_driver_artifact_rejects_other_sf():
    path = os.path.join(os.path.dirname(bench.__file__), "BENCH_r08.json")
    if not os.path.exists(path):
        pytest.skip("no driver artifact in this checkout")
    assert bench._timings_from_driver_artifact(path, 0.001) == {}


def test_prior_merge_takes_per_key_floor(tmp_path, monkeypatch):
    """Baseline + driver tail merge by MIN per key: the floor is the
    convention (a noisy baseline that suppresses retries is what let the
    r8 outliers pass unbracketed)."""
    base = tmp_path / "BENCH_BASELINE_sf0.1.json"
    base.write_text(json.dumps(
        {"sf": 0.1, "queries": {"stream_bm25_topk": 8.64, "only_self": 1.5}}
    ))
    monkeypatch.setattr(bench, "_baseline_path", lambda sf: str(base))
    prior, src = bench._prior_round_timings(0.1)
    if "BENCH_r08" in (src or ""):
        # driver tail says 186.475; the self baseline's 8.64 floor wins
        assert prior["stream_bm25_topk"] == 8.64
    assert prior["only_self"] == 1.5
    assert "BENCH_BASELINE_sf0.1.json" in src


# ---------------------------------------------------------------------------
# end-to-end: retry fires on an outlier vs the recorded floor, and the
# adjacent probes land next to the store-lifecycle queries
# ---------------------------------------------------------------------------


def _run_main_headline_only(monkeypatch, tmp_path, capsys, queries, seed):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    monkeypatch.setattr(
        bench, "_bench_queries", lambda: {k: qs[k] for k in queries}
    )
    base = tmp_path / "BENCH_BASELINE_sfx.json"
    if seed is not None:
        base.write_text(json.dumps({"sf": 0.001, "queries": seed}))
    monkeypatch.setattr(bench, "_baseline_path", lambda sf: str(base))
    # keep the driver artifact out of the merge so the seed IS the prior
    monkeypatch.setattr(
        bench, "_timings_from_driver_artifact", lambda p, sf: {}
    )
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    monkeypatch.setenv("SPARK_GRAFT_STREAM_REPS", "0")
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out), base


def test_retry_fires_and_reproduces_vs_tiny_floor(
    spark, monkeypatch, tmp_path, capsys
):
    """A floor far below reality (here: an absurd 1 ms prior) must trigger
    the 3x retry, record every sample, conclude reproduced=true, and adopt
    the measured wall as the new baseline so later runs stop re-flagging."""
    result, base = _run_main_headline_only(
        monkeypatch, tmp_path, capsys,
        queries=["replay_topk"], seed={"replay_topk": 0.001},
    )
    assert result["errors"] == {}
    r = result["retries"]["replay_topk"]
    assert r["prior_round_sec"] == 0.001
    assert r["reproduced"] is True
    assert len(r["samples"]) == 5  # 3 measured + 2 retries, all recorded
    assert result["queries"]["replay_topk"] == min(r["samples"])
    # the reproduced outlier became the new baseline floor
    new_base = json.loads(base.read_text())
    assert new_base["queries"]["replay_topk"] == result["queries"]["replay_topk"]


def test_no_retry_inside_band_and_probes_adjacent(
    spark, monkeypatch, tmp_path, capsys
):
    """A generous prior must NOT trigger retries; the store-lifecycle query
    gets a single-shot probe immediately before it."""
    result, base = _run_main_headline_only(
        monkeypatch, tmp_path, capsys,
        queries=["replay_topk", "stream_chat_threads"],
        seed={"replay_topk": 1e6, "stream_chat_threads": 1e6},
    )
    assert result["errors"] == {}
    assert result["retries"] == {}
    assert set(result["probes_adjacent"]) == {"stream_chat_threads"}
    assert result["probes_adjacent"]["stream_chat_threads"] > 0
    assert "BENCH_BASELINE" in result["prior_round_source"]
    # floor only tightens: the absurd seed was replaced by the measured min
    new_base = json.loads(base.read_text())
    assert new_base["queries"]["replay_topk"] == result["queries"]["replay_topk"]
