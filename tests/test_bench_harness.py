"""The bench harness must DEGRADE a raising query — e.g. the exact-kNN
tier's designed broadcast-cap refusal at an out-of-contract scale
factor — to one error row and keep running, and errored queries must
never contaminate the warm statistics (a query that dies mid-warm-pass
would otherwise contribute a truncated sample set to the medians)."""

import sys
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import measure_queries, write_full_results


def _q(fn):
    return SimpleNamespace(fn=fn)


def test_raising_query_degrades_to_error_row_and_run_continues(spark):
    calls = []

    def good(s, sf_dir):
        calls.append("good")
        return s.range(3)

    def refused(s, sf_dir):
        raise ValueError("num_vectors exceeds the broadcast guard cap")

    headline = {"refused": _q(refused), "good": _q(good)}
    timings, warm, errors = measure_queries(spark, headline, "unused", 2)
    # the refusal is ONE error row; the run continued past it
    assert "refused" in errors and "broadcast guard" in errors["refused"]
    assert "refused" not in timings
    assert warm["refused"] == []
    # the good query completed the cold pass AND both warm passes
    assert "good" in timings and len(warm["good"]) == 2
    assert calls.count("good") == 3


def test_mid_warm_failure_keeps_no_partial_samples_in_medians(spark):
    state = {"n": 0}

    def flaky(s, sf_dir):
        state["n"] += 1
        if state["n"] >= 2:  # cold pass succeeds, first warm pass dies
            raise RuntimeError("boom")
        return s.range(1)

    headline = {"flaky": _q(flaky), "ok": _q(lambda s, d: s.range(1))}
    timings, warm, errors = measure_queries(spark, headline, "unused", 3)
    assert "flaky" in errors
    # main() reports warm stats as {name: median(ts) ... if ts and
    # name not in errors} — replay that rule here and assert the
    # errored query is excluded even though it has a cold timing
    reported = {n for n, ts in warm.items() if ts and n not in errors}
    assert reported == {"ok"}
    assert "flaky" in timings  # the complete cold sample stays a cold row


def test_full_results_artifact_is_complete_and_unelied(tmp_path):
    """The stdout tail contract forces the compact line to elide cheap
    queries; the r21 file artifact must carry EVERY query with full
    precision so the driver's per-query comparison (PERF per_query /
    geomean / scaling) has a complete source."""
    import json

    full = {
        "metric": "headline_queries_total_sec",
        "value": 1.234,
        "queries": {f"q{i:03d}": 0.001 * i for i in range(120)},
        "queries_warm_median": {f"q{i:03d}": 0.002 * i for i in range(120)},
        "errors": {},
        "sf": 0.1,
        "cpus": "32",
    }
    extra = tmp_path / "custom_out.json"
    written = write_full_results(
        full, str(tmp_path), env={"SPARK_GRAFT_BENCH_OUT": str(extra)}
    )
    assert written == [str(tmp_path / "BENCH_LAST.json"), str(extra)]
    for p in written:
        got = json.loads(Path(p).read_text())
        assert len(got["queries"]) == 120  # no elision
        assert "_elided_cheapest_n" not in got["queries_warm_median"]
        assert got["queries"]["q077"] == 0.077  # full precision


def test_full_results_write_failure_never_raises(tmp_path, capsys):
    written = write_full_results(
        {"queries": {}}, str(tmp_path / "missing_dir"), env={}
    )
    assert written == []
