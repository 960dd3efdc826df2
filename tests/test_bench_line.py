"""The driver keeps only the last ~2000 chars of bench stdout and
json-parses it; BENCH_r01–r05 all show parsed: null because the full
per-query map blew that window.  Pin the compact-line contract."""

from __future__ import annotations

import json

from bench import compact_line


def _full(n: int) -> dict:
    return {
        "metric": "suite_wall_sec",
        "value": 123.456,
        "unit": "sec",
        "queries": {f"q_example_{i:04d}": round(0.1 + i * 0.01, 3) for i in range(n)},
        "sf": 0.1,
        "n_queries": n,
        "median_query_sec": 0.32,
        "plan_build_sec": 80.0,
        "pipelined": True,
        "loadavg_start": [1.0, 1.0, 1.0],
        "loadavg_end": [1.0, 1.0, 1.0],
    }


def test_line_fits_driver_capture_at_registry_scale():
    out = compact_line(_full(365))
    line = json.dumps(out)
    assert len(line) <= 2000, len(line)
    assert json.loads(line)["metric"] == "suite_wall_sec"
    # headline metrics survive intact
    for k in ("value", "median_query_sec", "plan_build_sec", "n_queries"):
        assert out[k] == _full(365)[k]
    # the retained entries are the SLOWEST ones and the count reconciles
    kept = set(out["queries"])
    slowest = sorted(_full(365)["queries"].items(), key=lambda kv: -kv[1])
    assert kept == {n for n, _ in slowest[: len(kept)]}
    assert out["queries_omitted"] == 365 - len(kept)
    assert out["queries_full"] == "BENCH_FULL.json"


def test_small_suite_keeps_every_query():
    out = compact_line(_full(20))
    assert len(out["queries"]) == 20
    assert out["queries_omitted"] == 0


def test_empty_suite_is_valid():
    out = compact_line(_full(0))
    assert out["queries"] == {}
    assert out["queries_omitted"] == 0
    json.dumps(out)


def test_interleave_build_order_properties():
    """The two-lane build order must (a) be a permutation of the
    union, (b) start with a heavy (the long poles start immediately),
    (c) never queue more than ~stride lights between heavies while
    heavies remain (the heavy lanes stay fed just-in-time), and
    (d) handle the degenerate empty-lane cases."""
    from bench import interleave_build_order

    heavy = [f"h{i}" for i in range(45)]
    light = [f"l{i}" for i in range(320)]
    order = interleave_build_order(heavy, light)
    assert sorted(order) == sorted(heavy + light)
    assert order[0] == "h0"
    # between consecutive heavies, at most stride lights
    stride = 320 // 45
    gap = 0
    seen_heavy = 0
    for name in order:
        if name.startswith("h"):
            assert gap <= stride
            gap = 0
            seen_heavy += 1
        elif seen_heavy < len(heavy):
            gap += 1
    assert seen_heavy == 45
    # heavies preserve their given (descending-cost) order
    assert [n for n in order if n.startswith("h")] == heavy

    assert interleave_build_order([], light) == light
    assert interleave_build_order(heavy, []) == heavy
    assert interleave_build_order([], []) == []


def test_heavy_list_names_are_registered():
    """The two-lane scheduler's heavy list is a static snapshot of the
    measured ≥0.8 s queries; a renamed/retired entry silently falls
    back to a light lane (harmless once), but the list must not rot
    unnoticed — every name should exist in the registry."""
    from bench import _HEAVY_SERIAL
    from polybot_data_etl_spark.plans import entrypoints

    registered = set(entrypoints.queries())
    stale = [n for n in _HEAVY_SERIAL if n not in registered]
    assert not stale, f"heavy-lane names no longer registered: {stale}"


def test_classify_errlog_extracts_logger_and_exception_classes(tmp_path):
    """VERDICT r8 #2: a stack fragment in the driver's stdout tail must
    be classifiable from the committed record.  The classifier reads
    the log4j2 ERROR mirror and emits `Logger` and `Logger:Exception`
    signatures, collapsing multi-line stacks to one name each."""
    from bench import classify_errlog

    log = tmp_path / "err.log"
    log.write_text(
        "ERROR org.apache.spark.scheduler.DAGScheduler: "
        "Failed to update accumulator\n"
        "org.apache.spark.SparkException: boom\n"
        "\tat org.apache.spark.scheduler.DAGScheduler"
        ".updateAccumulators(DAGScheduler.scala:1)\n"
        "\tat org.apache.spark.util.EventLoop$$anon$1"
        ".run(EventLoop.scala:50)\n"
        "ERROR org.apache.spark.util.Utils: uncaught\n"
        "java.lang.IllegalStateException: stopped\n"
    )
    assert classify_errlog(str(log)) == [
        "DAGScheduler",
        "DAGScheduler:SparkException",
        "Utils",
        "Utils:IllegalStateException",
    ]


def test_classify_errlog_distinguishes_absent_from_clean(tmp_path):
    """ADVICE r9 #1: a MISSING mirror file (log4j2 config never
    applied) must read as None = "no JVM-error evidence", while only a
    present-and-empty file certifies a clean run as []."""
    from bench import classify_errlog

    assert classify_errlog(str(tmp_path / "absent.log")) is None
    clean = tmp_path / "clean.log"
    clean.write_text("")
    assert classify_errlog(str(clean)) == []


def test_git_head_stamp_resolves_in_this_repo(tmp_path):
    """ADVICE r9 #4: the serial certification stamps the commit it
    measured.  In the repo the stamp resolves to a short hash; outside
    any repo it degrades to None instead of raising."""
    import os
    import re

    from bench import _git_head

    head = _git_head(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert head is not None and re.fullmatch(r"[0-9a-f]{7,40}", head)
    assert _git_head(str(tmp_path)) is None


def test_compact_line_keeps_self_describing_flags():
    """VERDICT r8 #3: the compact line (what the driver json-parses)
    must carry the mode flags — a reader of BENCH_r*.json alone can
    tell whether per-query walls include co-execution queueing."""
    full = _full(365)
    full["exec_concurrency"] = 4
    full["latency_mode"] = False
    full["queueing_included"] = True
    full["spark_stderr_classes"] = []
    full["serial_cert"] = {
        "suite_wall_sec": 165.0,
        "median_query_sec": 0.34,
        "max_query_sec": 2.5,
        "n_queries": 365,
        "sf": 0.1,
        "utc": "2026-08-16T00:00:00Z",
    }
    full["quiet_ref"] = {
        "suite_wall_sec": 51.3,
        "utc": "2026-08-16T00:00:00Z",
        "commit": "abc1234",
    }
    out = compact_line(full)
    line = json.dumps(out)
    assert len(line) <= 2000, len(line)
    parsed = json.loads(line)
    assert parsed["latency_mode"] is False
    assert parsed["queueing_included"] is True
    assert parsed["spark_stderr_classes"] == []
    assert parsed["serial_cert"]["median_query_sec"] == 0.34
    # VERDICT r9 #5: the best same-sf/same-commit wall rides every
    # record, so a mid-band committed run self-describes its band.
    assert parsed["quiet_ref"]["suite_wall_sec"] == 51.3
