"""The bench JSON contract: the driver records only the LAST 2000 chars
of the printed line, so every verdict-relevant summary field must live
inside that tail even on a pathological run (r11 lost its
round-over-round comparison to a 24-row tripwire dump truncating the
line). No Spark needed — this pins the record SHAPE."""

import json

from bench import _build_record


def test_record_tail_survives_many_tripwires():
    # 30 worst-case tripwire rows (longest key name in the registry),
    # full-size query maps — the exact shape a noisy loaded run produces
    regressions = [
        {
            "query": "streaming_replay_service_graph",
            "kind": "vs_prev_run",
            "spark": 123.4567,
            "prev": 1.2345,
            "ratio": 100.01,
        }
        for _ in range(30)
    ]
    record = _build_record(
        duck_query={f"some_longish_query_name_{i}": 123.4567 for i in range(160)},
        per_query={f"some_longish_query_name_{i}": 123.4567 for i in range(180)},
        errors={f"some_longish_query_name_{i}": "x" * 200 for i in range(20)},
        sf=0.1,
        total=999.9999,
        oracle_subset=list(range(159)),
        spark_subset_wall=888.8888,
        duck_total=777.7777,
        ratio=0.275,
        regressions=regressions,
    )
    line = json.dumps(record)
    tail = line[-2000:]
    for field in (
        '"sf"',
        '"metric"',
        '"value"',
        '"unit"',
        '"oracle_subset_queries"',
        '"spark_oracle_subset_sec"',
        '"duckdb_oracle_subset_sec"',
        '"spark_over_duckdb_ratio"',
        '"error_count"',
        '"regression_count"',
    ):
        assert field in tail, (field, len(line))
    # the capped regressions list itself parses out of the record
    assert len(record["regressions"]) <= 10
    assert record["regression_count"] == 30
    # the whole summary span (sf -> end) fits the 2000-char tail with
    # headroom — errors/queries growth can never push it out because
    # they serialize BEFORE sf
    assert len(line) - line.rfind('"sf"') < 1800, len(line) - line.rfind('"sf"')
