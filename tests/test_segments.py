"""Segment lake layout: round-trip + partition pruning verification."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from lakeside_spark import schema as S
from lakeside_spark.schema import load_telemetry
from lakeside_spark.sources.segments import read_segments, write_segments


@pytest.fixture(scope="module")
def lake(spark, sf_dir):
    path = tempfile.mkdtemp(prefix="lake_")
    tele = load_telemetry(spark, sf_dir)
    write_segments(tele, path, dataset="logs")
    yield path, tele
    shutil.rmtree(path, ignore_errors=True)


def test_roundtrip_preserves_rows(spark, lake):
    path, tele = lake
    got = read_segments(spark, path, dataset="logs")
    assert got.count() == tele.count()


def test_time_range_filters_rows(spark, lake):
    path, tele = lake
    bounds = tele.select(F.min(S.TIMESTAMP), F.max(S.TIMESTAMP)).first()
    start = bounds[0] + 86_400_000  # skip first day
    end = bounds[1] - 86_400_000
    got = read_segments(spark, path, dataset="logs", start_ts=start, end_ts=end)
    exp = tele.filter((F.col(S.TIMESTAMP) >= start) & (F.col(S.TIMESTAMP) < end))
    assert got.count() == exp.count()


def test_partition_pruning_in_plan(spark, lake):
    path, _ = lake
    df = read_segments(spark, path, dataset="logs", start_ts=1704412800000, end_ts=1704499200000)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # partition filters must reference the layout columns, not be empty
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "dateint" in pf and "dataset" in pf


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    import glob

    from lakeside_spark.sources.segments import compact_segments, write_segments
    from lakeside_spark.sources.tables import load_table
    from lakeside_spark.schema import load_telemetry

    lake = str(tmp_path / "lake")
    tele = load_telemetry(spark, sf_dir)
    # simulate many tiny sealed segments: 16 files per partition
    from pyspark.sql import functions as F

    ts = F.timestamp_millis(F.col("timestamp_ms"))
    df = (
        tele.withColumn("dataset", F.lit("logs"))
        .withColumn("dateint", F.date_format(ts, "yyyyMMdd").cast("int"))
        .withColumn("hour", F.date_format(ts, "HH").cast("int"))
        .repartition(16)
    )
    df.write.mode("overwrite").partitionBy("dataset", "dateint", "hour").parquet(lake)
    rows_before = spark.read.parquet(lake).count()
    files_before = len(glob.glob(f"{lake}/**/*.parquet", recursive=True))
    compact_segments(spark, lake, target_file_bytes=64 * 1024 * 1024)
    rows_after = spark.read.parquet(lake).count()
    files_after = len(glob.glob(f"{lake}/**/*.parquet", recursive=True))
    assert rows_after == rows_before
    assert files_after < files_before, (files_before, files_after)


def test_partitions_timezone_independent(spark, sf_dir, tmp_path):
    """write_segments must derive dateint/hour from UTC integer math, not
    the session timezone — otherwise read-side UTC pruning silently drops
    rows near day/hour boundaries on non-UTC sessions."""
    lake = str(tmp_path / "tzlake")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        tele = load_telemetry(spark, sf_dir)
        write_segments(tele, lake, dataset="logs")
        bounds = tele.select(F.min(S.TIMESTAMP), F.max(S.TIMESTAMP)).first()
        got = read_segments(
            spark, lake, dataset="logs", start_ts=bounds[0], end_ts=bounds[1] + 1
        )
        assert got.count() == tele.count()
        # spot-check: every partition value equals the UTC derivation
        row = got.select(S.TIMESTAMP, "dateint", "hour").first()
        from lakeside_spark.sources.segments import _dateint_hour

        day, hour = _dateint_hour(row[S.TIMESTAMP])
        assert (row["dateint"], row["hour"]) == (day, hour)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_compaction_failure_leaves_source_intact(spark, sf_dir, tmp_path, monkeypatch):
    """A crash mid-compaction (here: during the temp write) must not lose
    lake data — the swap only happens after the temp copy verifies."""
    import lakeside_spark.sources.segments as seg

    lake = str(tmp_path / "crashlake")
    tele = load_telemetry(spark, sf_dir).limit(500)
    write_segments(tele, lake, dataset="logs")
    before = read_segments(spark, lake, dataset="logs").count()

    import os as os_mod

    def exploding_rename(src, dst):
        raise OSError("simulated crash before swap")

    monkeypatch.setattr(os_mod, "rename", exploding_rename)
    with pytest.raises(OSError, match="simulated crash"):
        seg.compact_segments(spark, lake)
    monkeypatch.undo()
    assert read_segments(spark, lake, dataset="logs").count() == before


def test_jsonl_ingest_roundtrip(spark, tmp_path):
    import json

    from lakeside_spark.sources.ingest import ingest_files, read_jsonl_telemetry

    src = tmp_path / "in.jsonl"
    rows = [
        {"timestamp_ms": 1_700_000_000_000 + i * 3_600_000, "name": "error",
         "value": float(i), "message": f"m{i}", "host": f"h{i % 2}"}
        for i in range(6)
    ]
    lines = [json.dumps(r) for r in rows]
    lines.insert(3, "{not json at all")          # malformed line drops
    lines.append(json.dumps({"value": 1.0}))      # missing ts+name drops
    src.write_text("\n".join(lines))

    tele = read_jsonl_telemetry(spark, str(src), tag_columns=("host",))
    assert tele.count() == 6
    assert tele.columns == ["timestamp_ms", "name", "value", "message", "host"]

    lake = tmp_path / "lake"
    n = ingest_files(spark, str(src), str(lake), fmt="jsonl", tag_columns=("host",))
    assert n == 6
    from lakeside_spark.sources.segments import read_segments

    back = read_segments(spark, str(lake), dataset="logs")
    assert back.count() == 6
    assert {r["host"] for r in back.select("host").collect()} == {"h0", "h1"}


def test_csv_ingest(spark, tmp_path):
    from lakeside_spark.sources.ingest import read_csv_telemetry

    src = tmp_path / "in.csv"
    src.write_text(
        "timestamp_ms,name,value,message,region\n"
        "1700000000000,error,1.5,boom,us\n"
        "1700000100000,info,2.5,ok,eu\n"
        ",missing,1.0,dropped,us\n"
    )
    tele = read_csv_telemetry(spark, str(src), tag_columns=("region",))
    got = {(r["name"], r["region"]) for r in tele.collect()}
    assert got == {("error", "us"), ("info", "eu")}
