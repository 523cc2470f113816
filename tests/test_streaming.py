"""Structured-streaming ingest test: file-source stream → watermark +
windowed chart agg → memory sink, compared against the batch engine."""

import shutil
import tempfile

from pyspark.sql import functions as F

from lakeside_spark.sources.tables import load_table
from lakeside_spark.streaming.pipeline import streaming_step_counts


def test_streaming_counts_match_batch(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    src_dir = tempfile.mkdtemp(prefix="stream_src_")
    try:
        # stage events as two file "WAL segments" arriving over time
        events.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(
            f"{src_dir}/batch=0"
        )
        events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(
            f"{src_dir}/batch=1"
        )
        stream = (
            spark.readStream.schema(events.schema)
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
        )
        agg = streaming_step_counts(stream, step="1 hour", watermark="0 seconds")
        q = (
            agg.writeStream.format("memory")
            .queryName("stream_counts")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["step_ts"], r["name"]): (r["value"], round(r["sum_value"], 6))
            for r in spark.sql("SELECT * FROM stream_counts").collect()
        }
        exp_rows = (
            events.groupBy(
                F.unix_millis(F.date_trunc("hour", "ts")).alias("step_ts"),
                F.col("event_type").alias("name"),
            )
            .agg(F.count(F.lit(1)).cast("double").alias("value"), F.sum("value").alias("sum_value"))
            .collect()
        )
        exp = {(r["step_ts"], r["name"]): (r["value"], round(r["sum_value"], 6)) for r in exp_rows}
        assert got == exp
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
