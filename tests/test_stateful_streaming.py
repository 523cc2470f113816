"""applyInPandasWithState EMA: state persists across micro-batches."""

import shutil
import tempfile

from lakeside_spark.streaming.stateful import streaming_ema


def test_streaming_ema_state_across_batches(spark):
    src = tempfile.mkdtemp(prefix="ema_src_")
    try:
        schema = "name string, step_ts long, value double"
        spark.createDataFrame(
            [("a", 0, 10.0), ("a", 1, 20.0), ("b", 0, 4.0)], schema
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b0")
        spark.createDataFrame([("a", 2, 0.0)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(f"{src}/b1")

        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            streaming_ema(stream, alpha=0.5)
            .writeStream.format("memory")
            .queryName("ema_out")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["name"], r["step_ts"]): r["ema"]
            for r in spark.sql("SELECT * FROM ema_out").collect()
        }
        # recurrence holds regardless of which micro-batch a row arrived in
        assert got[("a", 0)] == 10.0
        assert got[("a", 1)] == 15.0
        assert got[("a", 2)] == 7.5
        assert got[("b", 0)] == 4.0
    finally:
        shutil.rmtree(src, ignore_errors=True)
