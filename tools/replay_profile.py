"""Decompose a streaming replay key's wall: record phase vs per-trigger
micro-batch machinery, using the streaming query's own progress metrics.

Usage: python tools/replay_profile.py [funnel|ema|service_graph|late_data]
Prints the record time, each trigger's durationMs breakdown (addBatch,
getBatch, queryPlanning, walCommit, commitOffsets, triggerExecution) and
the state-store commit metrics, then the end-to-end wall for the key.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from lakeside_spark.registry import QUERIES
from lakeside_spark.session import get_spark


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "service_graph"
    key = f"streaming_replay_{which}"
    sf = "/root/testdata/sf0.1"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    # Patch _run_replay to capture query progress before it returns.
    from lakeside_spark.registry import telemetry as T

    progresses: list[dict] = []
    record_wall = {}
    orig_run = T._run_replay
    orig_rec = T._replay_micro_batches

    def rec_spy(spark, df, ts_col, n_batches=2):
        t0 = time.perf_counter()
        src = orig_rec(spark, df, ts_col, n_batches)
        record_wall["record"] = time.perf_counter() - t0
        return src

    def run_spy(spark, src, schema, twin, output_mode="append", shuffle_partitions=8):
        import os as _os

        shuffle_partitions = int(
            _os.environ.get("REPLAY_PROFILE_PARTS", shuffle_partitions)
        )
        import shutil
        import uuid

        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        qname = f"replay_{uuid.uuid4().hex[:10]}"
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        t0 = time.perf_counter()
        try:
            q = (
                twin(stream)
                .writeStream.format("memory")
                .queryName(qname)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination()
                for p in q.recentProgress:
                    progresses.append(p)
            finally:
                q.stop()
        finally:
            record_wall["stream"] = time.perf_counter() - t0
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            shutil.rmtree(src, ignore_errors=True)
        return spark.table(qname)

    # warm run (parquet footers, Python workers, streaming machinery)
    QUERIES[key](spark, sf).write.format("noop").mode("overwrite").save()

    T._replay_micro_batches = rec_spy
    T._run_replay = run_spy
    try:
        t0 = time.perf_counter()
        df = QUERIES[key](spark, sf)
        df.write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
    finally:
        T._run_replay = orig_run
        T._replay_micro_batches = orig_rec

    print(f"=== {key}: total {total:.2f}s")
    print(f"record phase: {record_wall.get('record', float('nan')):.2f}s")
    print(f"stream phase: {record_wall.get('stream', float('nan')):.2f}s")
    for i, p in enumerate(progresses):
        d = p.get("durationMs", {})
        ss = p.get("stateOperators", [])
        ssm = ss[0].get("customMetrics", {}) if ss else {}
        print(
            f"trigger {i}: rows={p.get('numInputRows')} "
            f"trigger={d.get('triggerExecution')}ms addBatch={d.get('addBatch')}ms "
            f"getBatch={d.get('getBatch')}ms latestOffset={d.get('latestOffset')}ms "
            f"plan={d.get('queryPlanning')}ms walCommit={d.get('walCommit')}ms "
            f"commitOffsets={d.get('commitOffsets')}ms"
        )
        if ss:
            print(
                f"  state: commitMs={ss[0].get('allUpdatesTimeMs')}/"
                f"{ss[0].get('commitTimeMs')} mem={ss[0].get('memoryUsedBytes')} "
                f"shufflePartitions={ssm.get('numShufflePartitions')} "
                f"storeInstances={ssm.get('numStateStoreInstances')}"
            )
    print(json.dumps({"total": round(total, 3), **{k: round(v, 3) for k, v in record_wall.items()}}))


if __name__ == "__main__":
    main()
