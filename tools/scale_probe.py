"""Nx scale-up probe: replicate the driver tables with shifted keys and
time registry queries at 1x vs Nx on the same session.

The small-SF bench verifies correctness; this probe is the evidence that
plans SCALE — wall-clock growth vs data growth per operator. Replication
is key-shifted (ids, users) so join/group cardinalities grow with the
data instead of collapsing onto the same keys, and document text is
salted per replica so near-dup density stays constant (unsalted replicas
would multiply LSH pair volume quadratically and measure output size,
not plan shape — the round-2 lesson).

Usage:
    python tools/scale_probe.py [N] [key ...]      # default N=100
Writes replicated parquet under /tmp/lakeside_probe_sf<N>x and reuses it
across runs (delete the dir to regenerate).
"""
from __future__ import annotations

import os
import shutil
import sys
import time

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMALL_TABLES = (
    "region nation customer supplier part orders".split()
)  # joined dims: link-shared, not replicated
DEFAULT_KEYS = [
    "ts_count",
    "ts_percentile",
    "ts_multi_agg",
    "apdex_score",
    "metric_distribution",
    "dsir_select",
    "text_compression",
    "ts_holt_winters",
    "ann_sq8",
    "tpch_q1",
    "tpch_q6",
]


def build(n: int, out: str) -> None:
    from pyspark.sql import functions as F

    from lakeside_spark.session import get_spark
    from lakeside_spark.sources.tables import load_table

    spark = get_spark("scale-probe-build")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    rep = spark.range(n).select(F.col("id").alias("__rep"))

    ev = load_table(spark, SRC, "events")
    n_ev = ev.count()
    (
        ev.crossJoin(rep)
        .select(
            (F.col("event_id") + F.col("__rep") * n_ev).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("__rep") * 100_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )

    docs = load_table(spark, SRC, "documents")
    n_docs = docs.count()
    (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("__rep") * n_docs).alias("doc_id"),
            # per-replica salt keeps cross-replica near-dup density flat
            F.concat(
                F.col("text"), F.lit(" r"), F.col("__rep").cast("string")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )

    emb = load_table(spark, SRC, "embeddings")
    n_emb = emb.count()
    (
        emb.crossJoin(rep)
        .select(
            (F.col("vec_id") + F.col("__rep") * n_emb).alias("vec_id"),
            "embedding",
            "label",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )

    li = load_table(spark, SRC, "lineitem")
    # shift by observed max key + 1, not a constant: TPC-H orderkeys pass
    # 10M around source SF ~1.7, where a fixed shift would silently
    # collide replica join/group keys and flatten the probe's growth curve
    okey_shift = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    (
        li.crossJoin(rep)
        .select(
            *[
                (F.col("l_orderkey") + F.col("__rep") * okey_shift).alias(
                    "l_orderkey"
                )
                if c == "l_orderkey"
                else F.col(c)
                for c in li.columns
            ]
        )
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )

    for t in SMALL_TABLES:
        src = f"{SRC}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
    # written LAST: an interrupted build must not look complete
    with open(f"{out}/_BUILD_DONE", "w") as fh:
        fh.write(f"n={n} src={SRC}\n")
    spark.stop()


def main() -> int:
    sys.path.insert(0, ".")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    keys = sys.argv[2:] or DEFAULT_KEYS
    out = f"/tmp/lakeside_probe_sf{n}x"
    if not os.path.exists(f"{out}/_BUILD_DONE"):
        print(f"# building {n}x replica at {out}", flush=True)
        t0 = time.time()
        build(n, out)
        print(f"# built in {time.time() - t0:.0f}s", flush=True)

    from lakeside_spark.registry import QUERIES
    from lakeside_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + Arrow workers
    QUERIES["ts_count"](spark, SRC).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (p for p in it), schema="id long"
    ).count()

    print(f"{'key':24s} {'1x':>8s} {'%dx' % n:>8s}  growth")
    for k in keys:
        t = {}
        for tag, d in (("1x", SRC), (f"{n}x", out)):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[k](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            t[tag] = best
        print(
            f"{k:24s} {t['1x']:8.2f} {t[f'{n}x']:8.2f}  {t[f'{n}x'] / t['1x']:5.1f}x",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
