"""Constant-density scale probe for winnow_overlap (text_winnow_overlap).

Same design as tools/containment_probe.py — replicas salt EVERY WORD so
cross-replica char-gram overlap is zero and a tail-salted replica set's
quadratic shared-print density (the round-8 lesson) cannot occur — with
two winnow-specific corrections:

1. Winnowing selects fingerprints by md5 VALUE (rightmost-min), so ANY
   text change reshapes the selected-print set: the raw corpus measured
   394k pairs at sf0.1 where the same corpus salted per-word measures
   ~7.7k (most raw pairs come from dense coincidental short-gram sharing
   the salt dilutes). The 1x BASELINE is therefore the salted corpus,
   not the raw one — growth numbers compare like with like.
2. Salts are fixed-width (x000..x999), so every replica's text statistics
   are identical and per-replica pair density is constant across N —
   output must grow ~linearly in N while wall growth isolates the plan.

Usage: python tools/winnow_probe.py [N ...]   # default 10 100
Replicas build under /tmp/lakeside_winnow_sf<N>x and are reused.
"""
from __future__ import annotations

import os
import sys
import time

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, n: int, out: str) -> None:
    from pyspark.sql import functions as F

    from lakeside_spark.sources.tables import load_table

    docs = load_table(spark, SRC, "documents")
    n_docs = docs.count()
    rep = spark.range(n).select(F.col("id").alias("__rep"))
    salt = F.concat(F.lit("x"), F.lpad(F.col("__rep").cast("string"), 3, "0"))
    salted = F.array_join(
        F.transform(F.split(F.col("text"), " "), lambda w: F.concat(w, salt)),
        " ",
    )
    (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("__rep") * n_docs).alias("doc_id"),
            salted.alias("text"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )
    with open(f"{out}/_BUILD_DONE", "w") as fh:
        fh.write(f"n={n} src={SRC} salt=per-word\n")


def main() -> int:
    sys.path.insert(0, ".")
    ns = [int(a) for a in sys.argv[1:]] or [10, 100]

    from pyspark.sql import functions as F

    from lakeside_spark.operators.winnow import winnow_overlap
    from lakeside_spark.session import get_spark
    from lakeside_spark.sources.tables import load_table

    spark = get_spark("winnow-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (p for p in it), schema="id long"
    ).count()

    def run(docs) -> tuple[float, int]:
        best, rows = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = winnow_overlap(docs, k=8, w=4, min_shared=2, max_df=64).count()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return best, rows

    raw = load_table(spark, SRC, "documents").select("doc_id", "text")
    base_docs = raw.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit("x999")),
            ),
            " ",
        ).alias("text"),
    )
    t1, r1 = run(base_docs)
    print(f"{'1x':>6s} {t1:8.2f}s {r1:10d} rows  (salted baseline)", flush=True)
    for n in ns:
        out = f"/tmp/lakeside_winnow_sf{n}x"
        if not os.path.exists(f"{out}/_BUILD_DONE"):
            print(f"# building constant-density {n}x at {out}", flush=True)
            b0 = time.time()
            build(spark, n, out)
            print(f"# built in {time.time() - b0:.0f}s", flush=True)
        docs = spark.read.parquet(f"{out}/documents.parquet")
        tn, rn = run(docs)
        print(
            f"{n}x".rjust(6)
            + f" {tn:8.2f}s {rn:10d} rows  wall {tn / t1:5.1f}x"
            + f"  output {rn / max(r1, 1):5.1f}x",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
