"""Constant-density scale probe for exact_substr_spans / exact_substr_scrub.

Per-word salting (the containment_probe builder) is EXACT here, unlike
winnow: duplicate substrings are literal token-sequence matches with no
hash-based selection, so within-replica duplication structure is
preserved verbatim and cross-replica gram overlap is zero — output must
be exactly N x the salted 1x baseline while wall growth isolates the
gram-count/anchor-join/interval-merge plan.

Usage: python tools/substr_probe.py [N ...]   # default 10 100
Reuses the containment probe's replica dirs (same builder, same salt).
"""
from __future__ import annotations

import os
import sys
import time

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    sys.path.insert(0, ".")
    ns = [int(a) for a in sys.argv[1:]] or [10, 100]

    from pyspark.sql import functions as F

    from lakeside_spark.operators.chunking import (
        exact_substr_scrub,
        exact_substr_spans,
    )
    import importlib.util as _ilu

    from lakeside_spark.session import get_spark
    from lakeside_spark.sources.tables import load_table

    _spec = _ilu.spec_from_file_location(
        "containment_probe",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "containment_probe.py"),
    )
    _cp = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_cp)
    build = _cp.build

    spark = get_spark("substr-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (p for p in it), schema="id long"
    ).count()

    def run(docs) -> tuple[float, int, float, int]:
        # materialize through the noop sink, NOT count(): count() on the
        # scrub's unique-key left join lets Catalyst prune the entire
        # dedup branch (count == count(docs)) and times a bare scan —
        # the first cut of this probe reported a 0.4s "scrub" at 100x
        sb = rb = float("inf")
        sr = rr = 0
        for _ in range(2):
            t0 = time.perf_counter()
            exact_substr_spans(docs, k=6).write.format("noop").mode(
                "overwrite"
            ).save()
            sb = min(sb, time.perf_counter() - t0)
            t0 = time.perf_counter()
            exact_substr_scrub(docs, k=6).write.format("noop").mode(
                "overwrite"
            ).save()
            rb = min(rb, time.perf_counter() - t0)
        sr = exact_substr_spans(docs, k=6).count()
        rr = exact_substr_scrub(docs, k=6).count()
        return sb, sr, rb, rr

    # salted 1x baseline: same per-word transform as the replicas so the
    # token statistics match (salt content is irrelevant to exact-match
    # structure, but lengths shift the word stream)
    raw = load_table(spark, SRC, "documents").select("doc_id", "text")
    base = raw.select(
        "doc_id",
        F.array_join(
            F.transform(F.split("text", " "), lambda w: F.concat(w, F.lit("x9"))),
            " ",
        ).alias("text"),
    )
    sb1, sr1, rb1, rr1 = run(base)
    print(f"{'1x':>6s} spans {sb1:7.2f}s {sr1:9d} rows | scrub {rb1:7.2f}s {rr1:9d} docs", flush=True)
    for n in ns:
        out = f"/tmp/lakeside_containment_sf{n}x"
        if not os.path.exists(f"{out}/_BUILD_DONE"):
            print(f"# building constant-density {n}x at {out}", flush=True)
            build(spark, n, out)
        docs = spark.read.parquet(f"{out}/documents.parquet")
        sbn, srn, rbn, rrn = run(docs)
        print(
            f"{n}x".rjust(6)
            + f" spans {sbn:7.2f}s {srn:9d} rows (wall {sbn / sb1:5.1f}x, out {srn / max(sr1,1):5.1f}x)"
            + f" | scrub {rbn:7.2f}s {rrn:9d} docs (wall {rbn / rb1:5.1f}x)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
