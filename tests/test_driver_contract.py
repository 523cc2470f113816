"""Driver-parity gate: the round-1 killer was that the driver supplies its
own *vanilla* SparkSession (no confs from lakeside_spark.session.get_spark),
and the testdata parquet encodes TIMESTAMP(NANOS) which a vanilla session
refuses to read. This test reproduces the driver exactly: a bare
``SparkSession.builder.getOrCreate()`` in a fresh subprocess (so no conf
leaks from the pytest session) running registry queries end-to-end.
"""

from __future__ import annotations

import subprocess
import sys

SF_DIR = "/root/testdata/sf0.001"

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# exactly what the driver does: its own session, none of our confs
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as e

qs = e.queries()
# one query per table family that carries timestamp columns, plus one per
# round-4 operator family (curation, codec, LM, seasonal) — new code paths
# must also survive a conf-less session
for key in [
    "ts_count", "tpch_q1", "asof_join", "exemplars", "ema_smooth",
    "text_pii_scrub", "corpus_span_dedup", "multimodal_decode",
    "text_perplexity", "ts_seasonal", "text_bpe_tokens",
    "multimodal_phash_dedup", "multimodal_audio_dedup",
    # round-5 families: traces mapping, behavior windows, MG sketch,
    # fixed-point embedding stats, CUSUM, kNN labels
    "traces_span_stats", "trace_service_graph", "funnel_conversion",
    "freq_topk_sketch", "embedding_dim_stats", "ts_step_change",
    "embedding_knn_mislabel",
    # round-5 third wave: md5-bucketed importance weights, zlib kernel,
    # Holt recursion, SQ8 byte codes, kmeans cell stats
    "dsir_select", "text_compression", "ts_holt_winters", "ann_sq8",
    "embedding_cluster_stats",
    # round-7: eager leg collects + local-relation results must survive
    # a conf-less session too (bm25 gate count, pool cache, driver fuse)
    "text_bm25_topk", "hybrid_rrf_topk", "retrieval_eval",
    "event_attribution", "ngram_lm_score", "corpus_ngram_novelty",
    "rfm_segmentation", "text_char_entropy", "trace_concurrency",
    "service_pagerank", "funnel_time_to_convert", "ts_gap_report",
]:
    df = qs[key](spark, "%s")
    n = df.count()
    assert n >= 0, key
    print(key, "OK", n)

# entry() contract itself
out = e.entry(spark)
assert out.count() > 0
print("entry OK")
spark.stop()
""" % SF_DIR


def test_vanilla_session_reads_nanos_parquet():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    assert "entry OK" in proc.stdout


def test_every_key_survives_driver_canonicalizer(spark, sf_dir):
    """Round-6 killer #2: the driver canonicalizes every result with
    ``pandas.sort_values`` over all columns followed by an md5 of the CSV —
    which raises ``TypeError: unhashable type: 'list'`` on any array-typed
    output column (multimodal_decode and embedding_whitening crashed r6 this
    way). Run the driver's exact recipe against EVERY ``queries()`` key so no
    output schema can ever crash the harness again.
    """
    import hashlib

    import __spark_entry__ as e

    failures = []
    for key, fn in e.queries().items():
        try:
            pdf = fn(spark, sf_dir).toPandas()
            # the driver's _canon, verbatim shape: column-sorted,
            # row-sorted over all columns, rounded, hashed
            canon = (
                pdf[sorted(pdf.columns)]
                .sort_values(sorted(pdf.columns))
                .reset_index(drop=True)
            )
            hashlib.md5(canon.round(6).to_csv(index=False).encode()).hexdigest()
        except Exception as exc:  # noqa: BLE001 - collect all offenders
            failures.append(f"{key}: {type(exc).__name__}: {exc}")
    assert not failures, "driver-canonicalizer crashes:\n" + "\n".join(failures)
