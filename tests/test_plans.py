"""Physical-plan assertions (SURVEY §5): filters reach the parquet scan,
dimension joins broadcast, columns are pruned, and candidate-bounded
operators never degenerate into cartesian products. These are the
properties that decide whether a plan survives a 100 TB scale-up."""

import pytest
from pyspark.sql import functions as F

from lakeside_spark.registry import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_telemetry_filter_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ts_multi_agg")
    scan = next(l for l in plan.splitlines() if "FileScan" in l and "events" in l)
    assert "event_type" in scan and "IN (purchase,click,view)" in scan, scan


def test_tpch_q6_scan_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q6")
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    # the plan string truncates long filter lists; the shipdate range shows
    # up in DataFilters and the pushed set is non-empty
    assert "l_shipdate" in scan and "PushedFilters: [IsNotNull" in scan, scan
    # projection pruned to the 4 referenced columns — no l_tax/l_comment read
    assert "l_tax" not in scan and "l_orderkey" not in scan, scan


def test_tpch_q10_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q10")
    # at test scale AQE broadcasts every build side; the explicit
    # broadcast(nation) hint must survive regardless
    assert plan.count("BroadcastHashJoin") >= 1
    assert "nation.parquet" in plan
    assert "CartesianProduct" not in plan


def test_banded_simhash_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_simhash")
    assert "CartesianProduct" not in plan, "banded candidates must equi-join"
    assert "BroadcastNestedLoopJoin" not in plan


def test_phash_dedup_stays_banded(spark, sf_dir):
    """multimodal_phash_dedup's budget (6 on a 63-bit hash) must keep the
    pigeonhole-banded equi-join — a larger budget silently degrades
    hamming_pairs to the O(n²) all-pairs join (ADVICE r4)."""
    plan = _plan(spark, sf_dir, "multimodal_phash_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    plan2 = _plan(spark, sf_dir, "multimodal_audio_dedup")
    assert "CartesianProduct" not in plan2
    assert "BroadcastNestedLoopJoin" not in plan2


def test_asof_nearest_single_shuffle_no_join(spark, sf_dir):
    """asof_join direction="nearest" must keep the union+window shape of
    the directed forms: both candidates come from frames over ONE sorted
    keyed exchange — no join operator of any kind, exactly one shuffle,
    one sort (a second sort or a Join means the two-frame trick broke)."""
    plan = _plan(spark, sf_dir, "asof_join_nearest")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Sort ") == 1, plan


def test_jaccard_join_path_no_cartesian(spark, sf_dir):
    from lakeside_spark.operators.dedup import ngram_jaccard_pairs
    from lakeside_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    # eager=False: inspect the real join plan (eager localCheckpoint
    # would truncate the lineage to a checkpoint scan)
    df = ngram_jaccard_pairs(docs, 0.12, strategy="join", eager=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("name", ["ts_count", "tpch_q1"])
def test_whole_stage_codegen_in_hot_path(spark, sf_dir, name):
    # AQE only finalizes the plan on execution; run it, then inspect
    df = QUERIES[name](spark, sf_dir)
    df.collect()  # count() would plan a different query; AQE finalizes THIS one
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen'd stages print as "*(n) Operator" in the final adaptive plan
    assert "isFinalPlan=true" in plan and "*(" in plan, plan[:2000]


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key join WITHOUT a shuffle — the
    bucketed-write-once / join-free-forever pattern for repeated 100 TB
    fact-fact joins."""
    from lakeside_spark.sources.bucketed import read_bucketed, write_bucketed
    from lakeside_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", "l_orderkey", 8, str(tmp_path / "li_b"))
    write_bucketed(orders, "ord_b", "o_orderkey", 8, str(tmp_path / "ord_b"))
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = read_bucketed(spark, "li_b").join(
                read_bucketed(spark, "ord_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            j.collect()
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:1500]
            assert "Exchange hashpartitioning" not in plan, plan[:1500]
            # sanity: same row count as the unbucketed join
            plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            assert j.count() == plain.count()
        finally:
            if prev is not None:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


@pytest.mark.parametrize("key", ["tpch_q7", "tpch_q8", "tpch_q15", "tpch_q18"])
def test_new_tpch_no_nested_loop(key, spark, sf_dir):
    plan = _plan(spark, sf_dir, key)
    assert "CartesianProduct" not in plan, key
    assert "BroadcastNestedLoopJoin" not in plan, key
    assert "BroadcastHashJoin" in plan, f"{key}: dims must broadcast"


@pytest.mark.parametrize(
    "key", ["tpch_q2", "tpch_q9", "tpch_q11", "tpch_q16", "tpch_q20"]
)
def test_derived_partsupp_tpch_shapes(key, spark, sf_dir):
    """The five derived-partsupp queries must not degenerate: no cartesian
    product, dims broadcast, and any BroadcastNestedLoopJoin must be a
    single-row scalar attach — a one-row broadcast is O(1) and
    scale-safe; a nested-loop join against anything wider is not. (The
    partsupp derivation's count(*)-cross-join was replaced by a memoized
    driver literal in round 7, so the usual case is now ZERO
    IdentityBroadcastMode exchanges; the loop below stays as a guard
    against any future non-scalar nested-loop build.)"""
    plan = _plan(spark, sf_dir, key)
    assert "CartesianProduct" not in plan, key
    assert "BroadcastHashJoin" in plan, f"{key}: dims must broadcast"
    # BNLJ builds broadcast with IdentityBroadcastMode (hash joins use
    # HashedRelationBroadcastMode), so asserting every IdentityBroadcastMode
    # exchange feeds from a global (keys=[]) aggregate pins ALL nested-loop
    # builds in the plan to single-row scalars
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "IdentityBroadcastMode" not in line:
            continue
        window = "\n".join(lines[i : i + 4])
        assert "HashAggregate(keys=[]" in window, f"{key}: non-scalar BNLJ\n{window}"


def test_q21_semi_anti_shape(spark, sf_dir):
    """EXISTS/NOT EXISTS compile to semi/anti joins on the fact key — the
    plan property that keeps q21 from degenerating at scale."""
    plan = _plan(spark, sf_dir, "tpch_q21")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("name", ["text_pii_scrub", "corpus_c4_filter", "corpus_chunk"])
def test_curation_gates_are_map_only(spark, sf_dir, name):
    """PII scrub, C4 gate, and chunking must be shuffle-free map pipelines:
    zero exchanges, no joins — the shape that stays embarrassingly
    parallel at 100 TB."""
    plan = _plan(spark, sf_dir, name)
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_span_dedup_broadcasts_boilerplate(spark, sf_dir):
    """The span-DF table is boilerplate-sized; the anti-join against it
    must broadcast, and nothing may degenerate into a cartesian product."""
    plan = _plan(spark, sf_dir, "corpus_span_dedup")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan


def test_span_dedup_fallback_past_broadcast_limit(spark, sf_dir):
    """Past broadcast_limit the hint must NOT be applied: the anti-join
    degrades to a shuffled join (graceful), never an OOM'd forced
    broadcast — and the answer is identical either way."""
    from lakeside_spark.operators.chunking import span_dedup
    from lakeside_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    # kill auto-broadcast so the plan shape reflects the gate, not AQE
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fallback = span_dedup(docs, broadcast_limit=0)
        plan = fallback._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan[:1500]
        assert "LeftAnti" in plan and "CartesianProduct" not in plan
        rows_fb = {tuple(r) for r in fallback.collect()}
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    rows_bc = {tuple(r) for r in span_dedup(docs).collect()}
    assert rows_fb == rows_bc


def test_parallelize_passthrough_when_already_parallel(spark, sf_dir):
    """similarity's kernel-feed repartition must be a no-op on an
    already-parallel input: at 100 TB an unconditional
    repartition(defaultParallelism) is a corpus-sized Exchange that also
    SHRINKS a many-partition scan down to core count."""
    from lakeside_spark.operators.similarity import _parallelize, _scored_against
    import numpy as np
    from lakeside_spark.sources.tables import load_table

    par = spark.sparkContext.defaultParallelism
    emb = load_table(spark, sf_dir, "embeddings")
    wide = emb.repartition(par)
    assert _parallelize(wide) is wide  # exact passthrough, no new plan node
    narrow = emb.coalesce(1)
    assert _parallelize(narrow).rdd.getNumPartitions() == par
    # end-to-end: the score kernel over an already-parallel corpus plans
    # with NO Exchange between the scan and MapInPandas
    q_ids = np.array([1], dtype=np.int64)
    q_unit = np.ones((1, 8), dtype=np.float64)
    scored = _scored_against(
        wide.withColumn("embedding", F.col("embedding").cast("array<double>")),
        q_ids, q_unit, "embedding", "vec_id", exclude_self=False,
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # exactly ONE Exchange — the test's own repartition(par) that made the
    # input wide; _parallelize must not have stacked a second one
    assert plan.count("Exchange") == 1, plan[:1500]


def test_corpus_curate_single_scan_gates(spark, sf_dir):
    """The quality/length/split gates must be filters at the documents
    scan (no semi-joins against derived projections), and decontamination
    must broadcast its dirty-id side. eager=False keeps the gate subtree
    inspectable (the default eager localCheckpoint truncates it, r13)."""
    from lakeside_spark.registry.text import corpus_curate

    df = corpus_curate(spark, sf_dir, eager=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan, plan
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l and "documents" in l]
    assert scan_lines, plan
    # the doc_id % 20 split gate reaches the scan as a data filter
    assert any("n_chars" in l for l in scan_lines), scan_lines
    # the gate-survivor frame is shared (one InMemoryRelation): the
    # Gopher kernel runs once inside it, not once per consumer — the
    # lazy-plan kernel census is gopher(1, shared) + decontam gram
    # kernels + the jaccard shingle kernel; the r12 before-plan carried
    # 3 duplicated gopher chains on top of that
    assert "InMemoryRelation" in plan, plan[:2000]
    assert plan.count("MapInPandas") <= 4, plan[:2000]
    # the DEFAULT (benched) path materializes the gate survivors at build
    # time: the returned plan reads the checkpoint (no gopher re-run; the
    # decontam gram kernels legitimately remain — they feed the final
    # anti-join's broadcast side once)
    plan_eager = _plan(spark, sf_dir, "corpus_curate")
    assert "Scan ExistingRDD" in plan_eager, plan_eager[:2000]
    assert plan_eager.count("MapInPandas") <= 3, plan_eager[:2000]


def test_funnel_no_cartesian_and_pushed_step_filters(spark, sf_dir):
    """The default "agg" funnel is ONE name-IN-filtered scan (predicate
    pushed to parquet) + one user-keyed aggregation — at 100 TB a funnel
    that materializes the unfiltered fact table per step, or theta-joins
    steps, does not survive."""
    plan = _plan(spark, sf_dir, "funnel_conversion")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    scans = [l for l in plan.splitlines() if "FileScan" in l and "events" in l]
    # single scan with the step-name IN-list pushed down
    assert len(scans) == 1, scans
    assert "purchase" in scans[0] and "view" in scans[0], scans
    # one user-keyed exchange feeds the chain; the k-counter rollup is a
    # single-row agg, not another corpus shuffle
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]


def test_trace_service_graph_single_window_shuffle(spark, sf_dir):
    """The span-adjacency edges come from ONE keyed window pass plus the
    vocabulary-sized edge agg — no joins at all in the plan."""
    plan = _plan(spark, sf_dir, "trace_service_graph")
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan


def test_ts_outlier_mad_broadcasts_series_stats(spark, sf_dir):
    """Median/MAD per-series stats tables are name-vocabulary-sized and
    must broadcast back onto the series — never shuffle the series twice
    for a stats attach."""
    plan = _plan(spark, sf_dir, "ts_outlier_mad")
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "CartesianProduct" not in plan


def test_self_knn_bucket_path_no_broadcast_collect(spark, sf_dir):
    """Past the broadcast gate, corpus self-kNN must become a bucket
    SELF-join: no cartesian, no nested-loop, and it must agree with the
    exact path on the vectors' own-bucket neighbors (subset recall)."""
    from lakeside_spark.operators.similarity import self_knn
    from lakeside_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = self_knn(emb, k=3, strategy="bucket")
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = bucketed.collect()
    assert rows
    # every reported neighbor must be a genuine corpus id and ranked 1..k
    ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert all(r["q_id"] in ids and r["n_id"] in ids for r in rows)
    assert all(1 <= r["rank"] <= 3 for r in rows)
    # approximate-vs-exact sanity: for queries where the bucket held >=3
    # candidates, the bucket path's top-1 cos can not exceed exact top-1
    exact = {
        (r["q_id"], r["rank"]): r["cos"]
        for r in self_knn(emb, k=3, strategy="exact").collect()
    }
    for r in rows:
        if r["rank"] == 1:
            assert r["cos"] <= exact[(r["q_id"], 1)] + 1e-9


def test_embedding_dim_stats_single_shuffle_partial_agg(spark, sf_dir):
    """posexplode must stay map-side: the only Exchange is the 64-key
    dim aggregation, with partial (map-combined) HashAggregates before
    it — at 100 TB shuffling the exploded n×d rows raw would move the
    whole corpus."""
    plan = _plan(spark, sf_dir, "embedding_dim_stats")
    assert plan.count("Exchange") == 1, plan[:1500]
    assert "partial_sum" in plan


def test_apdex_single_shuffle_pushed_nulls(spark, sf_dir):
    """apdex is a chart-family agg: exactly one Exchange (the step+name
    keys) with partial map-side band counts, and the NOT NULL gates
    pushed to the scan."""
    plan = _plan(spark, sf_dir, "apdex_score")
    assert plan.count("Exchange") == 1, plan[:1500]
    assert "partial_sum" in plan or "partial_count" in plan
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "IsNotNull" in scan, scan


def test_dsir_weight_table_broadcasts(spark, sf_dir):
    """dsir_select's bucket-weight table (≤256 rows) must ride to the
    word stream as a BroadcastHashJoin — a shuffled join here would
    re-exchange the entire exploded corpus; the only corpus-sized
    Exchange allowed is the final doc_id score agg (plus the top-k
    rangepartitioning)."""
    plan = _plan(spark, sf_dir, "dsir_select")
    # pass-2 scoring goes through a literal lookup array — there must be
    # NO join of any kind and nothing cached; the only corpus-sized
    # exchange is the doc_id score agg (plus the top-k limit)
    assert "Join" not in plan, plan[:1500]
    assert "InMemoryRelation" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "partial_count" in plan or "partial_sum" in plan


def test_embedding_decontam_is_map_only(spark, sf_dir):
    """embedding_decontam's 100 TB claim IS the plan: the benchmark
    matrix broadcasts inside the Arrow kernel, so the corpus scan must
    reach the output with no Join and no key-partitioned Exchange (the
    only allowed Exchange is _parallelize's small-input round-robin
    spread, which an already-parallel scan skips)."""
    plan = _plan(spark, sf_dir, "embedding_decontam")
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
    assert "Exchange rangepartitioning" not in plan, plan[:1500]
    assert "Join" not in plan, plan[:1500]
    assert "FileScan" in plan


def test_ann_ivf_broadcast_cell_join(spark, sf_dir):
    """ann_ivf joins corpus cells against the probed query cells: the
    query side must BROADCAST (it is queries×n_probe rows by
    construction) — a shuffle join here would move the corpus."""
    plan = _plan(spark, sf_dir, "ann_ivf")
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan, plan[:1500]


def test_ann_pq_shortlist_never_corpus_sized(spark, sf_dir):
    """ann_pq's windows run on the tasks×queries×rerank shortlist, and
    the rescore join against the query matrix must broadcast — no
    sort-merge join, no cartesian."""
    plan = _plan(spark, sf_dir, "ann_pq")
    assert "SortMergeJoin" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastHashJoin" in plan, plan[:1500]


def test_whitening_apply_is_map_only(spark, sf_dir):
    """embedding_whitening's returned plan is the broadcast-transform
    APPLY pass: scan → Arrow kernel, zero Exchanges (the covariance
    reduce ran eagerly at build time on d²-sized partials)."""
    plan = _plan(spark, sf_dir, "embedding_whitening")
    assert "Exchange" not in plan, plan[:1500]
    assert "FileScan" in plan


def test_cluster_stats_single_cell_shuffle(spark, sf_dir):
    """embedding_cluster_stats: map-only assign kernel, then ONE
    exchange to the n_cells keys with map-side partials."""
    plan = _plan(spark, sf_dir, "embedding_cluster_stats")
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]
    assert "partial_count" in plan or "partial_sum" in plan


def test_holt_series_keyed_shuffles_only(spark, sf_dir):
    """ts_holt_winters runs on the aggregated series table: the chart
    agg's step shuffle plus the series-keyed applyInPandas shuffle —
    no corpus-sized exchange beyond those two."""
    plan = _plan(spark, sf_dir, "ts_holt_winters")
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:1500]
    assert "FlatMapGroupsInPandas" in plan or "ApplyInPandas" in plan


def test_vocab_pmi_arrow_kernel_parallel_no_hof(spark, sf_dir):
    """vocab_pmi's count table (the corpus-sized pass): an Arrow
    mapInPandas kernel — NOT the round-5 interpreted transform() lambda
    bigram explode — fed through the size-aware parallelize gate: a
    kilobyte corpus stays on few tasks (no 32-worker fan-out for ms of
    work), a big one spreads to all cores (pinned on a synthetic
    many-byte input below)."""
    from lakeside_spark.operators.textstats import (
        _parallelize_sized,
        _pmi_count_table,
    )
    from lakeside_spark.sources.tables import load_table

    counts = _pmi_count_table(load_table(spark, sf_dir, "documents"))
    plan = counts._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan[:1500]
    assert "transform(" not in plan and "lambdafunction" not in plan, plan[:1500]
    # the sized gate: tiny test corpus → task count bounded by bytes, not
    # blown out to defaultParallelism
    import os

    docs = load_table(spark, sf_dir, "documents").select("text")
    total = sum(
        os.path.getsize(f.removeprefix("file:")) for f in docs.inputFiles()
    )
    dp = spark.sparkContext.defaultParallelism
    want = max(1, min(dp, -(-total // (4 << 20))))
    got = _parallelize_sized(docs).rdd.getNumPartitions()
    assert got >= want, (got, want)
    # an already-parallel input passes through with no extra Exchange
    wide = spark.range(0, 1 << 20, 1, dp).selectExpr("repeat('x', 64) AS text")
    assert _parallelize_sized(wide).rdd.getNumPartitions() >= dp


def test_stickiness_no_nested_loop_join(spark, sf_dir):
    """stickiness_dau_mau's trailing-30d MAU: explode(sequence) equi-join
    shape — no BroadcastNestedLoopJoin scanning the day spine per row."""
    plan = _plan(spark, sf_dir, "stickiness_dau_mau")
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "Generate explode" in plan, plan[:1500]


def test_text_quality_classifier_plan(spark, sf_dir):
    """Hashing-trick classifier inference must stay join-free codegen:
    one map-side-combined aggregate shuffle, top-20 via per-partition
    TakeOrdered (never a global Sort of the scored corpus)."""
    plan = _plan(spark, sf_dir, "text_quality_classifier")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, "weight lookup must be an expression, not a join"
    # exactly the one aggregate exchange (plus AQE wrappers); a global
    # Sort before the limit would mean the top-k is not partition-local
    body = plan.split("TakeOrderedAndProject")[0]
    assert "Sort" not in body, "no global sort above the top-k"


def test_dedup_incremental_no_cartesian(spark, sf_dir):
    """Incremental shard-vs-index dedup must candidate-bound everything:
    banded equi-join for candidates (no cartesian / BNLJ anywhere) and
    verification joined through the candidate list. Built with
    eager=False: the production path's localCheckpoint truncates the
    lineage to a Scan ExistingRDD, which would make this guard
    unfalsifiable — the lazy plan is the same logical shape minus the
    checkpoint."""
    from pyspark.sql import functions as F

    from lakeside_spark.operators.dedup import minhash_lsh_match
    from lakeside_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    index = docs.filter(F.col("doc_id") % 10 != 0)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    df = minhash_lsh_match(index, incoming, threshold=0.12, eager=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan, "checkpoint leaked into lazy path"
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_rfm_has_no_global_window(spark, sf_dir):
    """rfm_segmentation must never rank users through a global ntile —
    a partition-less Window is a single-task total order at 100 TB. The
    quintile boundaries ride in via broadcast instead."""
    plan = _plan(spark, sf_dir, "rfm_segmentation")
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan
    # boundary + anchor singletons arrive as broadcast builds
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_char_entropy_is_map_only(spark, sf_dir):
    """text_char_entropy is entirely array-side codegen — the only
    exchange allowed is the explicit scan-spreading repartition; no
    aggregation or join shuffle may appear."""
    plan = _plan(spark, sf_dir, "text_char_entropy")
    assert "HashAggregate" not in plan, plan
    assert "Join" not in plan and "Window" not in plan, plan


def test_ngram_novelty_single_generate(spark, sf_dir):
    """corpus_ngram_novelty derives both per-doc counts from ONE exploded
    shingle stream: exactly one Generate (plus the DF-count branch's),
    never a second scan re-computing the shingle expression for sizes."""
    plan = _plan(spark, sf_dir, "corpus_ngram_novelty")
    # two branches share the same source: pairs (scored) + freq build
    assert plan.count("Generate") <= 2, plan
    assert "CartesianProduct" not in plan
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    assert all("text" in s or "doc_id" in s for s in scans)


def test_exact_substr_plan_shape(spark, sf_dir):
    """corpus_exact_substr must stay wordcount-shaped: the duplicated-
    anchor join is an equi-join on the gram hash (never a cartesian),
    and the final (doc_id, __isl) aggregate reuses the doc_id window's
    partitioning instead of adding another exchange."""
    plan = _plan(spark, sf_dir, "corpus_exact_substr")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # interval merge = one Window over doc_id, and the plan prints
    # result-first: everything BEFORE the Window line is the final
    # (doc_id, __isl) aggregate, which must reuse the window's
    # hashpartitioning(doc_id) instead of adding another exchange
    win_at = plan.find("Window")
    assert win_at != -1, plan[:2000]
    assert "Exchange hashpartitioning(doc_id" not in plan[:win_at], plan[:win_at]
    # the per-doc gram arrays are checkpointed once (r13, was persisted
    # in r12): the sliding-gram md5 pass runs at build time and must not
    # reappear per consumer (count agg / join probe side)
    assert "Scan ExistingRDD" in plan, plan[:2000]
    assert "md5" not in plan, plan[:2000]
    # the removal action shares the anchor plan and must stay equi-join
    # shaped as well (anti-join on (doc_id, pos), never a range/cross)
    plan2 = _plan(spark, sf_dir, "corpus_substr_scrub")
    assert "CartesianProduct" not in plan2
    assert "BroadcastNestedLoopJoin" not in plan2
    # scrub keeps tokens in the same checkpointed arrays: tokenize runs
    # once at build time, not four times (gram pass ×2 + token stream +
    # per-doc length)
    assert "Scan ExistingRDD" in plan2, plan2[:2000]
    assert "regexp" not in plan2, plan2[:2000]


def test_attribution_chain_plan_shape(spark, sf_dir):
    """The capped attribution window-chain plan (r12) must stay
    single-pass: ONE scan of events, ZERO joins, and exactly ONE sort
    (the per-user stream sort all N chained last(...) Window layers
    share). A second sort means the chained layers stopped sharing the
    ordering (the touch marker regressing from a materialized column to
    an inline order-by expression re-sorts per layer); a join means the
    chain fell back to the self-join plan."""
    df = QUERIES["event_attribution"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan
    assert "Join" not in plan, plan
    assert plan.count("Sort ") == 1, plan
