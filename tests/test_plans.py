"""Physical-plan contract tests (SURVEY.md §4): pushdown, pruning,
broadcast, exchange counts — asserting the engine produces the plans
it was designed around, not just correct rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from scache_spark import plans
from scache_spark.catalog import load_table
from scache_spark.operators.relational import (
    broadcast_join_parts,
    filter_project_cast,
    flagship_revenue_by_region,
    pricing_summary,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = filter_project_cast(spark, sf_dir)
    pf = plans.pushed_filters(df)
    assert "o_orderstatus" in pf and "o_totalprice" in pf, pf
    # LIKE 'prefix%' pushes as StringStartsWith
    assert "StartsWith" in pf or "o_orderpriority" in pf, pf


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    rs = plans.read_schema(df)
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_extendedprice" not in rs, f"scan reads pruned column: {rs}"


def test_flagship_uses_broadcast_joins(spark, sf_dir):
    df = flagship_revenue_by_region(spark, sf_dir)
    assert plans.has_broadcast_join(df)
    # dims broadcast; only lineitem⋈orders may justify a shuffle join,
    # so the plan must not shuffle more than: join + final agg
    assert plans.exchange_count(df) <= 3, plans.formatted_plan(df)


def test_broadcast_join_is_broadcast(spark, sf_dir):
    df = broadcast_join_parts(spark, sf_dir)
    assert plans.has_broadcast_join(df)
    assert not plans.has_sort_merge_join(df)
    # fact side never shuffles for the join; single exchange for the agg
    assert plans.exchange_count(df) <= 1, plans.formatted_plan(df)


def test_pricing_summary_single_shuffle(spark, sf_dir):
    # partial agg map-side; exactly one exchange on the group key
    df = pricing_summary(spark, sf_dir)
    assert plans.exchange_count(df) == 1, plans.formatted_plan(df)
    pf = plans.pushed_filters(df)
    assert "l_shipdate" in pf, pf


def test_whole_stage_codegen_active(spark, sf_dir):
    df = pricing_summary(spark, sf_dir)
    assert plans.codegen_stage_count(df) >= 1


def test_date_filter_prunes_rowgroups(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    assert "o_orderdate" in plans.pushed_filters(df)


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """With thresholds lowered to test scale, Catalyst injects a
    runtime bloom filter from the selective join side into the fact
    scan (BloomFilterMightContain in the optimized plan)."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB"
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # at 100 TB the build side exceeds the broadcast threshold, so
        # the join shuffles and injection is organic; model that here —
        # Catalyst (correctly) skips bloom filters for broadcast joins
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        from scache_spark.operators.extra import bloom_filter_join_prune

        df = bloom_filter_join_prune(spark, sf_dir)
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in optimized.lower() or "might_contain" in optimized.lower(), (
            optimized[:2000]
        )
    finally:
        for k, v in saved.items():
            conf.set(k, v)



def test_kmeans_assignment_is_aggregate_not_window(spark, sf_dir):
    """The nearest-centroid argmin must compile to a (map-side
    combinable) aggregate: a Window argmin has no partial aggregation
    and shuffles K×n scored rows instead of n."""
    from scache_spark.operators.clustering import ann_ivf_cells

    p = plans.formatted_plan(ann_ivf_cells(spark, sf_dir))
    assert "Window" not in p, p[:1500]
    assert "partial_min" in p or "HashAggregate" in p


def test_lpt_schedule_single_small_shuffle(spark, sf_dir):
    """LPT = full-scale partial agg down to R rows, then ONE grouped-map
    stage.  The corpus must not reach the pandas stage: the plan shows
    aggregation below FlatMapGroupsInPandas."""
    from scache_spark.operators.scheduling import lpt_schedule

    p = plans.formatted_plan(lpt_schedule(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in p
    assert "HashAggregate" in p


def test_event_log_parse_is_narrow_until_agg(spark, sf_dir):
    """Render→parse is per-line inside codegen; only the per-task
    regroup and the final (stage,host) aggregate shuffle."""
    from scache_spark.operators.eventlog import event_log_parse

    df = event_log_parse(spark, sf_dir)
    assert plans.exchange_count(df) <= 3, plans.formatted_plan(df)[:1500]


def test_tfidf_single_job_no_driver_count(spark, sf_dir):
    """The corpus count must be part of the plan (broadcast 1-row
    aggregate over the materialized tf frame), not a separate
    driver-side .count() job: the final plan reads the tf checkpoint
    — the single corpus tokenize — and never documents.parquet.
    (Job-count is not asserted: AQE materializes each checkpoint
    query stage as its own job.)"""
    from scache_spark.operators.text import text_tfidf_top_terms

    df = text_tfidf_top_terms(spark, sf_dir)
    assert plans.scan_counts(df).get("documents.parquet", 0) == 0, (
        "final tfidf plan re-scans the corpus instead of the checkpoint"
    )
    assert "BroadcastNestedLoopJoin" in plans.formatted_plan(df) or (
        "BroadcastExchange" in plans.formatted_plan(df)
    )


def test_bucketed_join_has_no_join_exchange(spark, sf_dir):
    from scache_spark.operators.extra import bucketed_join_revenue

    df = bucketed_join_revenue(spark, sf_dir)
    # both sides pre-bucketed on the join key: the join is a bucket-
    # aligned SortMergeJoin with NO exchange on either input; the only
    # shuffle allowed is the final 5-group agg
    assert plans.has_sort_merge_join(df), plans.formatted_plan(df)
    assert not plans.has_broadcast_join(df), plans.formatted_plan(df)
    assert plans.exchange_count(df) <= 1, plans.formatted_plan(df)


def test_pagerank_edges_built_once(spark, sf_dir):
    from scache_spark.operators.graph import pagerank_event_graph

    df = pagerank_event_graph(spark, sf_dir)
    # every iteration joins BROADCAST against the tiny rank frame —
    # no sort-merge join may appear anywhere in the unrolled loop
    assert not plans.has_sort_merge_join(df), plans.formatted_plan(df)


def test_q19_disjunction_pushed_and_broadcast(spark, sf_dir):
    from scache_spark.operators.tpch2 import tpch_q19_disjunctive_revenue

    df = tpch_q19_disjunctive_revenue(spark, sf_dir)
    # the 3-brand filter bounds part -> broadcast; no shuffle join
    assert plans.has_broadcast_join(df)
    assert not plans.has_sort_merge_join(df)
    # Catalyst extracts the branch-wise quantity ranges and pushes the
    # OR-of-ranges into the lineitem scan
    pf = plans.pushed_filters(df)
    assert "l_quantity" in pf, pf
    assert plans.exchange_count(df) <= 1, plans.formatted_plan(df)


def test_q20_semi_join_single_exchange(spark, sf_dir):
    from scache_spark.operators.tpch2 import tpch_q20_potential_promotion

    df = tpch_q20_potential_promotion(spark, sf_dir)
    # supplier never shuffles: the IN(IN(...)) chain is broadcast
    # joins + a broadcast LEFT SEMI; the only exchange is the
    # (partkey, suppkey) quantity aggregate
    assert plans.has_broadcast_join(df)
    assert not plans.has_sort_merge_join(df)
    assert plans.exchange_count(df) <= 1, plans.formatted_plan(df)
    pf = plans.pushed_filters(df)
    assert "l_shipdate" in pf, pf


def test_q21_bounded_shuffles(spark, sf_dir):
    from scache_spark.operators.tpch2 import tpch_q21_waiting_suppliers

    df = tpch_q21_waiting_suppliers(spark, sf_dir)
    # the EXISTS/NOT-EXISTS rewrite costs: lineitem⋈orders shuffle,
    # the two-phase distinct aggregate, and the st rejoin — but never
    # a correlated double self-join of lineitem
    assert plans.exchange_count(df) <= 4, plans.formatted_plan(df)
    # supplier rides a broadcast onto the survivor set
    assert plans.has_broadcast_join(df)


def test_salted_join_shuffles_not_broadcasts(spark, sf_dir):
    from scache_spark.operators.blocks import salted_skew_join

    df = salted_skew_join(spark, sf_dir)
    # the whole point is the shuffle path: broadcast would hide the
    # salt spreading (and is impossible at 100 TB)
    assert not plans.has_broadcast_join(df), plans.formatted_plan(df)


def test_partition_pruning_reaches_directory_level(spark, sf_dir):
    from scache_spark.operators.extra import partition_pruned_read

    df = partition_pruned_read(spark, sf_dir)
    plan = plans.formatted_plan(df)
    # the IN-filter must resolve as a PartitionFilter (directory
    # pruning), not a data Filter over every partition's rows
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan


def test_e2e_funnel_two_exchanges(spark, sf_dir):
    from scache_spark.operators.pipeline import training_corpus_e2e

    df = training_corpus_e2e(spark, sf_dir)
    # gate signals + hash are one narrow projection; the only
    # shuffles are the survivor aggregate and the per-source funnel —
    # the corpus text itself never exchanges
    assert plans.exchange_count(df) <= 2, plans.formatted_plan(df)
    assert "Cartesian" not in plans.formatted_plan(df)


def test_q2_no_cartesian_and_bounded(spark, sf_dir):
    from scache_spark.operators.tpch2 import tpch_q2_min_cost_supplier

    df = tpch_q2_min_cost_supplier(spark, sf_dir)
    # the correlated-min rejoin must stay an equi-join on
    # (part, rounded cost) — never a cartesian/BNLJ
    plan = plans.formatted_plan(df)
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert plans.has_broadcast_join(df)
    assert plans.exchange_count(df) <= 5, plan


def test_sessionization_single_user_shuffle(spark, sf_dir):
    from scache_spark.operators.temporal import session_path_mining

    df = session_path_mining(spark, sf_dir)
    # one shuffle on user_id serves sessionization AND path assembly;
    # the second is the tiny (path, count) aggregate + top-k
    assert plans.exchange_count(df) <= 2, plans.formatted_plan(df)
    assert not plans.has_sort_merge_join(df)


def test_global_sort_uses_range_partitioning(spark, sf_dir):
    """B9 Terasort shape: a global orderBy must sample split points and
    range-partition (parallel sort), never collapse to one partition."""
    li = load_table(spark, sf_dir, "lineitem")
    df = li.orderBy("l_extendedprice", "l_orderkey")
    assert "rangepartitioning" in plans.formatted_plan(df).lower()


def test_priority_sample_is_take_ordered(spark, sf_dir):
    """Top-(k+1) priorities must run as TakeOrderedAndProject
    (per-partition heaps), not a global sort or corpus-wide window.
    Asserted on the pre-checkpoint frame (the query materializes it
    once for its three consumers, which truncates the visible plan)."""
    from scache_spark.operators.scalar import (
        _priority_topk,
        weighted_priority_sample,
    )

    p = plans.formatted_plan(_priority_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p
    # and the materialized query never re-reads the corpus for ranking
    final = weighted_priority_sample(spark, sf_dir)
    assert plans.scan_counts(final).get("documents.parquet", 0) <= 1


def test_bloom_bitmap_probe_is_broadcast_only(spark, sf_dir):
    """The 512-word filter and the build-key set must reach the probe
    as broadcasts — the probe side shuffles only for its distinct."""
    from scache_spark.operators.extra import bloom_bitmap_membership

    df = bloom_bitmap_membership(spark, sf_dir)
    assert plans.has_broadcast_join(df)
    assert not plans.has_sort_merge_join(df), plans.formatted_plan(df)


def test_int8_quantize_corpus_never_shuffles_rows(spark, sf_dir):
    """Range table joins back via broadcast; the only exchanges carry
    64-row per-dim aggregates, never the exploded corpus."""
    from scache_spark.operators.similarity import embedding_int8_quantize

    df = embedding_int8_quantize(spark, sf_dir)
    assert plans.has_broadcast_join(df)
    assert plans.exchange_count(df) <= 3, plans.formatted_plan(df)


def test_substring_dedup_exchanges_are_bounded(spark, sf_dir):
    """Window hashing happens in-projection; the plan's exchanges are
    on (hash, doc_id) pairs and pair aggregation only."""
    from scache_spark.operators.dedup import dedup_substring_pairs

    df = dedup_substring_pairs(spark, sf_dir)
    assert plans.exchange_count(df) <= 6, plans.formatted_plan(df)


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """The 100 TB skew story, proven live: with one hot key dominating
    a shuffle join, AQE re-plans the join to read the skewed partition
    in slices (SortMergeJoin(skew=true) + 'AQEShuffleRead ... skewed').
    Thresholds are lowered so fixture-scale data exhibits it; the
    executed plan must come from the SAME query execution that ran
    (a fresh .count() would replan from scratch without AQE state).
    Note: a downstream aggregate keyed on the join key suppresses the
    split (it would break the reusable partitioning) — that is why
    salting (salted_skew_join) stays in the toolbox."""
    conf = spark.conf
    keys = (
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    saved = {k: conf.get(k) for k in keys}
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        hot = spark.range(500000).select(
            F.lit(7).alias("k"), (F.col("id") * 37 % 1000003).alias("v")
        )
        cold = spark.range(5000).select(
            (F.col("id") % 50 + 100).alias("k"), F.col("id").alias("v")
        )
        right = spark.range(200).select(
            (F.col("id") % 200).alias("k"), F.lit(1).alias("w")
        )
        j = hot.unionAll(cold).join(right, "k")
        assert len(j.collect()) == 505000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert "skewed" in plan, plan[:1500]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_join_strategy_hints_are_respected(spark, sf_dir):
    """The engine's join-strategy surface: broadcast / merge /
    shuffle_hash hints must each produce their physical join node —
    the manual override lane when AQE's choice is wrong for a known
    workload."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    cases = (
        ("broadcast", "BroadcastHashJoin"),
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
    )
    for hint, node in cases:
        df = o.join(c.hint(hint), o.o_custkey == c.c_custkey)
        plan = plans.formatted_plan(df)
        assert node in plan, f"hint {hint}: {plan[:800]}"


def test_bucket_pruning_reads_one_bucket(spark, sf_dir, tmp_path):
    """Point lookups on a bucketed table must prune to the key's
    bucket file (SelectedBucketsCount: 1 out of N) — the durable
    analog of the reference's getBlock key-match read path
    (deploy/Daemon.scala:65-82): the key tells you which block to
    read, so you read one.  autoBucketedScan is disabled because
    Spark otherwise drops the bucketed layout for scans with no
    join/agg to co-locate — pruning is the benefit here."""
    from scache_spark.sources import write_bucketed

    prev = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        spark.sql("DROP TABLE IF EXISTS bucket_prune_t")
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        write_bucketed(
            o, "bucket_prune_t", ["o_orderkey"], 8, str(tmp_path / "bp")
        )
        df = spark.table("bucket_prune_t").filter(F.col("o_orderkey") == 42)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:1200]
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )
        spark.sql("DROP TABLE IF EXISTS bucket_prune_t")


def test_analyze_table_feeds_cbo_stats(spark, sf_dir):
    """Statistics plane (the MapStatus analog at table grain): ANALYZE
    TABLE COMPUTE STATISTICS must surface rowCount/sizeInBytes to the
    optimizer, so the cost-based planner sees real cardinalities
    instead of file-size guesses."""
    spark.sql("DROP TABLE IF EXISTS stats_t")
    load_table(spark, sf_dir, "nation").write.saveAsTable("stats_t")
    prev_cbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try:
        spark.sql("ANALYZE TABLE stats_t COMPUTE STATISTICS")
        n = spark.table("stats_t").count()
        detail = spark.sql("DESCRIBE TABLE EXTENDED stats_t").collect()
        stats_row = [r for r in detail if r["col_name"] == "Statistics"]
        assert stats_row, detail
        assert f"{n} rows" in stats_row[0]["data_type"], stats_row
        # rowCount reaches plan-level Statistics only under CBO
        spark.conf.set("spark.sql.cbo.enabled", "true")
        plan_stats = (
            spark.table("stats_t")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .toString()
        )
        assert f"rowCount={n}" in plan_stats, plan_stats
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev_cbo)
        spark.sql("DROP TABLE IF EXISTS stats_t")


def test_bm25_qterms_broadcast_and_topk_bounded(spark, sf_dir):
    """BM25: the query-term join must broadcast (<=5 rows ship, the
    postings never re-shuffle for it) and the final top-20 must be a
    TakeOrderedAndProject, not a global sort."""
    from scache_spark.operators.text import text_bm25_topk

    plan = text_bm25_topk(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_semantic_dedup_assignment_is_aggregate(spark, sf_dir):
    """Semantic dedup's cell assignment must be the map-side-combinable
    min-struct aggregate (shuffle carries n rows, not K*n) — same
    contract as the k-means assignment."""
    from scache_spark.operators.clustering import dedup_semantic_cells

    plan = (
        dedup_semantic_cells(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_min" in plan or "partial min" in plan.lower()


def test_skew_salted_join_keys_include_salt(spark, sf_dir):
    """The salted skew join must actually shuffle on (k, salt): the
    forced ShuffledHashJoin's partitioning expressions carry the salt
    column, so the hot key's rows spread across _SALT partitions
    instead of one straggler."""
    from scache_spark.operators.extra import skew_salted_join

    plan = (
        skew_salted_join(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan, plan
    # the join-side exchanges hash on both k and salt
    assert "salt" in plan, plan


def test_mapstatus_compressed_plan_is_checkpoint_fed(spark, sf_dir):
    """The >2000-reducer MapStatus twin derives everything from the
    checkpointed <=128-cell frame: the final plan must not re-scan
    lineitem, and the decode-error join must be broadcast."""
    from scache_spark.operators.blocks import mapstatus_highly_compressed

    df = mapstatus_highly_compressed(spark, sf_dir)
    assert plans.scan_counts(df).get("lineitem.parquet", 0) == 0
    assert plans.has_broadcast_join(df)


def test_trace_parsers_single_scan(spark, sf_dir):
    """Both trace-mining queries are render->parse->aggregate over ONE
    fact scan — no branch may re-read the source."""
    from scache_spark.operators.eventlog import (
        blockmanager_added_log_parse,
        hadoop_attempt_trace_parse,
    )

    for fn in (hadoop_attempt_trace_parse, blockmanager_added_log_parse):
        df = fn(spark, sf_dir)
        assert plans.scan_counts(df).get("lineitem.parquet", 0) == 1, fn.__name__


def test_attempt_parser_handles_blank_fields(spark, sf_dir):
    """deal_na_int semantics: blank CSV cells parse to -1 and are
    counted as incomplete, never silently dropped or crashed on."""
    from scache_spark.operators.eventlog import hadoop_attempt_trace_parse

    out = hadoop_attempt_trace_parse(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["n_reduce_tasks"] >= 6).all()
    # complete-row stats are physically sensible: positive shuffle-free
    # runtimes, shuffle fraction inside (0, 1) — blank-parsed -1 cells
    # leaking into the arithmetic would violate both
    assert (out["total_run_time"] > 0).all()
    assert ((out["avg_shuffle_frac"] > 0) & (out["avg_shuffle_frac"] < 1)).all()
    assert (out["n_incomplete"] >= 0).all()


def test_scan_counts_distinguishes_broad_from_point_scans(spark, sf_dir):
    """broad_scan_counts must count full/range scans but exempt scans
    whose reader has an equality filter pushed (point lookups read a
    pruned slice — cheaper than materializing to avoid them)."""
    e = load_table(spark, sf_dir, "embeddings")
    point = e.filter(F.col("vec_id") == 42)
    corpus = e.filter(F.col("vec_id") != 42)
    df = corpus.crossJoin(
        F.broadcast(point.select(F.col("embedding").alias("q")))
    ).select("vec_id")
    total = plans.scan_counts(df).get("embeddings.parquet", 0)
    broad = plans.broad_scan_counts(df).get("embeddings.parquet", 0)
    assert total == 2, plans.formatted_plan(df)
    assert broad == 1, plans.formatted_plan(df)


def test_scan_counts_union_of_filtered_arms_counts_each_scan(spark, sf_dir):
    """The defect class the lint exists for: a union of three filtered
    arms over one table plans three scans — scan_counts must see all
    three, and the explode-over-variant rewrite must collapse to one
    (asserted via augmented_docs, the canonical rewrite)."""
    o = load_table(spark, sf_dir, "orders")
    union3 = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .unionByName(o.filter(F.col("o_orderkey") % 3 == 1))
        .unionByName(o.filter(F.col("o_orderkey") % 3 == 2))
    )
    assert plans.broad_scan_counts(union3).get("orders.parquet", 0) == 3

    from scache_spark.operators.dedup import augmented_docs

    aug = augmented_docs(spark, sf_dir)
    assert plans.broad_scan_counts(aug).get("documents.parquet", 0) == 1


def test_bm25_checkpoint_rows_are_bounded_flat(spark, sf_dir):
    """r10 (ADVICE r9): bm25's materialized term-frequency table must
    stay FLAT — no per-doc array column anywhere in the final plan, so
    a single large-vocabulary document can never materialize an
    unbounded row — and the query-term prune must happen as a
    broadcast join (scoring cost bounded by the query term count)."""
    from pyspark.sql import types as T

    from scache_spark.operators.text import text_bm25_topk

    df = text_bm25_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the r9 shape aggregated postings via collect_list; its removal is
    # the boundedness contract
    assert "collect_list" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_ann_ivf_nprobe_final_plan_reads_no_parquet(spark, sf_dir):
    """r10: every branch of the nprobe recall curve (queries, seeds,
    cell ranks, truth, re-ranks, sizes) must derive from the ONE
    assignment checkpoint — a parquet scan in the final plan means a
    branch regressed to re-reading the corpus (the r9 shape scanned
    embeddings twice more for the seed centroids)."""
    from scache_spark.operators.clustering import ann_ivf_nprobe_recall

    df = ann_ivf_nprobe_recall(spark, sf_dir)
    assert plans.broad_scan_counts(df).get("embeddings.parquet", 0) == 0, (
        plans.formatted_plan(df)
    )
    assert plans.scan_counts(df).get("embeddings.parquet", 0) == 0
