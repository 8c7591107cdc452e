"""Plan-shape regression guards: the physical properties the 100 TB
story depends on must not silently regress (PLANS.md records them;
these tests enforce them)."""

from ecmm428_pycart_spark.benchmarks import get_queries
import pytest

SF = "/root/testdata/sf0.001"


def _plan(spark, name, mode="formatted"):
    df = get_queries()[name](spark, SF)
    m = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(m)


def test_q01_filter_and_projection_pushdown(spark):
    plan = _plan(spark, "q01_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan          # predicate pushed
    assert "l_orderkey" not in plan.split("ReadSchema:")[1].split("\n")[0]
    # partial aggregation before the shuffle (map-side combine)
    assert "HashAggregate" in plan


def test_q22_broadcasts_dims(spark):
    plan = _plan(spark, "q22_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    # nation scan reads only the join key + name (column pruning)
    for read in plan.split("ReadSchema:")[1:]:
        head = read.split("\n")[0]
        if "n_name" in head:
            assert "n_regionkey" not in head


def test_s01_query_vector_is_broadcast(spark):
    plan = _plan(spark, "s01_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the embeddings scan prunes the label column
    assert "label" not in plan.split("ReadSchema:")[1].split("\n")[0]


def test_results_invariant_to_shuffle_partitions(spark):
    """Tie-sensitive queries (argmax, top-k) must return identical rows
    under different parallelism — the determinism contract that makes
    the oracle gate meaningful on any cluster size."""
    qs = get_queries()
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a10 = sorted(map(tuple, qs["q10_argmax_per_group"](spark, SF).collect()))
        a16 = sorted(map(tuple, qs["q16_topk"](spark, SF).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b10 = sorted(map(tuple, qs["q10_argmax_per_group"](spark, SF).collect()))
        b16 = sorted(map(tuple, qs["q16_topk"](spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a10 == b10 and a16 == b16


def test_concurrent_query_execution(spark):
    """Multiple queries on one session from worker threads (the shape a
    multi-tenant driver produces) — results identical to serial runs."""
    import concurrent.futures as cf
    qs = get_queries()
    names = ["q01_pricing_summary", "q11_agg_minmax",
             "d02_text_stats", "s01_cosine_topk"]
    serial = {n: sorted(map(tuple, qs[n](spark, SF).collect()))
              for n in names}
    with cf.ThreadPoolExecutor(max_workers=4) as ex:
        futs = {n: ex.submit(lambda n=n: sorted(
            map(tuple, qs[n](spark, SF).collect()))) for n in names}
        parallel = {n: f.result(timeout=120) for n, f in futs.items()}
    assert parallel == serial


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Date-partitioned parquet layout + a date filter must hit only the
    matching partition directories (PartitionFilters in the scan) — the
    layout/pruning contract a 100 TB events table depends on."""
    from pyspark.sql import functions as F

    from ecmm428_pycart_spark.session import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events") \
        .withColumn("event_date", F.col("ts").cast("date"))
    path = str(tmp_path / "events_parted")
    ev.write.partitionBy("event_date").parquet(path)

    dates = [r["event_date"] for r in
             ev.select("event_date").distinct().limit(2).collect()]
    back = spark.read.parquet(path).filter(F.col("event_date") == dates[0])
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan
    # row parity against an unpartitioned filter
    want = ev.filter(F.col("event_date") == dates[0]).count()
    assert back.count() == want and want > 0


def test_q69_plan_has_dpp(spark):
    """q69's fact scan must carry a dynamicpruningexpression partition
    filter (DPP engaged), not a plain full scan of all 5 priority
    directories."""
    from ecmm428_pycart_spark.benchmarks.registry import get_queries
    df = get_queries()["q69_dpp_prune"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert df.count() > 0


# Queries whose plans legitimately contain a BroadcastNestedLoopJoin:
# every one is a crossJoin(broadcast(<1-row aggregate or tiny literal
# table>)) — anchor maxima, scalar fingerprints, IDF doc counts, query
# vectors, codebooks, bucket edges. The build side is O(1) rows by
# construction, so the "nested loop" is a constant-time map-side append,
# not a quadratic join.
_BNLJ_OK = {
    "d14_tfidf_top_terms",      # 1-row corpus doc-count for IDF
    "d31_unigram_lm_score",     # 1-row corpus token total
    "d33_token_drift",          # 1-row per-side token totals
    "g01_noncontiguous_scale",  # 1-row anchor max
    "g07_queen_borders_large",  # 1-row grid side length
    "g09_noncontiguous_large",  # 1-row grid side + anchor
    "g12_knn_spatial",          # 1-row grid side length
    "g13_point_in_polygon",     # 1-row grid side + count
    "k01_kmeans_clusters",      # sf fingerprint / centroid broadcast
    "q32_range_bucket_join",    # literal bucket-edge table
    "q35_scalar_subquery",      # 1-row scalar aggregate
    "q47_kmv_sketch",           # 1-row exact-count side
    "q58_dormant_high_balance",  # 1-row average-balance scalar
    "s01_cosine_topk",          # broadcast query vector
    "s03_centroid_assign",      # broadcast codebook
    "s04_ivf_probe",            # broadcast codebook
    "s12_pq_adc_rerank",        # broadcast query vector + codebooks
    "s13_ivf_pq_topk",          # broadcast query vector + codebooks (IVF-PQ)
    "s09_knn_join",             # broadcast query batch
    "d37_bigram_lm",            # 1-row corpus token total (backoff)
    "d38_bm25",                 # 1-row (n_docs, avgdl) doc stats
    "d39_heavy_hitters",        # 1-row total-token count (support cut)
    "s15_truncated_rerank",     # broadcast query vector
    "s16_rrf_hybrid",           # query vector + 1-row BM25 doc stats
    "s22_embedding_normalize",  # 1-row per-dimension stats arrays
    "d42_bpe_encode",  # see tests/test_queued_queries._QUEUED_BNLJ_OK
    "d43_perplexity_buckets",  # see tests/test_queued_queries._QUEUED_BNLJ_OK
    "d45_temperature_mix",  # see tests/test_queued_queries._QUEUED_BNLJ_OK
    "d48_lm_reference_scoring",  # see tests/test_queued_queries._QUEUED_BNLJ_OK
    "g18_clustering_coeff",  # see tests/test_queued_queries._QUEUED_BNLJ_OK
    "q86_important_stock",  # see tests/test_queued_queries._QUEUED_BNLJ_OK
    "q91_rfm_segments",  # see tests/test_queued_queries._QUEUED_BNLJ_OK
    "q95_curation_pipeline",  # see tests/test_queued_queries._QUEUED_BNLJ_OK
    "s20_hard_negatives",  # see tests/test_queued_queries._QUEUED_BNLJ_OK
    "q101_approx_quantile_bounds",  # see tests/test_queued6_queries (1-row broadcasts)
    "s23_binary_hamming_topk",  # see tests/test_queued6_queries (1-row broadcasts)
    "s24_ann_recall_eval",  # see tests/test_queued6_queries (1-row broadcasts)
    "s25_matryoshka_recall",  # see tests/test_queued6_queries (1-row broadcasts)
    "s26_ivf_nprobe_recall",  # see tests/test_queued6_queries (1-row broadcasts)
    "g21_link_prediction",  # see tests/test_queued6_queries (1-row broadcasts)
    "d65_lsh_tuning_sweep",  # see tests/test_queued6_queries (1-row broadcasts)
    "q104_fk_integrity",  # see tests/test_queued6_queries (1-row broadcasts)
    "s28_faceted_topk",  # see tests/test_queued6_queries (1-row broadcasts)
    "g27_k_truss",  # see tests/test_queued7_queries (1-row broadcasts)
    "d72_pseudonymize",  # see tests/test_queued7_queries (1-row broadcasts)
    "g31_lpa_modularity",  # see tests/test_queued7_queries (1-row broadcasts)
    "q112_session_concurrency",  # see tests/test_queued7_queries (1-row broadcasts)
    "g32_partition_quality",  # see tests/test_queued7_queries (1-row broadcasts)
    "g34_degree_assortativity",  # see tests/test_queued7_queries (1-row broadcasts)
    "d77_label_agreement",  # see tests/test_queued7_queries (1-row broadcasts)
    "q117_association_rules",  # see tests/test_queued7_queries (1-row broadcasts)
    "s30_similarity_histogram",  # see tests/test_queued7_queries (1-row broadcasts)
    "d91_mixing_weights",  # see tests/test_queued7_queries (1-row broadcasts)
    "g35_morans_i",  # see tests/test_queued8_queries (1-row broadcasts)
    "g38_lisa_quadrants",  # see tests/test_queued8_queries (1-row broadcasts)
    "g40_placement_compare",  # see tests/test_queued8_queries (1-row broadcasts)
    "g36_euler_audit",  # see tests/test_queued8_queries (1-row broadcasts)
    "st23_stream_cdc_tombstones",  # see tests/test_queued8_queries (1-row broadcasts)
    "d83_robots_filter",  # see tests/test_queued8_queries (1-row broadcasts)
    "d94_crawl_frontier",  # see tests/test_queued8_queries (1-row broadcasts)
    "q122_percent_of_parent",  # see tests/test_queued8_queries (1-row broadcasts)
    "d84_registrable_domain",  # see tests/test_queued8_queries (1-row broadcasts)
    "q126_fk_discovery",  # see tests/test_queued8_queries (1-row broadcasts)
    "s31_lsh_tables_recall",  # see tests/test_queued8_queries (1-row broadcasts)
    "q132_decayed_engagement",  # see tests/test_queued8_queries (1-row broadcasts)
    "q133_crawl_pipeline",  # see tests/test_queued8_queries (1-row broadcasts)
    "q134_decontaminated_curation",  # see tests/test_queued8_queries (1-row broadcasts)
    "q136_quality_cascade",  # see tests/test_queued8_queries (1-row broadcasts)
    "q137_crawl_search",  # see tests/test_queued8_queries (1-row broadcasts)
}


@pytest.mark.slow
def test_registry_wide_plan_guards(spark):
    """Every registered batch query's physical plan is free of the two
    unconditional scale-killers — CartesianProduct (unbounded pair
    blowup) and BatchEvalPython (row-at-a-time Python in the hot path) —
    and BroadcastNestedLoopJoin appears only for documented O(1)-row
    build sides (_BNLJ_OK). Streaming (st*) queries execute rather than
    plan lazily and are guarded by their own tests."""
    qs = get_queries()
    offenders = {}
    for name, fn in sorted(qs.items()):
        if name.startswith("st"):
            continue
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        bad = [p for p in ("CartesianProduct", "BatchEvalPython") if p in plan]
        if "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_OK:
            bad.append("BroadcastNestedLoopJoin")
        if bad:
            offenders[name] = bad
    assert not offenders, f"scale anti-patterns found: {offenders}"


def _broadcast_subtrees(plan: str):
    """Extract the subtree under every `BroadcastExchange
    IdentityBroadcastMode` node (the build side of a BNLJ) from a
    physical-plan string, scoped by the tree-drawing indentation."""
    import re
    lines = plan.split("\n")
    subs = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange IdentityBroadcastMode" not in ln:
            continue
        depth = len(re.match(r"^[ :+-]*", ln).group(0))
        body = []
        for nxt in lines[i + 1:]:
            d = len(re.match(r"^[ :+-]*", nxt).group(0))
            if nxt.strip() and d <= depth:
                break
            body.append(nxt)
        subs.append("\n".join(body))
    return subs


@pytest.mark.slow
def test_bnlj_allowlist_build_sides_are_tiny(spark):
    """Round-4 hardening of _BNLJ_OK (VERDICT r3 next-8): the allowlist
    must not silently admit a fat nested-loop. For every allowlisted
    query, every identity-broadcast build side must be PROVABLY small
    from the plan itself: a no-grouping aggregate (1 row), a
    GlobalLimit 1, a literal LocalTableScan (no file scan beneath), or
    a codebook aggregate grouped on the bounded label/cluster key.
    Entries whose plans no longer contain a BNLJ at all are stale and
    must be removed (keeps the allowlist 1:1 with reality)."""
    import re
    qs = get_queries()
    bad, stale = {}, []
    for name in sorted(_BNLJ_OK):
        plan = qs[name](spark, SF)._jdf.queryExecution() \
            .executedPlan().toString()
        if "BroadcastNestedLoopJoin" not in plan:
            stale.append(name)
            continue
        for sub in _broadcast_subtrees(plan):
            # provably-1-row: no-grouping aggregate or LIMIT 1
            one_row = ("HashAggregate(keys=[]" in sub
                       or "SortAggregate(key=[]" in sub
                       or "GlobalLimit 1" in sub)
            # driver-literal table (codebook / bucket edges): O(1) rows
            # by construction, and provably not file-backed
            literal = (("LocalTableScan" in sub
                        or "Scan ExistingRDD" in sub)
                       and "FileScan" not in sub)
            # codebook aggregate grouped on the bounded cluster key
            codebook = re.search(r"(ObjectHashAggregate|HashAggregate)"
                                 r"\(keys=\[(label|cluster)#", sub)
            # query-vector selection: literal equality / small upper
            # bound on the embedding key riding the scan
            m = re.search(r"Filter .*\(vec_id#\d+L? (?:=|<) (\d+)\)", sub)
            qvec = bool(m) and int(m.group(1)) <= 1024
            ok = one_row or literal or codebook or qvec
            if not ok:
                bad.setdefault(name, []).append(
                    sub.strip().split("\n")[0][:80])
    assert not bad, f"BNLJ build side not provably tiny: {bad}"
    assert not stale, (f"stale _BNLJ_OK entries (no BNLJ in plan any "
                       f"more — remove them): {stale}")


def test_s05_no_nested_loop_join(spark):
    """The near-dup pair query must stay an equi-join on the LSH bucket —
    regression guard against the all-pairs cartesian shape."""
    from ecmm428_pycart_spark.benchmarks import get_queries

    df = get_queries()["s05_cosine_neardup"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_results_invariant_to_aqe(spark):
    """AQE rewrites plans at runtime (coalescing, skew splits, join
    strategy switches); results must not depend on it — the engine's
    determinism contract has to hold on clusters with either setting."""
    qs = get_queries()
    names = ["q10_argmax_per_group", "d06_minhash_lsh_jaccard",
             "g05_dorling_scalable"]

    def run_all():
        return {n: sorted(map(tuple, qs[n](spark, SF).collect()))
                for n in names}

    orig = spark.conf.get("spark.sql.adaptive.enabled")
    on = run_all()
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        off = run_all()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", orig)
    assert on == off


def test_q52_tpch_q3_shape(spark):
    """Shipping-priority: date predicates pushed into BOTH fact scans,
    top-10 via TakeOrderedAndProject (no global sort), lineitem scan
    pruned to 3 columns."""
    plan = _plan(spark, "q52_shipping_priority")
    assert "TakeOrderedAndProject" in plan
    assert "GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan
    for read in plan.split("ReadSchema:")[1:]:
        head = read.split("\n")[0]
        if "l_extendedprice" in head:
            assert "l_quantity" not in head and "l_partkey" not in head


def test_q53_tpch_q5_single_fact_shuffle(spark):
    """Local-supplier volume: every dim side is broadcast — the only
    allowed shuffle joins are on the lineitem⋈orders fact keys. At toy
    scale AQE broadcasts everything; force-disable broadcast thresholds
    would be artificial, so assert the broadcast count instead: at
    least 3 BroadcastHashJoins and no cartesian/BNLJ."""
    plan = _plan(spark, "q53_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # orders scan carries both date bounds
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_q54_topk_before_dim_attach(spark):
    """Returned-items: the revenue top-20 must be computed BEFORE the
    customer/nation attach (TakeOrderedAndProject below the final
    joins), and the 20-row side must broadcast — so the wide customer
    table is never shuffled. l_returnflag is pushed into the lineitem
    scan."""
    plan = _plan(spark, "q54_returned_items")
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    # customer scan reads only the 3 attach columns
    for read in plan.split("ReadSchema:")[1:]:
        head = read.split("\n")[0]
        if "c_name" in head:
            assert "c_acctbal" not in head and "c_mktsegment" not in head


def test_q55_semi_join_mixed_condition(spark):
    """Late-shipment priority: the EXISTS compiles to a LeftSemi join
    keyed on orderkey with the cross-table range predicate riding the
    join (not a post-filter over a full inner join), and the lineitem
    scan is pruned to the 2 columns the predicate needs."""
    plan = _plan(spark, "q55_late_shipment_priority")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    for read in plan.split("ReadSchema:")[1:]:
        head = read.split("\n")[0]
        if "l_shipdate" in head:
            assert "l_extendedprice" not in head and "l_quantity" not in head


def test_q56_aggregate_before_joins(spark):
    """Large-volume customers: the HAVING-filtered quantity sum must be
    computed on lineitem ALONE (aggregate below every join — the
    'reduce before you join' shape), then broadcast into orders; the
    lineitem scan reads only the 2 aggregate columns."""
    plan = _plan(spark, "q56_large_volume_customers")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the qty aggregate's HashAggregate must appear under a
    # BroadcastExchange (tiny qualifying set is the build side)
    assert "BroadcastExchange" in plan
    for read in plan.split("ReadSchema:")[1:]:
        head = read.split("\n")[0]
        if "l_quantity" in head:
            assert "l_extendedprice" not in head and "l_shipdate" not in head


def test_q57_left_outer_preserves_zero_counts(spark):
    """Order-count distribution: the left outer join must survive into
    the physical plan (an optimizer rewrite to inner would silently
    drop zero-order customers), and both scans prune to key columns."""
    plan = _plan(spark, "q57_order_count_distribution")
    assert "LeftOuter" in plan
    assert "CartesianProduct" not in plan
    for read in plan.split("ReadSchema:")[1:]:
        head = read.split("\n")[0]
        if "o_custkey" in head:
            assert "o_totalprice" not in head
        if "c_custkey" in head:
            assert "c_acctbal" not in head and "c_name" not in head


def test_q58_anti_join_and_scalar_broadcast(spark):
    """Dormant high-balance: NOT EXISTS compiles to LeftAnti; the
    1-row average broadcasts (no shuffle for the scalar); the dormancy
    date predicate pushes into the orders scan, which reads only the
    custkey + the filter column."""
    plan = _plan(spark, "q58_dormant_high_balance")
    assert "LeftAnti" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    for read in plan.split("ReadSchema:")[1:]:
        head = read.split("\n")[0]
        if "o_custkey" in head:
            assert "o_totalprice" not in head and "o_orderstatus" not in head


def test_dynamic_partition_pruning(spark, tmp_path):
    """Star-join DPP: a month-partitioned fact joined to a calendar dim
    filtered on an attribute must scan ONLY the partitions the dim
    filter selects — the runtime analog of static partition pruning and
    the single biggest scan-saver for a date-partitioned 100 TB fact.
    Evidence: a dynamicpruningexpression in the fact scan's partition
    filters, plus row parity with the unpartitioned plan."""
    from pyspark.sql import functions as F

    from ecmm428_pycart_spark.session import load_table

    ev = (load_table(spark, SF, "orders")
          .withColumn("om", F.date_trunc("month", "o_orderdate").cast("date")))
    fact_path = str(tmp_path / "orders_p")
    dim_path = str(tmp_path / "dim_months")
    ev.write.partitionBy("om").parquet(fact_path)
    (ev.select("om").distinct()
       .withColumn("quarter", F.quarter("om"))
       .withColumn("year", F.year("om"))
       .write.parquet(dim_path))

    fact = spark.read.parquet(fact_path)
    dim = (spark.read.parquet(dim_path)
           .filter((F.col("year") == 1997) & (F.col("quarter") == 1)))
    j = fact.join(dim, "om").groupBy("om").agg(F.count(F.lit(1)).alias("n"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "DPP subquery not inserted"
    got = {(r["om"], r["n"]) for r in j.collect()}
    want = {(r["om"], r["n"]) for r in
            (ev.filter((F.year("om") == 1997) & (F.quarter("om") == 1))
             .groupBy("om").agg(F.count(F.lit(1)).alias("n")).collect())}
    assert got == want and len(got) == 3


def test_runtime_bloom_filter_join(spark, tmp_path):
    """Runtime bloom-filter injection on a shuffle join: the selective
    dim side builds a bloom filter that pre-filters the fact scan
    before the shuffle — at 100 TB this is what keeps a selective
    fact⋈dim SMJ from shuffling the whole fact table. Thresholds are
    lowered to make it fire at toy scale; result parity asserted."""
    from pyspark.sql import functions as F

    from ecmm428_pycart_spark.session import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem") \
        .select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, "/root/testdata/sf0.01", "orders") \
        .filter(F.col("o_totalprice") > 400000) \
        .select("o_orderkey")
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        # creation side must be SMALL (<= threshold), application side
        # LARGE (> threshold) — raise one, zero the other
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    orig = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = li.join(orders, li.l_orderkey == orders.o_orderkey) \
              .agg(F.round(F.sum("l_extendedprice"), 2).alias("s"),
                   F.count(F.lit(1)).alias("n"))
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), "runtime bloom filter not injected"
        got = j.collect()[0]
    finally:
        for k, v in orig.items():
            spark.conf.set(k, v)
    want = li.join(orders, li.l_orderkey == orders.o_orderkey) \
             .agg(F.round(F.sum("l_extendedprice"), 2).alias("s"),
                  F.count(F.lit(1)).alias("n")).collect()[0]
    assert (got["s"], got["n"]) == (want["s"], want["n"]) and got["n"] > 0


def test_q51_all_predicates_pushed(spark):
    """Q6-shaped scan-agg: all three range predicates reach the parquet
    scan and only the four referenced columns are read."""
    plan = _plan(spark, "q51_forecast_revenue")
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    read = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_orderkey" not in read and "l_extendedprice" in read


def test_q60_bucketed_join_no_exchange(spark):
    """The gate's bucketed co-located join must actually join without a
    hash-partitioning Exchange above the bucketed scans once the
    broadcast escape hatch is off (the write-once-shuffle-never
    contract bucketing exists for)."""
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = get_queries()["q60_bucketed_colocated_join"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "SortMergeJoin" in plan
    joins = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange hashpartitioning" not in joins


def test_q80_window_decorrelation_no_self_join(spark):
    """q80's correlated-avg decorrelation is a WINDOW over the
    brand-filtered fact, not an aggregate-plus-self-join: the plan must
    contain a Window node, no SortMergeJoin, and exactly one lineitem
    scan (the join form scanned it twice)."""
    from ecmm428_pycart_spark.benchmarks.registry import get_queries
    df = get_queries()["q80_small_qty_revenue"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("lineitem.parquet") == 1, plan
    assert df.count() == 1


def test_expensive_decode_udfs_not_duplicated_by_generate_inference(spark):
    """m19/m21 explode the array a pure-but-expensive Arrow UDF returns;
    InferFiltersFromGenerate synthesizes a size()>0 filter that Catalyst
    would push below the spread Exchange and so evaluate the whole
    synth+decode chain TWICE (one copy single-task — guide §4.4). The
    decode UDFs are marked asNondeterministic() to pin a single
    evaluation; the aggregated (bench-style count) plan must reference
    each exactly once."""
    for name, udf in (("m19_mjpeg_avi_frames", "avi_frame_stats"),
                      ("m21_mel_energies", "wav_mel_energies"),
                      ("d62_cdc_chunks", "_cdc_cut_positions")):
        df = get_queries()[name](spark, SF).groupBy().count()
        m = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
            .fromString("formatted")
        plan = df._jdf.queryExecution().explainString(m)
        assert plan.count(udf) == 1, f"{name}: {udf} evaluated twice\n{plan}"
