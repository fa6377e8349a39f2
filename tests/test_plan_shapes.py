"""Physical-plan regression guards: the scale posture (broadcast dims, one
fact shuffle, pushed filters) must not silently regress as queries evolve.
Checked at sf0.1 statistics so broadcast decisions are realistic."""

from __future__ import annotations

import re

import pytest

from flink_dts_connector_spark.plans.registry import all_queries

SF_DIR = "/root/testdata/sf0.1"


def _plan(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF_DIR)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.mark.parametrize(
    "name",
    ["q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items",
     "q7_volume_between_nations", "q14_promo_revenue_pct"],
)
def test_dim_joins_broadcast_no_smj(spark, name):
    plan = _plan(spark, name)
    assert "SortMergeJoin" not in plan, f"{name} regressed to sort-merge join"
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize(
    "name, pushed_fragment",
    [
        ("q1_pricing_summary", "LessThanOrEqual(l_shipdate"),
        ("q6_forecast_revenue", "GreaterThanOrEqual(l_shipdate"),
        ("q10_returned_items", "EqualTo(l_returnflag,R)"),
    ],
)
def test_filters_reach_parquet_scan(spark, name, pushed_fragment):
    plan = _plan(spark, name)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert pushed_fragment in pushed, f"{name}: filter not pushed — {pushed[:200]}"


def test_scan_prunes_columns(spark):
    """q6 projects 4 lineitem columns — the scan must not read all 11."""
    plan = _plan(spark, "q6_forecast_revenue")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:500]
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert set(cols) == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}, cols


def test_single_agg_exchange_q1(spark):
    """q1 is scan → partial agg → ONE shuffle → final agg (AQE reads add a
    node but no extra shuffles)."""
    plan = _plan(spark, "q1_pricing_summary")
    n_exchange = len(re.findall(r"\bExchange\b", plan.split("== Physical Plan ==")[-1]))
    assert n_exchange <= 2, f"q1 has {n_exchange} exchanges"
    assert "HashAggregate" in plan


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing contract (SCALING.md): two tables bucketed on the join key
    sort-merge-join with NO Exchange on either side — the co-located join
    shape repeated MERGE/upsert cycles rely on at 100 TB."""
    from flink_dts_connector_spark.session import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
            "b_orders"
        )
        li.selectExpr("l_orderkey", "l_quantity").write.bucketBy(8, "l_orderkey").sortBy(
            "l_orderkey"
        ).mode("overwrite").saveAsTable("b_lineitem")

        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            spark.table("b_orders").o_orderkey == spark.table("b_lineitem").l_orderkey,
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:600]}"
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_curation_plan_shapes(spark):
    """Scale guards for the curation ops: sampling is a narrow filter (zero
    exchanges); cap and pack each shuffle exactly once (their window's
    partition key)."""
    # count node-detail headers: each node appears once as "(k) Exchange"
    n_ex = lambda p: len(re.findall(r"\(\d+\) Exchange", p))
    sample = _plan(spark, "curate_deterministic_sample")
    assert n_ex(sample) == 0 and "Scan parquet" in sample
    cap = _plan(spark, "curate_cap_per_source")
    assert n_ex(cap) == 1
    # rank pushdown: Spark pre-filters each partition to its local top-N
    # before the shuffle (WindowGroupLimit Partial) — the map-side combine
    # of ranking windows; without it the full table crosses the wire
    assert "WindowGroupLimit" in cap
    pack = _plan(spark, "curate_pack_sequences")
    assert n_ex(pack) == 1  # one shuffle serves both the window and the rollup
    assert "HashAggregate" in pack


def test_token_budget_no_global_sort(spark):
    """The token-budget cut must NOT globally sort the corpus: the naive
    formulation is one window over ORDER BY score (an Exchange
    SinglePartition carrying every doc). The two-phase plan's only
    single-partition exchanges carry the per-score AGGREGATE frame
    (|distinct scores| rows); the docs themselves move at most through a
    hashpartitioning exchange (the boundary-bucket window)."""
    plan = _plan(spark, "curate_token_budget")
    single = re.findall(r"Arguments: SinglePartition", plan)
    # one per union branch, both above a HashAggregate of the score frame
    assert len(single) == 2, f"expected 2 tiny-frame exchanges, got {len(single)}"
    assert "rangepartitioning" not in plan
    # the bucket frames are aggregates: a HashAggregate must appear before
    # each single-partition exchange in plan order
    assert plan.count("HashAggregate") >= 4
    # boundary docs shuffle by score only
    assert re.search(r"Arguments: hashpartitioning\(score", plan)


def test_ivf_probe_plan_shape(spark):
    """IVF ANN probe-path guard (r3 bench adjudication): the item side must
    never sort-merge or shuffle beyond (a) the one cell-assign aggregate
    exchange on the item id and (b) the per-query rerank windows; probes and
    centroids ride BroadcastExchange onto the items. A regression to a
    shuffled probe join or a single-partition sort would be a scale killer
    at 100 TB (items = the corpus)."""
    plan = _plan(spark, "ann_topk_ivf")
    assert "SortMergeJoin" not in plan, "IVF probe regressed to sort-merge join"
    # probes joined to item cells via broadcast hash join
    assert "BroadcastHashJoin" in plan
    # exchanges: cell-assign agg (vec_id) + probe window + rerank window
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3, plan[:400]
    assert "Arguments: SinglePartition" not in plan, "IVF plan funnels through one partition"


def test_pq_plan_codebooks_and_luts_broadcast(spark):
    """PQ ANN plan guard: codebooks and per-query LUTs must ride
    BroadcastExchange onto the streaming corpus side (the ADC scan is one
    pass over the codes), with no sort-merge join anywhere and no
    single-partition funnel — at 100 TB the codes table is the only big
    frame and it shuffles only for the (query, item) partial-sum aggregate
    and the per-query shortlist window."""
    plan = _plan(spark, "ann_topk_pq")
    assert "SortMergeJoin" not in plan, "PQ cascade regressed to sort-merge join"
    assert "BroadcastHashJoin" in plan
    # the one tolerated SinglePartition exchange is the 16-row codebook
    # seed limit (orderBy vec_id LIMIT 16); the corpus never funnels
    assert len(re.findall(r"Arguments: SinglePartition", plan)) <= 2, plan[:400]


def test_shard_manifest_single_agg_shuffle(spark):
    """Shard manifest: narrow hash projection + one partial/final agg pair
    — exactly one exchange, no window, no join."""
    plan = _plan(spark, "curate_shard_manifest")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Window" not in plan and "Join" not in plan


def test_pipeline_manifest_pruned_and_bounded(spark):
    """End-to-end pipeline plan guards: every documents scan is
    column-pruned (never reads the full row: lang/source stay unread), the
    probe/keep sides broadcast rather than shuffling the corpus, and the
    whole four-stage dataflow stays within a bounded exchange budget."""
    plan = _plan(spark, "curate_pipeline_manifest")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan[:400]
    for s in schemas:
        cols = {c.split(":")[0] for c in s.split(",")}
        assert cols <= {"doc_id", "text", "n_chars"}, cols
    assert "BroadcastExchange" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 5


def test_chunk_windows_no_exchange(spark):
    """Chunking must stay a narrow per-row pipeline: sequence → posexplode
    → slice inside the scan stage. ANY exchange here would mean the
    context-window shaping step shuffles the corpus at 100 TB."""
    plan = _plan(spark, "curate_chunk_windows")
    assert "Exchange" not in plan, "chunking acquired a shuffle"
    assert "SortMergeJoin" not in plan


def test_bm25_plan_broadcast_postings_probe(spark):
    """BM25 retrieval guard: the postings (corpus) side must never
    sort-merge join or cartesian-join; query terms and corpus stats ride
    BroadcastExchange onto it. The only single-partition exchange allowed
    is the n_terms-row query-term ranking window — a corpus-sized
    single-partition funnel would be the classic top-k scale killer."""
    plan = _plan(spark, "search_bm25_topk")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 3
    single = re.findall(r"Arguments: SinglePartition", plan)
    assert len(single) <= 1, f"extra single-partition exchanges: {len(single)}"


def test_phrase_search_no_global_sort(spark):
    """Top-phrase selection is max-count + min-phrase aggregates and a
    broadcast back onto the postings — no rangepartitioning exchange (a
    global sort) anywhere in the plan."""
    plan = _plan(spark, "search_phrase_positions")
    assert "rangepartitioning" not in plan.lower(), plan[:800]
    assert "BroadcastHashJoin" in plan


def test_key_skew_profile_scans_one_column_each(spark):
    """Each per-key pass must read ONLY its key column (pruned scan), and
    the report stays JVM-side."""
    plan = _plan(spark, "profile_key_skew")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan[:500]
    for s in schemas:
        cols = [c.split(":")[0] for c in s.split(",") if c]
        assert len(cols) == 1, f"skew profile scan reads {cols}"
    assert "PythonEval" not in plan


def test_quality_rules_single_agg_no_python(spark):
    """The rule census is one map-side-combined agg keyed by rule: exactly
    one hash-exchange lineage, verdicts inside codegen, no Python."""
    plan = _plan(spark, "text_quality_rules")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan[:800]
    assert "PythonEval" not in plan


def test_bloom_prefilter_no_smj_no_python(spark):
    """The bloom probe path is broadcast word-lookups only; the final exact
    join broadcasts the dim subset — no sort-merge join, no Python."""
    plan = _plan(spark, "join_bloom_prefilter")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4  # 3 seeds + exact join
    assert "PythonEval" not in plan


def test_cms_build_single_exchange_no_python(spark):
    """The count-min build is scan → explode → partial agg → ONE shuffle →
    final agg: sketch cells combine map-side, and the md5 bucketing stays
    JVM-side (no Python eval in the plan)."""
    from pyspark.sql import functions as F

    from flink_dts_connector_spark.operators.sketch import cms_build
    from flink_dts_connector_spark.operators.text import tokens
    from flink_dts_connector_spark.session import load_table

    items = load_table(spark, SF_DIR, "documents").select(
        F.explode(tokens("text")).alias("w")
    )
    df = cms_build(items, "w")
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchange == 1, plan[:800]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_range_boundaries_no_data_sort(spark):
    """The planner's contract is NO global sort of the data: the only
    ordering work happens on the ≤1024-row histogram frame (window), so
    the plan must not contain a rangepartitioning exchange."""
    from pyspark.sql import functions as F

    from flink_dts_connector_spark.operators.skew import range_boundaries
    from flink_dts_connector_spark.session import load_table

    df = range_boundaries(
        load_table(spark, SF_DIR, "orders"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"),
    )
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange rangepartitioning" not in plan, plan[:800]
    assert "CartesianProduct" not in plan


def test_nb_class_frame_broadcast_model_join_on_token(spark):
    """NB inference: the per-class frame broadcasts; the model join keys on
    the token (shuffle equi-join — web vocab never broadcasts by design);
    nothing falls back to cartesian or Python."""
    from flink_dts_connector_spark.operators.ml import nb_confusion
    from flink_dts_connector_spark.session import load_table

    df = nb_confusion(load_table(spark, SF_DIR, "documents"))
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fixed_wire_plan_jvm_only(spark):
    """The fixed-layout codec's whole round trip (encode → header filter →
    decode → signed agg) must stay inside whole-stage codegen: no Python
    eval anywhere, and the scan side prunes to the columns the encoder
    needs."""
    plan = _plan(spark, "cdc_fixed_wire_roundtrip")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # node whitelist: every operator is a codegen-able relational node —
    # scan/project/filter/union/one agg exchange; nothing else
    nodes = set(re.findall(r"\(\d+\) ([A-Za-z]+)", plan))
    allowed = {
        "Scan", "Project", "Filter", "Union", "Exchange", "HashAggregate",
        "AdaptiveSparkPlan", "AQEShuffleRead", "ShuffleQueryStage", "ColumnarToRow",
    }
    assert nodes <= allowed, f"unexpected nodes: {nodes - allowed}"


def test_fixed_wire_zoo_plan_jvm_only(spark):
    """The fixed-slot value-zoo codec (encode → slot jump table → render →
    agg) must also stay JVM-only: the kind-char when-chain is codegen'd
    like the rest — zero Python eval, range source + project/explode +
    one agg exchange."""
    plan = _plan(spark, "cdc_fixed_wire_zoo")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    nodes = set(re.findall(r"\(\d+\) ([A-Za-z]+)", plan))
    allowed = {
        "Range", "Project", "Filter", "Generate", "Union", "Exchange",
        "HashAggregate", "AdaptiveSparkPlan", "AQEShuffleRead",
        "ShuffleQueryStage", "ColumnarToRow", "Scan",
    }
    assert nodes <= allowed, f"unexpected nodes: {nodes - allowed}"


def test_prefix_filter_plan_no_cartesian_no_python(spark):
    """Prefix-filter join: candidates come from hash equi-joins on the
    shingle/prefix keys — never a cartesian/BNLJ of the corpus — and the
    whole pipeline stays JVM-side."""
    plan = _plan(spark, "neardup_prefix_filter_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not re.search(r"ArrowEvalPython|BatchEvalPython|MapInPandas", plan)


def test_fuzzy_terms_query_side_broadcasts(spark):
    """SymSpell join: the query-side deletion neighborhood is the tiny
    side and must broadcast — the vocab side is never collected or
    nested-looped."""
    plan = _plan(spark, "search_fuzzy_terms")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rag_hydration_candidates_broadcast(spark):
    """RAG composition: the queries x k candidate frame broadcasts into
    the documents join (hydration probes the corpus, never shuffles it)."""
    plan = _plan(spark, "search_rag_hydrated_topk")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_seasonal_decompose_windows_on_day_grain(spark):
    """Decomposition plan: no Python nodes, and the dow-index join is a
    broadcast (7-row side)."""
    plan = _plan(spark, "events_seasonal_decompose")
    assert not re.search(r"ArrowEvalPython|BatchEvalPython|MapInPandas", plan)
    assert "BroadcastHashJoin" in plan


def test_wscg_counter_sees_codegen_spans(spark):
    """Guard for tools/plan_audit.py's wscg counter (dead in r8): with AQE
    off (the audit session's config), formatted explain renders
    "[codegen id : N]" per node, and the audit's distinct-id count must see
    >= 2 spans on the canonical agg query (partial + final HashAggregate
    pipelines). With AQE on (the default test session), the static plan is
    wrapped in AdaptiveSparkPlan and carries NO codegen markers — which is
    exactly why the audit disables AQE; pin both halves."""
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = _plan(spark, "q1_pricing_summary")
        spans = set(re.findall(r"\[codegen id : (\d+)\]", plan))
        assert len(spans) >= 2, plan[:500]
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        plan_aqe = _plan(spark, "q1_pricing_summary")
        assert "AdaptiveSparkPlan" in plan_aqe
        assert not re.search(r"\[codegen id : \d+\]", plan_aqe)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)


def test_spatial_blocked_join_no_cartesian(spark):
    """The grid-cell spatial self-join (r9) is an equi-join on the cell id
    — no CartesianProduct, no broadcast nested loop; the distance verify
    is a post-join filter."""
    plan = _plan(spark, "events_spatial_neighbor_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not __import__("re").search(r"ArrowEvalPython|BatchEvalPython|MapInPandas", plan)


def test_spatial_salted_join_no_cartesian_and_broadcast_hot_list(spark):
    """The salted variant (r10) keeps the equi-join shape — the only new
    plan features are a BroadcastHashJoin for the tiny hot-cell list (it
    must be broadcast, never shuffled) and the salt column in the join key;
    still zero Cartesian/nested-loop/Python."""
    plan = _plan(spark, "events_spatial_neighbor_pairs_salted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the hot-cell list
    assert "_salt" in plan  # salt participates in the join key
    assert not __import__("re").search(r"ArrowEvalPython|BatchEvalPython|MapInPandas", plan)


def test_rrf_fusion_plan_is_postings_bounded(spark):
    """r10 RRF: both retrievers join broadcast query terms onto postings —
    no CartesianProduct, no Python eval; the only nested-loop joins are
    broadcast scalar frames (corpus stats)."""
    plan = _plan(spark, "search_rrf_fusion")
    assert "CartesianProduct" not in plan
    assert not __import__("re").search(r"ArrowEvalPython|BatchEvalPython|MapInPandas", plan)


def test_sq8_plan_broadcasts_trained_dims(spark):
    """r10 SQ8: the trained (mn, mx) row and the query set broadcast; the
    scored pass is one scan of the encoded items — zero Python, no
    CartesianProduct (the broadcast-nested-loop of the 1-row dims frame is
    the sanctioned scalar-broadcast form)."""
    plan = _plan(spark, "ann_topk_sq8")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert not __import__("re").search(r"ArrowEvalPython|BatchEvalPython|MapInPandas", plan)
