"""Sketch + in-engine-ML operator tests (round 5): count-min mergeability
and one-sided error, KMV estimate sanity, NB classifier beats the majority
baseline, kNN vote agrees with its own top-k. Oracle parity for all five
registry queries is covered by tests/test_oracle_parity.py via the registry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_dts_connector_spark.operators import ml as ML
from flink_dts_connector_spark.operators import sketch as SK
from flink_dts_connector_spark.operators.text import tokens
from flink_dts_connector_spark.session import load_table


def _items(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(tokens("text")).alias("w"))
    )


def test_cms_estimate_never_underestimates(spark, sf_dir):
    items = _items(spark, sf_dir)
    sketch = SK.cms_build(items, "w")
    exact = items.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
    est = SK.cms_estimate(sketch, exact, "w")
    bad = (
        exact.join(est, "w")
        .where(F.col("cms_estimate") < F.col("exact_n"))
        .count()
    )
    assert bad == 0, "count-min is one-sided: estimate >= exact, always"


def test_cms_per_source_merge_equals_global(spark, sf_dir):
    """Linearity: building per-source sketches and merging them cell-wise
    is EXACTLY the global sketch — the property that makes per-shard /
    per-day sketch rollups valid at scale."""
    items = _items(spark, sf_dir)
    global_sketch = {(r["j"], r["b"]): r["c"] for r in SK.cms_build(items, "w").collect()}
    sources = [r["source"] for r in items.select("source").distinct().collect()]
    shards = [
        SK.cms_build(items.where(F.col("source") == s), "w") for s in sources
    ]
    merged = {(r["j"], r["b"]): r["c"] for r in SK.cms_merge(*shards).collect()}
    assert merged == global_sketch


def test_kmv_exact_for_small_groups_and_bounded_for_large(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sk = SK.kmv_sketch(ev, key_col="user_id", group_col="event_type", k=64)
    est = {r["g"]: r["distinct_est"] for r in SK.kmv_distinct_estimate(sk, k=64).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        if n < 64:
            assert est[g] == n, f"small group {g} must be exact"
        else:
            # KMV std error ~ 1/sqrt(k-1) ~ 12.7%; deterministic data, so a
            # generous 3-sigma band can't flake
            assert abs(est[g] - n) <= max(8, int(0.40 * n)), (g, est[g], n)


def test_kmv_jaccard_identical_groups_is_one(spark, sf_dir):
    """A group unioned with itself must estimate J = 1 exactly."""
    ev = load_table(spark, sf_dir, "events")
    doubled = ev.withColumn("event_type", F.lit("x")).unionByName(
        ev.withColumn("event_type", F.lit("y"))
    )
    sk = SK.kmv_sketch(doubled, key_col="user_id", group_col="event_type", k=64)
    rows = SK.kmv_jaccard_pairs(sk, k=64).collect()
    assert len(rows) == 1
    assert rows[0]["jaccard_est"] == 1.0
    assert rows[0]["n_common"] == rows[0]["k_used"]


def test_nb_beats_majority_baseline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    conf = ML.nb_confusion(docs).collect()
    n_total = sum(r["n_docs"] for r in conf)
    n_correct = sum(r["n_docs"] for r in conf if r["actual"] == r["predicted"])
    majority = (
        docs.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    )
    assert n_total == docs.count(), "every document classified exactly once"
    assert n_correct / n_total > majority / n_total, (
        f"NB resubstitution accuracy {n_correct}/{n_total} must beat the "
        f"majority-class baseline {majority}/{n_total}"
    )


def test_knn_confusion_covers_all_probes(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    conf = ML.knn_label_confusion(emb, k=5, probe_mod=20).collect()
    n_probes = emb.where(F.col("vec_id") % 20 == 0).count()
    assert sum(r["n_vecs"] for r in conf) == n_probes
    # labels in the synthetic fixture correlate with embedding clusters, so
    # 5-NN should agree with the actual label more often than 1/|labels|
    n_correct = sum(
        r["n_vecs"] for r in conf if r["actual_label"] == r["predicted_label"]
    )
    n_labels = emb.select("label").distinct().count()
    assert n_correct / n_probes > 1.0 / n_labels


def test_range_boundaries_equi_depth(spark, sf_dir):
    """Planner contract: boundaries nondecreasing; each split's realized
    rank (keys at/below its boundary bucket) overshoots the target by at
    most one bucket's mass (the histogram resolution bound)."""
    from flink_dts_connector_spark.operators.skew import range_boundaries

    orders = load_table(spark, sf_dir, "orders")
    key = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    rows = sorted(
        range_boundaries(orders, key, n_splits=8, n_buckets=1024).collect(),
        key=lambda r: r["split_id"],
    )
    assert [r["split_id"] for r in rows] == list(range(1, 8))
    bounds = [r["boundary_key"] for r in rows]
    assert bounds == sorted(bounds)
    n = orders.count()
    keys = [r[0] for r in orders.select(key.alias("k")).collect()]
    # max single-bucket mass bounds the overshoot
    mn, mx = min(keys), max(keys)
    from collections import Counter

    R = mx - mn + 1
    buckets = Counter((v - mn) * 1024 // R for v in keys)
    max_bucket = max(buckets.values())
    cum, cums = 0, {}
    for b in sorted(buckets):
        cum += buckets[b]
        cums[b] = cum
    for r in rows:
        target = r["split_id"] * n // 8
        assert r["target_count"] == target
        # contract: boundary bucket = first histogram bucket whose cumulative
        # count reaches the target; boundary_key is that bucket's upper edge
        bb = min(b for b in cums if cums[b] >= target)
        assert r["cum_count"] == cums[bb]
        assert r["boundary_key"] == mn + (bb + 1) * R // 1024
        assert 0 <= r["cum_count"] - target <= max_bucket


def test_stream_cms_overestimates_only(spark, sf_dir):
    from flink_dts_connector_spark.plans.registry import get_query

    rows = get_query("stream_count_min_convergence").fn(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["overestimate"] >= 0 for r in rows)
    assert all(r["cms_estimate"] >= r["exact_n"] for r in rows)


def test_bpe_merges_match_reference_python_bpe(spark, sf_dir):
    """Pin the declarative BPE trainer to a from-scratch Python BPE
    (frequency-weighted pair counting over word types, greedy left-to-right
    merge, (support DESC, pair ASC) tie-break)."""
    import collections
    import re

    from flink_dts_connector_spark.operators.ml import bpe_train_merges

    docs = load_table(spark, sf_dir, "documents")
    got = [
        (r["rank"], r["left_sym"], r["right_sym"], r["merged"], r["support"])
        for r in sorted(bpe_train_merges(docs, n_merges=6).collect())
    ]

    toks = [
        w
        for (txt,) in docs.select("text").collect()
        for w in txt.strip().split()
        if re.fullmatch("[a-z]+", w)
    ]
    freq = collections.Counter(toks)
    words = {w: list(w) for w in freq}
    want = []
    for r in range(6):
        pc: collections.Counter = collections.Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freq[w]
        (a, b), sup = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((r + 1, a, b, a + b, sup))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    assert got == want


def test_waterfill_spends_budget_within_rounding(spark, sf_dir):
    """Waterfill contract: saturated iff quota == available; total spend
    within (n_unsaturated - 1) sub-token units of the budget; every
    unsaturated source sits exactly at the waterline."""
    from flink_dts_connector_spark.operators.curation import waterfill_quotas
    from flink_dts_connector_spark.operators.text import token_count

    d = load_table(spark, sf_dir, "documents").select(
        "source", token_count("text").alias("n_tokens")
    )
    rows = waterfill_quotas(d, budget_pct=40).collect()
    total = d.agg(F.sum("n_tokens")).collect()[0][0]
    budget = total * 40 // 100
    spent = sum(r["quota"] for r in rows)
    unsat = [r for r in rows if not r["saturated"]]
    assert all((r["quota"] == r["available"]) == r["saturated"] for r in rows)
    assert spent <= budget
    assert budget - spent < max(len(unsat), 1)
    levels = {r["quota"] for r in unsat}
    assert len(levels) <= 1, f"unsaturated sources must share one waterline: {levels}"
    if unsat:
        level = levels.pop()
        assert all(r["available"] >= level for r in unsat)


def test_phash_locality_and_exact_dup(spark, sf_dir):
    """Stripe-phash contract: an exact copy pairs at hamming 0; a single
    odd-delta character edit flips EXACTLY the one stripe it lands in
    (hamming 1) — the locality property an avalanche digest cannot give."""
    from flink_dts_connector_spark.operators.multimodal import phash_neardup_pairs

    base = "the quick brown fox jumps over the lazy dog " * 4  # 180 chars
    edited = "thf" + base[3:]  # 'e'->'f': +1 byte delta, odd
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, edited)], "doc_id long, text string"
    )
    pairs = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in phash_neardup_pairs(df, max_distance=6).collect()
    }
    assert pairs[(1, 2)] == 0, "exact copy must collide at hamming 0"
    assert pairs[(1, 3)] == 1, f"one odd edit must flip exactly one stripe: {pairs}"
    assert pairs[(2, 3)] == 1
