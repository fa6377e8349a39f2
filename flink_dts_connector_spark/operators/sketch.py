"""Mergeable sketch operators: count-min (heavy hitters) and KMV
(distinct / set-overlap estimation) — the streaming-summary layer of a
large-scale pipeline (SURVEY.md §2.7 EXT surface; the reference connector
has no analytics operators, these extend the engine the way
`agg_mergeable_histograms` does).

Both sketches are *engine-mirrorable by construction*: every hash routes
through `md5_number_lower_mod` (DuckDB: ``md5_number_lower(s) % m``) and
every estimate is integer arithmetic plus at most one final double
division, so the DuckDB oracle hash-matches bit-for-bit.

Scale design (the whole point of a sketch):
- A count-min sketch is ``depth x width`` BIGINT cells. Building it is one
  hash aggregation with map-side combine — each executor reduces its
  partitions to <= depth*width cells before the shuffle, so the shuffle
  volume is O(depth*width * n_partitions) regardless of input mass.
  Per-shard sketches MERGE by cell-wise addition (linear sketch), which is
  what makes it usable as a per-day / per-shard profile at 100 TB.
- A KMV sketch is the k smallest distinct hash values per group: <= k rows
  per group, mergeable by "union then re-take k smallest". All pairwise
  set operations (distinct-union / Jaccard) then run on sketch rows, never
  on raw data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_dts_connector_spark.operators.dedup import md5_number_lower_mod

#: KMV hash domain: the MinHash prime 2^31 - 1 (matches `md5_hash_mod_p`).
KMV_P = (1 << 31) - 1


def cms_hash(item: Column, row: int | Column, width: int) -> Column:
    """Row-``row``'s bucket for ``item``: md5('cms{row}:' || item) mod width.
    Salting the digest input (not the output) gives ``depth`` independent
    hash functions from one primitive, identically in both engines. ``row``
    may be a literal int or the exploded row-index column — this is the ONE
    definition of the bucketing; `cms_build`/`cms_estimate` route through it
    so sketch and probe can never disagree."""
    r = F.lit(str(row)) if isinstance(row, int) else row.cast("string")
    return md5_number_lower_mod(
        F.concat(F.lit("cms"), r, F.lit(":"), item.cast("string")), width
    )


def cms_build(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over one row per item OCCURRENCE (pre-weighted
    input: pass an exploded token frame, not distinct tokens).

    ``weight_col`` (BIGINT, may be negative) turns this into the turnstile
    variant: a CDC changelog with +1 (I/UA) / −1 (UB/D) signs maintains the
    sketch under retractions — linearity means the maintained cells equal a
    fresh build over the CURRENT state (`cdc_signed_count_sketch` pins this).

    Returns the sketch as a DataFrame ``(j, b, c)`` — row, bucket, count —
    with <= depth*width rows. One hash aggregation: the explode-by-depth
    happens map-side and combines to sketch cells before the shuffle."""
    rows = F.array(*[F.lit(j) for j in range(depth)])
    w = F.lit(1).cast("bigint") if weight_col is None else F.col(weight_col).cast("bigint")
    cells = items.select(
        F.explode(rows).alias("j"),
        F.col(item_col).cast("string").alias("_it"),
        w.alias("_w"),
    )
    # bucket = md5('cms' || j || ':' || item) % width — the row index salts
    # the digest INPUT, so one md5 primitive yields `depth` independent rows
    b = cms_hash(F.col("_it"), F.col("j"), width)
    return (
        cells.select("j", b.alias("b"), "_w")
        .groupBy("j", "b")
        .agg(F.sum("_w").cast("bigint").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each candidate's count: min over rows j of
    sketch[j, hash_j(item)]. The candidate frame is small (heavy-hitter
    probes); the sketch is <= depth*width rows — both sides broadcastable,
    no large shuffle anywhere."""
    rows = F.array(*[F.lit(j) for j in range(depth)])
    probes = candidates.select(
        F.col(item_col), F.explode(rows).alias("j")
    ).withColumn("b", cms_hash(F.col(item_col), F.col("j"), width))
    joined = probes.join(F.broadcast(sketch), ["j", "b"], "left").withColumn(
        "c", F.coalesce(F.col("c"), F.lit(0)).cast("bigint")
    )
    return joined.groupBy(item_col).agg(F.min("c").cast("bigint").alias("cms_estimate"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge per-shard sketches: cell-wise sum (count-min is linear)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("j", "b").agg(F.sum("c").cast("bigint").alias("c"))


def kmv_sketch(
    df: DataFrame, key_col: str, group_col: str, k: int = 64
) -> DataFrame:
    """K-minimum-values sketch per group: the ``k`` smallest DISTINCT
    md5-mod-p hashes of ``key_col``. Returns ``(group, h, r)`` with
    r = 1..k rank. Plan: distinct (group, h) hash-agg (map-side combine
    collapses repeat keys before the shuffle), then a bounded per-group
    window — the window frame is the group's distinct-hash set, and only
    k rows survive."""
    from flink_dts_connector_spark.operators.dedup import md5_hash_mod_p

    h = md5_hash_mod_p(F.col(key_col).cast("string"))
    dist = df.select(F.col(group_col).alias("g"), h.alias("h")).distinct()
    w = Window.partitionBy("g").orderBy("h")
    return (
        dist.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
        .select("g", "h", F.col("r").cast("bigint").alias("r"))
    )


def kmv_distinct_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate per group: if the sketch holds fewer than k
    hashes the group is small and the count is EXACT (= sketch size);
    otherwise the classic KMV estimator (k-1) * p / h_k, floored to BIGINT
    (integer div — engine-mirrorable, no float path)."""
    agg = sketch.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.max(F.when(F.col("r") == k, F.col("h"))).alias("hk"),
    )
    est = F.when(
        F.col("n_h") < k, F.col("n_h")
    ).otherwise(F.expr(f"({k} - 1) * CAST({KMV_P} AS BIGINT) div hk"))
    return agg.select("g", est.cast("bigint").alias("distinct_est"))


def kmv_jaccard_pairs(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Jaccard estimate for every unordered group pair from their KMV
    sketches alone: J ~= |K(A u B) n A n B| / k', where K(A u B) is the k
    smallest hashes of the sketch union and k' = min(k, |union sketch|).
    Everything below runs on sketch rows (<= k per group): the raw corpus
    is never touched again — the 100 TB set-overlap matrix costs
    O(groups^2 * k), not a corpus self-join."""
    # Cross the (small) group list, union both sides' sketch rows per pair,
    # dedup hashes, rank, count two-sided membership. The group list is tiny
    # by contract (pairwise output is O(groups²·k) rows) — broadcast it so
    # the pair frame never shuffles. Past ~10³ groups the matrix itself is
    # the blow-up: block the pairs (band groups into √G buckets and emit
    # bucket-pairs) before calling this, rather than crossing all of them.
    groups = sketch.select("g").distinct()
    gp = (
        groups.alias("x")
        .crossJoin(F.broadcast(groups.alias("y")))
        .where(F.col("x.g") < F.col("y.g"))
        .select(F.col("x.g").alias("ga"), F.col("y.g").alias("gb"))
    )
    side_a = gp.join(sketch.withColumnRenamed("g", "ga"), "ga").select(
        "ga", "gb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    side_b = gp.join(sketch.withColumnRenamed("g", "gb"), "gb").select(
        "ga", "gb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    hashes = (
        side_a.unionByName(side_b)
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    ranked = hashes.withColumn("r", F.row_number().over(w)).where(F.col("r") <= k)
    return ranked.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("bigint")).alias("n_common"),
        (
            F.sum((F.col("in_a") * F.col("in_b")).cast("bigint")).cast("double")
            / F.count(F.lit(1))
        ).alias("jaccard_est"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog registers (round 6) — the third mergeable sketch family next
# to count-min and KMV. Engine-mirrorable variant: md5-derived bucket +
# 31-bit rank source, and the RAW HLL estimator with a fixed rational
# alpha (7183/10000 ~ alpha_256), so every step is integer arithmetic and
# the DuckDB oracle matches bit-for-bit. Small-range (linear-counting)
# correction is deliberately out of contract — it needs ln(), whose last
# ulp is libm-dependent across engines; zero-register counts are reported
# so a consumer can apply any correction downstream. Spark's own
# approx_count_distinct covers the production estimator; THIS is the
# transparent, mergeable, oracle-checkable register layer (merge = max
# per register — the sketch a 100 TB pipeline stores per shard/day).
# ---------------------------------------------------------------------------

HLL_M = 256  # 2^8 registers per group
HLL_W = 31  # rank-source bits (md5_number_lower_mod caps at 2^31)
#: fixed rational alpha ~ alpha_256 = 0.7213/(1 + 1.079/256); exact-integer
#: numerator for est = alpha * m^2 * 2^(W+2) / S with S scaled by 2^(W+2)
_HLL_NUM = 7183 * HLL_M * HLL_M * (1 << (HLL_W + 2))
_HLL_DEN = 10000


def hll_registers(df: DataFrame, key_col: str, group_col: str, m: int = HLL_M) -> DataFrame:
    """Per-group HLL registers ``(g, j, r)``: bucket j = md5(key·':hllb')
    mod m, rank r = leading-zero count of the independent 31-bit hash
    md5(key·':hllr') + 1 (zero hash → W+1). One hash aggregation — the max
    per register combines map-side, so shuffle volume is <= m rows per
    group per partition regardless of input mass. Registers MERGE by
    per-cell max (idempotent, commutative — order/batching can't change
    the converged sketch)."""
    key = F.col(key_col).cast("string")
    bucket = md5_number_lower_mod(F.concat(key, F.lit(":hllb")), m)
    v = md5_number_lower_mod(F.concat(key, F.lit(":hllr")), 1 << HLL_W)
    bitlen = F.length(F.conv(v.cast("string"), 10, 2))
    rank = F.when(v == 0, F.lit(HLL_W + 1)).otherwise(F.lit(HLL_W + 1) - bitlen)
    return (
        df.select(F.col(group_col).alias("g"), bucket.alias("j"), rank.alias("rk"))
        .groupBy("g", "j")
        .agg(F.max("rk").cast("bigint").alias("r"))
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge register tables: per-cell max (HLL's union operator)."""
    if not register_frames:
        raise ValueError("need at least one register frame")
    u = register_frames[0]
    for s in register_frames[1:]:
        u = u.unionByName(s)
    return u.groupBy("g", "j").agg(F.max("r").cast("bigint").alias("r"))


def hll_estimate(registers: DataFrame, m: int = HLL_M) -> DataFrame:
    """Raw HLL estimate per group from the register table: est =
    alpha·m²/Σ 2^(−Mj), computed entirely in BIGINT by scaling the
    harmonic sum with 2^(W+2) (absent registers contribute Mj = 0).
    Returns ``(g, hll_est, n_zero_registers)``."""
    num = 7183 * m * m * (1 << (HLL_W + 2))  # fits int64 for m = 256
    if num > (1 << 63) - 1:
        raise ValueError(
            f"hll_estimate: m={m} overflows the int64 numerator "
            f"(7183*m*m*2^{HLL_W + 2} = {num}); max supported m is "
            f"{int((((1 << 63) - 1) / (7183 * (1 << (HLL_W + 2)))) ** 0.5)}"
        )
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_W + 2} - r AS INT))")
    agg = registers.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
        F.sum(term).cast("bigint").alias("s_present"),
    )
    s = (
        F.col("s_present")
        + (F.lit(m) - F.col("n_present")) * F.lit(1 << (HLL_W + 2)).cast("bigint")
    ).alias("_s")
    return agg.select("g", s, (F.lit(m) - F.col("n_present")).cast("bigint").alias(
        "n_zero_registers"
    )).select(
        "g",
        F.expr(f"CAST({num} AS BIGINT) div ({_HLL_DEN} * _s)").alias("hll_est"),
        "n_zero_registers",
    )


# ---------------------------------------------------------------------------
# Dyadic histogram quantile sketch (round 7) — the quantile member of the
# mergeable-sketch family (CMS = frequency, KMV/HLL = distinct, AMS = F2,
# this = rank/quantile). Deterministic, integer-exact, and oracle-able:
# values bucket at a fixed power-of-two width, per-group cell counts merge
# by addition (shards, days, partitions), and any rank query answers from
# the cumulative cell walk with error bounded by ONE bucket width. The
# shuffle is O(cells) regardless of input mass — same scaling law the CMS
# family proves — and a per-period cube answers arbitrary ranges by cell
# addition without rescanning rows (the quantile twin of hll time-cube).
# ---------------------------------------------------------------------------


def value_histogram(
    df: DataFrame, group_col: str, value_col: str, shift: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Bucket counts per group: bucket = value >> shift (bucket width
    2^shift). One map-side-combined hash agg; returns (g, bucket, c).
    Values must be non-negative integers (cast upstream).

    ``weight_col`` (BIGINT, may be negative) is the turnstile variant: a
    CDC changelog with +1 (I/UA) / −1 (UB/D) signs maintains the cells
    under retractions — linearity means the maintained cells equal a
    fresh build over the CURRENT state, so quantiles answered from the
    maintained sketch are quantiles of the live table
    (`cdc_signed_histogram_quantiles` pins this)."""
    w = (
        F.lit(1).cast("bigint")
        if weight_col is None
        else F.col(weight_col).cast("bigint")
    )
    return (
        df.select(
            F.col(group_col).alias("g"),
            F.shiftright(F.col(value_col).cast("bigint"), shift).alias("bucket"),
            w.alias("_w"),
        )
        .groupBy("g", "bucket")
        .agg(F.sum("_w").cast("bigint").alias("c"))
    )


def histogram_merge(*hists: DataFrame) -> DataFrame:
    """Merge histogram sketches by cell addition (the union operator —
    shards, days, incremental batches all merge identically)."""
    if not hists:
        raise ValueError("need at least one histogram frame")
    u = hists[0]
    for h in hists[1:]:
        u = u.unionByName(h)
    return u.groupBy("g", "bucket").agg(F.sum("c").cast("bigint").alias("c"))


def histogram_quantiles(
    hist: DataFrame, qs: list[tuple[int, int]], shift: int
) -> DataFrame:
    """Rank queries against the sketch: for each (num, den) quantile
    q = num/den, the estimate is the first bucket whose cumulative count
    reaches rank ceil(q·n) (ranks 1-based, ties toward the lower bucket —
    the deterministic rule both engines mirror). Returns per (g, q):
    ``(g, q_num, q_den, rank, est_lo, est_hi)`` where [est_lo, est_hi] is
    the bucket's value range — the true q-quantile provably lies inside.

    Quantiles are exact rationals (num, den), never floats, so the rank
    arithmetic is bit-stable across engines."""
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(
            Window.partitionBy("g").orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    ).withColumn("n", F.sum("c").over(Window.partitionBy("g")))
    qdf = None
    for num, den in qs:
        one = cum.select(
            "g", "bucket", "cum", "n",
            F.lit(num).alias("q_num"), F.lit(den).alias("q_den"),
        )
        qdf = one if qdf is None else qdf.unionByName(one)
    # rank = ceil(q*n) = (q_num*n + q_den - 1) div q_den, floored at 1
    ranked = qdf.withColumn(
        "rank",
        F.greatest(
            F.expr("CAST((q_num * n + q_den - 1) div q_den AS BIGINT)"), F.lit(1)
        ),
    )
    hit = (
        ranked.where(F.col("cum") >= F.col("rank"))
        .groupBy("g", "q_num", "q_den")
        .agg(F.min("bucket").alias("bucket"), F.first("rank").alias("rank"))
    )
    w = 1 << shift
    return hit.select(
        "g", "q_num", "q_den",
        F.col("rank").cast("bigint").alias("rank"),
        (F.col("bucket") * w).cast("bigint").alias("est_lo"),
        (F.col("bucket") * w + (w - 1)).cast("bigint").alias("est_hi"),
    )
