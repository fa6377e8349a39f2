"""Sketch + in-engine-ML queries (round 5): mergeable count-min and KMV
sketches (batch, streaming, turnstile-CDC, snapshot-incremental, and the
AMS join-size estimator), integer-exact Naive Bayes, leave-one-out k-NN
voting, BPE tokenizer training/encoding, and incremental inverted-index
maintenance.

All fully oracle-checked: the sketches hash through ``md5_number_lower``
(identical in DuckDB), the NB log-likelihood is exact integer surprisal
(`ilog2`), k-NN reuses the quantized-cosine scorer, and BPE training is
re-derived step-for-step by an unrolled CTE oracle.

Sketch-build principle (bench-derived): combine before you hash — build
cells from the (key, count) frame, never the raw occurrence stream; by
linearity the cells are identical and each distinct key is hashed once
per sketch row (16x on the corpus token stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_dts_connector_spark.operators import ml as ML
from flink_dts_connector_spark.operators import sketch as SK
from flink_dts_connector_spark.plans.ext_queries import SQL_Q, SQL_TOKS, t
from flink_dts_connector_spark.plans.registry import register

# DuckDB twin of operators.sketch.cms_hash (row j salts the digest input)
_SQL_CMS_B = "CAST(md5_number_lower('cms' || CAST(j AS VARCHAR) || ':' || w) % 256 AS BIGINT)"
_SQL_ILOG2 = "CAST(length(printf('%b', {x})) - 1 AS BIGINT)"


@register(
    "sketch_count_min_heavy_hitters",
    oracle=f"""
WITH toks AS (
  SELECT unnest({SQL_TOKS}) AS w FROM documents
), exact AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS exact_n FROM toks GROUP BY 1
), cells AS (
  SELECT j, {_SQL_CMS_B} AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
  GROUP BY 1, 2
), cand AS (
  SELECT w, exact_n FROM exact ORDER BY exact_n DESC, w LIMIT 20
), probes AS (
  SELECT cand.w, cand.exact_n, j, {_SQL_CMS_B} AS b
  FROM cand CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
), est AS (
  SELECT p.w, ANY_VALUE(p.exact_n) AS exact_n,
         CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS cms_estimate
  FROM probes p LEFT JOIN cells c ON c.j = p.j AND c.b = p.b
  GROUP BY p.w
)
SELECT w AS token, exact_n, cms_estimate,
       CAST(cms_estimate - exact_n AS BIGINT) AS overestimate
FROM est
""",
    tags=("ext", "sketch", "text"),
)
def sketch_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 x width 256) over the corpus token stream,
    probed at the 20 heaviest tokens (deterministic candidate rule: exact
    count DESC, token ASC) and compared against the exact counts — the
    one-sided error (estimate >= exact, always) is the output. The sketch
    build is ONE hash agg whose map-side combine caps shuffle volume at
    depth*width cells per task regardless of input mass; per-shard sketches
    merge by cell addition (`sketch.cms_merge`, pytest-pinned equal to the
    global build)."""
    from flink_dts_connector_spark.operators.text import tokens

    docs = t(spark, sf_dir, "documents")

    items = docs.select(F.explode(tokens("text")).alias("w"))
    # one corpus pass: the exact type counts; the sketch is then built from
    # the (token, count) frame with weights — each DISTINCT token is hashed
    # once per row instead of once per occurrence (cells are identical by
    # linearity), and the corpus explode is never recomputed.
    # r14: EAGER localCheckpoint, not a lazy persist — AQE materializes the
    # sketch/candidate/probe consumer stages concurrently, and concurrent
    # first readers of a lazy cache each recompute the corpus explode
    # (block-store locks don't serialize the compute). One eager job runs
    # the pass exactly once; no cache to unpersist afterwards.
    exact = (
        items.groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
        .localCheckpoint()
    )
    sketch = SK.cms_build(exact, item_col="w", depth=4, width=256, weight_col="exact_n")
    cand = exact.orderBy(F.desc("exact_n"), F.asc("w")).limit(20)
    est = SK.cms_estimate(sketch, cand.select("w", "exact_n"), "w", depth=4, width=256)
    return (
        cand.join(est, "w")
        .select(
            F.col("w").alias("token"),
            "exact_n",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_n")).cast("bigint").alias("overestimate"),
        )
    )


_SQL_KMV_SKETCH = f"""
  SELECT g, h, r FROM (
    SELECT event_type AS g, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
    FROM (
      SELECT DISTINCT event_type,
             CAST(md5_number_lower(CAST(user_id AS VARCHAR)) % 2147483647 AS BIGINT) AS h
      FROM events
    )
  ) WHERE r <= 64
"""


@register(
    "sketch_kmv_distinct_users",
    oracle=f"""
WITH sk AS ({_SQL_KMV_SKETCH}),
agg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_h,
         MAX(CASE WHEN r = 64 THEN h END) AS hk
  FROM sk GROUP BY 1
), exact AS (
  SELECT event_type AS g, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT a.g AS event_type,
       CAST(CASE WHEN a.n_h < 64 THEN a.n_h
                 ELSE 63 * CAST(2147483647 AS BIGINT) // a.hk END AS BIGINT) AS distinct_est,
       e.exact_distinct
FROM agg a JOIN exact e USING (g)
""",
    tags=("ext", "sketch", "events"),
)
def sketch_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values, k=64) distinct-user estimate per event type,
    reported beside the exact distinct count. Sketch = the 64 smallest
    distinct md5-mod-p user hashes per group (<= 64 rows/group, mergeable
    by union-then-retake); small groups degrade gracefully to EXACT counts.
    At 100 TB the sketch build's distinct hash-agg map-side-combines to
    <= k rows per task before the shuffle."""
    ev = t(spark, sf_dir, "events")
    sk = SK.kmv_sketch(ev, key_col="user_id", group_col="event_type", k=64)
    est = SK.kmv_distinct_estimate(sk, k=64)
    exact = ev.groupBy(F.col("event_type").alias("g")).agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return est.join(exact, "g").select(
        F.col("g").alias("event_type"), "distinct_est", "exact_distinct"
    )


@register(
    "sketch_kmv_user_overlap",
    oracle=f"""
WITH sk AS ({_SQL_KMV_SKETCH}),
gp AS (
  SELECT x.g AS ga, y.g AS gb
  FROM (SELECT DISTINCT g FROM sk) x, (SELECT DISTINCT g FROM sk) y
  WHERE x.g < y.g
), tagged AS (
  SELECT gp.ga, gp.gb, sk.h,
         MAX(CASE WHEN sk.g = gp.ga THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN sk.g = gp.gb THEN 1 ELSE 0 END) AS in_b
  FROM gp JOIN sk ON sk.g = gp.ga OR sk.g = gp.gb
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY h) AS r FROM tagged
)
SELECT ga, gb,
       CAST(COUNT(*) AS BIGINT) AS k_used,
       CAST(SUM(in_a * in_b) AS BIGINT) AS n_common,
       CAST(SUM(in_a * in_b) AS DOUBLE) / COUNT(*) AS jaccard_est
FROM ranked WHERE r <= 64
GROUP BY 1, 2
""",
    tags=("ext", "sketch", "events"),
)
def sketch_kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix from KMV sketches alone: estimated user-set
    Jaccard for every unordered event-type pair via the union-sketch rule
    J ~= |K(A u B) n A n B| / |K(A u B)|. The corpus is touched once (to
    sketch); the O(groups^2) pair stage runs on <= k-row sketches — the
    pattern that makes a 10k-segment overlap matrix tractable at 100 TB."""
    ev = t(spark, sf_dir, "events")
    sk = SK.kmv_sketch(ev, key_col="user_id", group_col="event_type", k=64)
    return SK.kmv_jaccard_pairs(sk, k=64)


@register(
    "ml_nb_source_confusion",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source AS cls, unnest({SQL_TOKS}) AS w FROM documents
), dt AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS dc FROM toks GROUP BY 1, 2
), cnt AS (
  SELECT cls, w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
), tcs AS (
  SELECT cls, CAST(SUM(c) AS BIGINT) AS tc FROM cnt GROUP BY 1
), vocab AS (
  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM dt
), dcls AS (
  SELECT source AS cls, CAST(COUNT(*) AS BIGINT) AS d_c FROM documents GROUP BY 1
), dtot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS d FROM documents
), classes AS (
  SELECT tcs.cls, tcs.tc, vocab.v,
         {_SQL_ILOG2.format(x="dtot.d // dcls.d_c")} AS prior,
         {_SQL_ILOG2.format(x="tcs.tc + vocab.v")} AS dflt
  FROM tcs JOIN dcls USING (cls), vocab, dtot
), model AS (
  SELECT cnt.cls, cnt.w,
         {_SQL_ILOG2.format(x="(classes.tc + classes.v) // (cnt.c + 1)")} - classes.dflt AS delta
  FROM cnt JOIN classes USING (cls)
), adj AS (
  SELECT dt.doc_id, model.cls, CAST(SUM(dt.dc * model.delta) AS BIGINT) AS adj
  FROM dt JOIN model USING (w) GROUP BY 1, 2
), ntok AS (
  SELECT doc_id, CAST(SUM(dc) AS BIGINT) AS n_tok FROM dt GROUP BY 1
), scores AS (
  SELECT d.doc_id, d.source AS actual, c.cls,
         c.prior + c.dflt * COALESCE(n.n_tok, 0) + COALESCE(a.adj, 0) AS score
  FROM documents d
  CROSS JOIN classes c
  LEFT JOIN ntok n ON n.doc_id = d.doc_id
  LEFT JOIN adj a ON a.doc_id = d.doc_id AND a.cls = c.cls
), pred AS (
  SELECT doc_id, actual, MIN(cls) AS predicted FROM (
    SELECT *, MIN(score) OVER (PARTITION BY doc_id) AS m FROM scores
  ) WHERE score = m GROUP BY 1, 2
)
SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2
""",
    tags=("ext", "ml", "text"),
)
def ml_nb_source_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes source classifier trained AND applied inside
    the engine (resubstitution confusion matrix). Log-likelihoods are exact
    integer surprisals (`ilog2((T_c+V) div (cnt+1))`, Laplace-smoothed), so
    training, inference and the DuckDB oracle agree bit-for-bit — the
    quality-classifier pipeline stage with zero external model runtime.
    Scale: model = (class, token) count table joined on the TOKEN
    (co-located, never broadcast at web vocab scale); the doc x class x
    token cube is never materialized (absent pairs fold into a per-class
    default term)."""
    return ML.nb_confusion(t(spark, sf_dir, "documents"))


@register(
    "ml_knn_label_confusion",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, {SQL_Q} AS qe, label AS actual_label
  FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 5000
), it AS (
  SELECT vec_id, {SQL_Q} AS ie, label FROM embeddings
), qn AS (
  SELECT query_id, qe, actual_label,
         CAST(list_sum(list_transform(qe, x -> x*x)) AS BIGINT) AS nq FROM q
), itn AS (
  SELECT vec_id, ie, label,
         CAST(list_sum(list_transform(ie, x -> x*x)) AS BIGINT) AS ni FROM it
), flat_q AS (
  SELECT query_id, nq, unnest(qe) AS x, generate_subscripts(qe, 1) AS i FROM qn
), flat_i AS (
  SELECT vec_id, ni, unnest(ie) AS x, generate_subscripts(ie, 1) AS i FROM itn
), dots AS (
  SELECT query_id, vec_id, CAST(SUM(fq.x * fi.x) AS BIGINT) AS dot,
         ANY_VALUE(nq) AS nq, ANY_VALUE(ni) AS ni
  FROM flat_q fq JOIN flat_i fi ON fq.i = fi.i
  WHERE query_id <> vec_id
  GROUP BY query_id, vec_id
), topk AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id
             ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(nq AS DOUBLE) * CAST(ni AS DOUBLE)) DESC,
                      vec_id
           ) AS rank
    FROM dots
  ) WHERE rank <= 5
), votes AS (
  SELECT t.query_id, it.label, CAST(COUNT(*) AS BIGINT) AS n_votes
  FROM topk t JOIN it ON it.vec_id = t.vec_id
  GROUP BY 1, 2
), pred AS (
  SELECT query_id, MIN(label) AS predicted_label FROM (
    SELECT *, MAX(n_votes) OVER (PARTITION BY query_id) AS mx FROM votes
  ) WHERE n_votes = mx GROUP BY 1
)
SELECT q.actual_label, p.predicted_label, CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM pred p JOIN q ON q.query_id = p.query_id
GROUP BY 1, 2
""",
    tags=("ext", "ml", "similarity"),
)
def ml_knn_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN label vote on the deterministic FIXED probe
    sample (vec_id % 20 = 0, capped below 5000 — identical to the whole
    probe population at sf ≤ 0.1, and a fixed 250-probe statistical audit
    beyond, so total work scales LINEARLY with the corpus; the r11 sf1
    bench caught the uncapped version at ×74 raw on ×10 data): majority
    label of the 5 nearest other vectors by exact quantized cosine, ties
    to the smallest label — the embedding-space label-quality audit
    (mislabeled-cluster detection) run entirely as a broadcast-probe
    join; the item table never shuffles."""
    return ML.knn_label_confusion(
        t(spark, sf_dir, "embeddings"), k=5, probe_mod=20, probe_max=5000
    )


def _bpe_oracle(n_merges: int) -> str:
    """Unrolled n-round BPE training as a DuckDB CTE chain (the iterative-
    algorithm oracle pattern established by the k-means / PageRank
    queries): each round re-derives pair supports from the previous
    round's segmentation strings, picks the same (support DESC, a, b)
    argmax, and applies the same separator-consuming regexp rewrite."""
    from flink_dts_connector_spark.operators.ml import BPE_SEP as S
    from flink_dts_connector_spark.operators.ml import BPE_SEP2 as S2

    sql = f"""
WITH words0 AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
         '{S2}' || regexp_replace(w, '(.)', '\\1{S2}', 'g') AS rep
  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents)
  WHERE regexp_matches(w, '^[a-z]+$')
  GROUP BY w
)"""
    for r in range(n_merges):
        sql += f""",
pairs{r} AS (
  SELECT p[1] AS a, p[2] AS b, CAST(SUM(cnt) AS BIGINT) AS support
  FROM (
    SELECT cnt, unnest(list_zip(arr[1:len(arr)-1], arr[2:])) AS p
    FROM (SELECT cnt, list_filter(string_split(rep, '{S2}'), x -> x <> '') AS arr
          FROM words{r})
    WHERE len(arr) >= 2
  )
  GROUP BY 1, 2
),
best{r} AS (
  SELECT a, b, support FROM pairs{r} ORDER BY support DESC, a, b LIMIT 1
),
words{r + 1} AS (
  SELECT w, cnt,
         regexp_replace(rep, '{S}' || a || '{S2}' || b || '{S}',
                        '{S}' || a || b || '{S}', 'g') AS rep
  FROM words{r}, best{r}
)"""
    sql += "\n" + "\nUNION ALL\n".join(
        f"SELECT CAST({r + 1} AS BIGINT) AS rank, a AS left_sym, b AS right_sym,"
        f" a || b AS merged, support FROM best{r}"
        for r in range(n_merges)
    )
    return sql


@register(
    "ml_bpe_train_merges",
    oracle=_bpe_oracle(8),
    tags=("ext", "ml", "text", "tokenizer"),
)
def ml_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training inside the engine: 8 merge rounds over the
    corpus vocabulary (classic frequency-weighted pair merging, greedy
    left-to-right, deterministic tie-break), returning the ranked merge
    table. The iterating frame is the word-TYPE table — the corpus is
    scanned once for the initial vocabulary count; every round after that
    is vocabulary-sized work (pair-count agg + broadcast 1-row argmax
    rewrite), which is what makes tokenizer training on a 100 TB corpus a
    cheap appendix to the pipeline rather than a separate system. Merge
    semantics pinned against a pure-Python reference BPE in
    tests/test_sketch_ml.py; the 8-round unrolled CTE oracle re-derives
    training step-for-step in DuckDB."""
    from flink_dts_connector_spark.operators.ml import bpe_train_merges

    return bpe_train_merges(t(spark, sf_dir, "documents"), n_merges=8)


def _bpe_cte(n_merges: int) -> str:
    """Just the WITH-chain of `_bpe_oracle` (words0..words{n}), reusable by
    queries over the final segmentation frame."""
    full = _bpe_oracle(n_merges)
    return full[: full.rindex("\nSELECT CAST(1 AS BIGINT)")]


@register(
    "ml_bpe_encode_stats",
    oracle=f"""{_bpe_cte(8)}
SELECT CAST(COUNT(*) AS BIGINT) AS n_word_types,
       CAST(SUM(cnt) AS BIGINT) AS token_mass,
       CAST(SUM(cnt * length(w)) AS BIGINT) AS char_mass,
       CAST(SUM(cnt * len(list_filter(string_split(rep, '{chr(31) * 2}'), x -> x <> ''))) AS BIGINT) AS sym_mass,
       CAST(SUM(cnt * len(list_filter(string_split(rep, '{chr(31) * 2}'), x -> x <> ''))) AS DOUBLE)
         / SUM(cnt) AS avg_syms_per_token,
       CAST(SUM(cnt * len(list_filter(string_split(rep, '{chr(31) * 2}'), x -> x <> ''))) AS DOUBLE)
         / SUM(cnt * length(w)) AS compression_ratio
FROM words8
""",
    tags=("ext", "ml", "text", "tokenizer"),
)
def ml_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of in-engine BPE: encode the corpus with the trained
    merges (the trainer's final word-type segmentations ARE the encoded
    vocabulary — applying a merge table is a dictionary join, no re-run of
    the merge loop) and report the corpus-level compression: symbol mass
    after 8 merges vs character mass before, weighted by token frequency.
    Integer masses + two final double divisions, so the oracle — which
    re-trains step-for-step in its CTE chain — must agree exactly."""
    from flink_dts_connector_spark.operators.ml import BPE_SEP2, bpe_train

    _, seg = bpe_train(t(spark, sf_dir, "documents"), n_merges=8)
    arr = F.filter(F.split("rep", BPE_SEP2), lambda x: x != F.lit(""))
    per = seg.select(
        "cnt",
        F.length("w").cast("bigint").alias("n_chars"),
        F.size(arr).cast("bigint").alias("n_syms"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_word_types"),
        F.sum("cnt").cast("bigint").alias("token_mass"),
        F.sum(F.col("cnt") * F.col("n_chars")).cast("bigint").alias("char_mass"),
        F.sum(F.col("cnt") * F.col("n_syms")).cast("bigint").alias("sym_mass"),
        (
            F.sum(F.col("cnt") * F.col("n_syms")).cast("double") / F.sum("cnt")
        ).alias("avg_syms_per_token"),
        (
            F.sum(F.col("cnt") * F.col("n_syms")).cast("double")
            / F.sum(F.col("cnt") * F.col("n_chars"))
        ).alias("compression_ratio"),
    )


@register(
    "curate_snapshot_sketch_update",
    oracle=f"""
WITH newc AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 17 <> 0
), toks AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM newc
), exact AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS exact_n FROM toks GROUP BY 1
), cells AS (
  SELECT j, {_SQL_CMS_B} AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
  GROUP BY 1, 2
), cand AS (
  SELECT w, exact_n FROM exact ORDER BY exact_n DESC, w LIMIT 20
), probes AS (
  SELECT cand.w, cand.exact_n, j, {_SQL_CMS_B} AS b
  FROM cand CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
), est AS (
  SELECT p.w, ANY_VALUE(p.exact_n) AS exact_n,
         CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS cms_estimate
  FROM probes p LEFT JOIN cells c ON c.j = p.j AND c.b = p.b
  GROUP BY p.w
)
SELECT w AS token, exact_n, cms_estimate,
       CAST(cms_estimate - exact_n AS BIGINT) AS overestimate
FROM est
""",
    tags=("ext", "curation", "sketch", "incremental"),
)
def curate_snapshot_sketch_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental sketch maintenance across corpus snapshots: the OLD
    snapshot's token count-min sketch plus a SIGNED delta sketch built only
    from `snapshot_diff`'s I/U/D rows (−1 for departing texts, +1 for
    arriving ones) EQUALS the sketch rebuilt from the NEW snapshot — which
    is exactly what the oracle builds. Process-the-delta-not-the-corpus for
    the profile layer: nightly token statistics at 100 TB become
    |delta|-sized work plus a cells-sized merge. Probes report the new
    corpus's top-20 tokens through the MAINTAINED sketch (the oracle match
    is the linearity proof)."""
    from flink_dts_connector_spark.operators import curation as C
    from flink_dts_connector_spark.operators.text import tokens

    docs = t(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 11 != 0)
    new = docs.where(F.col("doc_id") % 17 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    diff = C.snapshot_diff(old, new)
    # pre-aggregate each token stream to (token, signed count) so distinct
    # tokens are hashed once per sketch row (cells identical by linearity)
    def _counts(frame, sign):
        return (
            frame.select(F.explode(tokens("text")).alias("w"))
            .groupBy("w")
            .agg((F.count(F.lit(1)) * sign).cast("bigint").alias("s"))
        )

    old_items = _counts(old, 1)
    minus = _counts(old.join(diff.where(F.col("op").isin("D", "U")), "doc_id"), -1)
    plus = _counts(new.join(diff.where(F.col("op").isin("I", "U")), "doc_id"), 1)
    # the stored sketch (built once, persisted in real life) and the
    # |delta|-sized signed sketch merge cell-wise — linearity is the whole
    # point, so the merge is the literal operation under test
    old_cells = SK.cms_build(old_items, item_col="w", depth=4, width=256, weight_col="s")
    delta_cells = SK.cms_build(
        minus.unionByName(plus), item_col="w", depth=4, width=256, weight_col="s"
    )
    maintained = SK.cms_merge(old_cells, delta_cells)
    # probes come from the new corpus (the report side)
    new_items = new.select(F.explode(tokens("text")).alias("w"))
    exact = new_items.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
    cand = exact.orderBy(F.desc("exact_n"), F.asc("w")).limit(20)
    est = SK.cms_estimate(maintained, cand.select("w"), "w", depth=4, width=256)
    return cand.join(est, "w").select(
        F.col("w").alias("token"),
        "exact_n",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_n")).cast("bigint").alias("overestimate"),
    )


@register(
    "sketch_join_size_estimate",
    oracle="""
WITH ka AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1
), kb AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
), ca AS (
  SELECT j, CAST(md5_number_lower('cms' || CAST(j AS VARCHAR) || ':' || w) % 1048576 AS BIGINT) AS b,
         CAST(SUM(cnt) AS BIGINT) AS c
  FROM ka CROSS JOIN (SELECT unnest([0,1,2,3]) AS j) GROUP BY 1, 2
), cb AS (
  SELECT j, CAST(md5_number_lower('cms' || CAST(j AS VARCHAR) || ':' || w) % 1048576 AS BIGINT) AS b,
         CAST(SUM(cnt) AS BIGINT) AS c
  FROM kb CROSS JOIN (SELECT unnest([0,1,2,3]) AS j) GROUP BY 1, 2
), ip AS (
  SELECT ca.j, CAST(SUM(ca.c * cb.c) AS BIGINT) AS prod
  FROM ca JOIN cb ON ca.j = cb.j AND ca.b = cb.b
  GROUP BY 1
), exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_join_rows
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)
SELECT e.exact_join_rows,
       CAST(MIN(ip.prod) AS BIGINT) AS cms_estimate,
       CAST(MIN(ip.prod) - e.exact_join_rows AS BIGINT) AS overestimate
FROM ip, exact e
GROUP BY e.exact_join_rows
""",
    tags=("ext", "sketch", "planner", "join"),
)
def sketch_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from sketches alone (the AMS/CMS
    inner-product estimator): |A ⋈ B| = Σ_k f_A(k)·f_B(k) is estimated by
    min over sketch rows of the cell-wise inner product of the two sides'
    count-min sketches — one-sided (estimate ≥ exact, colliding keys only
    add). The pre-flight a 100 TB join wants: both sketches are
    depth×width cells (built in one pass each, or maintained incrementally
    under CDC — `cdc_signed_count_sketch`), so the output-size forecast
    costs an inner product over ≤2·depth·width rows, not a trial join.
    Reported beside the exact join count."""
    # pre-aggregate to (key, count) so each DISTINCT key is hashed once per
    # sketch row (map-side-combined shuffle; ~16x fewer digests on lineitem)
    ka = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").cast("string").alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    kb = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").cast("string").alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # width 2^20 keeps the AMS error term F1(A)*F1(B)/width small enough to
    # plan with; materialize each sketch before the inner product (exactly
    # the persisted-sketch usage at scale — and it stops the join planner
    # from re-executing both build subtrees)
    ca = SK.cms_build(ka, "w", depth=4, width=1 << 20, weight_col="cnt").persist()
    cb = SK.cms_build(kb, "w", depth=4, width=1 << 20, weight_col="cnt").persist()
    ca.count(), cb.count()  # materialize the cells into the cache
    ip = (
        ca.alias("a")
        .join(cb.alias("b"), ["j", "b"])
        .groupBy("j")
        .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("bigint").alias("prod"))
    )
    exact = (
        t(spark, sf_dir, "orders")
        .join(t(spark, sf_dir, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_join_rows"))
    )
    out = (
        ip.agg(F.min("prod").cast("bigint").alias("cms_estimate"))
        .crossJoin(F.broadcast(exact))
        .select(
            "exact_join_rows",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_join_rows")).cast("bigint").alias(
                "overestimate"
            ),
        )
        # one-row report: materialize, then release both cached sketches
        .localCheckpoint()
    )
    ca.unpersist()
    cb.unpersist()
    return out


@register(
    "search_incremental_index_update",
    oracle=f"""
WITH newc AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 17 <> 0
), toks AS (
  SELECT doc_id, unnest({SQL_TOKS}) AS token FROM newc
), post AS (
  SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), agg AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
  FROM post GROUP BY 1
)
SELECT token, df, cf FROM agg ORDER BY df DESC, token LIMIT 20
""",
    tags=("ext", "search", "incremental"),
)
def search_incremental_index_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index maintenance under a corpus delta — the search-family
    member of the incremental-index set (MinHash band index, IVF upsert,
    snapshot CMS all have one): postings of departing docs (D/U) anti-join
    out, postings of arriving texts (I/U) append, and the maintained index
    must equal the rebuild over the new snapshot — the oracle computes the
    rebuild. Index deltas are |changed docs|-sized; the corpus-sized
    postings table is only anti-joined (no recompute). Reports the top-20
    terms by document frequency through the MAINTAINED index."""
    from flink_dts_connector_spark.operators import curation as C
    from flink_dts_connector_spark.operators.search import postings

    docs = t(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 11 != 0)
    new = docs.where(F.col("doc_id") % 17 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    diff = C.snapshot_diff(old, new)
    maintained = (
        postings(old)
        .join(diff.where(F.col("op").isin("D", "U")), "doc_id", "left_anti")
        .unionByName(postings(new.join(diff.where(F.col("op").isin("I", "U")), "doc_id")))
    )
    return (
        maintained.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("tf").cast("bigint").alias("cf"),
        )
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(20)
    )


def _knn_ivf_oracle() -> str:
    from flink_dts_connector_spark.plans.ext_queries import SQL_IVF

    return f"""
WITH base AS (
{SQL_IVF.replace("% 100 = 0", "% 20 = 0")}
), votes AS (
  SELECT b.query_id, e.label, CAST(COUNT(*) AS BIGINT) AS n_votes
  FROM base b JOIN embeddings e ON e.vec_id = b.vec_id
  GROUP BY 1, 2
), pred AS (
  SELECT query_id, MIN(label) AS predicted_label FROM (
    SELECT *, MAX(n_votes) OVER (PARTITION BY query_id) AS mx FROM votes
  ) WHERE n_votes = mx GROUP BY 1
)
SELECT q.label AS actual_label, p.predicted_label, CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM pred p JOIN embeddings q ON q.vec_id = p.query_id
GROUP BY 1, 2
"""


@register(
    "ml_knn_ivf_confusion",
    oracle=_knn_ivf_oracle(),
    tags=("ext", "ml", "similarity", "approx"),
)
def ml_knn_ivf_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-accelerated inference: the kNN label vote served through the
    IVF index instead of brute force — candidates come from the probe
    cells (nprobe=3), so per-probe cost is nprobe/n_cells of the corpus;
    the confusion matrix shows what index-served classification costs in
    quality vs `ml_knn_label_confusion`'s exact version (probes with empty
    candidate cells simply don't classify — the recall story, identical in
    both engines). The composition a 100 TB feature store actually runs:
    train/audit exactly, serve through the index."""
    from flink_dts_connector_spark.operators import similarity as S

    e = t(spark, sf_dir, "embeddings")
    centroids = e.where((F.col("vec_id") % 37 == 3) & (F.col("vec_id") < 5000)).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    probes = e.where((F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 5000)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    nn = S.ivf_topk(e, probes, centroids, k=5, nprobe=3)
    votes = (
        nn.join(e.select("vec_id", "label"), "vec_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_votes"))
    )
    best = votes.groupBy("query_id").agg(F.max("n_votes").alias("mx"))
    pred = (
        votes.join(best, "query_id")
        .where(F.col("n_votes") == F.col("mx"))
        .groupBy("query_id")
        .agg(F.min("label").alias("predicted_label"))
    )
    return (
        pred.join(
            e.select(F.col("vec_id").alias("query_id"), F.col("label").alias("actual_label")),
            "query_id",
        )
        .groupBy("actual_label", "predicted_label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    )


def _cms_width_oracle() -> str:
    blocks = []
    for w in (64, 256, 1024):
        blocks.append(f"""
SELECT CAST({w} AS BIGINT) AS width, CAST(SUM(est.cms_estimate - est.exact_n) AS BIGINT) AS total_overestimate,
       CAST(MAX(est.cms_estimate - est.exact_n) AS BIGINT) AS max_overestimate
FROM (
  SELECT p.w, ANY_VALUE(p.exact_n) AS exact_n,
         CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS cms_estimate
  FROM (
    SELECT cand.w, cand.exact_n, j,
           CAST(md5_number_lower('cms' || CAST(j AS VARCHAR) || ':' || w) % {w} AS BIGINT) AS b
    FROM (SELECT w, exact_n FROM exact ORDER BY exact_n DESC, w LIMIT 20) cand
    CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
  ) p
  LEFT JOIN (
    SELECT j, CAST(md5_number_lower('cms' || CAST(j AS VARCHAR) || ':' || w) % {w} AS BIGINT) AS b,
           CAST(SUM(exact_n) AS BIGINT) AS c
    FROM exact CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
    GROUP BY 1, 2
  ) c ON c.j = p.j AND c.b = p.b
  GROUP BY p.w
) est""")
    toks = "string_split_regex(trim(text), '\\s+')"
    return (
        f"""
WITH exact AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM (SELECT unnest({toks}) AS w FROM documents) GROUP BY 1
)
"""
        + "\nUNION ALL\n".join(blocks)
    )


@register(
    "sketch_count_min_width_sweep",
    oracle=_cms_width_oracle(),
    tags=("ext", "sketch", "calibration"),
)
def sketch_count_min_width_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch self-calibration — the empirical ε = F1/width law: the same
    token stream sketched at widths 64 / 256 / 1024, each probed at the 20
    heaviest tokens, reporting total and max one-sided overestimate per
    width (shrinks ~linearly in 1/width). The sizing study a 100 TB
    deployment runs once before fixing its sketch budget — the companion
    to `ann_recall_report` (ANN) and `dedup_minhash_calibration` (MinHash)
    in the self-evaluating family. All three sketches build from the one
    (token, count) frame (combine-before-hash)."""
    from flink_dts_connector_spark.operators.text import tokens

    items = t(spark, sf_dir, "documents").select(F.explode(tokens("text")).alias("w"))
    # r14: eager localCheckpoint (same fix as sketch_count_min_heavy_hitters)
    # — the three width branches materialize concurrently under AQE, and a
    # lazy persist lets each concurrent first reader recompute the corpus
    # explode instead of sharing one pass
    exact = (
        items.groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
        .localCheckpoint()
    )
    cand = exact.orderBy(F.desc("exact_n"), F.asc("w")).limit(20)
    out = None
    for width in (64, 256, 1024):
        sk = SK.cms_build(exact, item_col="w", depth=4, width=width, weight_col="exact_n")
        est = SK.cms_estimate(sk, cand.select("w"), "w", depth=4, width=width)
        row = (
            cand.join(est, "w")
            .agg(
                F.sum(F.col("cms_estimate") - F.col("exact_n"))
                .cast("bigint")
                .alias("total_overestimate"),
                F.max(F.col("cms_estimate") - F.col("exact_n"))
                .cast("bigint")
                .alias("max_overestimate"),
            )
            .select(
                F.lit(width).cast("bigint").alias("width"),
                "total_overestimate",
                "max_overestimate",
            )
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


_HLL_SQL_REGS = """
  SELECT g, j, CAST(MAX(CASE WHEN v = 0 THEN 32 ELSE 32 - length(bin(v)) END) AS BIGINT) AS r
  FROM (
    SELECT g, CAST(md5_number_lower(k || ':hllb') % 256 AS BIGINT) AS j,
           CAST(md5_number_lower(k || ':hllr') % 2147483648 AS BIGINT) AS v
    FROM (SELECT DISTINCT {group_expr} AS g, CAST(user_id AS VARCHAR) AS k FROM events)
  ) GROUP BY 1, 2
"""

_HLL_SQL_EST = """
  SELECT g,
         CAST(4043669515425284096 AS BIGINT) // (10000 * (sp + (256 - np) * (CAST(1 AS BIGINT) << 33))) AS hll_est,
         CAST(256 - np AS BIGINT) AS n_zero_registers
  FROM (
    SELECT g, CAST(COUNT(*) AS BIGINT) AS np,
           CAST(SUM(CAST(1 AS BIGINT) << (33 - r)) AS BIGINT) AS sp
    FROM regs GROUP BY 1
  )
"""


@register(
    "sketch_hll_distinct_users",
    oracle=f"""
WITH regs AS ({_HLL_SQL_REGS.format(group_expr="event_type")}),
est AS ({_HLL_SQL_EST}),
exact AS (
  SELECT event_type AS g, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT e.g AS event_type, est.hll_est, e.exact_distinct, est.n_zero_registers,
       CAST(est.hll_est - e.exact_distinct AS BIGINT) AS est_error
FROM est JOIN exact e USING (g)
""",
    tags=("ext", "sketch", "hll"),
)
def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog registers per event_type — the third mergeable sketch
    family (CMS counts mass, KMV holds sample hashes, HLL counts DISTINCT
    in 256 fixed registers). Engine-mirrorable variant: md5 bucket +
    independent 31-bit rank hash, RAW estimator with fixed rational alpha
    — all integer arithmetic, hash-matched against the DuckDB mirror.
    Zero-register counts ride along (the input a small-range correction
    would use; ln()-based corrections are out of the oracle contract by
    design). State per group is 256 BIGINTs FOREVER — the streaming
    distinct-count answer at 100 TB, like the CMS/KMV twins."""
    ev = t(spark, sf_dir, "events")
    regs = SK.hll_registers(ev, key_col="user_id", group_col="event_type")
    est = SK.hll_estimate(regs)
    exact = ev.groupBy(F.col("event_type").alias("g")).agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return est.join(exact, "g").select(
        F.col("g").alias("event_type"),
        "hll_est",
        "exact_distinct",
        "n_zero_registers",
        (F.col("hll_est") - F.col("exact_distinct")).cast("bigint").alias("est_error"),
    )


@register(
    "sketch_hll_union_merge",
    oracle=f"""
WITH regs AS ({_HLL_SQL_REGS.format(group_expr="'__union__'")}),
est AS ({_HLL_SQL_EST}),
exact AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct FROM events)
SELECT est.hll_est AS union_est, exact.exact_distinct, est.n_zero_registers,
       CAST(0 AS BIGINT) AS n_register_diff
FROM est CROSS JOIN exact
""",
    tags=("ext", "sketch", "hll", "merge"),
)
def sketch_hll_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-only set union: the per-event-type register tables merge by
    per-cell max into the ALL-users sketch — the raw corpus is never
    rescanned. The merged registers are proven cell-identical to a direct
    single-group build (n_register_diff must be 0: merge is lossless for
    HLL by construction), and the union estimate rides next to the exact
    total. This is how per-day / per-shard distinct sketches compose at
    100 TB: store 256 ints per shard, merge with a max."""
    ev = t(spark, sf_dir, "events")
    per_group = SK.hll_registers(ev, key_col="user_id", group_col="event_type")
    merged = SK.hll_merge(per_group.select(F.lit("__union__").alias("g"), "j", "r"))
    direct = SK.hll_registers(
        ev.withColumn("_one", F.lit("__union__")), key_col="user_id", group_col="_one"
    )
    diff = (
        merged.alias("a")
        .join(direct.alias("b"), ["g", "j"], "full_outer")
        .where(
            F.col("a.r").isNull()
            | F.col("b.r").isNull()
            | (F.col("a.r") != F.col("b.r"))
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_register_diff"))
    )
    est = SK.hll_estimate(merged)
    exact = ev.agg(F.countDistinct("user_id").cast("bigint").alias("exact_distinct"))
    return (
        est.select(F.col("hll_est").alias("union_est"), "n_zero_registers")
        .crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(diff))
        .select("union_est", "exact_distinct", "n_zero_registers", "n_register_diff")
    )


@register(
    "sketch_hll_time_cube",
    oracle=f"""
WITH keys AS (
  SELECT date_trunc('day', ts) AS d, CAST(user_id AS VARCHAR) AS k FROM events
  GROUP BY 1, 2
), probe AS (
  SELECT MIN(d) AS d0 FROM keys
), sel AS (
  SELECT k FROM keys, probe WHERE d >= d0 AND d < d0 + INTERVAL 7 DAY GROUP BY k
), regs AS (
  SELECT CAST(md5_number_lower(k || ':hllb') % 256 AS BIGINT) AS j,
         CAST(MAX(CASE WHEN v = 0 THEN 32 ELSE 32 - length(bin(v)) END) AS BIGINT) AS r
  FROM (SELECT k, CAST(md5_number_lower(k || ':hllr') % 2147483648 AS BIGINT) AS v FROM sel)
  GROUP BY 1
), est AS (
  SELECT CAST(4043669515425284096 AS BIGINT)
           // (10000 * (sp + (256 - np) * (CAST(1 AS BIGINT) << 33))) AS range_est,
         CAST(256 - np AS BIGINT) AS n_zero_registers
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS np,
               CAST(SUM(CAST(1 AS BIGINT) << (33 - r)) AS BIGINT) AS sp FROM regs)
), exact AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM sel),
ndays AS (
  SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days_merged
  FROM keys, probe WHERE d >= d0 AND d < d0 + INTERVAL 7 DAY
)
SELECT n_days_merged, range_est, exact_distinct, n_zero_registers
FROM est CROSS JOIN exact CROSS JOIN ndays
""",
    tags=("ext", "sketch", "hll", "cube"),
)
def sketch_hll_time_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-queryable distinct-count cube: per-DAY HLL register tables are
    the stored layer (256 ints per day — the pre-aggregation a 100 TB
    pipeline materializes at ingest), and an arbitrary date-range query is
    answered by max-MERGING the covered days' registers — never rescanning
    events. Probed on the first 7 days and compared against the exact
    range distinct; the oracle rebuilds the estimate from the same range's
    raw keys, which by HLL merge-losslessness must produce the identical
    registers (the same proof shape as `sketch_hll_union_merge`, now over
    the time dimension). The classic OLAP trick that COUNT(DISTINCT)
    cannot do with plain per-day counts."""
    ev = t(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    )
    day_regs = SK.hll_registers(ev, key_col="user_id", group_col="d")
    d0 = ev.agg(F.min("d")).collect()[0][0]
    import datetime as dt

    hi = d0 + dt.timedelta(days=7)
    sel = day_regs.where((F.col("g") >= F.lit(d0)) & (F.col("g") < F.lit(hi)))
    merged = SK.hll_merge(sel.select(F.lit("range").alias("g"), "j", "r"))
    est = SK.hll_estimate(merged).select(
        F.col("hll_est").alias("range_est"), "n_zero_registers"
    )
    exact = (
        t(spark, sf_dir, "events")
        .where((F.date_trunc("day", "ts") >= F.lit(d0)) & (F.date_trunc("day", "ts") < F.lit(hi)))
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_distinct"))
    )
    ndays = sel.select("g").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days_merged")
    )
    return (
        ndays.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(exact))
        .select("n_days_merged", "range_est", "exact_distinct", "n_zero_registers")
    )


@register(
    "plan_join_order_advisor",
    oracle="""
WITH keys AS (
  SELECT 'orders_lineitem' AS jn, 'a' AS side, CAST(o_orderkey AS VARCHAR) AS w FROM orders
  UNION ALL
  SELECT 'orders_lineitem', 'b', CAST(l_orderkey AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'customer_orders', 'a', CAST(c_custkey AS VARCHAR) FROM customer
  UNION ALL
  SELECT 'customer_orders', 'b', CAST(o_custkey AS VARCHAR) FROM orders
), kc AS (
  SELECT jn, side, w, CAST(COUNT(*) AS BIGINT) AS cnt FROM keys GROUP BY 1, 2, 3
), cells AS (
  SELECT jn, side, j,
         CAST(md5_number_lower('cms' || CAST(j AS VARCHAR) || ':' || w) % 1048576 AS BIGINT) AS b,
         CAST(SUM(cnt) AS BIGINT) AS c
  FROM kc CROSS JOIN (SELECT unnest([0,1,2,3]) AS j) GROUP BY 1, 2, 3, 4
), ip AS (
  SELECT a.jn, a.j, CAST(SUM(a.c * b.c) AS BIGINT) AS prod
  FROM cells a JOIN cells b ON a.jn = b.jn AND a.j = b.j AND a.b = b.b
  WHERE a.side = 'a' AND b.side = 'b'
  GROUP BY 1, 2
), est AS (
  SELECT jn, CAST(MIN(prod) AS BIGINT) AS est_rows FROM ip GROUP BY 1
), exact AS (
  SELECT 'orders_lineitem' AS jn, CAST(COUNT(*) AS BIGINT) AS exact_rows
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  UNION ALL
  SELECT 'customer_orders', CAST(COUNT(*) AS BIGINT)
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
)
SELECT e.jn AS first_join, e.est_rows, x.exact_rows,
       CAST(ROW_NUMBER() OVER (ORDER BY e.est_rows, e.jn) AS BIGINT) AS est_rank,
       CAST(ROW_NUMBER() OVER (ORDER BY x.exact_rows, e.jn) AS BIGINT) AS exact_rank,
       (ROW_NUMBER() OVER (ORDER BY e.est_rows, e.jn)
        = ROW_NUMBER() OVER (ORDER BY x.exact_rows, e.jn)) AS order_agrees
FROM est e JOIN exact x USING (jn)
""",
    tags=("ext", "sketch", "planner", "join"),
)
def plan_join_order_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven join-order selection for the customer–orders–lineitem
    chain: both candidate first joins (orders⋈lineitem on orderkey vs
    customer⋈orders on custkey) get an AMS/CMS inner-product cardinality
    forecast from depth-4 × 2^20 count-min sketches of their key columns —
    the intermediate-size comparison a cost-based optimizer runs before
    committing 100 TB to the wrong shape. Self-evaluating: exact join
    sizes and an order_agrees verdict (does the sketch ranking match the
    true ranking?) ride along. Cost of the advice: one pass per key
    column into ≤ depth·width cells + an inner product on cell rows —
    never a trial join. Catalyst analogy: CBO join reordering from column
    stats (SURVEY §4), served here by mergeable sketches that CDC streams
    keep fresh (`cdc_signed_count_sketch`)."""
    from pyspark.sql import Window as W

    def side_keys(tbl: str, col: str):
        return (
            t(spark, sf_dir, tbl)
            .groupBy(F.col(col).cast("string").alias("w"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )

    ests = []
    chains = {
        "orders_lineitem": (("orders", "o_orderkey"), ("lineitem", "l_orderkey")),
        "customer_orders": (("customer", "c_custkey"), ("orders", "o_custkey")),
    }
    for jn, ((ta, ca_col), (tb, cb_col)) in chains.items():
        ca = SK.cms_build(side_keys(ta, ca_col), "w", depth=4, width=1 << 20, weight_col="cnt").persist()
        cb = SK.cms_build(side_keys(tb, cb_col), "w", depth=4, width=1 << 20, weight_col="cnt").persist()
        ca.count(), cb.count()
        ip = (
            ca.alias("a")
            .join(cb.alias("b"), ["j", "b"])
            .groupBy("j")
            .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("bigint").alias("prod"))
        )
        est = ip.agg(F.min("prod").cast("bigint").alias("est_rows")).select(
            F.lit(jn).alias("jn"), "est_rows"
        ).localCheckpoint()
        ca.unpersist()
        cb.unpersist()
        ests.append(est)
    est_all = ests[0].unionByName(ests[1])
    exact = (
        t(spark, sf_dir, "orders")
        .join(t(spark, sf_dir, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_rows"))
        .select(F.lit("orders_lineitem").alias("jn"), "exact_rows")
        .unionByName(
            t(spark, sf_dir, "customer")
            .join(t(spark, sf_dir, "orders"), F.col("c_custkey") == F.col("o_custkey"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("exact_rows"))
            .select(F.lit("customer_orders").alias("jn"), "exact_rows")
        )
    )
    we = W.orderBy("est_rows", "jn")
    wx = W.orderBy("exact_rows", "jn")
    return (
        est_all.join(F.broadcast(exact), "jn")
        .withColumn("est_rank", F.row_number().over(we).cast("bigint"))
        .withColumn("exact_rank", F.row_number().over(wx).cast("bigint"))
        .select(
            F.col("jn").alias("first_join"),
            "est_rows",
            "exact_rows",
            "est_rank",
            "exact_rank",
            (F.col("est_rank") == F.col("exact_rank")).alias("order_agrees"),
        )
    )


@register(
    "sketch_hll_set_algebra",
    oracle=f"""
WITH vocab AS (
  SELECT DISTINCT source AS g, unnest({SQL_TOKS}) AS k
  FROM documents WHERE source IN ('src0', 'src1')
), both_sides AS (
  SELECT g, k FROM vocab
  UNION ALL
  SELECT '__union__', k FROM vocab GROUP BY 2
), regs AS (
  SELECT g, j, CAST(MAX(CASE WHEN v = 0 THEN 32 ELSE 32 - length(bin(v)) END) AS BIGINT) AS r
  FROM (
    SELECT g, CAST(md5_number_lower(k || ':hllb') % 256 AS BIGINT) AS j,
           CAST(md5_number_lower(k || ':hllr') % 2147483648 AS BIGINT) AS v
    FROM both_sides
  ) GROUP BY 1, 2
), est AS (
  SELECT g,
         CAST(4043669515425284096 AS BIGINT) // (10000 * (sp + (256 - np) * (CAST(1 AS BIGINT) << 33))) AS hll_est
  FROM (
    SELECT g, CAST(COUNT(*) AS BIGINT) AS np,
           CAST(SUM(CAST(1 AS BIGINT) << (33 - r)) AS BIGINT) AS sp
    FROM regs GROUP BY 1
  )
), wide AS (
  SELECT MAX(CASE WHEN g = 'src0' THEN hll_est END) AS est_a,
         MAX(CASE WHEN g = 'src1' THEN hll_est END) AS est_b,
         MAX(CASE WHEN g = '__union__' THEN hll_est END) AS est_union
  FROM est
), exact AS (
  SELECT CAST(COUNT(DISTINCT CASE WHEN g = 'src0' THEN k END) AS BIGINT) AS exact_a,
         CAST(COUNT(DISTINCT CASE WHEN g = 'src1' THEN k END) AS BIGINT) AS exact_b,
         CAST(COUNT(DISTINCT k) AS BIGINT) AS exact_union
  FROM vocab
)
SELECT w.est_a, w.est_b, w.est_union,
       CAST(w.est_a + w.est_b - w.est_union AS BIGINT) AS est_inter,
       CAST(w.est_union - w.est_b AS BIGINT) AS est_only_a,
       x.exact_a, x.exact_b, x.exact_union,
       CAST(x.exact_a + x.exact_b - x.exact_union AS BIGINT) AS exact_inter,
       CAST(x.exact_union - x.exact_b AS BIGINT) AS exact_only_a
FROM wide w CROSS JOIN exact x
""",
    tags=("ext", "sketch", "hll"),
)
def sketch_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set ALGEBRA by inclusion-exclusion: intersection and difference
    cardinalities of two source vocabularies estimated from three 256-int
    register tables alone — |A∩B| ≈ est(A)+est(B)−est(A∪B) and |A\\\\B| ≈
    est(A∪B)−est(B), where the union sketch is the per-cell max merge
    (never a rescan). HLL has no native intersect; inclusion-exclusion is
    the standard (error-amplifying) bridge, so the exact values ride
    along to expose the amplification — the honest version of every
    "audience overlap" dashboard. Complements `sketch_kmv_user_overlap`,
    whose KMV sketches estimate Jaccard directly: two sketch families,
    two overlap routes, one truth."""
    from flink_dts_connector_spark.operators.text import tokens

    docs = t(spark, sf_dir, "documents").where(F.col("source").isin("src0", "src1"))
    vocab = docs.select(
        F.col("source").alias("g"), F.explode(tokens("text")).alias("k")
    ).distinct()
    per_source = SK.hll_registers(vocab, key_col="k", group_col="g")
    # the union sketch NEVER rescans tokens: per-cell max merge of the two
    # per-source register tables (lossless — sketch_hll_union_merge pins it)
    union_regs = SK.hll_merge(per_source.select(F.lit("__union__").alias("g"), "j", "r"))
    est = SK.hll_estimate(per_source.unionByName(union_regs))
    wide = est.agg(
        F.max(F.when(F.col("g") == "src0", F.col("hll_est"))).cast("bigint").alias("est_a"),
        F.max(F.when(F.col("g") == "src1", F.col("hll_est"))).cast("bigint").alias("est_b"),
        F.max(F.when(F.col("g") == "__union__", F.col("hll_est")))
        .cast("bigint")
        .alias("est_union"),
    )
    exact = vocab.agg(
        F.countDistinct(F.when(F.col("g") == "src0", F.col("k"))).cast("bigint").alias("exact_a"),
        F.countDistinct(F.when(F.col("g") == "src1", F.col("k"))).cast("bigint").alias("exact_b"),
        F.countDistinct("k").cast("bigint").alias("exact_union"),
    )
    return wide.crossJoin(F.broadcast(exact)).select(
        "est_a",
        "est_b",
        "est_union",
        (F.col("est_a") + F.col("est_b") - F.col("est_union")).cast("bigint").alias("est_inter"),
        (F.col("est_union") - F.col("est_b")).cast("bigint").alias("est_only_a"),
        "exact_a",
        "exact_b",
        "exact_union",
        (F.col("exact_a") + F.col("exact_b") - F.col("exact_union"))
        .cast("bigint")
        .alias("exact_inter"),
        (F.col("exact_union") - F.col("exact_b")).cast("bigint").alias("exact_only_a"),
    )


# ---------------------------------------------------------------------------
# Dyadic histogram quantile sketch (round 7): the rank/quantile member of
# the mergeable-sketch family. Bucket width 2^16 over exact order cents.
# ---------------------------------------------------------------------------

_HQ_SHIFT = 16
_HQ_W = 1 << _HQ_SHIFT
#: exact rational quantiles — never floats, so the rank arithmetic is
#: bit-stable across engines
_HQ_QS = [(1, 2), (9, 10), (99, 100)]
_SQL_HQ_QS = "SELECT * FROM (VALUES (1, 2), (9, 10), (99, 100)) AS t(q_num, q_den)"


@register(
    "sketch_histogram_quantiles",
    oracle=f"""
WITH vals AS (
  SELECT o_orderpriority AS g, {{cents}} AS v FROM orders
), hist AS (
  SELECT g, v // {_HQ_W} AS bucket, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY 1, 2
), cum AS (
  SELECT g, bucket, SUM(c) OVER (PARTITION BY g ORDER BY bucket) AS cum,
         SUM(c) OVER (PARTITION BY g) AS n
  FROM hist
), qs AS ({_SQL_HQ_QS}),
ranked AS (
  SELECT g, bucket, cum, q_num, q_den,
         GREATEST((q_num * n + q_den - 1) // q_den, 1) AS rank
  FROM cum CROSS JOIN qs
), hit AS (
  SELECT g, q_num, q_den, CAST(ANY_VALUE(rank) AS BIGINT) AS rank,
         MIN(bucket) AS bucket
  FROM ranked WHERE cum >= rank GROUP BY 1, 2, 3
), exact AS (
  SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn FROM vals
)
SELECT h.g, CAST(h.q_num AS INT) AS q_num, CAST(h.q_den AS INT) AS q_den,
       h.rank,
       CAST(h.bucket * {_HQ_W} AS BIGINT) AS est_lo,
       CAST(h.bucket * {_HQ_W} + {_HQ_W - 1} AS BIGINT) AS est_hi,
       CAST(e.v AS BIGINT) AS exact_cents,
       e.v BETWEEN h.bucket * {_HQ_W} AND h.bucket * {_HQ_W} + {_HQ_W - 1}
         AS within_bound
FROM hit h JOIN exact e ON e.g = h.g AND e.rn = h.rank
""".format(cents="CAST(round(o_totalprice * 100) AS BIGINT)"),
    tags=("ext", "sketch", "quantile"),
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic histogram quantile sketch: per-priority bucket counts at
    width 2^16 over exact order cents — ONE map-side-combined hash agg
    whose shuffle is O(cells) regardless of input mass — then p50/p90/p99
    answered from the cumulative cell walk. The estimate is a PROVEN
    bracket: the true rank-r value lies in [est_lo, est_hi] by
    construction, and the query emits the exact rank value (row_number
    proof apparatus — production serves from the sketch alone) plus the
    containment flag, which must be TRUE for every row. Quantiles travel
    as exact rationals (num, den) so ceil(q·n) is bit-stable across
    engines. The rank/quantile member of the mergeable-sketch family
    (CMS = frequency, KMV/HLL = distinct, AMS = F2)."""
    from pyspark.sql import Window as W

    vals = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    hist = SK.value_histogram(vals, "g", "v", _HQ_SHIFT)
    quants = SK.histogram_quantiles(hist, _HQ_QS, _HQ_SHIFT)
    exact = vals.withColumn(
        "rn", F.row_number().over(W.partitionBy("g").orderBy("v")).cast("bigint")
    )
    return (
        quants.join(
            exact, (quants["g"] == exact["g"]) & (quants["rank"] == exact["rn"])
        )
        .select(
            quants["g"],
            "q_num",
            "q_den",
            "rank",
            "est_lo",
            "est_hi",
            F.col("v").cast("bigint").alias("exact_cents"),
            F.col("v").between(F.col("est_lo"), F.col("est_hi")).alias("within_bound"),
        )
    )


@register(
    "sketch_histogram_merge",
    oracle=f"""
WITH vals AS (
  SELECT o_orderpriority AS g, CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
), hist AS (
  SELECT g, v // {_HQ_W} AS bucket, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY 1, 2
), cum AS (
  SELECT g, bucket, SUM(c) OVER (PARTITION BY g ORDER BY bucket) AS cum,
         SUM(c) OVER (PARTITION BY g) AS n
  FROM hist
), qs AS ({_SQL_HQ_QS}),
ranked AS (
  SELECT g, bucket, cum, q_num, q_den,
         GREATEST((q_num * n + q_den - 1) // q_den, 1) AS rank
  FROM cum CROSS JOIN qs
), hit AS (
  SELECT g, q_num, q_den, MIN(bucket) AS bucket
  FROM ranked WHERE cum >= rank GROUP BY 1, 2, 3
)
SELECT g, CAST(q_num AS INT) AS q_num, CAST(q_den AS INT) AS q_den,
       CAST(bucket * {_HQ_W} AS BIGINT) AS est_lo_merged,
       CAST(bucket * {_HQ_W} AS BIGINT) AS est_lo_direct
FROM hit
""",
    tags=("ext", "sketch", "quantile", "merge"),
)
def sketch_histogram_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-losslessness proof for the quantile sketch: four per-shard
    histograms (orderkey mod 4) merged by cell addition must answer every
    quantile identically to the direct whole-table build — the property
    that makes the sketch a per-day/per-shard storable summary. The engine
    emits BOTH paths' answers; the oracle computes the closed form once,
    so a hash match proves merged ≡ direct ≡ closed form."""
    vals = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
        (F.col("o_orderkey") % 4).alias("shard"),
    )
    shards = [
        SK.value_histogram(vals.where(F.col("shard") == i), "g", "v", _HQ_SHIFT)
        for i in range(4)
    ]
    merged = SK.histogram_merge(*shards)
    direct = SK.value_histogram(vals, "g", "v", _HQ_SHIFT)
    qm = SK.histogram_quantiles(merged, _HQ_QS, _HQ_SHIFT).select(
        "g", "q_num", "q_den", F.col("est_lo").alias("est_lo_merged")
    )
    qd = SK.histogram_quantiles(direct, _HQ_QS, _HQ_SHIFT).select(
        "g", "q_num", "q_den", F.col("est_lo").alias("est_lo_direct")
    )
    return qm.join(qd, ["g", "q_num", "q_den"])


@register(
    "sketch_histogram_time_cube",
    oracle=f"""
WITH vals AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
), probe AS (SELECT MIN(m) AS m0 FROM vals),
sel AS (
  SELECT v FROM vals, probe WHERE m >= m0 AND m < m0 + INTERVAL 12 MONTH
), hist AS (
  SELECT v // {_HQ_W} AS bucket, CAST(COUNT(*) AS BIGINT) AS c FROM sel GROUP BY 1
), cum AS (
  SELECT bucket, SUM(c) OVER (ORDER BY bucket) AS cum, SUM(c) OVER () AS n FROM hist
), qs AS ({_SQL_HQ_QS}),
ranked AS (
  SELECT bucket, cum, q_num, q_den,
         GREATEST((q_num * n + q_den - 1) // q_den, 1) AS rank
  FROM cum CROSS JOIN qs
), hit AS (
  SELECT q_num, q_den, CAST(ANY_VALUE(rank) AS BIGINT) AS rank, MIN(bucket) AS bucket
  FROM ranked WHERE cum >= rank GROUP BY 1, 2
), exact AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM sel
), months AS (
  SELECT CAST(COUNT(DISTINCT m) AS BIGINT) AS n_months_merged
  FROM vals, probe WHERE m >= m0 AND m < m0 + INTERVAL 12 MONTH
)
SELECT CAST(h.q_num AS INT) AS q_num, CAST(h.q_den AS INT) AS q_den, h.rank,
       CAST(h.bucket * {_HQ_W} AS BIGINT) AS est_lo,
       CAST(e.v AS BIGINT) AS exact_cents,
       e.v BETWEEN h.bucket * {_HQ_W} AND h.bucket * {_HQ_W} + {_HQ_W - 1}
         AS within_bound,
       months.n_months_merged
FROM hit h JOIN exact e ON e.rn = h.rank CROSS JOIN months
""",
    tags=("ext", "sketch", "quantile", "cube"),
)
def sketch_histogram_time_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-queryable quantile cube (the quantile twin of
    `sketch_hll_time_cube`): per-MONTH histogram cells are the stored
    layer, and an arbitrary date-range quantile is answered by ADDING the
    covered months' cells — never rescanning orders. Probed on the first
    12 months at p50/p90/p99; each estimate's bucket must bracket the
    exact rank value. Plain per-month percentiles cannot be combined into
    a range percentile — mergeable cells are the only way, which is the
    entire point of the sketch."""
    from pyspark.sql import Window as W

    vals = t(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    m0 = vals.agg(F.min("m")).collect()[0][0]
    hi = m0.replace(year=m0.year + 1)  # + 12 months (m0 is a month boundary)
    sel = vals.where((F.col("m") >= F.lit(m0)) & (F.col("m") < F.lit(hi)))
    month_hists = SK.value_histogram(
        sel.select(F.col("m").alias("g"), "v"), "g", "v", _HQ_SHIFT
    )
    merged = SK.histogram_merge(
        month_hists.select(F.lit("range").alias("g"), "bucket", "c")
    )
    quants = SK.histogram_quantiles(merged, _HQ_QS, _HQ_SHIFT)
    exact = sel.select(
        "v", F.row_number().over(W.orderBy("v")).cast("bigint").alias("rn")
    )
    months = sel.select("m").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months_merged")
    )
    return (
        quants.join(exact, quants["rank"] == exact["rn"])
        .crossJoin(F.broadcast(months))
        .select(
            "q_num",
            "q_den",
            "rank",
            "est_lo",
            F.col("v").cast("bigint").alias("exact_cents"),
            F.col("v").between(
                F.col("est_lo"), F.col("est_lo") + F.lit(_HQ_W - 1)
            ).alias("within_bound"),
            "n_months_merged",
        )
    )


@register(
    "sketch_hll_sliding_distinct",
    oracle="""
WITH bounds AS (SELECT date_trunc('day', MIN(ts)) AS d0 FROM events),
days AS (
  SELECT unnest(generate_series(d0, d0 + INTERVAL 29 DAY, INTERVAL 1 DAY)) AS day
  FROM bounds
), keys AS (
  SELECT date_trunc('day', ts) AS d, CAST(user_id AS VARCHAR) AS k FROM events
  GROUP BY 1, 2
), win AS (
  SELECT days.day, keys.k FROM days JOIN keys
    ON keys.d BETWEEN days.day - INTERVAL 6 DAY AND days.day
  GROUP BY 1, 2
), regs AS (
  SELECT day, CAST(md5_number_lower(k || ':hllb') % 256 AS BIGINT) AS j,
         CAST(MAX(CASE WHEN v = 0 THEN 32 ELSE 32 - length(bin(v)) END) AS BIGINT) AS r
  FROM (SELECT day, k, CAST(md5_number_lower(k || ':hllr') % 2147483648 AS BIGINT) AS v FROM win)
  GROUP BY 1, 2
), est AS (
  SELECT day,
         CAST(4043669515425284096 AS BIGINT)
           // (10000 * (sp + (256 - np) * (CAST(1 AS BIGINT) << 33))) AS hll_est,
         CAST(256 - np AS BIGINT) AS n_zero_registers
  FROM (SELECT day, CAST(COUNT(*) AS BIGINT) AS np,
               CAST(SUM(CAST(1 AS BIGINT) << (33 - r)) AS BIGINT) AS sp
        FROM regs GROUP BY 1)
), exact AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM win GROUP BY 1
)
SELECT e.day, est.hll_est, est.n_zero_registers, e.exact_distinct
FROM est JOIN exact e USING (day)
""",
    tags=("ext", "sketch", "hll", "sliding"),
)
def sketch_hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window distinct counts from stored per-day HLL registers —
    the third 'impossible with plain counts' OLAP shape the HLL family
    closes (union-merge across sets, time-cube over ranges, and now
    SLIDING windows): for each of the first 30 days, the 7-day-trailing
    distinct-user count comes from max-merging that window's 7 daily
    register tables — per-day distinct counts can never produce this, and
    rescanning events per window would cost 7× the corpus. Probed against
    the exact per-window distinct; the oracle rebuilds each window's
    registers from its raw keys, which by merge-losslessness must equal
    the merged daily registers bit-for-bit. At 100 TB the daily register
    tables are the stored layer (256 ints/day) and every trailing-window
    dashboard series is a cells-only merge."""
    ev = t(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    )
    d0 = ev.agg(F.min("d")).collect()[0][0]
    import datetime as dt

    lo, hi = d0, d0 + dt.timedelta(days=30)
    day_regs = SK.hll_registers(
        ev.where((F.col("d") >= F.lit(lo)) & (F.col("d") < F.lit(hi))),
        key_col="user_id",
        group_col="d",
    )
    days = spark.range(30).select(
        F.expr(f"timestamp'{d0}' + make_interval(0, 0, 0, CAST(id AS INT))").alias("day")
    )
    cov = days.select(
        "day",
        F.explode(
            F.expr("sequence(0, 6)")
        ).alias("off"),
    ).select("day", F.expr("day - make_interval(0, 0, 0, off)").alias("g"))
    merged = (
        F.broadcast(cov)
        .join(day_regs, "g")
        .groupBy("day", "j")
        .agg(F.max("r").cast("bigint").alias("r"))
        .select(F.col("day").alias("g"), "j", "r")
    )
    est = SK.hll_estimate(merged).select(
        F.col("g").alias("day"), "hll_est", "n_zero_registers"
    )
    exact = (
        F.broadcast(days)
        .join(
            ev.where((F.col("d") >= F.lit(lo)) & (F.col("d") < F.lit(hi))),
            (F.col("d") >= F.expr("day - make_interval(0, 0, 0, 6)"))
            & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_distinct"))
    )
    return est.join(exact, "day")
