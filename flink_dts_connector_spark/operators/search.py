"""Corpus keyword search: BM25 ranking over an inverted index
(SURVEY.md §2.7 — EXT surface; the reference engine has no text search).

Spark-first shape: the inverted index IS a DataFrame — ``(token, doc_id,
tf)`` from one explode + hash agg — and retrieval is an equi-join of a
tiny broadcast query-term table against it, then a per-query top-k
window. Nothing is all-pairs: cost is Σ_q df(term) postings, exactly an
inverted index probe. At 100 TB the postings table is materialized once
(bucketed by token) and each query batch is a broadcast join against it.

Determinism / oracle-exactness: classic BM25's ln-idf is transcendental,
and the two engines' libm may differ in the last ulp — so this uses a
rational idf,  idf6 = ⌊(N − df)·10⁶ / N⌋  (integer division), and folds
k1 = 1.2, b = 0.75 into one integer-coefficient rational per (term, doc):

    score_term = idf6 · tfc · 22 · A  /  (10·tfc·A + 3·A + 9·dl·10³)

where A = ⌊SD·10³ / N⌋ (average document length quantized to 3 decimal
digits, N = corpus doc count, SD = Σ lengths) and tfc = min(tf, 1000)
— the standard BM25 tf saturation cap (at tf = 1000 the tf factor is
within 0.1% of its k1-asymptote, so the cap is semantically inert; it
exists to bound arithmetic). Overflow analysis at ANY corpus size:
idf6 ≤ 10⁶, tfc ≤ 10³, A ≤ 10³·avgdl — the numerator stays inside
int64 for avgdl up to ~4·10⁵ tokens, far past any text corpus's
AVERAGE document length, and the denominator is bounded by
10⁷·A + 9·10³·dl (dl ≤ 10¹⁵ before it matters). An earlier draft
multiplied by SD itself, which is ~10¹³ at 100 TB and overflows at
tf = 1 — the quantized-avgdl form is what makes the formula
scale-safe. The per-term double division is one IEEE op (bit-identical
across engines); per-(query, doc) totals sum ⌊score·10⁶⌋ as BIGINTs so
the sum is order-insensitive. Same trick as `similarity.cosine_pairs`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_dts_connector_spark.operators.text import STOPWORDS, tokens

#: rational BM25 coefficients for k1=1.2, b=0.75, scaled by 10:
#: tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
#:   = 22·tf·A / (10·tf·A + 3·A + 9·dl·10³)   with A = ⌊SD·10³/N⌋
_NUM_C, _DEN_TF, _DEN_CONST, _DEN_DL = 22, 10, 3, 9
#: tf saturation cap (see module docstring: semantically inert, bounds int64)
_TF_CAP = 1000


def postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", spread: bool = True
) -> DataFrame:
    """Inverted-index postings ``(token, doc_id, tf, dl)`` — one explode +
    one hash agg keyed by (token, doc); dl rides along via first().

    ``spread`` is the same single-row-group guard as text's `add_ngrams`
    (r13): the fixture tables are one-row-group parquet, so without it the
    tokenize+explode — the index build's heavy stage — runs on ONE scan
    task; hash-repartitioning the compact (id, text) rows to the session's
    parallelism first costs one tiny shuffle and parallelizes the explode.
    A well-split input at scale keeps ``spread=False`` semantics anyway
    (the repartition is a no-op cost-wise next to the explode)."""
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
    if spread:
        narrow = narrow.repartition(
            narrow.sparkSession.sparkContext.defaultParallelism, "doc_id"
        )
    toks = tokens("__text")
    ex = narrow.select(
        F.col("doc_id"),
        F.size(toks).cast("bigint").alias("dl"),
        F.explode(toks).alias("token"),
    )
    return ex.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )


def top_query_terms(
    post: DataFrame, n_terms: int = 8, terms_per_query: int = 2, min_len: int = 4
) -> DataFrame:
    """Deterministic query workload derived from the corpus itself: the
    ``n_terms`` highest-df tokens (length ≥ ``min_len``, stopwords
    excluded; token ASC tiebreak), grouped ``terms_per_query`` at a time
    into multi-term queries ``query_id = (rank−1) div terms_per_query``."""
    df_tbl = (
        post.where(
            (F.length("token") >= min_len) & (~F.col("token").isin(*STOPWORDS))
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    # top-n via sort+limit (TakeOrderedAndProject: per-partition partial
    # top-n, no vocab-wide single-partition window), then rank the n
    # survivors with a window over that tiny frame only
    top = df_tbl.orderBy(F.desc("df"), F.asc("token")).limit(n_terms)
    w = Window.orderBy(F.desc("df"), F.asc("token"))
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select(
            F.expr(f"cast((rnk - 1) div {int(terms_per_query)} as bigint)").alias(
                "query_id"
            ),
            "token",
            "df",
        )
    )


def bm25_topk(
    df: DataFrame,
    k: int = 10,
    n_terms: int = 8,
    terms_per_query: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per derived query by integer-exact BM25.

    Returns (query_id, doc_id, score6, score, rank): ``score6`` is the
    order-insensitive BIGINT sum of per-term ⌊score·10⁶⌋, ``score`` its
    one-division double rendering. The window sorts only per-query
    candidate sets (bounded by Σ df), never the corpus."""
    # postings has three consumers below (df table, query terms, hit join);
    # the plan re-derives it per consumer. Measured A/B at sf0.1: eager
    # materialization (localCheckpoint) is a wash locally (3.3s vs 3.1s) —
    # kept declarative so Catalyst/AQE see the whole plan. At 100 TB the
    # inverted index is persisted ONCE as a bucketed table (module
    # docstring) and this recomputation disappears entirely.
    post = postings(df, id_col, text_col)
    stats = df.select(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(tokens(text_col)).cast("bigint")).alias("sum_dl"),
    )
    return bm25_topk_from_index(
        post, stats, k=k, n_terms=n_terms, terms_per_query=terms_per_query
    )


def bm25_topk_from_index(
    post: DataFrame,
    stats: DataFrame,
    k: int = 10,
    n_terms: int = 8,
    terms_per_query: int = 2,
) -> DataFrame:
    """Serve the BM25 ranking from a MATERIALIZED inverted index
    (``post`` = (token, doc_id, tf, dl) rows) and corpus stats
    (one (n_docs, sum_dl) row) — the maintenance twin's serving path;
    `bm25_topk` builds both from raw docs and delegates here, so the
    streamed index provably scores through the identical plan."""
    qterms = top_query_terms(post, n_terms=n_terms, terms_per_query=terms_per_query)
    hits = post.join(F.broadcast(qterms), "token").crossJoin(F.broadcast(stats))
    idf6 = F.expr("((n_docs - df) * 1000000) div n_docs")
    avgdl3 = F.expr("(sum_dl * 1000) div n_docs")
    tfc = F.least(F.col("tf"), F.lit(_TF_CAP))
    num = idf6 * tfc * F.lit(_NUM_C) * avgdl3
    den = (
        F.lit(_DEN_TF) * tfc * avgdl3
        + F.lit(_DEN_CONST) * avgdl3
        + F.lit(_DEN_DL) * F.col("dl") * F.lit(1000)
    )
    term6 = F.floor(num.cast("double") / den.cast("double") * F.lit(1000000.0))
    scored = (
        hits.select("query_id", "doc_id", term6.alias("t6"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("t6").alias("score6"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score6"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "score6",
            (F.col("score6").cast("double") / F.lit(1000000.0)).alias("score"),
            "rank",
        )
    )


def rrf_topk(
    df: DataFrame,
    k: int = 10,
    pool: int = 20,
    rrf_k: int = 60,
    n_terms: int = 8,
    terms_per_query: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Reciprocal-rank fusion of two retrievers (r10) — the standard
    hybrid-search combiner (Cormack/Clarke/Büttcher RRF; what OpenSearch/
    Vespa/Azure "hybrid" modes run): fuse each retriever's top-``pool``
    by summing 1/(rrf_k + rank), take the fused top-``k``.

    Retriever A is the integer-exact BM25 above; retriever B is a
    tf-mass ranking over the same derived queries (Σ min(tf, cap) of the
    query's terms — idf-free, so its ordering genuinely differs). The
    fusion term is computed as ``1000000 div (rrf_k + rank)`` — integer
    division, bit-identical in both engines — and a document appearing in
    only one pool contributes that one term (RRF over the union, the
    standard form). Ranks and the final order break ties by doc_id, so
    every step is deterministic.

    Scale: both retrievers are postings-bounded (Σ df of the query terms,
    never corpus×queries); fusion touches 2·pool rows per query. At
    100 TB the inverted index is a persisted bucketed table and the two
    rankers share one postings scan."""
    a = bm25_topk(df, k=pool, n_terms=n_terms, terms_per_query=terms_per_query,
                  id_col=id_col, text_col=text_col)
    post = postings(df, id_col, text_col)
    qterms = top_query_terms(post, n_terms=n_terms, terms_per_query=terms_per_query)
    mass = (
        post.join(F.broadcast(qterms.select("query_id", "token")), "token")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.least(F.col("tf"), F.lit(_TF_CAP))).alias("mass"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("mass"), F.asc("doc_id"))
    b = (
        mass.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= pool)
    )
    contrib = lambda rank: F.expr(f"1000000 div ({rrf_k} + {rank})")  # noqa: E731
    pooled = a.select(
        "query_id", "doc_id", contrib("rank").alias("c")
    ).unionAll(b.select("query_id", "doc_id", contrib("rank").alias("c")))
    fused = pooled.groupBy("query_id", "doc_id").agg(
        F.sum("c").cast("bigint").alias("rrf6")
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf6"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf6", "rank")
    )


# ---------------------------------------------------------------------------
# Substring search via a positional-trigram inverted index (r10 continuation).
# The LIKE-'%pattern%' problem at 100 TB: a raw contains() scan reads the
# whole corpus per query batch. The standard index (pg_trgm, Lucene regex/
# wildcard, Zoekt) is an inverted index over character TRIGRAMS: a document
# matches a pattern only if it contains EVERY trigram of the pattern, so the
# index join yields a complete (no-false-negative) candidate set and one
# verification pass makes it exact. Scale levers, both implemented here:
#   * candidate completeness holds for ANY subset of the pattern's trigrams
#     — probing only the K RAREST (by corpus document frequency, ties by
#     trigram text so the choice is deterministic) caps the postings join
#     volume at Σ_q K·df(rare trigram), the same rarest-first discipline as
#     `dedup.prefix_filter_pairs`;
#   * the trigram is the shuffle key (postings join), the pattern set is
#     tiny and broadcasts, and verification joins the small candidate frame
#     back to the corpus on doc_id — no scan of non-candidate text.
# ---------------------------------------------------------------------------


def trigram_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", spread: bool = True
) -> DataFrame:
    """(trigram, doc_id) inverted index — each document's DISTINCT character
    trigrams via one JVM-side transform + explode (no Python).

    ``spread``: single-row-group guard (see `postings`) — the per-doc
    transform+array_distinct+explode is the build's heavy stage and must
    not be serialized onto one scan task."""
    # CASE-gated: Spark's sequence(1, 0) is DESCENDING [1, 0], so an
    # ungated expression would emit bogus sub-3-char postings for short
    # docs (ADVICE r10). Sub-trigram docs contribute no postings, matching
    # the DuckDB oracle's empty generate_series.
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
    if spread:
        narrow = narrow.repartition(
            narrow.sparkSession.sparkContext.defaultParallelism, "doc_id"
        )
    tri = F.expr(_trigram_set_sql("__text"))
    return narrow.select(F.col("doc_id"), F.explode(tri).alias("tri"))


def _trigram_set_sql(col: str) -> str:
    """SQL for the distinct-trigram array of ``col``; empty array (not
    [whole-string] or ['']) when length < 3."""
    return (
        f"CASE WHEN length({col}) >= 3 THEN "
        f"array_distinct(transform(sequence(1, length({col}) - 2),"
        f" i -> substring({col}, i, 3))) "
        f"ELSE array() END"
    )


def trigram_substring_search(
    docs: DataFrame,
    patterns: DataFrame,
    k_rarest: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern_col: str = "pattern",
) -> DataFrame:
    """Exact substring search for a batch of patterns: rarest-``k_rarest``
    trigram index probe (complete candidate set) + contains() verification.
    Returns per pattern: n_candidates (index survivors — the measured
    selectivity of the blocking scheme), n_matches (verified), and
    min_match_doc. Hash-equality with the brute-force contains() oracle
    proves the probe loses no matches."""
    dtri = trigram_postings(docs, id_col, text_col)
    texts = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    return trigram_search_from_index(dtri, texts, patterns, k_rarest, pattern_col)


def trigram_search_from_index(
    dtri: DataFrame,
    texts: DataFrame,
    patterns: DataFrame,
    k_rarest: int = 3,
    pattern_col: str = "pattern",
) -> DataFrame:
    """Serve the substring search from a MATERIALIZED trigram index
    (``dtri`` = (tri, doc_id) rows) and text store (``texts`` =
    (doc_id, _text)) — the maintenance twin's serving path;
    `trigram_substring_search` builds both from raw docs and delegates
    here, so the streamed index probes through the identical plan."""
    dfreq = dtri.groupBy("tri").agg(F.count(F.lit(1)).alias("df"))

    ptri = patterns.select(
        F.col(pattern_col).alias("pattern"),
        F.explode(F.expr(_trigram_set_sql(pattern_col))).alias("tri"),
    )
    w = Window.partitionBy("pattern").orderBy(F.col("df").asc(), F.col("tri").asc())
    ranked = (
        ptri.join(dfreq, "tri", "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n_tri", F.count(F.lit(1)).over(Window.partitionBy("pattern")))
    )
    probe = ranked.where(F.col("rk") <= k_rarest).select(
        "pattern", "tri", F.least(F.col("n_tri"), F.lit(k_rarest)).alias("need")
    )
    cand = (
        probe.join(dtri, "tri")
        .groupBy("pattern", "doc_id")
        .agg(F.count(F.lit(1)).alias("hit"), F.min("need").alias("need"))
        .where(F.col("hit") == F.col("need"))
        .select("pattern", "doc_id")
    )
    ver = cand.join(texts, "doc_id").withColumn(
        "m", F.expr("instr(_text, pattern) > 0")
    )
    return ver.groupBy("pattern").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum(F.when(F.col("m"), 1).otherwise(0)).cast("bigint").alias("n_matches"),
        F.min(F.when(F.col("m"), F.col("doc_id"))).cast("bigint").alias("min_match_doc"),
    )
