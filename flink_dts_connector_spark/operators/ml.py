"""In-engine model training + inference (SURVEY.md §2.7 EXT surface —
the "quality classifier" stage every training-data pipeline runs between
heuristic filters and expensive dedup; fasttext-style in role, re-expressed
as exact-arithmetic Spark aggregations so the DuckDB oracle hash-matches).

Two classifiers:
- multinomial Naive Bayes over tokens (train AND infer in one declarative
  plan) with the log-likelihood reformulated as exact integer surprisal
  (`ilog2`, same convention as `text.unigram_surprisal`) — no
  transcendental float whose last ulp could diverge across engines;
- k-NN majority vote over the embedding table (leave-one-out on a
  deterministic probe subset), reusing the quantized-cosine scorer.

Scale design:
- NB "model" = the (class, token) count table: one hash agg with map-side
  combine over the exploded corpus. Inference joins doc-token counts with
  the model ON THE TOKEN — co-located shuffle equi-join (a web-scale vocab
  does NOT broadcast); the per-class frame (totals, priors) is a handful
  of rows and broadcasts. The doc x class x token cube is never
  materialized: missing (token, class) pairs contribute the class default
  surprisal, so score = prior + default*n_tokens + sum(present deltas) —
  only PRESENT pairs are scored.
- kNN probes are broadcast against the item table; items never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_dts_connector_spark.operators.similarity import brute_force_topk
from flink_dts_connector_spark.operators.text import ilog2, tokens


def nb_confusion(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    class_col: str = "source",
) -> DataFrame:
    """Train a multinomial NB classifier on (text -> class) over the whole
    frame, resubstitute it, and return the confusion matrix
    ``(actual, predicted, n_docs)``.

    Scoring (all BIGINT): a doc's surprisal under class c is
        prior_c + sum_t dc_t * ilog2((T_c + V) div (cnt_{t,c} + 1))
    with Laplace +1 smoothing, V = |vocab|, T_c = class token mass,
    prior_c = ilog2(D div D_c). Lowest total surprisal wins; ties break to
    the lexicographically smallest class name (min over argmin set)."""
    # r13 single-row-group guard (same as text's add_ngrams): spread the
    # compact (id, class, text) rows across cores BEFORE the explode — the
    # tokenize+explode below is evaluated by BOTH the per-doc and the
    # per-class aggregation branches, and on a one-row-group fixture scan
    # it would otherwise run twice on one core.
    narrow = docs.select(
        F.col(id_col), F.col(class_col).alias("_cls"), F.col(text_col).alias("__text")
    )
    narrow = narrow.repartition(
        narrow.sparkSession.sparkContext.defaultParallelism, id_col
    )
    toks = narrow.select(
        F.col(id_col), F.col("_cls"), F.explode(tokens("__text")).alias("w")
    )
    dt = toks.groupBy(id_col, "w").agg(F.count(F.lit(1)).cast("bigint").alias("dc"))
    cnt = toks.groupBy("_cls", "w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tc = cnt.groupBy("_cls").agg(F.sum("c").cast("bigint").alias("tc"))
    vocab_n = dt.select("w").distinct().agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    dcls = docs.groupBy(F.col(class_col).alias("_cls")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d_c")
    )
    dtot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    classes = (
        tc.join(dcls, "_cls")
        .crossJoin(F.broadcast(vocab_n))
        .crossJoin(F.broadcast(dtot))
        .select(
            "_cls",
            "tc",
            "v",
            ilog2(F.expr("d div d_c")).alias("prior"),
            ilog2(F.col("tc") + F.col("v")).alias("dflt"),
        )
    )
    # per-(token, class) surprisal DELTA vs the class default — only tokens
    # the class has seen appear here, so the frame is model-sized
    model = cnt.join(F.broadcast(classes), "_cls").select(
        "_cls",
        "w",
        (ilog2(F.expr("(tc + v) div (c + 1)")) - F.col("dflt")).alias("delta"),
    )
    adj = (
        dt.join(model, "w")
        .groupBy(id_col, "_cls")
        .agg(F.sum(F.col("dc") * F.col("delta")).cast("bigint").alias("adj"))
    )
    ntok = dt.groupBy(id_col).agg(F.sum("dc").cast("bigint").alias("n_tok"))
    base = docs.select(F.col(id_col), F.col(class_col).alias("actual")).join(ntok, id_col, "left")
    scores = (
        base.crossJoin(F.broadcast(classes.select("_cls", "prior", "dflt")))
        .join(adj, [id_col, "_cls"], "left")
        .select(
            id_col,
            "actual",
            F.col("_cls"),
            (
                F.col("prior")
                + F.col("dflt") * F.coalesce(F.col("n_tok"), F.lit(0))
                + F.coalesce(F.col("adj"), F.lit(0))
            ).alias("score"),
        )
    )
    best = scores.groupBy(id_col).agg(F.min("score").alias("m"))
    pred = (
        scores.join(best, id_col)
        .where(F.col("score") == F.col("m"))
        .groupBy(id_col, "actual")
        .agg(F.min("_cls").alias("predicted"))
    )
    return (
        pred.groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def knn_label_confusion(
    emb: DataFrame,
    k: int = 5,
    probe_mod: int = 20,
    probe_max: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Leave-one-out k-NN classification on a deterministic probe subset
    (``vec_id % probe_mod == 0``, optionally capped at ``id < probe_max``
    — the evaluation sample): each probe's label is the majority label of
    its k nearest OTHER vectors by exact quantized cosine, ties to the
    smallest label. Returns the confusion matrix
    ``(actual_label, predicted_label, n_vecs)``.

    Scale contract (r11 sf1 bench): with an UNCAPPED probe set the total
    work is probes × corpus ∝ N² — the bench measured ×74 raw on a ×10
    data step. ``probe_max`` pins the audit to a FIXED statistical sample
    (the TPC convention: the workload doesn't grow with the data), making
    the scan linear in corpus; per-probe cost is one broadcast pass
    either way. The probe set is broadcast against the item table (items
    never shuffle); per-probe vote aggregation is k rows each."""
    cond = F.col(id_col) % probe_mod == 0
    if probe_max is not None:
        cond = cond & (F.col(id_col) < probe_max)
    probes = emb.where(cond).select(
        F.col(id_col).alias("query_id"), F.col(emb_col), F.col(label_col).alias("actual_label")
    )
    nn = brute_force_topk(
        emb.select(id_col, emb_col, label_col),
        probes.select("query_id", emb_col),
        k=k,
        id_col=id_col,
        emb_col=emb_col,
    )
    votes = (
        nn.join(emb.select(F.col(id_col), F.col(label_col)), id_col)
        .groupBy("query_id", label_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_votes"))
    )
    best = votes.groupBy("query_id").agg(F.max("n_votes").alias("mx"))
    pred = (
        votes.join(best, "query_id")
        .where(F.col("n_votes") == F.col("mx"))
        .groupBy("query_id")
        .agg(F.min(label_col).alias("predicted_label"))
    )
    return (
        pred.join(probes.select("query_id", "actual_label"), "query_id")
        .groupBy("actual_label", "predicted_label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    )


#: BPE symbol separator (unit separator control char — cannot appear in the
#: [a-z]+ training vocabulary, so regex patterns built from symbols are safe)
BPE_SEP = "\x1f"
BPE_SEP2 = BPE_SEP * 2


def bpe_train_merges(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """The merge table alone — see `bpe_train`."""
    merges, _ = bpe_train(docs, n_merges=n_merges, text_col=text_col)
    return merges


def bpe_train(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Train a byte-pair-encoding merge table IN the engine — the
    tokenizer-training stage of an LLM data pipeline as a declarative
    dataflow, no external trainer. Returns ``(merges, segmentations)``:
    the merge table ``(rank, left_sym, right_sym, merged, support)`` and
    the final word-type segmentation frame ``(w, cnt, rep)`` — the encoded
    vocabulary a downstream tokenize step applies by dictionary lookup.

    Algorithm (classic BPE over word types weighted by frequency): start
    from characters; each round counts adjacent symbol pairs over the
    word-type frame, merges the most frequent pair (ties: lexicographic
    smallest (a, b) — deterministic) everywhere left-to-right, repeat.

    Representation: each word's segmentation is a string of symbols
    wrapped in DOUBLE separators (``␟␟a␟␟b␟␟``); the merge rewrite is one
    regexp_replace whose pattern consumes one separator from each bounding
    pair (``␟a␟␟b␟`` → ``␟ab␟``), which (a) can only match whole symbols
    and (b) keeps consecutive occurrences non-overlapping — exactly the
    greedy left-to-right semantics of reference BPE (pinned against a
    pure-Python implementation in tests). The best pair is a broadcast
    1-row frame whose columns BUILD the regex pattern — the whole loop is
    declarative, no driver-side collect.

    Scale: the iterating frame is the WORD-TYPE table (vocabulary-sized,
    not corpus-sized) with counts attached — the corpus is touched once,
    in the initial explode+groupBy (map-side combine). Per round: one
    vocab-frame pair count + a 1-row argmax + one broadcast rewrite;
    `localCheckpoint` truncates the 8-round lineage."""
    from pyspark.sql import functions as F

    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn(
            "rep", F.concat(F.lit(BPE_SEP2), F.regexp_replace("w", "(.)", "$1" + BPE_SEP2))
        )
        .localCheckpoint()
    )
    merges: DataFrame | None = None
    for r in range(n_merges):
        arr = F.filter(F.split("rep", BPE_SEP2), lambda x: x != F.lit(""))
        pairs = (
            words.select("cnt", arr.alias("arr"))
            .where(F.size("arr") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(slice(arr, 1, size(arr) - 1),"
                        " (x, i) -> struct(x AS a, arr[i + 1] AS b))"
                    )
                ).alias("p"),
            )
        )
        pc = pairs.groupBy("p.a", "p.b").agg(F.sum("cnt").cast("bigint").alias("support"))
        best = pc.orderBy(F.desc("support"), "a", "b").limit(1).localCheckpoint()
        row = best.select(
            F.lit(r + 1).cast("bigint").alias("rank"),
            F.col("a").alias("left_sym"),
            F.col("b").alias("right_sym"),
            F.concat("a", "b").alias("merged"),
            "support",
        )
        merges = row if merges is None else merges.unionByName(row)
        words = (
            words.crossJoin(
                F.broadcast(best.select(F.col("a").alias("_ba"), F.col("b").alias("_bb")))
            )
            .withColumn(
                "rep",
                F.regexp_replace(
                    "rep",
                    F.concat(
                        F.lit(BPE_SEP), F.col("_ba"), F.lit(BPE_SEP2), F.col("_bb"), F.lit(BPE_SEP)
                    ),
                    F.concat(F.lit(BPE_SEP), F.col("_ba"), F.col("_bb"), F.lit(BPE_SEP)),
                ),
            )
            .drop("_ba", "_bb")
            .localCheckpoint()
        )
    assert merges is not None
    return merges, words
