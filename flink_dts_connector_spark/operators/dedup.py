"""Deduplication operators for training-data pipelines (SURVEY.md §2.7).

Four tiers, all DataFrame-first:

  exact          — fingerprint groupBy (one shuffle on the hash, map-side
                   combine; the 100 TB default)
  n-gram Jaccard — exact near-dup: explode distinct shingles, equi-join on
                   the shingle, count co-occurrences → inter/union. Exact
                   but pair-bounded by shared shingles, not |docs|².
  MinHash + LSH  — approximate near-dup at scale: k permutations via
                   affine transforms over one base xxhash64, banded into
                   buckets; candidates = same (band, band-hash) bucket;
                   survivors verified with the exact Jaccard join.
  SimHash        — 64-bit fingerprints whose Hamming distance tracks
                   cosine/token similarity; Pandas-UDF (numpy bit ops) —
                   the documented slow path, used for short-text batches.

Everything except SimHash is pure JVM column expressions. The LSH chain is
the classic shingle→minhash→band→bucket-join pipeline (Broder/MMDS); the
MinHash signature math lives in plain `transform`/`array_min` so Catalyst
sees one narrow projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_dts_connector_spark.operators.text import fingerprint, shingles

# Mersenne prime 2^31-1 for the affine MinHash permutations: h_i = (a_i·h +
# b_i) mod P. 31-bit hash space keeps a·h + b well inside int64 (ANSI mode
# errors on overflow); collision odds ~n_shingles/2^31 are negligible for
# per-document shingle sets. Fixed seeds → reproducible across runs.
_P = (1 << 31) - 1


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group documents by content fingerprint: survivor (min id) + group
    size. `dropDuplicates` parity but keeps the dup-count signal a corpus
    pipeline needs."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content-exact dedup: keep the min-id row per fingerprint.

    Window-free formulation (join back on (fp, min_id)) so the big side
    shuffles once on the fingerprint."""
    keep = exact_dedup_groups(df, id_col, text_col).select(
        "fp", F.col("keep_id").alias(id_col)
    )
    fp_df = df.withColumn("fp", fingerprint(text_col))
    return fp_df.join(keep, ["fp", id_col], "left_semi").drop("fp")


def jaccard_pairs(
    df: DataFrame,
    threshold_pct: int = 30,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (a < b), integer-exact decision:
        |∩| / |∪| ≥ t%  ⟺  100·|∩| ≥ t·(|a|+|b|−|∩|)
    so no float enters the pair selection; the reported ``jaccard`` is one
    deterministic double division."""
    sh = df.select(F.col(id_col).alias("id"), shingles(text_col, n).alias("sh")).withColumn(
        "n_sh", F.size("sh").cast("bigint")
    )
    ex = sh.select("id", "n_sh", F.explode("sh").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first("a.n_sh").alias("n_a"),
            F.first("b.n_sh").alias("n_b"),
        )
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return (
        inter.where(F.lit(100) * F.col("n_inter") >= F.lit(threshold_pct) * union)
        .select(
            "a_id",
            "b_id",
            F.col("n_inter"),
            union.alias("n_union"),
            (F.col("n_inter").cast("double") / union).alias("jaccard"),
        )
    )


def minhash_signature(sh: Column, num_hashes: int = 32, seed: int = 42) -> list[Column]:
    """k MinHash values from one distinct-shingle array: base = xxhash64
    (non-negative), permuted by fixed affine maps mod 2^61−1."""
    base = F.transform(sh, lambda s: F.pmod(F.xxhash64(s, F.lit(seed)), F.lit(_P)))
    sigs = []
    for i in range(num_hashes):
        a = 2 * i + 1  # odd multipliers < 2^7; a·h + b < 2^38 — no overflow
        b = 1000003 * (i + 1)
        sigs.append(
            F.array_min(F.transform(base, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_P)))
        )
    return sigs


def minhash_lsh_candidates(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH candidate pairs: signatures banded (rows = k/bands); a pair is a
    candidate iff some band's row-slice hashes equal. Returns (a_id, b_id)
    distinct. Collision probability ≈ 1−(1−j^rows)^bands (tuned by k/bands).
    """
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"), shingles(text_col, n).alias("sh")
    ).where(F.size("sh") > 0)
    sig = sig.select("id", *[s.alias(f"mh{i}") for i, s in enumerate(minhash_signature(F.col("sh"), num_hashes))])
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)], F.lit(b)).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("id", *band_cols)
    stacked = banded.select(
        "id",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("h")) for b in range(bands)])
        ).alias("bh"),
    ).select("id", "bh.band", "bh.h")
    a, b = stacked.alias("a"), stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    threshold_pct: int = 50,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full MinHash-LSH near-dup: LSH candidates → exact-Jaccard verify.
    Verification joins the shingle sets back only for candidate pairs
    (broadcast-able candidate list at sane thresholds)."""
    cand = minhash_lsh_candidates(df, num_hashes, bands, n, id_col, text_col)
    sh = df.select(F.col(id_col).alias("id"), shingles(text_col, n).alias("sh"))
    pairs = (
        cand.join(sh.withColumnRenamed("id", "a_id").withColumnRenamed("sh", "sh_a"), "a_id")
        .join(sh.withColumnRenamed("id", "b_id").withColumnRenamed("sh", "sh_b"), "b_id")
    )
    n_inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    n_union = F.size(F.array_union("sh_a", "sh_b")).cast("bigint")
    return (
        pairs.select(
            "a_id",
            "b_id",
            n_inter.alias("n_inter"),
            n_union.alias("n_union"),
        )
        .where(F.lit(100) * F.col("n_inter") >= F.lit(threshold_pct) * F.col("n_union"))
        .withColumn("jaccard", F.col("n_inter").cast("double") / F.col("n_union"))
    )


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document (Charikar): sum token-hash bit vectors,
    take signs. Pandas UDF with numpy bit unpacking — the Arrow-batched
    slow path (no per-row Python)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _simhash(tokens):  # tokens: pd.Series of token lists
        out = np.zeros(len(tokens), dtype=np.int64)
        for i, toks in enumerate(tokens):
            if toks is None or len(toks) == 0:
                continue
            # deterministic 64-bit token hashes (FNV-1a, pure python ints)
            acc = np.zeros(64, dtype=np.int64)
            for t in toks:
                h = 0xCBF29CE484222325
                for ch in t.encode("utf-8"):
                    h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
                acc += bits.astype(np.int64) * 2 - 1
            sig = np.packbits((acc >= 0).astype(np.uint8)).tobytes()
            out[i] = int.from_bytes(sig, "big", signed=True)
        return pd.Series(out)

    from flink_dts_connector_spark.operators.text import tokens as _tokens

    return df.select(F.col(id_col), _simhash(_tokens(text_col)).alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHash longs."""
    return F.bit_count(a.bitwiseXOR(b)).cast("int")


def simhash_neardup_pairs(
    df: DataFrame, max_distance: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit prefix bands (4 bands; two
    docs within Hamming≤max_distance share ≥1 identical band w.h.p.), then
    verify the full distance."""
    sig = simhash64(df, id_col, text_col)
    bands = sig.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                )
                for i in range(4)
            ])
        ).alias("bk"),
    ).select("id", "simhash", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("distance"),
        )
        .distinct()
        .where(F.col("distance") <= max_distance)
    )
