"""Multimodal column plumbing (SURVEY.md §2.7): image/audio/video as opaque
BINARY columns + typed metadata structs, with decode/feature-extract/resize/
frame-sample as Arrow-batched Pandas UDF stages.

The container has no image/audio libraries, so the actual media decode is
STUBBED: `decode_media` raises NotImplementedError for real codecs and
offers a deterministic fake decoder so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested end-to-end
(that plumbing, not the pixel math, is what this engine owns at 100 TB).

Scale notes: media bytes never leave the executor that read them (mapInPandas
per-partition); metadata-only operations (frame sampling plans, filters)
work on the struct column without touching the payload — the same
header/payload laziness idea as the CDC decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUPPORTED_FAKE_CODEC = "fake"

#: metadata struct carried next to every media payload
MEDIA_META_FIELDS = "codec string, n_bytes bigint, width int, height int, duration_ms bigint"


def attach_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize an opaque media column from text (deterministic fake
    payload) + its metadata struct. In production this is the parquet/blob
    reader's output; here it feeds the plumbing tests."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n = F.octet_length(payload).cast("bigint")
    return df.select(
        F.col(id_col),
        payload.alias("media"),
        F.struct(
            F.lit(SUPPORTED_FAKE_CODEC).alias("codec"),
            n.alias("n_bytes"),
            (n % 640).cast("int").alias("width"),
            (n % 480).cast("int").alias("height"),
            (n * 40).alias("duration_ms"),  # fake: 25 fps, 1 byte/frame
        ).alias("meta"),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Metadata-only frame sampling: one row per sampled frame timestamp —
    never touches the payload column (laziness contract). Pure built-ins:
    sequence + explode."""
    return df.select(
        "doc_id",
        F.col("meta.duration_ms").alias("duration_ms"),
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
    )


def resize_plan(df: DataFrame, max_w: int, max_h: int) -> DataFrame:
    """Metadata-only aspect-preserving resize computation: fit each image
    inside (max_w × max_h), never upscale — all INTEGER arithmetic (binding
    dimension chosen by cross-multiplication, output via integer division)
    so the plan is bit-identical in any engine. The pixel work itself is
    the stubbed decode stage; this is the planning half a 100 TB pipeline
    runs first to budget decode cost. Zero/null dimensions pass through
    unscaled (degenerate metadata is a data-quality signal, not a crash)."""
    w = F.col("meta.width").cast("bigint")
    h = F.col("meta.height").cast("bigint")
    fits = (w <= max_w) & (h <= max_h)
    width_binding = (w * max_h) >= (h * max_w)
    out_w = (
        F.when((w <= 0) | (h <= 0) | fits, w)
        .when(width_binding, F.lit(max_w).cast("bigint"))
        .otherwise(F.expr(f"(CAST(meta.width AS BIGINT) * {int(max_h)}) div CAST(meta.height AS BIGINT)"))
    )
    out_h = (
        F.when((w <= 0) | (h <= 0) | fits, h)
        .when(width_binding, F.expr(f"(CAST(meta.height AS BIGINT) * {int(max_w)}) div CAST(meta.width AS BIGINT)"))
        .otherwise(F.lit(max_h).cast("bigint"))
    )
    return df.select(
        "doc_id",
        w.alias("width"),
        h.alias("height"),
        out_w.alias("out_width"),
        out_h.alias("out_height"),
        (~fits & (w > 0) & (h > 0)).alias("scaled"),
    )


def decode_media(df: DataFrame, media_col: str = "media", meta_col: str = "meta") -> DataFrame:
    """Decode media payloads → fixed-size feature rows (Arrow-batched).

    Real codecs (jpeg/png/wav/mp4…) are unavailable in this image — they
    raise NotImplementedError by contract; the 'fake' codec decodes
    deterministically (byte histogram moments) so the full mapInPandas
    path is exercised. Output: doc_id, n_bytes, byte_sum, byte_mean.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codecs = pdf[meta_col].map(lambda m: m["codec"])
            bad = codecs[codecs != SUPPORTED_FAKE_CODEC]
            if len(bad):
                raise NotImplementedError(
                    f"media codec(s) {sorted(set(bad))} need external decoders "
                    "(not available in this environment); only the deterministic "
                    f"'{SUPPORTED_FAKE_CODEC}' codec is supported here"
                )
            raw = pdf[media_col]
            n_bytes = raw.map(len).astype("int64")
            byte_sum = raw.map(lambda b: sum(b)).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    "byte_sum": byte_sum,
                    "byte_mean": byte_sum / n_bytes,
                }
            )

    return df.mapInPandas(fn, schema="doc_id bigint, n_bytes bigint, byte_sum bigint, byte_mean double")


def stripe_phash(payload_text: Column, n_stripes: int = 48) -> Column:
    """Blockwise perceptual-hash analog over an opaque payload: split the
    byte stream into ``n_stripes`` equal stripes, bit s = parity of stripe
    s's byte sum — a LOCALITY signature (a small local edit flips at most
    the stripes it touches), unlike an avalanche digest. 48 bits keeps the
    signature in friendly int64 territory (3 x 16-bit bands for the
    near-dup band join). Pure column expressions; the DuckDB oracle
    mirrors it with ord()-sums over the same slices (payloads here are
    ASCII, so byte == codepoint)."""
    L = F.length(payload_text)
    bits = []
    for s in range(n_stripes):
        a = (F.lit(s) * L / n_stripes).cast("bigint") + 1
        b = (F.lit(s + 1) * L / n_stripes).cast("bigint")
        sl = F.substring(payload_text, a, (b - a + 1).cast("int"))
        # int division semantics: a,b via floor((s*L) div n)
        stripe_sum = F.aggregate(
            F.split(sl, ""), F.lit(0).cast("bigint"), lambda acc, c: acc + F.ascii(c)
        )
        bits.append((stripe_sum % 2) * F.lit(1 << s).cast("bigint"))
    out = bits[0]
    for bcol in bits[1:]:
        out = out + bcol
    return out


def phash_neardup_pairs(
    media: DataFrame,
    max_distance: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate payload pairs by stripe-phash: 3 x 16-bit band join
    bounds the candidate set (any equal band), then exact popcount verify
    (hamming <= max_distance). Same scale envelope as SimHash: the
    quadratic term is bounded by the band key; the corpus never
    broadcasts."""
    sig = media.select(
        F.col(id_col).alias("id"), stripe_phash(F.col(text_col)).alias("sig")
    )
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", 16 * b).bitwiseAND(F.lit(65535)).alias("key"),
                    )
                    for b in range(3)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.sig").alias("sa"),
            F.col("b.sig").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.expr("sa ^ sb")).cast("bigint")
        )
        .where(F.col("hamming") <= max_distance)
        .select("a_id", "b_id", "hamming")
    )
