"""Text-analysis operators for large-scale training-data pipelines
(SURVEY.md §2.7 — EXT surface mandated by BASELINE.json; absent from the
reference, which has no text processing).

All hot-path operators are built-in column expressions (split / transform /
filter / md5 / regexp) — JVM-side, codegen'd, zero Python. Each is designed
to be mirrorable in ANSI SQL so the DuckDB oracle can check it exactly:
integer counting + one final double division, never float accumulation.

Scale: every operator is a narrow per-row projection — no shuffle, no state;
at 100 TB they pipeline inside the parquet scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Marker stopwords for ratio/langid heuristics (tiny on purpose: the same
#: list must be inlined in oracle SQL).
STOPWORDS = ("the", "a", "of", "and")

#: language marker words for the n-gram/stopword langid heuristic, checked
#: in a fixed priority order (deterministic tie-break).
LANG_MARKERS = (
    ("de", ("der", "die", "und")),
    ("fr", ("le", "la", "et")),
    ("es", ("el", "los", "y")),
)


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the generator single-spaces its text)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


#: BPE-ish pre-tokenization pattern (GPT-2-style split, simplified to the
#: subset that Java regex and RE2 treat identically — no lookarounds):
#: contractions, letter runs, digit runs, single non-alnum symbols.
BPE_ISH_PATTERN = "'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def bpe_ish_tokens(text: Column | str) -> Column:
    """Subword-ish tokenization by regex (the cheap LLM-token-count proxy:
    splits punctuation and digit runs off words like a BPE pre-tokenizer
    would, without a merges table). Engine-portable: the pattern avoids
    every Java-regex/RE2 divergence, so DuckDB's regexp_extract_all is an
    exact oracle."""
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(text: Column | str) -> Column:
    return F.size(bpe_ish_tokens(text)).cast("bigint")


def kgram_sketch(text: Column | str, k: int = 16, bottom: int = 4) -> Column:
    """Bottom-``bottom`` document sketch over character k-grams: md5 every
    k-char window of the normalized text, keep the lexicographically
    smallest ``bottom`` 8-hex prefixes. A winnowing-style containment
    sketch — two documents sharing long runs of text share small-hash
    k-grams with high probability, so sketch overlap estimates containment
    (the rolling-hash fingerprint family, engine-exact via md5)."""
    norm = normalized(text)
    n = F.length(norm)
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.substring(F.md5(F.encode(F.substring(norm, i, k), "UTF-8")), 1, 8),
    )
    return F.slice(F.array_sort(F.array_distinct(hashes)), 1, bottom)


def normalized(text: Column | str) -> Column:
    """Dedup-normalization: lowercase + whitespace collapse + trim."""
    text = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (The rolling-hash variant is `shingles` + xxhash64 in dedup.py.)"""
    return F.md5(F.encode(normalized(text), "UTF-8"))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingle array — the unit for near-dup Jaccard.

    Documents shorter than n words yield an empty array (sequence(0, neg)
    is empty), matching the SQL oracle's LEAD-based construction."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    arr = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)])
    )
    return F.array_distinct(F.when(F.size(toks) >= n, arr).otherwise(F.array()))


def stopword_count(text: Column | str, words: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("bigint")


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: exact integer counts + one double
    division each (oracle-exact). Mirrors common LLM-corpus filters
    (length, mean token length, stopword ratio, non-alnum ratio)."""
    toks = token_count(text_col)
    chars = F.length(F.col(text_col)).cast("bigint")
    stops = stopword_count(text_col)
    non_alnum = (
        chars - F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9]", ""))
    ).cast("bigint")
    return df.select(
        "doc_id",
        toks.alias("n_tokens"),
        chars.alias("n_chars"),
        stops.alias("n_stopwords"),
        non_alnum.alias("n_non_alnum"),
        (chars.cast("double") / toks).alias("chars_per_token"),
        (stops.cast("double") / toks).alias("stopword_ratio"),
        (non_alnum.cast("double") / chars).alias("non_alnum_ratio"),
    )


def langid_heuristic(text: Column | str) -> Column:
    """Marker-stopword language guess with fixed priority order.

    A real langid model is out of scope (no ML libs in the image); this is
    the deterministic n-gram-heuristic pattern: count marker hits per
    language, first language (in declared order) with ≥2 hits wins, else
    'en'. Expressible identically in SQL for the oracle."""
    toks = tokens(text)
    guess = F.lit("en")
    # build right-to-left so earlier entries take priority
    for lang, markers in reversed(LANG_MARKERS):
        hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
        guess = F.when(hits >= 2, F.lit(lang)).otherwise(guess)
    return guess
