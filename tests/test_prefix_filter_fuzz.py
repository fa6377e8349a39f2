"""Property test: prefix-filtered set-similarity join is EXACT-recall on
arbitrary corpora, not just the fixtures — hypothesis generates small
random corpora, a pure-Python reference computes the exact 3-gram-Jaccard
pair set, and BOTH `jaccard_pairs` and `prefix_filter_pairs` must emit it
identically (the prefix lemma in `prefix_filter_pairs`' docstring, tested
adversarially: repeated tokens, near-duplicate docs, sub-shingle-length
docs, single-shingle docs)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_dts_connector_spark.operators import dedup as D

WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]
DOC = st.lists(st.sampled_from(WORDS), min_size=1, max_size=12)
CORPUS = st.lists(DOC, min_size=2, max_size=7)


def _shingles(words: list[str], n: int = 3) -> set[str]:
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _py_pairs(corpus: list[list[str]], t: int) -> set[tuple]:
    sh = {i: _shingles(w) for i, w in enumerate(corpus) if _shingles(w)}
    out = set()
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if 100 * inter >= t * union:
                out.add((a, b, inter, union))
    return out


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=CORPUS, t=st.sampled_from([30, 60, 85]))
def test_prefix_filter_exact_recall_on_random_corpora(spark, corpus, t):
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(corpus)], "doc_id long, text string"
    )
    want = _py_pairs(corpus, t)
    got_exact = {
        (r["a_id"], r["b_id"], r["n_inter"], r["n_union"])
        for r in D.jaccard_pairs(df, threshold_pct=t).collect()
    }
    got_prefix = {
        (r["a_id"], r["b_id"], r["n_inter"], r["n_union"])
        for r in D.prefix_filter_pairs(df, threshold_pct=t).collect()
    }
    assert got_exact == want
    assert got_prefix == want
