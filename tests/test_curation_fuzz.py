"""Property-based checks for the curation/selection primitives: the
two-phase token-budget plan must equal the naive global window on ANY
integer score/token distribution (including adversarial all-one-bucket and
all-distinct-bucket shapes), and the engine-mirrorable md5 hash must equal
DuckDB's md5_number_lower for arbitrary unicode and any modulus.

Driver-style derandomized: hypothesis generates the cases, but each case
runs through the same deterministic operators the registry queries use.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st


@st.composite
def _corpus(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        score = draw(st.integers(min_value=-5, max_value=5))
        toks = draw(st.integers(min_value=0, max_value=50))
        rows.append((i, score, toks))
    pct = draw(st.integers(min_value=0, max_value=100))
    return rows, pct


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_corpus())
# zero-token doc at the tail of an exact-fit bucket: the strict per-doc
# rule (tok_before < budget) must drop doc 1 even though its bucket's
# cumulative total exactly equals the budget.
@example(case=([(0, 0, 10), (1, 0, 0)], 100))
def test_token_budget_matches_naive_python(spark, case):
    """Oracle the two-phase plan against a pure-Python reimplementation of
    the contract: sort by (score DESC, id ASC), keep while the tokens
    strictly before the doc fit floor(total·pct/100)."""
    from flink_dts_connector_spark.operators.curation import token_budget_select

    rows, pct = case
    df = spark.createDataFrame(rows, "doc_id long, score long, n_tokens long")
    got = {
        r["doc_id"]
        for r in token_budget_select(df, pct, "score", "n_tokens").collect()
    }
    total = sum(t for _, _, t in rows)
    budget = (total * pct) // 100
    expect, acc = set(), 0
    for i, s, t in sorted(rows, key=lambda r: (-r[1], r[0])):
        if acc < budget:
            expect.add(i)
        acc += t
    assert got == expect


_MODULI = st.one_of(
    st.integers(min_value=1, max_value=64),
    st.sampled_from([997, 1 << 16, (1 << 31) - 1, 1 << 31]),
)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(st.text(max_size=40), min_size=1, max_size=8, unique=True),
    m=_MODULI,
)
def test_md5_mod_matches_duckdb(spark, texts, m):
    from pyspark.sql import functions as F

    from flink_dts_connector_spark.operators.dedup import md5_number_lower_mod

    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", md5_number_lower_mod(F.col("s"), m).alias("h")).collect()
    }
    con = duckdb.connect()
    try:
        for t in texts:
            exp = con.execute(
                "SELECT md5_number_lower(?) % CAST(? AS HUGEINT)", [t, m]
            ).fetchone()[0]
            assert got[t] == int(exp), (t, m)
    finally:
        con.close()


def test_md5_mod_rejects_oversize_modulus(spark):
    from pyspark.sql import functions as F

    from flink_dts_connector_spark.operators.dedup import md5_number_lower_mod

    with pytest.raises(ValueError):
        md5_number_lower_mod(F.lit("x"), (1 << 31) + 1)


@st.composite
def _chunk_case(draw):
    n_docs = draw(st.integers(min_value=1, max_value=8))
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(min_value=0, max_value=200))
        # tokens are single letters so the text round-trips whitespace split
        toks = [chr(97 + draw(st.integers(0, 25))) for _ in range(n_tok)]
        docs.append((i, " ".join(toks)))
    window = draw(st.integers(min_value=1, max_value=80))
    stride = draw(st.integers(min_value=1, max_value=80))
    return docs, window, stride


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_chunk_case())
@example(case=([(0, "")], 64, 48))  # empty text → [''] token → one chunk
@example(case=([(0, "a b c")], 2, 5))  # stride > window: gap-free NOT required
def test_chunk_windows_matches_naive_python(spark, case):
    """Chunking contract vs a from-scratch Python reimplementation for ANY
    (window, stride): chunk k covers tokens [1+k·stride, 1+k·stride+window)
    over the whitespace token list, starts exist while start ≤ n_tokens,
    md5 is over the space-joined chunk."""
    import hashlib

    from flink_dts_connector_spark.operators.curation import chunk_windows

    docs, window, stride = case
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"], r["start_tok"], r["n_chunk_tokens"], r["chunk_md5"])
        for r in chunk_windows(df, window=window, stride=stride).collect()
    }
    expect = set()
    for did, text in docs:
        # generator single-spaces tokens; "".split(" ") == [""] matches
        # Spark's split-on-\s+ of the empty string (one empty token)
        toks = text.strip().split(" ")
        n = len(toks)
        k = 0
        while 1 + k * stride <= n:
            start = 1 + k * stride
            chunk = toks[start - 1 : start - 1 + window]
            expect.add(
                (
                    did,
                    k,
                    start,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )
            )
            k += 1
    assert got == expect


@st.composite
def _span_corpus(draw):
    vocab = ["a", "b", "c", "d"]
    n_docs = draw(st.integers(min_value=2, max_value=5))
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(min_value=0, max_value=24))
        docs.append((i, " ".join(draw(st.sampled_from(vocab)) for _ in range(n_tok))))
    k = draw(st.integers(min_value=2, max_value=4))
    min_span = draw(st.integers(min_value=k, max_value=k + 4))
    return docs, k, min_span


def _py_shared_spans(docs, k, min_span, max_df):
    """From-scratch reference: positional k-gram match -> diagonal islands."""
    grams = {}  # (doc, pos1based) -> gram
    for d, text in docs:
        toks = text.split()
        for p in range(len(toks) - k + 1):
            grams[(d, p + 1)] = " ".join(toks[p : p + k])
    from collections import Counter, defaultdict

    df_ct = Counter(grams.values())
    matches = defaultdict(list)  # (a,b,diag) -> [pa]
    by_gram = defaultdict(list)
    for (d, p), g in grams.items():
        if df_ct[g] <= max_df:
            by_gram[g].append((d, p))
    for g, occ in by_gram.items():
        for da, pa in occ:
            for db, pb in occ:
                if da < db:
                    matches[(da, db, pb - pa)].append(pa)
    out = set()
    for (da, db, diag), pas in matches.items():
        pas = sorted(set(pas))
        start = prev = pas[0]
        runs = []
        for p in pas[1:]:
            if p == prev + 1:
                prev = p
            else:
                runs.append((start, prev))
                start = prev = p
        runs.append((start, prev))
        for s, e in runs:
            span = e - s + k
            if span >= min_span:
                out.add((da, db, s, s + diag, span))
    return out


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_span_corpus())
def test_shared_spans_match_pure_python(case, spark):
    """`dedup.shared_spans` equals the from-scratch reference on arbitrary
    tiny corpora (tiny vocab => dense collisions; exercises island merges,
    multi-diagonal overlaps, and short-doc guards)."""
    from flink_dts_connector_spark.operators.dedup import shared_spans

    docs, k, min_span = case
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b, r.a_start, r.b_start, r.span_tokens)
        for r in shared_spans(df, k=k, min_span=min_span, max_df=10_000).collect()
    }
    assert got == _py_shared_spans(docs, k, min_span, 10_000)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_span_corpus())
def test_self_repeat_spans_match_pure_python(case, spark):
    """`text.self_repeat_spans` equals the reference restricted to
    within-doc matches (pa < pb on the same doc)."""
    from collections import defaultdict

    from flink_dts_connector_spark.operators.text import self_repeat_spans

    docs, k, min_span = case
    # reference: same-doc positional matches -> islands -> per-doc rollup
    expected = defaultdict(list)
    for d, text in docs:
        toks = text.split()
        grams = {}
        for p in range(len(toks) - k + 1):
            grams.setdefault(" ".join(toks[p : p + k]), []).append(p + 1)
        matches = defaultdict(list)
        for g, ps in grams.items():
            for pa in ps:
                for pb in ps:
                    if pa < pb:
                        matches[pb - pa].append(pa)
        for diag, pas in matches.items():
            pas = sorted(set(pas))
            start = prev = pas[0]
            runs = []
            for p in pas[1:]:
                if p == prev + 1:
                    prev = p
                else:
                    runs.append((start, prev))
                    start = prev = p
            runs.append((start, prev))
            for s, e in runs:
                span = e - s + k
                if span >= min_span:
                    expected[d].append(span)
    exp = {
        d: (len(spans), max(spans)) for d, spans in expected.items() if spans
    }
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_repeat_spans, r.max_span_tokens)
        for r in self_repeat_spans(df, k=k, min_span=min_span).collect()
    }
    assert got == exp
