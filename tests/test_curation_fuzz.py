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
