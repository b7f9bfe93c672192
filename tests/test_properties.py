"""Property-based tests (hypothesis): the Spark operators must agree with
straight-line Python references on randomized inputs — the differential
angle the reference's own test strategy uses (SURVEY §5), generalized
beyond hand-picked fixtures.

Each example packs a whole batch of generated cases into ONE DataFrame so
a hypothesis run costs a handful of Spark jobs, not hundreds.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from core_etl_spark.operators import dedup as D
from core_etl_spark.operators import text as X
from core_etl_spark.operators.decode import (
    SELECTOR_TRANSFER,
    decode_transfer,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_hex = st.text("0123456789abcdef", min_size=44, max_size=44)
_word = st.text("0123456789abcdef", min_size=64, max_size=64)
_tokens = st.lists(
    st.text("abcde", min_size=1, max_size=3), min_size=1, max_size=12
)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(_hex, _hex, _word), min_size=1, max_size=30))
def test_transfer_decode_roundtrip(spark, cases):
    """Encoding a (sender, to, value) triple into reference-layout calldata
    and decoding it with the production expressions must be the identity."""
    rows = [
        (i, sender, SELECTOR_TRANSFER + to.rjust(64, "0") + value)
        for i, (sender, to, value) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "i long, sender string, input string")
    out = {
        r.i: (r.from_addr, r.to_addr, r.value)
        for r in df.select(
            "i", *decode_transfer(F.col("input"), F.col("sender"))
        ).collect()
    }
    for i, (sender, to, value) in enumerate(cases):
        assert out[i] == (sender, to, value)


def _py_shingles(text: str, n: int = 3) -> set[str]:
    w = text.split(" ")
    return set(
        " ".join(w[i : i + n]) for i in range(max(len(w) - (n - 1), 1))
    )


@settings(**_SETTINGS)
@given(st.lists(_tokens, min_size=2, max_size=12))
def test_jaccard_pairs_match_python_reference(spark, docs):
    """jaccard_pairs at threshold 0 must produce exactly the pairs sharing
    ≥1 shingle, with the set-arithmetic Jaccard value."""
    texts = [" ".join(t) for t in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): (r.n_inter, r.jaccard)
        for r in D.jaccard_pairs(df, threshold=0.0).collect()
    }
    sh = {i: _py_shingles(t) for i, t in enumerate(texts)}
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(sh[a] & sh[b])
            if inter:
                want[(a, b)] = (inter, inter / len(sh[a] | sh[b]))
    assert set(got) == set(want)
    for k, (n_inter, jac) in want.items():
        assert got[k][0] == n_inter
        assert abs(got[k][1] - jac) < 1e-12


@settings(**_SETTINGS)
@given(st.lists(_tokens, min_size=1, max_size=20))
def test_repetition_stats_match_python_reference(spark, docs):
    n = 5
    texts = [" ".join(t) for t in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {r.doc_id: r for r in X.repetition_stats(df, n=n).collect()}
    for i, toks in enumerate(docs):
        grams = [
            " ".join(toks[j : j + n])
            for j in range(max(len(toks) - (n - 1), 1))
        ]
        dup = 1 - len(set(grams)) / len(grams)
        top = max(toks.count(w) for w in set(toks)) / len(toks)
        assert out[i].n_ngrams == len(grams)
        assert abs(out[i].dup_ngram_ratio - dup) < 1e-12
        assert abs(out[i].top_token_ratio - top) < 1e-12
