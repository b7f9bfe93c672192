"""Differential tests: every registered QuerySpec with an oracle must match
DuckDB on row count, schema, and values — the same gate the driver runs at
sf0.01. Runs at sf0.001 by default (SPARK_GRAFT_TEST_SF_DIR overrides)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from core_etl_spark.plans import all_specs

from .parity import compare, duck_connection

SPECS = all_specs()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_rows_only_set_matches_documented_table():
    """docs/rows-only-specs.md enumerates exactly the specs whose driver
    row reads ``err: no_oracle`` by construction — the doc and the
    registry must never drift apart (VERDICT r11 What's-wrong 2)."""
    assert sorted(n for n, s in SPECS.items() if s.oracle is None) == [
        "g06b_approx_distinct",
        "g21b_approx_sketches",
        "l07x_minhash_lsh_xxhash",
        "l12b_ann_ivf_kmeans",
        "l41c_bpe_batched",
    ]


@pytest.mark.parametrize("name", sorted(SPECS))
def test_spec_matches_oracle(name, spark, sf_dir, duck):
    spec = SPECS[name]
    df = spec.builder(spark, sf_dir)
    if spec.oracle is None:
        # Rows-only specs must be SELF-validating (VERDICT r15 directive
        # 7): no DuckDB twin by construction, so the output itself
        # carries a `valid` column pinning a semantic invariant (accuracy
        # tolerance, top-k contract, batched-selection disjointness, …)
        # and it must be all-true — a weaker check than a value hash, but
        # strictly stronger than the old count >= 0 smoke.
        assert "valid" in df.columns, f"{name}: rows-only spec lacks `valid`"
        n = df.count()
        assert n > 0, f"{name}: rows-only spec returned no rows"
        n_bad = df.filter(~F.col("valid")).count()
        assert n_bad == 0, f"{name}: {n_bad}/{n} rows failed self-validation"
        return
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    problems = compare(df, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


# The exact l20 oracle text that shipped in r5: DuckDB's windowed SUM(BIGINT)
# returns HUGEINT, so the //-derived columns fetch as float64 while Spark
# emits int64 — cell-for-cell identical values, divergent driver hash.
_L20_ORACLE_R5 = """
    WITH t AS (
        SELECT lang, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT *, COALESCE(SUM(n_tokens) OVER (
            PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS cum_before
        FROM t
    )
    SELECT lang, doc_id, n_tokens,
           cum_before // 512 AS chunk_id,
           cum_before % 512 AS chunk_offset,
           (cum_before + n_tokens - 1) // 512 - cum_before // 512 + 1
               AS spans_chunks
    FROM c
"""


def test_harness_catches_int_vs_float_dtype_split(spark, sf_dir, duck):
    """Regression for the r5 l20 red cell: the old object-equality branch
    passed `5 == 5.0`, so a float64 oracle column vs an int64 Spark column
    sailed through locally while the driver's stringify-hash failed. The
    harness must now flag the dtype split itself."""
    spec = SPECS["l20_sequence_packing"]
    df = spec.builder(spark, sf_dir)
    stale_pdf = duck.execute(_L20_ORACLE_R5).fetchdf()
    import pandas as pd

    assert any(
        pd.api.types.is_float_dtype(stale_pdf[c])
        for c in ("chunk_id", "chunk_offset", "spans_chunks")
    ), "precondition: the stale oracle must fetch HUGEINT-derived cols as float"
    problems = compare(df, stale_pdf)
    assert problems and any("int-vs-float" in p for p in problems), (
        "harness failed to flag the dtype split that broke the driver hash: "
        f"{problems}"
    )
    # And the shipped (CAST-fixed) oracle is clean under the stricter check.
    fixed_pdf = duck.execute(spec.oracle).fetchdf()
    assert not compare(df, fixed_pdf)
