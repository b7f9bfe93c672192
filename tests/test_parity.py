"""Differential tests: every registered QuerySpec with an oracle must match
DuckDB on row count, schema, and values — the same gate the driver runs at
sf0.01. Runs at sf0.001 by default (SPARK_GRAFT_TEST_SF_DIR overrides)."""

from __future__ import annotations

import pytest

from core_etl_spark.plans import all_specs

from .parity import compare, duck_connection

SPECS = all_specs()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_spec_matches_oracle(name, spark, sf_dir, duck):
    spec = SPECS[name]
    df = spec.builder(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke, like the driver's weak check
        return
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    problems = compare(df, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)
