"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape) at sf0.001.
``queries()``   — every implemented operator from SURVEY.md §2, via the
                  plan registry in :mod:`core_etl_spark.plans`.
``oracle_sql()``— matching DuckDB SQL per query (None-oracle specs are
                  omitted → driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from core_etl_spark.plans import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = all_specs()["g01_hash_agg_tpch_q1"]
    return spec.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (where expressible)."""
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
