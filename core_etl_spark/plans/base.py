"""QuerySpec plumbing for the plan registry."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..io import load_tables
from ..schemas import TESTDATA_TABLES

Builder = Callable[[SparkSession, str], DataFrame]

#: name -> spec; populated by the plans submodules at import time.
REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    #: ANSI SQL equivalent runnable by DuckDB over the same tables; ``None``
    #: for non-SQL-expressible ops (driver falls back to a rows-only check,
    #: recorded in the artifact as ``err: "no_oracle"`` — by design, not a
    #: failure; see docs/rows-only-specs.md for the five such specs and
    #: their oracle-backed twins).
    oracle: str | None
    tags: tuple[str, ...] = ()
    #: headline queries are what bench.py times at sf0.1.
    headline: bool = False
    doc: str = ""


def register(
    name: str,
    *,
    tables: tuple[str, ...] = TESTDATA_TABLES,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    headline: bool = False,
):
    """Decorator: register ``fn(spark, tables_dict) -> DataFrame``.

    The wrapper loads (and registers temp views for) the requested tables
    from ``sf_dir`` before delegating, so builders can use either the passed
    DataFrames or ``spark.sql`` over the view names.
    """

    def deco(fn: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]):
        def builder(spark: SparkSession, sf_dir: str) -> DataFrame:
            dfs = load_tables(spark, sf_dir, tables)
            return fn(spark, dfs)

        if name in REGISTRY:
            raise ValueError(f"duplicate spec {name}")
        REGISTRY[name] = QuerySpec(
            name, builder, oracle, tuple(tags), headline, (fn.__doc__ or "").strip()
        )
        return fn

    return deco


def shared_sql(
    name: str,
    sql: str,
    *,
    tables: tuple[str, ...] = TESTDATA_TABLES,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    headline: bool = False,
    doc: str = "",
) -> None:
    """Register a spec whose Spark side is ``spark.sql(sql)`` and whose
    oracle defaults to the *same* SQL text — usable whenever the query stays
    inside the dialect intersection of Spark SQL and DuckDB (most of the
    relational surface). Catalyst compiles the text to the same logical plan
    the DataFrame API would produce."""

    def fn(spark: SparkSession, dfs: dict[str, DataFrame]) -> DataFrame:
        return spark.sql(sql)

    fn.__doc__ = doc
    register(
        name,
        tables=tables,
        oracle=oracle if oracle is not None else sql,
        tags=tags,
        headline=headline,
    )(fn)
