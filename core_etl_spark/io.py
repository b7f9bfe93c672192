"""Table loading and registration.

``load_tables`` reads the driver's parquet tables for a scale-factor dir and
registers them as temp views so both the DataFrame API and ``spark.sql`` can
address them by name. Reads are plain ``spark.read.parquet`` — Catalyst owns
column pruning and predicate pushdown into the scan.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs the specs depend on, set here so they hold on ANY
    session (the driver constructs a vanilla one — builder confs in
    session.py don't reach it):

    - ``nanosAsLong``: events.parquet carries INT64 TIMESTAMP(NANOS) which
      vanilla Spark rejects with PARQUET_TYPE_ILLEGAL; with the flag the
      column arrives as long nanos and ``_fix_nanos_timestamps`` restores
      TimestampType.
    - UTC session timezone: oracle (DuckDB) parity for date/time functions
      must not depend on the host zone.

    Both are runtime-settable SQLConfs, safe to set repeatedly.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # TIMESTAMP(MICROS, isAdjustedToUTC=false) columns (this round's driver
    # encoding) read directly as TimestampType instead of TIMESTAMP_NTZ —
    # value-identical under the UTC session zone, and it drops the
    # per-column cast projection _fix_nanos_timestamps would otherwise put
    # above every scan of events/orders/lineitem.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


#: session → {(sf_dir, table) → (DataFrame, registered)}. A DataFrame is a
#: reusable lazy plan; re-creating it per query re-reads the parquet footer
#: for schema inference and re-registers the temp view — pure fixed overhead
#: (~0.15 s per call) that dominates sub-second queries. The testdata tables
#: are immutable (mutation specs copy them first), so memoizing is safe.
#: Weakly keyed by the session so entries (and the DataFrames pinning the
#: session) die with it — a module-global dict would keep every stopped
#: session's plans alive for the process lifetime.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TESTDATA_TABLES,
    register: bool = True,
    refresh: bool = False,
) -> dict[str, DataFrame]:
    """Load the synthetic tables and (by default) register temp views.
    Repeat calls on the same session reuse the cached lazy plans;
    ``refresh=True`` bypasses the cache (e.g. after overwriting files)."""
    _ensure_session_confs(spark)
    session_cache = _TABLE_CACHE.setdefault(spark, {})
    out: dict[str, DataFrame] = {}
    for name in names:
        key = (os.path.normpath(sf_dir), name)
        hit = None if refresh else session_cache.get(key)
        if hit is None:
            path = table_path(sf_dir, name)
            if not os.path.exists(path):
                continue
            hit = (_fix_nanos_timestamps(spark.read.parquet(path)), None)
        df, registered_dir = hit
        # The view registry is GLOBAL per session while the cache key is
        # per (sf_dir, table): tracking a boolean left the temp view
        # pointing at whichever sf_dir registered LAST, so after
        # alternating scales a spark.sql() over the view name silently
        # read the wrong corpus (r15 review, verified live). Track WHICH
        # dir the view points at and re-register on change.
        norm_dir = key[0]
        if register and registered_dir != norm_dir:
            df.createOrReplaceTempView(name)
            registered_dir = norm_dir
            # every other sf_dir's cache entry for this table no longer
            # owns the view
            for k2 in list(session_cache):
                if k2[1] == name and k2 != key:
                    session_cache[k2] = (session_cache[k2][0], None)
        session_cache[key] = (df, registered_dir)
        out[name] = df
    return out


def _fix_nanos_timestamps(df: DataFrame) -> DataFrame:
    """Normalize timestamp physical encodings to a plain ``TimestampType``.

    The driver's generator has shipped ``events.ts`` two ways across rounds:

    - INT64 TIMESTAMP(NANOS): arrives as long nanos under the
      ``nanosAsLong`` flag (session.py); restored at micro precision with
      exact integer division — the generator's values are micro-precision so
      nothing is lost.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as TIMESTAMP_NTZ,
      which functions like ``unix_micros`` reject. Cast to session-local
      TimestampType — value-identical because ``load_tables`` pins the
      session timezone to UTC, and required for oracle parity (DuckDB is
      UTC-naive).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if isinstance(field.dataType, T.LongType) and field.name == "ts":
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000"))
            )
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast(T.TimestampType()))
    return df
