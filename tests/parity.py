"""Local differential harness mirroring the driver's correctness gate:
run each QuerySpec's Spark builder AND its DuckDB oracle on the same parquet
tables, then compare row count, column names, and order-insensitive values.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from core_etl_spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spdf)} oracle={len(oracle_pdf)}")
        return problems
    a, b = _normalize(spdf), _normalize(oracle_pdf)
    for c in a.columns:
        # The driver's canonical hash stringifies values, so an int64 5 on one
        # side vs a float64 5.0 on the other hash-mismatches even when every
        # value is numerically identical (r4 m01, r5 l20 — both slipped past
        # the object-equality branch below where 5 == 5.0). Flag the dtype
        # split itself; oracles must CAST to the integer type Spark emits.
        int_a = pd.api.types.is_integer_dtype(a[c])
        int_b = pd.api.types.is_integer_dtype(b[c])
        if int_a != int_b and (
            pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c])
        ):
            problems.append(
                f"col {c}: int-vs-float dtype split spark={a[c].dtype} "
                f"oracle={b[c].dtype} — driver hash stringifies 5 vs 5.0 "
                "differently; CAST the oracle column"
            )
            continue
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            for i, (x, y) in enumerate(zip(av, bv)):
                both_nan = (x != x) and (y != y)
                if not both_nan and x != y:
                    if math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12):
                        problems.append(
                            f"col {c} row {i}: NEAR miss {x!r} vs {y!r} (would fail exact hash)"
                        )
                    else:
                        problems.append(f"col {c} row {i}: {x!r} != {y!r}")
                    break
        else:
            eq = a[c].astype(object).where(pd.notna(a[c]), None).equals(
                b[c].astype(object).where(pd.notna(b[c]), None)
            )
            if not eq:
                diff = (a[c].astype(str) != b[c].astype(str)).to_numpy().nonzero()[0][:3]
                examples = [(a[c].iloc[i], b[c].iloc[i]) for i in diff]
                problems.append(f"col {c} differs, e.g. {examples}")
    return problems
