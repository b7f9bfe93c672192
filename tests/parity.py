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


# --- NULL-vs-NaN mask harness (r14 audit, promoted r15) ---------------------
#
# ``compare`` goes through pandas, which renders both SQL NULL and IEEE NaN
# as ``NaN`` in a float64 column — so a spec emitting NULL on one engine and
# NaN on the other passes the value hash undetected. These helpers re-compare
# NATIVE row fetches (Python ``None`` vs ``float('nan')`` survive on both
# engines). Where the result carries a stable key (all non-float columns,
# non-null, unique as a tuple on both sides) the masks are compared PER
# KEY-JOINED ROW, so a compensating swap inside one column (row A NULL / row
# B NaN on one engine, reversed on the other) is caught too — the blind spot
# of the original per-column multiset compare (ADVICE r14).


def mask_class(v) -> str:
    """Classify one native value: null / nan / inf / -inf / f(inite float) /
    v(non-float scalar)."""
    if v is None:
        return "null"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return "f"
    return "v"


def column_mask_counters(rows, cols) -> dict:
    """Per-column multiset of mask classes (the order-insensitive
    fallback when no stable key exists)."""
    from collections import Counter

    out = {c: Counter() for c in cols}
    for r in rows:
        for c, v in zip(cols, r):
            out[c][mask_class(v)] += 1
    return out


def keyed_masks(rows, cols):
    """Key-joined row masks: key = tuple over every column whose values are
    all non-float, non-None scalars; returns ``(key_col_names, {key: mask
    tuple of the remaining columns})``, or ``None`` when no such unique key
    exists (caller falls back to counters)."""
    if not rows:
        return (), {}
    keyable = [
        i
        for i in range(len(cols))
        if all(r[i] is not None and not isinstance(r[i], float) for r in rows)
    ]
    if not keyable:
        return None
    keys = [tuple(r[i] for i in keyable) for r in rows]
    if len(set(keys)) != len(keys):
        return None
    rest = [i for i in range(len(cols)) if i not in keyable]
    return (
        tuple(cols[i] for i in keyable),
        {k: tuple(mask_class(r[i]) for i in rest) for k, r in zip(keys, rows)},
    )


def mask_diffs(s_rows, s_cols, o_rows, o_cols) -> list[str]:
    """Compare NULL/NaN/Inf masks between two native fetches; empty list =
    identical. Columns are compared by sorted name; rows per key-joined row
    when a stable key exists on BOTH sides (with the same key columns),
    else per-column multisets."""
    sc, oc = sorted(s_cols), sorted(o_cols)
    if sc != oc:
        return [f"columns differ: {sc} vs {oc}"]
    s_idx = [list(s_cols).index(c) for c in sc]
    o_idx = [list(o_cols).index(c) for c in oc]
    s_sorted = [tuple(r[i] for i in s_idx) for r in s_rows]
    o_sorted = [tuple(r[i] for i in o_idx) for r in o_rows]
    sk, ok = keyed_masks(s_sorted, sc), keyed_masks(o_sorted, oc)
    if sk is not None and ok is not None and sk[0] == ok[0]:
        problems = []
        s_map, o_map = sk[1], ok[1]
        for k in set(s_map) | set(o_map):
            a, b = s_map.get(k), o_map.get(k)
            if a != b:
                problems.append(f"key {k!r}: spark={a} oracle={b}")
                if len(problems) >= 10:
                    problems.append("... (truncated)")
                    break
        return problems
    a, b = column_mask_counters(s_sorted, sc), column_mask_counters(o_sorted, oc)
    return [
        f"column {c}: spark={dict(a[c])} oracle={dict(b[c])}"
        for c in sc
        if a[c] != b[c]
    ]
