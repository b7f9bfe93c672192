"""Gap-capability specs — SURVEY §2.8: the full relational surface the
reference's tables imply but its query layer only has in degenerate form.
Joins, hash aggregation, distinct, rollup/cube/grouping-sets, windows,
top-k, set ops, string/date/math/array/JSON functions, subqueries.

Cross-engine determinism: doubles are decimal-cast before SUM (exact,
order-independent), result cast back to double; avg = exact-sum / count.
See ``plans/__init__`` for the full rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..operators import sketches
from .base import register, shared_sql

# Exact-decimal money arithmetic (values < 1e10, 2-dec cents; discount/tax
# are 4-dec fractions). Shared Spark/DuckDB SQL text.
#
# LEDGER-CAST CONTRACT (r14 numeric-extremes leg): every double→decimal
# cast on a measure column is `CASE WHEN NOT isnan(col) THEN
# TRY_CAST(col AS DECIMAL(p,s)) END` — a value the decimal grid cannot
# represent (NaN, ±Inf, finite overflow) contributes NULL, i.e. is
# excluded from SUM like SQL NULL. Plain CAST is a stage-killer on BOTH
# engines: Spark under ANSI raises NUMERIC_VALUE_OUT_OF_RANGE on one
# 1e308 row, DuckDB errors on NaN — and DuckDB's TRY_CAST alone still
# errors on NaN (Invalid Input, not NULL), hence the explicit isnan
# guard. Spark-side DataFrame builders use Column.try_cast, whose
# NaN/Inf/overflow→NULL semantics match the guarded SQL exactly.
# DataFrame twins of these SQL oracles mirror with Column.try_cast.
_REV = (
    "CASE WHEN NOT isnan(l_extendedprice) THEN TRY_CAST(l_extendedprice AS DECIMAL(12,2)) END * (1 - CASE WHEN NOT isnan(l_discount) THEN TRY_CAST(l_discount AS DECIMAL(6,4)) END)"
)
_PRICE = "CASE WHEN NOT isnan(o_totalprice) THEN TRY_CAST(o_totalprice AS DECIMAL(12,2)) END"

shared_sql(
    "g01_hash_agg_tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CASE WHEN NOT isnan(l_quantity) THEN TRY_CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS sum_qty,
           CAST(SUM(CASE WHEN NOT isnan(l_extendedprice) THEN TRY_CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_REV}) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM({_REV} * (1 + CASE WHEN NOT isnan(l_tax) THEN TRY_CAST(l_tax AS DECIMAL(6,4)) END)) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
           CAST(SUM(CASE WHEN NOT isnan(l_quantity) THEN TRY_CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CASE WHEN NOT isnan(l_extendedprice) THEN TRY_CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tables=("lineitem",),
    tags=("gap", "agg"),
    headline=True,
    doc="TPC-H Q1 shape: scan + partial/final hash agg, 8 aggregates over "
    "2 group keys. The parquet scan reads only the 7 referenced columns.",
)

shared_sql(
    "g02_join_agg_topk_tpch_q3",
    f"""
    SELECT o_orderkey,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'HOUSEHOLD'
      AND o_orderdate < DATE '1998-01-01'
      AND l_shipdate  > DATE '1998-01-01'
    GROUP BY o_orderkey, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tables=("customer", "orders", "lineitem"),
    tags=("gap", "join", "topk"),
    headline=True,
    doc="TPC-H Q3 shape: 3-way join + agg + deterministic top-10 (revenue "
    "is exact-decimal so the tie-broken row set is unique). customer side "
    "broadcasts under the 64 MB threshold at test SF; at 100 TB AQE keeps "
    "the small post-filter side broadcast.",
)


@register(
    "g03_star_join_tpch_q5",
    tables=("region", "nation", "customer", "orders", "lineitem", "supplier"),
    oracle=f"""
        SELECT n_name,
               CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1999-01-01'
        GROUP BY n_name
    """,
    tags=("gap", "join", "agg"),
    headline=True,
)
def g03(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q5 shape via the DataFrame API: 6-table star join. Explicit
    ``broadcast`` hints ONLY on the fixed-cardinality dims (nation, region
    — they stay 25/5 rows at any data scale); customer and supplier SCALE
    with the warehouse, so their join strategy is left to stats + AQE:
    broadcast while they fit the threshold, shuffle join beyond it.
    Measured (relational_soak, r09): forcing their broadcast was a wash at
    sf0.1 (AQE picks broadcast anyway — 5 BroadcastHashJoins in the
    executed plan) and ~20% slower at sf10's 1.5M-row customer; at 100 TB
    a forced broadcast of a scaling dim is an executor OOM."""
    rev = F.col("l_extendedprice").try_cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").try_cast("decimal(6,4)")
    )
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1999-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "g04_semi_join",
    tables=("customer", "orders"),
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
        )
    """,
    tags=("gap", "join", "semi"),
)
def g04(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Left-semi join (EXISTS): customers holding at least one pending
    order. Semi-join never duplicates or widens the left side."""
    pending = t["orders"].filter(F.col("o_orderstatus") == "P")
    return (
        t["customer"]
        .join(pending, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "g05_anti_join",
    tables=("customer", "orders"),
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("gap", "join", "anti"),
)
def g05(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders at all."""
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


shared_sql(
    "g06_distinct_count",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey)      AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*)                        AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    tables=("orders",),
    tags=("gap", "distinct", "agg"),
    doc="Exact distinct aggregation (expand + two-phase agg in Spark).",
)


@register(
    "g06b_approx_distinct",
    tables=("orders",),
    oracle=None,  # HLL sketches are engine-specific; rows-only check.
    tags=("gap", "distinct", "approx"),
)
def g06b(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """``approx_count_distinct`` (HyperLogLog++) — the constant-memory
    distinct for 100 TB cardinality estimation. Sketches are
    engine-specific, so no cross-engine oracle (rows-only check) — so the
    output is SELF-VALIDATING (VERDICT r15 directive 7): it carries the
    exact count from the same pass and a ``valid`` flag pinning the
    estimate inside 3× the declared rsd; tests/test_parity.py asserts the
    flag is all-true for every rows-only spec."""
    est, exact = F.col("approx_customers"), F.col("exact_customers")
    return t["orders"].agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    ).withColumn(
        "valid",
        (exact > 0) & (F.abs(est - exact) <= 0.06 * exact),  # 3 × rsd 2%
    )


@register(
    "g06c_portable_hll",
    tables=("orders",),
    oracle=sketches.hll_oracle_sql(
        "orders",
        "o_custkey",
        p=12,
        group_expr="o_orderstatus",
        group_alias="o_orderstatus",
        estimate_col="approx_customers",
    ),
    tags=("gap", "distinct", "approx", "sketch", "portable"),
)
def g06c(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Portable HLL approx-distinct (operators/sketches.py) — same
    constant-memory single-pass shape as g06b's built-in HLL++ (map-side
    ``max`` per bucket, only registers shuffle, partials merge by union+max)
    but with md5-derived integer registers that replay bit-for-bit in any
    SQL engine, so unlike g06b this sketch carries a full value-hash
    oracle: bucket sums, zero counts, AND the rounded estimate must equal
    DuckDB's replay. Grouped by o_orderstatus to exercise per-group
    register tables."""
    return sketches.hll_count_distinct(
        t["orders"],
        "o_custkey",
        p=12,
        group_cols=("o_orderstatus",),
        estimate_col="approx_customers",
    )


# ROLLUP/CUBE/GROUPING SETS are spelled as explicit grouping sets PLUS a
# UNION ALL global-aggregate leg for the () set (r16 empty-table sweep):
# ANSI defines the grand-total grouping set as a global aggregate — ONE
# row even over empty input (DuckDB, Postgres agree) — but Spark's Expand
# -based grouping sets emit ZERO rows whenever the input is empty, so a
# day-zero/empty-slice rollup report silently lost its totals row. The
# rewrite is algebraically the same query on non-empty input (verified
# value-identical at sf0.01 on both engines) and cost-neutral through the
# aggregate: the () member drops out of the Expand (one fewer expanded
# copy per input row) and comes back as a separate pruned-column scan
# whose partial aggregation collapses to one row per task map-side.
# Spark's native empty-input deviation is pinned by
# tests/test_empty_inputs.py so a future Spark fix flags the simplification.
_QTY = (
    "CASE WHEN NOT isnan(l_quantity) "
    "THEN TRY_CAST(l_quantity AS DECIMAL(12,2)) END"
)

shared_sql(
    "g07_rollup",
    f"""
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           CAST(SUM({_QTY}) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))
    UNION ALL
    SELECT 'ALL', 'ALL', CAST(1 AS INT), CAST(1 AS INT),
           CAST(SUM({_QTY}) AS DOUBLE), COUNT(*)
    FROM lineitem
    """,
    tables=("lineitem",),
    tags=("gap", "rollup"),
    doc="ROLLUP semantics with GROUPING() markers — subtotal + grand-total "
        "rows; the grand total is the empty-input-safe global-aggregate leg.",
)

shared_sql(
    "g07b_cube",
    f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(SUM({_PRICE}) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority))
    UNION ALL
    SELECT 'ALL', 'ALL', CAST(SUM({_PRICE}) AS DOUBLE), COUNT(*)
    FROM orders
    """,
    tables=("orders",),
    tags=("gap", "cube"),
    doc="CUBE semantics over status × priority; grand total via the "
        "empty-input-safe global-aggregate leg.",
)

shared_sql(
    "g07c_grouping_sets",
    f"""
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    UNION ALL
    SELECT 'ALL', 'ALL', CAST(SUM({_REV}) AS DOUBLE)
    FROM lineitem
    """,
    tables=("lineitem",),
    tags=("gap", "grouping-sets"),
    doc="Explicit GROUPING SETS (one-dimension marginals + empty-input-safe "
        "grand total).",
)

shared_sql(
    "g08_window_functions",
    f"""
    SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS rn,
           rank()       OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC NULLS LAST, o_orderkey) AS rk,
           lag(o_orderkey)  OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS prev_key,
           lead(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS next_key,
           CAST(SUM({_PRICE}) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
    tables=("orders",),
    tags=("gap", "window"),
    headline=True,
    doc="row_number/rank/lag/lead + running frame sum, partitioned per "
    "customer — shuffles once on o_custkey, no global sort. Null ordering "
    "is EXPLICIT (r13 adversarial-data audit): shared-SQL text runs on "
    "both engines, and their defaults differ (Spark ASC=NULLS FIRST, "
    "DuckDB=NULLS LAST) — an implicit order diverges the moment a window "
    "order column has a null.",
)

shared_sql(
    "g08b_window_distribution",
    """
    SELECT o_custkey, o_orderkey,
           CAST(ntile(4) OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile,
           CAST(percent_rank() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice, o_orderkey) AS DOUBLE) AS pct_rank,
           CAST(cume_dist() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice, o_orderkey) AS DOUBLE) AS cume,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice, o_orderkey) AS cheapest_key,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS priciest_key
    FROM orders
    """,
    tables=("orders",),
    tags=("gap", "window", "distribution"),
    doc="Distribution window functions (ntile/percent_rank/cume_dist) + "
    "first/last_value with an explicit full frame — the §2.8 window rows "
    "g08 doesn't cover; unique (price, key) ordering keeps ntile "
    "deterministic.",
)


@register(
    "g24_time_range_frame",
    tables=("events",),
    oracle="""
        WITH e AS (
            SELECT user_id, event_id,
                   -- FLOOR epoch seconds, computed in exact integer
                   -- microseconds (r14 temporal-extremes leg): Spark's
                   -- unix_timestamp truncates toward ZERO, so a pre-epoch
                   -- fractional second (-89.5 s) gave -89 there vs
                   -- floor(epoch())'s -90 here — and floor(epoch()) itself
                   -- goes through a double whose 52-bit mantissa cannot
                   -- hold microsecond precision at the NANOS domain edges
                   -- (|s| ≈ 9.2e9 needs 54 bits with the fraction).
                   -- Subtracting the positive mod first keeps everything
                   -- integer until an exact division.
                   CAST((epoch_us(ts) - ((epoch_us(ts) % 1000000) + 1000000) % 1000000)
                        / 1000000 AS BIGINT) AS epoch_s,
                   CASE WHEN NOT isnan(value) THEN TRY_CAST(value AS DECIMAL(12,2)) END AS v
            FROM events
        )
        SELECT user_id, event_id, epoch_s,
               COUNT(*) OVER w AS n_trailing,
               CAST(SUM(v) OVER w AS DOUBLE) AS sum_trailing
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                     RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
    """,
    tags=("gap", "window", "range-frame", "temporal"),
)
def g24(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Time-range window frame: per user, count/sum of events in the
    trailing 10 minutes — RANGE BETWEEN 600 PRECEDING on epoch seconds
    (the sliding-lookback shape ROWS frames can't express; peers at one
    timestamp all see the same frame, so the result is order-independent).
    Shuffles once on user_id; frame evaluation is a per-partition sweep."""
    # floor-epoch in pure integer arithmetic: unix_timestamp truncates
    # toward zero (wrong below 1970), and a double round-trip is inexact
    # at the NANOS domain edges. pmod makes the value an exact multiple
    # of 1e6, so the `div` is exact — no doubles anywhere (the oracle's
    # dividend does pass through a double, where DuckDB's round-on-cast
    # absorbs the ≤0.0005 error; Spark's truncate-on-cast would not,
    # hence `div`).
    e = t["events"].select(
        "user_id",
        "event_id",
        F.expr(
            "(unix_micros(ts) - pmod(unix_micros(ts), 1000000)) div 1000000"
        ).alias("epoch_s"),
        F.col("value").try_cast("decimal(12,2)").alias("v"),
    )
    w = W.partitionBy("user_id").orderBy("epoch_s").rangeBetween(-600, 0)
    return e.select(
        "user_id",
        "event_id",
        "epoch_s",
        F.count("*").over(w).alias("n_trailing"),
        F.sum("v").over(w).cast("double").alias("sum_trailing"),
    )


shared_sql(
    "g25_recursive_cte",
    """
    WITH RECURSIVE nxt AS (
      SELECT user_id, event_id,
             lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS next_id
      FROM events WHERE event_type = 'click'
    ),
    walk(user_id, event_id, hop) AS (
      SELECT user_id, CAST(min(event_id) AS BIGINT), 0 FROM nxt GROUP BY user_id
      UNION ALL
      SELECT n.user_id, n.next_id, w.hop + 1
      FROM walk w JOIN nxt n ON n.user_id = w.user_id AND n.event_id = w.event_id
      WHERE n.next_id IS NOT NULL AND w.hop < 8
    )
    SELECT user_id, event_id, CAST(hop AS BIGINT) AS hop FROM walk
    """,
    tables=("events",),
    tags=("gap", "recursive-cte", "iterative"),
    doc="Recursive CTE (Spark 4 native): per-user chain walk from the "
    "first click, hop-numbered, depth-bounded — the declarative "
    "counterpart to the driver-loop iteration in neardup_components; "
    "each recursion step is one self-join the engine plans like any "
    "other (linear chain -> bounded rounds).",
)

shared_sql(
    "g26_lateral_topk",
    """
    SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) l
    """,
    tables=("customer", "orders"),
    tags=("gap", "lateral", "topk"),
    doc="Correlated LATERAL subquery with per-row ORDER BY/LIMIT — the "
    "SQL-standard spelling of top-k-per-group (g09's window form); "
    "Catalyst decorrelates it to a ranked window over one join, not a "
    "per-customer loop.",
)

shared_sql(
    "g09_topk_per_group",
    """
    WITH ranked AS (
        SELECT p_brand, p_partkey, p_name, p_retailprice,
               row_number() OVER (
                   PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
    )
    SELECT p_brand, p_partkey, p_name, p_retailprice, rn
    FROM ranked WHERE rn <= 3
    """,
    tables=("part",),
    tags=("gap", "window", "topk"),
    doc="Top-3 per group via ranked window; p_partkey tiebreak makes the "
    "row set unique.",
)

shared_sql(
    "g10_set_ops",
    """
    SELECT 'both' AS tag, k FROM (
        SELECT o_custkey AS k FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey AS k FROM orders WHERE year(o_orderdate) = 1996
    ) a
    UNION ALL
    SELECT 'only_1995' AS tag, k FROM (
        SELECT o_custkey AS k FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT o_custkey AS k FROM orders WHERE year(o_orderdate) = 1996
    ) b
    """,
    tables=("orders",),
    tags=("gap", "setop"),
    doc="INTERSECT / EXCEPT / UNION ALL in one plan.",
)

shared_sql(
    "g11_string_functions",
    """
    SELECT p_partkey,
           upper(p_name)                          AS name_upper,
           substr(p_name, 1, 5)                   AS name_prefix,
           length(p_name)                         AS name_len,
           p_brand || '/' || p_type               AS brand_type,
           replace(p_name, ' ', '_')              AS name_snake,
           regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
           CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo
    FROM part
    WHERE lower(p_name) LIKE '%bolt%'
    """,
    tables=("part",),
    tags=("gap", "string"),
    doc="substr/upper/length/concat/replace/regexp_extract/LIKE — the "
    "string surface behind the reference's hex slicing (T5-T7) and prefix "
    "matching (K2).",
)


@register(
    "g12_datetime_functions",
    tables=("orders",),
    oracle=f"""
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
               CAST(SUM({_PRICE}) AS DOUBLE) AS total,
               COUNT(*) AS n_orders,
               CAST(min(year(o_orderdate)) AS INT) AS yr,
               CAST(min(month(o_orderdate)) AS INT) AS mon
        FROM orders
        WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        GROUP BY date_trunc('month', o_orderdate)
    """,
    tags=("gap", "datetime"),
)
def g12(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """date_trunc/year/month + interval-bounded range — the reference's
    created_at derivation (T10) and retention cutoff arithmetic (K9)."""
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(
            F.sum(F.col("o_totalprice").try_cast("decimal(12,2)")).cast("double").alias("total"),
            F.count("*").alias("n_orders"),
            F.min(F.year("o_orderdate")).alias("yr"),
            F.min(F.month("o_orderdate")).alias("mon"),
        )
        .select(
            F.date_format("m", "yyyy-MM-dd").alias("month"),
            "total",
            "n_orders",
            "yr",
            "mon",
        )
    )


@register(
    "g13_hex_conversion",
    tables=("customer",),
    oracle="""
        SELECT c_custkey,
               substr(md5(c_name), 1, 8) AS hex_slice,
               CAST('0x' || substr(md5(c_name), 1, 8) AS BIGINT) AS hex_as_int
        FROM customer
        WHERE c_custkey < 100
    """,
    tags=("gap", "math", "decode", "t12"),
)
def g13(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """T12 — hex→int parsing (`usize::from_str_radix(...,16)` in the
    reference, cbc20.rs:62) as ``conv(hex, 16, 10)``; md5 supplies
    deterministic hex input from testdata."""
    hx = F.substring(F.md5(F.col("c_name")), 1, 8)
    return (
        t["customer"]
        .filter(F.col("c_custkey") < 100)
        .select(
            "c_custkey",
            hx.alias("hex_slice"),
            F.conv(hx, 16, 10).cast("long").alias("hex_as_int"),
        )
    )


@register(
    "g14_json_functions",
    tables=("events",),
    oracle="""
        -- json_valid guard (r13 adversarial-data audit): Spark's
        -- get_json_object returns NULL for malformed JSON, DuckDB's
        -- json_extract_string THROWS — a single corrupt payload killed
        -- the oracle query. Malformed JSON contributes NULL (skipped by
        -- SUM) on both engines.
        SELECT event_type,
               CAST(SUM(CAST(CASE WHEN json_valid(props)
                   THEN json_extract_string(props, '$.k') END AS BIGINT))
                   AS BIGINT) AS sum_k,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
    """,
    tags=("gap", "json"),
)
def g14(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """JSON extraction from the ``props`` payload column — the engine-side
    equivalent of the reference's serde on RPC payloads (provider.rs).
    Malformed/NULL payloads contribute NULL (get_json_object's native
    behavior, mirrored by the oracle's json_valid guard)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count("*").alias("n"))
    )


@register(
    "g15_array_functions",
    tables=("embeddings",),
    oracle="""
        SELECT vec_id, label,
               len(embedding) AS dim,
               round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
               round(CAST(list_sum(list_transform(embedding,
                     x -> CASE WHEN NOT isnan(CAST(x AS DOUBLE))
                               THEN TRY_CAST(round(CAST(x AS DOUBLE), 3) AS DECIMAL(10,3)) END))
                     AS DOUBLE), 3) AS coord_sum
        FROM embeddings
        WHERE vec_id < 50
    """,
    tags=("gap", "array"),
)
def g15(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Array surface: size / element_at / element-wise transform + fold —
    the primitives under the ABI array decode (T6) and the ANN dot products.
    The fold runs on exact decimals so the sum is order-independent.

    Null/empty-array semantics match ANSI (r13 adversarial-data audit +
    r14 element-NULL arm): ``try_element_at`` — a bare ``element_at`` on
    an empty array KILLS the stage under ANSI mode, where DuckDB's
    ``arr[1]`` is NULL — and the fold SKIPS NULL elements like SQL's SUM
    (DuckDB ``list_sum`` does exactly this; Spark's raw ``aggregate``
    null-propagates, so one NULL coordinate silently nulled the whole
    sum — the r14 pytest smoke caught the divergence the moment the
    corrupted twin grew an element-NULL vector). A list with no non-null
    elements sums to NULL (sum-of-nothing), empty included. An element
    that cannot be represented on the DECIMAL(10,3) grid — NaN, ±Inf, or
    a finite overflow — contributes NULL the same way (r14
    numeric-extremes leg): try_cast here, and in the oracle an
    isnan-guarded TRY_CAST because DuckDB's TRY_CAST(NaN AS DECIMAL) is
    an Invalid Input *error*, not NULL."""
    dec_nn = F.filter(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double"), 3).try_cast("decimal(10,3)"),
        ),
        lambda x: x.isNotNull(),
    )
    return (
        t["embeddings"]
        .filter(F.col("vec_id") < 50)
        .select(
            "vec_id",
            "label",
            F.size("embedding").alias("dim"),
            F.round(
                F.try_element_at("embedding", F.lit(1)).cast("double"), 4
            ).alias("first_val"),
            F.when(
                F.size(dec_nn) > 0,
                F.round(
                    F.aggregate(
                        dec_nn,
                        F.lit(0).cast("decimal(20,3)"),
                        lambda acc, x: (acc + x).cast("decimal(20,3)"),
                    ).cast("double"),
                    3,
                ),
            ).alias("coord_sum"),
        )
    )


@register(
    "g16_tumbling_window",
    tables=("events",),
    oracle="""
        SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS VARCHAR) AS window_start,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN NOT isnan(value) THEN TRY_CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS total_value
        FROM events
        WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
        GROUP BY time_bucket(INTERVAL '5 minutes', ts), event_type
    """,
    tags=("gap", "window", "streaming-analog"),
)
def g16(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Tumbling 5-minute event-time window — the batch shape of the
    streaming windowed agg (§2.8 streaming windows; same ``window()``
    expression runs unchanged under ``readStream``)."""
    return (
        t["events"]
        .filter(F.col("ts") < "2024-01-02 00:00:00")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").try_cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "g16b_sliding_window",
    tables=("events",),
    oracle="""
        SELECT CAST(ws AS VARCHAR) AS window_start,
               event_type,
               COUNT(*) AS n_events
        FROM (
            SELECT event_type,
                   unnest([time_bucket(INTERVAL '5 minutes', ts),
                           time_bucket(INTERVAL '5 minutes', ts)
                               - INTERVAL '5 minutes']) AS ws
            FROM events
            WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
        )
        GROUP BY ws, event_type
    """,
    tags=("gap", "window", "streaming-analog", "sliding"),
)
def g16b(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Sliding 10-minute/5-minute event-time window — each event lands in
    width/slide = 2 windows (the oracle unnests the two containing window
    starts). Uses the streaming operator verbatim: ``withWatermark`` is a
    no-op on a batch frame, so the exact production expression is what
    gets parity-checked (§2.8 streaming windows)."""
    from ..streaming import windows as SW

    return (
        SW.sliding_counts(
            t["events"].filter(F.col("ts") < "2024-01-02 00:00:00"),
            width="10 minutes",
            slide="5 minutes",
            keys=("event_type",),
        )
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            F.col("n_events"),
        )
    )


@register(
    "g17_sessionization",
    tables=("events",),
    oracle="""
        WITH gaps AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
            -- an event with no timestamp cannot be sessionized, and a NULL
            -- in the window ORDER BY splits the engines (Spark NULLS
            -- FIRST, DuckDB NULLS LAST) — r13 adversarial-data audit
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, event_id, ts,
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM gaps
        )
        SELECT user_id, session_id,
               COUNT(*) AS n_events,
               CAST(floor((max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000) AS BIGINT) AS duration_sec
        FROM sess
        GROUP BY user_id, session_id
    """,
    tags=("gap", "window", "session"),
)
def g17(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Sessionization: 30-minute-gap cumsum session ids per user (the batch
    twin of streaming ``session_window``). Two stages, both partitioned by
    user_id — a single shuffle. Timestamp-less events are excluded — they
    cannot be sessionized, and a NULL in the window ORDER BY splits the
    engines (r13 adversarial-data audit)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = t["events"].filter(F.col("ts").isNotNull()).select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((us - F.unix_micros(F.lag("ts").over(w))) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = gaps.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.floor((F.max(us) - F.min(us)) / 1_000_000).cast("long").alias("duration_sec"),
    )


shared_sql(
    "g18_pivot_conditional_agg",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS views,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS errors,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signups
    FROM events
    GROUP BY user_id
    """,
    tables=("events",),
    tags=("gap", "pivot"),
    doc="Pivot via conditional aggregation (the portable form of "
    "``.groupBy().pivot()`` — same physical plan).",
)

shared_sql(
    "g19_scalar_subquery",
    f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (
        SELECT CAST(SUM({_PRICE}) AS DOUBLE) / COUNT(*) FROM orders)
    """,
    tables=("orders",),
    tags=("gap", "subquery"),
    doc="Uncorrelated scalar subquery (orders above 2× the mean price); the "
    "mean is exact-decimal so the threshold is engine-identical.",
)

shared_sql(
    "g20_decorrelated_subquery",
    """
    WITH part_avg AS (
        SELECT l_partkey,
               CAST(SUM(CASE WHEN NOT isnan(l_quantity) THEN TRY_CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT l.l_partkey, l.l_orderkey, l.l_linenumber, l.l_quantity
    FROM lineitem l
    JOIN part_avg p ON l.l_partkey = p.l_partkey
    WHERE l.l_quantity < 0.5 * p.avg_qty
    """,
    tables=("lineitem",),
    tags=("gap", "subquery", "join"),
    headline=True,
    doc="TPC-H Q17 shape: correlated aggregate subquery written "
    "decorrelated (per-key agg + self-join) — one shuffle on l_partkey.",
)


shared_sql(
    "g28_returns_by_customer_tpch_q10",
    f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_return_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tables=("customer", "orders", "lineitem", "nation"),
    tags=("gap", "join", "agg", "topk"),
    doc="TPC-H Q10 shape: returned-item revenue per customer — fact scan "
    "filtered on the return flag (reaches parquet), two broadcast dim "
    "joins (customer, nation), one shuffle agg, exact-decimal revenue, "
    "TakeOrdered top-20 with the custkey tiebreaker.",
)

shared_sql(
    "g29_supplier_diversity_tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_size IN (5, 10, 15, 20)
      AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tables=("lineitem", "part", "supplier"),
    tags=("gap", "join", "distinct", "anti-join"),
    doc="TPC-H Q16 shape (lineitem standing in for partsupp): distinct "
    "supplier count per part attribute, minus flagged suppliers via a "
    "NOT IN anti-join (null-safe: s_suppkey is non-null) that Catalyst "
    "plans as a broadcast anti join; partial distinct before the final "
    "agg keeps the shuffle narrow.",
)


shared_sql(
    "g31_large_orders_tpch_q18",
    """
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS STRING) AS o_orderdate,
           o_totalprice,
           CAST(SUM(CASE WHEN NOT isnan(l_quantity) THEN TRY_CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CASE WHEN NOT isnan(l_quantity) THEN TRY_CAST(l_quantity AS DECIMAL(12,2)) END) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tables=("customer", "orders", "lineitem"),
    tags=("gap", "join", "semi", "having", "topk"),
    doc="TPC-H Q18 shape (large-volume orders): IN-subquery with a HAVING "
    "aggregate gate becomes a semi join against a pre-aggregated key set — "
    "lineitem is scanned twice but both aggs are partial+final and the semi "
    "join is on the order key; exact-decimal qty keeps the HAVING cut and "
    "the top-100 row set engine-identical (reference view.rs:38-101 covers "
    "only point/range scans; this is §2.8 gap surface).",
)

shared_sql(
    "g32_exclusive_supplier_orders_tpch_q21",
    """
    SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS n_exclusive
    FROM supplier
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
    )
    GROUP BY s_name
    ORDER BY n_exclusive DESC, s_name
    LIMIT 20
    """,
    tables=("supplier", "lineitem"),
    tags=("gap", "join", "anti", "correlated"),
    doc="TPC-H Q21 shape (exclusive-supplier orders): correlated NOT EXISTS "
    "with an inequality disjunct decorrelates to an aggregated anti join on "
    "the order key (Catalyst rewrites it; no per-row subquery execution). "
    "COUNT(DISTINCT) rides the same shuffle; name tiebreak keeps the "
    "top-20 set unique.",
)


shared_sql(
    "g34_order_priority_tpch_q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01'
      AND o_orderdate < DATE '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tables=("orders", "lineitem"),
    tags=("gap", "semi", "exists"),
    doc="TPC-H Q4 shape: correlated EXISTS with an extra-column predicate "
    "decorrelates to a left-semi join on the order key; date range prunes "
    "the orders scan (PushedFilters).",
)

shared_sql(
    "g35_shipmode_tpch_q12",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tables=("orders", "lineitem"),
    tags=("gap", "join", "conditional-agg"),
    doc="TPC-H Q12 shape: join + conditional (CASE) aggregation — the "
    "pivot-style counting pattern; integer CASE sums are exact in both "
    "engines.",
)

shared_sql(
    "g36_promo_revenue_tpch_q14",
    """
    SELECT (100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CASE WHEN NOT isnan(l_extendedprice) THEN TRY_CAST(l_extendedprice AS DECIMAL(12,2)) END
                       * (1 - CASE WHEN NOT isnan(l_discount) THEN TRY_CAST(l_discount AS DECIMAL(4,2)) END) ELSE 0 END)
                      AS DOUBLE))
           / CAST(SUM(CASE WHEN NOT isnan(l_extendedprice) THEN TRY_CAST(l_extendedprice AS DECIMAL(12,2)) END
                      * (1 - CASE WHEN NOT isnan(l_discount) THEN TRY_CAST(l_discount AS DECIMAL(4,2)) END)) AS DOUBLE)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-09-01'
      AND l_shipdate < DATE '1997-10-01'
    """,
    tables=("lineitem", "part"),
    tags=("gap", "join", "ratio"),
    doc="TPC-H Q14 shape: global ratio aggregate over a dim join — "
    "exact-decimal numerator/denominator cast to double BEFORE the division "
    "(decimal-division scale rules differ between engines; double ops are "
    "correctly rounded in both) so the scalar is engine-identical.",
)


shared_sql(
    "g37_forecast_revenue_tpch_q6",
    """
    SELECT CAST(SUM(CASE WHEN NOT isnan(l_extendedprice) THEN TRY_CAST(l_extendedprice AS DECIMAL(12,2)) END
                    * CASE WHEN NOT isnan(l_discount) THEN TRY_CAST(l_discount AS DECIMAL(4,2)) END) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tables=("lineitem",),
    tags=("gap", "agg", "pushdown"),
    doc="TPC-H Q6 shape: pure filter + global aggregate — every predicate "
    "(date range, discount band, quantity cap) pushes to the parquet scan, "
    "and the revenue sum is exact-decimal so the scalar is "
    "engine-identical.",
)

shared_sql(
    "g38_small_quantity_revenue_tpch_q17",
    """
    SELECT CAST(CAST(SUM(CASE WHEN NOT isnan(l_extendedprice) THEN TRY_CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_size = 5
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CASE WHEN NOT isnan(l2.l_quantity) THEN TRY_CAST(l2.l_quantity AS DECIMAL(12,2)) END)
                           AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    tables=("lineitem", "part"),
    tags=("gap", "correlated", "decorrelation"),
    doc="TPC-H Q17 shape: correlated aggregate subquery (per-part average "
    "quantity threshold) — Catalyst decorrelates it to an aggregated join "
    "on the part key. The average is computed as an exact-decimal sum cast "
    "to double BEFORE one division, so the threshold (and therefore the "
    "selected row set) is bit-identical across engines — a raw avg(DOUBLE) "
    "would be partition-order-dependent.",
)


# --- TPC-H completion (r07): the ten remaining query shapes -----------------
#
# With these the full TPC-H 22 is covered: Q1 g01, Q2 g39, Q3 g02, Q4 g34,
# Q5 g03, Q6 g37, Q7 g40, Q8 g41, Q9 g42, Q10 g28, Q11 g43, Q12 g35,
# Q13 g44, Q14 g36, Q15 g45, Q16 g29, Q17 g38, Q18 g31, Q19 g46, Q20 g47,
# Q21 g32, Q22 g48. Shapes adapt to the driver schema (no partsupp table,
# no comment/phone/shipmode columns — lineitem stands in for partsupp and
# existing attribute columns stand in for the missing filter columns), but
# each keeps its query's defining plan signature: the decorrelation
# pattern, join topology, and aggregate structure.

shared_sql(
    "g39_mincost_supplier_tpch_q2",
    """
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 25 AND r_name = 'EUROPE'
      AND l_extendedprice = (
        SELECT MIN(l2.l_extendedprice)
        FROM lineitem l2
        JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tables=("part", "lineitem", "supplier", "nation", "region"),
    tags=("gap", "correlated", "scalar-subquery", "topk"),
    doc="TPC-H Q2 shape (minimum-cost supplier; lineitem standing in for "
    "partsupp): correlated scalar MIN subquery over the same join tree — "
    "Catalyst decorrelates to a per-part aggregate joined back on the part "
    "key, so the min is computed once per part, not per candidate row. "
    "Equality on the double is safe: both engines compare the identical "
    "parquet value. DISTINCT + full ORDER BY tiebreak keeps the top-100 "
    "set engine-identical.",
)

shared_sql(
    "g40_volume_shipping_tpch_q7",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
               {_REV} AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tables=("supplier", "lineitem", "orders", "customer", "nation"),
    tags=("gap", "join", "self-dim", "disjunct"),
    doc="TPC-H Q7 shape (volume shipping): the nation dimension joins "
    "TWICE (supplier side and customer side) with a symmetric disjunctive "
    "pair filter; both dim joins broadcast, the year is derived in the "
    "subquery, and the revenue rolls up exact-decimal.",
)

shared_sql(
    "g41_market_share_tpch_q8",
    f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                              ELSE 0 END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               {_REV} AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
          AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tables=("part", "lineitem", "supplier", "orders", "customer", "nation",
            "region"),
    tags=("gap", "join", "conditional-agg", "ratio"),
    doc="TPC-H Q8 shape (national market share): the deepest join tree in "
    "the suite (7 tables, nation twice); the share is a conditional-sum / "
    "total-sum ratio — both sums are exact decimals cast to double before "
    "ONE division, so the ratio is bit-identical across engines.",
)

shared_sql(
    "g42_product_profit_tpch_q9",
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               {_REV}
                 - CASE WHEN NOT isnan(p_retailprice) THEN TRY_CAST(p_retailprice AS DECIMAL(12,2)) END
                   * CASE WHEN NOT isnan(l_quantity) THEN TRY_CAST(l_quantity AS DECIMAL(12,2)) END AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tables=("part", "lineitem", "supplier", "orders", "nation"),
    tags=("gap", "join", "like", "agg"),
    doc="TPC-H Q9 shape (product-type profit; retailprice*quantity standing "
    "in for ps_supplycost): LIKE-filtered part dimension drives the fact "
    "scan, profit is an exact-decimal expression summed per (nation, "
    "year). The LIKE filter pushes to the part scan and the dim joins "
    "broadcast.",
)

shared_sql(
    "g43_important_parts_tpch_q11",
    f"""
    SELECT l_partkey, CAST(SUM({_REV}) AS DOUBLE) AS value
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
    HAVING SUM({_REV}) * 1000 > (
        SELECT SUM({_REV})
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
    )
    ORDER BY value DESC, l_partkey
    """,
    tables=("lineitem", "supplier", "nation"),
    tags=("gap", "having", "scalar-subquery"),
    doc="TPC-H Q11 shape (important stock; lineitem standing in for "
    "partsupp): per-part value vs a global-total threshold — the scalar "
    "subquery computes once, broadcasts into the HAVING, and the "
    "comparison is exact-decimal cross-multiplied (SUM*1000 > total) "
    "instead of a float fraction, so the surviving key set is "
    "engine-identical.",
)

shared_sql(
    "g44_order_distribution_tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tables=("customer", "orders"),
    tags=("gap", "outer-join", "distribution"),
    doc="TPC-H Q13 shape (customer order distribution; the priority "
    "predicate standing in for the comment NOT LIKE): the defining "
    "signature is the predicate INSIDE the left join's ON clause — "
    "customers with zero qualifying orders survive with c_count=0 — "
    "followed by a count-of-counts double aggregation.",
)

shared_sql(
    "g45_top_supplier_tpch_q15",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_REV}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tables=("supplier", "lineitem"),
    tags=("gap", "cte", "scalar-subquery", "argmax"),
    doc="TPC-H Q15 shape (top supplier): the revenue view (CTE) is "
    "referenced twice — once joined, once under a scalar MAX — the "
    "view-reuse/argmax pattern; the max-equality compares exact decimals, "
    "never doubles, so ties select the identical supplier set in both "
    "engines.",
)

shared_sql(
    "g46_disjunct_revenue_tpch_q19",
    f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tables=("lineitem", "part"),
    tags=("gap", "disjunct", "join-filter"),
    doc="TPC-H Q19 shape (discounted revenue; size/quantity bands standing "
    "in for container/shipmode): three disjunctive multi-column predicate "
    "branches spanning BOTH join sides — the optimizer must keep the "
    "disjunction above the join while still pushing the common p_brand IN "
    "set down to the part scan; single exact-decimal scalar out.",
)

shared_sql(
    "g47_promotion_suppliers_tpch_q20",
    """
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%blue%'
        )
          AND l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CASE WHEN NOT isnan(l_quantity) THEN TRY_CAST(l_quantity AS DECIMAL(12,2)) END) > 45
    )
    ORDER BY s_name
    """,
    tables=("supplier", "nation", "lineitem", "part"),
    tags=("gap", "semi", "nested-subquery", "having"),
    doc="TPC-H Q20 shape (potential part promotion): the nested semi-join "
    "chain — suppliers IN (aggregated lineitem IN (LIKE-filtered parts)) "
    "with a HAVING quantity gate standing in for the availqty "
    "comparison; both IN subqueries plan as left-semi joins, the inner "
    "one broadcast.",
)

shared_sql(
    "g48_dormant_customers_tpch_q22",
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CASE WHEN NOT isnan(c_acctbal) THEN TRY_CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE) AS totacctbal
    FROM (
        SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode, c_acctbal
        FROM customer c
        WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)
          AND CASE WHEN NOT isnan(c_acctbal) THEN TRY_CAST(c_acctbal AS DECIMAL(12,2)) END * (
                SELECT COUNT(*) FROM customer
                WHERE c_acctbal > 0 AND c_nationkey % 10 IN (1, 3, 5, 7, 9)
              ) > (
                SELECT SUM(CASE WHEN NOT isnan(c_acctbal) THEN TRY_CAST(c_acctbal AS DECIMAL(12,2)) END) FROM customer
                WHERE c_acctbal > 0 AND c_nationkey % 10 IN (1, 3, 5, 7, 9)
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT'
          )
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    tables=("customer", "orders"),
    tags=("gap", "anti", "scalar-subquery"),
    doc="TPC-H Q22 shape (dormant customers; nationkey digits standing in "
    "for phone prefixes, 'no urgent orders' for 'no orders' so the anti "
    "join is non-degenerate on this data): above-average balance via an "
    "exact cross-multiplied scalar pair (balance*count > total — no float "
    "average, so the admitted set is engine-identical) plus a NOT EXISTS "
    "anti join.",
)
