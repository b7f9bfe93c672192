"""View-layer specs — SURVEY §2.4 (Q1-Q11), the reference's query engine
(sqlite3.rs:139-734), exercised over the driver's synthetic tables.

Each spec is the same *operator* the reference implements (point lookup,
range scan, dynamic conjuncts, UNION ALL projection, direction dispatch,
catalog introspection), applied to the testdata analog of the blockchain
tables: ``orders`` ≈ blocks (key = o_orderkey), ``lineitem`` ≈ transactions
(FK = l_orderkey), ``events`` ≈ the stream. Where natural, the generic
operator functions from :mod:`core_etl_spark.operators.views` are invoked
through column-renamed adapters so the production code path is what runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import views as V
from ..schemas import TRANSFER_ALL
from .base import register

def _order_cols() -> list:
    """Order projection with the date rendered as an ISO string (raw
    timestamps never cross the oracle boundary — see plans/__init__)."""
    return [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
    ]

_ORDER_COLS_SQL = (
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
    "strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority"
)

def _line_cols() -> list:
    return [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("l_shipdate"),
    ]

_LINE_COLS_SQL = (
    "l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
    "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
    "strftime(l_shipdate, '%Y-%m-%d') AS l_shipdate"
)


@register(
    "q01_latest_with_fallback",
    tables=("orders", "lineitem", "events"),
    oracle="""
        SELECT coalesce(
            (SELECT max(o_orderkey) FROM orders),
            (SELECT max(l_orderkey) FROM lineitem),
            (SELECT max(event_id) FROM events),
            0) AS latest
    """,
    tags=("views", "q1", "agg"),
)
def q01(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Q1 — latest key with 3-level fallback chain (sqlite3.rs:153-211):
    ``ORDER BY DESC LIMIT 1`` becomes a partial-aggregated ``max`` with
    ``coalesce`` across tables."""
    return V.latest_block_number(
        blocks=t["orders"].select(F.col("o_orderkey").alias("number")),
        transactions=t["lineitem"].select(F.col("l_orderkey").alias("block_number")),
        token_transfers=t["events"].select(F.col("event_id").alias("block_number")),
    )


@register(
    "q02_point_by_number",
    tables=("orders",),
    oracle=f"SELECT {_ORDER_COLS_SQL} FROM orders WHERE o_orderkey = 42",
    tags=("views", "q2", "point"),
)
def q02(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Q2 — point lookup on the numeric PK (sqlite3.rs:706-719). The filter
    pushes into the parquet scan (row-group min/max skip replaces the
    reference's b-tree index)."""
    blocks = t["orders"].withColumnRenamed("o_orderkey", "number")
    return V.block_by_number(blocks, 42).select(
        F.col("number").alias("o_orderkey"), *_order_cols()[1:]
    )


@register(
    "q03_point_by_string_key",
    tables=("customer",),
    oracle="SELECT * FROM customer WHERE c_name = 'Customer#000000042'",
    tags=("views", "q3", "point"),
)
def q03(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Q3 — point lookup by string key (block-by-hash, sqlite3.rs:721-734;
    we do not reproduce the reference's quoted-placeholder bug)."""
    cust = t["customer"].withColumnRenamed("c_name", "hash")
    return V.block_by_hash(cust, "Customer#000000042").withColumnRenamed("hash", "c_name").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


@register(
    "q04_full_scan",
    tables=("region", "nation"),
    oracle="""
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    tags=("views", "q4", "scan", "join"),
)
def q04(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Q4 — full scan (sqlite3.rs:674-682), here with the dim-to-dim
    broadcast join the single-table original implies."""
    return (
        V.all_blocks(t["nation"])
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
    )


@register(
    "q05_range_scan",
    tables=("orders",),
    oracle=f"SELECT {_ORDER_COLS_SQL} FROM orders WHERE o_orderkey BETWEEN 100 AND 199",
    tags=("views", "q5", "range"),
)
def q05(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Q5 — closed range scan (sqlite3.rs:684-704); at scale this prunes to
    the key-bucket partitions covering [100, 199]."""
    blocks = t["orders"].withColumnRenamed("o_orderkey", "number")
    return V.blocks_in_range(blocks, 100, 199).select(
        F.col("number").alias("o_orderkey"), *_order_cols()[1:]
    )


@register(
    "q05b_range_scan_open",
    tables=("lineitem",),
    oracle=f"SELECT {_LINE_COLS_SQL} FROM lineitem WHERE l_orderkey >= 14000",
    tags=("views", "q5", "range"),
)
def q05b(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Q5 — open-ended range (``end < 0`` ⇒ no upper bound, sqlite3.rs:692)."""
    blocks = t["lineitem"].withColumnRenamed("l_orderkey", "number")
    return V.blocks_in_range(blocks, 14000, -1).select(
        F.col("number").alias("l_orderkey"), *_line_cols()[1:]
    )


@register(
    "q06_children_of_parent",
    tables=("lineitem",),
    oracle=f"SELECT {_LINE_COLS_SQL} FROM lineitem WHERE l_orderkey = 42",
    tags=("views", "q6", "point"),
)
def q06(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Q6 — all child rows of one parent key (txs of a block,
    sqlite3.rs:644-657)."""
    txs = t["lineitem"].withColumnRenamed("l_orderkey", "block_number")
    return V.block_transactions(txs, 42).select(
        F.col("block_number").alias("l_orderkey"), *_line_cols()[1:]
    )


@register(
    "q07_point_composite_key",
    tables=("lineitem",),
    oracle=f"SELECT {_LINE_COLS_SQL} FROM lineitem WHERE l_orderkey = 42 AND l_linenumber = 1",
    tags=("views", "q7", "point"),
)
def q07(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Q7 — unique-row point lookup (tx-by-hash, sqlite3.rs:659-672) on the
    composite PK analog."""
    return t["lineitem"].filter((F.col("l_orderkey") == 42) & (F.col("l_linenumber") == 1)).select(
        *_line_cols()
    )


@register(
    "q08_dynamic_conjuncts",
    tables=("orders",),
    oracle=f"""
        SELECT {_ORDER_COLS_SQL} FROM orders
        WHERE o_orderstatus = 'P' AND o_orderpriority = '2-HIGH'
    """,
    tags=("views", "q8", "filter"),
)
def q08(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Q8 — dynamically-built conjunctive predicate (the reference's
    ``WHERE 1=1 [AND from=?][AND to=?]`` string build, sqlite3.rs:540-569)
    via the same optional-argument operator."""
    transfers = t["orders"].select(
        F.col("o_orderstatus").alias("address"),
        F.col("o_orderpriority").alias("from_addr"),
        "*",
    )
    out = V.token_transfers_by_token(transfers, "P", from_addr="2-HIGH")
    return out.select(*_order_cols())


@register(
    "q09_union_all_projection",
    tables=("orders", "lineitem"),
    oracle="""
        SELECT o_orderkey AS key, o_totalprice AS amount, 'order' AS src
        FROM orders WHERE o_custkey = 7
        UNION ALL
        SELECT l_orderkey AS key, l_extendedprice AS amount, 'line' AS src
        FROM lineitem WHERE l_suppkey = 7
    """,
    tags=("views", "q9", "setop"),
)
def q09(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Q9 — fixed-projection UNION ALL across heterogeneous tables (the
    reference's cross-transfer-table fan-out, sqlite3.rs:571-602)."""
    a = (
        t["orders"]
        .filter(F.col("o_custkey") == 7)
        .select(
            F.col("o_orderkey").alias("key"),
            F.col("o_totalprice").alias("amount"),
            F.lit("order").alias("src"),
        )
    )
    b = (
        t["lineitem"]
        .filter(F.col("l_suppkey") == 7)
        .select(
            F.col("l_orderkey").alias("key"),
            F.col("l_extendedprice").alias("amount"),
            F.lit("line").alias("src"),
        )
    )
    return a.unionByName(b)


@register(
    "q10_direction_dispatch",
    tables=("lineitem",),
    oracle=f"""
        SELECT {_LINE_COLS_SQL} FROM lineitem
        WHERE l_suppkey = 3 OR l_partkey = 3
    """,
    tags=("views", "q10", "filter"),
)
def q10(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Q10 — TransferType {From, To, All} disjunctive dispatch
    (sqlite3.rs:604-642) through the production operator."""
    transfers = t["lineitem"].select(
        F.col("l_suppkey").alias("from_addr"), F.col("l_partkey").alias("to_addr"), "*"
    )
    out = V.transfers_by_address(transfers, 3, TRANSFER_ALL)
    return out.select(*_line_cols())


@register(
    "q11_catalog_partitions",
    tables=("documents",),
    oracle="""
        SELECT source, count(*) AS n_docs
        FROM documents GROUP BY source
    """,
    tags=("views", "q11", "catalog"),
)
def q11(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Q11 — catalog introspection: the reference's ``sqlite_master LIKE``
    table enumeration (sqlite3.rs:297-306) becomes distinct partition values
    (with row counts) of the single partitioned table."""
    return t["documents"].groupBy("source").agg(F.count("*").alias("n_docs"))
