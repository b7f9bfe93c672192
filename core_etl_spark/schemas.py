"""Row schemas for the engine.

Blockchain-domain schemas mirror the reference's row structs and DDL
(reference: crates/types/src/block.rs:6-27, transaction.rs:6-21,
token_transfer.rs:4-17; DDL sqlite3.rs:68-108, postgres.rs:56-98).

Type policy (SURVEY §1.3): ``i64`` → LongType; hex/address strings →
StringType; u256 quantities (``difficulty``, ``total_difficulty``, ``value``,
``energy``, ``energy_price``) stay **StringType as the source of truth**
because u256 overflows every Spark numeric; arithmetic uses the derived
``*_dec`` DecimalType(38,0) helpers in :mod:`core_etl_spark.functions.u256`
with a documented truncation policy. The storage-side ``created_at`` column
(sqlite3.rs:87,414) is a real TimestampType derived from ``timestamp``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- blockchain domain ------------------------------------------------------

#: One row per block header; reference block.rs:6-27 (+ created_at, sqlite3.rs:87).
BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("number", T.LongType(), False),
        T.StructField("hash", T.StringType(), False),
        T.StructField("parent_hash", T.StringType(), True),
        T.StructField("nonce", T.StringType(), True),
        T.StructField("sha3_uncles", T.StringType(), True),
        T.StructField("logs_bloom", T.StringType(), True),
        T.StructField("transactions_root", T.StringType(), True),
        T.StructField("state_root", T.StringType(), True),
        T.StructField("receipts_root", T.StringType(), True),
        T.StructField("miner", T.StringType(), True),
        T.StructField("difficulty", T.StringType(), True),
        T.StructField("total_difficulty", T.StringType(), True),
        T.StructField("extra_data", T.StringType(), True),
        T.StructField("energy_limit", T.LongType(), True),
        T.StructField("energy_used", T.LongType(), True),
        T.StructField("timestamp", T.LongType(), True),
        T.StructField("transaction_count", T.LongType(), True),
        T.StructField("matured", T.LongType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

#: One row per transaction; reference transaction.rs:6-21. ``from``/``to``
#: are stored as ``from_addr``/``to_addr`` (SQL-keyword avoidance, same as
#: the reference's sqlx renames at transaction.rs:13-16).
TRANSACTION_SCHEMA = T.StructType(
    [
        T.StructField("hash", T.StringType(), False),
        T.StructField("nonce", T.StringType(), True),
        T.StructField("block_hash", T.StringType(), True),
        T.StructField("block_number", T.LongType(), True),
        T.StructField("transaction_index", T.LongType(), True),
        T.StructField("from_addr", T.StringType(), True),
        T.StructField("to_addr", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("energy", T.StringType(), True),
        T.StructField("energy_price", T.StringType(), True),
        T.StructField("input", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

#: One row per decoded CBC20 transfer; reference token_transfer.rs:4-17.
#: The reference creates one table per watched token
#: (``{prefix}_{type}_{addr[..8]}_transfers``, sqlite3.rs:236-241); here a
#: single table partitioned by ``address`` replaces the whole family, and the
#: reference's cross-table UNION ALL queries become plain partition-pruned
#: scans (SURVEY §1.3).
TOKEN_TRANSFER_SCHEMA = T.StructType(
    [
        T.StructField("block_number", T.LongType(), True),
        T.StructField("from_addr", T.StringType(), True),
        T.StructField("to_addr", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("tx_hash", T.StringType(), True),
        T.StructField("address", T.StringType(), False),
        T.StructField("transfer_index", T.LongType(), True),
        T.StructField("status", T.LongType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

#: Raw block headers as delivered by the node subscription (S2, the
#: streaming half of the model; reference provider.rs:45-47). Minimal field
#: set needed by the tail: number/hash/parent_hash/timestamp.
RAW_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("number", T.LongType(), False),
        T.StructField("hash", T.StringType(), False),
        T.StructField("parent_hash", T.StringType(), True),
        T.StructField("timestamp", T.LongType(), True),
    ]
)

# --- driver synthetic analytics tables (TESTDATA.md / FIXTURES.md §B) -------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# --- enums (reference types/src/network.rs:3-18, transfer_type.rs:3-10) -----

NETWORKS = {"mainnet": 1, "devin": 3}

#: TransferType query-predicate selector (reference transfer_type.rs:3-10).
TRANSFER_TO, TRANSFER_FROM, TRANSFER_ALL = "to", "from", "all"
