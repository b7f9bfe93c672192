"""The query/view layer — the reference's 15-method storage/query interface
(reference crates/storage/storage/src/storage.rs:1-88, SQL bodies
sqlite3.rs:139-734 / postgres.rs:120-745) re-expressed as DataFrame
transformations.

Design differences from the reference, on purpose (SURVEY §1.3):

- The per-token table family ``{prefix}_{type}_{addr[..8]}_transfers`` is one
  table partitioned by ``address``; the reference's catalog-introspected
  UNION ALL fan-out (sqlite3.rs:571-642) becomes a partition-pruned scan.
- Every function returns a lazy DataFrame — composition, not row vectors.
- Point/range filters are plain ``filter`` calls: Catalyst pushes them into
  the parquet scan (min/max row-group skipping replaces the b-tree indexes
  the reference creates at sqlite3.rs:131-151).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..schemas import TRANSFER_ALL, TRANSFER_FROM, TRANSFER_TO


# --- Q1: latest block number with fallback chain (sqlite3.rs:153-211) -------

def latest_block_number(
    blocks: DataFrame | None,
    transactions: DataFrame | None = None,
    token_transfers: DataFrame | None = None,
) -> DataFrame:
    """Highest synced block number, 3-level fallback: blocks → transactions →
    transfers → 0 (reference sqlite3.rs:153-211 runs ``ORDER BY number DESC
    LIMIT 1`` then falls back table by table).

    One row, one column ``latest``. Each ``max`` is a partial-aggregated scan
    (no shuffle beyond the 1-row final agg); ``coalesce`` stitches the
    fallback chain without driver round-trips.
    """
    parts: list[DataFrame] = []
    if blocks is not None:
        parts.append(blocks.agg(F.max("number").alias("m")))
    if transactions is not None:
        parts.append(transactions.agg(F.max("block_number").alias("m")))
    if token_transfers is not None:
        parts.append(token_transfers.agg(F.max("block_number").alias("m")))
    if not parts:
        raise ValueError("at least one table required")
    out = parts[0]
    cols = [F.col("m0")]
    out = out.select(F.col("m").alias("m0"))
    for i, p in enumerate(parts[1:], start=1):
        out = out.crossJoin(p.select(F.col("m").alias(f"m{i}")))
        cols.append(F.col(f"m{i}"))
    return out.select(F.coalesce(*cols, F.lit(0)).alias("latest"))


# --- Q2-Q5: block lookups (sqlite3.rs:674-734) ------------------------------

def block_by_number(blocks: DataFrame, number: int) -> DataFrame:
    """Point lookup on the partition/sort key (reference sqlite3.rs:706-719)."""
    return blocks.filter(F.col("number") == F.lit(number))


def block_by_hash(blocks: DataFrame, block_hash: str) -> DataFrame:
    """Point lookup by hash (reference sqlite3.rs:721-734; note the SQLite
    variant there binds inside quotes — a latent bug we do not reproduce)."""
    return blocks.filter(F.col("hash") == F.lit(block_hash))


def all_blocks(blocks: DataFrame) -> DataFrame:
    """Full scan (reference sqlite3.rs:674-682)."""
    return blocks


def blocks_in_range(blocks: DataFrame, start: int, end: int) -> DataFrame:
    """Range scan; ``end < 0`` means open-ended (reference sqlite3.rs:684-704)."""
    cond = F.col("number") >= F.lit(start)
    if end >= 0:
        cond = cond & (F.col("number") <= F.lit(end))
    return blocks.filter(cond)


# --- Q6-Q7: transaction lookups (sqlite3.rs:644-672) ------------------------

def block_transactions(transactions: DataFrame, number: int) -> DataFrame:
    """All transactions of one block (reference sqlite3.rs:644-657)."""
    return transactions.filter(F.col("block_number") == F.lit(number))


def transaction_by_hash(transactions: DataFrame, tx_hash: str) -> DataFrame:
    """Point lookup by tx hash (reference sqlite3.rs:659-672)."""
    return transactions.filter(F.col("hash") == F.lit(tx_hash))


# --- Q8-Q10: token-transfer queries (sqlite3.rs:540-642) --------------------

def token_transfers_by_token(
    transfers: DataFrame,
    token_address: str,
    from_addr: str | None = None,
    to_addr: str | None = None,
) -> DataFrame:
    """Transfers of one token with optional from/to conjuncts — the
    reference's dynamically-built ``WHERE 1=1 [AND from_addr=?][AND
    to_addr=?]`` against a catalog-resolved table (sqlite3.rs:540-569).
    Here the token predicate prunes the ``address`` partition."""
    out = transfers.filter(F.col("address") == F.lit(token_address))
    if from_addr is not None:
        out = out.filter(F.col("from_addr") == F.lit(from_addr))
    if to_addr is not None:
        out = out.filter(F.col("to_addr") == F.lit(to_addr))
    return out


def transfers_by_tx(transfers: DataFrame, tx_hash: str) -> DataFrame:
    """All transfers of one transaction, 5-column projection — the
    reference's UNION ALL over every transfer table (sqlite3.rs:571-602)
    collapses to a single filtered scan + select."""
    return transfers.filter(F.col("tx_hash") == F.lit(tx_hash)).select(
        "from_addr", "to_addr", "value", "transfer_index", "status"
    )


def transfers_by_address(
    transfers: DataFrame, addr: str, direction: str = TRANSFER_ALL
) -> DataFrame:
    """Transfers touching an address with TransferType dispatch
    (reference sqlite3.rs:604-642; enum transfer_type.rs:3-10)."""
    if direction == TRANSFER_FROM:
        cond: Column = F.col("from_addr") == F.lit(addr)
    elif direction == TRANSFER_TO:
        cond = F.col("to_addr") == F.lit(addr)
    elif direction == TRANSFER_ALL:
        cond = (F.col("from_addr") == F.lit(addr)) | (F.col("to_addr") == F.lit(addr))
    else:
        raise ValueError(f"unknown TransferType {direction!r}")
    return transfers.filter(cond)


# --- Q11: catalog introspection (sqlite3.rs:181-184, 297-306) ---------------

def list_transfer_tokens(transfers: DataFrame) -> DataFrame:
    """The reference enumerates per-token tables via ``sqlite_master LIKE``
    (sqlite3.rs:297-306); with one partitioned table this is the distinct
    partition values of ``address``."""
    return transfers.select("address").distinct()
