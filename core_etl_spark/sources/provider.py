"""Block providers — the reference's provider crate (reference
crates/provider/src/provider.rs) re-shaped for distributed fetch.

The reference fetches blocks one at a time over a WebSocket JSON-RPC client
with driver-side ``tokio::spawn`` concurrency (etl.rs:286-309, ``--threads``
default 3). The Spark-first shape inverts that: the *block range* becomes a
DataFrame (``spark.range``), partitioned into chunks, and each partition
fetches its blocks inside ``mapInPandas`` — so fetch parallelism equals
``partitions × executors`` and scales with the cluster, not with a
driver-side thread flag.

Transport note: the wire call is injectable. The live path is
:class:`~core_etl_spark.sources.ws.WsJsonRpcTransport` — a dependency-free
WebSocket JSON-RPC client with the reference's 5×5 s connect-retry policy
(provider.rs:24-43), unit-tested against an in-process mock server
(tests/test_ws.py, including fetch through executor partitions). The
default transport still raises ``NotImplementedError`` so accidental
network use in tests is loud; wire a live one with ``ws.make_provider()``.
"""

from __future__ import annotations

import json
import math
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from ..streaming.tail import RAW_BLOCK_DDL
from . import fixtures

#: transport: (method, params_json) -> result_json — one JSON-RPC exchange
Transport = Callable[[str, str], str]


def _no_network(method: str, params: str) -> str:
    raise NotImplementedError(
        "no transport injected; use core_etl_spark.sources.ws.make_provider() "
        "(WsJsonRpcTransport) to go live, or pass a fake Transport in tests"
    )


def _raw_block_columns() -> list[str]:
    """Top-level column names of RAW_BLOCK_DDL, so an all-skipped fetch
    batch still yields a frame with the right columns (a bare
    ``pd.DataFrame([])`` has none and fails mapInPandas' projection —
    the multimodal ``_frame`` lesson). Splits on top-level commas only:
    the transactions column is an ``array<struct<...,...>>``."""
    from ..operators.multimodal import _ddl_columns

    return _ddl_columns(RAW_BLOCK_DDL)


def _quantity(value, default: int) -> int:
    """A JSON-RPC quantity that may arrive as an int, a hex string
    ("0x1"), a decimal string, or garbage/None — garbage maps to the
    default instead of killing the executor task (r13 adversarial
    audit)."""
    if isinstance(value, bool):
        return int(value)
    if isinstance(value, int):
        return value
    if isinstance(value, str):
        try:
            return int(value, 16) if value.startswith("0x") else int(value)
        except ValueError:
            return default
    return default


class FixtureBlockProvider:
    """Deterministic chain for tests and demos (S2-S4 shapes), optionally
    forked at one height (reorg drills)."""

    def __init__(
        self, n_blocks: int = 1000, txs_per_block: int = 4, dirty: bool = False
    ) -> None:
        self.n_blocks = n_blocks
        self.txs_per_block = txs_per_block
        self.dirty = dirty

    def chain_tip(self) -> int:  # S3 get_block(Latest)
        return self.n_blocks - 1

    def network_id(self) -> int:  # S6
        return 1

    def syncing(self) -> bool:  # S6 lazy-mode gate
        return False

    def fetch_blocks(self, spark: SparkSession, start: int, end: int) -> DataFrame:
        """S4 — raw nested blocks for [start, end]."""
        from pyspark.sql import functions as F

        raw = fixtures.raw_blocks(
            spark, self.n_blocks, self.txs_per_block, dirty=self.dirty
        )
        return raw.filter(F.col("number").between(start, end))

    def receipts_for(self, raw: DataFrame) -> DataFrame:  # S5
        return fixtures.receipts(raw)


class RpcBlockProvider:
    """JSON-RPC provider with distributed fetch (S1-S6).

    ``fetch_blocks`` partitions [start, end] into ``chunk_size`` ranges and
    executes the RPC calls *inside the executors* via ``mapInPandas`` — the
    driver never proxies block payloads. Each partition opens its own
    connection (the reference's retry policy, 5×5 s at provider.rs:23-43,
    belongs in the transport)."""

    def __init__(self, transport: Transport = _no_network, chunk_size: int = 1000) -> None:
        self.transport = transport
        self.chunk_size = chunk_size

    def chain_tip(self) -> int:
        res = json.loads(self.transport("xcb_blockNumber", "[]"))
        return int(res, 16) if isinstance(res, str) else int(res)

    def network_id(self) -> int:
        return int(json.loads(self.transport("net_version", "[]")))

    def syncing(self) -> bool:
        return bool(json.loads(self.transport("xcb_syncing", "[]")))

    def fetch_blocks(self, spark: SparkSession, start: int, end: int) -> DataFrame:
        n = end - start + 1
        parts = max(1, math.ceil(n / self.chunk_size))
        transport = self.transport  # capture for the closure, not self

        def fetch(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                rows = []
                for number in pdf["id"]:
                    payload = transport(
                        "xcb_getBlockByNumber", json.dumps([hex(int(number)), True])
                    )
                    raw = json.loads(payload)
                    # a node answers null (or garbage) for a height it has
                    # pruned or not yet sealed — a REAL case whenever a
                    # backfill range touches the tip. One such reply must
                    # not kill the stage 4× (r13 adversarial audit): skip
                    # the height; the V2 gap check flags it and the next
                    # resume re-fetches (same recovery as a missed drop).
                    if isinstance(raw, dict):
                        rows.append(raw)
                yield pd.DataFrame(rows, columns=_raw_block_columns())

        rng = spark.range(start, end + 1).repartition(parts)
        return rng.mapInPandas(fetch, schema=RAW_BLOCK_DDL)

    def receipts_for(self, raw: DataFrame) -> DataFrame:
        """S5 — receipts joined as a dataset, fetched per-partition (the
        reference does one RPC per matched tx at etl.rs:357-360; batching by
        partition amortizes the round-trips)."""
        from pyspark.sql import functions as F

        transport = self.transport

        def fetch(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                out = []
                for h in pdf["tx_hash"]:
                    rec = json.loads(
                        transport("xcb_getTransactionReceipt", json.dumps([h]))
                    )
                    # a missing receipt arrives as null (dropped/replaced
                    # tx — a real case) and a live node returns status as
                    # a hex quantity ("0x1"): neither may kill the stage
                    # (r13 adversarial audit). Default mirrors the
                    # existing missing-status default: success.
                    status = (
                        _quantity(rec.get("status", 1), 1)
                        if isinstance(rec, dict)
                        else 1
                    )
                    out.append({"tx_hash": h, "status": status})
                yield pd.DataFrame(out, columns=["tx_hash", "status"])

        txs = raw.select(F.explode("transactions").alias("t")).select(
            F.col("t.hash").alias("tx_hash")
        )
        return txs.mapInPandas(fetch, schema="tx_hash string, status long")
