"""Live-chain wiring end-to-end (S1/S2 → O1/O2): WS backfill through
executor partitions, then the head poller bridging the new-heads
subscription into the streaming tail's drop directory — all against the
in-process loopback server (no real network)."""

from __future__ import annotations

import time

from core_etl_spark.lake import Lake
from core_etl_spark.pipeline import backfill
from core_etl_spark.sources.provider import RpcBlockProvider
from core_etl_spark.sources.ws import WsJsonRpcTransport
from core_etl_spark.streaming.poller import HeadPoller
from core_etl_spark.streaming.tail import start_tail
from tests.test_ws import HANDLERS, _block
from tests.ws_server import MockWsRpcServer


def test_live_export_backfill_then_tail(spark, tmp_path):
    """The reference's full export run (export.rs:46-71 → etl.rs:126-176):
    chunked backfill over RPC, then the subscription-fed tail extends the
    lake past the backfill tip."""
    with MockWsRpcServer(HANDLERS) as srv:
        t = WsJsonRpcTransport(url=srv.url, retries=1, retry_delay=0.1)
        provider = RpcBlockProvider(transport=t, chunk_size=5)
        lake = Lake(spark, str(tmp_path / "wh"), bucket_size=25)

        n = backfill(spark, lake, provider, end=4, chunk_size=5)
        assert n == 5
        assert lake.latest_block_number() == 4
        assert lake.transactions().count() == 10  # 2 txs per fixture block

        src = str(tmp_path / "drops")
        poller = HeadPoller(spark, t, src, max_blocks=2).start()
        deadline = time.time() + 10
        while not srv._sub_ids and time.time() < deadline:
            time.sleep(0.02)  # poller subscribing
        assert srv._sub_ids, "poller never subscribed"

        srv.push_head(_block(5))
        srv.push_head(_block(6))
        poller.join(30)
        assert not poller.alive
        assert poller.blocks_written == 2

        q = start_tail(spark, lake, src, str(tmp_path / "ck"))
        q.awaitTermination(120)
        assert lake.latest_block_number() == 6
        assert lake.blocks().count() == 7
        assert lake.transactions().count() == 14
        t.close()


def test_poller_batches_heads(spark, tmp_path):
    """batch_size coalesces consecutive heads into one drop file."""
    with MockWsRpcServer(HANDLERS) as srv:
        t = WsJsonRpcTransport(url=srv.url, retries=1, retry_delay=0.1)
        src = str(tmp_path / "drops")
        poller = HeadPoller(spark, t, src, batch_size=3, max_blocks=3).start()
        deadline = time.time() + 10
        while not srv._sub_ids and time.time() < deadline:
            time.sleep(0.02)
        for n in (10, 11, 12):
            srv.push_head(_block(n))
        poller.join(30)
        assert poller.blocks_written == 3
        df = spark.read.parquet(src)
        assert sorted(r.number for r in df.select("number").collect()) == [10, 11, 12]
        # one coalesced drop → a single parquet data file
        n_files = df.select(df.number).inputFiles()
        assert len(n_files) == 1
        t.close()
