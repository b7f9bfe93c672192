"""Decode specs — SURVEY §2.2 (T4-T8, T12): CBC20 calldata extraction run
against *synthetic calldata* built deterministically from the ``customer``
table, so the DuckDB oracle can replay the exact same fixture and decode.

Fixture shape (one tx per customer key < 150):

- kind = key % 4 → 0: ``transfer``, 1: ``transferFrom``, 2: ``batchTransfer``
  with N = 1 + key % 3 recipients, 3: unknown selector (must be dropped);
- key % 5 == 0 targets a *different* contract (must be dropped by the T4
  address predicate);
- receipts give status 0 for key % 7 == 0 (exercises the T8 status join).

Addresses are 44-char md5-derived hex; values stay hex strings (u256
fidelity). The Spark side runs the production decoder
(:mod:`core_etl_spark.operators.decode`); the oracle re-implements the
slicing in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.decode import extract_token_transfers
from .base import register

CONTRACT = "c" * 44
OTHER_CONTRACT = "d" * 44

_ZWORD = "repeat('0', 64)"


def _addr(x: str) -> str:
    """44-char deterministic hex address from an expression (shared dialect)."""
    return f"concat(md5(concat('a', {x})), substr(md5(concat('b', {x})), 1, 12))"


def _word(a: str) -> str:
    return f"lpad({a}, 64, '0')"


def _vword(x: str) -> str:
    """64-char value word with a 16-hex-char payload."""
    return f"lpad(substr(md5(concat('v', {x})), 1, 16), 64, '0')"


_K = "CAST(key AS STRING)"
_N = "(1 + key % 3)"


def _batch_words(maker, tag: str) -> str:
    """N address/value words for N = 1 + key % 3 (bounded CASE keeps the
    generation in the shared SQL dialect)."""
    w = [maker(f"concat('{tag}', {_K}, '_', {i})") for i in (1, 2, 3)]
    return (
        f"CASE {_N} WHEN 1 THEN {w[0]} "
        f"WHEN 2 THEN concat({w[0]}, {w[1]}) "
        f"ELSE concat({w[0]}, {w[1]}, {w[2]}) END"
    )


_COUNT_WORD = f"lpad(CAST({_N} AS STRING), 64, '0')"

#: Shared-dialect fixture CTE: customer keys → synthetic transactions.
FIXTURE_CTE = f"""
src AS (
    SELECT CAST(c_custkey AS BIGINT) AS key FROM customer WHERE c_custkey < 150
),
tx AS (
    SELECT key,
           key AS block_number,
           md5(concat('h', {_K})) AS hash,
           {_addr(f"concat('s', {_K})")} AS from_addr,
           CASE WHEN key % 5 = 0 THEN '{OTHER_CONTRACT}' ELSE '{CONTRACT}' END AS to_addr,
           CASE CAST(key % 4 AS INT)
             WHEN 0 THEN concat('4b40e901',
                                {_word(_addr(f"concat('t', {_K})"))},
                                {_vword(_K)})
             WHEN 1 THEN concat('31f2e679',
                                {_word(_addr(f"concat('f', {_K})"))},
                                {_word(_addr(f"concat('t', {_K})"))},
                                {_vword(_K)})
             WHEN 2 THEN concat('e86e7c5f', {_ZWORD}, {_ZWORD}, {_COUNT_WORD},
                                {_batch_words(lambda x: _word(_addr(x)), 't')},
                                {_COUNT_WORD},
                                {_batch_words(_vword, 'v')})
             ELSE concat('deadbeef', {_ZWORD})
           END AS input
    FROM src
)
"""

_TX_SQL = f"WITH {FIXTURE_CTE} SELECT * FROM tx"


def _fixture_df(spark: SparkSession, sql: str) -> DataFrame:
    """The synthetic tx fixture behind a plan barrier (lazy
    localCheckpoint). Without it CollapseProject inlines the md5-chain
    ``input`` expression into EVERY decode reference — selector slices,
    the well-formed bound, each decoded column — and the duplicated tree
    blows the generated ``processNext()`` past the JVM's 64 KB method
    limit: the r16 probe caught five silent codegen→interpreted
    fallbacks across t45x/t4678/t4678x. Production calldata is a STORED
    column (attribute refs, no duplication), so the barrier also makes
    these specs exercise the production plan shape: decode expressions
    over materialized rows, whole-stage codegen intact. 150 rows — the
    lazy checkpoint materializes on first use and is row-identical to
    the inline CTE (same deterministic expressions of ``key``)."""
    return spark.sql(sql).localCheckpoint(eager=False)


_RECEIPT_STATUS = "CASE WHEN key % 7 = 0 THEN 0 ELSE 1 END"


@register(
    "t45_transfer_decode",
    tables=("customer",),
    oracle=f"""
        WITH {FIXTURE_CTE}
        SELECT block_number,
               from_addr,
               substr(input, 29, 44) AS to_addr,
               substr(input, 73, 64) AS value,
               hash AS tx_hash
        FROM tx
        WHERE to_addr = '{CONTRACT}' AND substr(input, 1, 8) = '4b40e901'
    """,
    tags=("decode", "t4", "t5", "string"),
)
def t45(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """T4+T5 — predicate + single-transfer decode: selector match, address
    match, word slicing (cbc20.rs:25-46). Pure column expressions, fully
    codegen'd."""
    from pyspark.sql import functions as F

    from ..operators.decode import SELECTOR_TRANSFER, decode_transfer, is_transfer_call

    tx = spark.sql(_TX_SQL)
    return (
        tx.filter(is_transfer_call(F.col("input"), F.col("to_addr"), CONTRACT))
        .filter(F.substring("input", 1, 8) == SELECTOR_TRANSFER)
        .select(
            "block_number",
            *decode_transfer(F.col("input"), F.col("from_addr"))[:3],
            F.col("hash").alias("tx_hash"),
        )
    )


#: the r14 well-formed gate (operators/decode.py::batch_wellformed) in the
#: DuckDB dialect: the count word must be a plausible hex count AND the
#: payload must actually carry n recipient + n value words.
_COUNT_RE_SQL = "'^0{48}[0-9a-fA-F]{16}$'"


def _extract_sql(src: str) -> str:
    """The full CBC20 extraction (matched → selector dispatch → gated batch
    explode → status join) as DuckDB CTE bodies over any ``src`` relation
    with (key, block_number, hash, from_addr, to_addr, input) — the oracle
    twin of ``extract_token_transfers``, shared between the clean and the
    dirty-fixture specs. Slices the CONSTRUCTED input like the operator
    does, so corrupted calldata replays byte-for-byte."""
    return f"""
        matched AS (
            SELECT * FROM {src}
            WHERE to_addr = '{CONTRACT}'
              AND substr(input, 1, 8) IN ('4b40e901', 'e86e7c5f', '31f2e679')
        ),
        single AS (
            SELECT block_number, from_addr,
                   substr(input, 29, 44) AS to_addr,
                   substr(input, 73, 64) AS value,
                   hash AS tx_hash, CAST(0 AS BIGINT) AS transfer_index, key
            FROM matched WHERE substr(input, 1, 8) = '4b40e901'
        ),
        t_from AS (
            SELECT block_number,
                   substr(input, 29, 44) AS from_addr,
                   substr(input, 93, 44) AS to_addr,
                   substr(input, 137, 64) AS value,
                   hash AS tx_hash, CAST(0 AS BIGINT) AS transfer_index, key
            FROM matched WHERE substr(input, 1, 8) = '31f2e679'
        ),
        batch_src AS (
            SELECT * FROM (
                SELECT *,
                       CASE WHEN regexp_matches(substr(input, 137, 64),
                                                {_COUNT_RE_SQL})
                            THEN TRY_CAST('0x' || substr(input, 137, 64) AS BIGINT)
                       END AS n,
                       CAST(floor((length(input) - 264) / 128) AS BIGINT) AS n_cap
                FROM matched WHERE substr(input, 1, 8) = 'e86e7c5f'
            ) WHERE n IS NOT NULL AND n >= 1 AND n <= n_cap
        ),
        batch AS (
            SELECT b.block_number, b.from_addr,
                   substr(b.input, 201 + 64 * i.g + 20, 44) AS to_addr,
                   substr(b.input, CAST(265 + 64 * b.n + 64 * i.g AS INT), 64) AS value,
                   b.hash AS tx_hash, CAST(i.g AS BIGINT) AS transfer_index, b.key
            FROM batch_src b
            JOIN (SELECT unnest(generate_series(0, 2)) AS g) i ON i.g < b.n
        ),
        transfers AS (
            SELECT * FROM single UNION ALL SELECT * FROM t_from UNION ALL SELECT * FROM batch
        )
        SELECT block_number, from_addr, to_addr, value, tx_hash,
               '{CONTRACT}' AS address, transfer_index,
               CAST({_RECEIPT_STATUS} AS BIGINT) AS status
        FROM transfers
    """


@register(
    "t4678_cbc20_extract",
    tables=("customer",),
    oracle=f"WITH {FIXTURE_CTE}, {_extract_sql('tx')}",
    tags=("decode", "t4", "t6", "t7", "t8", "t12", "explode", "join"),
)
def t4678(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """T4-T8 + T12 — the full extraction pipeline (reference
    etl.rs:346-384): selector dispatch (3-way filtered union mirroring the
    SmartContract trait dispatch), batchTransfer 1→N ``posexplode``, hex→int
    count parse, and the receipt-status broadcast join replacing the
    reference's per-tx RPC."""
    from pyspark.sql import functions as F

    tx = _fixture_df(spark, _TX_SQL)
    receipts = tx.select(
        F.col("hash").alias("tx_hash"), F.expr(_RECEIPT_STATUS).alias("status")
    )
    return extract_token_transfers(tx, CONTRACT, receipts=receipts)


# --- dirty-chain fixture (r14, VERDICT r13 directive 1) ---------------------
# The same tx fixture post-processed with deterministic, key-addressed
# corruption — the shapes real chain calldata contains (and that the
# reference tolerates via NULL-defaults, transaction.rs:26-36, or would
# PANIC on — its fixed-range slices at cbc20.rs:41-78 are out-of-bounds on
# truncated input): NULL calldata, truncation mid-word, an odd-length tail,
# count words that lie (huge / zero / non-hex), a payload shorter than its
# count claims, and NULL recipients. Shared SQL dialect, so the oracle sees
# byte-identical corruption.
DIRTY_FIXTURE_CTE = (
    FIXTURE_CTE
    + """,
dirty AS (
    SELECT key, block_number, hash, from_addr,
           CASE WHEN key % 19 = 7 THEN NULL ELSE to_addr END AS to_addr,
           CASE key % 19
                WHEN 0 THEN NULL
                WHEN 1 THEN substr(input, 1, 40)
                WHEN 2 THEN concat(input, 'f')
                WHEN 3 THEN concat(substr(input, 1, 136), repeat('f', 64),
                                   substr(input, 201))
                WHEN 4 THEN concat(substr(input, 1, 136), repeat('0', 64),
                                   substr(input, 201))
                WHEN 5 THEN concat(substr(input, 1, 136), repeat('0', 48),
                                   repeat('z', 16), substr(input, 201))
                WHEN 6 THEN substr(input, 1, 392)
                ELSE input END AS input
    FROM tx
)
"""
)

_DIRTY_TX_SQL = f"WITH {DIRTY_FIXTURE_CTE} SELECT * FROM dirty"


@register(
    "t45x_transfer_decode_dirty",
    tables=("customer",),
    oracle=f"""
        WITH {DIRTY_FIXTURE_CTE}
        SELECT block_number,
               from_addr,
               substr(input, 29, 44) AS to_addr,
               substr(input, 73, 64) AS value,
               hash AS tx_hash
        FROM dirty
        WHERE to_addr = '{CONTRACT}' AND substr(input, 1, 8) = '4b40e901'
    """,
    tags=("decode", "t4", "t5", "adversarial"),
)
def t45x(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """T4+T5 on the DIRTY fixture: NULL calldata / NULL recipients fail the
    predicate (NULL is not true); truncated calldata decodes to the short
    slices the bytes actually carry — substring is total in both engines,
    where the reference's fixed-range slice would panic (cbc20.rs:41-46)."""
    from pyspark.sql import functions as F

    from ..operators.decode import SELECTOR_TRANSFER, decode_transfer, is_transfer_call

    tx = _fixture_df(spark, _DIRTY_TX_SQL)
    return (
        tx.filter(is_transfer_call(F.col("input"), F.col("to_addr"), CONTRACT))
        .filter(F.substring("input", 1, 8) == SELECTOR_TRANSFER)
        .select(
            "block_number",
            *decode_transfer(F.col("input"), F.col("from_addr"))[:3],
            F.col("hash").alias("tx_hash"),
        )
    )


@register(
    "t4678x_cbc20_extract_dirty",
    tables=("customer",),
    oracle=f"WITH {DIRTY_FIXTURE_CTE}, {_extract_sql('dirty')}",
    tags=("decode", "t4", "t6", "t7", "t8", "t12", "explode", "adversarial"),
)
def t4678x(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """T4-T8 + T12 on the DIRTY fixture — the full extraction pipeline fed
    hostile calldata: the batch legs with lying count words (huge / zero /
    non-hex / longer than the payload) produce ZERO rows via the
    well-formed gate instead of a stage-killing ``sequence()`` explode or
    fabricated transfers; everything still decodable decodes identically
    to the byte-slicing oracle."""
    from pyspark.sql import functions as F

    tx = _fixture_df(spark, _DIRTY_TX_SQL)
    receipts = tx.select(
        F.col("hash").alias("tx_hash"), F.expr(_RECEIPT_STATUS).alias("status")
    )
    return extract_token_transfers(tx, CONTRACT, receipts=receipts)


def _addr_py(x: str) -> str:
    """Python twin of ``_addr`` for building literal watch lists."""
    import hashlib

    return (
        hashlib.md5(f"a{x}".encode()).hexdigest()
        + hashlib.md5(f"b{x}".encode()).hexdigest()[:12]
    )


#: Watch list for the T3 spec: two senders + the off-contract recipient —
#: exercises both sides of the (from OR to) predicate.
_WATCH = sorted([_addr_py("s3"), _addr_py("s17"), OTHER_CONTRACT])


@register(
    "t3_address_filter",
    tables=("customer",),
    oracle=f"""
        WITH {FIXTURE_CTE}
        SELECT key, from_addr, to_addr FROM tx
        WHERE from_addr IN ({", ".join(repr(a) for a in _WATCH)})
           OR to_addr IN ({", ".join(repr(a) for a in _WATCH)})
    """,
    tags=("t3", "filter", "pushdown"),
)
def t3(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """T3 — address watch filter (reference etl.rs:199-204) over the
    shared synthetic tx fixture: keep a tx iff sender or recipient is
    watched. The in-set predicate compiles to a scan-level filter."""
    from ..operators.transforms import filter_addresses

    tx = spark.sql(_TX_SQL)
    return filter_addresses(tx, _WATCH).select("key", "from_addr", "to_addr")


@register(
    "t3x_address_filter_dirty",
    tables=("customer",),
    oracle=f"""
        WITH {DIRTY_FIXTURE_CTE}
        SELECT key, from_addr, to_addr FROM dirty
        WHERE from_addr IN ({", ".join(repr(a) for a in _WATCH)})
           OR to_addr IN ({", ".join(repr(a) for a in _WATCH)})
    """,
    tags=("t3", "filter", "adversarial"),
)
def t3x(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """T3 on the DIRTY fixture: a NULL recipient makes ``to IN (...)``
    NULL, and NULL OR false is NULL — the row drops in both engines. A
    watched SENDER still surfaces the tx even when its recipient is NULL
    (true OR null = true), so corruption never hides a watched party the
    bytes still name."""
    from ..operators.transforms import filter_addresses

    tx = spark.sql(_DIRTY_TX_SQL)
    return filter_addresses(tx, _WATCH).select("key", "from_addr", "to_addr")
