"""Verification specs — SURVEY §2.5 (V1-V4), the reference's ``verify``
subcommand (bin/core-etl/src/verify.rs:27-94) as distributed window plans,
exercised on the ``events`` table (contiguous ``event_id`` plays the block
number; filtering to one event_type injects gaps)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import verify as VF
from .base import register


@register(
    "v02_sequence_gap_check",
    tables=("events",),
    oracle="""
        WITH s AS (
            SELECT event_id AS value,
                   lag(event_id) OVER (ORDER BY event_id) AS prev_value
            FROM events
            WHERE event_type = 'click' AND event_id IS NOT NULL
        )
        SELECT prev_value, value, value - prev_value - 1 AS missing
        FROM s
        WHERE prev_value IS NOT NULL AND value <> prev_value + 1
    """,
    tags=("verify", "v2", "window"),
)
def v02(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """V2 — ranged contiguity check via ``lag`` (reference verify.rs:48-59
    does a client-side adjacent-pair walk); the click-only subset makes the
    gap set non-trivial."""
    clicks = t["events"].filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("number")
    )
    return VF.sequence_gaps(clicks)


@register(
    "v02b_sequence_gap_scalable",
    tables=("events",),
    oracle="""
        WITH s AS (
            SELECT event_id AS v,
                   CAST(floor(event_id / 1000) AS BIGINT) AS bucket
            FROM events
            WHERE event_type = 'click' AND event_id IS NOT NULL
        ),
        agg AS (
            SELECT bucket, CAST(COUNT(v) AS BIGINT) AS cnt,
                   MIN(v) AS lo, MAX(v) AS hi
            FROM s GROUP BY bucket
        ),
        chained AS (
            SELECT bucket, cnt, lo, hi,
                   lag(hi) OVER (ORDER BY bucket) AS prev_hi,
                   lag(bucket) OVER (ORDER BY bucket) AS prev_bucket
            FROM agg
        )
        SELECT bucket, cnt, lo, hi, prev_hi
        FROM chained
        WHERE cnt <> hi - lo + 1
           OR (prev_hi IS NOT NULL
               AND (lo <> prev_hi + 1 OR bucket <> prev_bucket + 1))
    """,
    tags=("verify", "v2", "scale"),
)
def v02b(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """V2 at scale — contiguity via per-bucket count/min/max chaining
    instead of one globally-ordered window: the only global sort left is
    over ~|N|/B aggregated bucket rows (trivial at any scale), versus v02's
    single-partition sort of every value. Same gap *information* as v02 in
    coarser form (which buckets violate contiguity)."""
    clicks = t["events"].filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("number")
    )
    return VF.sequence_gaps_scalable(clicks, bucket=1000)


@register(
    "v03_positional_check",
    tables=("events",),
    oracle="""
        WITH s AS (
            SELECT event_id AS value,
                   row_number() OVER (ORDER BY event_id) - 1 AS pos
            FROM events
            WHERE event_type = 'view' AND event_id IS NOT NULL
        )
        SELECT value, pos FROM s WHERE value <> pos
    """,
    tags=("verify", "v3", "window"),
)
def v03(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """V3 — positional check from zero: i-th ordered row must equal i
    (reference verify.rs:74-79)."""
    views = t["events"].filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("number")
    )
    return VF.positional_check(views)


#: dirty sequence fixture (r14): every 53rd click id is NULLed — the
#: corrupt-warehouse shape where a key column itself is damaged. The
#: nulled ids become REAL gaps the checker must report; the NULL rows
#: themselves are excluded by the explicit contract (a NULL has no
#: position; v05 profiles null counts).
_DIRTY_SEQ = """
dirty AS (
    SELECT CASE WHEN event_id % 53 = 7 THEN NULL ELSE event_id END AS event_id,
           event_type
    FROM events
)
"""


def _dirty_events(t):
    return t["events"].select(
        F.when(F.col("event_id") % 53 == 7, F.lit(None).cast("long"))
        .otherwise(F.col("event_id")).alias("event_id"),
        "event_type",
    )


@register(
    "v02x_gap_check_dirty",
    tables=("events",),
    oracle=f"""
        WITH {_DIRTY_SEQ},
        s AS (
            SELECT event_id AS value,
                   lag(event_id) OVER (ORDER BY event_id) AS prev_value
            FROM dirty
            WHERE event_type = 'click' AND event_id IS NOT NULL
        )
        SELECT prev_value, value, value - prev_value - 1 AS missing
        FROM s
        WHERE prev_value IS NOT NULL AND value <> prev_value + 1
    """,
    tags=("verify", "v2", "window", "adversarial"),
)
def v02x(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """V2 on a corrupt key column: NULLed click ids surface as REAL gaps
    (the checker reports what's missing from the sequence) while the NULL
    rows are excluded by explicit contract — without the explicit filter
    the two engines disagree on where NULL sorts in the lag window and
    the NULL row itself vanishes from ``!=`` silently."""
    clicks = _dirty_events(t).filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("number")
    )
    return VF.sequence_gaps(clicks)


@register(
    "v03x_positional_check_dirty",
    tables=("events",),
    oracle=f"""
        WITH {_DIRTY_SEQ},
        s AS (
            SELECT event_id AS value,
                   row_number() OVER (ORDER BY event_id) - 1 AS pos
            FROM dirty
            WHERE event_type = 'view' AND event_id IS NOT NULL
        )
        SELECT value, pos FROM s WHERE value <> pos
    """,
    tags=("verify", "v3", "window", "adversarial"),
)
def v03x(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """V3 on a corrupt key column: every id after the first NULLed one is
    off-position (the check reports the shift), NULL rows excluded by
    the same explicit contract as v02x — in the bucketed two-phase plan
    a NULL key would otherwise form a silent NULL bucket that the offset
    join drops."""
    views = _dirty_events(t).filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("number")
    )
    return VF.positional_check(views)


@register(
    "v04_tip_comparison",
    tables=("events",),
    oracle="""
        SELECT max(event_id) AS stored_tip,
               CAST(1000000 AS BIGINT) AS chain_tip,
               CAST(1000000 AS BIGINT) - max(event_id) AS behind
        FROM events
    """,
    tags=("verify", "v4", "agg"),
)
def v04(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """V4 — stored tip vs chain tip (reference verify.rs:35-39,60-67) with a
    fixed synthetic chain tip of 1,000,000."""
    return VF.tip_lag(
        t["events"].withColumnRenamed("event_id", "number"), 1_000_000
    )


@register(
    "v05_column_profile",
    tables=("documents",),
    oracle="""
        SELECT 'lang' AS col, COUNT(*) AS n_rows, COUNT(lang) AS n_nonnull,
               COUNT(DISTINCT lang) AS n_distinct
        FROM documents
        UNION ALL
        SELECT 'source', COUNT(*), COUNT(source), COUNT(DISTINCT source)
        FROM documents
        UNION ALL
        SELECT 'text', COUNT(*), COUNT(text), COUNT(DISTINCT text)
        FROM documents
    """,
    tags=("verify", "profile", "data-quality"),
)
def v05(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Per-column data-quality profile (rows / non-nulls / exact
    distincts) in ONE corpus pass + a zero-shuffle stack — the
    drift-detection complement to the reference's structural checks
    (verify.rs:27-94 checks sequence shape; this checks content shape).
    The oracle recomputes each column independently, so the hash row
    proves the fused multi-distinct aggregate loses nothing."""
    return VF.profile_columns(t["documents"], ["lang", "source", "text"])


@register(
    "v06_referential_check",
    tables=("lineitem", "orders", "customer"),
    oracle="""
        SELECT 'lineitem_orphans' AS chk, CAST(count(*) AS BIGINT) AS n
        FROM lineitem ANTI JOIN orders ON l_orderkey = o_orderkey
        UNION ALL
        SELECT 'order_orphans', CAST(count(*) AS BIGINT)
        FROM orders ANTI JOIN customer ON o_custkey = c_custkey
        UNION ALL
        SELECT 'childless_orders', CAST(count(*) AS BIGINT)
        FROM orders ANTI JOIN lineitem ON o_orderkey = l_orderkey
    """,
    tags=("verify", "referential", "data-quality"),
)
def v06(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Cross-table referential-integrity audit: orphaned facts (lineitems
    without an order, orders without a customer) and childless parents —
    the FK checks a lake can't get from constraints. Three left-anti
    joins, each a single shuffle on its key; at 100 TB the same plan
    runs per-partition-pruned against only the freshly ingested buckets."""
    li, o, c = t["lineitem"], t["orders"], t["customer"]

    def chk(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(
            F.lit(name).alias("chk"), "n"
        )

    return (
        chk("lineitem_orphans", li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti"))
        .unionByName(chk("order_orphans", o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")))
        .unionByName(chk("childless_orders", o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_anti")))
    )


def _quar_leg(c: str) -> str:
    # nested CASE keeps TRY_CAST away from NaN rows — DuckDB's TRY_CAST
    # errors on NaN (Invalid Input) instead of returning NULL, the same
    # trap the ledger-cast contract guards (plans/relational.py)
    return f"""
        SELECT '{c}' AS col, COUNT(*) AS n_rows,
               COUNT({c}) AS n_nonnull,
               CAST(SUM(CASE WHEN isnan({c}) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
               CAST(SUM(CASE WHEN isinf({c}) THEN 1 ELSE 0 END) AS BIGINT) AS n_inf,
               CAST(SUM(CASE WHEN {c} IS NOT NULL AND NOT isnan({c})
                                  AND NOT isinf({c})
                             THEN CASE WHEN TRY_CAST({c} AS DECIMAL(12,2)) IS NULL
                                       THEN 1 ELSE 0 END
                             ELSE 0 END) AS BIGINT) AS n_overflow
        FROM lineitem"""


@register(
    "v07_measure_cast_quarantine",
    tables=("lineitem",),
    oracle=f"""
        SELECT col, n_rows, n_nonnull, n_nan, n_inf, n_overflow,
               n_nan + n_inf + n_overflow AS n_quarantined
        FROM ({_quar_leg("l_quantity")}
              UNION ALL {_quar_leg("l_extendedprice")}
              UNION ALL {_quar_leg("l_discount")}
              UNION ALL {_quar_leg("l_tax")})
    """,
    tags=("verify", "v7", "quarantine", "extension", "adversarial"),
)
def v07(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """V7 extension (r15, ADVICE r14): the ledger-cast quarantine audit —
    per measure column, how many values the DECIMAL(12,2) ledger grid
    rejects (NaN / ±Inf / finite overflow), i.e. how many rows SUM
    silently skips while COUNT(*)-based averages still count them. Zero
    everywhere on clean data (this oracle proves the formula); the
    adversarial sweep's NaN/Inf/1e308 arms make every class non-zero
    (pinned with exact counts in tests/test_adversarial_data.py). One
    scan, one 1-row aggregate, zero extra shuffles — cheap enough to run
    beside every money rollup."""
    return VF.measure_cast_quarantine(
        t["lineitem"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


@register(
    "v08_unverifiable_blocks",
    tables=("customer",),
    oracle="""
        WITH chain AS (
            SELECT CAST(c_custkey AS BIGINT) - 1 AS number,
                   md5(concat('blk', CAST(c_custkey - 1 AS STRING))) AS hash
            FROM customer WHERE c_custkey <= 150
        ),
        stored AS (
            SELECT number,
                   CASE WHEN number % 17 = 3 THEN NULL ELSE hash END AS hash
            FROM chain
        )
        SELECT DISTINCT number FROM stored
        WHERE hash IS NULL AND number IS NOT NULL
    """,
    tags=("verify", "v8", "integrity", "extension"),
)
def v08(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """V8 extension (r16, ADVICE r15): the NULL-hash integrity sweep.
    A stored block with a NULL hash can never anchor a parent-hash reorg
    check (detect_reorgs deliberately treats an unknowable parent as
    non-disagreeing), and no automatic path re-delivers heights below the
    resume point — so these rows must be surfaced and repaired
    (pipeline.repair_unverifiable_blocks: clean + targeted re-fetch; the
    full loop is pinned in tests/test_pipeline.py). Fixture: the shared
    deterministic chain with the dirty sweep's NULL-hash arm
    (number % 17 == 3, the same corruption k10x replays). One
    column-pruned scan, no shuffle before the distinct."""
    chain = spark.sql(
        """
        SELECT CAST(c_custkey AS BIGINT) - 1 AS number,
               CASE WHEN (CAST(c_custkey AS BIGINT) - 1) % 17 = 3 THEN NULL
                    ELSE md5(concat('blk', CAST(c_custkey - 1 AS STRING)))
               END AS hash
        FROM customer WHERE c_custkey <= 150
        """
    )
    return VF.unverifiable_blocks(chain)
