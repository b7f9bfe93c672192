"""Scale-technique specs — physical rewrites whose results must equal the
naive form (each oracle is the plain SQL): salted aggregation, salted join,
and exact percentiles (the ordered-agg surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import sketches, skew
from .base import register


@register(
    "g21_percentiles",
    tables=("lineitem",),
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "percentile", "ordered-agg"),
)
def g21(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Exact continuous percentiles per group (linear interpolation — the
    same definition as DuckDB's quantile_cont), rounded to 4 dp to absorb
    last-ulp differences in the interpolation arithmetic."""
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
            F.count("*").alias("n"),
        )
    )


@register(
    "g22_salted_aggregation",
    tables=("lineitem",),
    oracle="""
        SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN NOT isnan(l_quantity) THEN TRY_CAST(l_quantity AS DECIMAL(20,2)) END) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_suppkey
    """,
    tags=("skew", "salting", "agg"),
)
def g22(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Salted two-stage aggregation — identical result to a plain groupBy
    (the oracle), but a hot supplier key spreads over 16 reducers before the
    final ≤16-rows-per-key merge. Count and sum come from ONE salted pass
    (salted_count_sum, r13): the old salted_count⋈salted_sum join scanned
    twice and dropped the NULL-key group GROUP BY produces."""
    li = t["lineitem"]
    return skew.salted_count_sum(
        li, ["l_suppkey"], F.col("l_quantity").try_cast("decimal(20,2)"),
        count_col="n", sum_col="_total",
    ).select(
        "l_suppkey", "n", F.col("_total").cast("double").alias("total_qty")
    )


@register(
    "g23_salted_join",
    tables=("lineitem", "supplier"),
    oracle="""
        SELECT l.l_suppkey, s.s_name,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY l.l_suppkey, s.s_name
    """,
    tags=("skew", "salting", "join"),
)
def g23(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Salted equi-join — the small side replicated per salt so a hot
    suppkey spreads across tasks; result equals the plain join."""
    li = t["lineitem"].select(F.col("l_suppkey").alias("s_suppkey"))
    joined = skew.salted_join(li, t["supplier"].select("s_suppkey", "s_name"), "s_suppkey")
    return (
        joined.groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_items"))
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_name", "n_items")
    )


@register(
    "g21b_approx_sketches",
    tables=("lineitem",),
    oracle=None,  # sketch outputs are algorithm-specific (HLL++ / KLL-style
    # quantile digest); accuracy vs the exact aggregates is asserted in
    # tests/test_parity_extra assertions below (tests/test_llm_ops.py)
    tags=("agg", "sketch", "approx", "scale"),
)
def g21b(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Sketch aggregates — the single-pass scale substitutes for exact
    distinct/percentiles: HLL++ ``approx_count_distinct`` (rsd 1%) and
    ``percentile_approx`` (accuracy 10k). At 100 TB these are the
    default: bounded memory per group, one pass, mergeable partials —
    exact forms (g06, g21) stay for small groups and oracle parity."""
    # Self-validating output (VERDICT r15 directive 7): the same single
    # aggregation pass also computes the exact distinct and exact quantile
    # BANDS (±0.005 rank margin — 50× percentile_approx's guaranteed
    # 1/accuracy relative rank error), and `valid` pins every estimate
    # inside its bound. No extra pass: one more expand arm + one
    # exact-percentile buffer in the same groupBy.
    bands = F.percentile(
        F.col("l_extendedprice"),
        F.array(F.lit(0.495), F.lit(0.505), F.lit(0.945), F.lit(0.955)),
    )
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_approx"),
            F.percentile_approx("l_extendedprice", 0.95, 10000).alias("p95_approx"),
            F.count("*").alias("n"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            bands.alias("_bands"),
        )
        .withColumn(
            "valid",
            (F.col("exact_parts") > 0)
            & (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= 0.03 * F.col("exact_parts")  # 3 × rsd 1%
            )
            & F.col("p50_approx").between(
                F.element_at("_bands", 1), F.element_at("_bands", 2)
            )
            & F.col("p95_approx").between(
                F.element_at("_bands", 3), F.element_at("_bands", 4)
            ),
        )
        .drop("_bands")
    )


@register(
    "g21c_sampled_quantiles",
    tables=("lineitem",),
    oracle="""
        WITH sampled AS (
            SELECT l_returnflag, l_extendedprice
            FROM lineitem
            WHERE CAST('0x' || substr(md5(
                      CAST(l_orderkey AS VARCHAR) || '_' ||
                      CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT)
                  < 268435456
        )
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_sample,
               -- the |pct| < 1e12 CASE mirrors sampled_quantiles' grid
               -- bound (r16): floor-shift overflows on huge-but-legal
               -- measures (1e308 * 1e4 = +Inf here, a long clamp on
               -- Spark); above the bound the raw IEEE percentile is
               -- already bit-deterministic
               CASE WHEN abs(quantile_cont(l_extendedprice, 0.5)) < 1e12
                    THEN floor(quantile_cont(l_extendedprice, 0.5) * 10000.0) / 10000.0
                    ELSE quantile_cont(l_extendedprice, 0.5) END AS p50,
               CASE WHEN abs(quantile_cont(l_extendedprice, 0.95)) < 1e12
                    THEN floor(quantile_cont(l_extendedprice, 0.95) * 10000.0) / 10000.0
                    ELSE quantile_cont(l_extendedprice, 0.95) END AS p95
        FROM sampled GROUP BY l_returnflag
    """,
    tags=("agg", "percentile", "approx", "sketch", "portable", "scale"),
)
def g21c(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Deterministic-hash-sample quantiles (operators/sketches.py) — the
    replayable counterpart to g21b's engine-private digest: rows whose
    md5(row-key) word falls in the bottom 1/16 of hash space form the
    sample in EVERY engine, so the exact interpolated percentiles of the
    sample carry a full oracle. The filter precedes any shuffle — the
    percentile sort sees 1/16 of the rows, which is the sketch's scale
    win."""
    return sketches.sampled_quantiles(
        t["lineitem"],
        "l_extendedprice",
        # concat (NULL-propagating), not concat_ws (NULL-skipping): the
        # oracle's `||` makes the whole key NULL when l_orderkey is NULL,
        # excluding the row from the sample — concat_ws instead hashed
        # the PARTIAL key ("_linenumber") and admitted NULL-key rows on
        # the Spark side only, a live membership divergence found by the
        # dirty sweep's NULL-PK arm (same trap weighted_sample hit r15;
        # Rule 1: undefined identities leave the sample on both sides).
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("_"),
            F.col("l_linenumber").cast("string"),
        ),
        probs=(0.5, 0.95),
        group_cols=("l_returnflag",),
        shift=4,
    )


@register(
    "g21d_loglin_quantiles",
    tables=("lineitem",),
    oracle=sketches.loglin_quantiles_sql(
        "lineitem",
        "l_extendedprice",
        (0.5, 0.95),
        group_expr="l_returnflag",
        group_alias="l_returnflag",
    ),
    tags=("agg", "percentile", "approx", "sketch", "portable", "mergeable",
          "scale"),
)
def g21d(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """MERGEABLE portable quantiles (operators/sketches.py loglin family) —
    the bounded-state completion of the quantile trio: g21 is exact
    (full sort), g21c replays exactly but its hash-sample state grows
    with the data, this one is an HdrHistogram-style log-linear
    histogram — ≤ ~1k counter rows per group however large the input,
    union+sum mergeable (1000-executor combine AND day-over-day
    incremental stores), with every bucket boundary an exact dyadic
    rational so histogram AND estimates carry a full value-hash oracle.
    Relative error bounded by the 1/16-octave sub-bucket width
    (accuracy vs exact pinned in test_sketches)."""
    hist = sketches.loglin_histogram(
        t["lineitem"], "l_extendedprice", group_cols=("l_returnflag",)
    )
    return sketches.loglin_quantiles(
        hist, (0.5, 0.95), group_cols=("l_returnflag",)
    )


def _cms_oracle() -> str:
    """CMS replay — the cell expression and row fan-out come from
    operators.sketches so the two dialects cannot drift."""
    col_expr = sketches.cms_col_expr_sql("l_suppkey")
    return f"""
        WITH rows_(row_idx) AS (VALUES {sketches.CMS_ROWS_VALUES}),
        base_cells AS (
            SELECT row_idx, {col_expr} AS col_idx
            FROM lineitem CROSS JOIN rows_
        ),
        sketch AS (
            SELECT row_idx, col_idx, count(*) AS n
            FROM base_cells GROUP BY row_idx, col_idx
        ),
        probes AS (
            -- NULL is not a key: CMS cells hash md5(key), which is NULL
            -- for NULL and counts nothing, so a NULL heavy hitter could
            -- never be estimated — it is excluded from the report on
            -- both engines (r13 adversarial-data audit)
            SELECT l_suppkey, count(*) AS exact_n
            FROM lineitem WHERE l_suppkey IS NOT NULL
            GROUP BY l_suppkey
            ORDER BY exact_n DESC, l_suppkey LIMIT 20
        ),
        probe_cells AS (
            SELECT p.l_suppkey, p.exact_n, row_idx,
                   {sketches.cms_col_expr_sql("p.l_suppkey")} AS col_idx
            FROM probes p CROSS JOIN rows_
        )
        SELECT pc.l_suppkey,
               CAST(pc.exact_n AS BIGINT) AS exact_n,
               CAST(min(coalesce(s.n, 0)) AS BIGINT) AS cms_n
        FROM probe_cells pc
        LEFT JOIN sketch s USING (row_idx, col_idx)
        GROUP BY pc.l_suppkey, pc.exact_n
    """


@register(
    "g49_cms_heavy_hitters",
    tables=("lineitem",),
    oracle=_cms_oracle(),
    tags=("agg", "sketch", "approx", "portable", "heavy-hitters", "scale"),
)
def g49(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Portable Count-Min frequency sketch (operators/sketches.py) — the
    third leg of the replayable-sketch family (HLL cardinality g06c,
    sample quantiles g21c, CMS frequency here). Builds a 4×1024 counter
    table over l_suppkey in one partial-agg pass (only the ≤4096-cell
    sketch shuffles), then point-estimates the 20 exact heavy hitters:
    cms_n ≥ exact_n always, overshoot ≈ n_total/width before the 4-row
    min. Fully deterministic given md5, so state AND estimates carry a
    value-hash oracle — this is the hot-key detector (token addresses,
    hot shingles) you can afford at 100 TB and audit in any engine."""
    li = t["lineitem"]
    sketch = sketches.cms_build(li, "l_suppkey")
    # probes feeds both the estimate and the final join — lazily
    # checkpointed (20 rows) so the exact-count aggregation runs once,
    # not once per appearance (the l44 union-reuse lesson).
    # NULL is not a key: md5(NULL) cells count nothing in the sketch, so
    # a NULL heavy hitter could never be estimated — excluded from the
    # report (the oracle applies the same rule).
    probes = (
        li.filter(F.col("l_suppkey").isNotNull())
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("l_suppkey"))
        .limit(20)
    ).localCheckpoint(eager=False)
    est = sketches.cms_estimate(sketch, probes.select("l_suppkey"), "l_suppkey")
    return probes.join(est, "l_suppkey").select(
        "l_suppkey",
        F.col("exact_n").cast("long").alias("exact_n"),
        "cms_n",
    )


def _hotkey_oracle() -> str:
    """detect_hot_keys replay: sample → candidates → CMS verify → share
    filter, all from the shared sketch constants."""
    col_expr = sketches.cms_col_expr_sql("skewkey")
    return f"""
        WITH rows_(row_idx) AS (VALUES {sketches.CMS_ROWS_VALUES}),
        skewed AS (
            SELECT CASE WHEN l_orderkey % 4 = 0 THEN -1
                        WHEN l_orderkey % 4 = 1 THEN -2
                        ELSE l_orderkey END AS skewkey,
                   CAST(l_orderkey AS VARCHAR) || '_' ||
                   CAST(l_linenumber AS VARCHAR) AS rk
            FROM lineitem
        ),
        candidates AS (
            SELECT DISTINCT skewkey FROM skewed
            WHERE CAST('0x' || substr(md5('hotkeys1:' || rk), 1, 8) AS BIGINT)
                  < 16777216
        ),
        base_cells AS (
            -- skewkey IS NOT NULL mirrors cms_build's r16 NULL-key
            -- exclusion (COUNT DISTINCT semantics): a NULL key mints no
            -- cells, so it must not inflate the row-0 total either
            SELECT row_idx, {col_expr} AS col_idx
            FROM skewed CROSS JOIN rows_
            WHERE skewkey IS NOT NULL
        ),
        sketch AS (
            SELECT row_idx, col_idx, count(*) AS n
            FROM base_cells GROUP BY row_idx, col_idx
        ),
        -- n_total read off the sketch, not a COUNT(*) scan — every row
        -- lands exactly one cell in hash row 0 (mirrors detect_hot_keys)
        total AS (SELECT SUM(n) AS n FROM sketch WHERE row_idx = 0),
        probe_cells AS (
            SELECT c.skewkey, row_idx,
                   {sketches.cms_col_expr_sql("c.skewkey")} AS col_idx
            FROM candidates c CROSS JOIN rows_
        ),
        est AS (
            SELECT pc.skewkey, CAST(min(coalesce(s.n, 0)) AS BIGINT) AS est_n
            FROM probe_cells pc LEFT JOIN sketch s USING (row_idx, col_idx)
            GROUP BY pc.skewkey
        )
        SELECT skewkey, est_n,
               est_n / CAST((SELECT n FROM total) AS DOUBLE) AS est_share
        FROM est
        WHERE est_n / CAST((SELECT n FROM total) AS DOUBLE) >= 0.05
    """


@register(
    "g50_hot_key_detection",
    tables=("lineitem",),
    oracle=_hotkey_oracle(),
    tags=("skew", "sketch", "diagnostic", "scale"),
)
def g50(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Sketch-driven hot-key detection (operators/skew.py::detect_hot_keys)
    — the pre-join diagnostic for AQE-blind skew contexts: a deterministic
    1/256 row sample surfaces candidate keys, a Count-Min pass verifies
    their global share, nothing ever groupBys the raw key. The fixture
    plants two hot keys (-1/-2, ~25% of rows each) among the ~15k-row
    orderkey tail; min_share=0.05 must detect exactly those two. CMS
    never undercounts, so a hot key cannot slip under the threshold."""
    li = t["lineitem"].select(
        F.when(F.col("l_orderkey") % 4 == 0, F.lit(-1))
        .when(F.col("l_orderkey") % 4 == 1, F.lit(-2))
        .otherwise(F.col("l_orderkey"))
        .cast("long")
        .alias("skewkey"),
        # concat, not concat_ws: NULL-propagating like the oracle's `||`
        # (the NULL-PK arm found concat_ws hashing partial keys — r16)
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("_"),
            F.col("l_linenumber").cast("string"),
        ).alias("rk"),
    )
    return skew.detect_hot_keys(
        li, "skewkey", F.col("rk"), min_share=0.05, sample_shift=8
    )


def _zorder_oracle() -> str:
    """Morton interleave as plain bit arithmetic — generated to keep the
    64 shift/mask terms in lockstep with operators.layout.zorder_value."""
    terms = []
    for col, shift in (("l_orderkey", 0), ("l_partkey", 1)):
        for i in range(16):
            terms.append(f"(((({col} % 65536) >> {i}) & 1) << {2 * i + shift})")
    joined = " + ".join(terms)
    return f"""
        SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
               CAST(l_partkey AS BIGINT) AS l_partkey,
               CAST({joined} AS BIGINT) AS zvalue
        FROM lineitem
    """


@register(
    "g30_zorder_layout",
    tables=("lineitem",),
    oracle=_zorder_oracle(),
    tags=("layout", "zorder", "clustering", "pruning"),
)
def g30(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Z-order (Morton) clustering key for the write path — interleaving
    l_orderkey/l_partkey bits so files sorted on zvalue carry tight
    min/max stats on BOTH columns (the Delta/Iceberg OPTIMIZE ZORDER
    trick as pure codegen-able column arithmetic; the layout rewrite
    itself is operators.layout.cluster_by_zorder, exercised in
    tests/test_llm_ops.py). Zero shuffle for the encode; the clustering
    rewrite is one range-repartition."""
    from ..operators.layout import zorder_value

    li = t["lineitem"]
    return li.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_partkey").cast("long").alias("l_partkey"),
        zorder_value(F.col("l_orderkey") % 65536, F.col("l_partkey") % 65536).alias(
            "zvalue"
        ),
    )


@register(
    "g33_bucketed_colocated_join",
    tables=("orders", "customer"),
    oracle="""
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN NOT isnan(o_totalprice) THEN TRY_CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    tags=("scale", "bucketing", "join", "colocated"),
)
def g33(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Bucketed co-located join, driver-witnessed: both sides are written
    as 8-bucket managed mirrors on the customer key, so the fact⋈dim
    equi-join plans WITHOUT an Exchange on either side (asserted in
    tests/test_plans.py) — the 100 TB answer when both sides are too big
    to broadcast and the join recurs. The oracle is the plain join over
    the original parquet: bucketing is a physical layout, never an
    answer change. Result is collected (≤ #segments rows) so the temp
    catalog tables can be dropped before returning."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tf

    root = _tf.mkdtemp(prefix="g33_buckets_")
    try:
        for name, df, key in (
            ("g33_orders_b", t["orders"], "o_custkey"),
            ("g33_customer_b", t["customer"], "c_custkey"),
        ):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.mode("overwrite")
                .bucketBy(8, key)
                .sortBy(key)
                .format("parquet")
                .option("path", _os.path.join(root, name))
                .saveAsTable(name)
            )
        o, c = spark.table("g33_orders_b"), spark.table("g33_customer_b")
        joined = (
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").try_cast("decimal(18,2)"))
                .cast("double")
                .alias("total"),
            )
        )
        rows = [(r.c_mktsegment, r.n_orders, float(r.total)) for r in joined.collect()]
        return spark.createDataFrame(
            rows, "c_mktsegment string, n_orders bigint, total double"
        )
    finally:
        for name in ("g33_orders_b", "g33_customer_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        _shutil.rmtree(root, ignore_errors=True)
