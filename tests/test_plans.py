"""Physical-plan regression tests: the properties that matter at 100 TB must
survive refactors — dim joins broadcast (no sort-merge at headline scale),
predicates reach the parquet scan, aggregations are partial+final."""

from __future__ import annotations

import re

import pytest

from core_etl_spark.plans import all_specs

SPECS = all_specs()


def _plan(spark, sf_dir, name: str) -> str:
    df = SPECS[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    ["g02_join_agg_topk_tpch_q3", "g03_star_join_tpch_q5", "g20_decorrelated_subquery"],
)
def test_headline_joins_broadcast(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dim-table join regressed to a shuffle join"


def test_corpus_telemetry_broadcasts_and_prunes(spark, sf_dir):
    """c10's three branches each reduce to lang cardinality before the
    joins (so both joins broadcast, never SMJ), and every documents scan
    must prune to exactly its branch's columns — a telemetry pass that
    reads `text` for the quantile branch would be 100 TB-wrong."""
    plan = _plan(spark, sf_dir, "c10_corpus_telemetry")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    schemas = sorted(
        s for s in __import__("re").findall(r"ReadSchema: struct<([^>]*)>", plan)
    )
    assert schemas == [
        "doc_id:bigint,lang:string,n_chars:bigint",
        "lang:string",
        "lang:string,text:string",
    ] or schemas == [
        "doc_id:bigint,lang:string,n_chars:bigint",
        "lang:string",
        "text:string,lang:string",
    ], schemas


@pytest.mark.parametrize(
    "name", ["g01_hash_agg_tpch_q1", "g02_join_agg_topk_tpch_q3", "g03_star_join_tpch_q5"]
)
def test_filters_reach_the_scan(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed, "no parquet scans found"
    assert any(p.strip() for p in pushed), "no predicate was pushed to any scan"


def test_hash_agg_is_partial_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "g01_hash_agg_tpch_q1")
    # map-side combine: two HashAggregate nodes around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


@pytest.mark.parametrize(
    "name",
    [
        "l06_ngram_jaccard_dedup",
        "l07_minhash_lsh_dedup",
        "l10_ann_lsh_topk",
        "l11_embedding_neardup",
    ],
)
def test_llm_path_has_no_cartesian(spark, sf_dir, name):
    """The dedup/ANN candidate joins must stay equi-joins — a cartesian
    product or broadcast-nested-loop here is the 100 TB scale-killer."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name} plans a nested-loop join"


def test_l12_ivf_candidate_join_is_equi(spark, sf_dir):
    """IVF's cell-assignment pass may broadcast-nested-loop over the tiny
    constant centroid table — that's bounded (K rows) and fine. The
    corpus-sized candidate join must be a broadcast *hash* equi-join on the
    cell id: no CartesianProduct anywhere."""
    plan = _plan(spark, sf_dir, "l12_ann_ivf_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, "candidate join lost its equi-join shape"


def test_l09_broadcasts_query_side(spark, sf_dir):
    """Brute-force top-k must broadcast the (small) query set, so the
    corpus side streams without a shuffle."""
    plan = _plan(spark, sf_dir, "l09_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, (
        "l09 no longer broadcasts the query side"
    )


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "g01_hash_agg_tpch_q1")
    m = re.search(r"ReadSchema: struct<([^\n]*)", plan)
    assert m, "no ReadSchema in scan"
    # the plan string may truncate the schema with '...'; count the field
    # separators that survived — 16 lineitem columns would show far more
    cols = [c for c in m.group(1).rstrip(">. ").split(",") if c]
    assert 0 < len(cols) <= 8, f"scan reads too many columns: {cols}"


def test_v02b_sorts_only_aggregated_buckets(spark, sf_dir):
    """The scalable gap check's only global sort must sit ABOVE the bucket
    aggregation (sorting ~|N|/B rows), never on the raw value stream — the
    whole point of v02b vs v02 at 100 TB."""
    plan = _plan(spark, sf_dir, "v02b_sequence_gap_scalable")
    assert plan.count("HashAggregate") >= 2, "bucket agg lost its partial phase"
    # every Sort node must order by bucket (post-agg), not the raw value col
    for m in re.finditer(r"Sort \[([^\]]*)\]", plan):
        assert "bucket" in m.group(1), f"raw-value sort leaked into plan: {m.group(1)}"


def test_l16_vocab_topk_is_take_ordered(spark, sf_dir):
    """The vocabulary top-k must plan as TakeOrderedAndProject (distributed
    heaps + driver merge), never a single-partition sort of the vocab."""
    plan = _plan(spark, sf_dir, "l16_vocab_topk")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2, "token count lost map-side combine"


@pytest.mark.parametrize(
    "name", ["l13_repetition_stats", "l14_pii_scrub"]
)
def test_single_pass_text_ops_have_no_shuffle(spark, sf_dir, name):
    """Repetition stats and PII scrub are pure projection/filter passes —
    any Exchange in the plan is a regression."""
    plan = _plan(spark, sf_dir, name)
    assert "Exchange" not in plan, f"{name} grew a shuffle"


def test_l15_sampler_broadcast_dispatch_no_corpus_shuffle(spark, sf_dir):
    """Hash-gate stratified sampling dispatches rates via a broadcast join
    (strata-count-proof, r07 — same form as l35); the corpus side must
    still never shuffle: a broadcast exchange is expected, a hash-partition
    exchange is a regression."""
    import re

    plan = _plan(spark, sf_dir, "l15_stratified_sample")
    assert "BroadcastHashJoin" in plan
    shuffles = [l for l in plan.splitlines()
                if re.search(r"\bExchange hashpartitioning", l)]
    assert not shuffles, shuffles


def test_l19_decontamination_single_corpus_pass(spark, sf_dir):
    """The benchmark shingle set must broadcast (never shuffle the corpus
    for the join), and the corpus must be scanned once: exactly one
    doc_id Exchange downstream of the join, no SortMergeJoin, no
    cartesian."""
    plan = _plan(spark, sf_dir, "l19_decontamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
    assert plan.count("hashpartitioning(doc_id") == 1, (
        "corpus is being re-scanned/re-shuffled — decontamination must be one pass"
    )


def test_l20_packing_single_exchange(spark, sf_dir):
    """Sequence packing is one window per shard: exactly one Exchange
    (the group hash-partition) and no join."""
    plan = _plan(spark, sf_dir, "l20_sequence_packing")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_l21_hash_split_no_shuffle(spark, sf_dir):
    """Split assignment is a narrow projection — zero Exchange."""
    plan = _plan(spark, sf_dir, "l21_hash_split")
    assert "Exchange" not in plan


def test_l19x_decontamination_shuffle_join(spark, sf_dir):
    """The corpus-vs-corpus scale path must NOT broadcast the benchmark
    side: the shingle join runs as a shuffle hash join (both sides
    hash-partitioned on the key) — the strategy that survives a
    benchmark too big for a broadcast."""
    plan = _plan(spark, sf_dir, "l19x_decontamination_shuffle")
    assert "ShuffledHashJoin" in plan, "shuffle_hash hint lost"
    assert "BroadcastHashJoin" not in plan, (
        "l19x regressed to broadcast — that's l19; this spec exists to "
        "prove the no-broadcast path"
    )


def test_l26_training_shuffle_single_exchange(spark, sf_dir):
    """Epoch shuffle + shard rank is exactly one hash-partition Exchange
    (on shard) + in-partition sort — the same layout the sharded writer
    needs, so the rank is free at write time."""
    plan = _plan(spark, sf_dir, "l26_training_shuffle")
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(shard" in plan
    assert "Join" not in plan


def test_l27_quality_classifier_no_shuffle(spark, sf_dir):
    """The hashed linear model is a per-row array expression — zero
    Exchange; at 100 TB it fuses into the corpus scan."""
    plan = _plan(spark, sf_dir, "l27_quality_classifier")
    assert "Exchange" not in plan


def test_g28_dim_joins_broadcast(spark, sf_dir):
    """Q10 shape: both dim joins (customer, nation) must broadcast; the
    fact side never sort-merges."""
    plan = _plan(spark, sf_dir, "g28_returns_by_customer_tpch_q10")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_g29_not_in_is_hash_anti_join(spark, sf_dir):
    """The NOT IN subquery must plan as a broadcast HASH anti join — a
    null-aware BroadcastNestedLoopJoin here would be the classic NOT-IN
    scale trap (per-row probe of the whole build side)."""
    plan = _plan(spark, sf_dir, "g29_supplier_diversity_tpch_q16")
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("name", ["l30_gopher_quality", "l31_doc_chunking"])
def test_new_text_ops_no_shuffle(spark, sf_dir, name):
    """Gopher rules and sliding-window chunking are per-row expression
    batteries/generators — zero Exchange, fused into the scan."""
    plan = _plan(spark, sf_dir, name)
    assert "Exchange" not in plan, f"{name} grew a shuffle"


def test_l34_bloom_bit_joins_broadcast(spark, sf_dir):
    """The Bloom prefilter's k bit-joins must all be broadcast (the bitmap
    is the bounded side) and the plan must stay cartesian-free; the exact
    verification join must NOT broadcast the benchmark string set."""
    plan = _plan(spark, sf_dir, "l34_bloom_decontamination")
    assert plan.count("BroadcastHashJoin") >= 3  # one per bit position
    assert "CartesianProduct" not in plan
    assert "ShuffledHashJoin" in plan  # the verification join


def test_g30_zorder_stays_in_codegen(spark, sf_dir):
    """The Morton encode is pure column arithmetic — no shuffle, no UDF,
    whole-stage codegen over the scan."""
    plan = _plan(spark, sf_dir, "g30_zorder_layout")
    assert "Exchange" not in plan
    assert "Python" not in plan  # no Python UDF fallback
    assert "*(1) Project" in plan  # the * prefix = whole-stage codegen


def test_l36_spans_no_cartesian_and_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "l36_duplicated_spans")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # gram DF agg is partial+final


def test_l35_mixture_broadcast_dispatch(spark, sf_dir):
    """After the (driver-side, strata-bounded) count, the admitted corpus
    is one pass over the data: the threshold dispatch is a BROADCAST join
    against the tiny thresholds frame (strata-count-proof — r07 replaced
    the per-stratum CASE chain, VERDICT r06 directive 6), so the corpus
    side still never shuffles: no shuffle Exchange, no sort-merge join."""
    plan = _plan(spark, sf_dir, "l35_mixture_rebalance")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # broadcast exchange only — the corpus side must not shuffle
    import re
    shuffles = [l for l in plan.splitlines()
                if re.search(r"\bExchange hashpartitioning", l)]
    assert not shuffles, shuffles
    assert plan.count("CASE WHEN") < 10


@pytest.mark.parametrize(
    "name",
    [
        "g39_mincost_supplier_tpch_q2",
        "g40_volume_shipping_tpch_q7",
        "g41_market_share_tpch_q8",
        "g42_product_profit_tpch_q9",
        "g43_important_parts_tpch_q11",
        "g44_order_distribution_tpch_q13",
        "g45_top_supplier_tpch_q15",
        "g46_disjunct_revenue_tpch_q19",
        "g47_promotion_suppliers_tpch_q20",
        "g48_dormant_customers_tpch_q22",
    ],
)
def test_tpch_completion_plans_decorrelate(spark, sf_dir, name):
    """The ten r07 TPC-H shapes must plan like the first twelve: every
    correlated subquery decorrelated to a hash join (no per-row execution,
    no cartesian/nested-loop fallback) and the base filters pushed to the
    parquet scans."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [" in plan


def test_g46_disjuncts_push_to_both_scans(spark, sf_dir):
    """Q19's defining optimization: the OR-of-ANDs spans both join sides,
    but the per-side implied disjunctions (quantity bands → lineitem,
    brand/size bands → part) must still reach each scan's PushedFilters,
    with column pruning intact."""
    plan = _plan(spark, sf_dir, "g46_disjunct_revenue_tpch_q19")
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan  # lineitem side
    assert "EqualTo(p_brand" in plan                     # part side
    assert "struct<l_partkey:bigint,l_quantity:double," in plan  # pruned scan


def test_g33_bucketed_join_no_exchange(spark, sf_dir):
    """Both sides bucketed on the join key → the equi-join must plan
    without an Exchange on either side (the shuffle-free co-location
    the spec exists to witness)."""
    import os
    import shutil
    import tempfile

    from core_etl_spark.io import load_tables

    t = load_tables(spark, sf_dir, ("orders", "customer"), register=False)
    root = tempfile.mkdtemp(prefix="g33_plan_")
    try:
        for name, df, key in (
            ("g33p_orders_b", t["orders"], "o_custkey"),
            ("g33p_customer_b", t["customer"], "c_custkey"),
        ):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.mode("overwrite").bucketBy(8, key).sortBy(key)
                .format("parquet").option("path", os.path.join(root, name))
                .saveAsTable(name)
            )
        o, c = spark.table("g33p_orders_b"), spark.table("g33p_customer_b")
        # at test SF the dim side fits the 64 MB broadcast threshold; the
        # bucketed-join property being witnessed is the BIG-side case, so
        # disable broadcast for the assertion (exactly the 100 TB regime)
        old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = o.join(c, o["o_custkey"] == c["c_custkey"])
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
    finally:
        for name in ("g33p_orders_b", "g33p_customer_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(root, ignore_errors=True)


def test_snapshot_rotation_front_loads_stalest():
    # r11: the driver-snapshot rotation is computed from the committed
    # CORRECTNESS history — after the manual _REWITNESS head (specs whose
    # behavior changed this round), specs must appear in ascending order
    # of latest driver-witnessed round, never-witnessed (new) specs first,
    # so every 50-slot snapshot burns the stalest specs by construction.
    from core_etl_spark import plans

    latest = plans._witness_rounds()
    names = list(plans.all_specs())
    assert set(names) == set(plans.REGISTRY)
    k = len(plans._REWITNESS)
    assert names[:k] == list(plans._REWITNESS)
    # r16 (revising r15's oracle-first order, which permanently starved
    # the five rows-only specs of seats and froze the global witness
    # floor at their last-seen round): staleness is the PRIMARY key —
    # ascending latest-witnessed round across the whole rest — and
    # rows-only specs yield only WITHIN a staleness tie (their rows-only
    # driver row carries weaker evidence than a hash match, but since
    # r16 each emits an in-plan all-true `valid` column, so a seat is
    # not wasted).
    rest = names[k:]
    rounds = [latest.get(n, 0) for n in rest]
    assert rounds == sorted(rounds), "rotation is not oldest-first"
    for rnd in set(rounds):
        tie = [n for n in rest if latest.get(n, 0) == rnd]
        flags = [plans.REGISTRY[n].oracle is None for n in tie]
        assert flags == sorted(flags), (
            f"round-{rnd} tie: a rows-only spec precedes an oracle-backed one"
        )
    # every _REWITNESS name must resolve (the r05 fail-loud guard)
    assert not set(plans._REWITNESS) - set(plans.REGISTRY)
    # The optimum-cycle arithmetic derives from the LIVE registry, never a
    # literal in a comment (VERDICT r12 directive 6): with 50 driver slots,
    # full re-witness of the surface takes ceil(len(REGISTRY)/50) rounds.
    import math

    optimum_rounds = math.ceil(len(plans.REGISTRY) / 50)
    assert optimum_rounds == math.ceil(len(names) / 50)
    assert len(plans.REGISTRY) >= 163, "registry shrank — specs were deleted"


def test_g21d_histogram_shuffles_buckets_not_rows(spark, sf_dir):
    # The mergeable-quantile scale claim: the histogram groupBy carries a
    # map-side partial count (mappers emit <= bucket-count rows per
    # group), and the quantile window runs over the tiny histogram — the
    # data itself is touched by exactly one scan.
    plan = _plan(spark, sf_dir, "g21d_loglin_quantiles")
    assert plan.count("HashAggregate") >= 2, "histogram lost map-side combine"
    assert plan.count("Scan parquet") == 1, "quantile stage re-scanned the data"


@pytest.mark.parametrize(
    "name",
    ["t4678_cbc20_extract", "t45x_transfer_decode_dirty",
     "t4678x_cbc20_extract_dirty"],
)
def test_decode_fixture_is_materialized_behind_a_barrier(spark, sf_dir, name):
    """r16: without a plan barrier on the synthetic fixture,
    CollapseProject inlines the md5-chain `input` expression into every
    decode reference and the generated processNext() exceeds the JVM's
    64 KB method limit — Spark silently drops the stage to interpreted
    execution (five codegen fallbacks observed across these three specs).
    The barrier (lazy localCheckpoint → an RDD scan) keeps decode
    expressions over attribute refs — the production plan shape, since
    real calldata is a stored column."""
    plan = _plan(spark, sf_dir, name)
    assert "ExistingRDD" in plan, plan[:800]


def test_bench_calibration_probes(spark):
    """Both bench host-drift indexes (r16: ALU `calibration` + memory-bound
    `calibration_mem`) must run and return positive wall times — the
    artifact's adjudication protocol (SCALE.md) depends on both keys being
    present and meaningful in every future BENCH JSON."""
    import bench

    alu = bench._calibrate(spark, runs=1)
    mem = bench._calibrate_mem(spark, runs=1)
    assert len(alu) == 1 and alu[0] > 0
    assert len(mem) == 1 and mem[0] > 0


def test_bench_artifact_contract():
    """ADVICE r16: the JSON assembly itself (not just the probes) is the
    contract the SCALE.md dual-index adjudication depends on — pin that
    `build_artifact` emits BOTH calibration keys with sec/pre_runs/
    post_runs plus the unchanged metric/value/queries/runs/spread/sf
    keys, with value = the sum of the per-query minima."""
    import bench

    timings = {"q1": 1.0, "q2": 2.5}
    runs = {"q1": [1.2, 1.0], "q2": [2.5, 3.0]}
    art = bench.build_artifact(
        timings, runs, [0.3, 0.28], [0.2, 0.21], [0.5, 0.45], [0.4, 0.41], "0.1"
    )
    assert art["metric"] == "headline_query_wall_seconds"
    assert art["unit"] == "sec"
    assert art["value"] == 3.5
    assert art["queries"] == timings and art["runs"] == runs
    assert art["sf"] == 0.1
    for key, post in (("calibration", 0.2), ("calibration_mem", 0.4)):
        block = art[key]
        assert set(block) == {"sec", "pre_runs", "post_runs"}
        assert block["sec"] == post  # min of the POST bracket
        assert len(block["pre_runs"]) == 2 and len(block["post_runs"]) == 2
    assert art["spread"]["q1"] == 1.2
