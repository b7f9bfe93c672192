"""Portable-sketch operators (operators/sketches.py): accuracy bounds,
merge associativity, branch coverage of the estimator, and the plan
shapes that make them 100 TB-safe. Cross-engine value parity for the
g06c/g21c specs is covered by tests/test_parity.py like every other
registered spec; these tests pin the properties parity can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from core_etl_spark.io import load_tables
from core_etl_spark.operators import sketches


def _frame_equal(a, b, keys):
    sa = sorted(tuple(r) for r in a.select(*keys).collect())
    sb = sorted(tuple(r) for r in b.select(*keys).collect())
    return sa == sb


def _dead_pid() -> int:
    """A pid that is deterministically judged DEAD by the r16 pid-first
    sentinel semantics: a reaped child's pid either no longer exists
    (ProcessLookupError -> stale) or was recycled by a process that
    started AFTER any backdated sentinel timestamp (/proc ctime check ->
    stale). The old fixtures used pid 1, which is ALIVE — exactly the
    live-holder case the r16 fix now refuses to break."""
    import subprocess

    p = subprocess.Popen(["true"])
    p.wait()  # reaped — the pid is free (or recycled by a NEWER process)
    return p.pid


def test_hll_linear_counting_accuracy_small(spark):
    # 5 distinct keys: deep in the linear-counting branch, where the
    # correction is near-exact.
    df = spark.range(5).select(F.col("id").alias("k"))
    est = sketches.hll_count_distinct(df, "k").collect()[0]
    assert est["zero_buckets"] > 0
    assert abs(est["estimate"] - 5) < 0.01


def test_hll_raw_branch_accuracy_large(spark):
    # 200k distinct keys forces the raw harmonic-mean branch
    # (2.5m = 10,240 for p=12); standard error is 1.04/sqrt(4096) = 1.6%,
    # so 5% is a >3-sigma bound on this fixed (deterministic) hash set.
    df = spark.range(200_000).select(F.col("id").alias("k"))
    est = sketches.hll_count_distinct(df, "k").collect()[0]
    raw_threshold = 2.5 * 4096
    assert est["estimate"] > raw_threshold  # really the raw branch
    assert abs(est["estimate"] / 200_000 - 1) < 0.05


def test_hll_grouped_accuracy_vs_exact(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("orders",))
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in t["orders"]
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r["o_orderstatus"]: r["estimate"]
        for r in sketches.hll_count_distinct(
            t["orders"], "o_custkey", group_cols=("o_orderstatus",)
        ).collect()
    }
    assert set(approx) == set(exact)
    for status, n in exact.items():
        assert abs(approx[status] / n - 1) < 0.05, (status, approx[status], n)


def test_hll_merge_equals_single_pass(spark, sf_dir):
    # The partial-sketch contract: registers built per half and merged must
    # be frame-identical to a single pass — this is what lets 1000
    # executors (or 1000 daily increments) combine without re-reading.
    t = load_tables(spark, sf_dir, ("orders",))
    orders = t["orders"]
    whole = sketches.hll_registers(
        orders, "o_custkey", group_cols=("o_orderstatus",)
    )
    halves = [
        sketches.hll_registers(
            orders.filter(F.col("o_orderkey") % 2 == i),
            "o_custkey",
            group_cols=("o_orderstatus",),
        )
        for i in (0, 1)
    ]
    merged = sketches.hll_merge(halves, group_cols=("o_orderstatus",))
    assert _frame_equal(whole, merged, ["o_orderstatus", "bucket", "rho"])


def test_hll_merge_idempotent(spark):
    # max-merge is idempotent: merging a sketch with itself changes nothing.
    df = spark.range(1000).select(F.col("id").alias("k"))
    regs = sketches.hll_registers(df, "k")
    merged = sketches.hll_merge([regs, regs])
    assert _frame_equal(regs, merged, ["bucket", "rho"])


def test_hll_registers_plan_has_partial_agg(spark):
    # The scale claim: mappers emit <= m rows per group because max(rho)
    # combines map-side — the plan must show partial+final HashAggregate.
    df = spark.range(10_000).select(F.col("id").alias("k"))
    plan = (
        sketches.hll_registers(df, "k")._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") >= 2, "register build lost map-side combine"


def test_hll_wide_word_matches_python_and_duckdb(spark):
    # word_hex=12 (48-bit rho word) — the >100M-cardinality variant — must
    # stay exactly replayable: Spark == hashlib reference == DuckDB.
    import hashlib
    import math

    import duckdb

    keys = list(range(50_000))
    df = spark.range(50_000).select(F.col("id").alias("k"))

    regs_py = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        b = int(h[:8], 16) % 4096
        w = int(h[8:20], 16)
        rho = 49 if w == 0 else 49 - w.bit_length()
        regs_py[b] = max(regs_py.get(b, 0), rho)
    got_regs = {
        r.bucket: r.rho
        for r in sketches.hll_registers(df, "k", word_hex=12).collect()
    }
    assert got_regs == regs_py

    got = sketches.hll_count_distinct(df, "k", word_hex=12).collect()[0]
    zeros = 4096 - len(regs_py)
    sum_scaled = sum(1 << (49 - r) for r in regs_py.values()) + zeros * (1 << 49)
    alpha = 0.7213 / (1 + 1.079 / 4096.0)
    raw = alpha * 4096.0 * 4096.0 * float(1 << 49) / float(sum_scaled)
    est = 4096.0 * math.log(4096.0 / zeros) if (raw <= 10240.0 and zeros > 0) else raw
    assert got["estimate"] == math.floor(est * 10000.0) / 10000.0
    assert abs(got["estimate"] / 50_000 - 1) < 0.05

    con = duckdb.connect()
    con.register("t", df.toPandas())
    oracle = con.execute(
        sketches.hll_oracle_sql("t", "k", word_hex=12)
    ).fetchdf()
    assert float(oracle["estimate"][0]) == got["estimate"]
    assert int(oracle["sum_scaled"][0]) == got["sum_scaled"]


def test_hll_split_overlap_hashes_once(spark, sf_dir):
    # The union row must come from a register-level merge of the SAME
    # register table, not a re-derivation: without the lazy checkpoint the
    # shingle/hash upstream appeared 4x in the l44 plan.
    from core_etl_spark.operators import dedup as D

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    sh = D.shingle_table(docs)
    tagged = sh.select(
        F.when(F.col("doc_id") % 17 == 0, "eval").otherwise("train").alias("split"),
        "shingle",
    )
    est = sketches.hll_split_overlap(tagged, "shingle", "split")
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") <= 1, "upstream re-derived per union branch"


def test_hll_rejects_tiny_p(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(AssertionError):
        sketches.hll_count_distinct(df, "k", p=4)


def test_hll_overlap_inclusion_exclusion_vs_exact(spark):
    # The l44 contract: est(a) + est(b) - est(union) tracks the exact
    # distinct-shingle intersection. sf0.01 (500 docs) so the eval split
    # and the intersection are big enough for a relative bound.
    from tests.conftest import SF_MED
    from core_etl_spark.operators import dedup as D

    docs = load_tables(spark, SF_MED, ("documents",))["documents"]
    sh = D.shingle_table(docs)
    tagged = sh.select(
        F.when(F.col("doc_id") % 17 == 0, "eval").otherwise("train").alias("split"),
        "shingle",
    )
    est = {
        r["split"]: r["estimate"]
        for r in sketches.hll_split_overlap(tagged, "shingle", "split").collect()
    }
    est_inter = est["train"] + est["eval"] - est["union"]
    exact_inter = (
        tagged.filter(F.col("split") == "train")
        .select("shingle")
        .intersect(tagged.filter(F.col("split") == "eval").select("shingle"))
        .count()
    )
    # three ~1%-accurate estimates difference: generous but real bound.
    assert abs(est_inter - exact_inter) <= max(50.0, 0.15 * exact_inter), (
        est_inter,
        exact_inter,
    )


def test_cms_never_undercounts_and_is_tight(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"]
    n_total = li.count()
    sketch = sketches.cms_build(li, "l_suppkey")
    exact = li.groupBy("l_suppkey").agg(F.count("*").alias("exact_n"))
    est = sketches.cms_estimate(
        sketch, exact.select("l_suppkey"), "l_suppkey"
    ).join(exact, "l_suppkey")
    rows = est.collect()
    assert rows, "no probes"
    for r in rows:
        assert r["cms_n"] >= r["exact_n"], r  # the CMS invariant
        # expected colliding mass is n_total/width per row BEFORE the
        # 4-row min; 3x that is a generous deterministic-data bound.
        assert r["cms_n"] - r["exact_n"] <= max(3, 3 * n_total / 1024), r


def test_cms_merge_is_additive(spark, sf_dir):
    # Counters add: sketches of disjoint halves merged == one-pass sketch.
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"]
    whole = sketches.cms_build(li, "l_suppkey")
    halves = [
        sketches.cms_build(li.filter(F.col("l_orderkey") % 2 == i), "l_suppkey")
        for i in (0, 1)
    ]
    merged = sketches.cms_merge(halves)
    assert _frame_equal(whole, merged, ["row_idx", "col_idx", "n"])


def test_cms_build_plan_has_partial_agg(spark):
    df = spark.range(10_000).select(F.col("id").alias("k"))
    plan = sketches.cms_build(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, "CMS build lost map-side combine"


def test_cms_estimate_plan_broadcasts_sketch(spark):
    # The sketch is <= depth*width rows by construction — the probe side
    # must never shuffle for the lookup join.
    df = spark.range(10_000).select(F.col("id").alias("k"))
    sketch = sketches.cms_build(df, "k")
    probes = spark.range(100).select(F.col("id").alias("k"))
    est = sketches.cms_estimate(sketch, probes, "k")
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "sketch lookup fell back to a shuffle join"


def test_cms_absent_key_estimates_near_zero(spark):
    # A key never inserted can only pick up collision mass — with 100
    # distinct keys in 1024 columns the 4-row min is almost surely 0.
    df = spark.range(100).select(F.col("id").alias("k"))
    sketch = sketches.cms_build(df, "k")
    probe = spark.range(1_000_000, 1_000_001).select(F.col("id").alias("k"))
    est = sketches.cms_estimate(sketch, probe, "k").collect()[0]
    assert est["cms_n"] <= 2


def test_hll_store_rolls_forward_exactly(spark, tmp_path):
    # Three batches through the persisted store == one pass over their
    # union, register for register — so estimates off the store are the
    # estimates of everything ever fed.
    store = str(tmp_path / "hll_store")
    batches = [spark.range(lo, hi).select(F.col("id").alias("k"))
               for lo, hi in ((0, 4000), (2000, 8000), (8000, 12000))]
    for b in batches:
        sketches.update_hll_store(b, "k", store)
    union = spark.range(12_000).select(F.col("id").alias("k"))
    whole = sketches.hll_registers(union, "k")
    stored = spark.read.parquet(store)
    assert _frame_equal(whole, stored, ["bucket", "rho"])
    est = sketches.hll_estimate(stored).collect()[0]["estimate"]
    assert abs(est / 12_000 - 1) < 0.05


def test_hll_store_streaming_foreachbatch(spark, tmp_path):
    # The advertised wiring: foreachBatch(update_hll_store) over a file
    # stream; the store must equal a batch sketch of all files.
    src = str(tmp_path / "src")
    store = str(tmp_path / "hll_stream_store")
    for i in range(3):
        spark.range(i * 3000, (i + 1) * 3000).select(
            F.col("id").cast("string").alias("k")
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _i: sketches.update_hll_store(b, "k", store)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    whole = sketches.hll_registers(
        spark.range(9000).select(F.col("id").cast("string").alias("k")), "k"
    )
    assert _frame_equal(whole, spark.read.parquet(store), ["bucket", "rho"])


def test_detect_hot_keys_finds_planted_skew_only(spark):
    from core_etl_spark.operators import skew

    # 40% of rows on key -1, the rest spread over 10k keys.
    df = spark.range(50_000).select(
        F.when(F.col("id") % 5 < 2, F.lit(-1)).otherwise(F.col("id") % 10_000)
        .cast("long").alias("k"),
        F.col("id").cast("string").alias("rk"),
    )
    hot = skew.detect_hot_keys(df, "k", F.col("rk"), min_share=0.05)
    rows = hot.collect()
    assert [r["k"] for r in rows] == [-1]
    assert abs(rows[0]["est_share"] - 0.4) < 0.02  # CMS overshoot is bounded
    # uniform data: nothing crosses the threshold
    uni = spark.range(50_000).select(
        (F.col("id") % 10_000).cast("long").alias("k"),
        F.col("id").cast("string").alias("rk"),
    )
    assert skew.detect_hot_keys(uni, "k", F.col("rk"), min_share=0.05).count() == 0


def test_detect_hot_keys_deterministic(spark):
    from core_etl_spark.operators import skew

    df = spark.range(20_000).select(
        F.when(F.col("id") % 4 == 0, F.lit(-7)).otherwise(F.col("id"))
        .cast("long").alias("k"),
        F.col("id").cast("string").alias("rk"),
    )
    r1 = sorted(map(tuple, skew.detect_hot_keys(df, "k", F.col("rk"), 0.1).collect()))
    r2 = sorted(map(tuple, skew.detect_hot_keys(df, "k", F.col("rk"), 0.1).collect()))
    assert r1 == r2 and [t[0] for t in r1] == [-7]


def test_sampled_quantiles_rate_and_accuracy(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"]
    key = F.concat_ws(
        "_",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    out = sketches.sampled_quantiles(
        li, "l_extendedprice", key, probs=(0.5,), shift=4
    ).collect()[0]
    n_total = li.count()
    # md5 is uniform: the 1/16 deterministic sample should land within
    # +-40% of the nominal rate even at sf0.001 row counts.
    assert 0.6 / 16 < out["n_sample"] / n_total < 1.4 / 16
    exact_p50 = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p")
    ).collect()[0]["p"]
    assert abs(out["p50"] / exact_p50 - 1) < 0.10


def test_sampled_quantiles_deterministic(spark, sf_dir):
    # Same data -> byte-identical sample and quantiles, run to run (the
    # property rand()-based sampling cannot give).
    t = load_tables(spark, sf_dir, ("lineitem",))
    key = F.concat_ws(
        "_",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    runs = [
        sketches.sampled_quantiles(
            t["lineitem"],
            "l_extendedprice",
            key,
            probs=(0.5, 0.95),
            group_cols=("l_returnflag",),
        )
        .sort("l_returnflag")
        .collect()
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


def test_merge_of_empty_list_raises(spark):
    # ADVICE r10: a store-update loop that filters every partial away
    # should get a diagnosable error, not a bare IndexError.
    with pytest.raises(ValueError, match="register table"):
        sketches.hll_merge([])
    with pytest.raises(ValueError, match="sketch table"):
        sketches.cms_merge([])


def test_hll_store_recovers_crash_between_renames(spark, tmp_path):
    # ADVICE r10: simulate a crash that landed between the two promotion
    # renames — store missing, full pre-merge history stranded at
    # __retired, a half-written __staged beside it. The next update must
    # restore the history and fold its batch on top, not silently start
    # a fresh store from the batch alone.
    import os

    store = str(tmp_path / "hll_store")
    b1 = spark.range(0, 5000).select(F.col("id").alias("k"))
    b2 = spark.range(5000, 9000).select(F.col("id").alias("k"))
    sketches.update_hll_store(b1, "k", store)
    os.rename(store, f"{store}__retired")  # the crash window
    os.makedirs(f"{store}__staged")
    with open(f"{store}__staged/_partial", "w") as f:
        f.write("junk")
    sketches.update_hll_store(b2, "k", store)
    whole = sketches.hll_registers(
        spark.range(9000).select(F.col("id").alias("k")), "k"
    )
    assert _frame_equal(whole, spark.read.parquet(store), ["bucket", "rho"])
    assert not os.path.exists(f"{store}__staged")
    assert not os.path.exists(f"{store}__retired")


def test_hll_store_recovers_stale_retired_dir(spark, tmp_path):
    # ADVICE r10's second window: promotion succeeded but the cleanup
    # didn't run, leaving a non-empty __retired that used to make the
    # next update's os.rename raise ENOTEMPTY.
    import os

    store = str(tmp_path / "hll_store")
    b1 = spark.range(0, 5000).select(F.col("id").alias("k"))
    b2 = spark.range(5000, 9000).select(F.col("id").alias("k"))
    sketches.update_hll_store(b1, "k", store)
    os.makedirs(f"{store}__retired")
    with open(f"{store}__retired/_stale", "w") as f:
        f.write("junk")
    sketches.update_hll_store(b2, "k", store)
    whole = sketches.hll_registers(
        spark.range(9000).select(F.col("id").alias("k")), "k"
    )
    assert _frame_equal(whole, spark.read.parquet(store), ["bucket", "rho"])
    assert not os.path.exists(f"{store}__retired")


def test_cms_nondefault_width_matches_python_reference(spark):
    # VERDICT r10: width is now a parameter (sized by the SCALE.md rule
    # w ~ n_total/target-error); a non-default geometry must agree with
    # straight-line Python exactly, build through estimate.
    import hashlib

    width = 64
    keys = [k % 37 for k in range(500)]
    cells: dict[tuple[int, int], int] = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        for i in range(4):
            c = (i, int(h[8 * i : 8 * i + 8], 16) % width)
            cells[c] = cells.get(c, 0) + 1
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        (r.row_idx, r.col_idx): r.n
        for r in sketches.cms_build(df, "k", width=width).collect()
    }
    assert got == cells
    probes = spark.createDataFrame([(k,) for k in range(37)], "k long")
    est = {
        r.k: r.cms_n
        for r in sketches.cms_estimate(
            sketches.cms_build(df, "k", width=width), probes, "k", width=width
        ).collect()
    }
    for k in range(37):
        h = hashlib.md5(str(k).encode()).hexdigest()
        expect = min(
            cells.get((i, int(h[8 * i : 8 * i + 8], 16) % width), 0)
            for i in range(4)
        )
        assert est[k] == expect


def test_detect_hot_keys_reads_input_exactly_twice(spark):
    # VERDICT r10: n_total comes off the CMS sketch (sum of hash-row-0
    # counters), not a df.count() — so the whole diagnostic makes exactly
    # two passes over the data (sample + sketch build), measured here by
    # an accumulator in the input's own lineage.
    from core_etl_spark.operators import skew

    n = 20_000
    acc = spark.sparkContext.accumulator(0)

    def counting(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    base = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(-1)).otherwise(F.col("id")).alias("k"),
        F.col("id").cast("string").alias("rk"),
    )
    df = base.mapInPandas(counting, "k long, rk string")
    hot = skew.detect_hot_keys(df, "k", F.col("rk"), min_share=0.05)
    rows = hot.collect()
    assert [r.k for r in rows] == [-1]
    assert rows[0].est_n >= n // 2  # CMS never undercounts
    assert acc.value == 2 * n, f"expected exactly 2 data passes, saw {acc.value / n}"


# --- mergeable log-linear quantiles (r11) ------------------------------------

def _py_loglin_bucket(v, scale_pow=8, subdiv_pow=4):
    import math

    s = 1 << subdiv_pow
    x = math.floor(v * (1 << scale_pow))
    if x == 0:
        return -1
    y = abs(x)
    pot = 1 << (y.bit_length() - 1)
    posb = (y.bit_length() - 1) * s + ((y - pot) * s) // pot
    return posb if x > 0 else -2 - posb


def test_loglin_histogram_matches_python_reference(spark):
    import random

    rng = random.Random(31)
    vals = [rng.uniform(0, 50_000) for _ in range(2000)] + [0.0, 0.001, 1.0]
    # octave boundaries: scaled values exactly 2^k and 2^k - 1 must land
    # in (k*16) and ((k-1)*16 + 15) respectively, identically everywhere
    vals += [(1 << k) / 256 for k in range(0, 42, 7)]
    vals += [((1 << k) - 1) / 256 for k in range(1, 42, 7)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        (r.bucket): r.n for r in sketches.loglin_histogram(df, "v").collect()
    }
    want: dict[int, int] = {}
    for v in vals:
        b = _py_loglin_bucket(v)
        want[b] = want.get(b, 0) + 1
    assert got == want


def test_loglin_merge_equals_single_pass(spark, sf_dir):
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    whole = sketches.loglin_histogram(
        li, "l_extendedprice", group_cols=("l_returnflag",)
    )
    halves = [
        sketches.loglin_histogram(
            li.filter(F.col("l_orderkey") % 2 == i),
            "l_extendedprice",
            group_cols=("l_returnflag",),
        )
        for i in (0, 1)
    ]
    merged = sketches.loglin_merge(halves, group_cols=("l_returnflag",))
    assert _frame_equal(whole, merged, ["l_returnflag", "bucket", "n"])
    with pytest.raises(ValueError, match="histogram"):
        sketches.loglin_merge([])


def test_loglin_quantiles_accuracy_vs_exact(spark, sf_dir):
    # Sub-bucket width is 1/16 of an octave -> the picked bucket's bounds
    # are within 6.25% of the true quantile; interpolation usually much
    # closer. 8% is the hard bound + slack for the rank convention.
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    hist = sketches.loglin_histogram(li, "l_extendedprice")
    est = sketches.loglin_quantiles(hist, (0.5, 0.95)).collect()[0]
    exact = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    ).collect()[0]
    assert est["n_total"] == li.count()
    assert abs(est["p50"] / exact["p50"] - 1) < 0.08
    assert abs(est["p95"] / exact["p95"] - 1) < 0.08


def test_loglin_zero_and_subgrid_bucket(spark):
    # POSITIVE values below the 2^-scale_pow grid collapse to bucket -1
    # and estimate exactly 0 — the documented domain edge.
    df = spark.createDataFrame([(0.0,), (0.001,), (0.003,)], "v double")
    hist = sketches.loglin_histogram(df, "v")
    assert hist.collect() == [  # single bucket -1
        hist.collect()[0]
    ] and hist.collect()[0].bucket == -1
    q = sketches.loglin_quantiles(hist, (0.5,)).collect()[0]
    assert q["p50"] == 0.0 and q["n_total"] == 3


def test_loglin_negative_subgrid_bucket(spark):
    # ADVICE r11: floor-grid quantization sends NEGATIVES in
    # (-2^-scale_pow, 0) to grid point -1, i.e. bucket -2 — NOT the
    # zero bucket. The estimate keeps the sign (≈ -2^-scale_pow), and
    # Spark / DuckDB / straight Python all agree on the bucket.
    import duckdb

    df = spark.createDataFrame([(-0.001,), (-0.003,)], "v double")
    hist = sketches.loglin_histogram(df, "v")
    rows = hist.collect()
    assert len(rows) == 1 and rows[0].bucket == -2 and rows[0].n == 2
    q = sketches.loglin_quantiles(hist, (0.5,)).collect()[0]
    # bucket -2 mirrors posb(1), value interval (at grid scale) [1, 1+1/S):
    # the estimate is negative and within one sub-bucket of -2^-scale_pow.
    lo = -(1 + 2.0 ** -sketches._LOGLIN_SUBDIV_POW) * 2.0 ** -sketches._LOGLIN_SCALE_POW
    assert lo <= q["p50"] < 0.0
    con = duckdb.connect()
    sql = sketches.loglin_bucket_sql("v")
    got = con.execute(
        f"SELECT {sql} FROM (VALUES (-0.001), (-0.003)) t(v)"
    ).fetchall()
    con.close()
    assert [b for (b,) in got] == [-2, -2]


def test_loglin_bucket_exact_at_domain_edge(spark):
    # VERDICT r11 What's-wrong 1: the r11 double floor-division lost
    # integer exactness above |v|·2^scale ≈ 2^49 (at y = 2^53−1 the
    # sub-bucket overflowed into the NEXT octave's first bucket). The
    # r12 pure-BIGINT sub-bucket must match straight-line Python integer
    # arithmetic — on BOTH engines — across the full documented domain,
    # including the 2^49 and 2^53−1 edges.
    import duckdb

    s_pow, scale_pow = sketches._LOGLIN_SUBDIV_POW, sketches._LOGLIN_SCALE_POW
    s = 1 << s_pow

    def py_bucket(y: int) -> int:
        octave = y.bit_length()
        pot = 1 << (octave - 1)
        return (octave - 1) * s + ((y - pot) * s) // pot

    ys = [
        1, 2, 3, 255, 256, 4097,
        (1 << 49) - 1, 1 << 49, (1 << 49) + 1,
        (1 << 52) + (1 << 48) + 12345,
        (1 << 53) - 17, (1 << 53) - 1,
    ]
    # every y here is exactly representable as v = y / 2^scale_pow
    # (power-of-two division of an integer < 2^53 is exact), so
    # floor(v * 2^scale_pow) recovers y bit-for-bit.
    vals = [(y / (1 << scale_pow),) for y in ys]
    want = [py_bucket(y) for y in ys]

    df = spark.createDataFrame(vals, "v double")
    got_spark = [
        r.b
        for r in df.select(
            sketches._loglin_bucket(F.col("v"), scale_pow, s_pow).alias("b")
        ).collect()
    ]
    assert got_spark == want, f"spark {got_spark} != python {want}"

    con = duckdb.connect()
    values = ", ".join(f"({v!r})" for (v,) in vals)
    got_duck = [
        b
        for (b,) in con.execute(
            f"SELECT {sketches.loglin_bucket_sql('v', scale_pow, s_pow)} "
            f"FROM (VALUES {values}) t(v)"
        ).fetchall()
    ]
    con.close()
    assert got_duck == want, f"duckdb {got_duck} != python {want}"
    # regression pin for the exact r11 failure mode: the top-of-domain
    # value must stay inside its own octave's last sub-bucket.
    assert want[-1] == py_bucket((1 << 53) - 1) and want[-1] % s == s - 1


def test_cms_store_rolls_forward_exactly(spark, tmp_path):
    # Batches through the persisted CMS store == one build over their
    # concatenation, cell for cell (sum-merge): the frequency-store
    # analogue of the HLL store, sharing its crash-safe swap.
    store = str(tmp_path / "cms_store")
    batches = [
        spark.range(lo, hi).select((F.col("id") % 97).alias("k"))
        for lo, hi in ((0, 3000), (3000, 5000), (5000, 9000))
    ]
    for b in batches:
        sketches.update_cms_store(b, "k", store, unledgered=True)
    whole = sketches.cms_build(
        spark.range(9000).select((F.col("id") % 97).alias("k")), "k"
    )
    assert _frame_equal(
        whole, spark.read.parquet(store), ["row_idx", "col_idx", "n"]
    )


def test_cms_store_batch_ledger_makes_retry_a_noop(spark, tmp_path):
    # VERDICT r11 directive 2: sum-merge double-counts a re-delivered
    # foreachBatch batch. With batch_id the store keeps an applied-batch
    # ledger inside itself — re-applying a committed batch must change
    # NOTHING (cell for cell), and the updater must say so.
    store = str(tmp_path / "cms_store")
    b1 = spark.range(0, 3000).select((F.col("id") % 97).alias("k"))
    b2 = spark.range(3000, 5000).select((F.col("id") % 97).alias("k"))
    assert sketches.update_cms_store(b1, "k", store, batch_id="0") is True
    assert sketches.update_cms_store(b2, "k", store, batch_id="1") is True
    before = sorted(map(tuple, spark.read.parquet(store).collect()))
    # the retry: same batch, same id — at-least-once delivery
    assert sketches.update_cms_store(b2, "k", store, batch_id="1") is False
    after = sorted(map(tuple, spark.read.parquet(store).collect()))
    assert after == before
    # and the store still equals one build over the batches' union
    whole = sketches.cms_build(
        spark.range(5000).select((F.col("id") % 97).alias("k")), "k"
    )
    assert _frame_equal(
        whole, spark.read.parquet(store), ["row_idx", "col_idx", "n"]
    )


def test_loglin_store_batch_ledger_makes_retry_a_noop(spark, tmp_path):
    store = str(tmp_path / "loglin_store")
    b1 = spark.range(0, 4000).select((F.col("id") * 0.37 + 1).alias("v"))
    b2 = spark.range(4000, 6000).select((F.col("id") * 0.37 + 1).alias("v"))
    assert sketches.update_loglin_store(b1, "v", store, batch_id="0") is True
    assert sketches.update_loglin_store(b2, "v", store, batch_id="1") is True
    before = sorted(map(tuple, spark.read.parquet(store).collect()))
    assert sketches.update_loglin_store(b2, "v", store, batch_id="1") is False
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == before
    whole = sketches.loglin_histogram(
        spark.range(6000).select((F.col("id") * 0.37 + 1).alias("v")), "v"
    )
    assert _frame_equal(whole, spark.read.parquet(store), ["bucket", "n"])


def test_store_ledger_retention_window(spark, tmp_path, monkeypatch):
    # The ledger keeps only the newest _LEDGER_RETAIN ids so per-update
    # cost is O(1) over the store's life. Inside the window a re-delivery
    # is a no-op; an id older than the window is NOT deduplicated — the
    # documented trade (repeats only ever come from the recent window).
    monkeypatch.setattr(sketches, "_LEDGER_RETAIN", 2)
    store = str(tmp_path / "cms_store")
    b = spark.range(0, 100).select((F.col("id") % 7).alias("k"))
    for i in range(3):
        assert sketches.update_cms_store(b, "k", store, batch_id=str(i))
    # ids 1,2 retained (in order); id 0 aged out
    assert sketches._applied_batch_ids(spark, store) == ["1", "2"]
    assert sketches.update_cms_store(b, "k", store, batch_id="2") is False
    assert sketches.update_cms_store(b, "k", store, batch_id="0") is True


def test_cms_store_ledger_survives_crash_between_renames(spark, tmp_path):
    # The ledger lives INSIDE the store dir, so the existing recovery
    # path must carry it through the rename crash window: after recovery
    # the restored ledger still rejects the batch it already holds.
    import os

    store = str(tmp_path / "cms_store")
    b1 = spark.range(0, 3000).select((F.col("id") % 97).alias("k"))
    b2 = spark.range(3000, 5000).select((F.col("id") % 97).alias("k"))
    sketches.update_cms_store(b1, "k", store, batch_id="0")
    os.rename(store, f"{store}__retired")  # crash between the renames
    # the recovered store must still know batch 0 was applied...
    assert sketches.update_cms_store(b1, "k", store, batch_id="0") is False
    # ...and accept the next batch on top of the restored counters
    assert sketches.update_cms_store(b2, "k", store, batch_id="1") is True
    whole = sketches.cms_build(
        spark.range(5000).select((F.col("id") % 97).alias("k")), "k"
    )
    assert _frame_equal(
        whole, spark.read.parquet(store), ["row_idx", "col_idx", "n"]
    )


def test_loglin_store_quantiles_over_everything_fed(spark, tmp_path):
    # The store's purpose: after N batches, quantiles off the store equal
    # quantiles off a single-pass histogram of the batches' union.
    store = str(tmp_path / "loglin_store")
    batches = [
        spark.range(lo, hi).select((F.col("id") * 0.37 + 1).alias("v"))
        for lo, hi in ((0, 4000), (4000, 6000), (6000, 10000))
    ]
    for b in batches:
        sketches.update_loglin_store(b, "v", store, unledgered=True)
    whole = sketches.loglin_histogram(
        spark.range(10000).select((F.col("id") * 0.37 + 1).alias("v")), "v"
    )
    assert _frame_equal(whole, spark.read.parquet(store), ["bucket", "n"])
    got = sketches.loglin_quantiles(spark.read.parquet(store), (0.5,)).collect()[0]
    want = sketches.loglin_quantiles(whole, (0.5,)).collect()[0]
    assert got == want


def test_loglin_nondefault_geometry_matches_python(spark):
    # The CMS-width precedent: geometry is a parameter, so a non-default
    # (scale_pow=4, subdiv_pow=2) build must agree with straight-line
    # Python exactly — including octave boundaries at the coarser grid.
    import random

    rng = random.Random(41)
    vals = [rng.uniform(0, 5000) for _ in range(800)] + [
        (1 << k) / 16 for k in range(0, 24, 5)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        r.bucket: r.n
        for r in sketches.loglin_histogram(
            df, "v", scale_pow=4, subdiv_pow=2
        ).collect()
    }
    want: dict[int, int] = {}
    for v in vals:
        b = _py_loglin_bucket(v, scale_pow=4, subdiv_pow=2)
        want[b] = want.get(b, 0) + 1
    assert got == want


def test_loglin_signed_values_match_python_and_duckdb(spark):
    """Sign-mirrored buckets (r11.13): full-real-line histogram must match
    straight-line Python bucket-for-bucket, the quantiles must track the
    exact signed percentiles, and the generated oracle SQL must replay
    the whole thing in DuckDB value-for-value."""
    import random

    import duckdb
    import numpy as np

    rng = random.Random(61)
    vals = [rng.uniform(-40_000, 40_000) for _ in range(4000)]
    vals += [0.0, -0.001, 0.001, -1 / 256, 1 / 256, -12345.678]
    df = spark.createDataFrame([(v,) for v in vals], "v double")

    got = {r.bucket: r.n for r in sketches.loglin_histogram(df, "v").collect()}
    want: dict[int, int] = {}
    for v in vals:
        b = _py_loglin_bucket(v)
        want[b] = want.get(b, 0) + 1
    assert got == want

    hist = sketches.loglin_histogram(df, "v")
    est = sketches.loglin_quantiles(hist, (0.05, 0.5, 0.95)).collect()[0]
    arr = np.array(vals)
    for name, q in (("p05", 0.05), ("p50", 0.5), ("p95", 0.95)):
        exact = float(np.quantile(arr, q))
        # 1/16-octave bound on |value|, plus slack near the median where
        # a symmetric distribution crosses zero
        assert abs(est[name] - exact) <= max(0.08 * abs(exact), 300.0), (
            name, est[name], exact,
        )

    con = duckdb.connect()
    con.register("t", df.toPandas())
    oracle = con.execute(
        sketches.loglin_quantiles_sql("t", "v", (0.05, 0.5, 0.95))
    ).fetchdf()
    for name in ("p05", "p50", "p95"):
        assert float(oracle[name][0]) == est[name], name


def test_loglin_nulls_excluded_both_engines(spark):
    # A null value must not create a null bucket row (it would poison the
    # quantile cumsum, and Spark and DuckDB disagree on default NULL
    # ordering in window frames) — both the operator and the generated
    # oracle SQL exclude nulls, so n_total counts non-null values only.
    import duckdb

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (3.0,), (None,)], "v double"
    )
    hist = sketches.loglin_histogram(df, "v")
    assert all(r.bucket is not None for r in hist.collect())
    est = sketches.loglin_quantiles(hist, (0.5,)).collect()[0]
    assert est["n_total"] == 3 and est["p50"] is not None
    con = duckdb.connect()
    con.register("t", df.toPandas())
    oracle = con.execute(sketches.loglin_quantiles_sql("t", "v", (0.5,))).fetchdf()
    assert int(oracle["n_total"][0]) == 3
    assert float(oracle["p50"][0]) == est["p50"]


def test_sum_merge_stores_bare_batch_id_none_raises(spark, tmp_path):
    # VERDICT r12 directive 3: the silent double-count path is closed.
    # Omitting batch_id must be an explicit acknowledgment, never a
    # default — a bare call raises; unledgered=True is the opt-out; the
    # two are mutually exclusive.
    import pytest

    b = spark.range(0, 100).select((F.col("id") % 7).alias("k"))
    v = spark.range(0, 100).select((F.col("id") * 0.5).alias("v"))
    with pytest.raises(ValueError, match="unledgered"):
        sketches.update_cms_store(b, "k", str(tmp_path / "c"))
    with pytest.raises(ValueError, match="unledgered"):
        sketches.update_loglin_store(v, "v", str(tmp_path / "l"))
    with pytest.raises(ValueError, match="mutually exclusive"):
        sketches.update_cms_store(
            b, "k", str(tmp_path / "c"), batch_id="0", unledgered=True
        )
    # and neither failed call created a store
    import os

    assert not os.path.exists(str(tmp_path / "c"))
    assert not os.path.exists(str(tmp_path / "l"))


def test_store_concurrent_update_raises_loudly(spark, tmp_path):
    # VERDICT r12 directive 4: two concurrent update_*_store calls on one
    # path could interleave recovery/renames and silently DROP a batch.
    # The writer lock turns that into a clean StoreLockedError while the
    # first writer is in flight — and the store is untouched.
    import os

    import pytest

    store = str(tmp_path / "cms_store")
    b1 = spark.range(0, 3000).select((F.col("id") % 97).alias("k"))
    b2 = spark.range(3000, 5000).select((F.col("id") % 97).alias("k"))
    sketches.update_cms_store(b1, "k", store, batch_id="0")

    # simulate writer A holding the lock mid-update (live pid = this one)
    import socket
    import time

    with open(f"{store}__lock", "w") as f:
        f.write(f"{os.getpid()} {time.time()} {socket.gethostname()}")
    before = sorted(map(tuple, spark.read.parquet(store).collect()))
    with pytest.raises(sketches.StoreLockedError, match="in flight"):
        sketches.update_cms_store(b2, "k", store, batch_id="1")
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == before
    os.unlink(f"{store}__lock")

    # once A releases, B's batch applies — nothing was lost
    assert sketches.update_cms_store(b2, "k", store, batch_id="1") is True
    whole = sketches.cms_build(
        spark.range(5000).select((F.col("id") % 97).alias("k")), "k"
    )
    assert _frame_equal(
        whole, spark.read.parquet(store), ["row_idx", "col_idx", "n"]
    )


def test_store_lock_stale_holder_is_broken(spark, tmp_path):
    # A lock whose recorded pid is dead (holder crashed between create
    # and unlink) must be stale-detected and broken — the store family
    # self-heals unattended, it does not wedge forever. Same for a
    # sentinel past the age threshold even with a live pid.
    import os
    import socket
    import subprocess
    import time

    store = str(tmp_path / "loglin_store")
    v1 = spark.range(0, 4000).select((F.col("id") * 0.37 + 1).alias("v"))

    # a real dead pid: spawn-and-reap a child so the pid existed here
    # (sentinel names THIS host — the pid probe only applies to local pids)
    child = subprocess.Popen(["true"])
    child.wait()
    with open(f"{store}__lock", "w") as f:
        f.write(f"{child.pid} {time.time()} {socket.gethostname()}")
    assert sketches.update_loglin_store(v1, "v", store, batch_id="0") is True
    assert not os.path.exists(f"{store}__lock")  # released after update

    # live pid but ancient timestamp: the age backstop breaks it too
    with open(f"{store}__lock", "w") as f:
        f.write(
            f"{os.getpid()} {time.time() - 2 * sketches._LOCK_STALE_SEC} "
            f"{socket.gethostname()}"
        )
    v2 = spark.range(4000, 6000).select((F.col("id") * 0.37 + 1).alias("v"))
    assert sketches.update_loglin_store(v2, "v", store, batch_id="1") is True
    whole = sketches.loglin_histogram(
        spark.range(6000).select((F.col("id") * 0.37 + 1).alias("v")), "v"
    )
    assert _frame_equal(whole, spark.read.parquet(store), ["bucket", "n"])


def test_store_lock_foreign_holder_never_pid_probed(spark, tmp_path):
    # ADVICE r13 (medium): a sentinel recorded on ANOTHER host/container
    # (shared volume) must NOT be broken just because its pid is free on
    # THIS host — pid namespaces differ, so a live remote writer would be
    # evicted and the lost-batch bug the lock prevents would reopen.
    # Foreign holders are judged by age alone: fresh → locked error;
    # past _LOCK_STALE_SEC → broken.
    import os
    import subprocess
    import time

    import pytest

    store = str(tmp_path / "cms_store")
    b = spark.range(0, 100).select((F.col("id") % 7).alias("k"))

    child = subprocess.Popen(["true"])  # a pid guaranteed dead locally
    child.wait()
    with open(f"{store}__lock", "w") as f:
        f.write(f"{child.pid} {time.time()} some-other-host")
    with pytest.raises(sketches.StoreLockedError):
        sketches.update_cms_store(b, "k", store, batch_id="0")

    # same for a pre-r14 two-field sentinel: host unknown ⇒ foreign rules
    with open(f"{store}__lock", "w") as f:
        f.write(f"{child.pid} {time.time()}")
    with pytest.raises(sketches.StoreLockedError):
        sketches.update_cms_store(b, "k", store, batch_id="0")

    # a STALE foreign sentinel self-heals via the age test
    with open(f"{store}__lock", "w") as f:
        f.write(
            f"{child.pid} {time.time() - 2 * sketches._LOCK_STALE_SEC} "
            "some-other-host"
        )
    assert sketches.update_cms_store(b, "k", store, batch_id="0") is True
    assert not os.path.exists(f"{store}__lock")


def test_store_lock_break_restores_fresh_lock(tmp_path, monkeypatch):
    # ADVICE r13 TOCTOU: waiter B judges sentinel S stale; winner A breaks
    # S and creates a FRESH lock before B's unlink lands. B's break must
    # not remove A's lock. The rename-aside + content re-verify catches
    # exactly this: B discovers it caught a different sentinel and
    # restores it. (Simulated by an os.rename hook that performs A's
    # break+recreate inside B's judge→rename window.)
    import os
    import socket
    import time

    import pytest

    lockpath = str(tmp_path / "s__lock")
    stale = f"{_dead_pid()} {time.time() - 2 * sketches._LOCK_STALE_SEC} {socket.gethostname()}"
    fresh = f"{os.getpid()} {time.time()} {socket.gethostname()}"
    with open(lockpath, "w") as f:
        f.write(stale)

    real_rename = os.rename

    def racing_rename(src, dst, **kw):
        if src == lockpath and os.path.exists(src):
            with open(src) as fh:
                cur = fh.read()
            if cur == stale:  # A's break+recreate lands first
                with open(src, "w") as fh:
                    fh.write(fresh)
        return real_rename(src, dst, **kw)

    monkeypatch.setattr(os, "rename", racing_rename)
    lk = sketches._store_lock(str(tmp_path / "s"))
    lk._break_stale()
    with open(lockpath) as fh:
        assert fh.read() == fresh  # A's lock survived B's break
    # and the full acquire path now sees a live local holder and raises
    with pytest.raises(sketches.StoreLockedError):
        lk.__enter__()


def test_store_lock_torn_sentinel_uses_age(spark, tmp_path):
    # An unreadable/torn sentinel (crash mid-write) can't be pid-probed;
    # only age judges it. Fresh-torn → treated live (locked error);
    # old-torn → broken and the update proceeds.
    import os
    import time

    import pytest

    store = str(tmp_path / "cms_store")
    b = spark.range(0, 100).select((F.col("id") % 7).alias("k"))
    with open(f"{store}__lock", "w") as f:
        f.write("not a pid")
    with pytest.raises(sketches.StoreLockedError):
        sketches.update_cms_store(b, "k", store, batch_id="0")
    old = time.time() - 2 * sketches._LOCK_STALE_SEC
    os.utime(f"{store}__lock", (old, old))
    assert sketches.update_cms_store(b, "k", store, batch_id="0") is True


def test_store_lock_true_race_converges_with_retry(spark, tmp_path):
    # Two threads updating ONE store concurrently (the real overlap the
    # lock exists for): at most one holds the lock at a time; the loser
    # gets StoreLockedError, retries, and after both finish the store
    # equals one build over both batches — nothing lost, nothing doubled.
    import threading
    import time as _t

    store = str(tmp_path / "cms_store")
    batches = {
        "0": spark.range(0, 3000).select((F.col("id") % 97).alias("k")),
        "1": spark.range(3000, 5000).select((F.col("id") % 97).alias("k")),
    }
    lock_errors, failures = [], []

    def worker(bid):
        for _ in range(60):  # retry loop: the designed caller response
            try:
                sketches.update_cms_store(batches[bid], "k", store, batch_id=bid)
                return
            except sketches.StoreLockedError:
                lock_errors.append(bid)
                _t.sleep(0.3)
            except Exception as e:  # noqa: BLE001 — record real failures
                failures.append((bid, repr(e)))
                return
        failures.append((bid, "never acquired the lock"))

    ts = [threading.Thread(target=worker, args=(b,)) for b in batches]
    for t in ts:
        t.start()
    for t in ts:
        t.join(300)
    assert not failures, failures
    whole = sketches.cms_build(
        spark.range(5000).select((F.col("id") % 97).alias("k")), "k"
    )
    assert _frame_equal(
        whole, spark.read.parquet(store), ["row_idx", "col_idx", "n"]
    )
    assert sorted(sketches._applied_batch_ids(spark, store)) == ["0", "1"]


def test_store_lock_three_way_contested_restore(tmp_path, monkeypatch):
    # VERDICT r14 item 2 — the three-way race: breaker B judges sentinel S
    # stale; winner A breaks S and recreates FRESH before B's rename-aside
    # lands (B catches A's live lock); waiter C then claims the freed path
    # before B's restore. The restore must (a) never clobber C's lock (the
    # r14 os.rename restore REPLACED it on POSIX) and (b) raise loudly
    # instead of letting B's caller re-enter the create loop as a second
    # holder.
    import os
    import socket
    import time

    import pytest

    lockpath = str(tmp_path / "s__lock")
    now = time.time()
    host = socket.gethostname()
    stale = f"{_dead_pid()} {now - 2 * sketches._LOCK_STALE_SEC} {host}"
    fresh = f"{os.getpid()} {now} {host}"
    c_lock = f"77777 {now} {host}"
    with open(lockpath, "w") as f:
        f.write(stale)

    real_rename = os.rename

    def racing_rename(src, dst, **kw):
        if src == lockpath and os.path.exists(src):
            with open(src) as fh:
                cur = fh.read()
            if cur == stale:
                with open(src, "w") as fh:
                    fh.write(fresh)  # A's break+recreate lands first
                real_rename(src, dst, **kw)
                with open(lockpath, "w") as fh:
                    fh.write(c_lock)  # C claims the freed path
                return
        return real_rename(src, dst, **kw)

    monkeypatch.setattr(os, "rename", racing_rename)
    lk = sketches._store_lock(str(tmp_path / "s"))
    with pytest.raises(sketches.StoreLockedError, match="contested"):
        lk._break_stale()
    import glob

    with open(lockpath) as fh:
        assert fh.read() == c_lock  # C's lock never clobbered
    graves = glob.glob(f"{lockpath}.stale.*")
    assert len(graves) == 1
    with open(graves[0]) as fh:
        assert fh.read() == fresh  # displaced sentinel parked, not lost


def test_store_lock_three_way_no_second_holder(tmp_path, monkeypatch):
    # Same interleaving driven through the FULL acquire path, with C
    # holding through the restore window: pre-r15 the failed restore was
    # `pass`-ed and the loop re-entered the create path — if C released a
    # moment later, B acquired while A (its sentinel stranded in B's
    # grave) still believed it held: two holders. Now the contested
    # restore raises straight out of __enter__ — B never reaches the
    # create retry at all, whatever C does next.
    import os
    import socket
    import time

    import pytest

    lockpath = str(tmp_path / "s__lock")
    now = time.time()
    host = socket.gethostname()
    stale = f"{_dead_pid()} {now - 2 * sketches._LOCK_STALE_SEC} {host}"
    fresh = f"88888 {now} {host}"
    c_lock = f"99999 {now} {host}"
    with open(lockpath, "w") as f:
        f.write(stale)

    real_rename = os.rename

    def racing_rename(src, dst, **kw):
        if src == lockpath and os.path.exists(src):
            with open(src) as fh:
                cur = fh.read()
            if cur == stale:
                with open(src, "w") as fh:
                    fh.write(fresh)
                real_rename(src, dst, **kw)
                with open(lockpath, "w") as fh:
                    fh.write(c_lock)  # C claims the freed path and holds
                return
        return real_rename(src, dst, **kw)

    monkeypatch.setattr(os, "rename", racing_rename)
    lk = sketches._store_lock(str(tmp_path / "s"))
    with pytest.raises(sketches.StoreLockedError, match="contested"):
        lk.__enter__()
    assert lk._token is None  # B never wrote a sentinel — it never held
    with open(lockpath) as fh:
        assert fh.read() == c_lock  # C's lock intact, never clobbered


def test_store_lock_benign_restore_then_held(tmp_path, monkeypatch):
    # The SAME A-recreates-inside-B's-window race but with the path still
    # free at restore time: the link-restore hands A its lock back and B
    # simply reports it held — the convergent outcome, exactly one holder.
    import os
    import socket
    import time

    import pytest

    lockpath = str(tmp_path / "s__lock")
    now = time.time()
    host = socket.gethostname()
    stale = f"{_dead_pid()} {now - 2 * sketches._LOCK_STALE_SEC} {host}"
    fresh = f"{os.getpid()} {now} {host}"  # our pid: probes alive
    with open(lockpath, "w") as f:
        f.write(stale)

    real_rename = os.rename

    def racing_rename(src, dst, **kw):
        if src == lockpath and os.path.exists(src):
            with open(src) as fh:
                cur = fh.read()
            if cur == stale:
                with open(src, "w") as fh:
                    fh.write(fresh)
        return real_rename(src, dst, **kw)

    monkeypatch.setattr(os, "rename", racing_rename)
    lk = sketches._store_lock(str(tmp_path / "s"))
    with pytest.raises(sketches.StoreLockedError, match="held"):
        lk.__enter__()
    import glob

    with open(lockpath) as fh:
        assert fh.read() == fresh  # A's lock restored, exactly one holder
    assert not glob.glob(f"{lockpath}.stale.*")


def test_store_lock_readback_detects_displacement(tmp_path, monkeypatch):
    # A breaker whose staleness judgment predates OUR create can rename
    # our fresh sentinel aside right after we write it. The post-acquire
    # readback must catch the theft instead of returning as a holder.
    import os
    import socket
    import time

    import pytest

    lockpath = str(tmp_path / "s__lock")
    host = socket.gethostname()
    thief = f"55555 {time.time()} {host}"
    real_fdopen = os.fdopen

    def thieving_fdopen(fd, *a, **kw):
        f = real_fdopen(fd, *a, **kw)

        class Stealer:
            def __enter__(self_inner):
                return f.__enter__()

            def __exit__(self_inner, *exc):
                r = f.__exit__(*exc)
                # between our write landing and the readback: breaker
                # renames our sentinel aside, a new holder claims the path
                os.rename(lockpath, f"{lockpath}.stale.999")
                with open(lockpath, "w") as fh:
                    fh.write(thief)
                return r

        return Stealer()

    monkeypatch.setattr(os, "fdopen", thieving_fdopen)
    lk = sketches._store_lock(str(tmp_path / "s"))
    with pytest.raises(sketches.StoreLockedError):
        lk.__enter__()
    with open(lockpath) as fh:
        assert fh.read() == thief  # the live holder was never disturbed


def test_store_lock_reclaims_own_restored_sentinel(tmp_path):
    # If our displaced sentinel is link-restored by the breaker after we
    # re-queued, the path holds OUR token: adopting it is safe and avoids
    # waiting out our own pid-alive sentinel.
    import os
    import socket
    import time

    lk = sketches._store_lock(str(tmp_path / "s"))
    tok = f"{os.getpid()} {time.time()} {socket.gethostname()}"
    lk._token = tok
    with open(lk._lock, "w") as f:
        f.write(tok)
    assert lk.__enter__() is lk
    lk.__exit__(None, None, None)
    assert not os.path.exists(lk._lock)


def test_store_lock_release_is_content_checked(tmp_path):
    # An instance whose lock was broken-and-reacquired by someone else
    # must not release the new holder's lock on exit.
    import os
    import socket
    import time

    lk = sketches._store_lock(str(tmp_path / "s"))
    lk._token = "mine 0 nowhere"
    other = f"4242 {time.time()} {socket.gethostname()}"
    with open(lk._lock, "w") as f:
        f.write(other)
    lk.__exit__(None, None, None)
    assert os.path.exists(lk._lock)
    with open(lk._lock) as f:
        assert f.read() == other


def test_store_lock_grave_names_unique_per_call(tmp_path):
    # r15 review: the stale-break grave path was unique per PID only, so
    # two threads of one process breaking concurrently shared it — the
    # second rename replaced the first grave and the first unlink could
    # delete a live third party's caught lock. Names now carry
    # pid+thread+uuid; observable as: two contested breaks park two
    # DISTINCT grave files.
    import glob
    import os
    import socket
    import time

    import pytest

    lockpath = str(tmp_path / "s__lock")
    now = time.time()
    host = socket.gethostname()
    stale = f"{_dead_pid()} {now - 2 * sketches._LOCK_STALE_SEC} {host}"
    fresh = f"{os.getpid()} {now} {host}"
    lk = sketches._store_lock(str(tmp_path / "s"))
    for _ in range(2):
        with open(lockpath, "w") as f:
            f.write(fresh)  # the breaker will catch a FRESH lock...
        os.rename(lockpath, lockpath + ".hold")
        with open(lockpath, "w") as f:
            f.write(fresh)
        # ...and a third party claims during the restore window
        real_link = os.link

        def contested_link(src, dst, **kw):
            raise FileExistsError(dst)

        os.link = contested_link
        try:
            with pytest.raises(sketches.StoreLockedError):
                lk._break_stale(stale)  # judged stale, catches fresh
        finally:
            os.link = real_link
        os.unlink(lockpath + ".hold")
        try:
            os.unlink(lockpath)
        except FileNotFoundError:
            pass
    graves = glob.glob(f"{lockpath}.stale.*")
    assert len(graves) == 2, graves  # distinct names — no clobber possible
    assert len(set(graves)) == 2


def test_store_lock_live_holder_never_broken_by_age(tmp_path, monkeypatch):
    """r16 review: a LIVE same-host holder whose single update runs past
    _LOCK_STALE_SEC (a corpus-scale batch inside the lock) must NOT have
    its lock broken — the pid probe is authoritative and runs FIRST; age
    judges only holders that cannot be probed (foreign hosts, torn
    sentinels). The stale window is shrunk so the sentinel can age past
    it while still POSTDATING this process's start (a genuine holder
    always writes its sentinel after it starts — a ts older than the
    writer's start is the recycled-pid case, which IS stale)."""
    import os
    import socket
    import time

    import pytest

    monkeypatch.setattr(sketches, "_LOCK_STALE_SEC", 0.2)
    lockpath = str(tmp_path / "s__lock")
    aged = time.time() - 1.0  # after our start, past the shrunken window
    with open(lockpath, "w") as f:
        f.write(f"{os.getpid()} {aged} {socket.gethostname()}")
    lk = sketches._store_lock(str(tmp_path / "s"))
    with pytest.raises(sketches.StoreLockedError, match="held"):
        lk.__enter__()
    with open(lockpath) as f:  # and the live lock was never touched
        assert f.read().startswith(f"{os.getpid()} ")


def test_store_lock_recycled_pid_judged_stale(tmp_path):
    """A sentinel wearing a pid that was RECYCLED by a process started
    after the sentinel was written is stale (the /proc start-time guard)
    — without it, pid-first semantics would hold the lock forever."""
    import socket
    import time

    lockpath = str(tmp_path / "s__lock")
    ancient = time.time() - 2 * sketches._LOCK_STALE_SEC
    # our own pid IS a live process, but it started after `ancient`
    # (within 60s slack of now), so it cannot be the sentinel's writer
    import os

    content = f"{os.getpid()} {ancient} {socket.gethostname()}"
    with open(lockpath, "w") as f:
        f.write(content)
    assert not sketches._store_lock._sentinel_alive(lockpath, content)
    with sketches._store_lock(str(tmp_path / "s")):  # breaks + acquires
        pass
