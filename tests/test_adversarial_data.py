"""Adversarial-DATA semantics pins (r13) — the corrupt-corpus behavior
the full parity sweep (scripts/adv_data_parity.py) proved out, pinned on
tiny fixtures so regressions surface in seconds. The sweep corrupts the
real sf0.001 tables (NULL/empty/whitespace text, NULL/empty/truncated
embeddings) and value-hash-compares every corpus-surface spec against
its DuckDB oracle on the SAME corrupted data; after the r13 fixes all 63
are green. These tests pin the operator-level rules that made it so:

- similarity: NULL/empty/wrong-dim vectors are excluded everywhere
  (valid_vectors); zero-norm vectors are excluded from cosine paths
  (with_norm) — no DIVIDE_BY_ZERO, no len(None), no KMeans fit crash;
- shingles: only non-empty fragments are tokens, zero-token docs yield
  zero shingles — blank docs can never pool into one giant bogus
  near-dup cluster;
- repetition stats: zero-token docs get n_ngrams=0 and NULL ratios;
- span ops / chunk dedup: NULL text null-propagates (a row with NULL
  outputs, never fabricated '' or a silently dropped row);
- temperature sampling: NULL strata excluded from counts AND admission.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from core_etl_spark.operators import dedup as D
from core_etl_spark.operators import similarity as S
from core_etl_spark.operators import text as X


def _docs(spark):
    rows = [(0, None), (1, ""), (2, "   "), (3, "a b c d e f"),
            (4, "a b c d e f")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _vecs(spark):
    rows = [(0, None), (1, []), (2, [1.0, 2.0]), (3, [0.0] * 4),
            (4, [1.0, 0.0, 0.0, 0.0]), (5, [0.0, 1.0, 0.0, 0.0]),
            (6, [1.0, 1.0, 0.0, 0.0]), (7, [1.0, None, 0.0, 0.0])]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_valid_vectors_drops_null_empty_wrong_dim(spark):
    # id 7 is the ADVICE r13 shape: right dimension but a NULL element —
    # Spark's decimal fold null-propagates where DuckDB's list_sum skips
    # nulls, so the only cross-engine-agreed semantics is exclusion.
    out, dim = S.valid_vectors(_vecs(spark))
    assert dim == 4  # modal dimension
    assert {r.vec_id for r in out.collect()} == {3, 4, 5, 6}


def test_with_norm_drops_zero_norm(spark):
    n = S.with_norm(_vecs(spark).filter(F.col("vec_id").isin([3, 4])))
    assert {r.vec_id for r in n.collect()} == {4}  # all-zero vector gone


def test_brute_force_topk_survives_malformed_vectors(spark):
    # the 4 crash classes in one corpus: NULL, empty, wrong-dim, zero-norm
    vecs = _vecs(spark)
    out = S.brute_force_topk(vecs, vecs, k=2).collect()
    ids = {r.query_id for r in out} | {r.neighbor_id for r in out}
    assert ids <= {4, 5, 6}
    assert all(r.cosine_sim is not None for r in out)


def test_kmeans_centroids_survives_malformed_vectors(spark):
    cents = S.kmeans_centroids(_vecs(spark), n_centroids=2)
    assert cents.count() == 2


def test_pq_codebooks_skip_invalid_training_rows(spark):
    cb = S.pq_codebooks_first_k(_vecs(spark), m=2, ksub=16)
    # ids 3..6 are the valid dim-4 vectors among ids < 16
    assert len(cb) == 2 and len(cb[0]) == 4


def test_doc_shingles_blank_docs_yield_nothing(spark):
    sh = {r.doc_id: r.shingles for r in D.doc_shingles(_docs(spark)).collect()}
    assert sh[0] == [] and sh[1] == [] and sh[2] == []
    assert sh[3] == ["a b c", "b c d", "c d e", "d e f"]
    # the pair explosion this prevents: blank docs never become candidates
    pairs = D.jaccard_pairs(_docs(spark), threshold=0.5).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(3, 4)}


def test_repetition_stats_blank_docs_null_ratios(spark):
    out = {r.doc_id: r for r in X.repetition_stats(_docs(spark), n=5)
           .select("doc_id", "n_ngrams", "dup_ngram_ratio", "top_token_ratio")
           .collect()}
    for blank in (0, 1, 2):
        r = out[blank]
        assert r.n_ngrams == 0
        assert r.dup_ngram_ratio is None and r.top_token_ratio is None
    assert out[3].n_ngrams == 2 and out[3].dup_ngram_ratio == 0.0


def test_span_excision_null_text_null_propagates(spark):
    out = {r.doc_id: r for r in
           D.excise_duplicated_spans(_docs(spark), n=8, min_docs=2).collect()}
    assert out[0].cleaned_text is None and out[0].n_tokens is None
    assert out[1].cleaned_text == ""  # empty doc passes through, not NULL
    assert len(out) == 5  # every input doc keeps a row


def test_temperature_sample_null_stratum_excluded_from_counts(spark):
    from core_etl_spark.operators.sampling import temperature_sample

    rows = [(i, "big") for i in range(100)] + [(100 + i, "small") for i in range(25)]
    rows += [(200 + i, None) for i in range(5)]  # must not set n_min = 5
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept, thr = temperature_sample(df, alpha=0.5)
    assert set(thr) == {"big", "small"}
    assert thr["small"] == (1 << 32)  # smallest REAL stratum survives whole
    assert kept.filter(F.col("lang").isNull()).count() == 0


def test_adv_sweep_script_importable_and_corruption_deterministic(spark):
    # the sweep's corruption is keyed on ids (no RNG), so both engines see
    # identical corrupted bytes — pin the documents corruption cycle.
    import duckdb

    con = duckdb.connect()
    got = con.execute("""
        SELECT doc_id % 23 AS k,
               CASE doc_id % 23 WHEN 0 THEN NULL WHEN 1 THEN ''
                    WHEN 2 THEN '   ' ELSE 'orig' END AS t
        FROM (SELECT unnest(generate_series(0, 4)) AS doc_id)
        ORDER BY doc_id
    """).fetchall()
    assert got == [(0, None), (1, ""), (2, "   "), (3, "orig"), (4, "orig")]


# --- temporal / maintenance null rules (r13 events-leg findings) --------------


def test_asof_join_null_rules(spark):
    # the three dirty-data rules, each a real cross-engine divergence or
    # stage-risk the events-leg sweep found:
    # 1. a NULL-ts mark is dropped (it would otherwise leak its value
    #    into EVERY left row via NULLS FIRST window order);
    # 2. a NULL-VALUE mark is still "the latest" and yields NULL (the
    #    old bare-column ignorenulls carry resurrected an older value);
    # 3. NULL-ts or NULL-key left rows get NULL (no timeline).
    from core_etl_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 7, "2024-01-01 10:00:00"), (2, 7, None), (3, None, "2024-01-01 10:00:00")],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"))
    marks = spark.createDataFrame(
        [(7, "2024-01-01 08:00:00", 10.0),   # older real mark
         (7, "2024-01-01 09:00:00", None),   # newest mark: NULL value
         (7, None, 99.0),                     # un-timed mark: dropped
         (None, "2024-01-01 07:00:00", 55.0)],  # keyless mark: dropped
        "user_id long, ts_s string, v double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "v")
    out = {r.event_id: r.v for r in
           asof_join(left, marks, on="ts", by="user_id",
                     right_cols=("v",), suffix="").collect()}
    assert out[1] is None  # newest prior mark has NULL value — NOT 10.0/99.0
    assert out[2] is None  # un-timed left: no "most recent prior"
    assert out[3] is None  # keyless left: no timeline


def test_incremental_agg_merge_null_keys_one_group(spark):
    # GROUP BY pools NULL keys into one group; the merge's full-outer
    # join must match them too (null-safe <=>), or merged != recompute
    # the moment a key column has nulls.
    from core_etl_spark.operators.maintenance import incremental_agg_merge

    def agg(df):
        return df.groupBy("k").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("v").cast("decimal(12,2)")).cast("decimal(18,2)")
            .alias("total_v"),
        )

    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("a", 3.0), (None, 4.0), ("a", 5.0)],
        "k string, v double",
    )
    merged = incremental_agg_merge(
        agg(df.limit(3)), agg(df.subtract(df.limit(3))), ("k",)
    )
    whole = {(r.k,): (r.n_events, float(r.total_v)) for r in agg(df).collect()}
    got = {(r.k,): (r.n_events, float(r.total_v)) for r in merged.collect()}
    assert got == whole  # one NULL-key row, correct totals


def test_g15_array_ops_null_and_empty_arrays(spark):
    # element_at on an empty array kills the stage under ANSI; the spec
    # uses try_element_at and SQL sum-of-empty-is-NULL semantics.
    from core_etl_spark.plans import REGISTRY
    import duckdb
    import os
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="g15_adv_")
    try:
        spark.createDataFrame(
            [(0, None, 0), (1, [], 1), (2, [1.5, 2.5], 2)],
            "vec_id long, embedding array<float>, label int",
        ).write.parquet(os.path.join(root, "embeddings.parquet"))
        spec = REGISTRY["g15_array_functions"]
        rows = {r.vec_id: r for r in spec.builder(spark, root).collect()}
        assert rows[0].first_val is None and rows[0].coord_sum is None
        assert rows[1].dim == 0 and rows[1].first_val is None \
            and rows[1].coord_sum is None
        assert rows[2].first_val == 1.5 and rows[2].coord_sum == 4.0
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{os.path.join(root, 'embeddings.parquet')}/*.parquet')")
        odf = con.execute(spec.oracle).fetchdf().sort_values("vec_id")
        assert [None if v != v else v for v in odf["coord_sum"]] == \
            [None, None, 4.0]
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --- relational TPC-H-leg rules (r13 third corruption leg) --------------------


def test_salted_count_sum_keeps_null_key_group(spark):
    # GROUP BY produces a NULL-key group; the one-pass salted form keeps
    # it (the old salted_count JOIN salted_sum dropped it) and matches
    # the plain groupBy exactly.
    from core_etl_spark.operators import skew

    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (7, 3.0), (7, 4.0), (8, 5.0)],
        "k long, v double",
    )
    got = {r.k: (r.n, float(r.total)) for r in skew.salted_count_sum(
        df, ["k"], F.col("v").cast("decimal(20,2)")).collect()}
    want = {r.k: (r["count(1)"], float(r["sum(v)"])) for r in
            df.groupBy("k").agg(F.count(F.lit(1)), F.sum("v")).collect()}
    assert got == want and None in got


def test_window_specs_declare_null_ordering(spark):
    # shared-SQL window specs run the same text on both engines, whose
    # null-ordering DEFAULTS differ — any window ORDER BY over a nullable
    # column must say NULLS FIRST/LAST explicitly. Pin g08 (the spec the
    # TPC-H corruption leg caught).
    from core_etl_spark.plans import REGISTRY

    sql = REGISTRY["g08_window_functions"].oracle
    assert sql.count("NULLS FIRST") >= 4 and "DESC NULLS LAST" in sql


def test_detect_reorgs_null_hash_flags_not_hides(spark):
    # r14 chain-corruption audit: with plain != a NULL hash on either side
    # made the conflict predicate NULL and the row DROPPED — a reorg at a
    # corrupt height was invisible. IS-DISTINCT-FROM semantics: flag
    # unless provably same (NULL vs NULL: nothing provable, not flagged).
    from core_etl_spark.operators.maintenance import detect_reorgs

    stored = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "number long, hash string"
    )
    incoming = spark.createDataFrame(
        [(2, "b", "a"),      # stored hash NULL vs incoming b → flagged
         (3, None, None),    # incoming hash NULL vs stored c → flagged;
                             # parent NULL vs stored-2 NULL → provably-same? no,
                             # nothing provable — NOT flagged via parent
         (4, "d", "c")],     # clean: parent c == stored-3 c
        "number long, hash string, parent_hash string",
    )
    out = {r.forked_number for r in detect_reorgs(stored, incoming).collect()}
    assert out == {2, 3}


def test_editdist_unit_is_utf8_bytes(spark):
    # r14 multibyte leg: Spark's levenshtein counts code points, DuckDB's
    # counts UTF-8 bytes — same function name, different answers on CJK.
    # The portable contract is the BYTE unit (ISO-8859-1 re-decode trick);
    # on ASCII the units coincide, and a byte-priced edit can only make
    # the max_dist gate stricter, never fabricate a near-dup.
    import duckdb

    rows = [(1, "abcdefghijklmnopqq 你好"), (2, "abcdefghijklmnopqq 你坏"),
            (3, "abcdefghijklmnopqq plain"), (4, "abcdefghijklmnopqq plane")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.edit_dist
           for r in D.editdist_pairs(df, max_dist=50, prefix_len=16).collect()}
    want = {}
    con = duckdb.connect()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = con.execute(
                "SELECT levenshtein(?, ?)",
                [rows[i][1].lower(), rows[j][1].lower()],
            ).fetchone()[0]
            want[(rows[i][0], rows[j][0])] = d
    assert got == want
    assert got[(1, 2)] == 2   # byte distance (好→坏 shares its first byte)
    # the Spark-native code-point unit stays available, just not oracle-backed
    cp = {(r.id_a, r.id_b): r.edit_dist
          for r in D.editdist_pairs(df, max_dist=50, prefix_len=16,
                                    unit="codepoint").collect()}
    assert cp[(1, 2)] == 1


def test_valid_vectors_excludes_nonfinite_elements(spark):
    # r14 numeric-extremes leg: a NaN/±Inf coordinate has no rankable dot
    # product, DuckDB cannot even TRY_CAST NaN onto the shared decimal
    # quantization grid, and Spark ML KMeans raises on such vectors (the
    # sweep caught l12b dying mid-stage on one planted NaN). The gate
    # excludes them on both engines (_VALID_VEC_SQL mirrors).
    nan, inf = float("nan"), float("inf")
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [nan, 0.0, 0.0, 0.0]),
            (2, [0.0, inf, 0.0, 0.0]), (3, [0.0, 0.0, -inf, 0.0]),
            (4, [0.5, 0.5, 0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept, dim = S.valid_vectors(df, dim=4)
    assert {r.vec_id for r in kept.collect()} == {0, 4}
    assert dim == 4


def test_ledger_cast_contract_nan_inf_overflow_to_null(spark):
    # r14 ledger-cast contract (plans/relational.py): a measure the
    # DECIMAL(12,2) grid cannot represent — NaN, ±Inf, finite overflow —
    # contributes NULL (excluded from SUM). Plain CAST is a stage-killer
    # on BOTH engines: Spark/ANSI raises NUMERIC_VALUE_OUT_OF_RANGE on
    # 1e308, DuckDB errors on NaN EVEN under TRY_CAST (hence the isnan
    # guard in the oracles). Spark's try_cast == the guarded SQL exactly.
    import duckdb

    vals = [1.5, 2.25, float("nan"), float("inf"), float("-inf"), 1e308, None]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = df.agg(
        F.sum(F.col("value").try_cast("decimal(12,2)"))
        .cast("double").alias("s")
    ).collect()[0].s
    con = duckdb.connect()
    want = con.execute(
        "SELECT CAST(SUM(CASE WHEN NOT isnan(value) THEN"
        " TRY_CAST(value AS DECIMAL(12,2)) END) AS DOUBLE)"
        " FROM (SELECT unnest(?::DOUBLE[]) AS value)", [vals]
    ).fetchone()[0]
    assert got == want == 3.75


def test_loglin_saturates_out_of_domain_excludes_nan(spark):
    # r14: ±Inf / finite-overflow measures SATURATE to the extreme bucket
    # (keep their count and rank — dropping them would shift every upper
    # quantile left), NaN is excluded like NULL (no order rank, and
    # least(NaN, rail) would silently alias it to the rail). Without the
    # clamp, floor(1e308·2^8) is +Inf and the BIGINT cast is a
    # stage-killer under ANSI. The DuckDB replay shares the clamp.
    import duckdb

    from core_etl_spark.operators import sketches as SK

    vals = [1.0, 2.0, 1e308, float("inf"), float("-inf"), float("nan"), None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    hist = {r.bucket: r.n for r in SK.loglin_histogram(df, "v").collect()}
    assert sum(hist.values()) == 5  # NaN + NULL excluded
    rail_bucket = max(hist)
    con = duckdb.connect()
    expr = SK.loglin_bucket_sql("v")
    dd = con.execute(
        f"SELECT {expr} AS b, count(*) FROM (SELECT unnest(?::DOUBLE[]) AS v)"
        " WHERE v IS NOT NULL AND NOT isnan(v) GROUP BY b", [vals]
    ).fetchall()
    assert {b: n for b, n in dd} == hist
    # +Inf and 1e308 share the saturation bucket; -Inf sits in its mirror
    assert hist[rail_bucket] == 2
    assert min(hist) == -2 - rail_bucket


def test_floor_epoch_seconds_pre_epoch_and_domain_edges(spark):
    # r14 temporal-extremes leg: Spark's unix_timestamp truncates toward
    # ZERO (-89.5 s -> -89) while floor(epoch()) floors (-90) — the two
    # agreed for 54 years of positive epochs and diverge on every
    # pre-1970 fractional second. The portable recipe stays integer:
    # subtract the positive mod of the exact microseconds, then an exact
    # division (g24's epoch_s; the oracle mirrors, where DuckDB's
    # round-on-cast absorbs the double error that Spark's truncate-on-
    # cast would not).
    import duckdb

    vals = ["1677-09-21 00:12:44.5", "1969-12-31 23:58:30.5",
            "2262-04-11 23:47:16", "1970-01-01 00:00:00",
            "2024-03-05 07:08:09.123456"]
    got = [
        r.e
        for r in spark.createDataFrame([(v,) for v in vals], "s string")
        .select(F.expr(
            "(unix_micros(CAST(s AS TIMESTAMP)) - "
            "pmod(unix_micros(CAST(s AS TIMESTAMP)), 1000000)) div 1000000"
        ).alias("e"))
        .collect()
    ]
    con = duckdb.connect()
    want = [con.execute(
        "SELECT CAST((epoch_us(t) - ((epoch_us(t) % 1000000) + 1000000) % 1000000)"
        " / 1000000 AS BIGINT) FROM (SELECT ?::TIMESTAMP AS t)", [v]
    ).fetchone()[0] for v in vals]
    assert got == want == [-9223372036, -90, 9223372036, 0, 1709622489]


def test_asof_join_simultaneous_marks_carry_max(spark):
    # r14 temporal-extremes leg: two marks of one key at the SAME instant
    # have no defined "most recent" — DuckDB's native ASOF picks one
    # arbitrarily; the engine's contract is deterministic: the greatest
    # payload wins (the tie window orders by value; j01's oracle
    # collapses with MAX to match). Unique-ts data is unaffected.
    from core_etl_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00")], "user_id long, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    marks = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00", 8.0),
         (1, "2024-01-01 00:05:00", 1.5),
         (1, "2024-01-01 00:05:00", None)],
        "user_id long, ts string, mark_value double",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "mark_value")
    out = asof_join(left, marks, on="ts", by="user_id",
                    right_cols=("mark_value",), suffix="").collect()
    assert [r.mark_value for r in out] == [8.0]


def test_bound_event_time_blocks_watermark_poison(spark):
    # r14 temporal-extremes leg: the watermark only advances, so ONE
    # far-future row turns every later honest event into dropped "late
    # data" (the sweep measured o2e emitting 6 of 163 rows after a single
    # planted 2262-04-11 event). bound_event_time is the guard: honest
    # rows pass, epoch zero / domain edges / pre-epoch garbage do not.
    from core_etl_spark.streaming.windows import bound_event_time

    rows = [(1, "2024-01-01 00:00:00"), (2, "2262-04-11 23:47:16"),
            (3, "1677-09-21 00:12:44"), (4, "1970-01-01 00:00:00"),
            (5, "1969-12-31 23:58:30"), (6, None),
            (7, "2024-06-01 12:00:00")]
    df = spark.createDataFrame(rows, "event_id long, s string").select(
        "event_id", F.col("s").cast("timestamp").alias("ts"))
    kept = {r.event_id for r in bound_event_time(df).collect()}
    assert kept == {1, 7}


def test_max_tokens_valve_bounds_pathological_docs(spark):
    # r14 pathological-document valve: per-doc shingle cost is O(tokens)
    # and the MinHash stage multiplies it by num_hashes, all inside ONE
    # task — a 10^8-token log-spam doc is a multi-minute straggler. The
    # opt-in max_tokens cap shingles each doc's PREFIX only (the standard
    # near-dup practice); capped output equals shingling the truncated
    # text, and docs under the cap are untouched.
    rows = [(1, "a b c d e f g h"), (2, " ".join(f"t{i}" for i in range(500)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {r.doc_id: r.shingles
              for r in D.doc_shingles(df, max_tokens=8).collect()}
    full = {r.doc_id: r.shingles for r in D.doc_shingles(df).collect()}
    assert capped[1] == full[1]                      # under the cap: identical
    truncated = " ".join(f"t{i}" for i in range(8))
    want = {r.doc_id: r.shingles for r in D.doc_shingles(
        spark.createDataFrame([(2, truncated)], "doc_id long, text string")
    ).collect()}
    assert capped[2] == want[2]                      # over: prefix shingles
    assert len(capped[2]) == 6 and len(full[2]) == 498


def test_measure_cast_quarantine_counts(spark):
    # ADVICE r14: the ledger-cast contract silently NULLs any measure the
    # DECIMAL(12,2) grid rejects; the quarantine audit must count every
    # such drop by class so the channel is observable. Planted fixture:
    # each class exactly once, plus NULL (not quarantined — it was never a
    # value) and representable values (kept).
    from core_etl_spark.operators.verify import measure_cast_quarantine

    rows = [
        (1.0,),
        (9_999_999_999.99,),   # decimal(12,2) max — representable
        (float("nan"),),
        (float("inf"),),
        (float("-inf"),),
        (1e308,),              # finite overflow
        (10_000_000_000.0,),   # 1e10: finite, just past the grid
        (None,),
    ]
    df = spark.createDataFrame(rows, "m double")
    out = {r["col"]: r for r in measure_cast_quarantine(df, ["m"]).collect()}
    m = out["m"]
    assert m["n_rows"] == 8
    assert m["n_nonnull"] == 7
    assert m["n_nan"] == 1
    assert m["n_inf"] == 2
    assert m["n_overflow"] == 2
    assert m["n_quarantined"] == 5
    # and the audit itself never raises on the values it counts
    with pytest.raises(ValueError):
        measure_cast_quarantine(df, [])


def test_blank_docs_never_enter_band_buckets(spark):
    # r15 (sf10 corrupt soak finding): zero-shingle docs minhash to
    # array_min([]) = NULL for every permutation → ONE constant bucket
    # shared by every blank/NULL doc in the corpus. 13% dirt at sf10 put
    # 65k docs in that bucket (~4e9 candidate pairs per band — hash-agg
    # OOM before verification could drop them). band_buckets must exclude
    # them at the source; the pair pipeline's final output is unchanged
    # (blank pairs could never pass Jaccard verification).
    from core_etl_spark.operators.dedup import (
        band_buckets,
        doc_shingles,
        minhash_dedup_pairs,
    )

    rows = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
            (3, None), (4, ""), (5, "   "), (6, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for fn in ("md5", "xxhash64"):
        b = band_buckets(doc_shingles(df), hash_fn=fn)
        assert {r.doc_id for r in b.select("doc_id").distinct().collect()} == {1, 2}
        pairs = minhash_dedup_pairs(df, hash_fn=fn).collect()
        assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_blank_docs_never_enter_editdist_blocks(spark):
    # r15 rule-17 sweep of the remaining candidate-generation paths:
    # NULL/empty/whitespace texts normalize into the ''/' ' prefix blocks
    # and their pairwise distance is 0 ≤ max_dist — the block join would
    # EMIT the quadratic blank-pair set, not just compute it. Excluded at
    # the source; real near-dups unaffected.
    rows = [(1, "the quick brown fox jumps over it"),
            (2, "the quick brown fox jumps over at"),
            (3, None), (4, ""), (5, "   "), (6, "\t\n "), (7, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in D.editdist_pairs(df, max_dist=20).collect()}
    assert pairs == {(1, 2)}
