"""Empty-input semantics pins (r16 empty-table sweep).

The sweep (scripts/empty_table_parity.py) ran all 176 registry specs and
their DuckDB oracles against a zero-row, schema-identical twin of every
table — the day-zero state of any deployment and of every new
partition/tenant/date slice before its first ingest. 169 were already
empty-in/empty-out clean; this file pins the divergences it found and
the fixes:

- Spark's grouping-sets Expand emits ZERO rows over empty input even for
  the ``()`` grouping set, where ANSI (and DuckDB/Postgres) define the
  grand total as a global aggregate — ONE row always. The g07 family now
  spells the () set as a UNION ALL global-aggregate leg; the native
  deviation is pinned here so a future Spark fix flags the
  simplification.
- The ANN top-k / near-dup operators raised from dimension inference or
  centroid/codebook training on an empty corpus, though the query answer
  (zero neighbors / zero pairs) is perfectly defined. They now
  short-circuit to a schema-correct empty frame via
  :class:`EmptyVectorColumn`; MODEL builds (k-means fit, PQ codebook
  training, index writes) still raise — fitting a model to nothing has
  no defined output — and the non-empty config error (ids not dense from
  0) stays loud.
"""
from __future__ import annotations

import os
import sys

import pytest

from pyspark.sql import functions as F

from core_etl_spark.operators import similarity as S
from core_etl_spark.plans import REGISTRY
from tests.parity import compare, duck_connection

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)
from empty_table_parity import build_empty_dir  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_empty"))
    build_empty_dir(SF, d)
    return d


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>, label string")


def test_spark_native_rollup_still_drops_grand_total_on_empty(spark):
    """The deviation that motivated the g07 rewrite. If this ever FAILS
    (Spark emitting the ANSI 1-row grand total), the union-leg rewrite in
    plans/relational.py can be simplified back to native ROLLUP/CUBE."""
    spark.createDataFrame([], "a string, b string").createOrReplaceTempView(
        "_empty_rollup_probe"
    )
    got = spark.sql(
        "SELECT a, b, count(*) AS n FROM _empty_rollup_probe GROUP BY ROLLUP(a, b)"
    ).collect()
    assert got == []  # ANSI says one (NULL, NULL, 0) row; Spark drops it


@pytest.mark.parametrize("name", ["g07_rollup", "g07b_cube", "g07c_grouping_sets"])
def test_grouping_sets_specs_emit_grand_total_on_empty(spark, name, empty_dir):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, empty_dir)
    con = duck_connection(empty_dir)
    assert compare(sdf, con.execute(spec.oracle).fetchdf()) == []
    assert sdf.count() == 1  # exactly the grand-total row


@pytest.mark.parametrize("name", ["g07_rollup", "g07b_cube", "g07c_grouping_sets"])
def test_grouping_sets_rewrite_value_identical_on_clean_data(spark, name):
    """The union-leg rewrite is algebraically the original ROLLUP/CUBE/
    GROUPING SETS query — proven against the NATIVE form on real data."""
    native = {
        "g07_rollup": "GROUP BY ROLLUP (l_returnflag, l_linestatus)",
        "g07b_cube": "GROUP BY CUBE (o_orderstatus, o_orderpriority)",
        "g07c_grouping_sets":
            "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())",
    }[name]
    spec = REGISTRY[name]
    sdf = spec.builder(spark, SF)
    con = duck_connection(SF)
    # rebuild the pre-r16 oracle text: head of the spec SQL + native tail
    head = spec.oracle.split("GROUP BY GROUPING SETS")[0]
    assert compare(sdf, con.execute(head + native).fetchdf()) == []


#: One spec per family — the per-push subset of the full empty-table
#: sweep (scripts/empty_table_parity.py), same pattern as
#: test_adversarial_sweep's dirty subset: a NEW operator that regresses
#: the empty-in/empty-out contract turns red here, not in a script
#: nobody remembered to run. Each runs sub-second on zero-row tables.
_EMPTY_FAMILY_SAMPLE = [
    "g01_hash_agg_tpch_q1",     # relational agg
    "g07_rollup",               # grouping sets (the grand-total fix)
    "g02_join_agg_topk_tpch_q3",  # join + top-k
    "q01_latest_with_fallback",  # view layer's fallback chain
    "l01_exact_dedup",          # dedup family
    "l07_minhash_lsh_dedup",    # banded dedup
    "l12_ann_ivf_topk",         # ANN (the short-circuit fix)
    "l15_stratified_sample",    # sampling
    "l20_sequence_packing",     # packing
    "c10_corpus_telemetry",     # sketch telemetry
    "v05_column_profile",       # verify family
    "j02_range_join",           # temporal
]


@pytest.mark.parametrize("name", _EMPTY_FAMILY_SAMPLE)
def test_empty_tables_family_sample_matches_oracle(spark, name, empty_dir):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, empty_dir)
    con = duck_connection(empty_dir)
    assert compare(sdf, con.execute(spec.oracle).fetchdf()) == []


@pytest.mark.parametrize("name", _EMPTY_FAMILY_SAMPLE)
def test_one_row_tables_family_sample_matches_oracle(spark, name, one_row_dir):
    """Same sample over the 1-row twins — the day-one-of-ingest state
    (broken referential integrity, everything below its k/strata/
    centroid minimums)."""
    spec = REGISTRY[name]
    sdf = spec.builder(spark, one_row_dir)
    con = duck_connection(one_row_dir)
    assert compare(sdf, con.execute(spec.oracle).fetchdf()) == []


def test_ann_topk_empty_corpus_returns_empty_not_raise(spark, empty_emb):
    for fn in (S.brute_force_topk, S.lsh_ann_topk):
        for dim in (None, 64):
            out = fn(empty_emb, empty_emb, k=3, dim=dim)
            assert out.count() == 0
            assert out.columns == ["query_id", "neighbor_id", "rank", "cosine_sim"]
    out = S.ivf_ann_topk(empty_emb, empty_emb, k=3)
    assert out.count() == 0 and out.columns[-1] == "cosine_sim"
    # declared-dim IVF hits the first-K-centroid path instead of inference
    out = S.ivf_ann_topk(empty_emb, empty_emb, k=3, dim=64)
    assert out.count() == 0 and out.columns[-1] == "cosine_sim"
    for dim in (None, 64):
        out = S.pq_adc_topk(empty_emb, empty_emb, k=3, dim=dim)
        assert out.count() == 0
        assert out.columns == ["query_id", "neighbor_id", "rank", "adc_dist"]
        out = S.ivfpq_adc_topk(empty_emb, empty_emb, k=3, dim=dim)
        assert out.count() == 0 and out.columns[-1] == "adc_dist"


def test_near_dups_empty_corpus_returns_empty_pairs(spark, empty_emb):
    out = S.embedding_near_dups(empty_emb)
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "cosine_sim"]
    # id dtype follows the input so unions with real batches stay stable
    assert dict(out.dtypes)["id_a"] == "bigint"


def test_empty_ann_result_schema_matches_nonempty_path(spark, sf_dir):
    """The short-circuit frame must union cleanly with a real result."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    real = S.brute_force_topk(emb, emb.filter(F.col("vec_id") < 2), k=2, dim=64)
    stub = S._empty_ann_result(emb, "vec_id", "cosine_sim")
    assert [f.dataType for f in stub.schema.fields] == [
        f.dataType for f in real.schema.fields
    ]
    assert real.unionByName(stub).count() == real.count()


def test_model_builds_still_raise_on_empty(spark, empty_emb, tmp_path):
    with pytest.raises(S.EmptyVectorColumn):
        S.kmeans_centroids(empty_emb)
    with pytest.raises(S.EmptyVectorColumn):
        S.write_ivf_index(empty_emb, str(tmp_path / "ivf"))
    with pytest.raises(S.EmptyVectorColumn):
        S.pq_codebooks_kmeans(empty_emb)


def test_first_k_config_error_still_loud_on_nonempty_corpus(spark):
    """Non-dense ids on a NON-empty corpus remain the documented caller
    error — the empty-corpus short-circuit must not swallow it."""
    emb = spark.createDataFrame(
        [(1000 + i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="dense from ~0"):
        S.ivf_ann_topk(emb, emb, k=2, dim=2)
    with pytest.raises(ValueError, match="no valid vectors among ids"):
        S.pq_codebooks_first_k(emb, m=1, ksub=16, dim=2)


@pytest.fixture(scope="module")
def one_row_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_one"))
    build_empty_dir(SF, d, limit=1)
    return d


def test_kmeans_clamps_k_to_distinct_vectors(spark):
    """Spark ML KMeans dies with a raw ArrayIndexOutOfBoundsException when
    the training set has fewer DISTINCT points than k (k-means|| returns
    fewer centers than the aggregator indexes). The wrappers recover on
    that failure only: clamp k to the distinct count (a 1-vector corpus
    IS its own centroid — Spark ML rejects k < 2 outright)."""
    one = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    cents = S.kmeans_centroids(one, n_centroids=16)
    assert cents.count() == 1
    assert S.ivf_ann_topk(one, one, k=3, centroids=cents).count() == 0
    dup = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.0, 2.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    assert S.kmeans_centroids(dup, n_centroids=16).count() == 3
    books = S.pq_codebooks_kmeans(dup, m=2, ksub=16)
    assert [len(b) >= 1 for b in books] == [True, True]
    assert S.pq_adc_topk(
        dup, dup.filter(F.col("vec_id") < 2), k=2, codebooks=books
    ).count() == 4


def test_pq_first_k_accepts_single_vector_corpus(spark):
    """One valid vector among the first ksub ids is a legitimate day-one
    corpus: a 1-word sub-codebook quantizes it exactly, and the top-k
    result (zero non-self neighbors) matches the oracle's replay. The
    loud config error is reserved for NO valid early ids on a non-empty
    corpus (see test_first_k_config_error_still_loud_on_nonempty_corpus)."""
    one = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    books = S.pq_codebooks_first_k(one, m=2, ksub=16, dim=4)
    assert [len(b) for b in books] == [1, 1]
    assert S.pq_adc_topk(one, one, k=3, dim=4).count() == 0


def test_o2b_oracle_batch_split_is_formula_driven(spark, one_row_dir):
    """o2b's oracle derives run 2's first micro-batch from ceil(n/50)//2
    exactly like the builder — the old literal "b >= 2" silently emptied
    the oracle on any corpus under 200 qualifying events (1-row sweep:
    spark=2, oracle=0)."""
    spec = REGISTRY["o2b_stateful_streaming"]
    sdf = spec.builder(spark, one_row_dir)
    con = duck_connection(one_row_dir)
    assert compare(sdf, con.execute(spec.oracle).fetchdf()) == []
    assert sdf.count() == 2  # run 2 = batch 0 on a 1-file fixture


def test_index_read_on_empty_centroids_is_designed_loud(spark, tmp_path):
    """A corrupt/partial index (zero-row centroids table) used to die with
    an unguarded TypeError off ``.first()[...]``."""
    p = str(tmp_path / "idx")
    spark.createDataFrame(
        [], "cent_id long, c_dec array<decimal(10,3)>, c_normsq decimal(28,6)"
    ).write.parquet(f"{p}/centroids")
    q = spark.createDataFrame([(0, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty centroids table"):
        S.ivf_index_topk(spark, p, q)
    with pytest.raises(ValueError, match="empty centroids table"):
        S.ivfpq_index_topk(spark, p, q)
