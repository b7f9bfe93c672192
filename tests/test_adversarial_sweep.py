"""Miniature corrupt-data parity smoke (r14, VERDICT r13 directive 4).

The full adversarial-DATA sweep (scripts/adv_data_parity.py) corrupts
every table and value-hash-compares all 160+ specs — minutes of wall
time, run per round by hand. A regression in the pinned null semantics
between sweeps would go unseen until someone re-runs it, so this module
keeps ONE representative spec per operator family in the default suite:
it builds the same id-keyed corrupted twins of the sf0.001 tables (the
sweep's own generator, imported from the script) and value-hash-compares
each representative against its DuckDB oracle ON the corrupted tables.

Red here = a pinned corrupt-data rule regressed (docs/adversarial-data.md)
— run the full sweep to triage the blast radius.
"""

from __future__ import annotations

import os
import sys

import pytest

from core_etl_spark.plans import REGISTRY
from tests.parity import compare, duck_connection

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)
from adv_data_parity import build_corrupted_dir  # noqa: E402

#: one spec per family the r13 sweep found real bugs in (plus the g14
#: JSON guard): text stats, shingle dedup, similarity, sampling, span
#: excision, array/event functions, sessionization, as-of join, salted
#: null-key aggregation, CMS heavy hitters, JSON oracle guard, window
#: null ordering.
REPRESENTATIVES = (
    "l13_repetition_stats",
    "l06_ngram_jaccard_dedup",
    "l22_editdist_dedup",  # r14 multibyte leg: the byte-unit contract
    "l09_cosine_topk",
    "l37_temperature_sampling",
    "c08_span_excision",
    "g15_array_functions",
    "g17_sessionization",
    "j01_asof_join",
    "g22_salted_aggregation",
    "g49_cms_heavy_hitters",
    "g14_json_functions",
    "g08_window_functions",
    # r14 numeric-extremes leg: the ledger-cast contract (NaN/Inf/1e308
    # measures → NULL) on the events and TPC-H surfaces, and the loglin
    # saturation rail (lineitem's 1e308 arm lands in the extreme bucket).
    "g16_tumbling_window",
    "g01_hash_agg_tpch_q1",
    "g21d_loglin_quantiles",
    # r14 temporal-extremes leg: the exact floor-epoch recipe over the
    # planted pre-epoch / domain-edge timestamps (the as-of tie contract
    # rides the j01 rep above).
    "g24_time_range_frame",
    # r16 NULL-primary-key arms (documents 8, embeddings 7, events 15,
    # lineitem 8, orders 5): one representative per fixed divergence
    # class — the keeper-window/reassembly exclusions (c01 composes
    # exact_dedup + jaccard pairs), the id-ordered packing exclusion,
    # vanishing coalesce-pmod history splits (k13 covers k12's recipe
    # too), NULL-propagating row-key gates + the |pct|<1e12 grid bound
    # (g21c), and the hot-key CMS total exclusion (g50).
    "c01_corpus_prep",
    "l20_sequence_packing",
    "k13_incremental_join",
    "g21c_sampled_quantiles",
    "g50_hot_key_detection",
)


@pytest.fixture(scope="module")
def corrupt_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_adv_smoke"))
    build_corrupted_dir(src="/root/testdata/sf0.001", dst=dst)
    return dst


@pytest.fixture(scope="module")
def corrupt_duck(corrupt_dir):
    return duck_connection(corrupt_dir)


def test_representatives_still_registered():
    missing = [n for n in REPRESENTATIVES if n not in REGISTRY]
    assert not missing, f"representatives vanished from REGISTRY: {missing}"


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_corrupt_data_parity(name, spark, corrupt_dir, corrupt_duck):
    spec = REGISTRY[name]
    assert spec.oracle is not None, f"{name} lost its oracle — pick another representative"
    sdf = spec.builder(spark, corrupt_dir)
    problems = compare(sdf, corrupt_duck.execute(spec.oracle).fetchdf())
    assert not problems, f"{name} diverged on corrupted tables: {problems}"


#: float-bearing family representatives for the NULL-vs-NaN mask check
#: (VERDICT r14 directive 8): the ledger-cast contract on TPC-H and events
#: surfaces, the similarity validity gate, the loglin saturation rail, the
#: sampling thresholds, and the time-RANGE frame — the surfaces where a
#: NULL-vs-NaN regression would hide from the pandas-mediated value hash.
MASK_REPRESENTATIVES = (
    "g01_hash_agg_tpch_q1",
    "g16_tumbling_window",
    "g21d_loglin_quantiles",
    "g24_time_range_frame",
    "l09_cosine_topk",
    "l37_temperature_sampling",
)


@pytest.mark.parametrize("name", MASK_REPRESENTATIVES)
def test_corrupt_data_mask_parity(name, spark, corrupt_dir, corrupt_duck):
    # Native-fetch NULL/NaN/Inf mask compare (tests/parity.mask_diffs, the
    # r14 audit promoted into the default suite): pandas conflates SQL NULL
    # and IEEE NaN in float64 columns, so test_corrupt_data_parity alone
    # cannot see a spec emitting NULL on one engine and NaN on the other.
    # Per key-joined row where the result carries a stable key (ADVICE r14:
    # catches compensating swaps inside a column), per-column multiset
    # otherwise.
    from tests.parity import mask_diffs

    spec = REGISTRY[name]
    sdf = spec.builder(spark, corrupt_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    cur = corrupt_duck.execute(spec.oracle)
    o_cols = [d[0] for d in cur.description]
    diffs = mask_diffs(s_rows, list(sdf.columns), cur.fetchall(), o_cols)
    assert not diffs, f"{name} NULL/NaN mask diverged: {diffs}"
