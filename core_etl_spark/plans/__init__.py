"""Query registry — the engine's declared capability surface.

Every operator claimed in SURVEY.md §2 is registered here as a
:class:`QuerySpec`: a Spark builder ``(spark, sf_dir) -> DataFrame`` plus an
equivalent ANSI-SQL oracle that DuckDB can run on the same parquet tables.
The driver (and ``tests/test_parity.py``) executes both sides and compares
row count, schema, and an order-insensitive value hash.

Cross-engine determinism rules used throughout (see ``plans/base.py``):

- money/measure doubles are decimal-cast *before* aggregation so sums are
  exact and order-independent, then cast back to double for a stable schema;
- temporal outputs are ISO strings or epoch micros, never raw timestamps;
- every top-k has a total tiebreaker so the selected row *set* is unique.
"""

from __future__ import annotations

from .base import REGISTRY, QuerySpec, register, shared_sql  # noqa: F401

# Importing the spec modules populates REGISTRY.
from . import views_specs  # noqa: F401,E402
from . import verify_specs  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import decode_specs  # noqa: F401,E402
from . import llm_specs  # noqa: F401,E402
from . import multimodal_specs  # noqa: F401,E402
from . import scale_specs  # noqa: F401,E402
from . import corpus_specs  # noqa: F401,E402
from . import temporal_specs  # noqa: F401,E402
from . import maintenance_specs  # noqa: F401,E402

# The driver walks ``queries()`` in dict order and snapshots a bounded prefix
# (every CORRECTNESS_r*.json to date stops at exactly 50 entries; the
# registry holds 121), so ``all_specs`` front-loads the specs with the least
# historical driver coverage. Rotating the front of the list each round gives
# every spec a driver-witnessed row across consecutive snapshots even though
# no single snapshot can hold all of them. Specs not named here follow in
# registration order; pytest runs the full registry regardless of order.
_SNAPSHOT_PRIORITY: tuple[str, ...] = (
    # r06 rotation. l20 leads: it is the one spec whose latest driver row is
    # red (r5 hash-fail, dtype-only — the oracle now CASTs the HUGEINT-derived
    # columns) and it needs its first green hash row.
    "l20_sequence_packing",
    # Then the 43 specs with no r05 row (latest evidence r04, one more silent
    # round would leave them two rounds stale). Oracle-backed specs first,
    # grouped by family; rows-only/stateful specs go to the tail of the 50 so
    # budget truncation never costs oracle coverage.
    "q01_latest_with_fallback",
    "q02_point_by_number",
    "q03_point_by_string_key",
    "q04_full_scan",
    "q05_range_scan",
    "q05b_range_scan_open",
    "q06_children_of_parent",
    "q07_point_composite_key",
    "q08_dynamic_conjuncts",
    "q09_union_all_projection",
    "q10_direction_dispatch",
    "q11_catalog_partitions",
    "v02_sequence_gap_check",
    "v03_positional_check",
    "g01_hash_agg_tpch_q1",
    "g21_percentiles",
    "g22_salted_aggregation",
    "g23_salted_join",
    "j01_asof_join",
    # l41 (BPE tokenizer training, new this session) takes l06x's slot:
    # a first-row ORACLE spec outranks a rows-only refresh (l06x's md5
    # core l06 holds a fresh oracle row and the xxhash variant is
    # pair-set-equivalence-tested); l06x heads the r07 queue below.
    "l41_bpe_merges",
    "l10_ann_lsh_topk",
    "l11_embedding_neardup",
    "l12_ann_ivf_topk",
    "l17_neardup_components",
    "c01_corpus_prep",
    "c02_corpus_mix",
    # Mutation / pipeline / streaming specs (rows-only or slow) — still
    # inside the 50 so their evidence refreshes, but last among the stale.
    "k78_partition_mutations",
    "k11_compaction",
    "o1_backfill_pipeline",
    "o2b_stateful_streaming",
    "o2_streaming_tail",
    # New in r06 (star-CC closure bench spec; chunk-level boilerplate
    # removal; OOV-rate scoring; intra-doc repetition scrub; cleaning
    # composite): first driver rows.
    "l18b_star_cc_chains",
    "l23_boilerplate_chunks",
    "l24_vocab_coverage",
    "l25_intradoc_chunk_dedup",
    "c03_corpus_clean",
    "l19x_decontamination_shuffle",
    "l26_training_shuffle",
    "l27_quality_classifier",
    "c04_fuzzy_dedup",
    "l28_pq_adc_topk",
    "l29_ivfpq_topk",
    "k12_incremental_agg",
    "g28_returns_by_customer_tpch_q10",
    "g29_supplier_diversity_tpch_q16",
    # New oracle specs from the final r06 session — Bloom-prefiltered
    # decontamination (hash row proves the prefilter is lossless),
    # exact-integer mixture rebalancing, substring-span dedup, and
    # fixed-point PageRank. They take the slots of four r04-green
    # zero-shuffle text ops (l13–l16: simple array exprs, lowest
    # staleness risk, parity-green in every local sweep), which move to
    # the r07 front below.
    "l34_bloom_decontamination",
    "l35_mixture_rebalance",
    "l36_duplicated_spans",
    "l38_pagerank",
    # ---- 50-cap boundary. With 121 specs and a 50-row snapshot, eight
    # r04-witnessed rows must wait for r07 (first in line next rotation):
    # m02–m04 (rows-only multimodal stub variants, code untouched since
    # r04, and the family core m01 holds a green r05 row), k09
    # (driver-side retention scheduling, rows-only, unit-tested), v04
    # (1-row tip comparison, unchanged since r04, parity-green locally),
    # j02 (range join, r04-green; j01 keeps the temporal family's slot),
    # and g21b/l12b (rows-only variants whose oracle cores g21/l12 get
    # fresh r06 rows). First-row oracle specs outrank rows-only
    # refreshes for the capped slots; everything below holds a green r05
    # row; t45 (r05-green) yields its warm slot to the nine first-row
    # specs above.
    # l30/l31/c05/o2e (first rows) land just past the cap — they join
    # the r07 front alongside the holdbacks below, as do the remaining
    # final-session specs (c07/g30/o2f first rows) and the four text ops
    # displaced above (l13–l16).
    "c07_canonical_per_cluster",
    "c08_span_excision",
    "c09_corpus_snapshot_diff",
    "l37_temperature_sampling",
    "l39_token_rarity",
    "l40_bigram_lm",
    "l41b_bpe_vocab",
    "l42_hashed_embedding",
    "l43_bpe_token_count",
    "g33_bucketed_colocated_join",
    "g34_order_priority_tpch_q4",
    "g35_shipmode_tpch_q12",
    "g36_promo_revenue_tpch_q14",
    "g37_forecast_revenue_tpch_q6",
    "g38_small_quantity_revenue_tpch_q17",
    "v06_referential_check",
    "k13_incremental_join",
    "l06x_ngram_jaccard_xxhash",
    "m05_image_dedup_ahash",
    "g30_zorder_layout",
    "g31_large_orders_tpch_q18",
    "g32_exclusive_supplier_orders_tpch_q21",
    "v05_column_profile",
    "o2f_streaming_session_window",
    "l13_repetition_stats",
    "l14_pii_scrub",
    "l15_stratified_sample",
    "l16_vocab_topk",
    "l30_gopher_quality",
    "l31_doc_chunking",
    "c05_training_ready",
    "o2e_stream_stream_join",
    "l32_tfidf_keywords",
    "c06_incremental_dedup",
    "l33_span_corruption",
    "g21b_approx_sketches",
    "l12b_ann_ivf_kmeans",
    "j02_range_join",
    "v04_tip_comparison",
    "k09_retention_cleanup",
    "m02_image_resize",
    "m03_audio_features",
    "m04_video_frame_sample",
    "t45_transfer_decode",
    "t3_address_filter",
    "k06_maturity_flag",
    "k10_reorg_detect",
    "v02b_sequence_gap_scalable",
    "g13_hex_conversion",
    "t4678_cbc20_extract",
    "g02_join_agg_topk_tpch_q3",
    "g03_star_join_tpch_q5",
    "g04_semi_join",
    "g05_anti_join",
    "g06_distinct_count",
    "g06b_approx_distinct",
    "g07_rollup",
    "g07b_cube",
    "g07c_grouping_sets",
    "g08_window_functions",
    "g08b_window_distribution",
    "g09_topk_per_group",
    "g10_set_ops",
    "g11_string_functions",
    "g12_datetime_functions",
    "g14_json_functions",
    "g15_array_functions",
    "g16_tumbling_window",
    "g16b_sliding_window",
    "g17_sessionization",
    "g18_pivot_conditional_agg",
    "g19_scalar_subquery",
    "g20_decorrelated_subquery",
    "g24_time_range_frame",
    "g25_recursive_cte",
    "g26_lateral_topk",
    "l01_exact_dedup",
    "l02_text_stats",
    "l03_token_count",
    "l04_language_id",
    "l05_fingerprint",
    "l06_ngram_jaccard_dedup",
    "l07_minhash_lsh_dedup",
    "l07x_minhash_lsh_xxhash",
    "l08_simhash_dedup",
    "l09_cosine_topk",
    "l18_neardup_components_star",
    "l19_decontamination",
    "l21_hash_split",
    "l22_editdist_dedup",
    "m01_image_features",
    "o2c_stream_dedup_watermark",
)


def all_specs() -> dict[str, QuerySpec]:
    # A typo or renamed spec here would silently waste one of the driver's 50
    # snapshot slots — fail loudly instead (ADVICE r05).
    unknown = set(_SNAPSHOT_PRIORITY) - set(REGISTRY)
    if unknown:
        raise AssertionError(
            f"_SNAPSHOT_PRIORITY names not in REGISTRY: {sorted(unknown)}"
        )
    ordered: dict[str, QuerySpec] = {}
    for name in _SNAPSHOT_PRIORITY:
        ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
