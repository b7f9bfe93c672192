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
# registry holds 88), so ``all_specs`` front-loads the specs with the least
# historical driver coverage. Rotating the front of the list each round gives
# every spec a driver-witnessed row across consecutive snapshots even though
# no single snapshot can hold all of them. Specs not named here follow in
# registration order; pytest runs the full registry regardless of order.
_SNAPSHOT_PRIORITY: tuple[str, ...] = (
    # r05 rotation: the 33 specs with no r04 row (latest evidence is r03)
    # lead, so every one of them gets a fresh driver-witnessed row. The
    # t45/t4678 decode core goes first — it is the heart of the reference
    # surface and its evidence is the oldest that matters.
    "t45_transfer_decode",
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
    "g09_topk_per_group",
    "g10_set_ops",
    "g11_string_functions",
    "g12_datetime_functions",
    "g13_hex_conversion",
    "g14_json_functions",
    "g15_array_functions",
    "g16_tumbling_window",
    "g18_pivot_conditional_agg",
    "g19_scalar_subquery",
    "g20_decorrelated_subquery",
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
    # Red in r04 (canon-unsafe list column, fixed this round): needs its
    # first-ever green row.
    "m01_image_features",
    # New in r05 (star connected components, benchmark decontamination,
    # sequence packing): first driver rows.
    "l18_neardup_components_star",
    "l19_decontamination",
    "l20_sequence_packing",
    "l21_hash_split",
    "l22_editdist_dedup",
    "g08b_window_distribution",
    "g24_time_range_frame",
    "g25_recursive_cte",
    "g26_lateral_topk",
    "o2c_stream_dedup_watermark",
    # Remaining slots up to the 50-cap: oracle-backed specs refreshed in
    # r04, cheapest/most-informative first, so the bounded prefix stays
    # maximally oracle-checked (ADVICE r04: rows-only stateful specs go to
    # the tail — they all hold green r04 rows already).
    "k06_maturity_flag",
    "k10_reorg_detect",
    "v02b_sequence_gap_scalable",
    "g16b_sliding_window",
    "g17_sessionization",
    "t3_address_filter",
    # ---- 50-cap boundary lands around here; everything below is witnessed
    # in r04 and/or rows-only. Stateful/streaming specs stay last so budget
    # truncation never costs oracle coverage.
    "g21_percentiles",
    "l17_neardup_components",
    "g22_salted_aggregation",
    "g23_salted_join",
    "j01_asof_join",
    "j02_range_join",
    "l13_repetition_stats",
    "l14_pii_scrub",
    "l15_stratified_sample",
    "l16_vocab_topk",
    "g21b_approx_sketches",
    "c01_corpus_prep",
    "c02_corpus_mix",
    "l10_ann_lsh_topk",
    "l11_embedding_neardup",
    "l12_ann_ivf_topk",
    "l12b_ann_ivf_kmeans",
    "m02_image_resize",
    "m03_audio_features",
    "m04_video_frame_sample",
    "k11_compaction",
    "k78_partition_mutations",
    "o1_backfill_pipeline",
    "k09_retention_cleanup",
    "o2b_stateful_streaming",
    "o2_streaming_tail",
)


def all_specs() -> dict[str, QuerySpec]:
    ordered: dict[str, QuerySpec] = {}
    for name in _SNAPSHOT_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
