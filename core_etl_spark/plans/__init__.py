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
# (every CORRECTNESS_r*.json to date stops at exactly 50 entries; the registry
# is larger — ``len(REGISTRY)``, asserted in tests, never hardcoded here), so
# ``all_specs`` front-loads the specs with the least historical driver
# coverage. Rotating the front of the list each round gives every spec a
# driver-witnessed row across consecutive snapshots even though no single
# snapshot can hold all of them. Specs not named here follow in registration
# order; pytest runs the full registry regardless of order.
_SNAPSHOT_PRIORITY: tuple[str, ...] = (
    # r07 rotation — VERDICT r06 directive 1: the registry is FROZEN for the
    # round and the 50 slots burn the whole evidence backlog to zero: the 30
    # specs that have never had a driver row, the 13 whose latest row is r04,
    # and 7 refresh slots for specs whose semantics or oracle changed this
    # round (BPE canonicalization, sampling dispatch, bloom sizing, the o1/k11
    # oracle-ification, and the star-CC closure rework). Oracle-backed specs
    # first, grouped by family; rows-only specs go to the tail of the 50 so
    # budget truncation never costs oracle coverage.
    #
    # -- never-witnessed (oracle) --------------------------------------------
    "c05_training_ready",
    "c06_incremental_dedup",
    "c07_canonical_per_cluster",
    "c08_span_excision",
    "c09_corpus_snapshot_diff",
    "l30_gopher_quality",
    "l31_doc_chunking",
    "l32_tfidf_keywords",
    "l33_span_corruption",
    "l37_temperature_sampling",
    "l39_token_rarity",
    "l40_bigram_lm",
    "l41b_bpe_vocab",
    "l42_hashed_embedding",
    "l43_bpe_token_count",
    "g30_zorder_layout",
    "g31_large_orders_tpch_q18",
    "g32_exclusive_supplier_orders_tpch_q21",
    "g33_bucketed_colocated_join",
    "g34_order_priority_tpch_q4",
    "g35_shipmode_tpch_q12",
    "g36_promo_revenue_tpch_q14",
    "g37_forecast_revenue_tpch_q6",
    "g38_small_quantity_revenue_tpch_q17",
    "v05_column_profile",
    "v06_referential_check",
    "k13_incremental_join",
    # -- r04-stale (oracle) --------------------------------------------------
    "v04_tip_comparison",
    "j02_range_join",
    "l13_repetition_stats",
    "l14_pii_scrub",
    "l15_stratified_sample",
    "l16_vocab_topk",
    # -- refreshes: semantics/oracle changed in r07 (oracle) -----------------
    "l41_bpe_merges",
    "l35_mixture_rebalance",
    "l34_bloom_decontamination",
    "l18b_star_cc_chains",
    "l18_neardup_components_star",
    "o1_backfill_pipeline",
    "k11_compaction",
    "m05_image_dedup_ahash",
    "k09_retention_cleanup",
    # -- never-witnessed + stale + refreshes, rows-only (tail of the 50) -----
    # (all that remains rows-only is genuinely non-oracle-able: streaming
    # state, approximate sketches, xxhash64 keys DuckDB lacks, float
    # feature math)
    "o2e_stream_stream_join",
    "o2f_streaming_session_window",
    "g21b_approx_sketches",
    "l12b_ann_ivf_kmeans",
    "l06x_ngram_jaccard_xxhash",
    "m02_image_resize",
    "m03_audio_features",
    "m04_video_frame_sample",
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
