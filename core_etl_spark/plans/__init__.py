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
    # r10 rotation — VERDICT r09 directive 3: burn the ENTIRE 24-spec
    # r06-stale witness backlog (nothing in CORRECTNESS_r10 may be older
    # than r07), re-witness every spec whose implementation changed in
    # r10, then fill with the oldest r07-stale rows. Oracle-backed first;
    # rows-only tail last so budget truncation never costs oracle
    # coverage.
    #
    # -- r06-stale backlog (oracle): all 24, query layer first ---------------
    "q08_dynamic_conjuncts",
    "q09_union_all_projection",
    "q10_direction_dispatch",
    "g28_returns_by_customer_tpch_q10",
    "g29_supplier_diversity_tpch_q16",
    "k12_incremental_agg",
    "k78_partition_mutations",
    "l10_ann_lsh_topk",
    "l11_embedding_neardup",
    "l12_ann_ivf_topk",
    "l19x_decontamination_shuffle",
    "l20_sequence_packing",
    "l23_boilerplate_chunks",
    "l24_vocab_coverage",
    "l25_intradoc_chunk_dedup",
    "l26_training_shuffle",
    "l27_quality_classifier",
    "l28_pq_adc_topk",
    "l29_ivfpq_topk",
    "l36_duplicated_spans",
    "l38_pagerank",
    "c01_corpus_prep",
    "c02_corpus_mix",
    "c03_corpus_clean",
    # -- re-witness r10 code changes (oracle): l18b's star-CC input keeps
    # the eager module default (the r10 A/B pair found the +29% "regression"
    # was session noise — fresh vs bench-session rankings FLIP, see
    # scripts/l18b_ckpt_ab.py / l18b_insession_ab.py), but the new
    # input_mode override touched its code path; o1's
    # receipts join gained the RECEIPTS_JOIN_HINT knob (production path
    # unchanged, decode.py edited); the BPE trainer's batch selection was
    # factored into _bpe_select_disjoint and gained the concat exclusion
    # (batch=1 semantics identical — re-witness the canonical path) -----------
    "l18b_star_cc_chains",
    "o1_backfill_pipeline",
    "l41_bpe_merges",
    "l41b_bpe_vocab",
    "l43_bpe_token_count",
    # -- r07-stale fills (oracle), breadth across families: verify layer,
    # lake maintenance, layout, corpus composites, temporal, then the text
    # ops that would otherwise rot to 3 rounds. The r07 specs NOT fitting
    # (g31/g32/g34-g38 TPC-H, l15, l31-l33, l35, l37, l39, l40, m05 — all
    # oracle-backed and pytest-green every round) are the r11 backlog ---------
    "v04_tip_comparison",
    "v05_column_profile",
    "v06_referential_check",
    "k09_retention_cleanup",
    "k11_compaction",
    "k13_incremental_join",
    "g30_zorder_layout",
    "g33_bucketed_colocated_join",
    "j02_range_join",
    # (c05_training_ready, r07-green, yields its slot to the seventh
    # r10-new spec below; it rotates back in r11)
    "c08_span_excision",
    "c09_corpus_snapshot_diff",
    # (l13_repetition_stats, r07-green, yields its slot to the fifth
    # r10-new spec below; it rotates back in r11)
    "l14_pii_scrub",
    # (l16_vocab_topk, r07-green, yields its slot to the sixth r10-new
    # spec below; it rotates back in r11)
    "l30_gopher_quality",
    "l34_bloom_decontamination",
    # (l42_hashed_embedding, r07-green, yields its slot to the fourth
    # r10-new sketch spec below; it rotates back in r11)
    # -- r10-new specs: the portable sketches must not land never-witnessed.
    # They displace g21b/l12b/l41c — all rows-only, all pytest-covered, all
    # rotating back in r11 (l41c's r10 concat-exclusion change is pinned by
    # test_bpe_select_disjoint_concat_exclusion and its driver row is a bare
    # row count that the change does not move, so the three oracle-backed
    # newcomers are worth strictly more per snapshot slot) --------------------
    "g06c_portable_hll",
    "g21c_sampled_quantiles",
    "g49_cms_heavy_hitters",
    "l44_overlap_sketch",
    "l45_weighted_sample",
    "g50_hot_key_detection",
    "c10_corpus_telemetry",
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
