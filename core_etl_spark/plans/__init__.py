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
    # r08 rotation — VERDICT r07 directive 1: front the ten TPC-H-completion
    # specs (first driver rows; the full-22 claim rests on pytest until these
    # land), then the refreshes whose implementation moved in r07 after their
    # last driver row (l06/l07 lazy-checkpoint pass, l17 fused-star rounds,
    # v03 two-phase ranks) and the BPE family (its training code is refactored
    # this round for batched merges — re-witness the canonical path), then the
    # r05-stale backlog in family order. 48 r05-stale specs + 10 new don't fit
    # in one 50-slot snapshot; the cut leaves 12 oracle r05 specs
    # (g16/g16b/g17, l03/l04/l05, l08/l09, l19/l21/l22, v02b) for the r09
    # rotation. Oracle-backed specs first; rows-only tail so budget truncation
    # never costs oracle coverage.
    #
    # -- never-witnessed: the TPC-H completion (oracle) ----------------------
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
    # -- refreshes: implementation moved after latest driver row (oracle) ----
    "l06_ngram_jaccard_dedup",
    "l07_minhash_lsh_dedup",
    "l17_neardup_components",
    "v03_positional_check",
    "l41_bpe_merges",
    "l41b_bpe_vocab",
    "l43_bpe_token_count",
    # -- promoted to oracle this round (deterministic streaming harness) -----
    "o2c_stream_dedup_watermark",
    # -- r05-stale backlog (oracle), relational core first --------------------
    "g02_join_agg_topk_tpch_q3",
    "g03_star_join_tpch_q5",
    "g20_decorrelated_subquery",
    "g04_semi_join",
    "g05_anti_join",
    "g06_distinct_count",
    "g07_rollup",
    "g07b_cube",
    "g07c_grouping_sets",
    "g08_window_functions",
    "g08b_window_distribution",
    "g09_topk_per_group",
    "g10_set_ops",
    "g11_string_functions",
    "g12_datetime_functions",
    "g13_hex_conversion",
    "g14_json_functions",
    "g15_array_functions",
    "g18_pivot_conditional_agg",
    "g19_scalar_subquery",
    "g24_time_range_frame",
    "g25_recursive_cte",
    "g26_lateral_topk",
    "k06_maturity_flag",
    "k10_reorg_detect",
    "l01_exact_dedup",
    "l02_text_stats",
    "t3_address_filter",
    "t45_transfer_decode",
    "t4678_cbc20_extract",
    # -- rows-only tail -------------------------------------------------------
    "l07x_minhash_lsh_xxhash",
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
