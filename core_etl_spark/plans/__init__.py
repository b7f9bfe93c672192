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
    # r09 rotation — VERDICT r08 directive 6 (burn the r05-stale witness
    # tail) + re-witness everything whose implementation moved in r09. All
    # 50 slots are named (ADVICE r08). Oracle-backed first; rows-only tail
    # last so budget truncation never costs oracle coverage.
    #
    # -- r05-stale backlog (oracle): the full 12 deferred from r08 -----------
    "g16_tumbling_window",
    "g16b_sliding_window",
    "g17_sessionization",
    "l03_token_count",
    "l04_language_id",
    "l05_fingerprint",
    "l08_simhash_dedup",
    "l09_cosine_topk",
    "l19_decontamination",
    "l21_hash_split",
    "l22_editdist_dedup",
    "v02b_sequence_gap_scalable",
    # -- first oracle rows: the WHOLE streaming family gained real DuckDB
    # oracles in r09. o2b/o2c/o2e/o2f via the deterministic-batching harness
    # (one pinned-mtime file per trigger; o2c replays the dedup state chain
    # with a recursive CTE, o2e's ts-ordered feed makes the streamed interval
    # join provably equal the batch join, o2f's sealed sessions are gap
    # islands under the final watermark, o2b's applyInPandasWithState
    # emissions reduce to windowed aggregates with checkpoint-resumed batch
    # ids); o2 via o1's shared fixture-regeneration digest oracle — the
    # streamed warehouse must be byte-equivalent to a clean batch backfill --
    "o2_streaming_tail",
    "o2b_stateful_streaming",
    "o2c_stream_dedup_watermark",
    "o2e_stream_stream_join",
    "o2f_streaming_session_window",
    # -- refreshes: implementation moved in r09 after the r08 rows (oracle).
    # The dedup family got the window-fused stop-shingle valve and the
    # CHECKPOINT_MODE materialization pass; the BPE family's training loop
    # was rewritten for batched merges (batch=1 canonical path re-witness) --
    "l06_ngram_jaccard_dedup",
    "l07_minhash_lsh_dedup",
    "l17_neardup_components",
    "l18_neardup_components_star",
    "l18b_star_cc_chains",
    "c04_fuzzy_dedup",
    "c06_incremental_dedup",
    "c07_canonical_per_cluster",
    # l06x promoted to oracle in r09: absent a 64-bit shingle-hash
    # collision (~7e-11/run at snapshot scale) its output is identical to
    # l06's, so l06's oracle applies verbatim
    "l06x_ngram_jaccard_xxhash",
    "l41_bpe_merges",
    "l41b_bpe_vocab",
    "l43_bpe_token_count",
    # -- first oracle rows, multimodal: m01-m04 gained md5-chain replay
    # oracles in r09 (exact-int feature math + hex payload comparison —
    # see multimodal_specs module docstring); m01 was an r05-stale
    # rows-only cut ADVICE r08 flagged, now promoted outright ----------------
    "m01_image_features",
    "m02_image_resize",
    "m03_audio_features",
    "m04_video_frame_sample",
    # -- r06-stale fills (oracle), query/verify layer first, then the rest
    # by staleness. The r06 specs NOT fitting this snapshot (q08, q09, q10,
    # g28, g29, k12, k78, l10, l11, l12, l19x, l20, l23, l24, l25, l26,
    # l27, l36, l38, c01, c02, c03 — all oracle-backed) are the r10
    # rotation's backlog -----------------------------------------------------
    "q02_point_by_number",
    "q03_point_by_string_key",
    "q04_full_scan",
    "q05_range_scan",
    "q05b_range_scan_open",
    "q06_children_of_parent",
    "q07_point_composite_key",
    "q11_catalog_partitions",
    "v02_sequence_gap_check",
    "g01_hash_agg_tpch_q1",
    "g21_percentiles",
    "g22_salted_aggregation",
    "g23_salted_join",
    "j01_asof_join",
    # -- rows-only tail: l41c is new in r09 (batched BPE, never witnessed);
    # g06b is the remaining r05-stale rows-only cut ADVICE r08 flagged;
    # l07x re-witnesses the moved dedup implementation on the xxhash
    # production path (its xxhash BANDING is genuinely un-replayable —
    # different random hyperplanes than md5 — unlike l06x's key hashing) ------
    "l41c_bpe_batched",
    "g06b_approx_distinct",
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
