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
# (every CORRECTNESS_r*.json to date stops at exactly 50 entries, out of 70
# registered), so ``all_specs`` front-loads the specs with the least
# historical driver coverage. Rotating the front of the list each round gives
# every spec a driver-witnessed row across consecutive snapshots even though
# no single snapshot can hold all of them. Specs not named here follow in
# registration order; pytest runs the full registry regardless of order.
_SNAPSHOT_PRIORITY: tuple[str, ...] = (
    # Never driver-witnessed through r03 (r02 verdict's top directive).
    "l10_ann_lsh_topk",
    "l11_embedding_neardup",
    "l12_ann_ivf_topk",
    "m01_image_features",
    "m02_image_resize",
    "m03_audio_features",
    "m04_video_frame_sample",
    "g21_percentiles",
    "g22_salted_aggregation",
    "g23_salted_join",
    "c01_corpus_prep",
    "j01_asof_join",
    "j02_range_join",
    # Failed in r03 (TIMESTAMP_NTZ regression, fixed in io.py) — needs a
    # fresh green row to prove the fix.
    "g17_sessionization",
    # New this round: bucketed (scale-safe) variant of the v02 gap check,
    # plus the round-4 text-pipeline additions.
    "v02b_sequence_gap_scalable",
    "l13_repetition_stats",
    "l14_pii_scrub",
    "l15_stratified_sample",
    "l16_vocab_topk",
    "l12b_ann_ivf_kmeans",
    "c02_corpus_mix",
    "g16b_sliding_window",
    "t3_address_filter",
    "l06x_ngram_jaccard_xxhash",
    "l17_neardup_components",
    "g21b_approx_sketches",
    "k11_compaction",
    # Oracle-backed maintenance specs that fell outside the r03 snapshot.
    "k06_maturity_flag",
    "k10_reorg_detect",
    # Rows-only maintenance/streaming specs, also absent from r03.
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
