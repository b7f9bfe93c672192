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
# coverage. Since r11 the rotation is COMPUTED, not hand-curated (VERDICT r10
# directive 1): ``_witness_rounds`` reads the committed CORRECTNESS_r*.json
# history and ``all_specs`` orders the registry oldest-latest-witness-first,
# so every snapshot burns the stalest specs by construction and the staleness
# bound is the arithmetic optimum — ceil(len(REGISTRY)/50) rounds — without
# anyone maintaining a list. (At 50 slots the optimum is
# ceil(len(REGISTRY)/50) witness rounds — tests/test_parity.py asserts this
# arithmetic from the live registry so the number never drifts in a comment;
# the r10 directive's literal "nothing older than r09 after r11" would need
# ~64 slots and is infeasible — the oldest-first order is the closest
# achievable policy and self-maintains.)
#
# ``_REWITNESS`` stays manual: the specs whose Spark code or oracle changed
# THIS round jump the queue so behavior changes never ride on a stale green
# row. A typo here would silently waste snapshot slots — fail loudly instead
# (the r05 guard).
_REWITNESS: tuple[str, ...] = (
    # r13: cleared at round open per VERDICT r12 directive 5 — every r12
    # entry got a green r12 row, so leaving them here would waste the snapshot
    # slots the 26 r09-stale specs (o2-family, q05b/q07, v02/v02b, ...) need.
    # Repopulated below only for specs whose Spark code or oracle r13
    # actually changes.
    #
    # r13: c11's builder changed (explicit raises around the redelivery
    # exercise, ADVICE r12) and the CMS/loglin store updaters it calls
    # gained the writer lock + ledger opt-out guard (directives 3/4).
    "c11_incremental_telemetry",
    # r13: every multimodal operator's decode loop changed again — the
    # one-pass quarantine mode (_try_decode now returns (value, err); the
    # loops emit NULL-feature+decode_error rows under "quarantine").
    # Default skip/fail outputs are value-identical, but changed code
    # never rides on a stale green row.
    "m01_image_features",
    "m02_image_resize",
    "m03_audio_features",
    "m04_video_frame_sample",
    "m05_image_dedup_ahash",
    "m06_decode_quarantine",
    # r13 adversarial-DATA parity sweep fixes: the similarity family
    # gained the valid_vectors gate (operator + oracle CTE filter) and
    # the shingle family gained non-empty tokenization (doc_shingles UDF
    # + the four oracle shingle CTEs). Clean-data values are identical
    # (every clean row passes the new filters — re-driven green), but
    # both code AND oracles changed, so all of them re-witness.
    "l09_cosine_topk",
    "l10_ann_lsh_topk",
    "l11_embedding_neardup",
    "l12_ann_ivf_topk",
    "l12b_ann_ivf_kmeans",
    "l28_pq_adc_topk",
    "l29_ivfpq_topk",
    "l06_ngram_jaccard_dedup",
    "l06x_ngram_jaccard_xxhash",
    "l07_minhash_lsh_dedup",
    "l07x_minhash_lsh_xxhash",
    "l17_neardup_components",
    "l18_neardup_components_star",
    "l18b_star_cc_chains",
    "l19_decontamination",
    "l19x_decontamination_shuffle",
    "l34_bloom_decontamination",
    "l36_duplicated_spans",
    "l44_overlap_sketch",
    "c01_corpus_prep",
    "c04_fuzzy_dedup",
    "c06_incremental_dedup",
    "c07_canonical_per_cluster",
    # r13 adversarial-data fixes, second wave: repetition stats (blank
    # docs → 0 n-grams + NULL ratios, both sides), span ops' NULL-text
    # null propagation (oracle COALESCE scoped to real docs), l25's
    # NULL-doc row restored in the oracle, l37's NULL stratum excluded
    # from the oracle counts (the ADVICE r06 rule, finally mirrored).
    "l13_repetition_stats",
    "l25_intradoc_chunk_dedup",
    "l33_span_corruption",
    "l37_temperature_sampling",
    "c08_span_excision",
    # r13 adversarial-data fixes, events leg: g15 try_element_at +
    # sum-of-empty-is-NULL; g17 excludes un-timed events (NULL window-
    # order trap); j01's asof_join null rules (struct carry, un-timed/
    # keyless marks dropped) + explicit oracle contract; k12's merge is
    # null-safe on keys; the o2-family fixture derivations filter null
    # ts/user/type identically in builder and oracle.
    "g15_array_functions",
    "g17_sessionization",
    "j01_asof_join",
    "k12_incremental_agg",
    "o2b_stateful_streaming",
    "o2c_stream_dedup_watermark",
    "o2e_stream_stream_join",
    "o2f_streaming_session_window",
    # r13 adversarial-data fixes, TPC-H leg: g08's window null ordering
    # made explicit (engine defaults differ); g22 one-pass salted
    # count+sum (the join dropped the NULL-key group); g49 excludes NULL
    # from the heavy-hitter report (md5(NULL) counts nothing in CMS).
    "g08_window_functions",
    "g22_salted_aggregation",
    "g49_cms_heavy_hitters",
    # r13: g14's oracle gained the json_valid guard (DuckDB throws on
    # malformed JSON where Spark's get_json_object is NULL).
    "g14_json_functions",
)


def _witness_rounds() -> dict[str, int]:
    """Latest driver-witnessed round per spec, read from the committed
    CORRECTNESS_r*.json files at the repo root. A spec absent from every
    snapshot (i.e. new this round) maps to 0, which sorts it to the very
    front — new specs must never land never-witnessed."""
    import glob
    import json
    import os
    import re as _re

    root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = _re.search(r"r(\d+)", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(f) as fh:
                snap = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(snap, dict):
            # A list-shaped snapshot would raise an uncaught TypeError below
            # and break all_specs() for every caller (ADVICE r11).
            continue
        for name in snap:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def all_specs() -> dict[str, QuerySpec]:
    unknown = set(_REWITNESS) - set(REGISTRY)
    if unknown:
        raise AssertionError(
            f"_REWITNESS names not in REGISTRY: {sorted(unknown)}"
        )
    latest = _witness_rounds()
    reg_idx = {name: i for i, name in enumerate(REGISTRY)}
    rest = [n for n in REGISTRY if n not in _REWITNESS]
    # never-witnessed (latest 0) first, then ascending staleness; ties in
    # registration order so the ordering is fully deterministic.
    rest.sort(key=lambda n: (latest.get(n, 0), reg_idx[n]))
    ordered: dict[str, QuerySpec] = {}
    for name in (*_REWITNESS, *rest):
        ordered[name] = REGISTRY[name]
    return ordered
