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
    # r16: cleared at round open (all r15 entries got green r15 rows) and
    # repopulated per VERDICT r15 / ADVICE r15.
    #
    # >>> r17 ROUND-OPEN TODO: when clearing this list, seat the five
    # specs that changed under the l25 exception in r16's second session
    # (value-identical, locally verified, test-pinned — but not driver
    # re-witnessed on their NEW text/plan): g07b_cube,
    # g07c_grouping_sets (grand-total union-leg rewrite), o2b (formula-
    # driven oracle batch split), o2x (tail unified through ingest_raw),
    # j02 (range-join explosion valves). Their l25 notes are at the
    # bottom of this comment block. <<<
    #
    # r16 behavior changes on the lake write path: (a) the group-commit
    # marker now advances only to the VERIFIED contiguous prefix of each
    # delivered chunk (ADVICE r15 high — silently skipped heights were
    # becoming permanent holes past the marker); (b) the idempotency
    # anti-join re-selects the incoming column order, so deduped appends
    # write parquet files with the same column order as fresh appends;
    # (c) the receipts_for legacy-signature probe is inspect-based, not
    # except-TypeError. o1d exercises (b) directly (its write IS a
    # deduped re-delivery); o1/o2 re-witness backfill + tail whose every
    # write runs the new marker/probe code.
    "o1d_duplicate_redelivery",
    "o1_backfill_pipeline",
    "o2_streaming_tail",
    # r16 (VERDICT r15 item 2/directive 4): _first_k_centroids now builds
    # the default centroid table from a PRE-shuffle id<K corpus slice —
    # the emptiness probe no longer re-executes the corpus-wide
    # repartition as an extra job per IVF call. Same rows/values by
    # construction (filter commutes with the row-local norm), but the
    # centroid lineage changed, so the two consumers of the DEFAULT
    # centroid path re-witness. (l12b is untouched: it passes explicit
    # kmeans_centroids, so _first_k_centroids is never on its path —
    # and under the r16 staleness-first rotation a rows-only spec that
    # DID change would take a _REWITNESS seat like any other; the policy
    # is that behavior changes never ride on a pre-change green row.)
    "l12_ann_ivf_topk",
    "l29_ivfpq_topk",
    # r16 sketch review (targeted high-effort pass on sketches.py): the
    # portable-HLL alpha constant is now forced to DOUBLE arithmetic in
    # BOTH dialects (Spark parsed the old text as DECIMAL and rounded the
    # inner quotient at scale 9 — a verified cross-engine drift above the
    # 4-dp floor grid for estimates ≳ 4e5), and NULL keys are excluded
    # from HLL registers and CMS cells on both sides (COUNT DISTINCT
    # semantics; a NULL key minted a phantom register that corrupted the
    # bucket accounting). Builder AND oracle texts changed together, so
    # the four oracle-backed HLL/CMS consumers re-witness.
    "g06c_portable_hll",
    "l44_overlap_sketch",
    "c10_corpus_telemetry",
    "c11_incremental_telemetry",
    # r16 sampling review (Rule 1 sweep over sampling.py): NULL-key rows
    # are now EXCLUDED from deterministic_split and shuffle_shards (they
    # previously piled into the last split / a NULL shard with
    # partition-dependent pos), and the oracle texts gained the matching
    # `WHERE doc_id IS NOT NULL`. Builder AND oracle changed together →
    # the three oracle-backed consumers re-witness.
    "l21_hash_split",
    "l26_training_shuffle",
    "c05_training_ready",
    # r16 NULL-primary-key sweep (adv_data_parity arm 8 / embeddings arm
    # 7): seven live cross-engine divergences on NULL-id rows, fixed by
    # Rule-1 exclusions (exact_dedup keeper windows, pack ordering,
    # chunk reassembly grouping, excision join, c04's NOT-IN-vs-anti-join
    # edge) or deterministic batching (c11). Builders and/or oracles
    # changed → re-witness. (c02/c03/c05 call the changed exact_dedup
    # too but their NULL-id rows died later on both engines already —
    # dirty sweep green before and after, outputs byte-identical.)
    "l20_sequence_packing",
    "l23_boilerplate_chunks",
    # (l25_intradoc_chunk_dedup changed too — same Rule-1 exclusion —
    # but is deliberately NOT seated: the head-50 is one seat over
    # budget and the r16 VERDICT directive 3 explicitly names g21b's
    # floor. l25's change is provably value-identical on clean driver
    # data (no NULL doc_ids at sf0.01; full verify green against the
    # NEW oracle text) and dirty-sweep green, pinned by
    # test_id_keyed_operators_exclude_null_ids — it re-witnesses via
    # the computed rotation next round.)
    "c01_corpus_prep",
    "c04_fuzzy_dedup",
    "c08_span_excision",
    # directive 3 (VERDICT r15): g21b is the last r11-floor spec and the
    # rows-only tie-break would leave it one seat short this round —
    # seat it explicitly so the global witness floor advances to r12.
    "g21b_approx_sketches",
    # ...and the events arm (15, NULL event_id): k12's prev/batch split
    # silently lost NULL-id events on the Spark side only (coalesce-pmod
    # batching now, same fix as c11); o2e's parity split met Python None
    # on the driver (a TypeError stage-killer) — NULL-id events are now
    # excluded before the 300-row fixture window on both engines.
    "k12_incremental_agg",
    "o2e_stream_stream_join",
    # ...and the TPC-H NULL-PK arms (lineitem 8 / orders 5): g21c and
    # g50 hashed PARTIAL row keys via concat_ws (NULL-skipping) where
    # their oracles' `||` NULL-propagates — sample membership drift; the
    # grid bound on sampled_quantiles changed too (huge-but-legal
    # measures overflowed floor-shift differently per engine); k13's
    # `% 5` history split vanished NULL-orderkey rows (coalesce-pmod
    # now, the c11/k12 recipe); g50's oracle total now mirrors
    # cms_build's NULL-key exclusion.
    "g21c_sampled_quantiles",
    "g50_hot_key_detection",
    "k13_incremental_join",
    # (v08_unverifiable_blocks is NEW this round — never-witnessed specs
    # sort to the very front of the computed rotation automatically, no
    # seat needed. The five rows-only specs gained self-validity columns
    # (VERDICT r15 directive 7) — schema-only additions pinned by
    # test_parity; under the r16 staleness-first rotation they compete
    # for seats like any spec, yielding only within a same-round tie.)
    #
    # (o2x follows the l25 exception: the tail's normalize→decode→write
    # slice now routes through pipeline.ingest_raw instead of a
    # hand-rolled copy (gaining the r15 matched-receipts narrowing and
    # receipts checkpoint the copy lacked). Value-identical by
    # construction — narrowing only shrinks the fetched receipt set to a
    # superset of what the decode joins — and o2/o2x/o1/o1d were all
    # re-verified MATCH at sf0.01 this session; o2 itself re-witnesses
    # on its _REWITNESS seat above, exercising the same unified path.)
    #
    # (j02 follows the l25 exception too: range_join_bucketed gained two
    # explosion valves this round — inverted intervals dropped pre-
    # explode, >max_cells intervals routed through an exact broadcast
    # leg. Both are provably value-identical (the legs PARTITION the
    # interval set and BETWEEN never matches an inversion; j01/j02
    # re-verified MATCH at sf0.01 this session) and pinned by three
    # tests in test_temporal.py including an explicit narrow+wide vs
    # BETWEEN equivalence check.)
    #
    # (o2b follows the l25 exception too: its ORACLE text changed — run
    # 2's first micro-batch is now derived as ceil(n/50)//2 in SQL
    # instead of the literal 2, which only differs below 200 qualifying
    # events (the r16 one-row sweep's finding); at the driver's sf0.01
    # the subquery still evaluates to 2 and the compare was re-verified
    # MATCH this session. Pinned by
    # tests/test_empty_inputs.py::test_o2b_oracle_batch_split_is_formula_driven.)
    #
    # (g07b/g07c follow the l25 exception: their texts changed this round
    # — the () grouping set became a UNION ALL global-aggregate leg so
    # empty input keeps the ANSI grand-total row (r16 empty-table sweep)
    # — but the rewrite is provably value-identical on clean data (both
    # verified MATCH against their PRE-change oracle texts at sf0.01 this
    # session) and the empty-input behavior is pinned by
    # tests/test_empty_inputs.py. Seating them would evict two r11-floor
    # specs and stall the directive-3 floor advance; g07 itself carries a
    # floor seat and re-witnesses the same rewrite shape this round.)
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
    # registration order so the ordering is fully deterministic. The five
    # designed rows-only specs (docs/rows-only-specs.md — no portable
    # oracle BY CONSTRUCTION) yield to oracle-backed specs of the SAME
    # staleness, but staleness stays the primary key (r16, revising the
    # r15 oracle-first order): sorting them behind the whole registry
    # starved them of seats permanently, freezing the global witness
    # floor at whatever round they were last seen (g21b pinned the floor
    # at r11 while every oracle-backed spec had moved on). Since r16 each
    # rows-only spec emits an in-plan all-true `valid` column, so its
    # rows-only driver row DOES carry semantic evidence — a seat is no
    # longer wasted, just weaker than a hash match, hence the tiebreak.
    rest.sort(
        key=lambda n: (latest.get(n, 0), REGISTRY[n].oracle is None, reg_idx[n])
    )
    ordered: dict[str, QuerySpec] = {}
    for name in (*_REWITNESS, *rest):
        ordered[name] = REGISTRY[name]
    return ordered
