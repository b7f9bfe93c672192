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
    # r15: cleared at round open (all r14 entries got green r14 rows) and
    # repopulated per VERDICT r14 directives 1/2/7.
    #
    # r15 behavior changes: the lake write path gained ingest-level
    # idempotency — every append anti-joins incoming natural keys against
    # the touched buckets (Lake._drop_redelivered, the reference's PK
    # semantics, etl.rs:147-169). o1d is the new duplicate-redelivery
    # proof; o1/o2/k78 re-witness the backfill, streaming-tail, and
    # mutation paths whose every write now runs through the new code.
    "o1d_duplicate_redelivery",
    "o1_backfill_pipeline",
    "o2_streaming_tail",
    "k78_partition_mutations",
    # r15: the threshold samplers gained the bounded-strata guard and
    # mixture_rebalance now pushes the target-strata filter into the count
    # scan (values unchanged, code changed — sampling._strata_counts; l35
    # is the seated variant witness, l37's identical change rides the
    # rotation with a local re-drive this session).
    "l35_mixture_rebalance",
    # r15: detect_reorgs' parent-mismatch signal now requires DEFINITE
    # disagreement (both hashes non-null) — the nb=3000 dirty-chain soak
    # caught the r14 flag-on-unknowable-parent truncating a NULL-hash
    # block at a micro-batch boundary that the stream could never
    # restore; same-height keeps IS-DISTINCT-FROM (self-healing). k10x's
    # VALUES change; k10's clean-chain values are identical but both
    # builder and oracle text changed.
    "k10_reorg_detect",
    "k10x_reorg_detect_dirty",
    # r15 (ADVICE r14 item 1): the o2b/o2c/o2e/o2f fixture windows gained
    # a user_id content tiebreaker (builders + oracles) so the planted
    # (ts, event_id) duplicate pairs of the dirty-warehouse sweep can
    # never straddle a LIMIT/batch boundary ambiguously. Clean-data
    # values identical (the driver's events have no ties); o2b is the
    # seated witness for the mechanical change, the other three share the
    # identical one-line rewrite and were locally re-driven this session.
    "o2b_stateful_streaming",
    # (the r15 sketch-store lock rewrite — atomic link(2) restore, loud
    # contested failure, readback, content-checked release — is
    # concurrency-only: no spec's single-threaded values change, and the
    # protocol is pinned by six interleaving unit tests + a multi-process
    # stress, so no seat. Likewise l22's rule-17 blank-block valve and
    # the LSH banding valve change NO clean-data values (the driver's
    # documents have no blank texts; the dirty sweep re-drove l22 and the
    # l07 family green on the corrupted tables this session) and ride the
    # r16 rotation rather than displace an r10-floor seat.)
    # VERDICT r14 directive 2 — the r14-deferred mechanical twins, seated
    # so the deferred-twin list empties THIS round: the TPC-H ledger-cast
    # tail (identical try_cast contract as the nine r14-witnessed
    # variants) and the ANN gate twins (same valid_vectors change as
    # l09/l12/l29, r14-witnessed). l12b is deliberately ABSENT: it is
    # rows-only by design (docs/rows-only-specs.md) and directive 7 keeps
    # designed rows-only specs out of snapshot seats — it stays pinned by
    # tests and twinned by l12's full oracle.
    "g07b_cube",
    "g07c_grouping_sets",
    "g36_promo_revenue_tpch_q14",
    "g37_forecast_revenue_tpch_q6",
    "g38_small_quantity_revenue_tpch_q17",
    "g39_mincost_supplier_tpch_q2",
    "g40_volume_shipping_tpch_q7",
    "g41_market_share_tpch_q8",
    "g42_product_profit_tpch_q9",
    "g43_important_parts_tpch_q11",
    "g44_order_distribution_tpch_q13",
    "g45_top_supplier_tpch_q15",
    "g46_disjunct_revenue_tpch_q19",
    "g47_promotion_suppliers_tpch_q20",
    "l10_ann_lsh_topk",
    "l11_embedding_neardup",
    "l28_pq_adc_topk",
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
    # oracle BY CONSTRUCTION) sort behind every oracle-backed spec
    # regardless of staleness (VERDICT r14 directive 7): a snapshot seat
    # spent on a `no_oracle` row carries no hash evidence, and each of
    # them is test-pinned and twinned by a fully-hash-checked sibling.
    rest.sort(
        key=lambda n: (REGISTRY[n].oracle is None, latest.get(n, 0), reg_idx[n])
    )
    ordered: dict[str, QuerySpec] = {}
    for name in (*_REWITNESS, *rest):
        ordered[name] = REGISTRY[name]
    return ordered
