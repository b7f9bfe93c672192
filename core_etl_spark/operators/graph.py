"""Iterative graph analytics over edge tables — the link-analysis side of
corpus curation (rank web documents by link structure before quality
gating, as in the original PageRank-weighted crawl recipes).

Everything here is EXACT-INTEGER arithmetic: ranks are scaled fixed-point
longs, per-edge contributions use integer division, and the damping step
is ``base + (num · s) div den``. That makes every iteration bit-identical
across engines and partition orders — an order-dependent float sum would
break both the DuckDB oracle and run-to-run reproducibility — and the
chained-CTE oracle can replay the exact fixed number of iterations.

Design notes (100 TB lens): each iteration is one equi-join of the edge
table against the current rank vector plus one map-side-combinable
groupBy on the destination — the standard Pregel-on-relations shape. The
edge table is degree-annotated once and checkpointed; the rank vector is
checkpointed per iteration to cut lineage (same discipline as
``dedup.neardup_components``). Nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
    id_col: str = "id",
) -> DataFrame:
    """Fixed-iteration PageRank with scaled-integer ranks.

    ``nodes``: one column ``id_col``; ``edges``: columns ``src``/``dst``
    (dangling targets must be pre-joined away by the caller — every dst
    must exist in ``nodes``). Every node starts at ``scale``; each
    iteration a node's new rank is::

        base + (damp_num * sum(incoming r div out_degree)) div damp_den

    with ``base = scale - scale*damp_num//damp_den`` (i.e. the classic
    ``(1-d) + d·Σ r/deg`` at fixed point). Nodes without out-edges keep
    contributing nothing (their mass evaporates — the "remove dangling
    mass" variant, which keeps the recurrence local and exactly
    replayable); nodes without in-edges settle at ``base``.

    Returns ``(id_col, rank)`` with ``rank`` a BIGINT at the given scale.
    """
    if iterations < 0:
        raise ValueError(f"pagerank: iterations must be >= 0, got {iterations}")
    base = scale - scale * damp_num // damp_den
    deg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    ed = edges.join(deg, "src").localCheckpoint(eager=True)
    n = nodes.select(F.col(id_col))
    ranks = n.select(id_col, F.lit(scale).cast("long").alias("rank"))
    for _ in range(iterations):
        contribs = (
            ed.join(ranks, ed["src"] == ranks[id_col])
            .select(F.col("dst").alias(id_col), F.expr("rank div _deg").alias("_c"))
            .groupBy(id_col)
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            n.join(contribs, id_col, "left")
            .select(
                id_col,
                F.expr(
                    f"CAST({base} + ({damp_num} * coalesce(_s, 0L)) div {damp_den} AS BIGINT)"
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
