"""Sequence packing — assemble documents into fixed-size training context
windows, the last step of a training-data pipeline before tokenized
shards are written.

The packing discipline here is *concatenate-and-chunk within a group*:
documents are laid end-to-end in a deterministic order and cut every
``ctx_len`` tokens (the standard "packed sequences" recipe — documents
may straddle a boundary; the attention mask handles the seam). Each doc
gets the chunk id and token offset where it begins, so a downstream
writer can route docs to shard files without ever materializing the
concatenation.

100 TB shape: the running sum is a window per ``group_col`` (language,
source, or an explicit shard key) — each group's window is one ordered
partition, so parallelism = number of groups. That is the *real*
production layout: global single-stream packing would serialize the
corpus through one partition, while per-shard packing is embarrassingly
parallel and what training jobs consume anyway (one packed stream per
data shard). For more parallelism, salt the group key into k sub-shards
deterministically (doc_id % k) — chunk numbering stays deterministic
per sub-shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def pack_sequences(
    df: DataFrame,
    ctx_len: int = 512,
    group_col: str = "lang",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Assign each document its (chunk_id, offset) in the packed stream of
    its group.

    - ``n_tokens``: whitespace token count (or a precomputed
      ``token_count_col``);
    - ``chunk_id``: index of the ctx window where the doc *starts*
      (``cum_before div ctx_len``, exact integer arithmetic);
    - ``chunk_offset``: token offset inside that window;
    - ``spans_chunks``: how many windows the doc touches — 1 for most
      docs, >1 when it straddles boundaries (long docs).

    One window function per group; no shuffle beyond the window's
    hash-partition on ``group_col``."""
    toks = (
        F.col(token_count_col)
        if token_count_col
        else F.size(F.split(F.col(text_col), " "))
    )
    w = (
        W.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ctx = int(ctx_len)
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        df.select(group_col, id_col, toks.cast("long").alias("n_tokens"))
        .withColumn("cum_before", cum_before)
        .select(
            group_col,
            id_col,
            "n_tokens",
            F.expr(f"cum_before div {ctx}").alias("chunk_id"),
            (F.col("cum_before") % ctx).alias("chunk_offset"),
            # windows touched: floor(last_token/ctx) - floor(first_token/ctx) + 1
            (
                F.expr(f"(cum_before + n_tokens - 1) div {ctx}")
                - F.expr(f"cum_before div {ctx}")
                + F.lit(1)
            ).alias("spans_chunks"),
        )
    )
