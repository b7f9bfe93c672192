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
    hash-partition on ``group_col``.

    NULL-``id_col`` rows are EXCLUDED (Rule 1, r16 NULL-primary-key
    sweep): a doc's packed position is defined by the id order, and a
    NULL id has no place in that order — Spark's ascending window sort
    put it FIRST (DuckDB: last), silently shifting every subsequent
    offset in the group, a live cross-engine divergence on the dirty
    corpus."""
    ctx = int(ctx_len)
    if ctx < 1:
        # fail at call time, not as a DIVIDE_BY_ZERO mid-stage (r15 review)
        raise ValueError(f"ctx_len must be >= 1, got {ctx_len}")
    df = df.filter(F.col(id_col).isNotNull())
    # Whitespace split WITHOUT the text.tokens() empty-fragment filter, on
    # purpose: packing positions/counts must match the oracles'
    # string_split arithmetic exactly (l20/l31), where '' fragments COUNT —
    # reusing tokens() here would silently shift every offset (r15 review
    # considered and rejected the dedup).
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
            # windows touched: floor(last_token/ctx) - floor(first_token/ctx) + 1.
            # Zero-token docs (possible only via a precomputed
            # token_count_col; split() never yields 0) span 0 windows
            # CONSISTENTLY — the raw formula said 1 mid-window but 0 when
            # cum_before sat exactly on a boundary (r15 review).
            F.when(F.col("n_tokens") <= 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(f"(cum_before + n_tokens - 1) div {ctx}")
                - F.expr(f"cum_before div {ctx}")
                + F.lit(1)
            ).alias("spans_chunks"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_len: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document's token stream into fixed-length windows with a
    stride (overlap = ``chunk_len - stride``) — the chunking step RAG
    indexes and long-context eval sets are built from (complementary to
    :func:`pack_sequences`, which concatenates ACROSS documents; this
    splits WITHIN them).

    Chunk count per doc is ``1`` when ``n <= chunk_len`` else
    ``ceil((n - chunk_len)/stride) + 1`` (the standard sliding-window
    count; the final window is allowed to be short rather than re-reading
    earlier tokens, keeping every token in ≥1 chunk and the arithmetic
    exact). Output: one row per (doc, chunk) with its 0-based index,
    start-token offset, token count, and text.

    Scale shape: ZERO shuffle — sequence + slice + posexplode is a pure
    per-row generator fused into the corpus scan; output row count is
    ~n_tokens/stride per doc, the same fan-out any chunk indexer pays."""
    if stride < 1 or chunk_len < 1:
        raise ValueError(f"chunk_len/stride must be >= 1, got {chunk_len}/{stride}")
    if stride > chunk_len:
        # tokens chunk_len..stride-1 of every doc would land in NO chunk —
        # silent training-data loss, reachable straight from the CLI's
        # --stride (r15 review); the documented invariant is every token
        # in >= 1 chunk
        raise ValueError(
            f"stride ({stride}) must be <= chunk_len ({chunk_len}): a "
            "larger stride skips tokens between windows"
        )
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_len, F.lit(1)).otherwise(
        F.floor((n - chunk_len + stride - 1) / stride).cast("int") + 1
    )
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            (i * stride).cast("long").alias("start_token"),
            F.slice(toks, i * stride + 1, chunk_len).alias("w"),
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(windows).alias("chunk_idx", "c")
    ).select(
        id_col,
        F.col("chunk_idx").cast("int"),
        F.col("c.start_token").alias("start_token"),
        F.size("c.w").cast("long").alias("n_chunk_tokens"),
        F.array_join("c.w", " ").alias("chunk_text"),
    )


def span_corruption(
    df: DataFrame,
    mask_rate: float = 0.15,
    sentinel: str = "<mask>",
    salt: str = "sc1",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """T5-style denoising-objective data generation: each token position
    is masked with probability ``mask_rate`` via the module-standard md5
    hash gate on (salt, doc, position) — deterministic, so the same
    corpus + salt yields the same (input, target) pairs on every run and
    engine (``df.sample``-style RNG would reshuffle under repartition).
    ``input_text`` replaces masked tokens with the sentinel; ``target_text``
    is the masked tokens in order. (Per-token sentinels, not collapsed
    span ids — the span-id numbering is a tokenizer-side concern.)

    Scale shape: ZERO shuffle — gates, replacement, and extraction are
    higher-order array expressions fused into the corpus scan; a new salt
    re-rolls the corruption for another epoch for free."""
    from .sampling import rate_threshold

    thr = rate_threshold(mask_rate)
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    flags = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{salt}:"),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    i.cast("string"),
                )
            ),
            1,
            8,
        )
        < F.lit(thr),
    )
    masked = F.zip_with(
        toks, flags, lambda t, m: F.when(m, F.lit(sentinel)).otherwise(t)
    )
    kept = F.filter(
        F.zip_with(toks, flags, lambda t, m: F.when(m, t)),
        lambda x: x.isNotNull(),
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.size(F.filter(flags, lambda m: m)).cast("long").alias("n_masked"),
        F.array_join(masked, " ").alias("input_text"),
        F.array_join(kept, " ").alias("target_text"),
    )
