"""Deduplication operators for training-data pipelines, scale-first:

- **exact**: hash-groupBy on a canonical fingerprint — one shuffle on the
  hash, constant memory per group.
- **n-gram Jaccard**: shingle inverted index → candidate pairs sharing a
  shingle → exact Jaccard from distinct-shingle counts. The join is the
  scale risk (hot shingles fan out quadratically), so `jaccard_pairs`
  drops shingles above a document-frequency cap — the standard stop-shingle
  trick; at 100 TB you'd also band by shingle hash.
- **MinHash + LSH**: md5-derived minhash signatures (deterministic across
  engines), banded into LSH buckets; only bucket-collision pairs are
  verified with exact Jaccard. Cost is linear in corpus size + candidate
  pairs, the 100 TB path.
- **SimHash**: 16-bit signature from per-position majority vote over token
  md5s; equal signatures → near-dup buckets.

Everything is DataFrame-native (explode / groupBy / join); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from .text import tokens


# --- exact -------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: md5 fingerprint → (fp, keeper=min id, count)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_copies"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (min id) per distinct text — a ranked-window
    filter, one shuffle on the fingerprint."""
    w = W.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# --- shingling ---------------------------------------------------------------

def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (element-wise
    ``transform`` over the token array — no explode until needed)."""
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k, F.lit(1)) - 1),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]),
    )
    return F.array_distinct(grams)


def shingle_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) inverted-index rows — the exploded form."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )


# --- n-gram Jaccard ----------------------------------------------------------

def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Candidate pairs sharing ≥1 shingle, scored with exact Jaccard and
    filtered to ``threshold``. ``max_shingle_df`` drops ubiquitous shingles
    before the self-join (skew control at scale)."""
    sh = shingle_table(df, text_col, id_col, n)
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count("*").alias("_df")).filter(
            F.col("_df") > max_shingle_df
        )
        sh = sh.join(hot.select("shingle"), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc_id": "id_b", "n_sh": "n_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_inter",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- MinHash + LSH -----------------------------------------------------------

def minhash_signatures(
    sh: DataFrame, n_hashes: int = 12
) -> DataFrame:
    """MinHash signature per doc: permutation *j* is the md5 of
    ``shingle#j`` (hex strings order like the integers they encode, so the
    lexicographic ``min`` is the minhash). md5 keeps the signature
    engine-portable; swap for ``xxhash64`` when oracle parity is not needed
    (same plan shape, ~2× faster). One shuffle on doc_id."""
    hashed = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("j"),
        "shingle",
    ).select(
        "doc_id",
        "j",
        F.md5(F.concat(F.col("shingle"), F.lit("#"), F.col("j"))).alias("h"),
    )
    return hashed.groupBy("doc_id", "j").agg(F.min("h").alias("mh"))


def lsh_buckets(signatures: DataFrame, rows_per_band: int = 4) -> DataFrame:
    """Band the signature: bucket key = md5 of the band's minhashes in
    permutation order. Docs sharing (band, key) are candidates."""
    banded = signatures.withColumn(
        "band", (F.col("j") / rows_per_band).cast("int")
    )
    return banded.groupBy("doc_id", "band").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "mh"))), lambda s: s["mh"]
                ),
                "|",
            )
        ).alias("bucket")
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 12,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH candidate pairs: distinct (id_a < id_b) sharing any band bucket."""
    sh = shingle_table(df, text_col, id_col, n)
    buckets = lsh_buckets(minhash_signatures(sh, n_hashes), rows_per_band)
    a = buckets.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 12,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: candidates from LSH buckets,
    verified with exact Jaccard over the shingle index. Only candidate
    pairs pay the verification join — the linear-cost 100 TB path."""
    sh = shingle_table(df, text_col, id_col, n).cache()
    cand = minhash_candidates(df, text_col, id_col, n, n_hashes, rows_per_band)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(cand, ["id_a", "id_b"], "left_semi")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc_id": "id_b", "n_sh": "n_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- SimHash -----------------------------------------------------------------

def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash over distinct tokens: bit *p* is the majority vote of
    the top bit of hex digit *p* of each token's md5. Computed without
    explode: per-position votes are element-wise array ops."""
    toks = F.array_distinct(tokens(F.col(text_col)))
    hashes = F.transform(toks, F.md5)

    def bit_votes(p: int) -> Column:
        # +1 when hex digit p ∈ [8,f] (top bit set), else -1; majority → '1'
        votes = F.transform(
            hashes,
            lambda h: F.when(F.substring(h, p + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1),
        )
        return F.aggregate(votes, F.lit(0), lambda acc, x: acc + x)

    sig = F.concat(
        *[F.when(bit_votes(p) >= 0, F.lit("1")).otherwise(F.lit("0")) for p in range(16)]
    )
    return df.select(F.col(id_col).alias("doc_id"), sig.alias("simhash16"))


def simhash_buckets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Docs grouped by identical SimHash signature (hamming-0 buckets);
    near-dup groups surface as n_docs > 1."""
    return (
        simhash16(df, text_col, id_col)
        .groupBy("simhash16")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_docs"))
    )
