"""Composite corpus-prep spec — the end-to-end shape of a training-data
pipeline: quality gate → language gate → exact dedup → near-dup removal →
token budgeting. Each stage is an existing operator; the value here is the
*composition* (and its oracle): one declarative plan, no materialization
between stages, so Catalyst fuses the scalar stages into the same scan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup as D
from .base import register
from .llm_specs import _SHINGLE_CTE, _minhash_pair_ctes  # shared oracle dialect


@register(
    "c01_corpus_prep",
    tables=("documents",),
    oracle=f"""
        WITH
        stats AS (
            SELECT doc_id, text, lang,
                   len(string_split(text, ' ')) AS n_words,
                   len(list_distinct(string_split(text, ' '))) AS n_distinct
            FROM documents
        ),
        quality AS (  -- quality gate: enough words, enough lexical diversity
            SELECT * FROM stats
            WHERE n_words >= 20 AND n_distinct * 1.0 / n_words >= 0.4
        ),
        exact AS (     -- exact dedup: keep min doc_id per identical text
            SELECT * FROM quality
            WHERE doc_id IN (SELECT min(doc_id) FROM quality GROUP BY md5(text))
        ),
        {_SHINGLE_CTE},
        near_pairs AS (  -- near-dup pairs at jaccard >= 0.6 among survivors
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sh a
            JOIN sh b USING (shingle)
            JOIN sizes sa ON sa.doc_id = a.doc_id
            JOIN sizes sb ON sb.doc_id = b.doc_id
            WHERE a.doc_id < b.doc_id
              AND a.doc_id IN (SELECT doc_id FROM exact)
              AND b.doc_id IN (SELECT doc_id FROM exact)
            GROUP BY a.doc_id, b.doc_id, sa.n_sh, sb.n_sh
            HAVING count(*) * 1.0 / (sa.n_sh + sb.n_sh - count(*)) >= 0.6
        ),
        survivors AS (   -- drop the higher doc_id of each near-dup pair
            SELECT * FROM exact WHERE doc_id NOT IN (SELECT id_b FROM near_pairs)
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_words) AS BIGINT) AS total_tokens
        FROM survivors
        GROUP BY lang
    """,
    tags=("corpus", "composition", "dedup", "quality", "tokens"),
)
def c01(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Corpus prep end-to-end: length + lexical-diversity quality gate,
    exact dedup (keep min id), near-dup removal (Jaccard ≥ 0.6, drop the
    higher id of each pair), per-language doc and token budget."""
    docs = t["documents"]
    stats = docs.select(
        "doc_id",
        "text",
        "lang",
        F.size(F.split("text", " ")).alias("n_words"),
        F.size(F.array_distinct(F.split("text", " "))).alias("n_distinct"),
    )
    quality = stats.filter(
        (F.col("n_words") >= 20)
        & (F.col("n_distinct") / F.col("n_words") >= 0.4)
    )
    exact = D.exact_dedup(quality, "text", "doc_id")
    near = D.jaccard_pairs(docs, threshold=0.6)
    exact_ids = exact.select("doc_id")
    bad = (
        near.join(exact_ids.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi")
        .join(exact_ids.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    survivors = exact.join(bad, "doc_id", "left_anti")
    return survivors.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_tokens"),
    )


@register(
    "c02_corpus_mix",
    tables=("documents",),
    oracle="""
        WITH
        rep AS (
            SELECT doc_id, text, lang,
                   string_split(text, ' ') AS t
            FROM documents
        ),
        gated AS (  -- repetition gate: most-common-token frequency cap
            SELECT doc_id, text, lang FROM rep
            WHERE list_max(list_transform(list_distinct(t),
                        w -> len(list_filter(t, x -> x = w)))) * 1.0 / len(t)
                  <= 0.12
        ),
        exact AS (   -- exact dedup: keep min doc_id per identical text
            SELECT * FROM gated
            WHERE doc_id IN (SELECT min(doc_id) FROM gated GROUP BY md5(text))
        ),
        mixed AS (   -- deterministic per-language mixing rates
            SELECT * FROM exact
            WHERE substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 8) <
                  CASE lang WHEN 'en' THEN '80000000' WHEN 'de' THEN 'g'
                            WHEN 'fr' THEN '66666666' WHEN 'es' THEN '66666666'
                            WHEN 'zh' THEN 'g' ELSE '19999999' END
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(regexp_extract_all(text,
                    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT)
                   AS total_bpe_tokens
        FROM mixed
        GROUP BY lang
    """,
    tags=("corpus", "composition", "sampling", "repetition", "tokens"),
)
def c02(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Corpus mixing end-to-end (the round-4 composite): repetition gate
    (top-token frequency ≤ 0.12) → exact dedup (keep min id) →
    deterministic stratified sampling per language (upsample de/zh,
    downsample en/fr/es) → per-language doc + BPE-token budget. One
    declarative plan; the scalar gates fuse into the scan, the only
    shuffles are the dedup group and the final tiny aggregate."""
    from ..operators import text as X
    from ..operators.sampling import deterministic_stratified_sample

    gated = (
        X.repetition_stats(t["documents"])
        .filter(F.col("top_token_ratio") <= 0.12)
        .select("doc_id", "text", "lang")
    )
    exact = D.exact_dedup(gated, "text", "doc_id")
    rates = {"en": 0.5, "de": 1.0, "fr": 0.4, "es": 0.4, "zh": 1.0}
    mixed = deterministic_stratified_sample(
        exact, rates, strata_col="lang", default_rate=0.1, salt="mix1"
    )
    return X.token_counts(mixed).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bpe_tokens").cast("long").alias("total_bpe_tokens"),
    )


@register(
    "c03_corpus_clean",
    tables=("documents",),
    oracle="""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
                   FROM documents),
        p AS (SELECT doc_id, words,
                     unnest(generate_series(
                         0, CAST(ceil(len(words)/3.0) AS BIGINT) - 1)) AS pos
              FROM w),
        c AS (SELECT doc_id, pos,
                     array_to_string(words[(pos*3+1):(pos*3+3)], ' ') AS chunk
              FROM p),
        dfreq AS (SELECT chunk, count(DISTINCT doc_id) AS dc
                  FROM c GROUP BY chunk),
        m AS (SELECT c.doc_id, c.pos, c.chunk, (dc > 2) AS hot
              FROM c JOIN dfreq USING (chunk)),
        boiler AS (
            SELECT doc_id,
                   coalesce(string_agg(chunk, ' ' ORDER BY pos)
                            FILTER (NOT hot), '') AS text1
            FROM m GROUP BY doc_id
        ),
        w2 AS (SELECT doc_id, string_split(text1, ' ') AS words
               FROM boiler WHERE text1 <> ''),
        p2 AS (SELECT doc_id, words,
                      unnest(generate_series(
                          0, CAST(ceil(len(words)/2.0) AS BIGINT) - 1)) AS pos
               FROM w2),
        c2 AS (SELECT doc_id, pos,
                      array_to_string(words[(pos*2+1):(pos*2+2)], ' ') AS chunk
               FROM p2),
        r2 AS (SELECT *, row_number() OVER (
                   PARTITION BY doc_id, chunk ORDER BY pos) AS rn
               FROM c2),
        scrub AS (
            SELECT doc_id,
                   string_agg(chunk, ' ' ORDER BY pos) FILTER (rn = 1) AS text2
            FROM r2 GROUP BY doc_id
        ),
        gated AS (SELECT doc_id, text2 FROM scrub
                  WHERE len(string_split(text2, ' ')) >= 10),
        exact AS (
            SELECT g.* FROM gated g
            WHERE doc_id IN (SELECT min(doc_id) FROM gated GROUP BY md5(text2))
        )
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(e.text2, ' '))) AS BIGINT)
                   AS total_tokens
        FROM exact e JOIN documents d USING (doc_id)
        GROUP BY d.lang
    """,
    tags=("corpus", "composition", "boilerplate", "repetition", "dedup"),
)
def c03(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Corpus cleaning end-to-end — the r06 composite stacking the two new
    sub-document passes before admission: cross-document boilerplate-chunk
    removal (3-word chunks in >2 docs excised) → within-document
    repetition scrub (repeated 2-word chunks collapse to first
    occurrence; zero-shuffle expression) → min-length gate (≥10 words)
    → exact dedup of the CLEANED text (dedup after cleaning catches docs
    that differed only in boilerplate) → per-language doc/token budget."""
    from ..operators import text as X

    docs = t["documents"]
    boiler = X.remove_boilerplate_chunks(docs, chunk_words=3, max_df=2)
    b2 = boiler.filter(F.col("clean_text") != "").select(
        "doc_id", F.col("clean_text").alias("text")
    )
    scrub = X.dedup_chunks_within_doc(b2, chunk_words=2)
    gated = scrub.filter(F.size(F.split("clean_text", " ")) >= 10)
    exact = D.exact_dedup(
        gated.select("doc_id", F.col("clean_text").alias("text")),
        "text",
        "doc_id",
    )
    return (
        exact.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tokens"),
        )
    )


@register(
    "c04_fuzzy_dedup",
    tables=("documents",),
    oracle=f"""
        WITH RECURSIVE {_minhash_pair_ctes()},
        edges AS (
            SELECT id_a AS u, id_b AS v FROM mpairs
            UNION ALL SELECT id_b, id_a FROM mpairs
        ),
        reach(id, r) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v
        ),
        comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d
        WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
    """,
    tags=("corpus", "composition", "dedup", "minhash", "components"),
)
def c04(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """The full fuzzy-dedup pipeline (the SlimPajama/FineWeb recipe) in one
    composite: MinHash(12)+LSH(3×4) candidate pairs → exact-Jaccard
    verification (≥0.5) → large-star/small-star connected components →
    keep ONE document per component (the min doc_id) — returning the
    surviving corpus, singletons included.

    Scale shape: pair generation is linear (banded LSH, candidates-only
    verification), the closure is O(log n) rounds at any duplicate-cluster
    diameter, and the final anti-join is a hash semi-join on doc_id —
    duplicates lost to the cluster canonical never travel, so the join's
    build side is only the loser set (dup-rate × corpus, typically a few
    percent). The oracle replays pairs + closure with a recursive CTE."""
    # Rule 1 (r16 NULL-primary-key sweep): a doc without an id has no
    # dedup identity and cannot appear in a keep-one-per-component
    # output — and the oracle's `NOT IN` drops it anyway (NULL NOT IN
    # (...) is NULL), while a bare anti-join would KEEP it (NULL keys
    # never match) — a live 22-row divergence on the dirty corpus.
    docs = t["documents"].filter(F.col("doc_id").isNotNull())
    pairs = (
        D.minhash_dedup_pairs(docs, n_hashes=12, rows_per_band=4, threshold=0.5)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    comp = D.neardup_components_star(pairs)
    losers = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


def _c05_oracle() -> str:
    from ..operators.sampling import rate_threshold

    t_train = rate_threshold(0.95)
    return f"""
        WITH tk AS (
            SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
        ),
        g AS (
            SELECT doc_id, text, len(t) AS n,
                   (length(text) - (len(t) - 1)) / len(t) AS mwl,
                   len(list_filter(t, w -> regexp_matches(w, '[a-z]', 'i'))) AS na,
                   len(list_filter(t, w -> list_contains(
                       ['the','of','and','to','a'], w))) AS sh
            FROM tk
        ),
        q AS (  -- Gopher gate (l30's rules)
            SELECT doc_id, text, n FROM g
            WHERE n >= 10 AND n <= 100000
              AND mwl >= 3.0 AND mwl <= 10.0
              AND na / n >= 0.8 AND sh >= 2
        ),
        d AS (  -- exact dedup of survivors
            SELECT * FROM q
            WHERE doc_id IN (SELECT min(doc_id) FROM q GROUP BY md5(text))
        ),
        s AS (  -- 95/5 hash split + 4-way epoch shard (l21/l26 gates;
                -- NULL doc_ids excluded like the operators, r16)
            SELECT doc_id, n,
                   CASE WHEN substring(md5('split1:' || CAST(doc_id AS VARCHAR)), 1, 8)
                        < '{t_train}' THEN 'train' ELSE 'val' END AS split,
                   CAST(CAST('0x' || substring(
                        md5('ep0:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                        % 4 AS INT) AS shard
            FROM d
            WHERE doc_id IS NOT NULL
        )
        SELECT split, shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n) AS BIGINT) AS total_tokens
        FROM s GROUP BY split, shard
    """


@register(
    "c05_training_ready",
    tables=("documents",),
    oracle=_c05_oracle(),
    tags=("corpus", "composition", "quality", "split", "sharding"),
)
def c05(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """The train-ready tail of the pipeline as ONE declarative plan:
    Gopher quality gate → exact dedup → deterministic 95/5 train/val
    split → 4-shard epoch shuffle → per-(split, shard) doc/token budget.
    Every stage is an existing oracle-proven operator; the value is the
    composition — the scalar gates fuse into the scan, the only shuffles
    are the dedup groupBy, the shard exchange, and the final budget agg."""
    from ..operators import text as X
    from ..operators.sampling import deterministic_split, shuffle_shards

    docs = t["documents"]
    q = X.gopher_quality(docs, keep=("text",)).filter("pass_gopher")
    d = D.exact_dedup(q.select("doc_id", "text"), "text", "doc_id")
    s = deterministic_split(d, {"train": 0.95, "val": 0.05})
    sh = shuffle_shards(s, n_shards=4, salt="ep0")
    return sh.groupBy("split", "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tokens"),
    )


@register(
    "c06_incremental_dedup",
    tables=("documents",),
    oracle=f"""
        WITH {_minhash_pair_ctes()}
        SELECT id_a, id_b, jaccard FROM mpairs
        WHERE id_a % 5 = 0 OR id_b % 5 = 0
    """,
    tags=("corpus", "dedup", "incremental", "minhash", "index"),
)
def c06(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """The daily-crawl dedup loop end-to-end: 80% of the corpus is the
    already-admitted history (persisted via ``write_dedup_index`` — bands
    + shingles on disk), the other 20% is the incoming crawl;
    ``incremental_dedup_pairs`` returns every near-dup pair touching the
    new batch. The oracle runs FULL MinHash+LSH over the union and keeps
    pairs with a new side — a green hash row proves the incremental path
    loses nothing vs recomputing from scratch."""
    import shutil as _sh
    import tempfile as _tf

    docs = t["documents"]
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    root = _tf.mkdtemp(prefix="dedup_idx_spec_")
    try:
        D.write_dedup_index(old, root)
        # eager checkpoint so the index tempdir can be removed before the
        # caller materializes the result
        return D.incremental_dedup_pairs(
            spark, new, root, threshold=0.5
        ).localCheckpoint(eager=True)
    finally:
        _sh.rmtree(root, ignore_errors=True)


from .llm_specs import _SHINGLE_CTE_CAPPED, MAX_SHINGLE_DF  # noqa: E402


@register(
    "c07_canonical_per_cluster",
    tables=("documents",),
    oracle=f"""
        WITH RECURSIVE {_SHINGLE_CTE_CAPPED},
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        pairs AS (
            SELECT id_a, id_b FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
        ),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs
        ),
        reach(id, r) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v
        ),
        comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
        alldocs AS (
            SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component, d.n_chars
            FROM documents d LEFT JOIN comp c USING (doc_id)
        )
        SELECT doc_id, component, n_chars,
               row_number() OVER (
                   PARTITION BY component ORDER BY n_chars DESC, doc_id
               ) = 1 AS is_canonical
        FROM alldocs
    """,
    tags=("llm", "dedup", "components", "canonical", "composite"),
)
def c07(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Cluster-then-keep-best: near-dup pairs → star-CC components → elect
    the highest-quality member (n_chars, min-id tiebreak) per cluster.
    Production dedup keeps the *best* copy, not an arbitrary one — this
    composite puts that election under the driver's hash check against a
    recursive-CTE + window oracle. Singletons stay their own canonical
    component."""
    docs = t["documents"]
    pairs = (
        D.jaccard_pairs(docs, threshold=0.5, max_shingle_df=MAX_SHINGLE_DF)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    return D.keep_canonical(docs, pairs, quality_col="n_chars")


#: c08's span CTEs — l36's detection pipeline (word-8-grams duplicated
#: across ≥2 docs, merged to maximal spans), shared verbatim so the
#: excision oracle and the detection oracle can never drift apart.
_SPAN_CTES = """
        t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        p AS (
            SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
            FROM t WHERE len(toks) >= 8
        ),
        g AS (
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                   md5(array_to_string(toks[i:i+7], ' ')) AS gram
            FROM p
        ),
        d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        h AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)),
        b AS (
            SELECT doc_id, pos,
                   CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                             OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
                        THEN 1 ELSE 0 END AS brk
            FROM h
        ),
        spn AS (
            SELECT doc_id, pos,
                   CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY pos)
                        AS BIGINT) AS span_id
            FROM b
        ),
        spans AS (
            SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end
            FROM spn GROUP BY doc_id, span_id
        )
"""


@register(
    "c08_span_excision",
    tables=("documents",),
    oracle=f"""
        WITH {_SPAN_CTES},
        tokpos AS (
            SELECT doc_id, unnest(toks) AS tok,
                   unnest(generate_series(0, len(toks) - 1)) AS pos
            FROM t
        ),
        removed AS (
            SELECT DISTINCT tk.doc_id, tk.pos
            FROM tokpos tk JOIN spans s ON tk.doc_id = s.doc_id
                AND tk.pos BETWEEN s.span_start AND s.span_end
        ),
        kept AS (SELECT tp.* FROM tokpos tp ANTI JOIN removed USING (doc_id, pos)),
        agg AS (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS cleaned_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT t.doc_id,
               -- the '' coalesce is for real docs whose every token was
               -- excised; a NULL text null-propagates on both engines
               -- (r13 adversarial-data audit)
               CASE WHEN t.toks IS NOT NULL
                    THEN COALESCE(a.cleaned_text, '') END AS cleaned_text,
               CAST(len(t.toks) AS BIGINT) AS n_tokens,
               CAST(len(t.toks) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
        FROM t LEFT JOIN agg a USING (doc_id)
        -- Rule 1 (r16): id-less docs still CONTRIBUTE to span detection
        -- (their text is real) but emit no output row — the per-doc
        -- excision join is keyed by doc_id, where NULL never matches
        WHERE t.doc_id IS NOT NULL
    """,
    tags=("llm", "dedup", "substring", "excision", "composite"),
)
def c08(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Substring dedup end to end: detect cross-document duplicated
    8-gram spans and CUT them from each doc, keeping the unique
    remainder — detection is l36's linear pipeline; the excision is one
    left join + a pure array-filter expression (no second explode, no
    corpus re-shuffle). The oracle rebuilds the cleaned text
    relationally (token anti-join against span intervals +
    order-preserving string_agg), so the hash row pins both the span
    math and the reassembled text."""
    return D.excise_duplicated_spans(t["documents"], n=8, min_docs=2)


@register(
    "c09_corpus_snapshot_diff",
    tables=("documents",),
    oracle="""
        WITH old_v AS (
            SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 10 <> 7
        ),
        new_v AS (
            SELECT doc_id,
                   md5(CASE WHEN doc_id % 10 = 3
                            THEN text || ' refreshed' ELSE text END) AS fp
            FROM documents WHERE doc_id % 10 <> 5
        )
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.fp IS DISTINCT FROM n.fp THEN 'changed'
                    ELSE 'same' END AS status
        FROM old_v o FULL OUTER JOIN new_v n ON o.doc_id = n.doc_id
    """,
    tags=("llm", "maintenance", "diff", "audit"),
)
def c09(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Crawl-over-crawl snapshot diff: every doc classified
    added/removed/changed/same across two simulated corpus versions (the
    refresh drops the %10==5 docs, adds the %10==7 docs back, edits the
    %10==3 docs). One full-outer join on the key with md5 fingerprints
    computed in the scan — 32-byte hashes travel, never documents."""
    from ..operators.maintenance import snapshot_diff

    docs = t["documents"]
    old = docs.filter(F.col("doc_id") % 10 != 7)
    new = docs.filter(F.col("doc_id") % 10 != 5).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 3, F.concat(F.col("text"), F.lit(" refreshed"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(old, new)


def _telemetry_oracle() -> str:
    from ..operators import sketches as SK

    return f"""
        WITH hll AS (
            WITH hashed AS (
                SELECT lang, text AS k FROM documents WHERE text IS NOT NULL
            ),
            buckets AS (SELECT lang, {SK.hll_buckets_sql("k")} FROM hashed),
            regs AS (
                SELECT lang, bucket, MAX(rho) AS rho FROM buckets
                GROUP BY lang, bucket
            ),
            {SK.hll_tail_sql(group_cols=("lang",), estimate_col="est_distinct_texts")}
        ),
        counts AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang
        ),
        sampled AS (
            SELECT lang, n_chars FROM documents
            WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) < 1073741824
        ),
        quants AS (
            -- sampled_quantiles' r16 |pct| < 1e12 grid bound is vacuous
            -- here (n_chars is a small int), so the plain floor text
            -- stays value-identical to the operator's CASE
            SELECT lang, CAST(count(*) AS BIGINT) AS n_sample,
                   floor(quantile_cont(n_chars, 0.5) * 10000.0) / 10000.0 AS p50_chars,
                   floor(quantile_cont(n_chars, 0.95) * 10000.0) / 10000.0 AS p95_chars
            FROM sampled GROUP BY lang
        )
        SELECT c.lang, c.n_docs, h.est_distinct_texts,
               q.n_sample, q.p50_chars, q.p95_chars
        FROM counts c
        JOIN hll h ON h.lang = c.lang
        JOIN quants q ON q.lang = c.lang
    """


def _incremental_telemetry_oracle() -> str:
    """Single-pass replay of everything the c11 stores accumulate batch by
    batch — a green hash IS the proof that the rolled stores equal one
    pass over the whole corpus. All three sketch replays come from the
    operators.sketches generators so the constants cannot drift."""
    from ..operators import sketches as SK

    cms = f"""
        WITH rows_(row_idx) AS (VALUES {SK.CMS_ROWS_VALUES}),
        cells AS (
            SELECT row_idx, {SK.cms_col_expr_sql("lang")} AS col_idx
            FROM documents CROSS JOIN rows_
        ),
        sketch AS (
            SELECT row_idx, col_idx, count(*) AS n
            FROM cells GROUP BY row_idx, col_idx
        ),
        probes AS (SELECT DISTINCT lang FROM documents),
        probe_cells AS (
            SELECT p.lang, row_idx, {SK.cms_col_expr_sql("p.lang")} AS col_idx
            FROM probes p CROSS JOIN rows_
        )
        SELECT pc.lang, CAST(min(coalesce(s.n, 0)) AS BIGINT) AS cms_n_docs
        FROM probe_cells pc
        LEFT JOIN sketch s USING (row_idx, col_idx)
        GROUP BY pc.lang
    """
    hll = SK.hll_oracle_sql(
        "documents", "text", group_expr="lang", group_alias="lang",
        estimate_col="est_distinct_texts",
    )
    quants = SK.loglin_quantiles_sql(
        "documents", "n_chars", (0.5, 0.95), group_expr="lang",
        group_alias="lang",
    )
    return f"""
        SELECT c.lang, c.cms_n_docs, h.est_distinct_texts,
               q.n_total, q.p50 AS p50_chars, q.p95 AS p95_chars
        FROM ({cms}) c
        JOIN ({hll}) h ON h.lang = c.lang
        JOIN ({quants}) q ON q.lang = c.lang
    """


@register(
    "c11_incremental_telemetry",
    tables=("documents",),
    oracle=_incremental_telemetry_oracle(),
    tags=("corpus", "composite", "sketch", "telemetry", "incremental",
          "store"),
)
def c11(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """INCREMENTAL corpus telemetry — c10's dataset-card metrics produced
    the way production runs them: the corpus arrives in batches, each
    batch rolls the three persisted sketch stores forward
    (operators/sketches.py: HLL registers for distinct texts, Count-Min
    counters for per-lang doc frequency, log-linear histogram for length
    quantiles), and the card is read OFF THE STORES — history is never
    re-scanned. The oracle is a single pass over the whole corpus, so a
    green value hash proves rolled-store == single-pass for all three
    sketch families at once. One batch is deliberately RE-DELIVERED
    (at-least-once semantics): the HLL store absorbs it by max-merge
    idempotence, the CMS/loglin stores by their applied-batch ledgers
    (r12) — a double count would flip the hash. 100 TB shape: per-batch
    cost ∝ the batch; store size is bounded (≤4096 HLL registers and
    ≤~1k histogram rows per lang, ≤4096 CMS cells) however large the
    corpus grows."""
    import shutil
    import tempfile

    from ..operators import sketches as SK

    docs = t["documents"]
    root = tempfile.mkdtemp(prefix="c11_stores_")
    hll_p, cms_p, ll_p = f"{root}/hll", f"{root}/cms", f"{root}/loglin"
    try:
        # coalesce(pmod(id,3), 0): telemetry counts EVERY doc — the oracle
        # is a single pass over the whole corpus — so a NULL-id doc must
        # land in a batch, not vanish (a bare `doc_id % 3 == i` is NULL
        # for NULL ids and matched NO batch: the stores under-counted by
        # exactly the NULL-id docs, a live divergence found by the dirty
        # sweep's arm 8). Unlike dedup/split, telemetry needs no row
        # identity, so Rule 1's exclusion does not apply — batch 0 is the
        # deterministic home for id-less rows.
        batches = [
            docs.filter(
                F.coalesce(F.pmod(F.col("doc_id"), F.lit(3)), F.lit(0)) == i
            )
            for i in range(3)
        ]
        for i, b in enumerate(batches):
            SK.update_hll_store(b, "text", hll_p, group_cols=("lang",))
            SK.update_cms_store(b, "lang", cms_p, batch_id=str(i))
            SK.update_loglin_store(
                b, "n_chars", ll_p, group_cols=("lang",), batch_id=str(i)
            )
        # the retry: batch 0 arrives again — all three stores must shrug.
        # Explicit raises, not `assert`: under `python -O` asserts are
        # stripped and the redelivery exercise would silently stop running
        # (ADVICE r12) — the hash would still match, hiding the lost
        # coverage.
        SK.update_hll_store(batches[0], "text", hll_p, group_cols=("lang",))
        cms_applied = SK.update_cms_store(
            batches[0], "lang", cms_p, batch_id="0"
        )
        ll_applied = SK.update_loglin_store(
            batches[0], "n_chars", ll_p, group_cols=("lang",), batch_id="0"
        )
        if cms_applied or ll_applied:
            raise RuntimeError(
                "redelivered batch was re-applied instead of skipped: "
                f"cms={cms_applied} loglin={ll_applied}"
            )

        hll = SK.hll_estimate(
            spark.read.parquet(hll_p), group_cols=("lang",),
            estimate_col="est_distinct_texts",
        ).select("lang", "est_distinct_texts")
        cms = SK.cms_estimate(
            spark.read.parquet(cms_p), docs.select("lang").distinct(), "lang"
        ).withColumnRenamed("cms_n", "cms_n_docs")
        quants = (
            SK.loglin_quantiles(
                spark.read.parquet(ll_p), (0.5, 0.95), group_cols=("lang",)
            )
            .withColumnRenamed("p50", "p50_chars")
            .withColumnRenamed("p95", "p95_chars")
        )
        out = cms.join(hll, "lang").join(quants, "lang").select(
            "lang", "cms_n_docs", "est_distinct_texts", "n_total",
            "p50_chars", "p95_chars",
        )
        # eager: the temp stores are deleted on return, so the ~lang-count
        # result rows must be materialized before the plan outlives them.
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "c10_corpus_telemetry",
    tables=("documents",),
    oracle=_telemetry_oracle(),
    tags=("corpus", "composite", "sketch", "telemetry"),
)
def c10(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Corpus telemetry — the dataset-card metrics pass, one declarative
    plan per language: exact doc counts, portable-HLL distinct-text
    estimates (near-dup mass shows up as n_docs >> distinct texts), and
    deterministic-sample length quantiles. Composition of the r10 sketch
    family (operators/sketches.py); every branch aggregates to
    lang-cardinality rows before the joins, so the joins are
    broadcast-sized whatever the corpus size, and each scan prunes to the
    two columns its branch needs. At 100 TB this is the nightly
    monitoring query that decides whether dedup debt is growing."""
    from ..operators import sketches as SK

    docs = t["documents"]
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    hll = SK.hll_count_distinct(
        docs, "text", group_cols=("lang",), estimate_col="est_distinct_texts"
    ).select("lang", "est_distinct_texts")
    quants = (
        SK.sampled_quantiles(
            docs, "n_chars", F.col("doc_id"), probs=(0.5, 0.95),
            group_cols=("lang",), shift=2,
        )
        .withColumnRenamed("p50", "p50_chars")
        .withColumnRenamed("p95", "p95_chars")
    )
    return counts.join(hll, "lang").join(quants, "lang").select(
        "lang", "n_docs", "est_distinct_texts", "n_sample", "p50_chars",
        "p95_chars",
    )
