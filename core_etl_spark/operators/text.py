"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality stats, language-ID heuristic, token counting,
document fingerprinting. All pure column expressions (JVM-side, codegen'd)
— at 100 TB these run as a single pass over the corpus with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately small — the heuristic is the operator, the lists
#: are config.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "y"),
    "zh": ("de", "shi", "bu", "le", "wo"),
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space corpus → plain split)."""
    return F.split(text, " ")


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens that are in ``words`` — an element-wise ``filter``
    over the token array, no explode/shuffle."""
    lits = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(lits, t)))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality stats: token count, distinct-token count,
    average word length, stopword ratio, and a rational quality score
    (lexical diversity × non-stopword density — no transcendentals, so the
    value is bit-identical across engines)."""
    text = F.col(text_col)
    toks = tokens(text)
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    # total word chars = len(text) - (n_tok - 1) separators, for 1+ tokens
    word_chars = F.length(text) - (n_tok - F.lit(1))
    stop_hits = stopword_hits(text, STOPWORDS_EN)
    return df.select(
        "*",
        n_tok.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        (word_chars / n_tok).alias("avg_word_len"),
        (stop_hits / n_tok).alias("stopword_ratio"),
        ((n_distinct / n_tok) * (F.lit(1) - stop_hits / n_tok)).alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    segmentation (letter runs / digit runs / single other chars) — the
    cheap proxy for LLM token budgeting."""
    text = F.col(text_col)
    return df.select(
        "*",
        F.size(F.split(text, " ")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0)).alias(
            "n_bpe_tokens"
        ),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: count per-language stopword hits and take
    the argmax (ties broken by a fixed language order). One pass, no
    shuffle; the per-language hit columns are kept for calibration."""
    text = F.col(text_col)
    hit_cols = {
        lang: stopword_hits(text, words).alias(f"hits_{lang}")
        for lang, words in LANG_STOPWORDS.items()
    }
    out = df.select("*", *hit_cols.values())
    # argmax with deterministic precedence = order of LANG_STOPWORDS
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in LANG_STOPWORDS:  # later langs win only on strictly more hits
        cond = F.col(f"hits_{lang}") > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, F.col(f"hits_{lang}")).otherwise(best_hits)
    return out.select("*", best.alias("predicted_lang"))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: md5 of the whitespace-normalized text plus
    a 60-bit integer fingerprint (hex-parsed md5 prefix) and a prefix
    fingerprint of the first 64 normalized chars — the cheap equality key
    for exact/near-prefix dedup."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    full = F.md5(norm)
    return df.select(
        "*",
        full.alias("fp_md5"),
        F.conv(F.substring(full, 1, 15), 16, 10).cast("long").alias("fp_int60"),
        F.md5(F.substring(norm, 1, 64)).alias("fp_prefix64"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Repetition / boilerplate detection — the standard pre-training
    prefilter (C4/Gopher-style): fraction of duplicate word ``n``-grams
    within the document and the relative frequency of its most common
    token. Pure array expressions over the token list — one corpus pass,
    no explode, no shuffle; per-doc cost is O(tokens · distinct-tokens),
    bounded by document length, independent of corpus size.

    Tokens are NON-EMPTY fragments, and a doc with no real tokens —
    NULL/empty/whitespace-only text — gets ``n_ngrams = 0`` and NULL
    ratios (r13 adversarial-data audit): the ratios are undefined for an
    empty doc, and the engines disagreed on the degenerate values (Spark
    kept a NULL gram, DuckDB's list_distinct dropped it → ratios 0 vs 1
    for the same doc). A quality gate treats NULL as "no signal", which
    is exactly right for a blank doc."""
    text = F.col(text_col)
    toks = F.filter(tokens(text), lambda t: t != "")
    n_tok = F.coalesce(F.size(toks), F.lit(0))
    n_grams = F.when(
        n_tok > 0, F.greatest(n_tok - F.lit(n - 1), F.lit(1))
    ).otherwise(F.lit(0))
    grams = F.when(
        n_tok > 0,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_tok - F.lit(n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top_tok_hits = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda w: F.size(F.filter(toks, lambda t: t == w)),
        )
    )
    return df.select(
        "*",
        n_grams.alias("n_ngrams"),
        F.when(
            n_grams > 0,
            F.lit(1) - F.size(F.array_distinct(grams)) / n_grams,
        ).alias("dup_ngram_ratio"),
        F.when(n_tok > 0, top_tok_hits / n_tok).alias("top_token_ratio"),
    )


#: PII patterns, deliberately portable between Spark's and DuckDB's regex
#: engines (no lookaround, no shorthand classes).
PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+"
PII_PHONE = "[+][0-9]-[0-9][0-9][0-9]-[0-9]{7}"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction: count and mask email addresses and phone numbers.
    Single-pass column expressions (``regexp_extract_all`` to count,
    nested ``regexp_replace`` to mask) — Spark's regexp_replace is global,
    matching DuckDB's ``'g'`` flag. Extend ``PII_*`` with SSN/IP/IBAN
    patterns as needed; the plan shape is unchanged."""
    text = F.col(text_col)
    return df.select(
        "*",
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), 0)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(text, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
        ).alias("scrubbed"),
    )


def vocab_topk(df: DataFrame, k: int = 50, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary top-k: explode tokens, count, take the k most
    frequent (count desc, token asc tiebreak). The count is partial+final
    (map-side combine collapses each partition's token stream before the
    one shuffle on token), and the top-k is ``orderBy().limit(k)`` —
    Spark plans TakeOrderedAndProject, a distributed heap per partition
    + driver merge of k·P rows, never a single-partition sort of the
    vocabulary."""
    tok = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    top = counts.orderBy(F.desc("n"), "token").limit(k)
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("n"), "token")  # over k rows only
    return top.select("token", "n", F.row_number().over(w).alias("rank"))


def remove_boilerplate_chunks(
    df: DataFrame,
    chunk_words: int = 3,
    max_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Intra-corpus boilerplate removal at sub-document granularity — the
    RefinedWeb/CCNet "repeated paragraph" pass adapted to whitespace
    corpora: split each document into consecutive ``chunk_words``-word
    chunks, count each chunk's document frequency across the corpus, and
    rebuild every document's text with chunks appearing in more than
    ``max_df`` documents removed (navigation bars, license headers,
    template fills — the text that repeats across pages verbatim).

    Scale shape: one explode pass (corpus → chunk rows), one partial+final
    groupBy for document frequency, one left join to mark hot chunks (the
    optimizer broadcasts the hot side when it is small, which boilerplate
    by definition is), and one groupBy to reassemble — order restored via
    ``array_sort`` on (pos, chunk) structs, never a window over the whole
    corpus. Returns (id, clean_text, n_kept, n_dropped); a fully-
    boilerplate document comes back with empty text, not silently missing.
    NULL-text documents have no chunks to explode and are ABSENT from the
    output (the module convention — vocab_coverage/token_rarity/
    bpe_token_counts drop them the same way; re-join against the corpus
    when per-doc completeness matters), which the l23 oracle mirrors.
    NULL-``id_col`` rows are EXCLUDED (Rule 1, r16 NULL-primary-key
    sweep): the output is keyed by id, and several id-less docs would
    otherwise MERGE into one reassembly group whose chunk order is a
    cross-engine coin flip (pos ties across distinct source docs). Their
    chunks also never counted toward document frequency anyway
    (count_distinct ignores NULL), so corpus-side results are unchanged.
    """
    df = df.filter(F.col(id_col).isNotNull())
    words = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(words) / F.lit(float(chunk_words))).cast("long")
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(words, (i * chunk_words + 1).cast("int"), chunk_words), " "
        ),
    )
    # materialized once (r15 review): base feeds BOTH the hot aggregate
    # and the join probe, and with the hot side broadcast there is no
    # exchange for Spark to reuse — the corpus-wide explode otherwise
    # runs twice, doubling the operator's dominant cost
    base = df.select(
        F.col(id_col), F.posexplode(chunks).alias("pos", "chunk")
    ).localCheckpoint(eager=False)
    hot = (
        base.groupBy("chunk")
        .agg(F.count_distinct(id_col).alias("_dc"))
        .filter(F.col("_dc") > max_df)
        .select("chunk", F.lit(1).alias("_hot"))
    )
    marked = base.join(hot, "chunk", "left")
    keep_struct = F.when(F.col("_hot").isNull(), F.struct("pos", "chunk"))
    return marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(keep_struct)), lambda s: s["chunk"]
            ),
            " ",
        ).alias("clean_text"),
        F.count(keep_struct).alias("n_kept"),
        F.count("_hot").alias("n_dropped"),
    )


def vocab_coverage(
    df: DataFrame,
    vocab_size: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer-fit / OOV-rate analysis: build the corpus's top-
    ``vocab_size`` vocabulary (count desc, token asc — deterministic), then
    score every document by the fraction of its tokens OUTSIDE that
    vocabulary. High OOV rate flags documents a fixed-vocab tokenizer
    would fragment (code, foreign scripts, mojibake) — a standard
    curation signal before training-set admission.

    The vocabulary is a top-k (TakeOrderedAndProject, k·P rows to the
    driver) and joins back as a broadcast; per-document scoring is then
    one explode + partial+final groupBy. ``oov_rate`` is an exact
    long/long IEEE divide — bit-identical across engines."""
    # materialized once (r15 review): the exploded tokens feed both the
    # vocab aggregate and the broadcast-join probe side, with no common
    # exchange for Spark to reuse — measured 4 corpus scans in the plan
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).localCheckpoint(eager=False)
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("_n"))
        .orderBy(F.desc("_n"), "token")
        .limit(vocab_size)
        .select("token", F.lit(1).alias("_in_vocab"))
    )
    marked = tok.join(F.broadcast(vocab), "token", "left")
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (F.count("*") - F.count("_in_vocab")).alias("n_oov"),
        (
            (F.count("*") - F.count("_in_vocab")) / F.count("*")
        ).alias("oov_rate"),
    )


def dedup_chunks_within_doc(
    df: DataFrame,
    chunk_words: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Intra-document repetition scrub — the within-page line-dedup pass
    (trafilatura/CCNet style): drop repeated ``chunk_words``-word chunks
    inside a single document, keeping the first occurrence in place.
    Complements :func:`remove_boilerplate_chunks` (cross-document) and
    ``repetition_stats`` (which only measures).

    Scale shape: ZERO shuffle — a pure higher-order array expression per
    row (a chunk at 1-based position i survives iff ``array_position``
    finds its first occurrence at i), so at 100 TB this is a narrow
    projection fused into whatever scan precedes it.

    NULL-``id_col`` rows are EXCLUDED (Rule 1, r16 NULL-primary-key
    sweep): the computation is row-local and would not care, but the
    output is keyed by id — and the SQL twin must reassemble per doc_id,
    where several id-less docs MERGE into one group (a live divergence
    on the dirty corpus). An id-less output row is unusable downstream
    anyway."""
    df = df.filter(F.col(id_col).isNotNull())
    words = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(words) / F.lit(float(chunk_words))).cast("long")
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(words, (i * chunk_words + 1).cast("int"), chunk_words), " "
        ),
    )
    kept = F.filter(
        chunks, lambda c, i: F.array_position(chunks, c) == (i + 1).cast("long")
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        (F.size(chunks) - F.size(kept)).cast("long").alias("n_dropped"),
    )


#: Default weights for :func:`hashed_linear_classifier` — 16 integer weights,
#: one per hex-nibble feature bucket. Integers keep the score an exact
#: rational (sum_int / n_tokens), so the classifier is bit-identical across
#: engines; a trained model would drop in real (quantized) weights here.
QC_WEIGHTS_16: tuple[int, ...] = (3, -2, 1, 0, 2, -1, -3, 1, 0, 2, -2, 1, -1, 3, 0, -2)


def hashed_linear_classifier(
    df: DataFrame,
    weights: tuple[int, ...] = QC_WEIGHTS_16,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "qc1",
) -> DataFrame:
    """fastText/CCNet-style document quality classifier: a linear model over
    hashed bag-of-words features, the standard cheap quality gate applied to
    every web-crawl corpus before training.

    Each token hashes into one of ``len(weights)`` feature buckets
    (``md5(salt#token)`` first nibble); the document score is the mean bucket
    weight over ALL tokens (term frequency included, as a real linear model
    scores), and ``keep = score >= threshold``.

    Scale shape: ZERO shuffle — the whole model is a higher-order array
    expression (``transform`` + ``aggregate``) evaluated per row inside
    whole-stage codegen; at 100 TB this fuses into the corpus scan. The
    weight table is a literal array, so there is no lookup join; a 2^18
    -bucket production model would broadcast the weight array instead —
    the plan shape is unchanged.
    """
    n_buckets = len(weights)
    if n_buckets < 1 or n_buckets > 16:
        raise ValueError("weights must have 1..16 entries (one hex nibble)")
    w_arr = F.array(*[F.lit(int(w)) for w in weights])
    toks = tokens(F.col(text_col))
    bucket = lambda t: (  # noqa: E731 — first md5 nibble as an int bucket
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}#"), t)), 1, 1), 16, 10)
        .cast("int") % n_buckets
    )
    score_sum = F.aggregate(
        F.transform(toks, lambda t: F.element_at(w_arr, bucket(t) + 1)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n = F.size(toks)
    return df.select(
        F.col(id_col),
        score_sum.alias("score_sum"),
        n.cast("long").alias("n_tokens"),
        (score_sum / n).alias("score"),
        (score_sum / n >= F.lit(threshold)).alias("keep"),
    )


def gopher_quality(
    df: DataFrame,
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    min_stopword_hits: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style heuristic quality rules (Rae et al. 2021, published
    recipe): the rule battery every web-crawl corpus is screened with
    before the (more expensive) classifier/dedup passes. Implemented
    rules — word-count bounds, mean-word-length bounds, alphabetic-word
    ratio, and minimum stopword evidence — each emitted as its own flag
    plus the conjunction, so downstream reporting can attribute WHY a
    document failed.

    Every ratio divides exact integers (counts over counts), so flags are
    engine-portable. Scale shape: ZERO shuffle — one battery of
    element-wise array expressions fused into the corpus scan."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # mean word length over the single-space corpus: chars minus the
    # (n-1) separators, divided by n — exact ints in, one double out
    mean_wl = (F.length(F.col(text_col)) - (n - 1)) / n
    # case-insensitive (r15 review): tokens() does NOT lowercase, so the
    # old "[a-z]" counted acronym/header tokens (NASA, FBI, I) as
    # NON-alphabetic and failed legitimate documents on the alpha rule —
    # Gopher's rule is "contains an alphabetic character", any case
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("(?i)[a-z]")))
    stop_hits = stopword_hits(F.col(text_col), STOPWORDS_EN)
    rule_words = (n >= min_words) & (n <= max_words)
    rule_wl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    rule_alpha = n_alpha / n >= F.lit(min_alpha_ratio)
    rule_stop = stop_hits >= min_stopword_hits
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],  # passthrough for composites (c05)
        n.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        (n_alpha / n).alias("alpha_ratio"),
        stop_hits.cast("long").alias("stopword_hits"),
        rule_words.alias("pass_word_count"),
        rule_wl.alias("pass_word_len"),
        rule_alpha.alias("pass_alpha"),
        rule_stop.alias("pass_stopwords"),
        (rule_words & rule_wl & rule_alpha & rule_stop).alias("pass_gopher"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction by tf-idf with a LINEAR idf
    (``score = tf/doclen × N/df``): every factor is an exact integer
    ratio, so scores — and therefore the selected top-``k`` — are
    bit-identical across engines (the log-idf variant is a one-expression
    swap; ln's last-ulp differences between libm and the JVM would break
    oracle hashing, which is the only reason it isn't the default here).

    Scale shape: explode → (doc, token) count [one shuffle] → document
    lengths and document frequencies as two partial+final aggregates →
    equi-joins on doc and token → per-doc top-k window. The document-
    frequency side is vocabulary-sized; N arrives via a broadcast 1-row
    aggregate, never a driver round-trip."""
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    doclen = tf.groupBy(id_col).agg(F.sum("tf").alias("n_tok"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df_docs"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(doclen, id_col)
        .join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "token",
            (
                (F.col("tf") * F.col("n_docs")).cast("double")
                / (F.col("n_tok") * F.col("df_docs")).cast("double")
            ).alias("score"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "rank", "score")
    )


def token_rarity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-frequency rarity score per document: the mean corpus term
    frequency of a doc's tokens — the cheap perplexity proxy (a doc made
    of tokens the corpus has barely seen is usually garbage, OCR noise,
    or another language; one made only of ultra-common tokens is
    boilerplate). Returns ``(doc_id, n_tokens, sum_cf, mean_cf)`` where
    ``cf`` is each token occurrence's total corpus count.

    Exact integer sums divided once at the end keep the score
    engine-portable. Scale shape: one explode (linear), one
    map-combinable vocab agg, one equi-join on the token (vocab-sized
    build side — broadcastable for natural-language vocabularies), one
    per-doc agg. No log(), no floats until the final division."""
    # materialized once (r15 review): feeds the corpus-frequency agg AND
    # the join probe — measured 4 corpus scans without it
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).localCheckpoint(eager=False)
    cf = toks.groupBy("tok").agg(F.count("*").alias("cf"))
    return (
        toks.join(cf, "tok")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_tokens"), F.sum("cf").alias("sum_cf"))
        .select(
            id_col,
            "n_tokens",
            "sum_cf",
            (F.col("sum_cf") / F.col("n_tokens")).alias("mean_cf"),
        )
    )


def bigram_lm(
    df: DataFrame, text_col: str = "text", min_count: int = 2
) -> DataFrame:
    """Count-based bigram language model table — the n-gram LM
    construction pass (KenLM-style counting, no smoothing): for every
    adjacent token pair, its corpus count and the conditional probability
    ``P(w2|w1) = c(w1 w2) / c(w1 ·)`` as an exact integer ratio.

    Returns ``(w1, w2, c_bigram, c_head, p)`` for bigrams seen at least
    ``min_count`` times. Scale shape: one positional explode (linear in
    corpus tokens), two map-combinable aggs (pair counts, head counts),
    one equi-join on the head token; the LM table is vocab²-bounded and
    the join build side is vocab-sized."""
    t = df.select(tokens(F.col(text_col)).alias("_t")).filter(F.size("_t") >= 2)
    pairs = t.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - 2),
                lambda i: F.struct(
                    F.col("_t")[i].alias("w1"), F.col("_t")[i + 1].alias("w2")
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    c_bg = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c_bigram"))
    c_head = pairs.groupBy("w1").agg(F.count("*").alias("c_head"))
    return (
        c_bg.filter(F.col("c_bigram") >= min_count)
        .join(c_head, "w1")
        .select(
            "w1",
            "w2",
            "c_bigram",
            "c_head",
            (F.col("c_bigram") / F.col("c_head")).alias("p"),
        )
    )


def _bpe_select_disjoint(
    top: list, k: int
) -> list[tuple[str, str, int]]:
    """Greedy batched-BPE selection over a ranked (w1, w2, total) prefix:
    take up to ``k`` pairs such that no later selection shares a symbol
    with an earlier one OR has a symbol equal to an earlier selection's
    concatenation. The first exclusion keeps counts exact under the
    earlier merge (the shared symbol's occurrences change); the second
    closes the stale-count hole where an earlier replace mints new tokens
    of a later pair's symbol (select ``(a, bc)``, then ``(abc, d)``'s
    pre-counted total is stale because new ``abc`` tokens now exist).
    Pure driver-side function over the bounded collected prefix — split
    out for direct unit testing (tests/test_llm_ops.py)."""
    selected: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for w1, w2, total in top:
        if len(selected) == k:
            break
        if w1 in used or w2 in used:
            continue
        selected.append((w1, w2, int(total)))
        used.update((w1, w2, w1 + w2))
    return selected


# Each BPE merge ROUND is one sequential driver-scheduled job; see
# bpe_merges docstring for the regime this bounds.
_BPE_MAX_ROUNDS = 1000
# Back-compat alias (pre-r09 name, when rounds and merges were 1:1).
_BPE_MAX_MERGES = _BPE_MAX_ROUNDS


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    return_vocab: bool = False,
    batch: int = 1,
):
    """Byte-pair-encoding vocabulary learning (Sennrich et al. 2016) as
    distributed DataFrame ops — the tokenizer-training pass of an LLM
    data pipeline: repeatedly find the most frequent adjacent symbol
    pair across the corpus and fuse it into a new symbol.

    Returns the learned merge table ``(merge_idx, w1, w2, pair_count)``
    in merge order. Ties break lexicographically, so the table is
    deterministic and engine-replayable.

    Scale shape: the corpus collapses ONCE into a word-frequency vocab
    (the classic BPE trick — all further passes run over distinct words
    weighted by count, vocab-sized not corpus-sized). Each of the
    ``n_merges`` rounds is one map-combinable pair-count aggregate plus a
    1-row collect (the argmax pair — bounded driver traffic), and the
    merge application is a single literal ``replace`` on the symbol
    string (whole-stage codegen, no UDF); the vocab is checkpointed per
    round to cut lineage.

    Merge application is CANONICAL left-to-right greedy (Sennrich):
    symbols are joined with a TWO-space separator and the merge pattern
    ``" w1  w2 "`` consumes only the inner half of each boundary, so
    leftmost-first non-overlapping ``replace`` advances exactly two
    symbols per match — a run ``a a a a`` merges to ``aa aa`` in one
    round, never alternately. ``replace`` is byte-identical between
    Spark, DuckDB, and Python ``str.replace``, so the oracle replays
    every round exactly.

    Job-count regime: each merge ROUND is ONE Spark job (the pair-count
    top-k collect, which also materializes the previous round's lazy
    vocab checkpoint), run SEQUENTIALLY — cost is ``O(n_merges / batch)``
    driver rounds over a vocab-sized table, NOT corpus-sized work.

    ``batch > 1`` is the large-vocabulary path: each round counts pairs
    once, collects the top ``64·batch+16`` ranked prefix (bounded driver
    traffic, capped at 64k rows), greedily selects up to ``batch`` pairs
    that are SYMBOL-DISJOINT from every higher-ranked selected pair (a
    pair sharing a symbol with one already selected is skipped — its
    count would change once the earlier merge applies) AND whose symbols
    do not equal any higher-ranked selection's *concatenation* (if
    ``(a, bc)`` is selected, a later candidate ``(abc, d)`` is skipped:
    the earlier replace mints new ``abc`` tokens, so the later pair's
    pre-counted total would be stale when its replace applies). Together
    the two exclusions guarantee no selected merge can create or destroy
    occurrences of another selected pair, so every selected pair's count
    is exact when its merge applies, and the chained rank-order
    ``replace`` pass (one checkpoint per round) is order-safe.

    **Training-equivalence contract**: ``batch=1`` is exactly sequential
    Sennrich BPE — the canonical path, what the l41-family oracles
    replay. ``batch>1`` deviates from sequential in one documented case:
    a merge applied in the batch creates a BRAND-NEW pair whose count
    would outrank a later selection of the same round (sequential
    recounts after every merge and would pick the new pair first; the
    batch cannot, since the new pair didn't exist when the round was
    counted). This is the standard batched-BPE approximation — traded
    for training a 32k vocab in ~500 rounds instead of 32k — and is
    pinned by tests/test_llm_ops.py::test_bpe_batched_divergence_boundary.

    ``ceil(n_merges / batch)`` above :data:`_BPE_MAX_ROUNDS` raises up
    front; because greedy disjoint selection can legitimately pick fewer
    than ``batch`` pairs in dense early rounds, the cap is ALSO enforced
    on actual rounds inside the loop — the pre-check is an optimistic
    estimate, not the guard.
    """
    if batch < 1:
        raise ValueError(f"bpe_merges: batch must be >= 1, got {batch}")
    if -(-n_merges // batch) > _BPE_MAX_ROUNDS:
        raise ValueError(
            f"bpe_merges: n_merges={n_merges} with batch={batch} means "
            f"{-(-n_merges // batch)} sequential rounds (> {_BPE_MAX_ROUNDS}); "
            "each round is one driver-scheduled Spark job. Raise batch "
            "(top-B disjoint merges per round), train offline over the "
            "word-frequency vocab this function already computes, or raise "
            "_BPE_MAX_ROUNDS deliberately."
        )
    spark = df.sparkSession
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("w"))
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            "w",
            "cnt",
            # Two-space separators: "ab" -> "  a  b  ". The canonical-greedy
            # merge replace consumes one space from each side of a boundary.
            F.concat(F.lit("  "), F.regexp_replace(F.col("w"), "(.)", "$1  ")).alias(
                "state"
            ),
        )
        # lazy: round 1's argmax collect materializes the base vocab
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int, int]] = []  # (+round, r16)
    rounds = 0
    while len(merges) < n_merges:
        rounds += 1
        if rounds > _BPE_MAX_ROUNDS:
            # The pre-check above assumed every round selects a full
            # batch; greedy disjoint selection can pick fewer (dense
            # early rounds), so the real guard is here.
            raise RuntimeError(
                f"bpe_merges: exceeded {_BPE_MAX_ROUNDS} driver-scheduled "
                f"rounds after {len(merges)}/{n_merges} merges — the "
                "ranked prefix is too contended for this batch size; "
                "raise batch or _BPE_MAX_ROUNDS deliberately."
            )
        k = min(batch, n_merges - len(merges))
        syms = F.split(F.trim(F.col("state")), "  ")
        multi = vocab.filter(F.size(syms) >= 2).select(syms.alias("s"), "cnt")
        pairs = multi.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("s") - 1),
                    lambda j: F.struct(
                        F.element_at("s", j).alias("w1"),
                        F.element_at("s", j + 1).alias("w2"),
                    ),
                )
            ).alias("p"),
            "cnt",
        )
        # Ranked prefix, not argmax: the greedy disjoint selection below
        # scans at most this many candidates, so driver traffic stays
        # bounded (≤64·batch+16 rows, capped at 64k — a few MB at worst).
        # The prefix is deliberately much deeper than the batch: early
        # rounds have few distinct symbols, so the top of the ranking is
        # dense with conflicting pairs and a shallow scan starves the
        # batch (measured on the 5k-merge bench: 4× prefix → 217 rounds,
        # 64× prefix → 49). If fewer than k disjoint pairs exist in the
        # prefix the round applies fewer — the next round recounts and
        # picks them up, so exhaustion terminates via the empty collect.
        top = (
            pairs.groupBy("p.w1", "p.w2")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.desc("total"), "w1", "w2")
            .limit(min(64 * k + 16, 65552))
            .collect()
        )
        if not top:
            break
        selected = _bpe_select_disjoint(
            [(row.w1, row.w2, row.total) for row in top], k
        )
        state_col = F.col("state")
        for w1, w2, total in selected:
            merges.append((len(merges) + 1, w1, w2, total, rounds))
            # " w1  w2 " leaves the outer half of each boundary space in
            # place, so leftmost non-overlapping replace advances exactly
            # two symbols per match == canonical left-to-right greedy BPE.
            # Chained in rank order; selected pairs are symbol-disjoint
            # AND concat-excluded, so no replace creates or destroys
            # occurrences of another selection — counts stay exact.
            state_col = F.replace(
                state_col, F.lit(f" {w1}  {w2} "), F.lit(f" {w1}{w2} ")
            )
        vocab = vocab.withColumn(
            "state",
            state_col,
            # lazy: the next round's top-k collect (or the caller's final
            # action) materializes it — ONE job per round, not a job pair
        ).localCheckpoint(eager=False)
    # batch>1 additionally exposes the selection ROUND each merge came
    # from, so callers can audit the batched-selection invariants
    # (within-round rank order + symbol-disjointness) from the output
    # alone — the l41c self-validity column (VERDICT r15 directive 7).
    # batch=1 keeps the original 4-column schema: round == merge_idx
    # there, and the l41/l41b oracles replay that exact shape.
    if batch > 1:
        merges_df = spark.createDataFrame(
            merges,
            "merge_idx int, w1 string, w2 string, pair_count bigint, round int",
        )
    else:
        merges_df = spark.createDataFrame(
            [m[:4] for m in merges],
            "merge_idx int, w1 string, w2 string, pair_count bigint",
        )
    return (merges_df, vocab) if return_vocab else merges_df


def bpe_symbol_vocab(
    df: DataFrame, text_col: str = "text", n_merges: int = 6, batch: int = 1
) -> DataFrame:
    """The tokenizer's output side: train ``n_merges`` BPE merges, apply
    them, and return the resulting symbol vocabulary with corpus
    frequencies ``(sym, n)`` — what the trained tokenizer would actually
    emit over this corpus. Shares the trainer's vocab-sized state; the
    final explode is vocab-sized too, never corpus-sized."""
    _, vocab = bpe_merges(df, text_col, n_merges, return_vocab=True, batch=batch)
    return (
        vocab.select(
            F.explode(F.split(F.trim(F.col("state")), "  ")).alias("sym"), "cnt"
        )
        .groupBy("sym")
        .agg(F.sum("cnt").alias("n"))
    )


def hashed_embedding(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "he1",
) -> DataFrame:
    """Model-free document embedding by the feature-hashing trick: each
    token hashes to one of ``dim`` buckets; the doc's vector is its
    bucket-count histogram. Deterministic, engine-portable (md5), and a
    drop-in ``embedding`` column for the similarity stack — hashed
    vectors feed brute-force/LSH/IVF top-k unchanged, giving text
    retrieval with no model in the loop (the classic hashing-vectorizer
    baseline).

    Returns ``(doc_id, embedding array<double>)``. One explode + one
    (doc, bucket) agg + a zero-shuffle array assembly via pivot-free
    ``map_from_entries`` lookup. Counts are exact ints cast to double.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), F.col("tok"))), 1, 8),
            16,
            10,
        ).cast("long")
        % dim
    )
    counts = (
        toks.select(id_col, bucket.alias("b"))
        .groupBy(id_col, "b")
        .agg(F.count("*").alias("c"))
    )
    per_doc = counts.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("b"), F.col("c")))
        ).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at("_m", i.cast("long")), F.lit(0)).cast(
            "double"
        ),
    )
    return per_doc.select(id_col, vec.alias("embedding"))


def bpe_token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 6,
) -> DataFrame:
    """Per-document token counts under the TRAINED tokenizer — the token
    budgeting every packing/sharding stage actually needs (whitespace
    counts undercount rare words, which BPE splits into pieces).

    Trains ``n_merges`` BPE merges, derives each distinct word's piece
    count from its merged symbol state (vocab-sized), then one equi-join
    from the corpus's exploded words onto that mapping and a per-doc
    sum. Returns ``(doc_id, n_words, n_bpe_tokens)``.

    Scale: the segmentation map is vocab-sized (broadcastable for
    natural-language vocabularies); the corpus is touched once past
    training."""
    _, vocab = bpe_merges(df, text_col, n_merges, return_vocab=True)
    pieces = vocab.select(
        "w", F.size(F.split(F.trim(F.col("state")), "  ")).alias("n_pieces")
    )
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w"))
    return (
        toks.join(F.broadcast(pieces), "w")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_pieces").alias("n_bpe_tokens"),
        )
    )
