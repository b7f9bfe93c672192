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
    bounded by document length, independent of corpus size."""
    text = F.col(text_col)
    toks = tokens(text)
    n_tok = F.size(toks)
    n_grams = F.greatest(n_tok - F.lit(n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    top_tok_hits = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda w: F.size(F.filter(toks, lambda t: t == w)),
        )
    )
    return df.select(
        "*",
        n_grams.alias("n_ngrams"),
        (F.lit(1) - F.size(F.array_distinct(grams)) / n_grams).alias(
            "dup_ngram_ratio"
        ),
        (top_tok_hits / n_tok).alias("top_token_ratio"),
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
