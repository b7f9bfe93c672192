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
