"""Text analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting. All expressed as JVM SQL expressions
(whole-stage codegen; no Python in the row loop) with exact DuckDB-oracle
equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# a tiny function-word list for the language-ID heuristic
EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"]
WORD_RE = "[^a-z0-9]+"


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document features: n_words, n_chars, avg_word_len,
    stopword_ratio, distinct_ratio (type-token), quality_score."""
    words = F.filter(F.split(F.lower(F.col(text_col)), WORD_RE), lambda w: w != "")
    nw = F.size(words)
    distinct_w = F.size(F.array_distinct(words))
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(*[F.lit(s) for s in EN_STOPWORDS]))
    )
    word_chars = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
    out = (
        df.withColumn("n_words", nw)
        .withColumn("n_chars_text", F.length(text_col))
        # exact integer features: hash-stable inputs for corpus-level ratios
        # (sums of longs are order-independent; avg() of doubles is not)
        .withColumn("word_chars", word_chars.cast("long"))
        .withColumn("n_distinct_words", distinct_w.cast("long"))
        .withColumn(
            "avg_word_len",
            F.round(
                F.aggregate(words, F.lit(0.0), lambda a, w: a + F.length(w))
                / F.greatest(nw, F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(stop_hits / F.greatest(nw, F.lit(1)).cast("double"), 6),
        )
        .withColumn(
            "distinct_ratio",
            F.round(distinct_w / F.greatest(nw, F.lit(1)).cast("double"), 6),
        )
    )
    # simple composite quality heuristic: long enough, lexically diverse
    return out.withColumn(
        "quality_score",
        F.round(
            F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0)) * 0.5
            + F.col("distinct_ratio") * 0.5,
            6,
        ),
    )


def predicted_lang(df: DataFrame, text_col: str = "text", threshold: float = 0.03) -> DataFrame:
    """Heuristic language ID: 'en' if the function-word hit ratio exceeds the
    threshold, else 'other' (n-gram-free but deterministic and oracle-able)."""
    feats = with_text_features(df, text_col)
    return feats.withColumn(
        "predicted_lang",
        F.when(F.col("stopword_ratio") >= threshold, F.lit("en")).otherwise(F.lit("other")),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint: md5 over the sorted distinct word
    set — robust to word order / duplication, shared with the SQL oracle."""
    words = F.filter(F.split(F.lower(F.col(text_col)), WORD_RE), lambda w: w != "")
    normalized = F.concat_ws(" ", F.array_sort(F.array_distinct(words)))
    return df.withColumn("fingerprint", F.md5(normalized))


def bpe_ish_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Approximate BPE token count: words + punctuation runs + digit runs
    (regexp-based; the standard 'tokens ~ 4/3 words' style estimator)."""
    n_words = F.size(
        F.filter(F.split(F.lower(F.col(text_col)), WORD_RE), lambda w: w != "")
    )
    n_punct = F.size(
        F.filter(F.split(F.col(text_col), "[a-zA-Z0-9\\s]+"), lambda w: w != "")
    )
    return df.withColumn("approx_tokens", (n_words + n_punct).cast("long"))
