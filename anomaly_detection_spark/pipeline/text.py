"""Text-analysis operators for training-data pipelines.

All built-in ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage-codegen'd) — no Python in the hot path. Token counting and
quality scoring run at full scan speed; at 100 TB these are
map-only (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword seeds for the n-gram language heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "und", "das", "ist"],
}


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / quality-proxy columns appended to ``df``.

    - ``measured_chars`` — character length
    - ``n_tokens`` — whitespace token count
    - ``avg_token_len`` — chars per token
    - ``punct_ratio`` — punctuation chars / total chars
    - ``stopword_ratio`` — English stopword fraction (quality proxy)
    """
    t = F.col(text_col)
    toks = F.split(t, " ")
    n_toks = F.size(toks)
    return (
        df.withColumn("measured_chars", F.length(t))
        .withColumn("n_tokens", n_toks)
        .withColumn(
            "avg_token_len",
            F.round(F.length(t).cast("double") / n_toks, 4),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                (F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("double")
                / F.length(t),
                4,
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.size(F.filter(toks, lambda w: F.lower(w).isin(*_LANG_MARKERS["en"])))
                .cast("double") / n_toks,
                4,
            ),
        )
    )


def token_count_bpe_ish(df: DataFrame, text_col: str = "text",
                        out_col: str = "n_bpe_tokens") -> DataFrame:
    """Approximate BPE token count: word-piece regex split (words,
    numbers, punctuation runs), ~the GPT-2 pre-tokenizer shape."""
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"), 0
    )
    return df.withColumn(out_col, F.size(pieces))


def language_id(df: DataFrame, text_col: str = "text",
                out_col: str = "lang_pred") -> DataFrame:
    """N-gram/stopword-vote language heuristic.

    Counts marker-word hits per language over the token array and
    takes the argmax ('und' = undetermined when no marker hits).
    Pure expressions: map over a literal marker table, no UDF.
    """
    toks = F.transform(F.split(F.col(text_col), r"\s+"), F.lower)
    scores = [
        F.struct(
            F.size(F.filter(toks, lambda w: w.isin(*markers))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in _LANG_MARKERS.items()
    ]
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col,
        F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("und")),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fingerprint") -> DataFrame:
    """64-bit document fingerprint (xxhash64 of normalized text) —
    rolling-hash analogue for cheap near-exact matching."""
    normalized = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn(out_col, F.xxhash64(F.trim(normalized)))
