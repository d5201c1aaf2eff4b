"""Text analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in column expressions (regex, split,
md5) — JVM-side, codegen-friendly, no Python workers — so a 100 TB
documents table is one scan with map-side-only work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic; deterministic and language-representative, not exhaustive
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "nicht", "mit", "ist", "ein"],
    "es": ["el", "la", "los", "que", "de", "y", "en", "un"],
    "fr": ["le", "la", "les", "et", "de", "un", "est", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(_tokens(text))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish proxy: count word pieces after splitting on
    whitespace and punctuation, plus one piece per 4 chars of long
    words (subword pressure)."""
    words = F.split(F.trim(text), r"[\s\p{Punct}]+")
    extra = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc
        + F.when(F.length(w) > 8, (F.length(w) / 4).cast("int")).otherwise(0),
    )
    return token_count(text) + extra


def char_class_counts(text: Column) -> dict[str, Column]:
    """Counts of uppercase / digit / punctuation characters via
    regexp_replace — one pass per class, all codegen."""
    return {
        "n_upper": F.length(text) - F.length(F.regexp_replace(text, r"[A-Z]", "")),
        "n_digit": F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", "")),
        "n_punct": F.length(text)
        - F.length(F.regexp_replace(text, r"[.,;:!?]", "")),
    }


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach length/punctuation/stopword quality features.

    Heuristics in the spirit of C4/Gopher quality filtering: doc
    length, mean word length, punctuation & digit ratios, stopword
    ratio against an English stoplist.

    The token array is materialized once into an intermediate column
    (a separate projection) so the regex split isn't re-evaluated per
    feature — the dominant cost on long documents.
    """
    t = F.col(text_col)
    counts = char_class_counts(t)
    stop_arr = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])

    staged = df.withColumn("__toks_l", _tokens(F.lower(t))).withColumn(
        "__ntok",
        F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(F.col("__toks_l"))),
    )
    ntok = F.col("__ntok")
    n_stop = F.size(
        F.filter(F.col("__toks_l"), lambda w: F.array_contains(stop_arr, w))
    )
    return (
        staged.withColumn("n_chars_m", F.length(t))
        .withColumn("n_tokens", ntok)
        .withColumn(
            "mean_word_len",
            F.when(ntok > 0, F.length(F.regexp_replace(t, r"\s+", "")) / ntok),
        )
        .withColumn("upper_ratio", counts["n_upper"] / F.length(t))
        .withColumn("digit_ratio", counts["n_digit"] / F.length(t))
        .withColumn("punct_ratio", counts["n_punct"] / F.length(t))
        .withColumn("stopword_ratio", F.when(ntok > 0, n_stop / ntok))
        .drop("__toks_l", "__ntok")
    )


def language_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword hit counts (language-ID heuristic)."""
    toks = _tokens(F.lower(text))
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[f"score_{lang}"] = F.size(
            F.filter(toks, lambda w: F.array_contains(arr, w))
        )
    return out


def detect_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax of language stopword scores with deterministic
    (alphabetical) tie-break; 'und' (undetermined) when no hits."""
    scores = language_scores(F.col(text_col))
    df = df.withColumns(scores)
    langs = sorted(LANG_STOPWORDS)
    pairs = F.array(
        *[F.struct(F.col(f"score_{l}").alias("s"), F.lit(l).alias("l")) for l in langs]
    )
    best = F.array_max(F.filter(pairs, lambda p: p["s"] > 0))
    # array_max on structs orders by (s, l); ties pick the
    # lexicographically largest lang — invert for a stable, documented
    # rule: highest score, then alphabetically last
    return df.withColumn("lang_pred", F.coalesce(best["l"], F.lit("und")))


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (word-shingle content signature)."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens(text))))
    return F.md5(canon)


def simhash16_from_hashes(hashes: Column) -> Column:
    """16-bit SimHash from a pre-computed array of md5 hex digests.

    Each token contributes ±1 to 16 bit positions via the parity of
    its hex digits (portable across engines — no engine-specific hash
    function); the sign of each accumulated position is the output bit.
    """
    odd = list("13579bdf")

    # closure factories keep the lambdas 2-arg (acc, elem) shaped
    bits = []
    for b in range(16):

        def make(pos: int):
            return F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(
                    F.substring(h, pos + 1, 1).isin(*odd), F.lit(1)
                ).otherwise(F.lit(-1)),
            )

        bits.append(F.when(make(b) > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bits[0]
    for c in bits[1:]:
        out = out + c
    return out


def simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    """Attach a 16-bit SimHash column.

    The per-token md5 array is materialized once in an intermediate
    projection (one md5 per token instead of 16).
    """
    staged = df.withColumn(
        "__h", F.transform(_tokens(F.col(text_col)), lambda w: F.md5(w))
    )
    return staged.withColumn(out_col, simhash16_from_hashes(F.col("__h"))).drop("__h")
