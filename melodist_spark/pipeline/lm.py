"""N-gram language-model quality scoring (CCNet-style).

Production curation pipelines score every document against a reference
language model and drop (or down-weight) the high-perplexity tail —
the standard proxy for "not fluent prose" (gibberish, menus, code
dumps, wrong language). The full-scale version uses a pretrained
KenLM; the engine-native equivalent here is an additively-smoothed
bigram model trained with two aggregations and applied with one join,
which keeps the whole path relational:

- **train** (:func:`bigram_lm`): unigram and bigram counts over the
  reference corpus — both map-side-combinable ``groupBy().count()``
  passes over an exploded n-gram stream, so a token repeated a
  billion times costs one partial row per partition. ``min_count``
  prunes the long tail of the bigram table (the standard KenLM-style
  pruning) which bounds the model size shipped into the scoring join.
- **score** (:func:`lm_cross_entropy`): per-document cross-entropy
  H = mean over bigram instances of ``-ln P(w2|w1)`` with
  ``P(w2|w1) = (c(w1,w2) + a) / (c(w1) + a*V)`` (additive smoothing,
  vocabulary size V). Documents are reduced to DISTINCT bigrams with
  multiplicities before the model join, so the join input is bounded
  by per-doc vocabulary, not document length. Perplexity = exp(H).

The only wide operations are the two count aggregations and the
bigram equi-join; hot bigrams ("of the") are exactly the AQE
skew-join case. The vocabulary size is the single driver-side scalar
(the correct model/data boundary, as with the k-means centroids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"


def _token_array(text_col: str) -> F.Column:
    return F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)


def _bigram_stream(
    df: DataFrame, text_col: str, id_col: str | None
) -> DataFrame:
    """One row per bigram INSTANCE (positional); ``id_col=None``
    omits the id (training needs only the bigrams, so a reference
    corpus without document ids works)."""
    toks = _token_array(text_col)
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    exploded = F.explode(bigrams).alias("bigram")
    if id_col is None:
        return df.select(exploded)
    return df.select(F.col(id_col), exploded)


def bigram_lm(
    train_df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Train: returns ``(bigram_counts(bigram, c12), unigram_counts
    (w1, c1))``. ``min_count`` drops bigrams rarer than the threshold
    from the model (pruning; their probability falls back to the
    smoothed unseen mass). Only ``text_col`` is required of
    ``train_df`` — an external reference corpus needs no ids."""
    big = (
        _bigram_stream(train_df, text_col, None)
        .groupBy("bigram")
        .agg(F.count("*").alias("c12"))
    )
    if min_count > 1:
        big = big.filter(F.col("c12") >= min_count)
    uni = (
        train_df.select(F.explode(_token_array(text_col)).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    return big, uni


def lm_cross_entropy(
    df: DataFrame,
    train_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    min_count: int = 1,
) -> DataFrame:
    """Score ``df`` against a bigram LM trained on ``train_df``
    (default: ``df`` itself — self-perplexity, the repetition/fluency
    signal). Adds ``n_bigrams``, ``cross_entropy`` (nats/bigram) and
    ``perplexity``; documents with fewer than two tokens get nulls.
    """
    # distinct bigrams with multiplicity: join size is per-doc
    # vocabulary, not document length
    doc_bigrams = (
        _bigram_stream(df, text_col, id_col)
        .groupBy(id_col, "bigram")
        .agg(F.count("*").alias("k"))
        .withColumn("w1", F.split(F.col("bigram"), " ", 2)[0])
    )
    # NOTE (measured, 2M docs): deriving the model's bigram counts
    # from doc_bigrams ("reuse the shuffle") is a LOSS — the per-doc
    # table is nearly as wide as the instance stream, so regrouping it
    # by bigram shuffles ~78M rows, while re-tokenizing feeds a
    # map-side-combined count from a narrow in-place pass (48-52 s vs
    # 55-66 s interleaved A/B). Train always goes through bigram_lm.
    train = df if train_df is None else train_df
    big, uni = bigram_lm(train, text_col, min_count=min_count)
    # persist the (small, vocabulary-sized) unigram table: the V count
    # below and the scoring join both consume it — without the persist
    # each would re-run the full tokenize+count pass over the corpus
    uni = uni.persist()
    vocab_size = uni.count()  # driver scalar: the model boundary
    prob = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha)) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.lit(vocab_size)
    )
    scored = (
        doc_bigrams.join(big, "bigram", "left")
        .join(uni, "w1", "left")
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_bigrams"),
            (F.sum(F.col("k") * -F.log(prob)) / F.sum("k")).alias(
                "cross_entropy"
            ),
        )
        .withColumn("perplexity", F.exp("cross_entropy"))
    )
    return df.join(scored, id_col, "left")
