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

:func:`pmi_collocations` reuses the same n-gram streams for corpus
statistics: the top collocations (bigrams whose joint frequency beats
the independence prediction) — the standard phrase-mining /
tokenizer-diagnostics signal over a training corpus.
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


def _py_tokens(text: str | None) -> list[str]:
    """Python mirror of :func:`_token_array` (trim → lower →
    split on ``\\s+``), byte-for-byte parity on the operations Spark
    performs JVM-side:

    - Spark ``trim`` strips 0x20 (space) only → ``str.strip(' ')``;
    - Java regex ``\\s`` is the ASCII class ``[ \\t\\n\\x0B\\f\\r]``
      → Python ``re.ASCII`` gives the identical set;
    - Java ``split`` with limit -1 keeps leading/trailing empty
      fields, as does :func:`re.split`.

    ``lower()`` parity holds for ASCII (and the common Unicode simple
    case mappings); locale-dependent full case mappings are the one
    documented divergence from JVM ``lower``.
    """
    import re

    if text is None:
        return []
    return re.split(r"\s+", text.strip(" ").lower(), flags=re.ASCII)


def lm_cross_entropy_broadcast(
    df: DataFrame,
    train_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    min_count: int = 1,
) -> DataFrame:
    """Same scores as :func:`lm_cross_entropy`, but with the model
    BROADCAST and scoring fully map-side: the corpus is scanned once
    and never shuffled.

    This is the 100 TB shape whenever the pruned model fits executor
    memory (a ``min_count``-pruned bigram table over a bounded
    vocabulary — the KenLM-analog deployment): training is still the
    two map-side-combined count aggregations, but instead of joining
    a corpus-sized per-doc bigram table against the model (one wide
    shuffle of ~tokens rows + a groupBy(doc) re-aggregation), the
    model ships to the workers once as a broadcast dict and every
    document is scored inside one ``mapInPandas`` pass — zero wide
    operations over the corpus. Rule of thumb: model rows × ~60 B
    must fit comfortably per executor (100 M pruned bigrams ≈ 6 GB —
    beyond that, fall back to the relational join, which AQE
    skew-handles).

    The driver round-trip is the pruned model (the model/data
    boundary, same as the k-means centroids); tokenization parity
    with the JVM path is pinned by ``_py_tokens`` and the
    path-equivalence test.
    """
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark = df.sparkSession
    train = df if train_df is None else train_df
    big, uni = bigram_lm(train, text_col, min_count=min_count)
    big_pdf = big.toPandas()
    uni_pdf = uni.toPandas()
    vocab_size = len(uni_pdf)
    big_map = dict(zip(big_pdf["bigram"], big_pdf["c12"].astype("int64")))
    uni_map = dict(zip(uni_pdf["w1"], uni_pdf["c1"].astype("int64")))
    bc = spark.sparkContext.broadcast((big_map, uni_map, vocab_size))
    a = float(alpha)

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("n_bigrams", LongType()),
            StructField("cross_entropy", DoubleType()),
            StructField("perplexity", DoubleType()),
        ]
    )

    def score(batches):
        import numpy as np
        import pandas as pd

        big_m, uni_m, v = bc.value
        av = float(a)
        denom_unseen = av * v
        for pdf in batches:
            n = len(pdf)
            n_big = np.zeros(n, dtype=np.float64)
            h = np.full(n, np.nan)
            bigrams: list[str] = []
            w1s: list[str] = []
            offsets = np.zeros(n + 1, dtype=np.int64)
            for i, text in enumerate(pdf[text_col]):
                toks = _py_tokens(text)
                for j in range(len(toks) - 1):
                    w1s.append(toks[j])
                    bigrams.append(toks[j] + " " + toks[j + 1])
                offsets[i + 1] = len(bigrams)
            if bigrams:
                c12 = (
                    pd.Series(bigrams).map(big_m).fillna(0.0).to_numpy(np.float64)
                )
                c1 = pd.Series(w1s).map(uni_m).fillna(0.0).to_numpy(np.float64)
                nll = -np.log((c12 + av) / (c1 + denom_unseen))
                sums = np.add.reduceat(
                    np.concatenate([nll, [0.0]]), offsets[:-1]
                )
                counts = np.diff(offsets)
                has = counts > 0
                # reduceat quirk: offsets[i] == offsets[i+1] yields the
                # element AT the offset, not 0 — mask those rows out
                n_big[has] = counts[has]
                h[has] = sums[has] / counts[has]
            res = pdf.copy()
            res["n_bigrams"] = pd.array(
                np.where(n_big > 0, n_big, np.nan), dtype="Int64"
            )
            # nullable Float64 so no-bigram rows surface as NULL (join
            # semantics of the relational path), not NaN
            res["cross_entropy"] = pd.array(h, dtype="Float64")
            res["perplexity"] = pd.array(np.exp(h), dtype="Float64")
            yield res

    return df.mapInPandas(score, out_schema)


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top-``top_k`` collocations by pointwise mutual information.

    PMI(w1, w2) = ln( P(w1,w2) / (P(w1) * P(w2)) ) with
    P(w1,w2) = c12 / N_bigrams and P(w) = c / N_unigrams — the
    standard phrase-mining statistic over a training corpus (which
    multiword units should the tokenizer keep together; which
    boilerplate n-grams dominate the crawl).

    Scale shape: one bigram count and one unigram count, both
    map-side-combined aggregations over narrow exploded streams (the
    same cost class as :func:`bigram_lm` training). The unigram table
    is vocabulary-bounded, so both probability joins are broadcast;
    the corpus-sized stream is never shuffled by anything wider than
    the two count aggregations. ``min_count`` is applied to c12
    before the joins (rare-pair PMI is noise AND pruning bounds the
    sort input); the final top-k is a sink-side
    ``ORDER BY pmi DESC LIMIT k`` with a deterministic
    (w1, w2) tie-break. Totals N_bigrams / N_unigrams ride along as
    1-row aggregates cross-joined in (broadcast, no driver action).
    """
    toks = df.select(_token_array(text_col).alias("w"))
    uni = (
        toks.select(F.explode("w").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    big = (
        _bigram_stream(df, text_col, None)
        .groupBy("bigram")
        .agg(F.count("*").alias("c12"))
    )
    totals = big.agg(
        F.sum("c12").alias("n_big")
    ).crossJoin(uni.agg(F.sum("c1").alias("n_uni")))
    pruned = big.filter(F.col("c12") >= min_count).select(
        F.split(F.col("bigram"), " ", 2)[0].alias("w1"),
        F.split(F.col("bigram"), " ", 2)[1].alias("w2"),
        "c12",
    )
    uni2 = uni.select(F.col("w1").alias("w2"), F.col("c1").alias("c2"))
    pmi = F.log(
        (F.col("c12") / F.col("n_big"))
        / ((F.col("c1") / F.col("n_uni")) * (F.col("c2") / F.col("n_uni")))
    )
    return (
        pruned.join(F.broadcast(uni), "w1")
        .join(F.broadcast(uni2), "w2")
        .join(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(top_k)
    )
