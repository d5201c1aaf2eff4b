"""Tokenizer family at scale: BPE vs Unigram-LM, train + encode
(round 10 — the sf corpora have a ~31-word synthetic vocabulary, so
the bench rows never price a realistic word table; this smoke does).

Corpus: generated DISTRIBUTED (no driver pandas) — n_docs documents
of n_tokens words drawn from a V-type power-law vocabulary via the
md5-uniform trick (rank = floor(V * u^3): rank 0 is ~1000x rank V).
Both trainers consume the same word-count reduction; both encoders
are one shuffle-free mapInPandas pass with per-worker word caches, so
the throughput number is the per-NEW-word cost amortized over Zipf
repetition — exactly the 100 TB shape, where the cache hit rate only
rises.

Usage: python tools/tokenizer_scale_smoke.py [n_docs] [n_tokens] [V]
       (defaults 200_000 100 30_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from melodist_spark.pipeline.bpe import bpe_tokenize, bpe_train, word_counts
from melodist_spark.pipeline.unigram import unigram_tokenize, unigram_train
from melodist_spark.session import get_spark


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    V = int(sys.argv[3]) if len(sys.argv) > 3 else 30_000

    spark = get_spark("tokenizer_scale_smoke")
    spark.sparkContext.setLogLevel("ERROR")
    # pre-fork the Arrow worker pool so the first encode pass doesn't
    # pay the one-off import cost (same exclusion as bench.py)
    spark.range(32 * 4, numPartitions=32).groupBy(
        (F.col("id") % 32).alias("g")
    ).applyInPandas(lambda p: p[["id"]], "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    # power-law word ranks from the md5 uniform (engine-portable trick
    # shared with sampling/mixing); words like 'wordNNNN'
    u = (
        F.conv(F.substring(F.md5(F.concat_ws("_", F.col("doc_id").cast("string"), F.col("i").cast("string"))), 1, 15), 16, 10)
        .cast("double") / F.lit(float(1 << 60))
    )
    docs = (
        spark.range(n_docs, numPartitions=64)
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.lit(n_tokens))).alias("i"),
        )
        .select(
            "doc_id",
            F.concat(
                F.lit("word"),
                F.floor(F.lit(V) * F.pow(u, F.lit(3.0))).cast("long").cast("string"),
            ).alias("w"),
        )
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
    ).persist()
    total_tokens = n_docs * n_tokens
    t0 = time.perf_counter()
    n_types = word_counts(docs, min_count=5).count()
    t1 = time.perf_counter()
    print(f"corpus: {n_docs:,} docs x {n_tokens} tokens = "
          f"{total_tokens/1e6:.0f}M tokens, {n_types:,} word types "
          f"(>=5 occurrences); gen+count {t1 - t0:.1f}s")

    t0 = time.perf_counter()
    merges = bpe_train(docs, num_merges=500, min_count=5)
    t1 = time.perf_counter()
    print(f"bpe_train (500 merges over {n_types:,} types): {t1 - t0:.1f}s")

    t0 = time.perf_counter()
    model = unigram_train(docs, vocab_size=1000, min_count=5,
                          seed_size=3000, max_piece_len=8)
    t1 = time.perf_counter()
    print(f"unigram_train (vocab 1000, seed 3000): {t1 - t0:.1f}s "
          f"({len(model)} pieces)")

    for name, out_col, build in (
        ("bpe_tokenize", "bpe_tokens", lambda: bpe_tokenize(docs, merges)),
        (
            "unigram_tokenize",
            "unigram_tokens",
            lambda: unigram_tokenize(docs, model),
        ),
    ):
        best = n_pieces = None
        for _ in range(2):
            t0 = time.perf_counter()
            n_pieces = build().select(
                F.sum(F.size(out_col)).alias("n")
            ).first()["n"]
            t = time.perf_counter() - t0
            best = t if best is None or t < best else best
        print(f"{name}: {best:.1f}s = {total_tokens / best / 1e6:.1f}M "
              f"tokens/s in, {n_pieces / total_tokens:.2f} pieces/token")


if __name__ == "__main__":
    main()
