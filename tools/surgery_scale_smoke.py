"""Throughput for span-level surgical decontamination (round 9).

`remove_contaminated_spans` pays one Python md5 per token position —
by design the expensive, post-flagging path. This smoke prices it
two ways on a realistic corpus (docs of `n_tokens` Zipf tokens, 2%
carrying a planted benchmark quote):

* `surgery-everything`: the kernel over the WHOLE corpus (the naive
  composition a user might write);
* `flag-then-surgery`: `decontaminate_stateless` flags first (cheap
  np.isin kernel), surgery runs on the contaminated slice only —
  the documented intended shape.

Usage: python tools/surgery_scale_smoke.py [n_docs] [n_tokens]
       (defaults 100_000 300)
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from melodist_spark.session import get_spark

WORKDIR = os.environ.get("SURGERY_SMOKE_DIR", "/tmp/surgery_scale_smoke")
QUOTE = (
    "the quick brown fox jumps over the lazy dog while the band "
    "plays on and the crowd watches in silence tonight"
)  # 20 tokens: carries 13-grams


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    spark = get_spark("surgery_scale_smoke", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    src = os.path.join(WORKDIR, f"docs_{n_docs}_{n_tokens}")
    if os.path.exists(src):
        shutil.rmtree(src)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for did in pdf["id"]:
                rng = np.random.default_rng(int(did))
                toks = [
                    f"w{i}" for i in rng.zipf(1.3, size=n_tokens) % 50_000
                ]
                if did % 50 == 0:  # 2% carry the benchmark quote
                    mid = n_tokens // 2
                    toks = toks[:mid] + QUOTE.split() + toks[mid:]
                texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": pdf["id"], "text": texts})

    spark.range(n_docs).repartition(64).mapInPandas(
        gen, "doc_id long, text string"
    ).write.parquet(src)

    from melodist_spark.pipeline.decontamination import (
        benchmark_gram_array,
        decontaminate_stateless,
        remove_contaminated_spans,
    )

    bench = spark.createDataFrame([(0, QUOTE)], ["doc_id", "text"])
    grams = benchmark_gram_array(bench, ngram=13)
    docs = spark.read.parquet(src)
    total_tokens = n_docs * n_tokens

    t0 = time.perf_counter()
    everything = remove_contaminated_spans(docs, grams, ngram=13)
    agg = everything.agg(
        F.count("*"),
        F.sum("n_tokens_removed").alias("rm"),
        F.sum((F.col("n_tokens_removed") > 0).cast("long")).alias("n"),
    ).first()
    dt_all = time.perf_counter() - t0
    print(
        f"surgery-everything : {dt_all:6.1f}s — "
        f"{total_tokens / dt_all / 1e6:5.2f}M tokens/s "
        f"({agg['n']:,} docs cut, {agg['rm']:,} tokens removed)",
        flush=True,
    )

    t0 = time.perf_counter()
    flagged = decontaminate_stateless(
        docs, grams, ngram=13, keep_payload=True
    )
    dirty = flagged.filter("contaminated").select("doc_id", "text")
    clean = flagged.filter("NOT contaminated")
    cut = remove_contaminated_spans(dirty, grams, ngram=13)
    n_clean = clean.count()
    agg2 = cut.agg(
        F.count("*").alias("n"), F.sum("n_tokens_removed").alias("rm")
    ).first()
    dt_two = time.perf_counter() - t0
    print(
        f"flag-then-surgery  : {dt_two:6.1f}s — "
        f"{total_tokens / dt_two / 1e6:5.2f}M corpus tokens/s "
        f"({n_clean:,} pass untouched, {agg2['n']:,} cut, "
        f"{agg2['rm']:,} tokens removed)",
        flush=True,
    )


if __name__ == "__main__":
    main()
