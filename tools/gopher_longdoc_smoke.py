"""Realistic-document-length throughput for the per-doc text kernels
(VERDICT r8 item 4).

The 2M-doc pipeline smoke exercises ~40-token docs; the Arrow kernels
behind ``gopher_repetition`` / ``quality_features`` are O(tokens) per
doc with Python Counter overhead proportional to DISTINCT grams, so a
100 TB extrapolation needs a throughput point at the length real web
documents have (~1-2k tokens). This smoke measures exactly that:

* corpus: ``n_docs`` docs of ``n_tokens`` Zipf-distributed tokens
  drawn from a 50k vocabulary — near-worst-case distinct-gram density
  (the Counter's cost ceiling), with 1% planted heavy-repetition docs
  so the flags demonstrably fire;
* generation is mapInPandas (numpy, seeded per doc) and is WRITTEN
  OUT first — the timed section is parquet scan -> kernel -> agg,
  nothing else;
* reported: wall, docs/s, tokens/s for the full 12-signal Gopher
  family and for quality_features.

Usage: python tools/gopher_longdoc_smoke.py [n_docs] [n_tokens]
       (defaults 200_000 2000)
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

VOCAB = 50_000
WORKDIR = os.environ.get("GOPHER_SMOKE_DIR", "/tmp/gopher_longdoc_smoke")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    spark = get_spark("gopher_longdoc_smoke", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    src = os.path.join(WORKDIR, f"docs_{n_docs}_{n_tokens}")
    if os.path.exists(src):
        shutil.rmtree(src)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for did in pdf["id"]:
                rng = np.random.default_rng(int(did))
                # Zipf-ish over the vocab: heavy head like real text,
                # long tail keeps most n-grams distinct
                idx = rng.zipf(1.3, size=n_tokens) % VOCAB
                toks = [f"w{i}" for i in idx]
                if did % 100 == 0:  # planted heavy repetition
                    phrase = toks[:10]
                    for p in range(10, n_tokens - 10, 40):
                        toks[p : p + 10] = phrase
                texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": pdf["id"], "text": texts})

    t0 = time.perf_counter()
    spark.range(n_docs).repartition(64).mapInPandas(
        gen, "doc_id long, text string"
    ).write.parquet(src)
    t_gen = time.perf_counter() - t0
    print(f"generate+write: {t_gen:.1f}s", flush=True)

    from melodist_spark.pipeline.text import gopher_repetition, quality_features

    docs = spark.read.parquet(src)
    total_tokens = n_docs * n_tokens

    t0 = time.perf_counter()
    gr = gopher_repetition(docs)
    agg = gr.agg(
        F.count("*").alias("n"),
        F.sum((F.col("dup_5gram_char_frac") > 0.10).cast("long")).alias(
            "rep_flagged"
        ),
        F.sum("top_2gram_char_frac").alias("chk"),
    ).first()
    dt = time.perf_counter() - t0
    print(
        f"gopher_repetition @ {n_tokens}-token docs: {dt:.1f}s — "
        f"{n_docs / dt:,.0f} docs/s, {total_tokens / dt / 1e6:.2f}M tokens/s "
        f"({agg['rep_flagged']} heavy-repetition docs flagged of "
        f"{n_docs // 100} planted)",
        flush=True,
    )

    t0 = time.perf_counter()
    qf = quality_features(docs)
    num_cols = [
        f.name
        for f in qf.schema.fields
        if f.dataType.typeName() in ("double", "float", "long", "integer")
        and f.name != "doc_id"
    ]
    qf.agg(
        F.count("*").alias("n"), *[F.sum(c).alias(c) for c in num_cols[:4]]
    ).first()
    dq = time.perf_counter() - t0
    print(
        f"quality_features  @ {n_tokens}-token docs: {dq:.1f}s — "
        f"{n_docs / dq:,.0f} docs/s, {total_tokens / dq / 1e6:.2f}M tokens/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
