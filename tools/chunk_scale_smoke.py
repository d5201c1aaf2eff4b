"""Scale smoke for document chunking (pipeline/text.py): fan-out rate
of the sequence/transform/explode window plan — the embedding
pipeline's first stage, whose only cost should be the intended
~len/stride row multiplication.

Usage: python tools/chunk_scale_smoke.py [n_docs] [doc_chars] [size] [overlap]
       (defaults 20_000_000 1500 512 64)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from melodist_spark.session import get_spark


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    doc_chars = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    overlap = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    spark = get_spark("chunk_scale_smoke", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    from melodist_spark.pipeline.text import chunk_chars

    filler = "the quick brown fox jumps over the lazy dog 0123456789 "
    reps = doc_chars // len(filler) + 1
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.substring(
            F.concat(F.lit(filler * reps), F.col("id")), 1, doc_chars
        ).alias("text"),
    )

    t0 = time.perf_counter()
    out = chunk_chars(docs, size=size, overlap=overlap)
    agg = out.agg(
        F.count("*").alias("n"), F.sum(F.length("chunk")).alias("chars")
    ).first()
    dt = time.perf_counter() - t0
    print(
        f"chunk {n_docs:,} docs x {doc_chars} chars "
        f"(size={size}, overlap={overlap}): {dt:.1f}s — "
        f"{agg['n']:,} chunks out ({n_docs / dt:,.0f} docs/s, "
        f"{agg['chars'] / dt / 1e9:.2f} GB chunk-chars/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
