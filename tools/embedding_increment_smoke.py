"""Incremental embedding near-dup at order-of-magnitude scale: a 2M
64-dim vector INDEX (the store, bucket precomputed) versus a 100k
BATCH of which half are noisy twins of indexed vectors — the
daily-ingest shape of `embedding_neardup_against`.

The point being measured: the increment is a TWO-TABLE bucket
equi-join (batch × index-collisions), so its cost scales with the
batch's bucket collisions, never with index², and the historical
corpus is touched only through the join — no self-comparison.

Usage: python tools/embedding_increment_smoke.py [n_index] [n_batch] [planes] [tables]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from melodist_spark.session import get_spark  # noqa: E402


def _vectors(spark, n, dim, id_offset=0, noise_tag=0, out_offset=0):
    """Deterministic vectors for ids ``id_offset .. id_offset+n-1``:
    component = h01(id, pos) + 0.05 * h01(id, pos, noise_tag), so two
    generations sharing an id but differing in ``noise_tag`` are
    noisy twins (cosine ~0.995) and disjoint id ranges are unrelated.
    ``out_offset`` relabels the OUTPUT ids without changing the
    vectors (a re-crawled doc gets a new doc id, same content)."""

    def h01(*cols):
        return (
            F.pmod(F.xxhash64(*cols), F.lit(20000)).cast("double") / 10000.0
            - 1.0
        )

    gen_id = (F.col("vec_id") + F.lit(id_offset)).cast("long")
    comp = h01(gen_id, F.col("pos")) + 0.05 * h01(
        gen_id, F.col("pos"), F.lit(noise_tag)
    )
    return (
        spark.range(n)
        .select(F.col("id").alias("vec_id"))
        .withColumn("pos", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))))
        .withColumn("v", comp.cast("float"))
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda x: x["v"],
            ).alias("embedding")
        )
        .withColumn("vec_id", F.col("vec_id") + F.lit(out_offset))
    )


def main():
    n_index = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    planes = int(sys.argv[3]) if len(sys.argv) > 3 else 14
    tables = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    dim = 64
    spark = get_spark("embedding_increment_smoke", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    from melodist_spark.pipeline.similarity import (
        embedding_index,
        embedding_neardup_against,
    )

    t_all = time.perf_counter()
    # the store: bucket precomputed once at ingest (embedding_index),
    # persisted — standing in for the bucket-bucketed parquet layout
    idx = embedding_index(
        _vectors(spark, n_index, dim), dim=dim, num_planes=planes,
        num_tables=tables,
    ).persist()
    idx.count()
    t0 = time.perf_counter()
    print(f"index {n_index} x {dim} (bucketed store): {t0 - t_all:.1f}s")

    # the batch: half noisy twins of indexed ids 0..half-1 (same
    # generation ids, different noise tag, re-crawl-style new doc
    # ids), half genuinely novel (disjoint generation id range)
    half = n_batch // 2
    batch = (
        _vectors(spark, half, dim, noise_tag=7, out_offset=10_000_000)
        .unionByName(
            _vectors(spark, n_batch - half, dim, id_offset=50_000_000,
                     out_offset=20_000_000)
        )
        .persist()
    )
    batch.count()
    t1 = time.perf_counter()
    print(f"batch {n_batch} ({half} planted twins): {t1 - t0:.1f}s")

    for kernel, arrow in (("expr", False), ("arrow", True)):
        t = time.perf_counter()
        surv = embedding_neardup_against(
            batch, idx, dim=dim, threshold=0.9, num_planes=planes,
            num_tables=tables, arrow=arrow,
        )
        n_surv = surv.count()
        dropped = n_batch - n_surv
        print(
            f"increment [{kernel}]: {time.perf_counter() - t:.1f}s — "
            f"{dropped} dropped of {n_batch} "
            f"(twin recall {dropped / half:.3f})"
        )
    print(f"TOTAL {time.perf_counter() - t_all:.1f}s")


if __name__ == "__main__":
    main()
