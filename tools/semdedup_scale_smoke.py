"""SemDeDup at order-of-magnitude scale: n 64-dim vectors with
planted noisy twins (vec i and i+n/2), deduplicated with a
paper-shaped cell count, comparing the two within-cell cosine
kernels:

- expr: per-pair JVM HOF dot (zip_with + aggregate — the oracle
  shape the semantic_dedup registry row keeps)
- arrow: ONE batched numpy einsum per joined Arrow batch (the scale
  kernel; identical candidate set, values agree to 1e-12)

SemDeDup's cost is quadratic in cell size by construction (that is
the method: all pairs within a cluster) — the knob that prices it is
k. The smoke reports per-stage walls, the kernels' pair counts, and
twin-collapse recall (fraction of planted twin pairs whose higher id
lost its `keep`).

Usage: python tools/semdedup_scale_smoke.py [n_vectors] [cells]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from melodist_spark.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cells = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    dim = 64
    spark = get_spark("semdedup_scale_smoke", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    t_all = time.perf_counter()
    # same deterministic generator as ann_scale_smoke: vec i and
    # i+n/2 are noisy twins (cosine ~0.995 at this noise scale),
    # everything else is pseudo-random
    half = n // 2
    base_id = F.when(F.col("id") >= half, F.col("id") - half).otherwise(
        F.col("id")
    )

    def h01(*cols):  # deterministic uniform in [-1, 1)
        return (
            F.pmod(F.xxhash64(*cols), F.lit(20000)).cast("double") / 10000.0
            - 1.0
        )

    comp = h01(base_id.cast("long"), F.col("pos")) + 0.05 * h01(
        F.col("id"), F.col("pos"), F.lit(1)
    )
    vecs = (
        spark.range(n)
        .select(F.col("id").alias("vec_id"))
        .withColumn("pos", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))))
        .withColumn("id", F.col("vec_id"))
        .withColumn("v", comp.cast("float"))
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda x: x["v"],
            ).alias("embedding")
        )
        .persist()
    )
    vecs.count()
    t0 = time.perf_counter()
    print(f"generate {n} x {dim} vectors: {t0 - t_all:.1f}s")

    from melodist_spark.pipeline.dedup import duplicate_clusters
    from melodist_spark.pipeline.similarity import (
        _bucketed_cosine_pairs,
        ivf_assign,
        train_kmeans_centroids,
    )

    cents = train_kmeans_centroids(vecs, k=cells, dim=dim)
    t1 = time.perf_counter()
    print(f"train_kmeans_centroids ({cells} cells, 64k sample): {t1 - t0:.1f}s")

    b = (
        ivf_assign(vecs, cents)
        .select(
            F.col("vec_id").alias("__id"),
            F.col("embedding").alias("__v"),
            F.col("__cell").alias("__bucket"),
        )
        .persist()
    )
    stats = b.groupBy("__bucket").count().agg(
        F.count("*"), F.max("count"), F.avg("count")
    ).collect()[0]
    t2 = time.perf_counter()
    print(
        f"ivf_assign (Arrow matmul): {t2 - t1:.1f}s — "
        f"{stats[0]} occupied cells, max {stats[1]}, avg {stats[2]:.0f}"
    )

    counts = {}
    for kernel, arrow in (("expr", False), ("arrow", True)):
        t = time.perf_counter()
        pairs = _bucketed_cosine_pairs(b, threshold=0.9, max_bucket=4096,
                                       arrow=arrow)
        counts[kernel] = pairs.count()
        print(
            f"within-cell cosine pairs [{kernel}]: "
            f"{time.perf_counter() - t:.1f}s — {counts[kernel]} pairs >= 0.9"
        )
    assert counts["expr"] == counts["arrow"], counts

    # persist the pair graph so the CC stage prices CC, not a silent
    # third run of the candidate join
    pairs = _bucketed_cosine_pairs(b, threshold=0.9, max_bucket=4096,
                                   arrow=True).persist()
    pairs.count()
    t3 = time.perf_counter()
    labels = duplicate_clusters(pairs)
    n_lab = labels.count()
    t4 = time.perf_counter()
    print(f"duplicate_clusters: {t4 - t3:.1f}s — {n_lab} labeled nodes")

    # twin-collapse recall: planted twin (i, i+half) collapsed iff
    # i+half's cluster label is i's component (min id <= i)
    got = (
        labels.filter(F.col("id") >= half)
        .filter(F.col("cluster_id") < F.col("id"))
        .count()
    )
    print(f"twin-collapse recall: {got / half:.3f} ({got}/{half})")
    print(f"TOTAL {time.perf_counter() - t_all:.1f}s")


if __name__ == "__main__":
    main()
