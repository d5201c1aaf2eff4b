"""Order-of-magnitude ANN smoke: 2M 64-dim vectors (distributed
generation, planted noisy-twin structure), comparing the three
similarity-search deployment shapes at the same recall target:

- brute force: exact cosine, full float scan (the baseline cost)
- PQ: full scan over 8-byte codes (32x compressed) with ADC LUTs
- IVF-PQ: cell-pruned scan over the codes (the billion-scale layout)

Usage: python tools/ann_scale_smoke.py [n_vectors]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from melodist_spark.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dim, m, ksub, cells = 64, 8, 256, 64
    spark = get_spark("ann_scale_smoke", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    t_all = time.perf_counter()
    # deterministic pseudo-random vectors around `cells` planted
    # cluster directions; vec i and i+n/2 are noisy twins
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
        # collect_list gives no position guarantee: sort by pos, strip
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

    from melodist_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_pq_topk,
        pq_encode,
        pq_topk,
        train_kmeans_centroids,
        train_pq_codebooks,
    )

    queries = vecs.filter(F.col("vec_id") < 8)

    exact = brute_force_topk(vecs, queries, k=1).toPandas()
    t1 = time.perf_counter()
    print(f"brute_force_topk (float scan): {t1 - t0:.1f}s")

    books = train_pq_codebooks(vecs, dim=dim, m=m, ksub=ksub)
    t2 = time.perf_counter()
    print(f"train_pq_codebooks (16k sample, {m}x{ksub}): {t2 - t1:.1f}s")

    enc = pq_encode(vecs, books).select("vec_id", "pq_code").persist()
    enc.count()
    t3 = time.perf_counter()
    print(f"pq_encode corpus ({m} B/vec): {t3 - t2:.1f}s")

    enc_j = vecs.join(enc, "vec_id")
    pq = pq_topk(enc_j, queries, books, k=1, code_col="pq_code").toPandas()
    t4 = time.perf_counter()
    print(f"pq_topk (code scan): {t4 - t3:.1f}s")

    cents = train_kmeans_centroids(vecs, k=cells, dim=dim)
    t5 = time.perf_counter()
    print(f"train_kmeans_centroids ({cells} cells): {t5 - t4:.1f}s")

    from melodist_spark.pipeline.similarity import ivf_assign

    assigned = (
        ivf_assign(vecs, cents)
        .join(enc, "vec_id")
        .select("vec_id", "embedding", "__cell", "pq_code")
        .persist()
    )
    assigned.count()
    t6 = time.perf_counter()
    print(f"ivf_assign corpus: {t6 - t5:.1f}s")

    ivfpq = ivf_pq_topk(
        assigned, queries, cents, books, k=1, n_probe=4,
        cell_col="__cell", code_col="pq_code",
    ).toPandas()
    t7 = time.perf_counter()
    print(f"ivf_pq_topk (n_probe=4 of {cells}): {t7 - t6:.1f}s")

    # hyperplane LSH with AND-OR tables (full-rank planes, round 10):
    # 16 planes bound per-bucket collisions at ~n/65k, 6 tables buy
    # the recall back — the fourth deployment shape
    from melodist_spark.pipeline.similarity import lsh_topk

    lsh = lsh_topk(
        vecs, queries, dim=dim, k=1, num_planes=16, num_tables=6
    ).toPandas()
    t8 = time.perf_counter()
    print(f"lsh_topk (16 planes x 6 tables): {t8 - t7:.1f}s")

    def recall(df):
        # over ALL 8 queries: one that returned no rank-1 row (empty
        # buckets in every table) counts as a miss, not a dropped
        # denominator
        g = df[df["rank"] == 1].set_index("query_id")["neighbor_id"]
        return sum(g.get(q, -1) == q + half for q in range(8)) / 8.0

    print(
        f"twin-recall@1: exact={recall(exact):.2f} pq={recall(pq):.2f} "
        f"ivf_pq={recall(ivfpq):.2f} lsh={recall(lsh):.2f}"
    )
    print(f"TOTAL {time.perf_counter() - t_all:.1f}s")


if __name__ == "__main__":
    main()
