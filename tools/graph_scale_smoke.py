"""Scale smoke for PageRank (pipeline/graph.py): per-iteration wall
on a web-host-shaped graph — power-law in-degree (everyone links to
the head), a dangling tail, edges >> nodes.

What the 100 TB story needs measured: (a) per-iteration cost is flat
(the lineage cut works — no iteration-k blowup), (b) prepartition
pays the edge shuffle once instead of per-iteration, (c) the skewed
in-degree hot key (the "google.com" node) is absorbed by partial
aggregation rather than melting one reducer.

Usage: python tools/graph_scale_smoke.py [n_nodes] [n_edges] [iters]
       (defaults 2_000_000 20_000_000 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from melodist_spark.session import get_spark


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(
        "graph_scale_smoke",
        shuffle_partitions=64,
        extra_conf={"spark.cleaner.periodicGC.interval": "2min"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from melodist_spark.pipeline.graph import pagerank

    # web-shaped: src uniform; dst follows an approximate power law
    # (xxhash64-uniform u in [0,1) -> floor(n * u^4) piles ~0.3% of
    # all edges on node 0 — the mega-hub). ~10% of node ids never
    # appear as src -> dangling tail.
    u = (
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1 << 30)).cast("double")
        / F.lit(float(1 << 30))
    )
    edges = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id", F.lit(0)), F.lit(int(n_nodes * 0.9))).alias("src"),
        F.floor(F.lit(float(n_nodes)) * F.pow(u, F.lit(4.0))).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))

    edges = edges.persist()
    n_e = edges.count()
    hub = edges.groupBy("dst").count().orderBy(F.desc("count")).first()
    print(
        f"graph: {n_e:,} edges over ~{n_nodes:,} nodes; "
        f"hottest in-degree node {hub['dst']} with {hub['count']:,} "
        f"({hub['count'] / n_e:.2%} of edges)",
        flush=True,
    )

    for pp in (False, True):
        t0 = time.perf_counter()
        pr = pagerank(edges, damping=0.85, n_iter=iters, prepartition=pp)
        top = pr.orderBy(F.desc("pagerank")).limit(3).collect()
        t1 = time.perf_counter()
        total = pr.agg(F.sum("pagerank")).first()[0]
        print(
            f"pagerank x{iters} (prepartition={pp}): {t1 - t0:.1f}s "
            f"({(t1 - t0) / iters:.1f}s/iter); mass={total:.6f}; "
            f"top={[(r['node'], round(r['pagerank'], 6)) for r in top]}",
            flush=True,
        )

    # round 13: driver-loss resume at scale. A reliable full run, then
    # the crash scenario — a run that dies halfway (its cuts +
    # manifests durable) resumed to the full budget. Ranks compared by
    # max |diff|: at this scale partial-sum order is not bitwise
    # deterministic across runs, so the bound is float round-off
    # (1e-12), not exact equality (which the unit test pins on a
    # single-partition graph).
    t0 = time.perf_counter()
    full = pagerank(
        edges, damping=0.85, n_iter=iters,
        checkpoint_dir="/tmp/graph_smoke_ck_full",
    ).persist()
    full.count()
    t1 = time.perf_counter()
    print(f"pagerank x{iters} reliable+manifests: {t1 - t0:.1f}s", flush=True)
    half = iters // 2
    pagerank(
        edges, damping=0.85, n_iter=half,
        checkpoint_dir="/tmp/graph_smoke_ck_crash",
    ).count()
    t2 = time.perf_counter()
    res = pagerank(
        edges, damping=0.85, n_iter=iters,
        checkpoint_dir="/tmp/graph_smoke_ck_crash", resume=True,
    ).persist()
    res.count()
    t3 = time.perf_counter()
    diff = (
        full.join(res.withColumnRenamed("pagerank", "pr2"), "node")
        .agg(F.max(F.abs(F.col("pagerank") - F.col("pr2"))))
        .first()[0]
    )
    print(
        f"resume: {half}-iter crash run {t2 - t1:.1f}s + resume-to-{iters} "
        f"{t3 - t2:.1f}s; max|rank diff| vs uninterrupted = {diff:.2e}",
        flush=True,
    )
    assert diff < 1e-12, diff
    full.unpersist()
    res.unpersist()
    edges.unpersist()


if __name__ == "__main__":
    main()
