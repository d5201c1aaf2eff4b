"""Scale shape for weighted_mixture (round 10 — the op just moved
under the DuckDB oracle; this pins its throughput an order of
magnitude above the bench scale).

The claim to verify: the mixture is a union of filtered scans with
one narrow explode per source — NO exchange, no Python — so wall
time is scan-bound and scales linearly with INPUT+OUTPUT rows, and
the md5 fractional draw prices as one codegen hash per input row.

Three sources split by id % 3, weights 0.625/0.25/0.125, n_total =
2.3x the corpus → source A repeats ~4.4 epochs (multi-epoch fan-out),
B ~2.1, C ~0.8 (fractional only) — every draw shape at once, output
~2.3x input rows.

Usage: python tools/mixture_scale_smoke.py [n_docs ...]
       (defaults: 5_000_000 20_000_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from melodist_spark.pipeline.mixing import mixture_audit, weighted_mixture
from melodist_spark.session import get_spark


def run(spark, n_docs: int) -> None:
    docs = spark.range(n_docs, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        # a payload column so the fan-out moves real bytes, not just ids
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    g = F.pmod("doc_id", 3)
    srcs = {
        "a": docs.filter(g == 0),
        "b": docs.filter(g == 1),
        "c": docs.filter(g == 2),
    }
    # sizes from arithmetic (the catalog stand-in — no count at scale)
    base = n_docs // 3
    rem = n_docs % 3
    sizes = {"a": base + (1 if rem > 0 else 0),
             "b": base + (1 if rem > 1 else 0),
             "c": base}
    n_total = int(2.3 * n_docs)
    weights = {"a": 0.625, "b": 0.25, "c": 0.125}

    t0 = time.perf_counter()
    mix = weighted_mixture(srcs, weights, n_total=n_total, sizes=sizes, seed=0)
    mix.write.format("noop").mode("overwrite").save()
    t1 = time.perf_counter()

    plan = mix._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "mixture must stay shuffle-free"
    assert "EvalPython" not in plan and "MapInPandas" not in plan

    audit = {r["source"]: r for r in mixture_audit(mix).collect()}
    t2 = time.perf_counter()
    n_out = sum(r["n_docs"] for r in audit.values())
    print(f"n_docs={n_docs:,}  out={n_out:,} ({n_out / n_docs:.2f}x)  "
          f"mixture {t1 - t0:.1f}s = {(n_docs + n_out) / (t1 - t0) / 1e6:.1f}M "
          f"(in+out) rows/s   audit {t2 - t1:.1f}s")
    for s in sorted(audit):
        r = audit[s]
        tgt = weights[s] / 1.0 * n_total
        print(f"  {s}: n={r['n_docs']:,} target={tgt:,.0f} "
              f"({(r['n_docs'] - tgt) / tgt * 100:+.3f}%)  epochs={r['n_epochs']}")


def main():
    scales = [int(a) for a in sys.argv[1:]] or [5_000_000, 20_000_000]
    spark = get_spark("mixture_scale_smoke")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    for n in scales:
        run(spark, n)


if __name__ == "__main__":
    main()
