"""Scale smoke for the distributed Bloom filter (pipeline/bloom.py):
build throughput over a blocklist-sized reference set, probe
throughput over a corpus-sized stream, and the head-to-head against
the exact broadcast join it replaces.

The claim under test is the 100 TB story: at reference sets beyond
~10^8 entries the exact 8-byte-hash set outgrows a comfortable
broadcast (8+ GB at 10^9), while the Bloom word table stays at ~9.6
bits/entry AND the probe stays a narrow k-broadcast-join pipeline
with zero shuffle of the probed side. This smoke measures both paths
at a size the box can hold, plus the guarantee boundary: zero false
negatives, measured FPR vs the configured target.

Usage: python tools/bloom_scale_smoke.py [n_ref] [n_probe] [fpr]
       (defaults 50_000_000 50_000_000 0.01)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from melodist_spark.session import get_spark


def main():
    n_ref = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    n_probe = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
    fpr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.01

    spark = get_spark(
        "bloom_scale_smoke",
        shuffle_partitions=64,
        extra_conf={"spark.cleaner.periodicGC.interval": "2min"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from melodist_spark.pipeline.bloom import (
        bloom_build,
        bloom_parameters,
        bloom_probe,
    )

    m, k = bloom_parameters(n_ref, fpr)
    print(
        f"n_ref={n_ref:,} fpr={fpr} -> m={m:,} bits "
        f"({m // 8 / 1e6:.0f} MB dense), k={k}",
        flush=True,
    )

    # reference values: spread ids so member/non-member sets are
    # disjoint by construction
    ref = spark.range(n_ref).select((F.col("id") * 2).alias("v"))

    t0 = time.perf_counter()
    bloom = bloom_build(ref, "v", m, k).persist()
    n_words = bloom.count()
    t1 = time.perf_counter()
    print(
        f"build: {t1 - t0:.1f}s ({n_ref / (t1 - t0):,.0f} entries/s; "
        f"{n_words:,} non-zero words = {n_words * 16 / 1e6:.0f} MB sparse)",
        flush=True,
    )

    # probe corpus: 10% members (even ids inside range), 90% odd ids
    probe = spark.range(n_probe).select(
        F.when(F.pmod("id", 10) == 0, F.pmod(F.col("id") * 7919, n_ref) * 2)
        .otherwise(F.col("id") * 2 + 1)
        .alias("v")
    )

    t2 = time.perf_counter()
    probed = bloom_probe(probe, "v", bloom, m, k)
    probed.write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()
    print(
        f"probe: {t3 - t2:.1f}s ({n_probe / (t3 - t2):,.0f} rows/s)",
        flush=True,
    )

    # guarantee boundary: members never miss; non-member hit rate ~ fpr
    stats = (
        probed.select(
            (F.pmod("v", 2) == 0).alias("is_member"), "bloom_maybe"
        )
        .groupBy("is_member")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("bloom_maybe").cast("long")).alias("maybe"),
        )
        .collect()
    )
    t4 = time.perf_counter()
    for r in sorted(stats, key=lambda r: not r["is_member"]):
        rate = r["maybe"] / r["n"]
        print(
            f"  {'members' if r['is_member'] else 'non-members'}: "
            f"{r['n']:,} rows, maybe-rate {rate:.4f}",
            flush=True,
        )
        if r["is_member"]:
            assert rate == 1.0, f"FALSE NEGATIVES: {rate}"
        else:
            assert rate < 5 * fpr, f"FPR blowout: {rate} vs target {fpr}"
    print(f"verify agg: {t4 - t3:.1f}s", flush=True)

    # head-to-head: exact broadcast membership join at the same size
    exact_ref = ref.select(F.col("v").alias("bv")).distinct()
    t5 = time.perf_counter()
    exact = probe.join(
        F.broadcast(exact_ref), probe["v"] == F.col("bv"), "left"
    ).select("v", F.col("bv").isNotNull().alias("member"))
    exact.write.format("noop").mode("overwrite").save()
    t6 = time.perf_counter()
    print(
        f"exact broadcast join ({n_ref * 8 / 1e6:.0f} MB of key bytes): "
        f"{t6 - t5:.1f}s ({n_probe / (t6 - t5):,.0f} rows/s)",
        flush=True,
    )
    print(f"TOTAL {t6 - t0:.1f}s", flush=True)
    bloom.unpersist()


if __name__ == "__main__":
    main()
