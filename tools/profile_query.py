"""Time one registry query's build/materialize split, N reps.

Usage: python tools/profile_query.py <query> [reps] [-- stage timing]

Replicates bench.py's warmup context (persisted met frames + minhash
signature/candidate tables, pre-forked python workers) so the numbers
are comparable to the bench rows, then reports per-rep build time
(DataFrame construction, which for driver-action-paced rows does real
work) and materialize time (noop sink) separately — bench's row number
is build+materialize.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from melodist_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("profile_query")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    (
        spark.range(32 * 4, numPartitions=32)
        .groupBy((F.col("id") % 32).alias("g"))
        .applyInPandas(lambda p: p[["id"]], "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    hourly = entry._met_hourly(spark, sf_dir).persist()
    hourly.write.format("noop").mode("overwrite").save()
    daily = entry._met_daily(spark, sf_dir).persist()
    daily.write.format("noop").mode("overwrite").save()
    from melodist_spark.pipeline.dedup import (
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signature,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = minhash_signature(docs, num_hashes=16, shingle=3).persist()
    sig.write.format("noop").mode("overwrite").save()
    lsh_candidate_pairs(
        lsh_bands(sig, num_hashes=16, band_size=4)
    ).persist().write.format("noop").mode("overwrite").save()

    fn = entry.queries()[name]
    spark.sparkContext.setJobDescription(f"profile: {name}")
    for i in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        print(
            f"rep {i}: build {t1 - t0:6.2f}s  materialize {t2 - t1:6.2f}s"
            f"  total {t2 - t0:6.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
