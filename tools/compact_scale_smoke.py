"""State-log compaction at a many-batch scale: a SpanIncrementSink
delta log with N_SLOTS real `gram_index` deltas (the layout a long
availableNow loop leaves behind — one parquet slot per micro-batch),
then `compact()` folds everything but the newest slot into the base.

Measured: the rule-1 merge-on-read wall (full groupBy-sum over the
log, the read every single batch pays) before vs after compaction,
the compaction wall itself, the directory/file counts, and a
totals-preserved check (sum of saturated counts and distinct grams
identical across the fold).

Usage: python tools/compact_scale_smoke.py [n_slots] [docs_per_slot]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from melodist_spark.session import get_spark  # noqa: E402
from melodist_spark.streaming.increments import (  # noqa: E402
    SpanIncrementSink,
    _fs_list_slots,
)


def _docs(spark, n, tokens, slot):
    """n docs of `tokens` words each; ~20% of the vocabulary is shared
    across slots (so compaction genuinely re-aggregates summed counts
    for cross-batch repeated grams), the rest slot-local."""
    word = F.when(
        F.pmod(F.xxhash64("doc_id", "pos"), F.lit(5)) == 0,
        F.concat(F.lit("shared"), F.pmod(F.xxhash64("pos"), F.lit(500))),
    ).otherwise(
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64("doc_id", "pos", F.lit(slot)), F.lit(100000)),
        )
    )
    return (
        spark.range(n)
        .select((F.col("id") + slot * n).alias("doc_id"))
        .withColumn("pos", F.explode(F.sequence(F.lit(0), F.lit(tokens - 1))))
        .withColumn("w", word)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("text")
        )
    )


def _tree_files(root):
    n = 0
    for _, _, files in os.walk(root):
        n += len(files)
    return n


def main():
    n_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    docs_per_slot = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    spark = get_spark(app_name="compact_scale_smoke")
    import tempfile

    root = tempfile.mkdtemp(prefix="compact_smoke_")
    sink = SpanIncrementSink(
        f"{root}/state", f"{root}/out", span_tokens=8, max_count=10
    )

    t0 = time.time()
    sink.init(_docs(spark, 1, 40, 0).limit(0))
    for k in range(n_slots):
        sink._delta(_docs(spark, docs_per_slot, 100, k)).coalesce(
            1
        ).write.mode("overwrite").parquet(sink._state_slot(k))
    t_build = time.time() - t0
    print(
        f"built {n_slots} slots x {docs_per_slot} docs "
        f"in {t_build:.1f}s ({_tree_files(root + '/state')} files)"
    )

    def read_wall():
        t = time.time()
        row = sink.state_as_of(spark).agg(
            F.sum("c").alias("s"), F.count("*").alias("n")
        ).collect()[0]
        return time.time() - t, (row["s"], row["n"])

    w1, tot1 = read_wall()
    w1b, _ = read_wall()
    print(f"merge-on-read over {n_slots + 1} slots: {w1:.2f}s / {w1b:.2f}s "
          f"(sum={tot1[0]}, grams={tot1[1]})")

    t0 = time.time()
    sink.compact(spark)
    t_compact = time.time() - t0
    slots = _fs_list_slots(spark, sink.state_path)
    files = _tree_files(root + "/state")
    w2, tot2 = read_wall()
    w2b, _ = read_wall()
    print(f"compact(): {t_compact:.2f}s -> slots {slots}, {files} files")
    print(f"merge-on-read compacted: {w2:.2f}s / {w2b:.2f}s "
          f"(sum={tot2[0]}, grams={tot2[1]})")
    assert tot1 == tot2, (tot1, tot2)
    print("totals preserved: OK")

    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
