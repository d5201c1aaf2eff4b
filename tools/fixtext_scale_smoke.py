"""Scale smoke for fix_text (pipeline/text.py): encoding-repair scan
rate on a mostly-clean corpus vs an all-mojibake one, and the
clean-row guard's effect — the claim under test is that the guard
makes repair cost proportional to the DIRTY fraction, not the corpus.

Usage: python tools/fixtext_scale_smoke.py [n_rows] [dirty_pct]
       (defaults 20_000_000 3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from melodist_spark.session import get_spark


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    dirty_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("fixtext_scale_smoke", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    from melodist_spark.pipeline.text import fix_text

    moji = "cafÃ© â€” itâ€™s"
    base = F.concat(
        F.lit("The quick brown fox jumps over the lazy dog number "),
        F.col("id"),
        F.lit(". Plain ASCII filler sentence for scan-rate realism."),
    )
    rows = spark.range(n_rows).select(
        F.when(
            F.pmod("id", 100) < dirty_pct, F.concat(base, F.lit(" " + moji))
        )
        .otherwise(base)
        .alias("text")
    )

    for tag, guard in (("guarded", True), ("unguarded", False)):
        t = time.perf_counter()
        out = rows.select(F.length(fix_text(F.col("text"), guard=guard)).alias("n"))
        out.agg(F.sum("n")).collect()
        dt = time.perf_counter() - t
        print(
            f"{tag} ({dirty_pct}% dirty): {dt:.1f}s "
            f"({n_rows / dt:,.0f} rows/s)",
            flush=True,
        )

    all_dirty = rows.select(F.concat(F.col("text"), F.lit(" " + moji)).alias("text"))
    t = time.perf_counter()
    all_dirty.select(
        F.length(fix_text(F.col("text"))).alias("n")
    ).agg(F.sum("n")).collect()
    dt = time.perf_counter() - t
    print(f"guarded (100% dirty): {dt:.1f}s ({n_rows / dt:,.0f} rows/s)", flush=True)


if __name__ == "__main__":
    main()
