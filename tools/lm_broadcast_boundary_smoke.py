"""Measure the LM broadcast-scoring boundary (round-6 VERDICT item 7).

`lm_cross_entropy_broadcast` documents a rule of thumb: the model
rides as sorted (uint64 key, float64 count) arrays at ~16 B/row per
worker — "100 M pruned bigrams ≈ 1.6 GB, fine; beyond ~1 G rows, fall
back to the relational join". SCALE.md pinned the 2M-doc corpus side;
this smoke pins the MODEL side by scoring a fixed corpus against
synthetic pre-trained models of increasing row counts (the model is
an upstream artifact in the KenLM-analog deployment, so constructing
it directly isolates exactly what the rule governs: can every worker
hold and probe an N-row sorted-array model).

The kernel is the real one piece for piece: Arrow-C tokenize
(_arrow_token_lists), golden-ratio key fold (_mix), vectorized
sorted-array lookup (_lookup_sorted) — same arithmetic as the
deployment path, same ~16 B/row broadcast representation.

Usage: python tools/lm_broadcast_boundary_smoke.py [n_docs] [rows...]
Defaults: 500k docs x ~40 tokens; model rows 10M, 50M, 100M.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from melodist_spark.session import get_spark  # noqa: E402


def synth_model(rows: int, seed: int) -> tuple:
    rng = np.random.default_rng(seed)
    keys = np.sort(rng.integers(0, 2**63, size=rows, dtype=np.uint64))
    counts = rng.integers(1, 100, size=rows).astype(np.float64)
    return keys, counts


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    sizes = [int(s) for s in sys.argv[2:]] or [10_000_000, 50_000_000, 100_000_000]

    spark = get_spark("lm_broadcast_boundary", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    from melodist_spark.pipeline.lm import (
        _arrow_token_lists,
        _lookup_sorted,
        _mix,
    )
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    # fixed corpus: n_docs x 40 pseudo-random tokens (1M-word vocab)
    docs = (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        .withColumn("pos", F.explode(F.sequence(F.lit(0), F.lit(39))))
        .withColumn(
            "tok",
            F.pmod(F.xxhash64("doc_id", "pos"), F.lit(1_000_000)).cast("string"),
        )
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("tok")).alias("text"))
        .persist()
    )
    docs.count()

    out_schema = StructType(
        [StructField("doc_id", LongType()), StructField("h", DoubleType())]
    )

    for rows in sizes:
        t0 = time.perf_counter()
        big = synth_model(rows, seed=11)
        uni = synth_model(max(rows // 10, 1), seed=13)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        bc = spark.sparkContext.broadcast((big, uni, 1_000_000))
        t_bcast = time.perf_counter() - t0

        def score(batches):
            import pandas as pd

            (big_t, uni_t, v) = bc.value
            for pdf in batches:
                lists = _arrow_token_lists(pdf["text"])
                flat = lists.flatten().to_numpy(zero_copy_only=False)
                lens = lists.value_lengths().to_numpy(zero_copy_only=False)
                lens = np.nan_to_num(lens.astype(np.float64), 0.0).astype(np.int64)
                th = pd.util.hash_array(flat)
                ends = np.cumsum(lens)
                doc_of = np.repeat(np.arange(len(pdf)), lens)
                pos = np.arange(len(flat))
                starts = np.flatnonzero(pos + 1 < ends[doc_of])
                gram = _mix(th[starts], th[starts + 1])
                c12 = _lookup_sorted(gram, big_t)
                c1 = _lookup_sorted(th[starts], uni_t)
                nll = -np.log((c12 + 0.4) / (c1 + 0.4 * v))
                nb = np.maximum(lens - 1, 0)
                offs = np.concatenate([[0], np.cumsum(nb)])
                sums = np.add.reduceat(
                    np.concatenate([nll, [0.0]]), offs[:-1]
                )
                h = np.where(nb > 0, sums / np.maximum(nb, 1), np.nan)
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "h": h})

        t0 = time.perf_counter()
        got = (
            docs.mapInPandas(score, out_schema)
            .agg(F.avg("h"))
            .collect()[0][0]
        )
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        docs.mapInPandas(score, out_schema).agg(F.avg("h")).collect()
        t2 = time.perf_counter() - t0
        gb = rows * 16 / 1e9
        print(
            f"model {rows/1e6:.0f}M rows (~{gb:.1f} GB/worker): build {t_build:.1f}s, "
            f"broadcast {t_bcast:.1f}s, score-pass1 {t1:.1f}s, "
            f"score-pass2(warm) {t2:.1f}s, mean_h={got:.3f}"
        )
        bc.destroy()


if __name__ == "__main__":
    main()
