"""Scale smoke for the training-data pipeline: N synthetic documents
(with planted duplicate groups and near-duplicates) generated
DISTRIBUTED, then the curation chain end-to-end — quality flags,
cleaning, exact dedup, MinHash LSH candidates, connected-component
clusters, stratified sample, vocabulary. Validates the shapes the
100 TB story depends on: narrow feature scans, map-side-combined gram
aggregates, equi-join (not quadratic) candidate generation, and
O(log n)-round clustering.

Usage: python tools/pipeline_scale_smoke.py [n_docs] (default 200000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from melodist_spark.session import get_spark


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    # A 40-minute multi-stage driver accumulates shuffle files from
    # every finished stage: ContextCleaner only deletes them after a
    # JVM GC collects the ShuffleDependency, and Spark forces that GC
    # just once per 30 min by default. At 18M docs the retained files
    # (LSH pair join + CC rounds) overflowed an 80 GB scratch disk in
    # the repeated_spans stage. 2 min bounds retention to a few
    # stages' worth — the same setting a long-running production
    # driver needs (spark.cleaner.periodicGC.interval).
    spark = get_spark(
        "pipeline_scale_smoke",
        shuffle_partitions=64,
        extra_conf={"spark.cleaner.periodicGC.interval": "2min"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    t_all = time.perf_counter()

    # -- distributed synthetic corpus -------------------------------------
    # ~40-token docs over a 5k-word vocab; every 20th doc is an exact
    # duplicate of its predecessor, every 50th a near-dup (one word
    # swapped) — planted structure the dedup chain must find.
    vocab = F.concat(F.lit("w"), F.pmod(F.xxhash64("pos", "seed"), F.lit(5000)))
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.pmod(F.col("id"), 20)).alias("theme"),
        F.pmod(F.col("id"), 5).cast("string").alias("lang"),
    )
    docs = (
        base.withColumn(
            "seed",
            F.when(F.pmod("doc_id", 20) == 1, F.col("doc_id") - 1)  # exact dup
            .when(F.pmod("doc_id", 50) == 2, F.col("doc_id") - 1)   # near dup
            .otherwise(F.col("doc_id")),
        )
        .withColumn("pos", F.explode(F.sequence(F.lit(0), F.lit(39))))
        .withColumn(
            "w",
            F.when(
                (F.pmod("doc_id", 50) == 2) & (F.col("pos") == 0),
                F.lit("swapped"),  # the near-dup's single changed word
            )
            # plant stopwords at fixed positions so the Gopher
            # stopword rule sees realistic English-like density
            .when(F.pmod("pos", 7) == 3, F.lit("the"))
            .when(F.pmod("pos", 11) == 6, F.lit("a"))
            .otherwise(vocab),
        )
        .groupBy("doc_id", "lang")
        # collect_list order follows row arrival, which AQE can vary
        # run-to-run; sorting by position makes the corpus (and thus
        # the LSH pair count) bit-deterministic across runs
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
            ).alias("text")
        )
        .persist()
    )
    n = docs.count()
    t0 = time.perf_counter()
    print(f"generate {n} docs: {t0 - t_all:.1f}s")

    from melodist_spark.pipeline.dedup import (
        duplicate_clusters,
        exact_duplicates,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signature,
    )
    from melodist_spark.pipeline.sampling import stratified_sample_n
    from melodist_spark.pipeline.text import clean_text, quality_flags, vocab_topk

    qf = quality_flags(docs, min_tokens=10)
    kept = qf.filter("keep").count()
    t1 = time.perf_counter()
    print(f"quality_flags: {t1 - t0:.1f}s ({kept} kept)")

    from melodist_spark.pipeline.text import gopher_repetition

    # full Gopher repetition family via the ARROW KERNEL: zero
    # exchange, scales like a scan. Two rejected shapes are recorded
    # in SCALE.md: explode->groupBy(doc, n, gram) measured 413 s here
    # (wide string keys shuffled 9x per token position, for a
    # per-document metric), and per-row array_sort/transform
    # expressions were killed at 11+ min (HOFs are CodegenFallback —
    # interpreted eval re-evaluates inlined children per lambda
    # element). The corpus's planted dups are cross-doc, so append a
    # per-doc-varying echo of the doc's own prefix (the registry
    # row's construction) to give the within-doc dup-coverage path
    # real work.
    echoed = docs.withColumn(
        "text",
        F.concat_ws(
            " ",
            F.col("text"),
            F.array_join(
                F.slice(
                    F.split(F.col("text"), " "),
                    1,
                    (F.col("doc_id") % 13).cast("int"),
                ),
                " ",
            ),
        ),
    )
    gr = gopher_repetition(echoed)
    n_rep = gr.filter(F.col("dup_5gram_char_frac") > 0).count()
    t1b = time.perf_counter()
    print(f"gopher_repetition: {t1b - t1:.1f}s ({n_rep} docs w/ dup 5-grams)")

    docs.select("doc_id", clean_text(F.col("text")).alias("c")).agg(
        F.sum(F.length("c"))
    ).collect()
    t2 = time.perf_counter()
    print(f"clean_text: {t2 - t1b:.1f}s")

    n_exact = exact_duplicates(docs).count()
    t3 = time.perf_counter()
    print(f"exact_duplicates: {t3 - t2:.1f}s ({n_exact} dup groups)")

    bands = lsh_bands(
        minhash_signature(docs, num_hashes=16, shingle=3),
        num_hashes=16,
        band_size=4,
    )
    # serialized storage: the candidate-pair table scales with corpus
    # DENSITY, not just size (532M pairs at 18M docs on this synthetic
    # vocab) — deserialized caching of that is tens of GB of row objects
    from pyspark import StorageLevel

    pairs = lsh_candidate_pairs(bands).persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = pairs.count()
    t4 = time.perf_counter()
    print(f"minhash LSH candidates: {t4 - t3:.1f}s ({n_pairs} pairs)")

    clusters = duplicate_clusters(pairs)
    n_clustered = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    t5 = time.perf_counter()
    print(
        f"duplicate_clusters: {t5 - t4:.1f}s "
        f"({n_clustered} docs in {n_clusters} clusters)"
    )

    from melodist_spark.pipeline.decontamination import decontaminate

    # every 997th doc stands in for an eval-suite document; the exact/
    # near dups planted above guarantee real contamination hits
    bench = docs.filter(F.pmod("doc_id", 997) == 0)
    n_contam = (
        decontaminate(
            docs.filter(F.pmod("doc_id", 997) != 0),
            bench,
            ngram=5,
            text_is_extracted=True,
        )
        .filter("contaminated")
        .count()
    )
    t5b = time.perf_counter()
    print(f"decontaminate: {t5b - t5:.1f}s ({n_contam} contaminated)")

    stratified_sample_n(docs, ["lang"], n=1000).count()
    t6 = time.perf_counter()
    print(f"stratified_sample_n: {t6 - t5b:.1f}s")

    vocab_topk(docs, k=50, by=["lang"]).count()
    t7 = time.perf_counter()
    print(f"vocab_topk: {t7 - t6:.1f}s")

    from melodist_spark.pipeline.dedup import line_dedup

    # 3-line docs (shared boilerplate header per theme) so the
    # line-level pass has real cross-document duplicates
    multiline = docs.withColumn(
        "text",
        F.concat_ws(
            "\n",
            F.concat(F.lit("boilerplate header for theme "),
                     F.pmod(F.col("doc_id"), 1000)),
            F.col("text"),
        ),
    )
    line_dedup(multiline).agg(F.sum(F.length("text_deduped"))).collect()
    t8 = time.perf_counter()
    print(f"line_dedup: {t8 - t7:.1f}s")

    from melodist_spark.pipeline.dedup import repeated_spans

    # the planted exact/near dups guarantee real repeated passages
    n_spans = repeated_spans(docs, span_tokens=20).count()
    t8b = time.perf_counter()
    print(f"repeated_spans: {t8b - t8:.1f}s ({n_spans} spans)")
    t8 = t8b

    from melodist_spark.pipeline.lm import lm_cross_entropy

    lm_cross_entropy(docs).agg(F.avg("perplexity")).collect()
    t9 = time.perf_counter()
    print(f"lm_cross_entropy (self-trained bigram LM): {t9 - t8:.1f}s")

    from melodist_spark.pipeline.lm import lm_cross_entropy_broadcast

    # the broadcast path's deployment: a PRETRAINED bounded model (5%
    # reference slice, pruned) scoring the full corpus map-side; the
    # self-trained corpus-sized model above is the relational join's
    # territory (measured: broadcast loses there — model collect
    # dominates when distinct bigrams ~ corpus/4)
    ref = docs.filter(F.col("doc_id") % 20 == 0)
    lm_cross_entropy_broadcast(docs, train_df=ref, min_count=2).agg(
        F.avg("perplexity")
    ).collect()
    t9b = time.perf_counter()
    print(
        f"lm_cross_entropy_broadcast (pretrained 5%-slice model, "
        f"map-side scoring, min_count=2): {t9b - t9:.1f}s"
    )
    t9 = t9b

    from melodist_spark.pipeline.packing import pack_sequences

    pack_sequences(docs, seq_len=2048).agg(
        F.max("seq_last"), F.sum("n_tokens")
    ).collect()
    t10 = time.perf_counter()
    print(f"pack_sequences: {t10 - t9:.1f}s")

    total = t10 - t_all
    print(
        f"TOTAL {total:.1f}s for {n} docs "
        f"({n / total:,.0f} docs/s end-to-end)"
    )


if __name__ == "__main__":
    main()
