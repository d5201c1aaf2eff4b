"""Mergeable corpus profiling (pipeline/profile.py + the streaming
ProfileIncrementSink): exactness at sub-capacity cardinalities,
merge-equals-whole, theta set algebra, the parameter-stamp guard, and
the sink's replay/compaction lifecycle."""

import pytest
from pyspark.sql import functions as F

from melodist_spark.pipeline.profile import (
    corpus_profile_state,
    merge_profile_states,
    profile_estimates,
    snapshot_overlap,
    stamp_profile_state,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def _corpus(spark, n=120, langs=("en", "de")):
    # n docs, every third a duplicate of doc i-1, two language groups
    rows = []
    for i in range(n):
        base = i - 1 if (i % 3 == 2) else i
        rows.append((i, f"doc body number {base} " + "x" * (base % 17), langs[i % 2]))
    return _docs(spark, rows)


def test_corpus_profile_exact_and_estimates(spark):
    docs = _corpus(spark)
    state = corpus_profile_state(docs, group_by=["lang"])
    est = profile_estimates(state).collect()
    exact = {
        (r["lang"]): r
        for r in docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
            F.countDistinct("text").alias("nd"),
        )
        .collect()
    }
    assert len(est) == 2
    for r in est:
        want = exact[r["lang"]]
        assert r["n_docs"] == want["n_docs"]
        assert r["n_chars"] == want["n_chars"]
        # sub-capacity cardinality: the HLL estimate is exact
        assert r["distinct_est"] == want["nd"]
        assert r["dup_ratio_est"] == round(1 - want["nd"] / want["n_docs"], 4)
        assert r["len_p50"] is not None and r["len_p99"] >= r["len_p50"]

    # whole-frame profile: empty group_by yields one row
    whole = profile_estimates(corpus_profile_state(docs)).collect()
    assert len(whole) == 1
    assert whole[0]["n_docs"] == 120


def test_profile_merge_equals_whole(spark):
    """The 100-TB contract: profiling shards and merging the sketch
    states must equal profiling the whole corpus — HLL unions are
    register-wise max and theta keeps hash sets, so at any
    cardinality merged==whole for those; counters sum exactly; KLL
    below capacity is exact too."""
    docs = _corpus(spark, n=200)
    whole = profile_estimates(
        corpus_profile_state(docs, group_by=["lang"])
    ).collect()

    shards = [
        corpus_profile_state(
            docs.filter(F.col("doc_id") % 4 == k), group_by=["lang"]
        )
        for k in range(4)
    ]
    u = shards[0]
    for s in shards[1:]:
        u = u.unionByName(s)
    merged = profile_estimates(
        merge_profile_states(u, group_by=["lang"])
    ).collect()

    key = lambda rows: {r["lang"]: r for r in rows}  # noqa: E731
    w, m = key(whole), key(merged)
    assert set(w) == set(m)
    for lang in w:
        for col in ("n_docs", "n_chars", "distinct_est", "len_p50", "len_p99"):
            assert m[lang][col] == w[lang][col], (lang, col)


def test_snapshot_overlap_exact_at_small_cardinality(spark):
    """Theta set algebra across two snapshots: planted overlap of 30
    docs, 20 new in B — exact below sketch capacity, no corpus join."""
    a_rows = [(i, f"shared {i}" if i < 30 else f"only-a {i}", "en") for i in range(80)]
    b_rows = [(1000 + i, f"shared {i}", "en") for i in range(30)] + [
        (2000 + i, f"fresh {i}", "en") for i in range(20)
    ]
    sa = corpus_profile_state(_docs(spark, a_rows), group_by=["lang"])
    sb = corpus_profile_state(_docs(spark, b_rows), group_by=["lang"])
    row = snapshot_overlap(sa, sb, group_by=["lang"]).collect()[0]
    assert row["overlap_est"] == 30.0
    assert row["new_in_b_est"] == 20.0
    assert row["union_est"] == 100.0  # 80 + 20 new
    assert row["jaccard_est"] == round(30 / 100, 6)


def test_profile_meta_guard(spark, tmp_path):
    docs = _corpus(spark, n=30)
    state = corpus_profile_state(docs, group_by=["lang"])

    # mismatched parameters refuse to merge
    with pytest.raises(ValueError, match="lg_k"):
        merge_profile_states(state, group_by=["lang"], lg_k=11)

    # schema rebuilt without metadata refuses, stamp_* re-asserts
    bare = spark.createDataFrame(state.collect(), state.schema)
    from pyspark.sql.types import StructType, StructField

    stripped = spark.createDataFrame(
        bare.rdd,
        StructType([StructField(f.name, f.dataType) for f in state.schema]),
    )
    with pytest.raises(ValueError, match="no profile metadata"):
        merge_profile_states(stripped, group_by=["lang"])
    ok = merge_profile_states(
        stamp_profile_state(stripped), group_by=["lang"]
    )
    assert ok.count() == 2

    # parquet round-trip preserves the stamp
    p = str(tmp_path / "state")
    state.write.mode("overwrite").parquet(p)
    assert (
        merge_profile_states(
            spark.read.parquet(p), group_by=["lang"]
        ).count()
        == 2
    )


def test_hll_estimate_error_bound(spark):
    """Past sketch capacity the estimate is approximate: lg_k=12 HLL
    has ~1.6% RSE — assert a generous 5% band at 40k distinct."""
    docs = spark.range(40_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique body "), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
    )
    est = profile_estimates(corpus_profile_state(docs)).collect()[0]
    assert abs(est["distinct_est"] - 40_000) / 40_000 < 0.05


def test_profile_increment_sink_lifecycle(spark, tmp_path):
    """ProfileIncrementSink: per-batch time series in the output log,
    cumulative state equal to a from-scratch profile of everything
    ingested, replay idempotence, and compaction preserving the fold."""
    from melodist_spark.streaming.increments import ProfileIncrementSink

    all_rows = [
        (i, f"body {i % 40} " + "y" * (i % 7), ["en", "de"][i % 2])
        for i in range(90)
    ]
    b1, b2, b3 = all_rows[:30], all_rows[30:60], all_rows[60:]

    sink = ProfileIncrementSink(
        str(tmp_path / "p_state"), str(tmp_path / "p_out"),
        group_by=["lang"],
    )
    sink.init(_docs(spark, b1).limit(0))
    for bid, rows in enumerate((b1, b2, b3)):
        sink(_docs(spark, rows), bid)

    def est_rows(df):
        return sorted(
            tuple(r) for r in profile_estimates(df).collect()
        )

    want = est_rows(
        corpus_profile_state(_docs(spark, all_rows), group_by=["lang"])
    )
    assert est_rows(sink.state_as_of(spark)) == want

    # per-batch provenance: one profile row per (lang, batch)
    out = sink.output(spark)
    assert out.groupBy("delta_batch").count().count() == 3
    b2_est = profile_estimates(
        out.filter(F.col("delta_batch") == 1).drop("delta_batch")
    ).collect()
    assert sum(r["n_docs"] for r in b2_est) == 30

    # replay of the last batch is a no-op (batch-id-keyed overwrite)
    sink(_docs(spark, b3), 2)
    assert est_rows(sink.state_as_of(spark)) == want

    # compaction folds slots, preserves the cumulative profile
    import os

    def n_slots():
        return len(
            [
                d
                for d in os.listdir(tmp_path / "p_state")
                if d.startswith("delta_batch=")
            ]
        )

    assert n_slots() == 4  # base + 3 batches
    sink.compact(spark)
    assert n_slots() == 2  # folded base + newest slot
    assert est_rows(sink.state_as_of(spark)) == want

    # the snapshot rule still works after compaction: a replayed batch
    # excludes its own slot from the fold
    assert est_rows(sink.state_as_of(spark, bid=99)) == want
