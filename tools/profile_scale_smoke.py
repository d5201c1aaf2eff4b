"""Scale smoke for the mergeable corpus profile (pipeline/profile.py):
sketch-state size, shard-merge exactness and the theta snapshot
overlap at crawl-shaped cardinalities.

What the 100 TB story needs measured: (a) profiling cost is one
partial-agg pass where only (hash, length) leave the map side —
per-row cost flat in document size and group count; (b) merging
per-shard sketch states reproduces the whole-corpus profile (the
never-rescan contract) at estimate-identical fidelity for HLL/theta;
(c) `snapshot_overlap` prices two snapshots' overlap from KB-sized
state rows — wall independent of corpus size once states exist; and
(d) the state is actually small (bytes per group, not per doc).

Usage: python tools/profile_scale_smoke.py [n_docs] [n_domains]
       (defaults 20_000_000 1_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from melodist_spark.session import get_spark


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_domains = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000

    spark = get_spark("profile_scale_smoke", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    from melodist_spark.pipeline.profile import (
        corpus_profile_state,
        merge_profile_states,
        profile_estimates,
        snapshot_overlap,
    )

    # crawl-shaped synthetic corpus, generated distributed: ~30% of
    # docs are duplicates (content id = id/3 for every third doc),
    # zipf-ish domain sizes (u^3 piles mass on low domain ids),
    # lengths spread 40..2000 chars via a repeated filler.
    u = (
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1 << 30)).cast("double")
        / F.lit(float(1 << 30))
    )
    content_id = F.when(
        F.pmod(F.col("id"), F.lit(3)) == 2, (F.col("id") / F.lit(3)).cast("long")
    ).otherwise(F.col("id"))
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.floor(F.lit(float(n_domains)) * F.pow(u, F.lit(3.0)))
        .cast("long")
        .alias("domain"),
        F.concat(
            F.lit("document body "),
            content_id.cast("string"),
            F.lit(" "),
            F.repeat(F.lit("filler "), F.pmod(content_id, F.lit(280)).cast("int")),
        ).alias("text"),
    )

    t0 = time.perf_counter()
    whole = corpus_profile_state(docs, group_by=["domain"]).persist()
    n_groups = whole.count()
    t_whole = time.perf_counter() - t0
    state_bytes = whole.select(
        (
            F.sum(F.octet_length("hll_content"))
            + F.sum(F.octet_length("theta_content"))
            + F.sum(F.octet_length("kll_len"))
        ).alias("b")
    ).collect()[0]["b"]
    print(
        f"profile {n_docs:,} docs -> {n_groups:,} domain rows in "
        f"{t_whole:.1f} s ({n_docs / t_whole / 1e6:.2f}M docs/s); "
        f"sketch state {state_bytes / 1e6:.1f} MB total "
        f"({state_bytes / n_groups / 1024:.1f} KB/domain)"
    )

    # (b) shard-merge exactness: profile 8 hash-shards independently,
    # merge the states, compare whole-corpus estimates
    t0 = time.perf_counter()
    shard_states = None
    for k in range(8):
        s = corpus_profile_state(
            docs.filter(F.pmod(F.col("doc_id"), F.lit(8)) == k),
            group_by=["domain"],
        )
        shard_states = s if shard_states is None else shard_states.unionByName(s)
    merged = merge_profile_states(shard_states, group_by=["domain"]).persist()
    merged.count()
    t_shards = time.perf_counter() - t0

    w = profile_estimates(whole).withColumnRenamed("distinct_est", "de_w")
    m = profile_estimates(merged).withColumnRenamed("distinct_est", "de_m")
    # theta merged==whole is exact at ANY cardinality (hash-set union
    # with the same k); HLL is exact below capacity, last-digit-close
    # past it (the union gadget); KLL keeps the rank-error bound
    th = whole.select(
        "domain",
        F.call_function("theta_sketch_estimate", F.col("theta_content")).alias("tw"),
    ).join(
        merged.select(
            "domain",
            F.call_function("theta_sketch_estimate", F.col("theta_content")).alias("tm"),
        ),
        "domain",
    )
    theta_diff = th.filter(F.col("tw") != F.col("tm")).count()
    cmp = w.select("domain", "n_docs", "de_w", F.col("len_p99").alias("p99_w")).join(
        m.select("domain", "de_m", F.col("len_p99").alias("p99_m")), "domain"
    )
    row = cmp.select(
        F.count("*").alias("groups"),
        F.max(
            F.abs(F.col("de_w") - F.col("de_m")) / F.col("de_w")
        ).alias("hll_rel"),
        F.max(
            F.abs(F.col("p99_w") - F.col("p99_m")) / F.col("p99_w")
        ).alias("kll_rel"),
    ).collect()[0]
    print(
        f"8-shard profile+merge in {t_shards:.1f} s; theta merged==whole "
        f"on {row['groups'] - theta_diff}/{row['groups']} domains "
        f"(contract: all); max HLL merged-vs-whole relative gap "
        f"{row['hll_rel'] * 100:.3f}%; max KLL p99 relative gap "
        f"{row['kll_rel'] * 100:.2f}%"
    )

    # accuracy vs exact distinct on the biggest domains
    exact = (
        docs.groupBy("domain")
        .agg(F.count("*").alias("n"), F.countDistinct("text").alias("nd"))
        .orderBy(F.desc("n"))
        .limit(5)
        .collect()
    )
    ests = {r["domain"]: r for r in profile_estimates(whole).collect()}
    for r in exact:
        e = ests[r["domain"]]
        err = abs(e["distinct_est"] - r["nd"]) / r["nd"]
        print(
            f"  domain {r['domain']}: n={r['n']:,} exact_distinct={r['nd']:,} "
            f"hll={e['distinct_est']:,.0f} (err {err * 100:.2f}%) "
            f"dup_ratio_est={e['dup_ratio_est']}"
        )

    # (c) snapshot overlap: A = first 60%, B = last 60% (20% planted
    # overlap region), per-domain theta algebra from the states only
    a_docs = docs.filter(F.col("doc_id") < int(n_docs * 0.6))
    b_docs = docs.filter(F.col("doc_id") >= int(n_docs * 0.4))
    sa = corpus_profile_state(a_docs, group_by=["domain"]).persist()
    sb = corpus_profile_state(b_docs, group_by=["domain"]).persist()
    sa.count(), sb.count()
    t0 = time.perf_counter()
    ov = snapshot_overlap(sa, sb, group_by=["domain"])
    tot = ov.select(
        F.sum("overlap_est").alias("ov"),
        F.sum("new_in_b_est").alias("new"),
    ).collect()[0]
    t_ov = time.perf_counter() - t0
    print(
        f"snapshot overlap over {n_groups:,} domain rows in {t_ov:.1f} s "
        f"(states only): est overlap {tot['ov']:,.0f} docs, "
        f"est new-in-B {tot['new']:,.0f} docs"
    )
    # ground truth AT THE OP'S OWN GRAIN — per-domain distinct
    # contents (duplicate contents cross domain boundaries in this
    # corpus, so a global set comparison would mis-state the
    # per-domain sum; this is the exact quantity the theta rows
    # estimate)
    da = a_docs.select("domain", "text").distinct()
    db = b_docs.select("domain", "text").distinct()
    inter = da.join(db, ["domain", "text"], "inner").count()
    bn = db.join(da, ["domain", "text"], "left_anti").count()
    print(
        f"  exact at the same grain: overlap {inter:,} (domain, content) "
        f"pairs, new-in-B {bn:,} — sketch errors "
        f"{abs(tot['ov'] - inter) / inter * 100:.2f}% / "
        f"{abs(tot['new'] - bn) / bn * 100:.2f}%"
    )


if __name__ == "__main__":
    main()
