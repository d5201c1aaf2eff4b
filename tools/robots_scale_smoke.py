"""Scale smoke for robots.txt compliance (pipeline/robots.py): parse
throughput of the Arrow-batched robots-body kernel, and URL-evaluation
throughput of the zero-shuffle apply_robots shape (broadcast packed
rules + codegen regexp fold).

The claim under test (robots.py module docstring): URL evaluation
never shuffles or row-multiplies the corpus side, so wall scales with
the URL scan alone — per-row cost is the rules-array fold for the
URL's domain (rules_per_domain regexp probes), independent of corpus
size. The smoke prices exactly that: D domains x R rules each, N urls
uniformly over 2D domains (half the domains have no robots at all —
the left-join-miss fast path crawls free).

Usage: python tools/robots_scale_smoke.py [n_urls] [n_domains] [rules_per_domain]
       (defaults 20_000_000 100_000 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from melodist_spark.session import get_spark


def main():
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_domains = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    rules_per = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("robots_scale_smoke", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    from melodist_spark.pipeline.robots import apply_robots, parse_robots

    # One synthetic robots body per domain: rules_per alternating
    # Disallow/Allow patterns with distinct prefixes + wildcards, so
    # the precedence fold genuinely exercises longest-match + the
    # allow tiebreak on every URL that hits its domain's rules.
    body = "User-agent: *\n" + "".join(
        (
            f"Disallow: /p{i}/*/private\n"
            if i % 2
            else f"Allow: /p{i}/\nDisallow: /p{i}\n"
        )
        for i in range(rules_per // 2 + 1)
    )
    robots = spark.range(n_domains).select(
        F.concat(F.lit("d"), "id", F.lit(".example.com")).alias("domain"),
        F.lit(body).alias("robots_txt"),
    )

    t0 = time.perf_counter()
    rules = parse_robots(robots, agent="mybot")
    rules.persist()
    n_rules = rules.count()
    t1 = time.perf_counter()
    print(
        f"parse {n_domains:,} robots bodies -> {n_rules:,} rules: "
        f"{t1 - t0:.1f}s ({n_domains / (t1 - t0):,.0f} bodies/s)",
        flush=True,
    )

    # URLs over 2x the robots'd domain space: half the traffic misses
    # the rules table entirely (no robots.txt published), the rest
    # folds over its domain's packed rule array.
    urls = spark.range(n_urls).select(
        F.concat(
            F.lit("d"), F.pmod(F.xxhash64("id"), F.lit(2 * n_domains)),
            F.lit(".example.com"),
        ).alias("domain"),
        F.concat(
            F.lit("/p"), F.pmod("id", 23), F.lit("/x"), F.col("id"),
            F.when(F.pmod("id", 7) == 0, F.lit("/private")).otherwise(F.lit("")),
        ).alias("path"),
    )

    t2 = time.perf_counter()
    out = apply_robots(urls, rules)
    agg = out.groupBy("crawlable").count().collect()
    t3 = time.perf_counter()
    counts = {r["crawlable"]: r["count"] for r in agg}
    print(
        f"evaluate {n_urls:,} urls vs {n_rules:,} rules: {t3 - t2:.1f}s "
        f"({n_urls / (t3 - t2):,.0f} urls/s) — "
        f"crawlable={counts.get(True, 0):,} blocked={counts.get(False, 0):,}",
        flush=True,
    )
    assert counts.get(False, 0) > 0, "smoke must actually block something"
    print(f"TOTAL {t3 - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
