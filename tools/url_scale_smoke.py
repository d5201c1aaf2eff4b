"""Scale smoke for the URL curation family (pipeline/urls.py): the
codegen scan rate of normalize_url + registered_domain, and the
per-domain cap under mega-domain skew — exact window vs the salted
two-phase shape.

The skew case is the one that matters at crawl scale: a window
partitioned by domain puts a mega-domain's entire row set through one
task's sort, and AQE's skew splitting does NOT apply to windows. The
salted variant bounds per-task work at rows/salt; this smoke measures
both on a corpus where one domain holds 60% of all rows.

Usage: python tools/url_scale_smoke.py [n_rows] [cap] [salt]
       (defaults 50_000_000 100 64)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from melodist_spark.session import get_spark


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    salt = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    spark = get_spark("url_scale_smoke", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    from melodist_spark.pipeline.urls import (
        cap_per_domain,
        normalize_url,
        registered_domain,
        url_host,
    )

    # 60% of rows on one mega-domain, the rest uniform over a
    # 100k-domain tail — the mega-domain is the skew under test. The
    # tail label sits IN the registrable part ("siteN-example.co.uk");
    # "siteN.example.co.uk" would collapse to one registered domain
    dom = F.when(
        F.pmod("id", 10) < 6, F.lit("mega-site.com")
    ).otherwise(
        F.concat(
            F.lit("site"),
            F.pmod(F.xxhash64("id"), F.lit(100_000)),
            F.lit("-example.co.uk"),
        )
    )
    urls = spark.range(n_rows).select(
        F.concat(
            F.lit("HTTPS://WWW."), dom, F.lit(":443/p//"), F.col("id"),
            F.lit("/?utm_source=x&b=2&a="), F.pmod("id", 97), F.lit("#f"),
        ).alias("url")
    )

    t0 = time.perf_counter()
    derived = urls.select(
        normalize_url(F.col("url")).alias("url"),
        registered_domain(url_host(F.col("url"))).alias("domain"),
    )
    derived.write.format("noop").mode("overwrite").save()
    t1 = time.perf_counter()
    print(
        f"normalize+domain scan: {t1 - t0:.1f}s "
        f"({n_rows / (t1 - t0):,.0f} rows/s)", flush=True,
    )

    d = derived.persist()
    d.count()
    t2 = time.perf_counter()
    print(f"persist derived: {t2 - t1:.1f}s", flush=True)

    exact = cap_per_domain(d, cap, "domain", "url")
    n_exact = exact.count()
    t3 = time.perf_counter()
    print(f"exact cap (single window): {t3 - t2:.1f}s ({n_exact} kept)",
          flush=True)

    salted = cap_per_domain(d, cap, "domain", "url", salt=salt)
    n_salted = salted.count()
    t4 = time.perf_counter()
    print(f"salted cap (salt={salt}): {t4 - t3:.1f}s ({n_salted} kept)",
          flush=True)
    assert n_exact == n_salted, (n_exact, n_salted)
    print(f"TOTAL {t4 - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
