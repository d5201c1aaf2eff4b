"""Index-first access scale smoke: CDX shard scan rate, the
selectivity of a SURT-prefix + status filter, and `read_warc_ranges`
fetch rate — versus the cost of scanning the full archives the index
makes avoidable.

The claim under test (sources/warc.py::read_cdx): at crawl scale you
filter the ~1% index relationally and seek-read only matching byte
ranges; the wall for a selective query should track the SELECTED
bytes, not the corpus.

Usage: python tools/cdx_scale_smoke.py [n_archives] [records_per_archive] [select_pct] [body_kb]
Defaults: 16 archives x 2_000 records x 24 KB bodies, 2% selected.
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ARCHIVES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
RECS = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
SELECT_PCT = int(sys.argv[3]) if len(sys.argv) > 3 else 2
BODY_KB = int(sys.argv[4]) if len(sys.argv) > 4 else 24
WORKDIR = os.environ.get("CDX_SMOKE_DIR", "/tmp/cdx_smoke")


def build(archive_id: int, out_dir: str) -> list[str]:
    """One CC-style archive (per-record gzip members) + its CDXJ
    shard, indexed at write time. Every 100/SELECT_PCT-th record
    belongs to the 'rare.example' domain the query will select."""
    # incompressible bodies: random bytes model real media/minified
    # payloads (repetitive filler compresses 100:1 and makes the
    # avoided full-scan cost look free)
    import numpy as np

    rng = np.random.default_rng(archive_id)
    body = rng.integers(32, 127, BODY_KB * 1024, dtype=np.uint8).tobytes()
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    arc_path = os.path.join(out_dir, f"a{archive_id:04d}.warc.gz")
    cdx_lines = []
    pos = 0
    step = max(1, 100 // SELECT_PCT)
    with open(arc_path, "wb") as fh:
        for i in range(RECS):
            dom = "rare.example" if i % step == 0 else f"bulk{i % 97}.example"
            url = f"https://{dom}/p{archive_id}/{i}"
            head = (
                b"WARC/1.0\r\nWARC-Type: response\r\n"
                + f"WARC-Target-URI: {url}\r\n".encode()
                + b"Content-Type: application/http; msgtype=response\r\n"
                + f"Content-Length: {len(http)}\r\n\r\n".encode()
            )
            m = gzip.compress(head + http + b"\r\n\r\n", compresslevel=1)
            fh.write(m)
            key = ",".join(reversed(dom.split("."))) + f")/p{archive_id}/{i}"
            cdx_lines.append(
                f"{key} 20260101000000 "
                + json.dumps(
                    {
                        "url": url,
                        "mime": "text/html",
                        "status": "200",
                        "length": str(len(m)),
                        "offset": str(pos),
                        "filename": arc_path,
                    }
                )
            )
            pos += len(m)
    cdx_path = os.path.join(out_dir, f"cdx-{archive_id:04d}.gz")
    with open(cdx_path, "wb") as fh:
        fh.write(gzip.compress(("\n".join(cdx_lines) + "\n").encode()))
    return [arc_path, cdx_path]


def main():
    from pyspark.sql import functions as F

    from melodist_spark.session import get_spark
    from melodist_spark.sources.warc import read_cdx, read_warc, read_warc_ranges

    spark = get_spark(
        "cdx_scale_smoke",
        shuffle_partitions=32,
        # whole archives ride JVM byte[]s in the avoided-cost full
        # scan: 32 concurrent ~100 MB blobs need real heap (the
        # default segfaults in arraycopy at ~1.6 GB of archives)
        extra_conf={"spark.driver.memory": "32g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(WORKDIR, ignore_errors=True)
    os.makedirs(WORKDIR, exist_ok=True)
    t0 = time.perf_counter()
    # distributed generation: one task per archive
    spark.sparkContext.parallelize(
        range(N_ARCHIVES), N_ARCHIVES
    ).flatMap(lambda i: build(i, WORKDIR)).count()
    t1 = time.perf_counter()
    arc_bytes = sum(
        os.path.getsize(os.path.join(WORKDIR, f))
        for f in os.listdir(WORKDIR)
        if f.startswith("a")
    )
    print(
        f"generate: {N_ARCHIVES} archives x {RECS} recs "
        f"({arc_bytes / 1e9:.2f} GB gz) in {t1 - t0:.1f}s",
        flush=True,
    )

    cdx = read_cdx(spark, f"{WORKDIR}/cdx-*.gz")
    n_idx = cdx.count()
    t2 = time.perf_counter()
    print(
        f"index scan: {n_idx:,} captures in {t2 - t1:.1f}s "
        f"({n_idx / (t2 - t1):,.0f} rows/s)",
        flush=True,
    )

    picked = cdx.filter(
        F.col("urlkey").startswith("example,rare)") & (F.col("status") == 200)
    ).select("warc_filename", "offset", "length").persist()
    n_picked = picked.count()
    t2b = time.perf_counter()
    print(
        f"index pick (scan+filter, materialized): {n_picked:,} ranges "
        f"in {t2b - t2:.1f}s",
        flush=True,
    )
    out = read_warc_ranges(spark, picked)
    n_sel = out.count()
    t3 = time.perf_counter()
    print(
        f"range fetch: {n_sel:,} records ({100 * n_sel / n_idx:.1f}% of crawl) "
        f"in {t3 - t2b:.1f}s ({n_sel / (t3 - t2b):,.0f} recs/s)",
        flush=True,
    )

    # the avoided cost: full-archive scan of the same corpus
    n_all = read_warc(spark, f"{WORKDIR}/a*.warc.gz").count()
    t4 = time.perf_counter()
    print(
        f"full scan (avoided): {n_all:,} records in {t4 - t3:.1f}s — "
        f"index-first is {(t4 - t3) / max(t3 - t2b, 1e-9):.1f}x cheaper at "
        f"{SELECT_PCT}% selectivity",
        flush=True,
    )
    shutil.rmtree(WORKDIR, ignore_errors=True)


if __name__ == "__main__":
    main()
