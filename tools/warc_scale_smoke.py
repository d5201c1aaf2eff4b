"""Crawl front door scale smoke: measure `read_warc` throughput on
synthesized multi-record gzipped archives (the Common Crawl shape) —
records/s and raw MB/s per task — including one poison archive that
must degrade to a single error row without failing the job.

Usage: python tools/warc_scale_smoke.py [n_archives] [raw_mb_per_archive]
Defaults: 24 archives x 96 MB raw ≈ 2.3 GB decompressed.

Validates the per-archive scaling argument of sources/warc.py: the
binaryFile scan hands one archive to one task, the gzip stream is
parsed incrementally (never materialized whole), and rows flush out
every 1024 records — so per-task memory stays near the compressed
blob size and throughput scales with executor count, not archive
count.
"""

from __future__ import annotations

import gzip
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ARCHIVES = int(sys.argv[1]) if len(sys.argv) > 1 else 24
RAW_MB = int(sys.argv[2]) if len(sys.argv) > 2 else 96
WORKDIR = os.environ.get("WARC_SMOKE_DIR", "/tmp/warc_smoke")


def build_archive_bytes(raw_mb: int) -> tuple[bytes, int]:
    """One synthetic .warc.gz: HTTP response records with ~2 KB HTML
    bodies until the raw size target is reached. Two gzip members
    (multi-member archives are the Common Crawl norm)."""
    body_text = (
        "<html><head><title>scale smoke</title></head><body>"
        + "lorem ipsum dolor sit amet " * 70
        + "</body></html>"
    ).encode()
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body_text
    )
    parts = []
    n_records = 0
    size = 0
    target = raw_mb * 1024 * 1024
    while size < target:
        rec_head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:uuid:{n_records}>\r\n".encode()
            + f"WARC-Target-URI: http://example.com/p{n_records}\r\n".encode()
            + b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n\r\n".encode()
        )
        rec = rec_head + http + b"\r\n\r\n"
        parts.append(rec)
        size += len(rec)
        n_records += 1
    blob = b"".join(parts)
    half = len(blob) // 2
    # split at a record boundary for the second gzip member
    cut = blob.find(b"WARC/1.0", half)
    gz = gzip.compress(blob[:cut], 1) + gzip.compress(blob[cut:], 1)
    return gz, n_records


def main():
    os.makedirs(WORKDIR, exist_ok=True)
    gz, recs_per_archive = build_archive_bytes(RAW_MB)
    print(
        f"archive: {RAW_MB} MB raw, {len(gz) / 1e6:.1f} MB gz, "
        f"{recs_per_archive} records"
    )
    t0 = time.time()
    for i in range(N_ARCHIVES):
        path = os.path.join(WORKDIR, f"crawl-{i:05d}.warc.gz")
        if not os.path.exists(path):
            with open(path, "wb") as f:
                f.write(gz)
    # poison archive: truncated mid-record after valid records
    poison = os.path.join(WORKDIR, "crawl-poison.warc.gz")
    with open(poison, "wb") as f:
        f.write(gzip.compress(b"WARC/1.0\r\nContent-Length: 999999\r\n\r\nshort", 1))
    print(f"wrote {N_ARCHIVES}+1 archives in {time.time() - t0:.1f} s")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from melodist_spark.sources.warc import read_warc

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("warc-scale-smoke")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    df = read_warc(spark, WORKDIR + "/*.warc.gz")
    agg = df.groupBy("warc_type").agg(
        F.count("*").alias("n"),
        F.sum(F.octet_length("http_body")).alias("body_bytes"),
    )
    rows = {r["warc_type"]: (r["n"], r["body_bytes"]) for r in agg.collect()}
    wall = time.time() - t0
    total_records = rows.get("response", (0, 0))[0]
    total_raw = N_ARCHIVES * RAW_MB
    n_tasks = N_ARCHIVES + 1
    print(f"rows by type: {rows}")
    print(
        f"parse+agg wall {wall:.1f} s | {total_records / wall:,.0f} records/s "
        f"| {total_raw / wall:,.0f} raw MB/s total "
        f"| {total_raw / wall / min(n_tasks, int(cpus)):,.1f} MB/s/task"
    )
    assert rows.get("__error__", (0, 0))[0] == 1, "poison archive must yield 1 error row"
    assert total_records == N_ARCHIVES * recs_per_archive

    # second pass: the curation-facing projection (uri + text body)
    t0 = time.time()
    n = (
        read_warc(spark, WORKDIR + "/*.warc.gz")
        .filter(F.col("http_status") == 200)
        .select("target_uri", F.col("http_body").cast("string").alias("text"))
        .filter(F.length("text") > 100)
        .count()
    )
    wall2 = time.time() - t0
    print(f"curation projection: {n} docs in {wall2:.1f} s ({n / wall2:,.0f} docs/s)")
    spark.stop()


if __name__ == "__main__":
    main()
