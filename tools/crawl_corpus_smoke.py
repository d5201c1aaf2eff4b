"""End-to-end crawl-to-corpus COMPOSITION smoke (round 8, VERDICT
item 6): one run chaining the individually-measured crawl pieces —
CDX index pick → `read_warc_ranges` byte-range fetch →
html_to_text / fix_text / clean_text → robots compliance + URL
curation (PSL registered domains, per-domain cap) → MinHash near-dup
→ decontamination → sequence packing — at >= 1M archived records,
with per-stage wall-clock attribution.

Why compose instead of re-measuring stages: both operational
findings of the 18M-doc curation chain (executor-heap/GC
interaction, shuffle-file retention) appeared only in COMPOSITION —
stages share the page cache, the shuffle dirs, and the JVM heap, and
a per-stage harness hides that.  This smoke gives the crawl path the
same treatment.

Synthetic corpus shape (Common Crawl-like): per-record gzip members,
CDXJ shards written at archive-build time, ~2000 registrable domains
(incl. github.io-style private-suffix hosts so the PSL join path is
in the hot loop), HTML bodies with entities + mojibake (fix_text
work), planted exact dups (every 20th record) and near dups (every
50th, one word swapped), /private/ paths for robots to drop.

Usage: python tools/crawl_corpus_smoke.py [n_archives] [recs_per_archive]
Defaults: 32 x 40_000 = 1.28M records.

Round-9 stage-shape switches (defaults are the measured-fastest
Arrow kernels, each pinned value-identical to its JVM twin;
setting a switch re-runs the round-8 configuration):
  CRAWL_SMOKE_EXTRACTOR=flat   density-scorer extraction tier
  CRAWL_SMOKE_DECONTAM=joined  broadcast-join flag path
  CRAWL_SMOKE_MINHASH=jvm      expression-form signatures

Measurement hygiene: run UNCONTENDED (no other Spark JVM / pytest on
the box); the driver carries periodicGC=2min (shuffle-file retention)
and 32g heap (whole-archive byte[]s in the build stage).
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ARCHIVES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
RECS = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000
WORKDIR = os.environ.get("CRAWL_SMOKE_DIR", "/tmp/crawl_corpus_smoke")

N_DOMAINS = 2000
WORDS = [f"w{i}" for i in range(5000)]
STOP = ["the", "and", "of", "to", "in", "that", "it", "is"]


def build(archive_id: int, out_dir: str) -> list[str]:
    """One archive of RECS gzip-member records + its CDXJ shard."""
    import random

    arc_path = os.path.join(out_dir, f"a{archive_id:04d}.warc.gz")
    cdx_lines = []
    pos = 0
    prev_words = None
    with open(arc_path, "wb") as fh:
        for i in range(RECS):
            gid = archive_id * RECS + i
            rng = random.Random(gid)
            d = gid % N_DOMAINS
            # every 40th host is a private-suffix platform page (the
            # PSL must split these per user, not per platform)
            dom = (
                f"user{d}.github.io" if d % 40 == 7 else f"dom{d}.example"
            )
            # every 6th URL lands under the robots-disallowed prefix
            path = (
                f"/private/p{gid}" if gid % 6 == 3 else f"/articles/{gid}"
            )
            url = f"https://{dom}{path}"
            if gid % 20 == 1 and prev_words:  # exact dup of predecessor
                words = prev_words
            elif gid % 50 == 2 and prev_words:  # near dup: 1 word swap
                words = ["swapped"] + prev_words[1:]
            else:
                words = [
                    STOP[j % len(STOP)]
                    if j % 5 == 0
                    else rng.choice(WORDS)
                    for j in range(60)
                ]
            prev_words = words
            para = " ".join(words)
            mojibake = "cafÃ© " if gid % 7 == 0 else ""
            body = (
                f"<html><head><title>Doc {gid} &amp; co</title>"
                "<style>p{margin:0}</style></head><body>"
                f"<nav>home &gt; sec</nav><h1>Doc {gid}</h1>"
                f"<p>{mojibake}{para}</p>"
                "<footer>&copy; crawl</footer></body></html>"
            ).encode()
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            )
            head = (
                b"WARC/1.0\r\nWARC-Type: response\r\n"
                + f"WARC-Target-URI: {url}\r\n".encode()
                + b"Content-Type: application/http; msgtype=response\r\n"
                + f"Content-Length: {len(http)}\r\n\r\n".encode()
            )
            m = gzip.compress(head + http + b"\r\n\r\n", compresslevel=1)
            fh.write(m)
            key = ",".join(reversed(dom.split("."))) + ")" + path
            cdx_lines.append(
                f"{key} 20260101000000 "
                + json.dumps(
                    {
                        "url": url,
                        "mime": "text/html",
                        # every 100th capture is a redirect the index
                        # pick must drop without touching the archive
                        "status": "301" if gid % 100 == 99 else "200",
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

    from melodist_spark.pipeline.dedup import (
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signature,
    )
    from melodist_spark.pipeline.decontamination import decontaminate
    from melodist_spark.pipeline.packing import pack_sequences
    from melodist_spark.pipeline.psl import registered_domain_psl
    from melodist_spark.pipeline.robots import apply_robots, parse_robots
    from melodist_spark.pipeline.text import (
        clean_text,
        extract_main_content,
        fix_text,
        html_to_text,
    )
    from melodist_spark.pipeline.urls import cap_per_domain, url_host, url_path
    from melodist_spark.session import get_spark
    from melodist_spark.sources.warc import read_cdx, read_warc_ranges

    spark = get_spark(
        "crawl_corpus_smoke",
        shuffle_partitions=64,
        extra_conf={
            # multi-stage driver: bound shuffle-file retention
            "spark.cleaner.periodicGC.interval": "2min",
            # whole archives ride JVM byte[]s during generation
            "spark.driver.memory": "32g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(WORKDIR, ignore_errors=True)
    os.makedirs(WORKDIR, exist_ok=True)
    stages: list[tuple[str, float, str]] = []
    t0 = time.perf_counter()
    spark.sparkContext.parallelize(
        range(N_ARCHIVES), N_ARCHIVES
    ).flatMap(lambda i: build(i, WORKDIR)).count()
    gz_bytes = sum(
        os.path.getsize(os.path.join(WORKDIR, f))
        for f in os.listdir(WORKDIR)
    )
    t1 = time.perf_counter()
    n_total = N_ARCHIVES * RECS
    stages.append(
        (
            "generate",
            t1 - t0,
            f"{n_total:,} records, {gz_bytes / 1e9:.2f} GB gz",
        )
    )

    # -- 1: CDX index pick (never touches the archives) -------------------
    picked = (
        read_cdx(spark, f"{WORKDIR}/cdx-*.gz")
        .filter((F.col("status") == 200) & (F.col("mime") == "text/html"))
        .select("warc_filename", "offset", "length")
        .persist()
    )
    n_picked = picked.count()
    t2 = time.perf_counter()
    stages.append(
        ("cdx_pick", t2 - t1, f"{n_picked:,} of {n_total:,} captures")
    )

    # -- 2: byte-range fetch ----------------------------------------------
    fetched = (
        read_warc_ranges(spark, picked)
        .filter(F.col("http_body").isNotNull())
        .select(
            F.xxhash64("target_uri").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("http_body").cast("string").alias("html"),
        )
        .persist()
    )
    n_fetched = fetched.count()
    t3 = time.perf_counter()
    stages.append(
        (
            "range_fetch",
            t3 - t2,
            f"{n_fetched:,} records ({n_fetched / (t3 - t2):,.0f}/s)",
        )
    )

    # -- 3: text extraction + repair --------------------------------------
    # boilerplate-aware main-content extraction first (round 8), with
    # the documented html_to_text fallback for pages where no block
    # qualifies — dropping nav/footer here is what keeps short-gram
    # decontamination meaningful downstream (see SCALE.md finding).
    # Round 9: the stack-based DOM tier (Arrow kernel) is the default
    # — paired same-box runs measured it 2.2x FASTER in-chain than
    # the interpreted-HOF flat scorer (14.4 s vs 31.5 s at 1.28M
    # records) with byte-identical downstream results on this
    # corpus's straight-line markup, and it is the more correct tier
    # on nested layouts. CRAWL_SMOKE_EXTRACTOR=flat re-runs the
    # round-8 configuration.
    if os.environ.get("CRAWL_SMOKE_EXTRACTOR", "dom") == "dom":
        from melodist_spark.pipeline.text import extract_main_content_dom

        extractor = extract_main_content_dom(F.col("html"))
    else:
        extractor = extract_main_content(F.col("html"))
    main = F.coalesce(
        F.nullif(extractor, F.lit("")),
        html_to_text(F.col("html")),
    )
    docs = fetched.select(
        "doc_id",
        "url",
        clean_text(fix_text(main)).alias("text"),
    ).persist()
    n_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    t4 = time.perf_counter()
    stages.append(
        (
            "html_fix_clean",
            t4 - t3,
            f"{n_chars / 1e6:,.0f} M clean chars "
            f"({n_fetched / (t4 - t3):,.0f} docs/s)",
        )
    )
    fetched.unpersist()

    # -- 4: robots + URL curation -----------------------------------------
    with_host = docs.withColumn("host", url_host(F.col("url"))).withColumn(
        "path", url_path(F.col("url"))
    )
    domains = with_host.select("host").distinct()
    robots = domains.select(
        F.col("host").alias("domain"),
        F.lit(
            "User-agent: *\nDisallow: /private/\nAllow: /private/pub\n"
        ).alias("robots_txt"),
    )
    rules = parse_robots(robots, agent="melobot")
    curated = apply_robots(
        with_host.withColumnRenamed("host", "domain"),
        rules,
        path_col="path",
        key_col="domain",
    ).filter(F.col("crawlable"))
    curated = registered_domain_psl(
        curated, host_col="domain", out_col="reg_domain"
    )
    capped = cap_per_domain(
        curated, n=500, domain_col="reg_domain", url_col="url"
    ).persist()
    n_kept = capped.count()
    t5 = time.perf_counter()
    stages.append(
        (
            "robots_url_curation",
            t5 - t4,
            f"{n_kept:,} kept of {n_fetched:,} "
            f"(robots drop + 500/domain cap, PSL domains)",
        )
    )
    docs.unpersist()

    # -- 5: near-dup candidates -------------------------------------------
    # Round 9: signatures default to the Arrow kernel (bit-identical
    # to the expression form, differential-pinned) — the staged
    # transform/zip_with projection is CodegenFallback and measured
    # ~11.3 s warm at 900k docs vs ~4.4 s for the kernel.
    # CRAWL_SMOKE_MINHASH=jvm restores the round-8 shape.
    if os.environ.get("CRAWL_SMOKE_MINHASH", "arrow") == "jvm":
        sig = minhash_signature(
            capped.select("doc_id", "text"), num_hashes=16, shingle=3
        )
    else:
        from melodist_spark.pipeline.dedup import minhash_signature_arrow

        sig = minhash_signature_arrow(
            capped.select("doc_id", "text"), num_hashes=16, shingle=3
        )
    pairs = lsh_candidate_pairs(
        lsh_bands(sig, num_hashes=16, band_size=4)
    ).persist()
    n_pairs = pairs.count()
    t6 = time.perf_counter()
    stages.append(
        ("minhash_neardup", t6 - t5, f"{n_pairs:,} candidate pairs")
    )
    drop_b = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = capped.join(drop_b, "doc_id", "left_anti").persist()
    n_dedup = deduped.count()
    t6b = time.perf_counter()
    stages.append(
        ("dedup_filter", t6b - t6, f"{n_dedup:,} survivors")
    )
    capped.unpersist()

    # -- 6: decontamination -----------------------------------------------
    bench = deduped.filter(F.pmod("doc_id", 997) == 0).select(
        "doc_id", "text"
    )
    # 13-grams, the GPT-3 appendix-C production choice: 5-grams sit
    # inside shared title/nav/footer boilerplate and flag EVERY doc
    # (observed in the sizing run — a finding in itself: short-gram
    # decontamination needs boilerplate removal first)
    # Round 9: the flag pass defaults to the STATELESS Arrow kernel —
    # at 13 grams the joined path's gram construction is a 12-level
    # zip_with tree (CodegenFallback, the Gopher lesson again),
    # measured 17-21 s here vs ~5 s for the kernel; identical flags
    # (parity-pinned). CRAWL_SMOKE_DECONTAM=joined re-runs the
    # round-8 configuration (the joined path remains the
    # engine-portable oracle shape).
    if os.environ.get("CRAWL_SMOKE_DECONTAM", "stateless") == "joined":
        contam = decontaminate(
            deduped.select("doc_id", "text"), bench, ngram=13, threshold=1
        ).filter(F.col("contaminated"))
    else:
        from melodist_spark.pipeline.decontamination import (
            benchmark_gram_array,
            decontaminate_stateless,
        )

        bgrams = benchmark_gram_array(bench, ngram=13)
        contam = decontaminate_stateless(
            deduped.select("doc_id", "text"), bgrams, ngram=13, threshold=1
        ).filter(F.col("contaminated"))
    n_contam = contam.count()
    t7 = time.perf_counter()
    stages.append(
        ("decontaminate", t7 - t6b, f"{n_contam:,} contaminated flagged")
    )

    # -- 6b (optional): surgical span excision on the flagged slice --------
    # CRAWL_SMOKE_SURGERY=1 completes the flag→surgery story at
    # composition scale: instead of dropping the flagged docs, excise
    # the benchmark-overlapping spans and keep them (the intended
    # production shape — the per-token-md5 kernel runs ONLY on the
    # contaminated slice, here n_contam of n_dedup docs). NOTE on the
    # expected output: this chain's benchmark is drawn FROM the corpus
    # (doc_id % 997), so every flagged doc IS a benchmark member and
    # excises to zero tokens — the measurement prices the kernel on
    # the slice; the keep-the-remainder behavior on QUOTING docs is
    # pinned by test_streaming_curate_surgical_parity and
    # test_remove_contaminated_spans_surgery.
    if os.environ.get("CRAWL_SMOKE_SURGERY"):
        from melodist_spark.pipeline.decontamination import (
            benchmark_gram_array as _bga,
            remove_contaminated_spans,
        )

        sg = remove_contaminated_spans(
            deduped.join(contam.select("doc_id"), "doc_id", "left_semi")
            .select("doc_id", "text"),
            _bga(bench, ngram=13),
            ngram=13,
        )
        srow = sg.agg(
            F.count("*").alias("n"),
            F.sum("n_tokens_removed").alias("cut"),
            F.sum("n_tokens_kept").alias("kept"),
        ).collect()[0]
        t7b = time.perf_counter()
        stages.append((
            "surgical_excision",
            t7b - t7,
            f"{srow['n']:,} docs repaired: {srow['cut']:,} tokens cut, "
            f"{srow['kept']:,} kept",
        ))
        t7 = t7b

    # -- 6c: tokenizer apply (round 12, VERDICT item 7) ---------------------
    # encode the retained corpus with the PINNED trained models — the
    # shuffle-free broadcast-model mapInPandas pass with the per-worker
    # word cache (bpe.py module docstring); tracked here so encode
    # throughput rides the same 1.28M-record chain round-to-round
    from melodist_spark.pipeline.bpe import bpe_tokenize
    from melodist_spark.pipeline.pinned import BPE_MERGES, UNIGRAM_PIECES
    from melodist_spark.pipeline.unigram import unigram_tokenize

    for enc_name, enc in (
        ("bpe_encode", lambda d: bpe_tokenize(d, [tuple(m) for m in BPE_MERGES])),
        ("unigram_encode", lambda d: unigram_tokenize(d, dict(UNIGRAM_PIECES))),
    ):
        col = "bpe_tokens" if enc_name == "bpe_encode" else "unigram_tokens"
        erow = (
            enc(deduped.select("doc_id", "text"))
            .agg(
                F.sum(F.size(col)).alias("pieces"),
                F.count("*").alias("docs"),
            )
            .collect()[0]
        )
        t7c = time.perf_counter()
        stages.append((
            enc_name,
            t7c - t7,
            f"{erow['pieces']:,} pieces / {erow['docs']:,} docs, "
            f"{erow['pieces'] / (t7c - t7):,.0f} pieces/s",
        ))
        t7 = t7c

    # -- 7: sequence packing ----------------------------------------------
    manifest = pack_sequences(
        deduped.select("doc_id", "text"), seq_len=2048
    )
    n_seqs = manifest.agg(F.max("seq_last")).collect()[0][0]
    t8 = time.perf_counter()
    stages.append(
        ("pack_sequences", t8 - t7, f"{n_seqs:,} sequences of 2048 tokens")
    )

    total = t8 - t0
    print("\n== crawl-to-corpus composition ==")
    for name, wall, note in stages:
        print(f"  {name:<22} {wall:8.1f}s  {note}")
    print(
        f"  {'TOTAL':<22} {total:8.1f}s  "
        f"({n_total:,} records -> {n_dedup:,} packed docs)"
    )
    shutil.rmtree(WORKDIR, ignore_errors=True)


if __name__ == "__main__":
    main()
