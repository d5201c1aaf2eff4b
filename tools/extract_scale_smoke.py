"""Extractor throughput at REAL page sizes (round 9).

The crawl-chain pages are ~500 chars; real crawl HTML averages tens
of KB. This smoke prices both extraction tiers on 30 KB-class pages
(nav + many paragraphs + a table-soup section with per-word inline
tags + link boxes + footer), so the 100 TB extrapolation rests on
realistic page bytes, not toy markup. Corpus pre-written; timed
section is parquet scan -> extractor -> agg.

Usage: python tools/extract_scale_smoke.py [n_pages] [paras_per_page]
       (defaults 50_000 40 -> ~30 KB/page)
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from melodist_spark.session import get_spark

WORKDIR = os.environ.get("EXTRACT_SMOKE_DIR", "/tmp/extract_scale_smoke")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    paras = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    spark = get_spark("extract_scale_smoke", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    src = os.path.join(WORKDIR, f"pages_{n_pages}_{paras}")
    if os.path.exists(src):
        shutil.rmtree(src)

    nav = (
        '<nav><ul>' + ''.join(
            f'<li><a href="/s{i}">Section {i} name</a></li>' for i in range(12)
        ) + '</ul></nav>'
    )
    footer = (
        '<footer><div><a href="/about">About the site</a> '
        '<a href="/terms">Terms of service</a></div>'
        '<p>All rights reserved by the example publishing company</p></footer>'
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pages = []
            for pid in pdf["id"]:
                rng = np.random.default_rng(int(pid))
                parts = [f"<html><head><title>Page {pid}</title>"
                         "<style>p{margin:0}</style><script>var a=1;</script>"
                         f"</head><body>{nav}<article>"]
                for j in range(paras):
                    words = " ".join(
                        f"w{x}" for x in rng.integers(0, 30_000, size=60)
                    )
                    if j % 10 == 5:  # table-soup paragraph
                        bolded = " ".join(
                            f"<b>{w}</b>" for w in words.split()[:40]
                        )
                        parts.append(
                            f"<table><tr><td><span>{bolded}</span></td>"
                            '<td><a href="/r1">Related one</a> '
                            '<a href="/r2">Related two</a></td></tr></table>'
                        )
                    else:
                        parts.append(f"<p>{words}</p>")
                parts.append(f"</article>{footer}</body></html>")
                pages.append("".join(parts))
            yield pd.DataFrame({"doc_id": pdf["id"], "html": pages})

    t0 = time.perf_counter()
    spark.range(n_pages).repartition(64).mapInPandas(
        gen, "doc_id long, html string"
    ).write.parquet(src)
    print(f"generate+write: {time.perf_counter() - t0:.1f}s", flush=True)

    from melodist_spark.pipeline.text import (
        extract_main_content,
        extract_main_content_dom,
        html_to_text,
    )

    pages = spark.read.parquet(src)
    total_bytes = pages.agg(F.sum(F.length("html"))).first()[0]
    print(
        f"{n_pages:,} pages, {total_bytes / n_pages / 1024:.1f} KB/page avg",
        flush=True,
    )

    for name, col in (
        ("html_to_text   ", html_to_text(F.col("html"))),
        ("flat extractor ", extract_main_content(F.col("html"))),
        ("dom extractor  ", extract_main_content_dom(F.col("html"))),
    ):
        t0 = time.perf_counter()
        out = pages.select(col.alias("t")).agg(
            F.count("*"), F.sum(F.length("t")).alias("chars")
        ).first()
        dt = time.perf_counter() - t0
        print(
            f"{name}: {dt:6.1f}s — {n_pages / dt:8,.0f} pages/s, "
            f"{total_bytes / dt / 1e6:7.1f} MB/s in, "
            f"{(out['chars'] or 0) / 1e6:.0f}M chars out",
            flush=True,
        )


if __name__ == "__main__":
    main()
