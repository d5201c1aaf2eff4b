"""Streaming deduplication for document ingestion.

A training-data ingest stream re-sees the same document many times
(re-crawls, mirrored feeds). Batch dedup (`pipeline/dedup.py`) handles
the corpus at rest; this operator drops repeats *at ingestion time* so
downstream state (tokenizers, feature stores) never sees them. Built
on Spark's own watermarked duplicate-drop state store — per-key state
lives on the shuffle-partitioned executors, expires with the
watermark, and scales horizontally like any keyed state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit only the first occurrence of each distinct text.

    The dedup key is the md5 digest of the text (fixed 32-byte state
    per distinct doc, matching the batch ``exact_duplicates`` key, so
    streaming-then-batch pipelines agree on identity).

    With ``ts_col`` set, uses ``dropDuplicatesWithinWatermark``: two
    payloads whose digests collide within the watermark horizon are
    deduplicated, and state for digests older than the watermark is
    dropped — bounded state on an unbounded crawl. Without ``ts_col``
    the state is unbounded (exact global dedup; only for finite
    replays).
    """
    keyed = stream.withColumn("__digest", F.md5(F.col(text_col)))
    if ts_col is not None:
        if dict(keyed.dtypes).get(ts_col) == "timestamp_ntz":
            keyed = keyed.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        keyed = keyed.withWatermark(ts_col, watermark)
        out = keyed.dropDuplicatesWithinWatermark(["__digest"])
    else:
        out = keyed.dropDuplicates(["__digest"])
    return out.drop("__digest")
