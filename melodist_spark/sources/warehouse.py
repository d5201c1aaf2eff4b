"""Bucketed observation warehouse: the storage layout the 100 TB
deployment notes prescribe, as code.

Long observation tables shuffle on the station key in every
meteorological stage (daily aggregation, windows, stats joins,
grouped-map kernels). Writing them **bucketed and sorted by station**
moves that shuffle from every query into the one-time write: a scan
of a bucketed table already carries ``HashPartitioning(station)``, so
per-station windows and aggregations start WITHOUT an Exchange, and
two tables bucketed the same way sort-merge-join co-located. This is
the classic warehouse trade — pay the partitioning once at ingest,
amortize it over every downstream read.

Buckets are written one file per bucket (a repartition by the bucket
key precedes the write) so the on-disk sort order survives the read
and per-station window sorts can skip as well.

Uses the session catalog's managed/external table support — plain
parquet + catalog metadata, no extra services.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    key: str = "station_id",
    sort: tuple[str, ...] = ("station_id", "ts"),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed, sorted table.

    ``buckets`` should be sized so one bucket's rows fit an executor
    comfortably (~the deployment guide's shuffle-partition sizing;
    e.g. 4096 for a 100 TB observation table). ``path`` makes the
    table external (data at ``path``, metadata in the catalog).
    """
    w = (
        df.repartition(buckets, key)  # one file per bucket
        .write.bucketBy(buckets, key)
        .sortBy(*sort)
        .mode(mode)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; the scan carries the bucket
    partitioning, so station-keyed stages start exchange-free."""
    return spark.table(table)
