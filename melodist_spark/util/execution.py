"""Execution-shape helpers shared by the grouped-map operators."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pin_partitions(df: DataFrame, cols, n: int | None = None) -> DataFrame:
    """Hash-repartition by ``cols`` with an EXPLICIT partition count.

    AQE's ``coalescePartitions`` sizes post-shuffle partitions by
    *bytes*, which is the wrong signal in front of a compute-bound
    grouped map: a cascade/fit kernel expands or iterates far beyond
    its byte-small input, and letting AQE fold the 40k-row shuffle
    into one partition serializes the whole fleet onto a single task
    (measured 2×+ on the 5-minute cascade at sf0.1). An explicit
    ``repartition(n, cols)`` is a REPARTITION_BY_NUM exchange, which
    AQE is contractually not allowed to coalesce, and its
    HashPartitioning satisfies the downstream ``groupBy(cols)``
    distribution, so no second exchange is inserted.

    ``n`` defaults to the session's ``spark.sql.shuffle.partitions`` —
    exactly the pre-AQE plan. On byte-heavy inputs (cluster scale)
    that is what the shuffle would have used anyway, so pinning is
    never a regression; it only matters when the input is small and
    the kernel is not.
    """
    if n is None:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *[F.col(c) if isinstance(c, str) else c for c in cols])
