"""Gap detection and incomplete-day trimming.

Replaces the reference's row-at-a-time Python loops
(`util/util.py:249-297` ``detect_gaps``, `util/util.py:300-352`
``drop_incomplete_days``) with window/aggregate plans that scale to
many stations: the loops become a lag-window predicate and a
min/max-per-station broadcast-join filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def detect_gaps(
    df: DataFrame,
    timestep: int,
    keys: list[str] = ("station_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Count index gaps per key group.

    A gap is a successive-timestamp difference != ``timestep`` seconds
    (`util/util.py:276-294`). Returns one row per key with ``n_gaps``.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    # unix_micros rejects TIMESTAMP_NTZ; cast NTZ through TIMESTAMP
    # (session tz is pinned by the entry points, and successive-row
    # DIFFERENCES are offset-invariant anyway)
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        ts = ts.cast("timestamp")
    diff = F.unix_micros(ts) - F.unix_micros(F.lag(ts, 1).over(w))
    return (
        df.select(*keys, ts_col)
        .withColumn("__d", diff)
        .groupBy(*keys)
        .agg(
            F.sum(
                F.when(
                    F.col("__d").isNotNull()
                    & (F.col("__d") != timestep * 1_000_000),
                    1,
                ).otherwise(0)
            ).alias("n_gaps")
        )
    )


def drop_incomplete_days(
    df: DataFrame,
    shift: int = 0,
    keys: list[str] = ("station_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Trim leading/trailing rows of incomplete days per station.

    Matches `util/util.py:300-352`: keep rows from the first timestamp
    with hour == shift (minute 0) through the last timestamp with
    hour == (shift - 1) % 24; interior gaps are untouched. The per-key
    head/tail scan becomes a tiny aggregate joined back (broadcast).
    """
    if shift > 23 or shift < 0:
        shift = 0
    first, last = shift, (shift - 1) % 24
    keys = list(keys)
    bounds = df.groupBy(*keys).agg(
        F.min(
            F.when(
                (F.hour(ts_col) == first) & (F.minute(ts_col) == 0), F.col(ts_col)
            )
        ).alias("__lo"),
        F.max(
            F.when(
                (F.hour(ts_col) == last) & (F.minute(ts_col) == 0), F.col(ts_col)
            )
        ).alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds), keys, "inner")
        .filter(F.col(ts_col).between(F.col("__lo"), F.col("__hi")))
        .drop("__lo", "__hi")
    )


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    keys: list[str] = ("station_id",),
    ts_col: str = "ts",
    out_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: consecutive rows of a key belong to
    the same session while the inter-row gap stays below ``gap``; a
    larger gap starts a new session. ``session_id`` is the 0-based
    session index per key.

    One shuffle (the per-key window sort): a session break is
    ``ts - lag(ts) >= gap``, and the running sum of breaks IS the
    session index — the standard window formulation, no self-join.
    For unbounded streams use :func:`streaming_sessions` (Spark's
    native watermarked session windows) instead; the boundary rule
    matches it exactly — Spark session windows are half-open
    ``[start, last + gap)``, so an event at precisely ``prev + gap``
    starts a NEW session on both paths.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(ts_col, 1).over(w)
    brk = F.when(
        prev.isNull() | (F.col(ts_col) - prev < F.expr(f"INTERVAL {gap}")),
        F.lit(0),
    ).otherwise(F.lit(1))
    return df.withColumn(
        out_col,
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
