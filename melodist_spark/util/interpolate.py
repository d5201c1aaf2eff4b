"""Positional linear interpolation over windows.

Replaces ``Series.interpolate(method='linear', limit=..)`` used by the
reference for polar-night stitching (`temperature.py:239`) and the
generic ``Station.interpolate`` scaffold (`station.py:403-437`).
pandas' 'linear' method is positional (equally spaced, index ignored),
so the Spark equivalent works on ``row_number`` distances within each
station partition — two one-pass window frames, no Python worker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_linear(
    df: DataFrame,
    value_col: str,
    keys: list[str] = ("station_id",),
    ts_col: str = "ts",
    limit: int | None = None,
    limit_direction: str = "forward",
    out_col: str | None = None,
) -> DataFrame:
    """Fill nulls in ``value_col`` by positional linear interpolation.

    Semantics match ``pd.Series.interpolate(method='linear', limit=limit,
    limit_direction=limit_direction)``:

    - interior gaps: straight line between neighbouring valid values
    - trailing nulls: padded with last valid value (forward/both)
    - leading nulls: padded with first valid value only for 'both'
    - ``limit``: at most this many consecutive nulls are filled,
      counted from the valid value in fill direction
    """
    assert limit_direction in ("forward", "both", "backward")
    keys = list(keys)
    out_col = out_col or value_col

    pos_w = Window.partitionBy(*keys).orderBy(ts_col)
    prev_w = pos_w.rowsBetween(Window.unboundedPreceding, 0)
    next_w = pos_w.rowsBetween(0, Window.unboundedFollowing)

    v = F.col(value_col)
    pos = F.row_number().over(pos_w)
    df = df.withColumn("__pos", pos)
    valid_pos = F.when(v.isNotNull(), F.col("__pos"))

    prev_val = F.last(v, ignorenulls=True).over(prev_w)
    prev_pos = F.last(valid_pos, ignorenulls=True).over(prev_w)
    next_val = F.first(v, ignorenulls=True).over(next_w)
    next_pos = F.first(valid_pos, ignorenulls=True).over(next_w)

    df = (
        df.withColumn("__pv", prev_val)
        .withColumn("__pp", prev_pos)
        .withColumn("__nv", next_val)
        .withColumn("__np", next_pos)
    )

    frac = (F.col("__pos") - F.col("__pp")) / (F.col("__np") - F.col("__pp"))
    between = F.col("__pv") + frac * (F.col("__nv") - F.col("__pv"))

    dist_fwd = F.col("__pos") - F.col("__pp")  # nulls since last valid
    dist_bwd = F.col("__np") - F.col("__pos")

    fwd_ok = F.lit(True) if limit is None else dist_fwd <= limit
    bwd_ok = F.lit(True) if limit is None else dist_bwd <= limit

    if limit_direction == "forward":
        allowed = F.col("__pp").isNotNull() & fwd_ok
    elif limit_direction == "backward":
        allowed = F.col("__np").isNotNull() & bwd_ok
    else:  # both
        allowed = (F.col("__pp").isNotNull() & fwd_ok) | (
            F.col("__np").isNotNull() & bwd_ok
        )

    filled = (
        F.when(v.isNotNull(), v)
        .when(
            ~allowed, F.lit(None).cast("double")
        )
        .when(F.col("__pp").isNotNull() & F.col("__np").isNotNull(), between)
        .when(F.col("__pp").isNotNull(), F.col("__pv"))  # trailing pad
        .when(F.col("__np").isNotNull(), F.col("__nv"))  # leading pad (both)
    )

    return df.withColumn(out_col, filled).drop(
        "__pos", "__pv", "__pp", "__nv", "__np"
    )
