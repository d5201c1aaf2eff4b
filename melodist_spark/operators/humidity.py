"""Humidity disaggregation (daily → hourly).

Reference: `humidity.py:28-141`. All six methods are pure column
expressions over the hourly explode plus (for the dewpoint family) a
co-partitioned join with the hourly temperature series and broadcast
joins with tiny parameter tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from melodist_spark.functions.meteo import (
    dewpoint_temperature,
    linregress_agg,
    vapor_pressure,
)
from melodist_spark.util.calendar import hourly_calendar

METHODS = (
    "equal",
    "minimal",
    "dewpoint_regression",
    "min_max",
    "linear_dewpoint_variation",
    "month_hour_precip_mean",
)

PI = 3.141592653589793


def disaggregate_humidity(
    daily: DataFrame,
    method: str = "equal",
    hourly_temp: DataFrame | None = None,
    hum_params: DataFrame | None = None,
    month_hour_precip_mean: DataFrame | None = None,
    preserve_daily_mean: bool = False,
    keys: list[str] = ("station_id",),
    date_col: str = "date",
    ts_col: str = "ts",
    temp_disagg: dict | None = None,
) -> DataFrame:
    """Disaggregate daily humidity to hourly relative humidity [%].

    Args mirror `humidity.py:28-59`:

    - ``hourly_temp``: (keys..., ts, temp) hourly temperature — required
      by the dewpoint-family and min_max methods when ``temp_disagg``
      is not given. NOTE: this joins two hourly-grain tables (a full
      shuffle of the temperature series at fleet scale); prefer
      ``temp_disagg`` when the temperature comes from our own
      disaggregation.
    - ``temp_disagg``: kwargs for
      :func:`~melodist_spark.operators.temperature.disaggregate_temperature`
      (e.g. ``{"method": "sine_min_max", "min_max_time": "fix"}``).
      The temperature is then computed INLINE on the same exploded
      hourly calendar as the humidity — one explode, no hourly×hourly
      join, lineage stays co-partitioned (the plan's only exchanges
      are the daily-grain window and broadcasts).
    - ``hum_params``: (keys..., a0, a1, kr) dewpoint regression
      parameters per station
    - ``month_hour_precip_mean``: (keys..., month, hour, wet, hum_mean)
    - ``preserve_daily_mean``: subtract the daily bias of the
      disaggregated series (`humidity.py:112-118`)

    Result is clipped to [0, 100] (`humidity.py:120`).
    """
    assert method in METHODS, "Invalid option"
    keys = list(keys)

    daily_cols = [c for c in ("hum", "tmin", "tmax", "hum_min", "hum_max", "precip") if c in daily.columns]
    dew_family = method in (
        "minimal", "dewpoint_regression", "linear_dewpoint_variation"
    )
    fused = temp_disagg is not None and (dew_family or method == "min_max")

    # --- daily-grain prep: everything that is constant within a day is
    # computed BEFORE the hourly explode (dewpoint from the regression,
    # next-day dewpoint via a daily window) so neither mode needs an
    # hourly-grain re-aggregation or join for it -----------------------
    prep = daily
    prep_cols = list(daily_cols)
    if dew_family:
        if method == "minimal":
            # a0=0, a1=1 (`humidity.py:64-66`)
            prep = prep.withColumn("tdew", F.col("tmin"))
        else:
            assert hum_params is not None, "hum_params (a0, a1, kr) required"
            prep = prep.join(F.broadcast(hum_params), keys, "left")
            prep = prep.withColumn("tdew", F.col("a0") + F.col("a1") * F.col("tmin"))
        prep_cols.append("tdew")
        if method == "linear_dewpoint_variation":
            # next-day daily tdew, last day copies itself
            # (`humidity.py:80-81`)
            wd = Window.partitionBy(*keys).orderBy(date_col)
            prep = prep.withColumn(
                "tdew_next",
                F.coalesce(F.lead("tdew", 1).over(wd), F.col("tdew")),
            )
            prep_cols += ["tdew_next", "kr"]

    if fused:
        assert hourly_temp is None, "pass either hourly_temp or temp_disagg"
        from melodist_spark.operators.temperature import disaggregate_temperature

        base = disaggregate_temperature(
            prep,
            keys=keys,
            date_col=date_col,
            ts_col=ts_col,
            extra_cols=[date_col, *prep_cols],
            **temp_disagg,
        )
    else:
        base = hourly_calendar(
            prep.select(*keys, date_col, *prep_cols), date_col=date_col, ts_col=ts_col
        )

    if method == "equal":
        out = base.withColumn("hum_disagg", F.col("hum"))

    elif dew_family:
        assert fused or hourly_temp is not None, "hourly temperature required"
        if method == "linear_dewpoint_variation":
            # eq. (20)/(21) of Debele et al. (2007) (`humidity.py:73-86`)
            hour = F.hour(ts_col).cast("double")
            tdew_delta = 0.5 * F.sin(
                (hour + 1) * F.lit(PI) / F.col("kr") - F.lit(3.0 * PI / 4.0)
            )
            base = base.withColumn(
                "tdew",
                F.col("tdew")
                + hour / 24.0 * (F.col("tdew_next") - F.col("tdew"))
                + tdew_delta,
            )

        if fused:
            joined = base  # temp computed on this same exploded calendar
        else:
            joined = base.join(
                hourly_temp.select(*keys, ts_col, "temp"), [*keys, ts_col]
            )
        out = joined.withColumn(
            "hum_disagg",
            100.0
            * vapor_pressure(F.col("tdew"), 100.0)
            / vapor_pressure(F.col("temp"), 100.0),
        )

    elif method == "min_max":
        assert "hum_min" in daily.columns and "hum_max" in daily.columns, (
            "Minimum and maximum humidity must be present in data frame"
        )
        assert fused or hourly_temp is not None, "hourly temperature required"
        if fused:
            joined = base
        else:
            joined = base.join(
                hourly_temp.select(*keys, ts_col, "temp"), [*keys, ts_col]
            )
        # flat day (tmax == tmin): the reference's numpy ratio is ±inf
        # (→ 100/0 after the clip, sign of (temp-tmin)·(hum_min-hum_max))
        # and NaN only for temp == tmin or hum_min == hum_max (0·inf);
        # we reproduce that, with NaN expressed as null
        num = F.col("temp") - F.col("tmin")
        den = F.col("tmax") - F.col("tmin")
        diff = F.col("hum_min") - F.col("hum_max")
        flat = F.when(
            (num == 0) | (diff == 0), F.lit(None).cast("double")
        ).otherwise(
            F.when((num > 0) == (diff > 0), F.lit(100.0)).otherwise(F.lit(0.0))
        )
        out = joined.withColumn(
            "hum_disagg",
            F.when(den != 0, F.col("hum_max") + num / den * diff).otherwise(flat),
        )

    elif method == "month_hour_precip_mean":
        assert month_hour_precip_mean is not None
        # the day's wet flag is just daily precip > 0 (`humidity.py:105-110`)
        out = (
            base.withColumns(
                {
                    "wet": F.col("precip") > 0,
                    "month": F.month(ts_col),
                    "hour": F.hour(ts_col),
                }
            )
            .join(
                F.broadcast(month_hour_precip_mean),
                [*keys, "month", "hour", "wet"],
                "left",
            )
            .withColumn("hum_disagg", F.col("hum_mean"))
        )

    if preserve_daily_mean:
        wd = Window.partitionBy(*keys, F.to_date(ts_col))
        bias = F.avg("hum_disagg").over(wd) - F.col("hum")
        out = out.withColumn(
            "hum_disagg", F.col("hum_disagg") - F.coalesce(bias, F.lit(0.0))
        )

    # null-preserving clip: Spark's greatest/least skip nulls, which
    # would turn a null (the reference's NaN) into 0.0 — keep it null
    val = F.col("hum_disagg")
    clipped = F.when(
        val.isNull(), val
    ).otherwise(F.least(F.greatest(val, F.lit(0.0)), F.lit(100.0)))
    return out.select(*keys, ts_col, clipped.alias("hum"))


def dewpoint_regression(
    hourly: DataFrame,
    keys: list[str] = ("station_id",),
    ts_col: str = "ts",
    return_stats: bool = False,
) -> DataFrame:
    """Per-station OLS of daily-mean dewpoint on daily-min temperature.

    Reference `humidity.py:123-130`; the scipy fit collapses to the
    closed-form covariance/variance aggregation (one shuffle).
    Returns (keys..., a1, a0).
    """
    keys = list(keys)
    daily = (
        hourly.withColumn("tdew", dewpoint_temperature(F.col("temp"), F.col("hum")))
        .groupBy(*keys, F.to_date(ts_col).alias("date"))
        .agg(F.avg("tdew").alias("tdew"), F.min("temp").alias("tmin"))
        .na.drop(subset=["tdew", "tmin"])
    )
    aggs = linregress_agg("tmin", "tdew")
    if return_stats:
        aggs = aggs + [F.corr("tmin", "tdew").alias("r_value")]
    return daily.groupBy(*keys).agg(*aggs)
