"""Wind disaggregation and the cosine-fit calibration.

Reference: `wind.py:28-93`. equal/cosine are pure column expressions;
``random`` uses Spark's seedable ``rand()`` (the reference draws from
an unseeded global RNG — we define reproducible behavior instead, see
SURVEY.md §4.2). The scipy ``curve_fit`` calibration runs per station
inside ``applyInPandas`` over the small calibration frame.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from melodist_spark.util.calendar import hourly_calendar

PI = 3.141592653589793

METHODS = ("equal", "cosine", "random")


def disaggregate_wind(
    daily: DataFrame,
    method: str = "equal",
    wind_params: DataFrame | None = None,
    seed: int = 42,
    keys: list[str] = ("station_id",),
    date_col: str = "date",
    ts_col: str = "ts",
) -> DataFrame:
    """Disaggregate daily wind speed to hourly values.

    - equal: replicate the daily mean (`wind.py:60-63`)
    - cosine: ``a·w̄·cos(π(h - t_shift)/12) + b·w̄`` (`wind.py:28-42`)
      with per-station (a, b, t_shift) from ``wind_params``
    - random: ``w̄·(-ln U)^0.3`` (`wind.py:69-70`), U from ``rand(seed)``

    Returns (keys..., ts, wind).
    """
    assert method in METHODS, "Invalid method"
    keys = list(keys)

    out = hourly_calendar(
        daily.select(*keys, date_col, "wind"), date_col=date_col, ts_col=ts_col
    )

    if method == "equal":
        wind = F.col("wind")
    elif method == "cosine":
        assert wind_params is not None, "wind_params (a, b, t_shift) required"
        out = out.join(F.broadcast(wind_params), keys, "left")
        h = F.hour(ts_col).cast("double")
        wind = F.col("a") * F.col("wind") * F.cos(
            F.lit(PI) * (h - F.col("t_shift")) / F.lit(12.0)
        ) + F.col("b") * F.col("wind")
    else:  # random
        wind = F.col("wind") * F.pow(-F.log(F.rand(seed)), F.lit(0.3))

    return out.select(*keys, ts_col, wind.alias("wind"))


def fit_cosine_function(
    hourly: DataFrame,
    keys: list[str] = ("station_id",),
    ts_col: str = "ts",
    wind_col: str = "wind",
) -> DataFrame:
    """Fit (a, b, t_shift) of the diurnal cosine per station.

    Reference `wind.py:75-93`: nonlinear least squares of
    ``a·w̄·cos(π(t-t_shift)/12) + b·w̄`` against observed hourly wind,
    with the daily mean replicated over the day. The fit itself is a
    scipy ``curve_fit`` on a ~10^4-row station frame → grouped-map
    pandas UDF; everything upstream is distributed.
    Returns (keys..., a, b, t_shift).
    """
    import scipy.optimize

    keys = list(keys)

    prepared = (
        hourly.select(*keys, ts_col, wind_col)
        .withColumn(
            "daily_mean",
            F.avg(wind_col).over(Window.partitionBy(*keys, F.to_date(ts_col))),
        )
        .withColumn("hour", F.hour(ts_col))
        .na.drop(subset=[wind_col, "daily_mean"])
    )

    schema = ", ".join(f"{k} string" for k in keys) + ", a double, b double, t_shift double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        def model(x, a, b, t_shift):
            mean_wind, t = x
            return a * mean_wind * np.cos(np.pi * (t - t_shift) / 12) + b * mean_wind

        x = np.array([pdf["daily_mean"].values, pdf["hour"].values.astype(float)])
        popt, _ = scipy.optimize.curve_fit(model, x, pdf[wind_col].values)
        res = {k: [pdf[k].iloc[0]] for k in keys}
        res.update(a=[popt[0]], b=[popt[1]], t_shift=[popt[2]])
        return pd.DataFrame(res)

    return prepared.groupBy(*keys).applyInPandas(fit, schema=schema)
