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
    pin: bool = True,
) -> DataFrame:
    """Fit (a, b, t_shift) of the diurnal cosine per station.

    Reference `wind.py:75-93` uses scipy ``curve_fit``; the model
    ``a·w̄·cos(π(t-t_shift)/12) + b·w̄`` is linear after the harmonic
    reparametrization ``α=a·cos(πt_s/12), β=a·sin(πt_s/12)``:
    ``w̄·(α·cos(πt/12) + β·sin(πt/12) + b)`` — so the *exact* least
    squares solution is a 3-regressor OLS (numpy lstsq per station in
    a grouped-map UDF; a = hypot(α,β), t_shift = 12/π·atan2(β,α)).
    Returns (keys..., a, b, t_shift).
    """
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

    types = dict(hourly.dtypes)
    schema = (
        ", ".join(f"{k} {types[k]}" for k in keys)
        + ", a double, b double, t_shift double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["daily_mean"].to_numpy()
        t = pdf["hour"].to_numpy(dtype=float)
        y = pdf[wind_col].to_numpy()
        ang = np.pi * t / 12.0
        X = np.column_stack([m * np.cos(ang), m * np.sin(ang), m])
        (alpha, beta, b), *_ = np.linalg.lstsq(X, y, rcond=None)
        a = float(np.hypot(alpha, beta))
        t_shift = float(12.0 / np.pi * np.arctan2(beta, alpha))
        res = {k: [pdf[k].iloc[0]] for k in keys}
        res.update(a=[a], b=[float(b)], t_shift=[t_shift])
        return pd.DataFrame(res)

    from ..util.execution import pin_partitions

    grouped = pin_partitions(prepared, keys) if pin else prepared
    return grouped.groupBy(*keys).applyInPandas(fit, schema=schema)
