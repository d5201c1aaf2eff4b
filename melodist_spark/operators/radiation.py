"""Shortwave radiation disaggregation.

Reference: `radiation.py:32-344`. The hourly scaling
``glob = pot_rad / pot_rad_daily · glob_daily`` is a window average
per (station, day) — no join against a separately aggregated daily
frame. Angstroem is linear in (a, b) so its "curve fit" collapses to a
closed-form two-regressor OLS aggregation; Bristow-Campbell's (A, C)
fit is genuinely nonlinear → grouped-map pandas UDF per station.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from melodist_spark.functions.solar import potential_radiation, sun_times_exprs
from melodist_spark.util.calendar import hourly_calendar

METHODS = ("pot_rad", "pot_rad_via_ssd", "pot_rad_via_bc", "mean_course")


def _with_station_meta(df: DataFrame, stations: DataFrame, keys: list[str]) -> DataFrame:
    return df.join(F.broadcast(stations.select(*keys, "lon", "lat", "timezone")), keys)


def bristow_campbell_exprs(
    daily: DataFrame,
    pot_rad_daily_col: str,
    a,
    c,
    keys: list[str],
    date_col: str = "date",
) -> DataFrame:
    """Attach a ``bc_rad`` column: Bristow & Campbell (1984) daily
    radiation from the diurnal temperature range (`radiation.py:207-248`).

    ``a``/``c`` may be floats or Columns (e.g. from a monthly params
    join). ``dT = tmax - (tmin + tmin_nextday)/2``; B from the monthly
    mean of dT; last day's tmin_nextday is its own tmin.
    """
    d = _bc_transmissivity(daily, a, c, keys, date_col)
    return d.withColumn(
        "bc_rad", F.col("__trans") * F.col(pot_rad_daily_col)
    ).drop("__trans")


def _bc_daily_terms(
    daily: DataFrame, keys: list[str], date_col: str = "date"
) -> DataFrame:
    """Attach the (a, c)-independent Bristow-Campbell daily terms
    ``__dT`` (diurnal range vs the next calendar day's tmin) and
    ``__B`` (the monthly-mean-dT decay coefficient) — split out so a
    multi-(a, c) caller evaluates the two windows once and derives
    each parameterization with :func:`_bc_trans_expr`."""
    w = Window.partitionBy(*keys).orderBy(date_col)
    nxt_ok = F.datediff(F.lead(date_col, 1).over(w), F.col(date_col)) == 1
    tmin_next = F.coalesce(
        F.when(nxt_ok, F.lead("tmin", 1).over(w)), F.col("tmin")
    )
    d = daily.withColumn("__dT", F.col("tmax") - (F.col("tmin") + tmin_next) / 2.0)
    wm = Window.partitionBy(*keys, F.month(date_col))
    return d.withColumn("__B", 0.036 * F.exp(-0.154 * F.avg("__dT").over(wm)))


def _bc_trans_expr(a, c) -> Column:
    """``a·(1 − exp(−B·dT^c))`` over the ``__dT``/``__B`` columns
    attached by :func:`_bc_daily_terms`."""
    a_col = a if isinstance(a, Column) else F.lit(float(a))
    c_col = c if isinstance(c, Column) else F.lit(float(c))
    return a_col * (1 - F.exp(-F.col("__B") * F.pow(F.col("__dT"), c_col)))


def _bc_transmissivity(
    daily: DataFrame, a, c, keys: list[str], date_col: str = "date"
) -> DataFrame:
    """Attach the Bristow-Campbell atmospheric transmissivity
    ``__trans = a·(1 − exp(−B·dT^c))`` — a pure daily-grain quantity
    (two narrow windows per station), computable *before* any hourly
    explode."""
    d = _bc_daily_terms(daily, keys, date_col)
    return d.withColumn("__trans", _bc_trans_expr(a, c)).drop("__dT", "__B")


def angstroem_expr(ssd, day_length, pot_rad_daily, a, b) -> Column:
    """Angstroem (1924): ``(a + b·ssd/daylength)·pot_rad_daily``
    (`radiation.py:283-311`)."""
    a_col = a if isinstance(a, Column) else F.lit(float(a))
    b_col = b if isinstance(b, Column) else F.lit(float(b))
    return (a_col + b_col * ssd / day_length) * pot_rad_daily


# keep reference-named aliases for API parity
angstroem = angstroem_expr
bristow_campbell = bristow_campbell_exprs


def disaggregate_radiation(
    daily: DataFrame,
    stations: DataFrame,
    method: str = "pot_rad",
    angstr_params: DataFrame | None = None,
    bristcamp_params: DataFrame | None = None,
    mean_course: DataFrame | None = None,
    angstr_a: float = 0.25,
    angstr_b: float = 0.5,
    bristcamp_a: float = 0.75,
    bristcamp_c: float = 2.4,
    keys: list[str] = ("station_id",),
    date_col: str = "date",
    ts_col: str = "ts",
) -> DataFrame:
    """Disaggregate daily global radiation to hourly values [W/m²].

    Methods (`radiation.py:32-101`):

    - pot_rad: scale the clear-sky curve by observed daily means
    - pot_rad_via_ssd: daily total from sunshine duration (Angstroem);
      monthly (a, b) from ``angstr_params`` (keys..., month, a, b) or
      scalar defaults
    - pot_rad_via_bc: daily total from temperature range
      (Bristow-Campbell); monthly (a, c) likewise
    - mean_course: use the calibrated mean diurnal course as the shape

    Returns (keys..., ts, glob). Values < 0.01 are floored to 0
    (`radiation.py:99`).
    """
    if method not in METHODS:
        raise ValueError("Invalid option")
    keys = list(keys)

    daily_cols = [c for c in ("glob", "ssd", "tmin", "tmax") if c in daily.columns]
    d = _with_station_meta(daily.select(*keys, date_col, *daily_cols), stations, keys)
    d = d.withColumns(sun_times_exprs(date_col, "lon", "lat", "timezone"))

    if method == "pot_rad_via_bc":
        # transmissivity is a daily-grain quantity: attach it BEFORE the
        # hourly explode, so the clear-sky curve is evaluated once and
        # no hourly↔daily join or re-aggregation exists in the plan
        # (glob = pot_rad·trans — the daily-mean normalization cancels)
        if bristcamp_params is not None:
            d = d.withColumn("__m", F.month(date_col)).join(
                F.broadcast(
                    bristcamp_params.withColumnRenamed("month", "__m")
                ),
                [*keys, "__m"],
                "left",
            )
            a_in, c_in = F.col("a"), F.col("c")
        else:
            a_in, c_in = F.lit(bristcamp_a), F.lit(bristcamp_c)
        d = _bc_transmissivity(d, a_in, c_in, keys, date_col).drop("__m")

    hourly = hourly_calendar(d, date_col=date_col, ts_col=ts_col)

    if method == "mean_course":
        assert mean_course is not None
        hourly = (
            hourly.withColumn("month", F.month(ts_col))
            .withColumn("hour", F.hour(ts_col))
            .join(
                F.broadcast(mean_course.withColumnRenamed("value", "pot_rad")),
                [*keys, "month", "hour"],
                "left",
            )
        )
    else:
        hourly = hourly.withColumn(
            "pot_rad",
            potential_radiation(ts_col, "lon", "lat", "timezone"),
        )

    wd = Window.partitionBy(*keys, F.to_date(ts_col))
    hourly = hourly.withColumn("pot_rad_daily", F.avg("pot_rad").over(wd))

    if method in ("pot_rad", "mean_course"):
        glob_daily = F.col("glob")
    elif method == "pot_rad_via_ssd":
        if angstr_params is not None:
            hourly = hourly.withColumn("month", F.month(ts_col)).join(
                F.broadcast(angstr_params), [*keys, "month"], "left"
            )
            a_col, b_col = F.col("a"), F.col("b")
        else:
            a_col, b_col = F.lit(angstr_a), F.lit(angstr_b)
        # polar nights (daylength <= 0) keep 0 (`radiation.py:79-87`)
        glob_daily = F.when(
            F.col("daylength") > 0,
            (a_col + b_col * F.try_divide(F.col("ssd"), F.col("daylength")))
            * F.col("pot_rad_daily"),
        ).otherwise(F.lit(0.0))
    else:  # pot_rad_via_bc — __trans attached pre-explode above
        glob_daily = F.col("__trans") * F.col("pot_rad_daily")

    # polar-night days have pot_rad_daily == 0; the reference's numpy
    # 0/0 yields NaN (`radiation.py:98`) — try_divide's null matches
    glob = F.try_divide(F.col("pot_rad"), F.col("pot_rad_daily")) * glob_daily
    glob = F.when(glob < 1e-2, 0.0).otherwise(glob)

    return hourly.select(*keys, ts_col, glob.alias("glob"))


def fit_angstroem_params(
    daily_with_sun: DataFrame,
    keys: list[str] = ("station_id",),
    months: list[int] | None = None,
    date_col: str = "date",
) -> DataFrame:
    """Closed-form least squares for the Angstroem (a, b).

    The model ``obs = a·pot + b·(ssd/daylength·pot)`` is linear in
    (a, b), so scipy's ``curve_fit`` (`radiation.py:314-344`) reduces
    to the 2×2 normal equations — exact, distributed, no UDF. Input
    needs columns ssd, daylength, pot_rad_daily, obs_rad_daily.
    Returns (keys..., a, b).
    """
    keys = list(keys)
    d = daily_with_sun.na.drop(
        subset=["ssd", "daylength", "pot_rad_daily", "obs_rad_daily"]
    ).filter(F.col("daylength") > 0)  # polar nights carry no information
    if months is not None:
        d = d.filter(F.month(date_col).isin(months))
    x1 = F.col("pot_rad_daily")
    x2 = F.try_divide(F.col("ssd"), F.col("daylength")) * F.col("pot_rad_daily")
    y = F.col("obs_rad_daily")
    agg = d.groupBy(*keys).agg(
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    a = (F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12")) / det
    b = (F.col("s2y") * F.col("s11") - F.col("s1y") * F.col("s12")) / det
    return agg.select(*keys, a.alias("a"), b.alias("b"))


def fit_bristow_campbell_params(
    daily: DataFrame,
    keys: list[str] = ("station_id",),
    date_col: str = "date",
    pin: bool = True,
) -> DataFrame:
    """Fit Bristow-Campbell (A, C) by minimizing |mean bias|.

    Non-convex scalar optimization (`radiation.py:251-280`) run per
    station over its ~365-row daily frame in a grouped-map pandas UDF
    (scipy.optimize.minimize when available, else our Nelder-Mead —
    same |mean bias| objective). Input needs tmin, tmax,
    pot_rad_daily, obs_rad_daily. Returns (keys..., a, c).
    """
    from melodist_spark.util.optimize import minimize2

    keys = list(keys)
    types = dict(daily.dtypes)
    schema = ", ".join(f"{k} {types[k]}" for k in keys) + ", a double, c double"

    prepared = (
        daily.select(*keys, date_col, "tmin", "tmax", "pot_rad_daily", "obs_rad_daily")
        .na.drop(subset=["tmin", "tmax", "pot_rad_daily", "obs_rad_daily"])
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(date_col)
        tmin = pdf["tmin"].to_numpy()
        tmax = pdf["tmax"].to_numpy()
        pot = pdf["pot_rad_daily"].to_numpy()
        obs = pdf["obs_rad_daily"].to_numpy()
        months = pd.DatetimeIndex(pd.to_datetime(pdf[date_col])).month

        tmin_next = np.append(tmin[1:], tmin[-1])
        dT = tmax - (tmin + tmin_next) / 2.0
        dT_m = pd.Series(dT).groupby(months).mean()
        B = 0.036 * np.exp(-0.154 * dT_m.loc[months].to_numpy())

        def absbias(ac):
            with np.errstate(invalid="ignore", over="ignore"):
                trans = ac[0] * (1 - np.exp(-B * dT ** ac[1]))
                v = np.abs(np.mean(trans * pot - obs))
            return v if np.isfinite(v) else 1e12

        x = minimize2(absbias, [0.75, 2.4])
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out.update(a=[float(x[0])], c=[float(x[1])])
        return pd.DataFrame(out)

    from ..util.execution import pin_partitions

    grouped = pin_partitions(prepared, keys) if pin else prepared
    return grouped.groupBy(*keys).applyInPandas(fit, schema=schema)
