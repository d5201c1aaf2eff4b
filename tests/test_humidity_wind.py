"""Humidity and wind disaggregation: reference invariants
(`tests/test_humidity.py`, `tests/test_wind.py`) + pandas oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from melodist_spark.operators.aggregations import month_hour_precip_mean
from melodist_spark.operators.humidity import (
    dewpoint_regression,
    disaggregate_humidity,
)
from melodist_spark.operators.temperature import disaggregate_temperature
from melodist_spark.operators.wind import disaggregate_wind, fit_cosine_function


@pytest.fixture(scope="module")
def hourly_temp(met_daily):
    df = disaggregate_temperature(met_daily, method="sine_min_max", min_max_time="fix")
    df.cache().count()
    return df


HUM_METHODS = [
    "equal",
    "minimal",
    "dewpoint_regression",
    "min_max",
    "linear_dewpoint_variation",
    "month_hour_precip_mean",
]


@pytest.mark.parametrize("method", HUM_METHODS)
def test_humidity_bounds_all_methods(method, met_daily, met_hourly, hourly_temp, spark):
    kwargs = {}
    if method in ("minimal", "dewpoint_regression", "linear_dewpoint_variation", "min_max"):
        kwargs["hourly_temp"] = hourly_temp
    if method in ("dewpoint_regression", "linear_dewpoint_variation"):
        params = dewpoint_regression(met_hourly).withColumn("kr", F.lit(12))
        kwargs["hum_params"] = params
    if method == "month_hour_precip_mean":
        kwargs["month_hour_precip_mean"] = month_hour_precip_mean(met_hourly)

    out = disaggregate_humidity(met_daily, method=method, **kwargs)
    n = out.count()
    assert n > 0
    # bounds invariant: hum in [0, 100] (`tests/test_humidity.py:16-18`)
    bad = out.filter((F.col("hum") < -1e-9) | (F.col("hum") > 100 + 1e-9)).count()
    assert bad == 0


def test_humidity_equal_preserves_daily_mean(met_daily):
    out = disaggregate_humidity(met_daily, method="equal")
    re = out.groupBy("station_id", F.to_date("ts").alias("date")).agg(
        F.avg("hum").alias("m")
    )
    j = re.join(met_daily.select("station_id", "date", "hum"), ["station_id", "date"])
    bad = j.filter(F.abs(F.col("m") - F.col("hum")) > 1e-6).count()
    assert bad == 0


def _pd_vp(temp, hum):
    pos = temp >= 273.15
    return (
        np.where(
            pos,
            6.112 * np.exp(17.62 * (temp - 273.15) / (243.12 + temp - 273.15)),
            6.112 * np.exp(22.46 * (temp - 273.15) / (272.62 + temp - 273.15)),
        )
        * hum
        / 100.0
    )


def test_humidity_dewpoint_regression_matches_pandas(
    met_daily, met_hourly, hourly_temp
):
    """Full differential vs reference math (`humidity.py:63-120`) for
    dewpoint_regression + preserve_daily_mean, clip included."""
    params = dewpoint_regression(met_hourly).withColumn("kr", F.lit(12))
    got = (
        disaggregate_humidity(
            met_daily.filter(F.col("station_id") == "s1"),
            method="dewpoint_regression",
            hourly_temp=hourly_temp.filter(F.col("station_id") == "s1"),
            hum_params=params.filter(F.col("station_id") == "s1"),
            preserve_daily_mean=True,
        )
        .orderBy("ts")
        .toPandas()
    )

    p = params.filter(F.col("station_id") == "s1").collect()[0]
    daily = (
        met_daily.filter(F.col("station_id") == "s1")
        .select("date", "tmin", "hum")
        .orderBy("date")
        .toPandas()
    )
    daily["date"] = pd.to_datetime(daily["date"])
    daily = daily.set_index("date")
    temp_h = (
        hourly_temp.filter(F.col("station_id") == "s1").orderBy("ts").toPandas()
    ).set_index("ts")["temp"]

    idx = pd.date_range(
        daily.index.min(), daily.index.max() + pd.Timedelta(hours=23), freq="h"
    )
    tdew_daily = p["a0"] + p["a1"] * daily.tmin
    tdew = tdew_daily.reindex(idx, method="ffill")
    hum = 100.0 * _pd_vp(tdew.values, 100.0) / _pd_vp(temp_h.reindex(idx).values, 100.0)
    hum_s = pd.Series(hum, index=idx)
    bias = (hum_s.resample("D").mean() - daily.hum).reindex(idx, method="ffill").fillna(0)
    exp = (hum_s - bias).clip(0, 100)
    np.testing.assert_allclose(got["hum"].values, exp.values, atol=1e-9)


def test_dewpoint_regression_matches_ols(met_hourly, met_hourly_pd):
    got = dewpoint_regression(met_hourly).filter(F.col("station_id") == "s1").collect()[0]

    pdf = met_hourly_pd[met_hourly_pd.station_id == "s1"].set_index("ts")
    temp, hum = pdf.temp.values, pdf.hum.values
    pos = temp >= 273.15
    vp = np.where(
        pos,
        6.112 * np.exp(17.62 * (temp - 273.15) / (243.12 + temp - 273.15)),
        6.112 * np.exp(22.46 * (temp - 273.15) / (272.62 + temp - 273.15)),
    ) * hum / 100.0
    ln = np.log(vp / 6.112)
    tdew = np.where(pos, 243.12 * ln / (17.62 - ln), 272.62 * ln / (22.46 - ln)) + 273.15
    s = pd.Series(tdew, index=pdf.index)
    tdew_d = s.resample("D").mean()
    tmin_d = pdf.temp.resample("D").min()
    slope, intercept = np.polyfit(tmin_d.values, tdew_d.values, 1)
    assert got["a1"] == pytest.approx(slope, rel=1e-9)
    assert got["a0"] == pytest.approx(intercept, rel=1e-6)


def test_wind_equal_and_bounds(met_daily):
    out = disaggregate_wind(met_daily, method="equal")
    re = out.groupBy("station_id", F.to_date("ts").alias("date")).agg(
        F.avg("wind").alias("m")
    )
    j = re.join(met_daily.select("station_id", "date", "wind"), ["station_id", "date"])
    assert j.filter(F.abs(F.col("m") - F.col("wind")) > 1e-9).count() == 0


def test_wind_random_seeded_and_nonnegative(met_daily):
    a = disaggregate_wind(met_daily, method="random", seed=7).orderBy("station_id", "ts")
    b = disaggregate_wind(met_daily, method="random", seed=7).orderBy("station_id", "ts")
    assert a.filter(F.col("wind") < 0).count() == 0
    pa, pb = a.toPandas(), b.toPandas()
    np.testing.assert_allclose(pa["wind"].values, pb["wind"].values)


def test_wind_cosine_fit_roundtrip(spark, met_daily):
    """Generate hourly wind from a known (a,b,t_shift) cosine and check
    the scipy fit recovers it (`wind.py:75-93`)."""
    a_true, b_true, t_true = 0.4, 1.0, 2.0
    daily = met_daily.select("station_id", "date", "wind")
    hourly = disaggregate_wind(daily, method="equal")
    synth = hourly.withColumn(
        "wind",
        F.col("wind")
        * (
            a_true * F.cos(F.lit(np.pi) * (F.hour("ts") - t_true) / 12)
            + F.lit(b_true)
        ),
    )
    fit = fit_cosine_function(synth).filter(F.col("station_id") == "s1").collect()[0]
    # cosine has (a,t_shift) sign/period ambiguities; check the
    # reconstructed curve instead of raw params
    h = np.arange(24)
    got = fit["a"] * np.cos(np.pi * (h - fit["t_shift"]) / 12) + fit["b"]
    exp = a_true * np.cos(np.pi * (h - t_true) / 12) + b_true
    np.testing.assert_allclose(got, exp, atol=1e-6)


@pytest.mark.parametrize(
    "method", ["minimal", "dewpoint_regression", "linear_dewpoint_variation", "min_max"]
)
def test_fused_humidity_matches_join_path(method, met_daily, met_hourly, hourly_temp):
    """temp_disagg fusion (temperature computed on the humidity's own
    calendar explode) must be value-identical to the hourly_temp join
    path — same physics, one shuffle less."""
    kwargs = {}
    if method in ("dewpoint_regression", "linear_dewpoint_variation"):
        params = dewpoint_regression(met_hourly).withColumn("kr", F.lit(12))
        kwargs["hum_params"] = params
    joined = disaggregate_humidity(
        met_daily, method=method, hourly_temp=hourly_temp, **kwargs
    ).orderBy("station_id", "ts").toPandas()
    fused = disaggregate_humidity(
        met_daily,
        method=method,
        temp_disagg={"method": "sine_min_max", "min_max_time": "fix"},
        **kwargs,
    ).orderBy("station_id", "ts").toPandas()
    assert len(joined) == len(fused)
    np.testing.assert_allclose(
        joined["hum"].to_numpy(dtype=float),
        fused["hum"].to_numpy(dtype=float),
        atol=1e-9, equal_nan=True,
    )


def test_min_max_flat_day_reference_semantics(spark):
    """tmax == tmin: the reference's numpy ratio is ±inf → 100/0 after
    the clip; temp == tmin (0·inf) stays NaN (null here) — ADVICE r1."""
    daily = spark.createDataFrame(
        pd.DataFrame(
            dict(
                station_id=["s1"],
                date=[pd.Timestamp("2015-06-01").date()],
                tmin=[280.0],
                tmax=[280.0],
                hum_min=[40.0],
                hum_max=[80.0],
            )
        )
    )
    hours = pd.date_range("2015-06-01", periods=24, freq="h")
    temp = np.full(24, 280.0)
    temp[5] = 281.0  # > tmin → ratio +inf, diff<0 → -inf → clip 0
    temp[6] = 279.0  # < tmin → +inf → clip 100
    ht = spark.createDataFrame(
        pd.DataFrame(dict(station_id="s1", ts=hours, temp=temp))
    )
    out = (
        disaggregate_humidity(daily, method="min_max", hourly_temp=ht)
        .orderBy("ts")
        .toPandas()
    )
    assert out["hum"].iloc[5] == 0.0
    assert out["hum"].iloc[6] == 100.0
    assert np.isnan(out["hum"].iloc[0])  # temp == tmin → NaN/null


def test_q_humidity_variants_matches_public_ops(spark):
    """The registry row's shared-scan restructure (round 13): one
    fused sine-temperature chain (one neighbour window, one hourly
    explode) emitting all three variant rows per hour — pins each
    exploded branch row-identical (at the row's round-6 grain) to the
    public ``disaggregate_humidity`` pipeline it bypasses."""
    import os
    import sys

    import pyspark.sql.functions as F

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entry

    from melodist_spark.operators.humidity import disaggregate_humidity

    sf_dir = "/root/testdata/sf0.001"
    q = entry.q_humidity_variants(spark, sf_dir)
    daily = entry._met_daily(spark, sf_dir)
    temp_disagg = {"method": "sine_min_max", "min_max_time": "fix"}

    def snap(df):
        def norm(v):
            return "nan" if isinstance(v, float) and v != v else v

        return sorted(tuple(norm(v) for v in r) for r in df.collect())

    pub = {
        "minimal": disaggregate_humidity(
            daily, method="minimal", temp_disagg=temp_disagg,
            keys=["user_id"],
        ),
        "min_max": disaggregate_humidity(
            daily, method="min_max", temp_disagg=temp_disagg,
            keys=["user_id"],
        ),
    }
    for variant, df in pub.items():
        got = snap(
            q.filter(F.col("variant") == variant).select(
                "user_id", "ts", "hum_h"
            )
        )
        want = snap(
            df.select("user_id", "ts", F.round("hum", 6).alias("hum_h"))
        )
        assert got == want, f"branch {variant} diverged from the public op"

    got = snap(
        q.filter(F.col("variant") == "lindew").select(
            "user_id", "ts", "hum_h"
        )
    )
    want = snap(entry.q_humidity_lindew(spark, sf_dir))
    assert got == want, "branch lindew diverged from the public op"
