"""High-level Stations API: the reference user journey end-to-end
(`examples/examples.ipynb` cells 6-24)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from melodist_spark.api import Stations


@pytest.fixture(scope="module")
def st(stations, met_daily, met_hourly):
    s = Stations(stations, met_daily)
    s.calibrate(met_hourly)
    return s


def test_rejects_celsius_daily(stations, met_daily):
    celsius = met_daily.withColumn("temp", F.col("temp") - 273.15)
    # default lazy validation: the raise_error column fires on the
    # first action over the plan, costing no extra ingest pass
    s = Stations(stations, celsius)
    with pytest.raises(Exception, match="Kelvin"):
        s.data_daily.collect()
    # eager mode reproduces the reference's raise-at-assignment
    with pytest.raises(ValueError, match="Kelvin"):
        Stations(stations, celsius, validate="eager")


def test_sun_times(st):
    sun = st.calc_sun_times()
    assert set(["sunrise", "sunnoon", "sunset", "daylength"]) <= set(sun.columns)
    assert sun.filter(F.col("daylength") > 24.01).count() == 0


def test_full_pipeline_all_variables(st, met_daily):
    t = st.disaggregate_temperature("sine_min_max", min_max_time="sun_loc_shift")
    h = st.disaggregate_humidity("dewpoint_regression")
    w = st.disaggregate_wind("cosine")
    g = st.disaggregate_radiation("pot_rad")
    p = st.disaggregate_precipitation("cascade", seed=1)

    n = met_daily.count() * 24
    assert t.count() == n
    assert h.count() == n
    assert w.count() == n
    assert g.count() == n
    assert p.count() == n
    assert set(st.data_disagg) == {"temp", "hum", "wind", "glob", "precip"}

    # precipitation conservation through the seasonal cascade route
    re = p.groupBy("station_id", F.to_date("ts").alias("date")).agg(
        F.sum("precip").alias("s")
    )
    j = re.join(met_daily.select("station_id", "date", "precip"), ["station_id", "date"])
    assert j.filter(F.abs(F.col("s") - F.col("precip")) > 1e-3).count() == 0


def test_interpolate_scaffold(st, met_daily):
    out = st.interpolate({"tmin": 7, "tmax": 14})
    assert out.count() == met_daily.count() * 24
    # anchors preserved exactly
    j = (
        out.filter(F.hour("ts") == 7)
        .withColumn("date", F.to_date("ts"))
        .join(met_daily.select("station_id", "date", "tmin"), ["station_id", "date"])
    )
    assert j.filter(F.abs(F.col("value") - F.col("tmin")) > 1e-9).count() == 0


def test_spline_fill_reproduces_cubic():
    """A not-a-knot spline through >=4 samples of a cubic polynomial IS
    that polynomial — exactness by construction, no scipy needed."""
    from melodist_spark.util.interpolate import _spline_fill

    x = np.arange(24, dtype=float)
    poly = 0.5 * x**3 - 2.0 * x**2 + 3.0 * x + 1.0
    y = poly.copy()
    holes = [2, 3, 7, 11, 12, 13, 19]
    y[holes] = np.nan
    got = _spline_fill(y)
    assert np.allclose(got, poly, atol=1e-8)
    # knots bit-identical
    keep = np.setdiff1d(np.arange(24), holes)
    assert np.array_equal(got[keep], poly[keep])


def test_spline_fill_edges_and_small_n():
    from melodist_spark.util.interpolate import _spline_fill

    # leading/trailing NaNs untouched (no extrapolation)
    y = np.array([np.nan, 1.0, np.nan, 3.0, np.nan])
    got = _spline_fill(y)
    assert np.isnan(got[0]) and np.isnan(got[4])
    assert got[2] == pytest.approx(2.0)  # 2 knots -> chord

    # 3 knots -> the unique parabola
    x = np.arange(5, dtype=float)
    par = 2.0 * x**2 - 3.0 * x + 1.0
    y = par.copy()
    y[[1, 3]] = np.nan
    assert np.allclose(_spline_fill(y), par, atol=1e-9)

    # all-NaN and single-knot series pass through
    assert np.isnan(_spline_fill(np.array([np.nan, np.nan]))).all()


def test_interpolate_spline_distributed(spark):
    """Kernel vs the same numpy fill, two stations, shuffled input."""
    from melodist_spark.util.interpolate import _spline_fill, interpolate_spline

    ts = pd.date_range("2014-01-01", periods=48, freq="h")
    frames = []
    for sid, seed in [("a", 1), ("b", 2)]:
        rng = np.random.default_rng(seed)
        y = np.sin(np.arange(48) / 5.0) * 10 + rng.normal(0, 0.1, 48)
        y[rng.choice(np.arange(4, 44), 10, replace=False)] = np.nan
        frames.append(
            pd.DataFrame({"station_id": sid, "ts": ts, "value": y})
        )
    pdf = pd.concat(frames)
    df = spark.createDataFrame(pdf.sample(frac=1.0, random_state=0))

    out = (
        interpolate_spline(df, "value", ts_col="ts")
        .toPandas()
        .sort_values(["station_id", "ts"])
    )
    for sid in ("a", "b"):
        want = _spline_fill(
            pdf[pdf.station_id == sid].sort_values("ts")["value"].to_numpy()
        )
        got = out[out.station_id == sid]["value"].to_numpy()
        assert np.allclose(got, want, equal_nan=True)


def test_api_interpolate_cubic(st, met_daily):
    out = st.interpolate({"tmin": 7, "tmax": 14}, method="cubic")
    assert out.count() == met_daily.count() * 24
    # anchors preserved exactly
    j = (
        out.filter(F.hour("ts") == 14)
        .withColumn("date", F.to_date("ts"))
        .join(met_daily.select("station_id", "date", "tmax"), ["station_id", "date"])
    )
    assert j.filter(F.abs(F.col("value") - F.col("tmax")) > 1e-9).count() == 0
    # interior hours between anchors are filled
    mid = out.filter(F.hour("ts").isin(8, 9, 10, 11, 12, 13))
    assert mid.filter(F.col("value").isNull()).count() == 0
