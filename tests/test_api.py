"""High-level Stations API: the reference user journey end-to-end
(`examples/examples.ipynb` cells 6-24)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from melodist_spark.api import Stations


@pytest.fixture(scope="module")
def st(stations, met_daily, met_hourly):
    s = Stations(stations, met_daily)
    s.calibrate(met_hourly)
    return s


def test_rejects_celsius_daily(stations, met_daily):
    with pytest.raises(ValueError, match="Kelvin"):
        Stations(stations, met_daily.withColumn("temp", F.col("temp") - 273.15))


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
