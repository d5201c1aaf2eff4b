"""Radiation and precipitation (equal/masterstation) invariants
(`tests/test_radiation.py`, `tests/test_precipitation.py`)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from melodist_spark.operators.aggregations import mean_daily_course_by_month
from melodist_spark.operators.precipitation import (
    disagg_prec,
    precip_master_station,
)
from melodist_spark.operators.radiation import (
    disaggregate_radiation,
    fit_angstroem_params,
    fit_bristow_campbell_params,
)


def test_radiation_pot_rad_preserves_daily_mean(met_daily, stations):
    out = disaggregate_radiation(met_daily, stations, method="pot_rad")
    re = out.groupBy("station_id", F.to_date("ts").alias("date")).agg(
        F.avg("glob").alias("m")
    )
    j = re.join(met_daily.select("station_id", "date", "glob"), ["station_id", "date"])
    # mid-latitude stations: daily means preserved
    # (`tests/test_radiation.py:20`); the <0.01 floor perturbs ~nothing
    bad = j.filter(
        (F.col("station_id") != "s3") & (F.abs(F.col("m") - F.col("glob")) > 0.02)
    )
    assert bad.count() == 0


def test_radiation_night_is_zero(met_daily, stations):
    out = disaggregate_radiation(
        met_daily.filter(F.col("station_id") == "s1"),
        stations.filter(F.col("station_id") == "s1"),
        method="pot_rad",
    )
    night = out.filter((F.hour("ts") <= 2) | (F.hour("ts") >= 23))
    assert night.filter(F.col("glob") > 1e-6).count() == 0
    assert out.filter(F.col("glob") < 0).count() == 0


def test_radiation_mean_course(met_hourly, met_daily, stations):
    mc = mean_daily_course_by_month(met_hourly, "glob")
    out = disaggregate_radiation(
        met_daily, stations, method="mean_course", mean_course=mc
    )
    re = out.groupBy("station_id", F.month("ts").alias("m")).agg(
        F.avg("glob").alias("got")
    )
    obs = met_daily.groupBy("station_id", F.month("date").alias("m")).agg(
        F.avg("glob").alias("exp")
    )
    j = re.join(obs, ["station_id", "m"])
    # monthly means within 10% (`tests/test_radiation.py:46` rtol=0.1)
    bad = j.filter(
        F.abs(F.col("got") - F.col("exp")) > 0.1 * F.abs(F.col("exp")) + 0.5
    )
    assert bad.count() == 0


def test_radiation_via_ssd_runs_and_nonnegative(met_daily, stations):
    out = disaggregate_radiation(met_daily, stations, method="pot_rad_via_ssd")
    assert out.count() == met_daily.count() * 24
    assert out.filter(F.col("glob") < 0).count() == 0


def test_radiation_via_bc_runs(met_daily, stations):
    out = disaggregate_radiation(met_daily, stations, method="pot_rad_via_bc")
    assert out.count() == met_daily.count() * 24
    assert out.filter(F.col("glob") < 0).count() == 0


def test_fit_angstroem_closed_form(spark, met_daily, stations, met_hourly):
    """The closed-form OLS must beat-or-match defaults on its own
    objective; sanity: recovers exact params on synthetic data."""
    from melodist_spark.functions.solar import sun_times_exprs

    d = met_daily.join(F.broadcast(stations), "station_id").withColumns(
        sun_times_exprs("date", F.col("lon"), F.col("lat"), F.col("timezone"))
    )
    # synthesize obs from known (a,b) = (0.3, 0.6)
    d = d.withColumn("pot_rad_daily", F.lit(200.0) + F.dayofyear("date"))
    d = d.withColumn(
        "obs_rad_daily",
        (0.3 + 0.6 * F.try_divide(F.col("ssd"), F.col("daylength")))
        * F.col("pot_rad_daily"),
    )
    fit = fit_angstroem_params(d).collect()
    for r in fit:
        assert r["a"] == pytest.approx(0.3, abs=1e-6)
        assert r["b"] == pytest.approx(0.6, abs=1e-6)


def test_fit_bristow_campbell_reduces_bias(spark, met_daily, stations):
    from melodist_spark.functions.solar import potential_radiation
    from melodist_spark.operators.radiation import bristow_campbell_exprs
    from melodist_spark.util.calendar import hourly_calendar

    d = met_daily.filter(F.col("station_id") == "s1").join(
        F.broadcast(stations), "station_id"
    )
    hourly = hourly_calendar(d).withColumn(
        "pr", potential_radiation(F.col("ts"), F.col("lon"), F.col("lat"), F.col("timezone"))
    )
    pot_daily = hourly.groupBy("station_id", "date").agg(
        F.avg("pr").alias("pot_rad_daily")
    )
    dd = d.join(pot_daily, ["station_id", "date"]).withColumn(
        "obs_rad_daily", F.col("glob")
    )
    fit = fit_bristow_campbell_params(dd).collect()[0]
    # fitted params give |mean bias| below the default params' bias
    def mean_bias(a, c):
        bc = bristow_campbell_exprs(dd, "pot_rad_daily", a, c, ["station_id"])
        return abs(
            bc.select(F.avg(F.col("bc_rad") - F.col("obs_rad_daily"))).collect()[0][0]
        )

    assert mean_bias(fit["a"], fit["c"]) <= mean_bias(0.75, 2.4) + 1e-6


def test_precip_equal_conserves(met_daily):
    out = disagg_prec(met_daily, method="equal")
    re = out.groupBy("station_id", F.to_date("ts").alias("date")).agg(
        F.sum("precip").alias("s")
    )
    j = re.join(met_daily.select("station_id", "date", "precip"), ["station_id", "date"])
    assert j.filter(F.abs(F.col("s") - F.col("precip")) > 1e-3).count() == 0


def test_precip_master_station(spark, met_daily, met_hourly):
    """Use s2's hourly pattern for s1's daily totals; daily sums must
    match s1 (`precipitation.py:375-413`) incl. the uniform fallback
    on master-dry days."""
    master = met_hourly.filter(F.col("station_id") == "s2").select(
        F.lit("s1").alias("station_id"), "ts", "precip"
    )
    daily_s1 = met_daily.filter(F.col("station_id") == "s1")
    out = precip_master_station(daily_s1, master)
    re = out.groupBy("station_id", F.to_date("ts").alias("date")).agg(
        F.sum("precip").alias("s")
    )
    j = re.join(daily_s1.select("station_id", "date", "precip"), ["station_id", "date"])
    assert j.filter(F.abs(F.col("s") - F.col("precip")) > 1e-3).count() == 0
    # uniform fallback days exist in the fixture (master dry, target wet)
    fallback_days = (
        met_hourly.filter(F.col("station_id") == "s2")
        .groupBy(F.to_date("ts").alias("date"))
        .agg(F.sum("precip").alias("ms"))
        .join(daily_s1, "date")
        .filter((F.col("ms") == 0) & (F.col("precip") > 0))
        .count()
    )
    assert fallback_days > 0


def test_radiation_with_fitted_monthly_params(spark, met_daily, stations, met_hourly):
    """pot_rad_via_bc / pot_rad_via_ssd driven by the calibrated
    monthly parameter tables (`stationstatistics.py:124-192`)."""
    from melodist_spark.statistics import StationStatistics

    s = StationStatistics(met_hourly, stations)
    s.calc_radiation_stats(data_daily=met_daily, how="seasonal")
    bc = disaggregate_radiation(
        met_daily, stations, method="pot_rad_via_bc",
        bristcamp_params=s.glob_bristcamp,
    )
    assert bc.count() == met_daily.count() * 24
    assert bc.filter(F.col("glob") < 0).count() == 0
    ssd = disaggregate_radiation(
        met_daily, stations, method="pot_rad_via_ssd",
        angstr_params=s.glob_angstroem,
    )
    assert ssd.filter(F.col("glob") < 0).count() == 0


def test_skill_scores(spark, met_hourly, met_daily, stations):
    """calc_stats metrics: perfect sim → r=1, rmse=0, nse=1."""
    from melodist_spark.functions.stats import skill_scores

    j = met_hourly.select(
        "station_id", F.col("temp").alias("obs"), F.col("temp").alias("sim")
    )
    out = skill_scores(j).toPandas().set_index("station_id")
    assert np.allclose(out["r"], 1.0)
    assert np.allclose(out["rmse"], 0.0, atol=1e-9)
    assert np.allclose(out["nse"], 1.0)

    # degraded sim: metrics worsen but stay in range
    j2 = met_hourly.select(
        "station_id",
        F.col("temp").alias("obs"),
        (F.col("temp") + 3 * F.rand(1)).alias("sim"),
    )
    out2 = skill_scores(j2).toPandas()
    assert (out2["rmse"] > 0.5).all()
    assert (out2["nse"] < 1.0).all() and (out2["nse"] > 0.9).all()


def test_q_radiation_proxy_variants_matches_public_ops(spark):
    """The registry row's shared-scan restructure (round 13): one
    explode / one clear-sky evaluation / fused day windows emitting
    all four method rows per hour — this pins each exploded branch
    row-identical (at the row's own round-6 grain) to the public
    ``disaggregate_radiation`` pipeline it bypasses."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    q = entry.q_radiation_proxy_variants(spark, sf_dir)

    def snap(df):
        # negative-dT winter days yield NaN globs by design (the
        # reference's numpy power); normalize for tuple equality
        def norm(v):
            return "nan" if isinstance(v, float) and v != v else v

        return sorted(tuple(norm(v) for v in r) for r in df.collect())

    branches = {
        "ssd": entry.q_radiation_ssd,
        "bc": entry.q_radiation_bc,
        "bc_fitted": entry.q_radiation_bc_fitted,
        "course": entry.q_radiation_course,
    }
    for method, fn in branches.items():
        got = snap(
            q.filter(F.col("method") == method).select(
                "user_id", "ts", "glob_h"
            )
        )
        want = snap(fn(spark, sf_dir))
        assert got == want, f"branch {method} diverged from the public op"
