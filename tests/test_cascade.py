"""Cascade model: calibration statistics validity + disaggregation
conservation/distribution invariants (SURVEY.md §2.8, §5).

Golden comparison against the reference is impossible (its RNG is
unseeded); statistical invariants + seeded reproducibility are the
correctness instruments, as in the reference's own test suite.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from melodist_spark.operators.cascade import (
    CascadeStatistics,
    aggregate_precipitation_values,
    build_casc,
    build_casc_values,
    collect_cascade_stats,
    disagg_prec_cascade,
)


def test_aggregate_statistics_are_probabilities():
    rng = np.random.default_rng(0)
    wet = rng.random(8760) < 0.3
    x = np.where(wet, rng.gamma(0.7, 2.0, 8760), 0.0)
    stats, v = aggregate_precipitation_values(x, percentile=50)
    assert len(v) == 4380
    # p01 + p10 + pxx = 1 per populated (intensity, boxtype) cell
    total = stats.p01 + stats.p10 + stats.pxx
    assert np.allclose(total, 1.0, atol=1e-9)
    # wxx sums to 1 over the 7 weight classes where pxx observed
    wsum = stats.wxx.sum(axis=0)
    assert np.allclose(wsum[~np.isnan(wsum)], 1.0, atol=1e-9)
    # pair sums conserve mass
    assert v.sum() == pytest.approx(x[: 2 * len(v)].sum())


def test_sparse_series_falls_back_to_sample_data():
    x = np.array([0.0, 1.0, 0.0, 0.0, 2.0, 0.0, 0.0, 0.0])
    stats, _ = aggregate_precipitation_values(x)
    ref = CascadeStatistics()
    ref.fill_with_sample_data()
    assert np.allclose(stats.p01, ref.p01)


def test_build_casc_values_threshold_levels():
    rng = np.random.default_rng(1)
    wet = rng.random(2 * 8760) < 0.35
    x = np.where(wet, rng.gamma(0.7, 2.0, len(wet)), 0.0)
    avg, per_level = build_casc_values(x, hourly=True)
    assert len(per_level) == 5
    assert len(avg.threshold) == 5
    # thresholds grow with aggregation scale
    assert np.all(np.diff(avg.threshold) > 0)
    assert np.allclose(avg.p01 + avg.p10 + avg.pxx, 1.0, atol=1e-9)


def test_build_casc_spark_matches_kernel(spark, met_hourly, met_hourly_pd):
    stats_df = build_casc(met_hourly, percentile=50)
    d = collect_cascade_stats(stats_df)
    got = d[("s1", 0)]

    pdf = met_hourly_pd[met_hourly_pd.station_id == "s1"].sort_values("ts")
    exp, _ = build_casc_values(pdf["precip"].to_numpy(), hourly=True)
    np.testing.assert_allclose(got.p01, exp.p01, atol=1e-12)
    np.testing.assert_allclose(got.wxx, exp.wxx, atol=1e-12)
    np.testing.assert_allclose(got.threshold, exp.threshold, atol=1e-12)


@pytest.fixture(scope="module")
def casc_stats(spark, met_hourly):
    return collect_cascade_stats(build_casc(met_hourly, percentile=50))


def test_disagg_cascade_conserves_daily_sums(met_daily, casc_stats):
    out = disagg_prec_cascade(met_daily, casc_stats, hourly=True, seed=11)
    assert out.count() == met_daily.count() * 24
    re = out.groupBy("station_id", F.to_date("ts").alias("date")).agg(
        F.sum("precip").alias("s")
    )
    j = re.join(met_daily.select("station_id", "date", "precip"), ["station_id", "date"])
    # conservation: daily sums preserved atol=1e-3
    # (`tests/test_precipitation.py:14`)
    assert j.filter(F.abs(F.col("s") - F.col("precip")) > 1e-3).count() == 0
    assert out.filter(F.col("precip") < 0).count() == 0


def test_disagg_cascade_seeded_reproducible(met_daily, casc_stats):
    a = disagg_prec_cascade(met_daily, casc_stats, seed=5).orderBy("station_id", "ts").toPandas()
    b = disagg_prec_cascade(met_daily, casc_stats, seed=5).orderBy("station_id", "ts").toPandas()
    c = disagg_prec_cascade(met_daily, casc_stats, seed=6).orderBy("station_id", "ts").toPandas()
    np.testing.assert_allclose(a["precip"].values, b["precip"].values, equal_nan=True)
    assert not np.allclose(
        np.nan_to_num(a["precip"].values), np.nan_to_num(c["precip"].values)
    )


def test_disagg_cascade_missing_days_masked(spark, casc_stats):
    pdf = pd.DataFrame(
        dict(
            station_id="s1",
            date=pd.date_range("2015-01-01", periods=20, freq="D").date,
            precip=[1.0, 2.0, np.nan, 4.0, 0.0] * 4,
        )
    )
    daily = spark.createDataFrame(pdf)
    out = disagg_prec_cascade(daily, casc_stats[("s1", 0)], seed=3)
    got = out.toPandas()
    got["date"] = got["ts"].dt.date
    nan_days = got[got.precip.isna()]["date"].unique()
    assert sorted(nan_days) == sorted(pdf[pdf.precip.isna()]["date"].unique())


def test_disagg_cascade_shift(spark, casc_stats):
    pdf = pd.DataFrame(
        dict(
            station_id="s1",
            date=pd.date_range("2015-01-01", periods=10, freq="D").date,
            precip=np.linspace(0, 9, 10),
        )
    )
    daily = spark.createDataFrame(pdf)
    base = disagg_prec_cascade(daily, casc_stats[("s1", 0)], seed=3).orderBy("ts").toPandas()
    shifted = (
        disagg_prec_cascade(daily, casc_stats[("s1", 0)], seed=3, shift=7)
        .orderBy("ts")
        .toPandas()
    )
    np.testing.assert_allclose(
        shifted["precip"].values[7:], base["precip"].values[:-7], equal_nan=True
    )
    assert shifted["precip"].values[:7].tolist() == [None] * 7 or np.isnan(
        shifted["precip"].values[:7]
    ).all()


def test_disagg_cascade_5min_conserves(spark, met_hourly, met_daily):
    """5-min path at level 9 (`precipitation.py:307-311`)."""
    # calibrate on a synthetic 5-min series for one station
    rng = np.random.default_rng(2)
    n = 288 * 200
    wet = rng.random(n) < 0.2
    x = np.where(wet, rng.gamma(0.5, 0.4, n), 0.0)
    avg, _ = build_casc_values(x, hourly=False, level=9)

    daily = met_daily.filter(F.col("station_id") == "s1").select(
        "station_id", "date", "precip"
    )
    out = disagg_prec_cascade(daily, avg, hourly=False, level=9, seed=9)
    n_days = daily.count()
    assert out.count() == n_days * 288
    re = out.groupBy(F.to_date("ts").alias("date")).agg(F.sum("precip").alias("s"))
    j = re.join(daily, "date")
    assert j.filter(F.abs(F.col("s") - F.col("precip")) > 1e-3).count() == 0


def test_per_level_stats_disagg(spark, met_hourly, met_daily):
    """avg_stats=False: one CascadeStatistics per level, the disagg
    consumes the 5-element list (`precipitation.py:108-123`)."""
    stats_df = build_casc(met_hourly, avg_stats=False)
    d = collect_cascade_stats(stats_df)
    lv = d[("s1", 0)]
    assert isinstance(lv, list) and len(lv) == 5
    daily = met_daily.filter(F.col("station_id") == "s1").select(
        "station_id", "date", "precip"
    )
    out = disagg_prec_cascade(daily, lv, seed=2)
    re = out.groupBy(F.to_date("ts").alias("date")).agg(F.sum("precip").alias("s"))
    j = re.join(daily, "date")
    assert j.filter(F.abs(F.col("s") - F.col("precip")) > 1e-3).count() == 0


def test_multi_season_calibration_and_disagg(spark, met_hourly, met_daily, stations):
    """Seasonal routing through the Stations API with 4 seasons
    (`station.py:338-348`)."""
    from melodist_spark.api import Stations

    st = Stations(stations, met_daily)
    from melodist_spark.statistics import StationStatistics, MONTH_RANGES

    s = StationStatistics(met_hourly, stations)
    s.calc_precipitation_stats(months=MONTH_RANGES["seasonal"])
    st.statistics = s
    out = st.disaggregate_precipitation("cascade", seed=4)
    assert out.count() == met_daily.count() * 24
    re = out.groupBy("station_id", F.to_date("ts").alias("date")).agg(
        F.sum("precip").alias("s")
    )
    j = re.join(met_daily.select("station_id", "date", "precip"), ["station_id", "date"])
    assert j.filter(F.abs(F.col("s") - F.col("precip")) > 1e-3).count() == 0


def test_disagg_stats_dataframe_matches_dict(met_hourly, met_daily, casc_stats):
    """The DataFrame stats path (per-station join, nothing collected to
    the driver) must reproduce the broadcast-dict path exactly."""
    stats_df = build_casc(met_hourly, percentile=50)
    via_df = (
        disagg_prec_cascade(met_daily, stats_df, seed=11)
        .orderBy("station_id", "ts")
        .toPandas()
    )
    via_dict = (
        disagg_prec_cascade(met_daily, casc_stats, seed=11)
        .orderBy("station_id", "ts")
        .toPandas()
    )
    np.testing.assert_allclose(
        via_df["precip"].values, via_dict["precip"].values, equal_nan=True
    )


def test_disagg_stats_dataframe_per_level(met_hourly, met_daily):
    """Per-level stats rows (avg_stats=False) reconstruct the 5-element
    list inside the kernel via the stats join."""
    stats_df = build_casc(met_hourly, avg_stats=False)
    d = collect_cascade_stats(stats_df)
    via_df = (
        disagg_prec_cascade(met_daily, stats_df, seed=2)
        .orderBy("station_id", "ts")
        .toPandas()
    )
    via_dict = (
        disagg_prec_cascade(met_daily, d, seed=2)
        .orderBy("station_id", "ts")
        .toPandas()
    )
    np.testing.assert_allclose(
        via_df["precip"].values, via_dict["precip"].values, equal_nan=True
    )


def test_multi_key_stations_not_merged(spark):
    """ADVICE r1: with composite keys, stations sharing the first key
    component must stay separate series (full-tuple grouping)."""
    stats = CascadeStatistics()
    stats.fill_with_sample_data()
    days = pd.date_range("2015-01-01", periods=30, freq="D").date
    pdf = pd.concat(
        [
            pd.DataFrame(dict(net="n1", sid="a", date=days, precip=2.0)),
            pd.DataFrame(dict(net="n1", sid="b", date=days, precip=5.0)),
        ],
        ignore_index=True,
    )
    daily = spark.createDataFrame(pdf)
    out = disagg_prec_cascade(
        daily, stats, seed=3, keys=["net", "sid"], station_buckets=4
    )
    got = out.groupBy("net", "sid", F.to_date("ts").alias("date")).agg(
        F.sum("precip").alias("s")
    ).toPandas()
    # daily conservation PER composite station — a keys[0]-only grouping
    # would interleave the two series and break it
    assert len(got) == 60
    a = got[got.sid == "a"]["s"]
    b = got[got.sid == "b"]["s"]
    np.testing.assert_allclose(a, 2.0, atol=1e-9)
    np.testing.assert_allclose(b, 5.0, atol=1e-9)


def test_emit_daily_matches_fullgrid_reagg(met_daily, casc_stats):
    """emit='daily' is the in-kernel partial aggregation of the exact
    same stochastic grid: per (station, date) it must equal the
    shuffle re-aggregation of the steps path, null-for-null."""
    for hourly, level, steps in ((True, 9, 24), (False, 9, 288)):
        opts = casc_stats if hourly else {
            k: [v] * 9 for k, v in casc_stats.items()
        }
        full = disagg_prec_cascade(
            met_daily, opts, hourly=hourly, level=level, seed=13
        )
        re = (
            full.groupBy("station_id", F.to_date("ts").alias("date"))
            .agg(F.sum("precip").alias("precip"))
            .orderBy("station_id", "date")
            .toPandas()
        )
        day = (
            disagg_prec_cascade(
                met_daily, opts, hourly=hourly, level=level, seed=13,
                emit="daily",
            )
            .orderBy("station_id", "date")
            .toPandas()
        )
        assert (day["n_steps"] == steps).all()
        np.testing.assert_allclose(
            day["precip"].to_numpy(dtype=float),
            re["precip"].to_numpy(dtype=float),
            atol=1e-9,
            equal_nan=True,
        )


def test_emit_daily_rejects_shift():
    stats = CascadeStatistics()
    stats.fill_with_sample_data()
    with pytest.raises(ValueError, match="shift"):
        disagg_prec_cascade(None, stats, shift=2, emit="daily")
