"""Multi-station calibration-parameter bundle with JSON persistence.

Spark-first re-expression of ``StationStatistics``
(`stationstatistics.py:31-288`): every parameter family is a *long*
DataFrame keyed by station_id (broadcastable into the disaggregation
plans), instead of per-object pandas attributes. One calc_* call
calibrates **all** stations in one distributed job.

JSON layout: one document per station id, same field names as the
reference bundle (`stationstatistics.py:194-288`) so users can eyeball
parity; matrix-valued params are stored long-form.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from melodist_spark.operators.aggregations import (
    mean_daily_course_by_month,
    month_hour_precip_mean,
)
from melodist_spark.operators.cascade import build_casc
from melodist_spark.operators.humidity import dewpoint_regression
from melodist_spark.operators.radiation import (
    fit_angstroem_params,
    fit_bristow_campbell_params,
)
from melodist_spark.operators.temperature import get_shift_by_data
from melodist_spark.operators.wind import fit_cosine_function

MONTH_RANGES = {
    "all": [list(range(1, 13))],
    "seasonal": [[3, 4, 5], [6, 7, 8], [9, 10, 11], [12, 1, 2]],
    "monthly": [[m] for m in range(1, 13)],
}


class StationStatistics:
    """Parameter tables for all stations at once.

    Attributes (DataFrames, possibly None until calibrated):

    - ``wind``: (station_id, a, b, t_shift)
    - ``hum``: (station_id, a0, a1, kr)
    - ``hum_month_hour_precip_mean``: (station_id, month, hour, wet, hum_mean)
    - ``temp_max_delta``: (station_id, month, max_delta)
    - ``temp_mean_course``: (station_id, month, hour, value) normalized
    - ``glob_angstroem``: (station_id, month, a, b)
    - ``glob_bristcamp``: (station_id, month, a, c)
    - ``glob_mean_course``: (station_id, month, hour, value)
    - ``precip_stats``: build_casc output rows
    - ``precip_months``: list of month lists (seasons)
    """

    def __init__(self, data: DataFrame | None = None, stations: DataFrame | None = None):
        self.data = data  # hourly calibration observations
        self.stations = stations  # (station_id, lon, lat, timezone)
        self.wind: DataFrame | None = None
        self.hum: DataFrame | None = None
        self.hum_month_hour_precip_mean: DataFrame | None = None
        self.temp_max_delta: DataFrame | None = None
        self.temp_mean_course: DataFrame | None = None
        self.glob_angstroem: DataFrame | None = None
        self.glob_bristcamp: DataFrame | None = None
        self.glob_mean_course: DataFrame | None = None
        self.precip_stats: DataFrame | None = None
        self.precip_months: list[list[int]] | None = None

    # -- calibration ------------------------------------------------------

    def calc_wind_stats(self):
        """`stationstatistics.py:96-101`."""
        self.wind = fit_cosine_function(self.data)
        return self

    def calc_humidity_stats(self):
        """`stationstatistics.py:103-111` (kr fixed to 12)."""
        self.hum = dewpoint_regression(self.data).withColumn("kr", F.lit(12))
        self.hum_month_hour_precip_mean = month_hour_precip_mean(self.data)
        return self

    def calc_temperature_stats(self):
        """`stationstatistics.py:113-122`."""
        self.temp_max_delta = get_shift_by_data(self.data, self.stations)
        self.temp_mean_course = mean_daily_course_by_month(
            self.data, "temp", normalize=True
        )
        return self

    def calc_precipitation_stats(
        self, months=None, avg_stats: bool = True, percentile: float = 50
    ):
        """`stationstatistics.py:75-94`."""
        if months is None:
            months = MONTH_RANGES["all"]
        self.precip_months = [list(m) for m in months]
        self.precip_stats = build_casc(
            self.data, months=months, avg_stats=avg_stats, percentile=percentile
        )
        return self

    def calc_radiation_stats(self, data_daily: DataFrame | None = None, how: str = "all"):
        """`stationstatistics.py:124-192`: mean course always; Angstroem
        and Bristow-Campbell fits per month-range when daily data given."""
        assert how in MONTH_RANGES
        self.glob_mean_course = mean_daily_course_by_month(self.data, "glob")

        if data_daily is None:
            return self

        from melodist_spark.functions.solar import potential_radiation, sun_times_exprs
        from melodist_spark.util.calendar import hourly_calendar

        d = data_daily.join(
            F.broadcast(self.stations.select("station_id", "lon", "lat", "timezone")),
            "station_id",
        ).withColumns(sun_times_exprs("date", "lon", "lat", "timezone"))
        pot_daily = (
            hourly_calendar(d.select("station_id", "date", "lon", "lat", "timezone"))
            .withColumn(
                "pr",
                potential_radiation("ts", "lon", "lat", "timezone"),
            )
            .groupBy("station_id", "date")
            .agg(F.avg("pr").alias("pot_rad_daily"))
        )
        obs_daily = self.data.groupBy(
            "station_id", F.to_date("ts").alias("date")
        ).agg(F.avg("glob").alias("obs_rad_daily"))
        full = d.join(pot_daily, ["station_id", "date"]).join(
            obs_daily, ["station_id", "date"], "left"
        )

        ang_parts, bc_parts = [], []
        for months in MONTH_RANGES[how]:
            if "ssd" in data_daily.columns:
                a = fit_angstroem_params(full, months=months)
                ang_parts.append(
                    a.withColumn("month", F.explode(F.array(*[F.lit(m) for m in months])))
                )
            if "tmin" in data_daily.columns and "tmax" in data_daily.columns:
                sub = full.filter(F.month("date").isin(months))
                b = fit_bristow_campbell_params(sub)
                bc_parts.append(
                    b.withColumn("month", F.explode(F.array(*[F.lit(m) for m in months])))
                )
        if ang_parts:
            out = ang_parts[0]
            for p in ang_parts[1:]:
                out = out.unionByName(p)
            self.glob_angstroem = out.select("station_id", "month", "a", "b")
        if bc_parts:
            out = bc_parts[0]
            for p in bc_parts[1:]:
                out = out.unionByName(p)
            self.glob_bristcamp = out.select("station_id", "month", "a", "c")
        return self

    # -- persistence ------------------------------------------------------

    _FRAME_SPECS = {
        "wind": ["a", "b", "t_shift"],
        "hum": ["a0", "a1", "kr"],
        "hum_month_hour_precip_mean": ["month", "hour", "wet", "hum_mean"],
        "temp_max_delta": ["month", "max_delta"],
        "temp_mean_course": ["month", "hour", "value"],
        "glob_angstroem": ["month", "a", "b"],
        "glob_bristcamp": ["month", "a", "c"],
        "glob_mean_course": ["month", "hour", "value"],
        "precip_stats": [
            "season", "level", "p01", "p10", "pxx", "wxx", "threshold", "percentile",
        ],
    }

    def to_json(self, filename: str | None = None) -> str | None:
        """Serialize all parameter tables to one JSON document keyed by
        station id (reference: `stationstatistics.py:194-224`)."""
        bundle: dict = {}

        def put(attr: str):
            df = getattr(self, attr)
            if df is None:
                return
            cols = self._FRAME_SPECS[attr]
            for row in df.collect():
                st = bundle.setdefault(str(row["station_id"]), {})
                st.setdefault(attr, []).append({c: row[c] for c in cols})

        for attr in self._FRAME_SPECS:
            put(attr)
        for st in bundle.values():
            st["precip_months"] = self.precip_months

        j = json.dumps(bundle, indent=2, default=float)
        if filename is None:
            return j
        with open(filename, "w") as f:
            f.write(j)
        return None

    @classmethod
    def from_json(cls, spark: SparkSession, filename: str) -> "StationStatistics":
        """Rebuild the parameter DataFrames (reference:
        `stationstatistics.py:226-288`)."""
        with open(filename) as f:
            bundle = json.load(f)

        stats = cls()
        rows_by_attr: dict[str, list[dict]] = {}
        months = None
        for sid, st in bundle.items():
            months = st.get("precip_months") or months
            for attr, rows in st.items():
                if attr == "precip_months":
                    continue
                for r in rows:
                    rows_by_attr.setdefault(attr, []).append(
                        dict(station_id=sid, **r)
                    )
        stats.precip_months = months
        for attr, rows in rows_by_attr.items():
            cols = ["station_id"] + cls._FRAME_SPECS[attr]
            df = spark.createDataFrame(
                [[r[c] for c in cols] for r in rows], schema=cols
            )
            # ints that json round-trips as ints are fine; force doubles
            # for the float params
            setattr(stats, attr, df)
        return stats
