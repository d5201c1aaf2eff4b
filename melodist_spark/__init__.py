"""melodist_spark — a PySpark-native meteorological time-series
disaggregation engine with the capabilities of kristianfoerster/melodist.

Everything operates on *long-format* DataFrames keyed by
``(station_id, ts)`` (hourly/sub-hourly) or ``(station_id, date)``
(daily), so a single job disaggregates many stations at once; the
reference library's single-station pandas objects map to the degenerate
one-station case.

Design principles (see SURVEY.md §7):
- declarative DataFrame plans; Catalyst handles pushdown/pruning/joins
- parameter tables are tiny → always broadcast-joined
- Python only inside `applyInPandas` kernels (cascade, scipy fits)
- deterministic, seedable randomness (the reference is unseeded)
"""

from melodist_spark.session import get_spark
from melodist_spark.util.calendar import (
    hourly_calendar,
    distribute_equally,
    seasonal_subset,
    sub_level_calendar,
)
from melodist_spark.util.gaps import detect_gaps, drop_incomplete_days
from melodist_spark.functions.meteo import (
    vapor_pressure,
    dewpoint_temperature,
)
from melodist_spark.functions.solar import sun_times, potential_radiation
from melodist_spark.operators.aggregations import (
    daily_from_hourly,
    mean_daily_course_by_month,
    month_hour_precip_mean,
)
from melodist_spark.operators.temperature import (
    disaggregate_temperature,
    get_shift_by_data,
)
from melodist_spark.operators.humidity import (
    disaggregate_humidity,
    dewpoint_regression,
)
from melodist_spark.operators.wind import disaggregate_wind, fit_cosine_function
from melodist_spark.operators.radiation import (
    disaggregate_radiation,
    angstroem,
    bristow_campbell,
    fit_angstroem_params,
    fit_bristow_campbell_params,
)
from melodist_spark.operators.precipitation import (
    disagg_prec,
    precip_master_station,
)
from melodist_spark.operators.cascade import (
    CascadeStatistics,
    build_casc,
    disagg_prec_cascade,
)
from melodist_spark.operators.asof import asof_join

__all__ = [
    "get_spark",
    "hourly_calendar",
    "distribute_equally",
    "seasonal_subset",
    "sub_level_calendar",
    "detect_gaps",
    "drop_incomplete_days",
    "vapor_pressure",
    "dewpoint_temperature",
    "sun_times",
    "potential_radiation",
    "daily_from_hourly",
    "mean_daily_course_by_month",
    "month_hour_precip_mean",
    "disaggregate_temperature",
    "get_shift_by_data",
    "disaggregate_humidity",
    "dewpoint_regression",
    "disaggregate_wind",
    "fit_cosine_function",
    "disaggregate_radiation",
    "angstroem",
    "bristow_campbell",
    "fit_angstroem_params",
    "fit_bristow_campbell_params",
    "disagg_prec",
    "precip_master_station",
    "CascadeStatistics",
    "build_casc",
    "disagg_prec_cascade",
    "asof_join",
]
