"""Custom stateful streaming operator: incremental daily→hourly
temperature disaggregation.

The batch sine kernel (`operators/temperature.py`, reference
`temperature.py:127-137`) needs the NEXT day's tmin (evening branch)
and the PREVIOUS day's tmax (pre-dawn branch) — a lead/lag window in
batch. On an unbounded stream of daily observations that window
becomes per-station state: each day is buffered until its successor
arrives, then emitted as 24 hourly rows. ``applyInPandasWithState``
keeps the state per station on the shuffle-partitioned executors, so
a fleet of millions of stations holds ~5 doubles each — no driver
involvement, no global sort.

Semantics match ``disaggregate_temperature(method='sine_min_max',
min_max_time='fix')`` exactly:

- consecutive next day        → evening hours blend toward its tmin
- gap after the buffered day  → evening values null (batch lead guard)
- first day ever seen         → pre-dawn falls back to its own tmax
  (batch ``is_first`` fill)
- stream end / idle station   → the buffered tail day is emitted on
  processing-time timeout with the batch ``is_last`` fallback
  (next tmin := own tmin)
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)

MIN_LOC_FIX = 7
MAX_LOC_FIX = 14


def _sine_day(
    epoch_day: int,
    tmin_cur: float,
    tmax_cur: float,
    tmax_before: float,
    tmin_next: float,
) -> pd.DataFrame:
    """24 hourly sine values for one day (numpy mirror of the batch
    column expressions; property-tested equal to the batch plan)."""
    hours = np.arange(24)
    minv = np.where(hours < MAX_LOC_FIX, tmin_cur, tmin_next)
    maxv = np.where(hours < MIN_LOC_FIX, tmax_before, tmax_cur)
    delta = maxv - minv
    temp = minv + delta / 2.0 + delta / 2.0 * np.cos(
        2.0 * math.pi / 24.0 * (hours - MAX_LOC_FIX)
    )
    base = pd.Timestamp(epoch_day, unit="D")
    return pd.DataFrame(
        {"ts": base + pd.to_timedelta(hours, unit="h"), "temp": temp}
    )


def _emit(
    key: Tuple[Any, ...],
    keys: list[str],
    pend: Tuple[int, float, float, float],
    tmin_next: float,
) -> pd.DataFrame:
    day, tmin_cur, tmax_cur, tmax_before = pend
    out = _sine_day(day, tmin_cur, tmax_cur, tmax_before, tmin_next)
    for k, v in zip(keys, key):
        out[k] = v
    return out[[*keys, "ts", "temp"]]


def streaming_disaggregate_temperature(
    daily_stream: DataFrame,
    keys: list[str] = ("station_id",),
    date_col: str = "date",
    idle_flush: str | None = "30 seconds",
) -> DataFrame:
    """Daily (keys..., date, tmin, tmax) stream → hourly temp stream.

    One shuffle (the groupBy hash partitioning); state is a 4-field
    tuple per station. ``idle_flush`` is the processing-time timeout
    after which a station's buffered tail day is emitted with the
    batch last-row fallback; ``None`` disables the flush (the tail
    day stays buffered until its successor arrives — use for
    finite replays where a trailing partial result is unwanted).
    """
    keys = list(keys)
    key_fields = [daily_stream.schema[k] for k in keys]
    out_schema = StructType(
        [*key_fields,
         StructField("ts", TimestampType()),
         StructField("temp", DoubleType())]
    )
    # (pend_day epoch-days, pend_tmin, pend_tmax, pend_tmax_before)
    state_schema = StructType(
        [StructField("pend_day", IntegerType()),
         StructField("pend_tmin", DoubleType()),
         StructField("pend_tmax", DoubleType()),
         StructField("pend_tmax_before", DoubleType())]
    )
    flush_ms = _duration_ms(idle_flush) if idle_flush is not None else None

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            if state.exists:
                pend = state.get
                # batch is_last fallback: next tmin := own tmin
                yield _emit(key, keys, pend, pend[1])
            state.remove()
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            if flush_ms is not None:
                state.setTimeoutDuration(flush_ms)
            return
        rows = rows.sort_values(date_col)
        days = (
            pd.to_datetime(rows[date_col]).values.astype("datetime64[D]")
            .astype("int64")
        )
        tmins = rows["tmin"].to_numpy(dtype=float)
        tmaxs = rows["tmax"].to_numpy(dtype=float)

        pend = state.get if state.exists else None
        outs = []
        for day, tmin, tmax in zip(days, tmins, tmaxs):
            day = int(day)
            if pend is not None:
                consecutive = day == pend[0] + 1
                # gap → batch lead-guard: evening half has no next tmin
                outs.append(
                    _emit(key, keys, pend, tmin if consecutive else np.nan)
                )
                tmax_before = pend[2] if consecutive else np.nan
            else:
                # first day ever seen: batch is_first fill (own tmax)
                tmax_before = tmax
            pend = (day, float(tmin), float(tmax), float(tmax_before))
        state.update(pend)
        if flush_ms is not None:
            state.setTimeoutDuration(flush_ms)
        if outs:
            yield pd.concat(outs, ignore_index=True)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if flush_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        daily_stream.groupBy(*keys)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def _duration_ms(s: str) -> int:
    n, unit = s.split()
    n = int(n)
    return n * {"millisecond": 1, "second": 1000, "minute": 60_000,
                "hour": 3_600_000}[unit.rstrip("s")]
