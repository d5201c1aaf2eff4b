"""Multiplicative random cascade for precipitation (Olsson 1998).

Reference: `cascade.py` (statistics container), `precipitation.py:74-372`
(disaggregation), `precipitation.py:416-604` (calibration),
`precipitation.py:631-702` (build_casc).

Spark mapping (SURVEY.md §2.8): both directions run as grouped-map
pandas UDFs partitioned by station — a station-season of hourly data is
~10^4 rows, far below a task's memory, and stations are embarrassingly
parallel. Inside the kernel the reference's per-box Python loops are
replaced by numpy vectorization over whole levels (every box of a level
branches simultaneously with pre-drawn random arrays). Randomness is
seeded per station (crc32 of the id XOR a user seed) — the reference
uses an unseeded global RNG; we define reproducible behavior.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util.execution import pin_partitions

#: class boundaries of the weight histogram (`precipitation.py:143`)
WCLASSBOUNDS = np.array([0.0, 0.1429, 0.2857, 0.4286, 0.5714, 0.7143, 0.8571, 1.0])
WLOWER = WCLASSBOUNDS[:7]
WUPPER = WCLASSBOUNDS[1:]

#: µs per box at cascade level 11 (`precipitation.py:706`)
LEVEL11_STEP_US = 42_187_500


class BoxTypes:
    """Position of a wet box relative to its neighbours (`cascade.py:29-34`)."""

    dry, starting, enclosed, ending, isolated = range(5)


class CascadeStatistics:
    """Branching statistics of one station(-season): P(0/1), P(1/0),
    P(x/x) per (intensity class, box type) and the 7-bin left-weight
    histogram (`cascade.py:37-153`).
    """

    def __init__(self):
        self.p01 = np.zeros((2, 4))
        self.p10 = np.zeros((2, 4))
        self.pxx = np.zeros((2, 4))
        self.wxx = np.zeros((7, 2, 4))
        self.threshold = np.array([1.67093133, 2.46694444, 3.66730902, 5.39878419, 8.04924471])
        self.percentile = 50

    def fill_with_sample_data(self):
        """Fallback statistics for too-short calibration series
        (`cascade.py:52-109`; values are the published sample dataset's
        parameters, kept verbatim as behavioral parity data).
        """
        self.p01 = np.array(
            [
                [0.576724636119866, 0.238722774405744, 0.166532122130638, 0.393474644666218],
                [0.303345245644811, 0.0490956843857575, 0.0392403031072856, 0.228441890034704],
            ]
        )
        self.p10 = np.array(
            [
                [0.158217002255554, 0.256581140990052, 0.557852226779526, 0.422638238585814],
                [0.0439831163244427, 0.0474928027621488, 0.303675296728195, 0.217512052135178],
            ]
        )
        self.pxx = np.array(
            [
                [0.265058361624580, 0.504696084604205, 0.275615651089836, 0.183887116747968],
                [0.652671638030746, 0.903411512852094, 0.657084400164519, 0.554046057830118],
            ]
        )
        self.wxx = np.array(
            [
                [
                    [0.188389148850583, 0.0806836453984190, 0.0698113025807722, 0.0621499191745602],
                    [0.240993281622128, 0.0831019646519721, 0.0415130545715575, 0.155284541403192],
                ],
                [
                    [0.190128959522795, 0.129220679033862, 0.0932213021787505, 0.193080698516532],
                    [0.196379692358065, 0.108549414860949, 0.0592714297292217, 0.0421945385836429],
                ],
                [
                    [0.163043672107111, 0.152063537378127, 0.102823783410167, 0.0906028835221283],
                    [0.186579466868095, 0.189705690316132, 0.0990207345993082, 0.107831389238912],
                ],
                [
                    [0.197765724699431, 0.220046257566978, 0.177876233348082, 0.261288786454262],
                    [0.123823472714948, 0.220514673922285, 0.102486496386323, 0.101975538893918],
                ],
                [
                    [0.114435243444815, 0.170857634762767, 0.177327072603662, 0.135362730582518],
                    [0.0939211776723413, 0.174291820501902, 0.125275822078525, 0.150842841725936],
                ],
                [
                    [0.0988683809545079, 0.152323481100248, 0.185606883566286, 0.167242856061538],
                    [0.0760275616817939, 0.127275603247149, 0.202466168603738, 0.186580243138018],
                ],
                [
                    [0.0473688704207573, 0.0948047647595988, 0.193333422312280, 0.0902721256884624],
                    [0.0822753470826286, 0.0965608324996108, 0.369966294031327, 0.255290907016382],
                ],
            ]
        )

    def to_dict(self) -> dict:
        return dict(
            p01=self.p01.tolist(),
            p10=self.p10.tolist(),
            pxx=self.pxx.tolist(),
            wxx=self.wxx.tolist(),
            threshold=np.asarray(self.threshold).tolist(),
            percentile=self.percentile,
        )

    @classmethod
    def from_dict(cls, d: dict) -> "CascadeStatistics":
        casc = cls()
        casc.p01 = np.array(d["p01"])
        casc.p10 = np.array(d["p10"])
        casc.pxx = np.array(d["pxx"])
        casc.wxx = np.array(d["wxx"])
        casc.threshold = np.array(d["threshold"])
        casc.percentile = d["percentile"]
        assert casc.p01.shape == (2, 4)
        assert casc.wxx.shape == (7, 2, 4)
        return casc

    def __eq__(self, other):
        return (
            np.array_equal(self.p01, other.p01)
            and np.array_equal(self.p10, other.p10)
            and np.array_equal(self.pxx, other.pxx)
            and np.array_equal(self.wxx, other.wxx)
            and np.array_equal(self.threshold, other.threshold)
            and self.percentile == other.percentile
        )


def _box_types(x: np.ndarray) -> np.ndarray:
    """Vectorized box-type classification (`precipitation.py:474-497`):
    edges treat out-of-range neighbours as dry."""
    wet = x > 0
    prev_wet = np.concatenate(([False], wet[:-1]))
    next_wet = np.concatenate((wet[1:], [False]))
    bt = np.zeros(len(x), dtype=np.int64)
    bt[wet & ~prev_wet & next_wet] = BoxTypes.starting
    bt[wet & prev_wet & next_wet] = BoxTypes.enclosed
    bt[wet & prev_wet & ~next_wet] = BoxTypes.ending
    bt[wet & ~prev_wet & ~next_wet] = BoxTypes.isolated
    return bt


def aggregate_precipitation_values(
    x: np.ndarray, percentile: float = 50
) -> tuple[CascadeStatistics, np.ndarray]:
    """One dyadic aggregation step with branching statistics.

    Vectorized equivalent of `precipitation.py:416-604`: pair adjacent
    steps, classify the upper-level boxes, count branch types and the
    left-weight histogram, normalize to probabilities, and fall back to
    sample statistics when the series is too short.
    Returns (stats, paired_values).
    """
    stats = CascadeStatistics()
    stats.percentile = percentile

    n = len(x) // 2
    r1 = x[0 : 2 * n : 2].astype(float)
    r2 = x[1 : 2 * n : 2].astype(float)
    v = r1 + r2

    wet = v > 0
    if not wet.any():
        stats.fill_with_sample_data()
        stats.threshold = np.array([0.0])
        return stats, v

    meanvol = np.percentile(v[wet], percentile)
    stats.threshold = np.array([meanvol])

    bt = _box_types(v)
    ba = (v > meanvol).astype(np.int64)
    cell = ba * 4 + (bt - 1)  # flat (intensity, boxtype) cell, wet only

    nb = np.bincount(cell[wet], minlength=8).astype(float).reshape(2, 4)

    m01 = wet & (r1 == 0) & (r2 > 0)
    m10 = wet & (r1 > 0) & (r2 == 0)
    mxx = wet & (r1 > 0) & (r2 > 0)

    c01 = np.bincount(cell[m01], minlength=8).astype(float).reshape(2, 4)
    c10 = np.bincount(cell[m10], minlength=8).astype(float).reshape(2, 4)
    cxx = np.bincount(cell[mxx], minlength=8).astype(float).reshape(2, 4)

    w = r1[mxx] / (r1[mxx] + r2[mxx])
    # bins are (wlower, wupper] (`precipitation.py:549-551`)
    k = np.searchsorted(WUPPER, w, side="left")
    k = np.clip(k, 0, 6)
    wxx_counts = np.zeros((7, 8))
    np.add.at(wxx_counts, (k, cell[mxx]), 1.0)
    wxx_counts = wxx_counts.reshape(7, 2, 4)

    with np.errstate(divide="ignore", invalid="ignore"):
        stats.p01 = c01 / nb
        stats.p10 = c10 / nb
        stats.pxx = cxx / nb
        stats.wxx = wxx_counts / cxx[None, :, :]

    if (
        np.isnan(stats.p01).any()
        or np.isnan(stats.p10).any()
        or np.isnan(stats.pxx).any()
    ):
        # too-sparse series → published sample statistics
        # (`precipitation.py:566-579`)
        thr = stats.threshold
        stats.fill_with_sample_data()
        stats.threshold = thr
    elif np.isnan(stats.wxx).any():
        # undefined weight bins → uniform 1/7 (`precipitation.py:584-602`)
        stats.wxx = np.where(np.isnan(stats.wxx), 1.0 / 7.0, stats.wxx)

    return stats, v


def _weighted_stats(stats_list, counts) -> CascadeStatistics:
    """Level-weighted average (`precipitation.py:678-688`)."""
    out = CascadeStatistics()
    total = float(sum(counts))
    out.p01 = sum(s.p01 * c for s, c in zip(stats_list, counts)) / total
    out.p10 = sum(s.p10 * c for s, c in zip(stats_list, counts)) / total
    out.pxx = sum(s.pxx * c for s, c in zip(stats_list, counts)) / total
    out.wxx = sum(s.wxx * c for s, c in zip(stats_list, counts)) / total
    return out


def build_casc_values(
    x: np.ndarray,
    hourly: bool = True,
    level: int = 9,
    percentile: float = 50,
) -> tuple[CascadeStatistics, list[CascadeStatistics]]:
    """Run the full calibration for one station-season value series.

    Returns (averaged_stats, per_level_stats) — the reference's
    ``avg_stats`` flag simply chooses which of the two to use
    (`precipitation.py:631-702`).
    """
    aggre_level = 5 if hourly else level
    x = np.nan_to_num(np.asarray(x, dtype=float), nan=0.0)

    per_level: list[CascadeStatistics] = []
    counts: list[int] = []
    thresholds = np.zeros(aggre_level)
    v = x
    for i in range(aggre_level):
        stats_i, v = aggregate_precipitation_values(v, percentile)
        thresholds[i] = stats_i.threshold[0]
        per_level.append(stats_i)
        counts.append(len(v))

    avg = _weighted_stats(per_level, counts)
    avg.threshold = thresholds
    avg.percentile = percentile
    return avg, per_level


# ---------------------------------------------------------------------------
# Spark-facing calibration
# ---------------------------------------------------------------------------

def _key_schema(df: DataFrame, keys: list[str]) -> str:
    """Schema fragment matching the key columns' actual types."""
    types = dict(df.dtypes)
    return ", ".join(f"{k} {types[k]}" for k in keys)


def _stats_schema(df: DataFrame, keys: list[str]) -> str:
    return (
        _key_schema(df, keys)
        + ", season int, level int, p01 array<double>, p10 array<double>, "
        "pxx array<double>, wxx array<double>, threshold array<double>, "
        "percentile double"
    )


def _default_buckets(df: DataFrame) -> int:
    """Default: 0 = direct ``groupBy(keys)`` grouped-map.

    Measured crossover (local[32]): with long per-station series
    (≥ ~1000 rows/station — the cluster-scale regime) direct grouping
    is 4–8× faster than hash-bucketing, because the input's existing
    station partitioning is reused (no extra exchange) and Spark's
    grouped-map handles many small groups efficiently. Bucketing
    (``station_buckets > 0``) wins only on tiny-group corpora (tens of
    rows per station, e.g. short test extracts), where it amortizes
    the per-group Python-worker round-trip across stations — callers
    in that regime should pass an explicit bucket count of roughly
    ``n_stations / 20``."""
    return 0


def build_casc(
    hourly_df: DataFrame,
    months: list[list[int]] | None = None,
    avg_stats: bool = True,
    percentile: float = 50,
    hourly: bool = True,
    level: int = 9,
    keys: list[str] = ("station_id",),
    ts_col: str = "ts",
    precip_col: str = "precip",
    station_buckets: int | None = None,
) -> DataFrame:
    """Distributed cascade calibration.

    Default is a direct ``groupBy(keys)`` grouped-map — reuses any
    existing station partitioning and is the fast path for
    cluster-scale series (see :func:`_default_buckets`). With
    ``station_buckets > 0`` stations are instead hash-bucketed into
    that many tasks (kernel loops stations inside — amortizes
    Arrow/pandas fixed costs on tiny-group corpora; results are
    per-station and bucket-invariant). Seasons are
    month subsets as in `precipitation.py:631-702`. Output rows carry
    the flattened statistics arrays; ``level = -1`` marks the averaged
    statistics (``avg_stats=True``), otherwise one row per level.
    The result DataFrame feeds :func:`disagg_prec_cascade` directly
    (stats join, nothing on the driver); :func:`collect_cascade_stats`
    remains for the small-fleet broadcast-dict path.
    """
    keys = list(keys)
    if station_buckets is None:
        station_buckets = _default_buckets(hourly_df)
    if months is None:
        months = [list(range(1, 13))]
    schema = _stats_schema(hourly_df, keys)

    parts = []
    for season_idx, season_months in enumerate(months):
        sub = hourly_df.filter(F.month(ts_col).isin(list(season_months))).select(
            *keys, ts_col, precip_col
        )

        def make_fit(season_idx=season_idx):
            def fit_one(pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values(ts_col)
                x = pdf[precip_col].to_numpy()
                avg, per_level = build_casc_values(
                    x, hourly=hourly, level=level, percentile=percentile
                )
                rows = []
                keyvals = {k: pdf[k].iloc[0] for k in keys}
                if avg_stats:
                    entries = [(-1, avg)]
                else:
                    entries = list(enumerate(per_level))
                for lvl, s in entries:
                    rows.append(
                        dict(
                            **keyvals,
                            season=season_idx,
                            level=lvl,
                            p01=s.p01.ravel().tolist(),
                            p10=s.p10.ravel().tolist(),
                            pxx=s.pxx.ravel().tolist(),
                            wxx=s.wxx.ravel().tolist(),
                            threshold=np.asarray(s.threshold).ravel().tolist(),
                            percentile=float(percentile),
                        )
                    )
                return pd.DataFrame(rows)

            def fit_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
                # group by the FULL key tuple — grouping by keys[0]
                # alone would silently merge distinct stations that
                # share the first key component
                return pd.concat(
                    [fit_one(g) for _, g in pdf.groupby(keys, sort=True)],
                    ignore_index=True,
                )

            return fit_one, fit_bucket

        fit_one, fit_bucket = make_fit()
        if station_buckets and station_buckets > 0:

            def debucketed(f):
                # NB: must stay a 1-arg callable — a default-arg capture
                # would make pyspark pass (key, pdf) instead
                def run(pdf: pd.DataFrame) -> pd.DataFrame:
                    return f(pdf.drop(columns="__bucket"))

                return run

            bucket = F.pmod(F.xxhash64(*keys), F.lit(station_buckets))
            parts.append(
                pin_partitions(
                    sub.withColumn("__bucket", bucket),
                    ["__bucket"],
                    n=station_buckets,
                )
                .groupBy("__bucket")
                .applyInPandas(debucketed(fit_bucket), schema=schema)
            )
        else:
            # direct path: unpinned on purpose (reuses existing station
            # partitioning, e.g. bucketed scans — see disagg_prec_cascade)
            parts.append(sub.groupBy(*keys).applyInPandas(fit_one, schema=schema))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def collect_cascade_stats(stats_df: DataFrame, key_col: str = "station_id") -> dict:
    """Collect a ``build_casc`` result into
    ``{(station_id, season): CascadeStatistics | [CascadeStatistics]}``
    for broadcasting into the disaggregation kernel."""
    rows = stats_df.collect()
    out: dict = {}
    per_level: dict = {}
    for r in rows:
        s = CascadeStatistics()
        s.p01 = np.array(r["p01"]).reshape(2, 4)
        s.p10 = np.array(r["p10"]).reshape(2, 4)
        s.pxx = np.array(r["pxx"]).reshape(2, 4)
        s.wxx = np.array(r["wxx"]).reshape(7, 2, 4)
        s.threshold = np.array(r["threshold"])
        s.percentile = r["percentile"]
        key = (r[key_col], r["season"])
        if r["level"] == -1:
            out[key] = s
        else:
            per_level.setdefault(key, {})[r["level"]] = s
    for key, lv in per_level.items():
        out[key] = [lv[i] for i in sorted(lv)]
    return out


# ---------------------------------------------------------------------------
# Disaggregation
# ---------------------------------------------------------------------------


def _disagg_one_level(
    x: np.ndarray,
    stats: CascadeStatistics,
    wxxcum: np.ndarray,
    meanvol: float,
    rng: np.random.Generator,
) -> np.ndarray:
    """Split every box of one level into two, vectorized
    (`precipitation.py:201-281`): branch choice and weights for all
    boxes of the level are drawn at once.
    """
    n = len(x)
    wet = x > 0
    bt = _box_types(x)
    ba = (x > meanvol).astype(np.int64)
    cell = np.where(wet, ba * 4 + (bt - 1), 0)

    p01v = stats.p01.reshape(8)[cell]
    p10v = stats.p10.reshape(8)[cell]

    rndp = rng.random(n)
    case01 = rndp <= p01v
    case10 = (rndp > p01v) & (rndp <= p01v + p10v)

    rndw = rng.random(n)
    cum = wxxcum.reshape(7, 8)[:, cell]  # (7, n)
    hit = rndw[None, :] <= cum
    k = hit.argmax(axis=0)
    k = np.where(hit.any(axis=0), k, 6)  # numerical guard: fall in last class
    w1 = WCLASSBOUNDS[k + 1] - 1.0 / 14.0  # class centers (`precipitation.py:264`)

    left = np.where(case01, 0.0, np.where(case10, x, w1 * x))
    right = np.where(case01, x, np.where(case10, 0.0, (1.0 - w1) * x))
    left = np.where(wet, left, 0.0)
    right = np.where(wet, right, 0.0)

    out = np.empty(2 * n)
    out[0::2] = left
    out[1::2] = right
    return out


def disagg_cascade_values(
    x: np.ndarray,
    cascade_options,
    hourly: bool = True,
    level: int = 9,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Disaggregate one station's daily values (missing already zeroed).

    Returns hourly values (24/day) or 2**level dyadic boxes per day
    (5-min aggregation is done by the caller). Mirrors
    `precipitation.py:74-311` including the threshold indexing
    (level l uses ``threshold[si]`` after the in-loop decrement).
    """
    if rng is None:
        rng = np.random.default_rng()
    si = 5 if hourly else level

    if isinstance(cascade_options, CascadeStatistics):
        overwrite = False
        stats = cascade_options
        wxxcum = np.cumsum(stats.wxx, axis=0)
    elif isinstance(cascade_options, list):
        if len(cascade_options) != si:
            raise ValueError(f"Cascade statistics list must have {si} elements!")
        overwrite = True
    else:
        raise TypeError("cascade_options has invalid type")

    v = np.asarray(x, dtype=float)
    for _ in range(si if not hourly else 5):
        si -= 1
        if overwrite:
            stats = cascade_options[si]
            wxxcum = np.cumsum(stats.wxx, axis=0)
            meanvol = stats.threshold[0]
        else:
            meanvol = stats.threshold[si]
        v = _disagg_one_level(v, stats, wxxcum, meanvol, rng)

    if hourly:
        # 32×45 min → 96×15 min (÷3) → 24×1 h (`precipitation.py:283-305`)
        q = np.repeat(v, 3) / 3.0
        return q.reshape(-1, 4).sum(axis=1)
    return v


def _station_seed(station_id, seed: int) -> int:
    return (zlib.crc32(str(station_id).encode()) ^ seed) & 0xFFFFFFFF


def _stats_from_rows(rows) -> "CascadeStatistics | list[CascadeStatistics]":
    """Rebuild CascadeStatistics from build_casc stats rows (dict-like
    structs carried per group through the stats join)."""

    def mk(r):
        s = CascadeStatistics()
        s.p01 = np.array(r["p01"]).reshape(2, 4)
        s.p10 = np.array(r["p10"]).reshape(2, 4)
        s.pxx = np.array(r["pxx"]).reshape(2, 4)
        s.wxx = np.array(r["wxx"]).reshape(7, 2, 4)
        s.threshold = np.array(r["threshold"])
        s.percentile = r["percentile"]
        return s

    rows = sorted(rows, key=lambda r: r["level"])
    if len(rows) == 1 and rows[0]["level"] == -1:
        return mk(rows[0])
    return [mk(r) for r in rows]


def disagg_prec_cascade(
    daily: DataFrame,
    cascade_options,
    hourly: bool = True,
    level: int = 9,
    shift: int = 0,
    seed: int = 42,
    keys: list[str] = ("station_id",),
    date_col: str = "date",
    ts_col: str = "ts",
    season: int = 0,
    station_buckets: int | None = None,
    emit: str = "steps",
) -> DataFrame:
    """Distributed cascade disaggregation.

    ``cascade_options`` may be:

    - the **DataFrame returned by** :func:`build_casc` — the scale
      path: the per-station statistics are joined into the kernel
      input as columns (co-partitioned with the subsequent grouping),
      so the driver never materializes the fleet's statistics;
    - a single :class:`CascadeStatistics` (or per-level list) applied
      to every station — broadcast;
    - the dict from :func:`collect_cascade_stats` keyed
      ``(station_id, season)`` — broadcast; fine to ~10⁵ stations,
      driver-memory-bound beyond that (prefer the DataFrame form).

    Missing daily values are zeroed before and restored to null after
    (`precipitation.py:96-99`, `313-315`); ``shift`` relabels the
    result by N steps (`precipitation.py:317-319`).

    Default is a direct ``groupBy(keys)`` grouped-map (the
    cluster-scale fast path, see :func:`_default_buckets`). With
    ``station_buckets > 0`` stations are hash-bucketed and looped
    inside the kernel: per-group Arrow + pandas fixed costs dominate
    when station series are short (a 2× win measured at 1500 stations
    × 30 days), and per-station seeding keeps results identical for
    any bucket count.

    ``emit='steps'`` (default) returns (keys..., ts, precip) at hourly
    or 5-minute resolution. ``emit='daily'`` runs the same stochastic
    kernel but aggregates back to daily totals *inside* the grouped
    map, returning (keys..., date, n_steps, precip): the map-side
    partial aggregation a mass-balance audit wants — the full sub-daily
    grid never leaves the kernel, so a 100 TB conservation check ships
    1/24th (1/288th at 5 min) of the rows through Arrow and skips the
    re-aggregation shuffle entirely. A fully-missing day aggregates to
    NaN → null, matching the post-shuffle ``sum`` of the steps path.
    """
    if emit not in ("steps", "daily"):
        raise ValueError(f"emit must be 'steps' or 'daily', got {emit!r}")
    if emit == "daily" and shift != 0:
        # a shifted grid moves mass across day boundaries; daily totals
        # would no longer be the input totals — refuse rather than lie
        raise ValueError("emit='daily' requires shift=0")
    keys = list(keys)
    spark = daily.sparkSession
    if station_buckets is None:
        station_buckets = _default_buckets(daily)
    stats_df = cascade_options if isinstance(cascade_options, DataFrame) else None
    bc = (
        None
        if stats_df is not None
        else spark.sparkContext.broadcast(cascade_options)
    )
    out_step_us = 3_600_000_000 if hourly else 300_000_000
    steps_per_day = 24 if hourly else 288
    box_step_us = LEVEL11_STEP_US * (2 ** (11 - level))
    boxes_per_day = 2**level

    if emit == "daily":
        schema = _key_schema(daily, keys) + f", {date_col} date, n_steps long, precip double"
    else:
        schema = _key_schema(daily, keys) + f", {ts_col} timestamp, precip double"

    # the kernel must not close over the DataFrame itself (unpicklable)
    stats_in_col = stats_df is not None

    def _opts_for(sid, stats_cell):
        if stats_in_col:
            return _stats_from_rows(stats_cell)
        opts = bc.value
        if isinstance(opts, dict):
            opts = opts[(sid, season)]
        return opts

    def disagg_core(sid, opts, x_raw, dates):
        """Arrays in (date-sorted), (ts, vals) out — shared by the
        per-group path and the numpy-sliced bucket path."""
        missing = np.isnan(x_raw)
        x = np.nan_to_num(x_raw, nan=0.0)

        rng = np.random.default_rng(_station_seed(sid, seed))
        v = disagg_cascade_values(x, opts, hourly=hourly, level=level, rng=rng)

        n_days = len(x_raw)

        if hourly:
            vals = v
        else:
            # accumulate 2**level dyadic boxes into 5-min bins by their
            # start offset, like resample('5min').sum()
            # (`precipitation.py:307-311`)
            bins = (np.arange(boxes_per_day) * box_step_us) // out_step_us
            day_idx = np.repeat(np.arange(n_days), boxes_per_day)
            flat_bins = day_idx * steps_per_day + np.tile(bins, n_days)
            # bincount(weights=...) over the flat bin ids: same
            # accumulation order as np.add.at (input order per bin) at
            # a fraction of the scatter-add cost
            vals = np.bincount(
                flat_bins, weights=v, minlength=n_days * steps_per_day
            )

        # restore missing days to null (`precipitation.py:313-315`)
        mask = np.repeat(missing, steps_per_day)
        vals = np.where(mask, np.nan, vals)

        if shift != 0:
            shifted = np.full_like(vals, np.nan)
            if shift > 0:
                shifted[shift:] = vals[: len(vals) - shift]
            else:
                shifted[:shift] = vals[-shift:]
            vals = shifted

        if emit == "daily":
            # in-kernel partial aggregation: a missing day is all-NaN →
            # NaN → null, same as summing the steps path post-shuffle
            return None, vals.reshape(n_days, steps_per_day).sum(axis=1)
        offs = (np.arange(steps_per_day) * out_step_us).astype("timedelta64[us]")
        ts = (dates[:, None] + offs[None, :]).ravel()
        return ts, vals

    def disagg_one(sid, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(date_col)
        opts = _opts_for(sid, pdf["__stats"].iloc[0] if stats_in_col else None)
        dates = pd.to_datetime(pdf[date_col]).to_numpy().astype("datetime64[us]")
        ts, vals = disagg_core(
            sid, opts, pdf["precip"].to_numpy(dtype=float), dates
        )
        res = {k: np.repeat(pdf[k].iloc[0], len(vals)) for k in keys}
        if emit == "daily":
            res[date_col] = pdf[date_col].to_numpy()
            res["n_steps"] = np.full(len(vals), steps_per_day, dtype=np.int64)
        else:
            res[ts_col] = ts
        res["precip"] = vals
        return pd.DataFrame(res)

    selected = daily.select(*keys, date_col, "precip")
    if stats_df is not None:
        # one struct-array column per station, joined on the same keys
        # the grouped-map shuffles on — no driver materialization
        per_station = (
            stats_df.filter(F.col("season") == F.lit(season))
            .groupBy(*keys)
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "level", "p01", "p10", "pxx", "wxx",
                            "threshold", "percentile",
                        )
                    )
                ).alias("__stats")
            )
        )
        selected = selected.join(per_station, keys)

    def group_key(pdf: pd.DataFrame):
        # full key tuple — keys[0] alone would merge distinct stations
        # sharing the first component (and mis-key seed/stats lookups)
        if len(keys) == 1:
            return pdf[keys[0]].iloc[0]
        return tuple(pdf[k].iloc[0] for k in keys)

    if station_buckets and station_buckets > 0:

        def disagg_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            # ONE sort + numpy boundary slicing + ONE output frame per
            # bucket: pandas groupby materializing ~25-row sub-frames
            # and per-station DataFrames dominated the kernel wall time
            # (the cascade math itself is ~20% of it)
            pdf = pdf.sort_values([*keys, date_col], kind="mergesort")
            karrs = [pdf[k].to_numpy() for k in keys]
            n = len(pdf)
            change = np.zeros(n, dtype=bool)
            change[0] = True
            for a in karrs:
                change[1:] |= a[1:] != a[:-1]
            starts = np.flatnonzero(change)
            ends = np.r_[starts[1:], n]

            precip = pdf["precip"].to_numpy(dtype=float)
            date_np = (
                pd.to_datetime(pdf[date_col]).to_numpy().astype("datetime64[us]")
            )
            stats_np = pdf["__stats"].to_numpy() if stats_in_col else None

            key_parts = [[] for _ in keys]
            ts_parts, val_parts = [], []
            for s0, s1 in zip(starts, ends):
                sid = (
                    karrs[0][s0]
                    if len(keys) == 1
                    else tuple(a[s0] for a in karrs)
                )
                opts = _opts_for(
                    sid, stats_np[s0] if stats_in_col else None
                )
                ts, vals = disagg_core(
                    sid, opts, precip[s0:s1], date_np[s0:s1]
                )
                for i, a in enumerate(karrs):
                    key_parts[i].append(np.repeat(a[s0], len(vals)))
                ts_parts.append(ts)
                val_parts.append(vals)
            res = {
                k: np.concatenate(key_parts[i]) for i, k in enumerate(keys)
            }
            if emit == "daily":
                # groups are contiguous in the sorted frame, so the
                # concatenated per-group day rows line up with pdf's
                res[date_col] = pdf[date_col].to_numpy()
                res["n_steps"] = np.full(n, steps_per_day, dtype=np.int64)
            else:
                res[ts_col] = np.concatenate(ts_parts)
            res["precip"] = np.concatenate(val_parts)
            return pd.DataFrame(res)

        bucket = F.pmod(F.xxhash64(*keys), F.lit(station_buckets))
        return (
            pin_partitions(
                selected.withColumn("__bucket", bucket),
                ["__bucket"],
                n=station_buckets,
            )
            .groupBy("__bucket")
            .applyInPandas(lambda pdf: disagg_bucket(pdf.drop(columns="__bucket")), schema=schema)
        )

    def disagg(pdf: pd.DataFrame) -> pd.DataFrame:
        return disagg_one(group_key(pdf), pdf)

    # direct path: NO pin — the point of station_buckets=0 is reusing
    # the table's existing station partitioning (bucketed scans skip
    # their exchange entirely); tiny-group corpora where AQE would
    # coalesce-and-serialize belong on the pinned bucket path above
    return selected.groupBy(*keys).applyInPandas(disagg, schema=schema)
