"""asof_join vs the pandas merge_asof oracle across directions,
tolerance and strictness."""

import numpy as np
import pandas as pd
import pytest

from melodist_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-03-01")
    rows_l, rows_r = [], []
    for k in ["a", "b", "c"]:
        lt = np.sort(rng.choice(np.arange(0, 5000, 1), size=120, replace=False))
        rt = np.sort(rng.choice(np.arange(0, 5000, 1), size=60, replace=False))
        for t in lt:
            rows_l.append((k, base + pd.Timedelta(minutes=int(t)), float(t)))
        for t in rt:
            rows_r.append((k, base + pd.Timedelta(minutes=int(t)), float(t) * 10))
    left = pd.DataFrame(rows_l, columns=["key", "ts", "lv"])
    right = pd.DataFrame(rows_r, columns=["key", "ts", "quote"])
    return left, right


def _expected(left, right, direction, tolerance=None, strict=False):
    exp = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort").rename(
            columns={"ts": "r_ts"}
        ),
        left_on="ts",
        right_on="r_ts",
        by="key",
        direction=direction,
        tolerance=tolerance,
        allow_exact_matches=not strict,
    )
    return exp.sort_values(["key", "ts"]).reset_index(drop=True)


@pytest.mark.parametrize(
    "direction,tolerance,strict",
    [
        ("backward", None, False),
        ("forward", None, False),
        ("nearest", None, False),
        ("backward", "INTERVAL 30 MINUTES", False),
        ("nearest", "INTERVAL 30 MINUTES", False),
        ("backward", None, True),
        ("nearest", None, True),
    ],
)
def test_asof_matches_pandas(spark, frames, direction, tolerance, strict):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            keys="key",
            ts_col="ts",
            direction=direction,
            tolerance=tolerance,
            strict=strict,
        )
        .toPandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    tol = pd.Timedelta(minutes=30) if tolerance else None
    exp = _expected(left, right, direction, tol, strict)
    assert len(got) == len(exp) == len(left)
    pd.testing.assert_series_equal(got["r_ts"], exp["r_ts"], check_names=False)
    pd.testing.assert_series_equal(
        got["r_quote"], exp["quote"], check_names=False
    )


def test_asof_no_right_rows_for_key(spark):
    left = pd.DataFrame(
        {"key": ["x", "x"], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]), "lv": [1.0, 2.0]}
    )
    right = pd.DataFrame(
        {"key": ["y"], "ts": pd.to_datetime(["2024-01-01"]), "quote": [5.0]}
    )
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), keys="key"
    ).toPandas()
    assert len(got) == 2 and got["r_quote"].isna().all()


def test_asof_tied_right_timestamps_deterministic(spark):
    """Duplicate right timestamps for the same key: the carried payload
    is the greatest payload tuple among the ties — stable across runs
    and partitionings."""
    import pandas as pd

    left = pd.DataFrame(
        {"key": ["x"], "ts": pd.to_datetime(["2024-01-01 12:00"]), "lv": [1.0]}
    )
    right = pd.DataFrame(
        {
            "key": ["x"] * 3,
            "ts": pd.to_datetime(["2024-01-01 10:00"] * 3),
            "quote": [7.0, 9.0, 3.0],
        }
    )
    results = set()
    for parts in (1, 3, 7):
        got = asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right).repartition(parts),
            keys="key",
        ).toPandas()
        results.add(float(got["r_quote"].iloc[0]))
    assert results == {9.0}


def test_asof_right_payload_with_nested_map_runs(spark):
    """Regression: payload columns whose type contains a map at any
    nesting depth (array<map>, struct<map>) are unorderable — they
    must be skipped by the tie-break, not crash the plan."""
    left = spark.createDataFrame(
        [("k", 10)], ["station_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("k", 5, [{"a": "1"}], 1.0),
            ("k", 5, [{"b": "2"}], 2.0),
        ],
        "station_id string, ts long, attrs array<map<string,string>>, v double",
    )
    from melodist_spark.operators.asof import asof_join

    got = asof_join(left, right, keys=["station_id"], ts_col="ts").toPandas()
    assert len(got) == 1
    # the orderable column v still breaks the tie deterministically
    assert got["r_v"].iloc[0] == 2.0
