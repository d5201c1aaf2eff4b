"""Property-based tests (hypothesis): window interpolation must match
pandas semantics on arbitrary null patterns; cascade statistics remain
valid distributions on arbitrary rain series."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from melodist_spark.operators.cascade import aggregate_precipitation_values
from melodist_spark.util.interpolate import interpolate_linear


@st.composite
def null_series(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    vals = draw(
        st.lists(
            st.one_of(
                st.none(),
                st.floats(min_value=-100, max_value=100, allow_nan=False),
            ),
            min_size=n,
            max_size=n,
        )
    )
    return vals


@pytest.mark.parametrize("direction", ["forward", "both"])
@pytest.mark.parametrize("limit", [None, 2])
def test_interpolate_matches_pandas_cases(spark, direction, limit):
    """Deterministic grid of tricky null patterns (hypothesis-style
    exhaustive small cases, but batched into ONE spark job for speed).
    """
    patterns = [
        [None, 1.0, None, None, 4.0, None],
        [None, None, 2.0],
        [3.0, None, None, None, None, 9.0],
        [None] * 4,
        [5.0],
        [1.0, None, 2.0, None, None, None, 8.0, None],
        [None, 7.0, None],
        [2.0, 4.0, 6.0],
        [None, 1.0] * 5,
        [9.0, None, None, 3.0, None, 1.0, None],
    ]
    rows = []
    for i, pat in enumerate(patterns):
        for j, v in enumerate(pat):
            rows.append((f"g{i}", pd.Timestamp("2020-01-01") + pd.Timedelta(hours=j), v))
    pdf = pd.DataFrame(rows, columns=["station_id", "ts", "v"])
    df = spark.createDataFrame(pdf)
    got = (
        interpolate_linear(df, "v", limit=limit, limit_direction=direction)
        .orderBy("station_id", "ts")
        .toPandas()
    )
    for i, pat in enumerate(patterns):
        s = pd.Series(pat, dtype=float)
        exp = s.interpolate(method="linear", limit=limit, limit_direction=direction)
        sub = got[got.station_id == f"g{i}"].sort_values("ts")["v"].reset_index(drop=True)
        np.testing.assert_allclose(
            sub.values, exp.values, atol=1e-9, equal_nan=True,
            err_msg=f"pattern {i}: {pat} dir={direction} limit={limit}",
        )


@settings(max_examples=200, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    x=st.lists(
        st.one_of(st.just(0.0), st.floats(min_value=0.01, max_value=50)),
        min_size=4,
        max_size=500,
    ),
    pct=st.integers(min_value=10, max_value=90),
)
def test_cascade_stats_always_valid(x, pct):
    """For ANY nonnegative series the calibration yields probability
    rows summing to 1 and conserving mass, or the documented sample
    fallback."""
    arr = np.array(x)
    stats, v = aggregate_precipitation_values(arr, percentile=pct)
    n = len(arr) // 2
    assert len(v) == n
    np.testing.assert_allclose(
        v, arr[: 2 * n : 2] + arr[1 : 2 * n : 2], atol=1e-12
    )
    total = stats.p01 + stats.p10 + stats.pxx
    assert np.allclose(total, 1.0, atol=1e-9)
    wsum = stats.wxx.sum(axis=0)
    valid = ~np.isnan(wsum)
    assert np.allclose(wsum[valid], 1.0, atol=1e-9)
