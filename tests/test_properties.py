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


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    gray=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_ppm_roundtrip_property(h, w, gray, seed):
    """encode→decode is the identity for any image shape."""
    from melodist_spark.pipeline.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)


@given(
    out_h=st.integers(1, 16),
    out_w=st.integers(1, 16),
    h=st.integers(1, 32),
    w=st.integers(1, 32),
)
@settings(max_examples=40, deadline=None)
def test_resize_nearest_property(out_h, out_w, h, w):
    """Any resize: output shape exact, every pixel comes from the
    source, and identity resize is a no-op."""
    from melodist_spark.pipeline.multimodal import resize_nearest

    img = np.arange(h * w, dtype=np.int64).reshape(h, w)
    out = resize_nearest(img, out_h, out_w)
    assert out.shape == (out_h, out_w)
    assert np.isin(out, img).all()
    np.testing.assert_array_equal(resize_nearest(img, h, w), img)


def test_decontaminate_verbatim_inclusion_property(spark):
    """Deterministic small-case sweep (batched into one job): any doc
    containing a verbatim >=n-token window of a benchmark doc must be
    flagged; docs over a disjoint vocabulary must never be."""
    from melodist_spark.pipeline.decontamination import decontaminate

    bench_text = " ".join(f"b{i}" for i in range(12))
    rows, expect = [], {}
    did = 0
    for start in range(0, 8):  # verbatim 5-token windows, varying offset
        did += 1
        prefix = " ".join(f"p{did}x{j}" for j in range(start % 3))
        window = " ".join(f"b{i}" for i in range(start, start + 5))
        rows.append((did, f"{prefix} {window} tail{did}".strip()))
        expect[did] = True
    for k in range(5):  # disjoint vocab, varied length >= 5 tokens
        did += 1
        rows.append((did, " ".join(f"z{k}w{j}" for j in range(5 + k))))
        expect[did] = False
    got = (
        decontaminate(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            spark.createDataFrame([(0, bench_text)], ["doc_id", "text"]),
            ngram=5,
        )
        .toPandas()
        .set_index("doc_id")["contaminated"]
        .to_dict()
    )
    assert got == expect
