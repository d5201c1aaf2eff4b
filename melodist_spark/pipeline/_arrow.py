"""Shared scaffolding for Arrow-batched kernels over ragged array
columns (one variable-length list per row)."""

from __future__ import annotations

import numpy as np


def ragged_layout(series):
    """Per-row layout of a pandas Series of lists: ``(null, lens,
    offsets, nz)``.

    ``null`` marks null rows (length 0 by convention), ``lens`` the
    per-row element counts, ``offsets`` each row's start position in
    the concatenation of all rows' elements, and ``nz`` the rows with
    at least one element. ``np.add.reduceat(values, offsets[nz])``
    then segment-sums a flat per-element array back to the non-empty
    rows — the most error-prone indexing in these kernels, kept in
    exactly one place (used by ``text.simhash16_arrow_udf`` and
    ``decontamination.decontaminate_stateless``).
    """
    null = series.isna().to_numpy()
    lens = np.array(
        [0 if n else len(v) for v, n in zip(series, null)], dtype=np.int64
    )
    nz = lens > 0
    offsets = np.zeros(len(lens), dtype=np.int64)
    if len(lens) > 1:
        np.cumsum(lens[:-1], out=offsets[1:])
    return null, lens, offsets, nz
