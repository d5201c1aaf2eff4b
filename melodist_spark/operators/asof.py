"""Distributed as-of join.

The canonical time-series join Spark lacks natively: for each left row,
attach the most recent right row at or before it (per key), optionally
within a tolerance. The reference's master-station precipitation
transfer and daily→hourly parameter alignment are special cases; the
general operator is exposed here in the shape DuckDB/kdb/pandas users
expect (``ASOF JOIN`` / ``merge_asof``).

Scale design — union, not join: both sides are tagged and unioned,
then ONE hash-shuffle on the key and ONE per-key sort by (ts, side)
lets ``last_value(ignoreNulls)`` carry the latest right payload into
each left row. No range join (which Spark plans as a broadcast-nested-
loop or an inequality sort-merge with per-key quadratic worst case),
no point-in-interval explosion; cost is the same as a single window
aggregate over the combined stream, and AQE handles key skew the same
way it does for any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def _contains_map(dt) -> bool:
    """True if the type tree contains a MapType anywhere — Spark's sort
    orderability rejects maps at ANY nesting depth (array<map<...>>,
    struct<..., map<...>>), not just at the top level."""
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str] | str,
    ts_col: str = "ts",
    direction: str = "backward",
    tolerance=None,
    right_prefix: str = "r_",
    strict: bool = False,
) -> DataFrame:
    """For each left row, the latest right row with ``r.ts <= l.ts``
    (``backward``; ``forward`` = earliest with ``r.ts >= l.ts``;
    ``nearest`` = whichever of the two is closer, ties to backward —
    pandas ``merge_asof`` semantics).

    Right's non-key, non-ts columns are attached with ``right_prefix``,
    plus ``<prefix><ts_col>`` = the matched right timestamp (null when
    no match / outside ``tolerance``). ``strict`` excludes equal
    timestamps (``<`` instead of ``<=``). ``tolerance`` is a Column or
    SQL interval string (e.g. ``"INTERVAL 1 HOUR"``).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    payload = [c for c in right.columns if c not in {*keys, ts_col}]

    if direction == "nearest":
        # two window passes (backward + forward) over the union, then
        # a per-row distance pick — still join-free; ~2× the cost of a
        # single direction, same shuffle key both times so the second
        # pass reuses the first's partitioning
        out = asof_join(
            left, right, keys, ts_col, "backward", tolerance, "__bk_", strict
        )
        out = asof_join(
            out, right, keys, ts_col, "forward", tolerance, "__fw_", strict
        )
        d_bk = F.col(ts_col) - F.col(f"__bk_{ts_col}")
        d_fw = F.col(f"__fw_{ts_col}") - F.col(ts_col)
        use_bk = F.col(f"__fw_{ts_col}").isNull() | (
            F.col(f"__bk_{ts_col}").isNotNull() & (d_bk <= d_fw)
        )
        for c in [ts_col] + payload:
            out = out.withColumn(
                f"{right_prefix}{c}",
                F.when(use_bk, F.col(f"__bk_{c}")).otherwise(F.col(f"__fw_{c}")),
            )
        return out.drop(
            *[f"__bk_{c}" for c in [ts_col] + payload],
            *[f"__fw_{c}" for c in [ts_col] + payload],
        )

    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.col(ts_col).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    )
    carried = ["__r_ts"] + [f"__r_{c}" for c in payload]
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col(ts_col).asc(), F.col("__side").asc()]
    elif direction == "forward":
        order = [F.col(ts_col).desc(), F.col("__side").asc()]
    else:
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    if strict:
        # equal-ts right rows must not be visible: order left rows
        # BEFORE right rows at the same timestamp
        order[1] = F.col("__side").desc()
    # deterministic tie-break for duplicate right timestamps on the
    # same key: without it the carried payload is whichever tied right
    # row happens to sort last — nondeterministic across runs and
    # partitionings. Ordering the carried columns themselves gives a
    # total order on right ties (left rows are all-null there, so
    # their relative order stays irrelevant); the carried row is the
    # greatest payload tuple among the tied timestamps. Unorderable
    # payload types (maps at any nesting depth) are skipped — ties on
    # those stay arbitrary.
    orderable = {
        f"__r_{f.name}": not _contains_map(f.dataType)
        for f in right.schema.fields
        if f.name in payload
    }
    order += [
        F.col(c).asc_nulls_first()
        for c in carried
        if orderable.get(c, True)
    ]

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in carried:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = unioned.filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else tolerance
        in_tol = (
            F.col(ts_col) - F.col("__r_ts") <= tol
            if direction == "backward"
            else F.col("__r_ts") - F.col(ts_col) <= tol
        )
        for c in carried:
            out = out.withColumn(c, F.when(in_tol, F.col(c)))
    renames = {"__r_ts": f"{right_prefix}{ts_col}"}
    renames.update({f"__r_{c}": f"{right_prefix}{c}" for c in payload})
    return out.withColumnsRenamed(renames)
