"""Mergeable corpus profiling with DataSketches (HLL / theta / KLL).

The 100-TB profiling problem is not computing one number — it is that
every exact answer ("how many distinct documents", "the p99 document
length", "how much of snapshot B is already in snapshot A") costs a
full-corpus shuffle, and re-costs it for every shard added later. The
DataSketches family solves all three with constant-size mergeable
state, and Spark 4 ships the sketch algebra natively (JVM-side
aggregates, no UDF):

- **HLL** (`hll_sketch_agg`/`hll_union_agg`): distinct-content
  estimates. Merging per-shard sketches carries the same error
  contract as sketching the whole corpus — profile each ingest batch
  once, never rescan. Below sketch capacity the merged estimate is
  *exactly* the whole-corpus one (pinned by test); past capacity the
  DataSketches union gadget can diverge from the direct sketch
  inside the configured error bound (measured: ≤2.7% relative at 2M
  distinct/domain with lg_k=12, i.e. ~1.7× the 1.6% RSE —
  tools/profile_scale_smoke.py). Theta merged==whole stays EXACT at
  any cardinality; prefer `theta_content` when cross-shard estimate
  stability matters more than the smaller HLL state.
- **theta** (`theta_sketch_agg` + union/intersection/difference):
  distinct counting WITH set algebra. Cross-snapshot overlap — "how
  many of B's documents are already in A", the re-crawl novelty rate
  — becomes an expression over two KB-sized sketches instead of an
  anti-join of 2×10^9 rows.
- **KLL** (`kll_sketch_agg_bigint`/`kll_merge_agg_bigint`): rank/
  quantile summaries of document length with a proven error bound;
  mergeable the same way.

Layout contract: a *profile state* is one row per group (``group_by``
columns), with exact counters (``n_docs``, ``n_chars``) and three
sketch columns (``hll_content``, ``theta_content``, ``kll_len``).
Bytes per group, not per document: lg_k=12 HLL is ≤ ~2.5 KB, the
default theta sketch ≤ ~32 KB, KLL(200) ≤ ~5 KB — a million-domain
profile is ~tens of GB of state for an arbitrarily large corpus, and
a whole-corpus profile is one row.

Parameter-stamp discipline (as the dedup/similarity indexes): sketch
columns carry {family, lg_k, kll_k} schema metadata; merges and
estimates refuse a frame whose parameters do not match the call
(sketches of different lg_k do not merge losslessly), with a
``stamp_profile_state`` escape hatch for externally rebuilt schemas.

Reference note: the reference package has no profiling surface — this
module is part of the beyond-reference training-data-pipeline tier
(SURVEY.md §2 extension table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_FAMILY = "ds-profile-v1"

_SKETCH_COLS = ("hll_content", "theta_content", "kll_len")


def _profile_meta(lg_k: int, kll_k: int) -> dict:
    return {"family": PROFILE_FAMILY, "lg_k": int(lg_k), "kll_k": int(kll_k)}


def _stamp(df: DataFrame, lg_k: int, kll_k: int) -> DataFrame:
    meta = _profile_meta(lg_k, kll_k)
    return df.select(
        *[
            F.col(c).alias(c, metadata=meta) if c in _SKETCH_COLS else c
            for c in df.columns
        ]
    )


def stamp_profile_state(df: DataFrame, lg_k: int = 12, kll_k: int = 200) -> DataFrame:
    """Attach profile metadata to an externally produced state frame
    (schema rebuilt without metadata). The caller asserts the
    parameters — the sketch bytes themselves cannot be interrogated
    for lg_k safely across families."""
    return _stamp(df, lg_k, kll_k)


def _check_profile_meta(df: DataFrame, lg_k: int, kll_k: int, what: str) -> None:
    for c in _SKETCH_COLS:
        if c not in df.columns:
            raise ValueError(
                f"{what} has no {c} column — not a corpus profile state "
                f"(columns: {df.columns})"
            )
    want = _profile_meta(lg_k, kll_k)
    meta = dict(df.schema["hll_content"].metadata or {})
    got = {k: meta.get(k) for k in want}
    if got["family"] is None:
        raise ValueError(
            f"{what} carries no profile metadata on hll_content — it was "
            "built outside corpus_profile_state() (or the schema was "
            "rebuilt without metadata). Rebuild it, or assert its "
            "provenance with stamp_profile_state(df, lg_k, kll_k); "
            "merging blindly would silently mix sketch configurations."
        )
    if got != want:
        raise ValueError(
            f"{what} was built with {got} but this call asks for {want} — "
            "sketches of different configurations do not merge losslessly. "
            "Pass the values the state was built with."
        )


def corpus_profile_state(
    df: DataFrame,
    group_by: Sequence[str] = (),
    text_col: str = "text",
    lg_k: int = 12,
    kll_k: int = 200,
) -> DataFrame:
    """One mergeable profile row per group over ``df``.

    Output: ``group_by`` columns + ``n_docs``/``n_chars`` (exact longs)
    + ``hll_content``/``theta_content`` (sketches of the 64-bit content
    hash — distinct-content estimates and set algebra) + ``kll_len``
    (quantile sketch of character length). Empty ``group_by`` profiles
    the whole frame as one row.

    One partial-aggregated shuffle of group-key cardinality; the text
    itself never shuffles (only its xxhash64 and length leave the map
    side). Safe on empty/NULL text (hashed/measured as such; NULL text
    contributes length 0 and the hash of NULL is skipped by the
    sketches, counted by ``n_docs``).
    """
    keys = list(group_by)
    keyed = df.select(
        *keys,
        F.xxhash64(F.col(text_col)).alias("__h"),
        F.coalesce(F.length(F.col(text_col)).cast("long"), F.lit(0)).alias(
            "__len"
        ),
    )
    grouped = keyed.groupBy(*keys) if keys else keyed.groupBy()
    out = grouped.agg(
        F.count("*").alias("n_docs"),
        F.sum("__len").alias("n_chars"),
        F.hll_sketch_agg(F.col("__h"), lg_k).alias("hll_content"),
        F.call_function(
            "theta_sketch_agg", F.col("__h"), F.lit(lg_k)
        ).alias("theta_content"),
        F.kll_sketch_agg_bigint(F.col("__len"), kll_k).alias("kll_len"),
    )
    return _stamp(out, lg_k, kll_k)


def merge_profile_states(
    states: DataFrame,
    group_by: Sequence[str] = (),
    lg_k: int = 12,
    kll_k: int = 200,
) -> DataFrame:
    """Fold a frame holding several profile states (shards, batches,
    snapshots — typically a ``unionByName`` or a partitioned state
    dir) into one row per group.

    Theta unions are exact folds (each shard retains its k smallest
    hashes, and any of the whole corpus's k smallest is a fortiori
    among its own shard's — merged == whole by construction at ANY
    cardinality). HLL merged==whole exactly below sketch capacity;
    past it the union gadget may differ in the last digits inside the
    error bound. KLL merges keep the rank-error guarantee. Counters
    sum. Refuses mismatched or missing parameter stamps."""
    _check_profile_meta(states, lg_k, kll_k, "merge_profile_states input")
    keys = list(group_by)
    grouped = states.groupBy(*keys) if keys else states.groupBy()
    out = grouped.agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.hll_union_agg(F.col("hll_content"), F.lit(False)).alias(
            "hll_content"
        ),
        F.call_function(
            "theta_union_agg", F.col("theta_content"), F.lit(lg_k)
        ).alias("theta_content"),
        F.call_function("kll_merge_agg_bigint", F.col("kll_len")).alias(
            "kll_len"
        ),
    )
    return _stamp(out, lg_k, kll_k)


def profile_estimates(
    state: DataFrame,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    lg_k: int = 12,
    kll_k: int = 200,
) -> DataFrame:
    """Human-readable estimates from a profile state: exact counters,
    the HLL distinct-content estimate, a duplication ratio
    (1 − distinct/total), and length quantiles.

    Quantile columns are named ``len_p50``-style (``len_p99_9`` for
    three-decimal ranks)."""
    _check_profile_meta(state, lg_k, kll_k, "profile_estimates input")
    qcols = {}
    for q in quantiles:
        name = "len_p" + ("%g" % (q * 100)).replace(".", "_")
        qcols[name] = F.kll_sketch_get_quantile_bigint(
            F.col("kll_len"), F.lit(float(q))
        )
    keep = [c for c in state.columns if c not in _SKETCH_COLS]
    return state.select(
        *keep,
        F.round(F.hll_sketch_estimate(F.col("hll_content")), 2).alias(
            "distinct_est"
        ),
        # clamped at 0: estimator noise can put distinct_est a hair
        # above n_docs on a duplicate-free group
        F.round(
            F.greatest(
                F.lit(0.0),
                1.0
                - F.hll_sketch_estimate(F.col("hll_content"))
                / F.col("n_docs"),
            ),
            4,
        ).alias("dup_ratio_est"),
        *[c.alias(n) for n, c in qcols.items()],
    )


def snapshot_overlap(
    state_a: DataFrame,
    state_b: DataFrame,
    group_by: Sequence[str] = (),
    lg_k: int = 12,
    kll_k: int = 200,
) -> DataFrame:
    """Set-algebra comparison of two profiled snapshots WITHOUT
    touching either corpus again: per group, the estimated distinct
    contents in both (``overlap_est``), only in B (``new_in_b_est`` —
    the re-crawl novelty count), the union size, and the Jaccard
    estimate. Groups present in only one snapshot appear with the
    other side's sketch absent → NULL estimates (outer join).

    This is the theta-sketch flagship pattern: at crawl scale the
    exact answer is an anti-join of two corpora (a shuffle of every
    content hash in both); this is an expression over two KB-sized
    rows per group."""
    _check_profile_meta(state_a, lg_k, kll_k, "snapshot_overlap state_a")
    _check_profile_meta(state_b, lg_k, kll_k, "snapshot_overlap state_b")
    keys = list(group_by)
    a = state_a.select(
        *keys,
        F.col("n_docs").alias("n_docs_a"),
        F.col("theta_content").alias("__ta"),
    )
    b = state_b.select(
        *keys,
        F.col("n_docs").alias("n_docs_b"),
        F.col("theta_content").alias("__tb"),
    )
    j = a.join(b, keys, "full_outer") if keys else a.crossJoin(b)
    inter = F.call_function("theta_intersection", F.col("__ta"), F.col("__tb"))
    union = F.call_function("theta_union", F.col("__ta"), F.col("__tb"))
    bnota = F.call_function("theta_difference", F.col("__tb"), F.col("__ta"))
    est = lambda c: F.call_function("theta_sketch_estimate", c)  # noqa: E731
    return j.select(
        *keys,
        "n_docs_a",
        "n_docs_b",
        F.round(est(inter), 2).alias("overlap_est"),
        F.round(est(bnota), 2).alias("new_in_b_est"),
        F.round(est(union), 2).alias("union_est"),
        F.round(F.try_divide(est(inter), est(union)), 6).alias(
            "jaccard_est"
        ),
    )
