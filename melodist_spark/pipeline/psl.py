"""Public-Suffix-List registrable domains as a scan-speed Spark op.

Closes the ``registered_domain`` long-tail gap (VERDICT r7 item 2):
the regex head in ``urls.py`` only knows ``{co,com,...}.<cc>``, so
``github.io`` pages all grouped as one domain and ``gouv.fr`` split
wrong — silently mis-bucketing the per-domain diversity cap and the
domain PageRank.  This module evaluates the real PSL algorithm
(https://publicsuffix.org/list/ — longest matching rule wins,
``*`` matches one label, ``!`` exceptions beat wildcards, unlisted
TLDs fall back to the default ``*`` rule) against the packaged rule
table in :mod:`psl_data`.

Scale design — NO shuffle, NO Python workers, NO explode+agg:

* Parse-time (driver, microseconds): rules resolve to one row per
  distinct suffix key ``(suffix, ps_labels, is_exception)`` where a
  wildcard ``*.ck`` is keyed by its base ``ck`` with
  ``ps_labels = labels(base)+1`` and an exception ``!www.ck`` by
  ``www.ck`` with ``ps_labels = labels-1``.
* Run-time: one chained LEFT **broadcast** hash join per candidate
  label count ``k = 1..K`` (``K`` = deepest key in the table, 4 for
  the packaged subset — ``blob.core.windows.net`` — 5 for the full
  upstream list), probing
  ``substring_index(host, '.', -k)``.  Broadcast hash joins stay
  inside whole-stage codegen and add zero exchanges, so at 100 TB
  this is K hash probes per row on the scan — the same cost class
  as the regex it replaces.  The winner is picked by a pure column
  expression (exceptions first, then the longest match, then the
  default rule), and the registrable domain is
  ``substring_index(host, '.', -(ps+1))``.

A suffix can be reached by at most ONE candidate ``k`` (a k-label
string only ever equals the k-label candidate), so the K probe
columns are mutually exclusive per rule — no dedup needed.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_psl(text: str) -> dict[str, tuple[int, bool]]:
    """Resolve PSL rule lines into ``{suffix_key: (ps_labels,
    is_exception)}`` (full upstream grammar: comments, blanks,
    exact / ``*.`` wildcard / ``!`` exception rules).

    Key collisions (e.g. an exact ``ck`` TLD rule plus wildcard
    ``*.ck`` both keyed ``ck``) keep the larger ``ps_labels`` —
    longest-match semantics applied at build time; an exception
    always wins its key outright."""
    out: dict[str, tuple[int, bool]] = {}
    for raw in text.splitlines():
        line = raw.strip().lower()
        if not line or line.startswith("//"):
            continue
        line = line.split()[0]  # upstream allows trailing comments
        if line in ("!", "*.", "*"):  # bare prefixes carry no suffix
            continue
        if line.startswith("!"):
            suffix = line[1:]
            # strip-leading-label semantics: the public suffix of an
            # exception match is the rule minus its leftmost label, so
            # ps = labels - 1 — including ps = 0 for a (hypothetical
            # but grammar-legal) single-label `!foo`, whose registrable
            # domain is the last label itself
            ps = suffix.count(".")  # labels - 1
            out[suffix] = (ps, True)
        elif line.startswith("*."):
            base = line[2:]
            ps = base.count(".") + 2  # labels(base) + 1
            prev = out.get(base)
            if prev is None or (not prev[1] and prev[0] < ps):
                out[base] = (ps, False)
        else:
            ps = line.count(".") + 1
            prev = out.get(line)
            if prev is None or (not prev[1] and prev[0] < ps):
                out[line] = (ps, False)
    return out


@lru_cache(maxsize=4)
def _resolved_rules(text: str | None = None) -> dict[str, tuple[int, bool]]:
    if text is None:
        from melodist_spark.pipeline.psl_data import PSL_TEXT

        text = PSL_TEXT
    return parse_psl(text)


def psl_rules_df(spark: SparkSession, text: str | None = None) -> DataFrame:
    """The resolved rule table as a DataFrame
    ``(suffix, n_labels, ps_labels, is_exc)`` — a few hundred rows
    for the packaged subset, ~10k for the full upstream list; always
    broadcast-sized."""
    rules = _resolved_rules(text)
    rows = [
        (s, s.count(".") + 1, ps, exc) for s, (ps, exc) in rules.items()
    ]
    return spark.createDataFrame(
        rows, "suffix string, n_labels int, ps_labels int, is_exc boolean"
    )


def registered_domain_psl_expr(
    host, psl_text: str | None = None
):
    """:func:`registered_domain_psl` as a pure COLUMN expression —
    the same PSL algorithm against the same rule table, but the
    table rides a constant-folded literal map instead of broadcast
    joins.

    Trade-off (measured): the join path pays ~0.7 s of fixed
    broadcast-build wall per query materialization (3 exchanges) and
    ~nothing per row; this path pays ZERO fixed cost but a linear
    scan of the map literal per probe (K * |rules| string compares
    per row).  Use the expression in SINGLE projections (one
    evaluation per row — a scan-stage labelling pass); use the joins
    for corpus scans with the full ~10k-rule upstream list.  CAUTION:
    Catalyst inlines column expressions into every downstream
    window/join/distinct KEY that references them — if the output
    feeds several such keys, each copy re-runs the linear scan
    (measured 4x the whole-query wall in web_curation's 6-reference
    plan); materialize the column first (persist or an exchange
    boundary) or use the join variant there.  Both paths are pinned
    value-identical in tests.

    ``host`` may be a Column or a column name."""
    if isinstance(host, str):
        host = F.col(host)
    rules = _resolved_rules(psl_text)
    kmax = max(s.count(".") + 1 for s in rules)
    # one literal map suffix -> ps_labels+1, exceptions carried as the
    # NEGATED value so a single int encodes both facts (the +1 offset
    # keeps a ps=0 exception distinguishable from "no entry": -0 == 0).
    # CONSTRUCTION MATTERS: str_to_map over a literal string is
    # foldable, so ConstantFolding turns it into ONE map Literal at
    # plan time; a create_map of 2*|rules| literal children is NOT
    # removable when probed with a non-literal key and re-evaluates
    # all children per row (measured 2 orders of magnitude slower)
    packed = ",".join(
        f"{s}:{-(ps + 1) if exc else ps + 1}" for s, (ps, exc) in rules.items()
    )
    m = F.str_to_map(F.lit(packed), F.lit(","), F.lit(":"))
    vals = [
        F.element_at(m, F.substring_index(host, ".", -k)).cast("int")
        for k in range(1, kmax + 1)
    ]

    def best(cols):
        return cols[0] if len(cols) == 1 else F.greatest(*cols)

    exc_ps = best([F.when(v < 0, -v - 1) for v in vals])
    match_ps = best([F.when(v > 0, v - 1) for v in vals])
    ps = F.coalesce(exc_ps, match_ps, F.lit(1))
    parts = F.split(host, r"\.")
    take = F.least(ps + 1, F.size(parts))
    return F.when(host.rlike(r"^[0-9.]+$"), host).otherwise(
        F.array_join(F.slice(parts, -take, take), ".")
    )


def registered_domain_psl(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "domain",
    psl_text: str | None = None,
) -> DataFrame:
    """Add ``out_col`` = PSL registrable domain of ``host_col``.

    ``a.b.example.co.uk`` → ``example.co.uk``; ``user.github.io`` →
    ``user.github.io`` (private suffix); ``x.gouv.fr`` → ``x.gouv.fr``
    wait — ``gouv.fr`` is itself the public suffix, so the registrable
    domain of ``ville.gouv.fr`` is ``ville.gouv.fr``.  IPv4 literals
    and hosts at/below their public suffix pass through unchanged
    (same contract as ``urls.py::registered_domain``, which remains
    the zero-data fallback head)."""
    spark = df.sparkSession
    rules = _resolved_rules(psl_text)
    kmax = max(s.count(".") + 1 for s in rules)
    host = F.col(host_col)

    # collision-proof temp prefix: a caller column literally named
    # `_psl_s1` must survive the final drop() (same policy as
    # streaming/ingest.py — extend until no input column shadows it)
    tmp = "_psl"
    while any(c.startswith(tmp) for c in df.columns):
        tmp += "_"

    # build the rule table ONCE and slice per label count — the k
    # probes differ only in their filter
    rules_df = psl_rules_df(spark, psl_text)
    out = df
    for k in range(1, kmax + 1):
        rk = (
            rules_df
            .filter(F.col("n_labels") == k)
            .select(
                F.col("suffix").alias(f"{tmp}_s{k}"),
                F.col("ps_labels").alias(f"{tmp}_p{k}"),
                F.col("is_exc").alias(f"{tmp}_e{k}"),
            )
        )
        # substring_index returns the whole host when it has < k
        # labels — a (k-1)-label string can never equal a k-label
        # suffix, so no label-count guard is needed
        out = out.join(
            F.broadcast(rk),
            F.substring_index(host, ".", -k) == F.col(f"{tmp}_s{k}"),
            "left",
        )

    def best(cols):
        return cols[0] if len(cols) == 1 else F.greatest(*cols)

    # greatest() ignores NULLs, so unmatched probe columns drop out
    exc_ps = best(
        [
            F.when(F.col(f"{tmp}_e{k}"), F.col(f"{tmp}_p{k}"))
            for k in range(1, kmax + 1)
        ]
    )
    match_ps = best(
        [
            F.when(~F.col(f"{tmp}_e{k}"), F.col(f"{tmp}_p{k}"))
            for k in range(1, kmax + 1)
        ]
    )
    # exceptions beat any longer wildcard match; default rule: ps=1
    ps = F.coalesce(exc_ps, match_ps, F.lit(1))

    # final take is pure column algebra (split/slice/array_join, same
    # shape as the expr variant) — no string-interpolated SQL, so a
    # host column named with backticks or dots can't break or
    # misresolve the expression
    parts = F.split(host, r"\.")
    take = F.least(ps + F.lit(1), F.size(parts))
    domain = F.when(host.rlike(r"^[0-9.]+$"), host).otherwise(
        F.array_join(F.slice(parts, -take, take), ".")
    )
    out = out.withColumn(out_col, domain)
    drop = [
        f"{tmp}_{c}{k}" for k in range(1, kmax + 1) for c in ("s", "p", "e")
    ]
    return out.drop(*drop)
