"""robots.txt compliance (RFC 9309, the Robots Exclusion Protocol)
for crawl-corpus curation: which archived URLs were crawlable, as a
relational operator.

A crawl-data pipeline needs this twice: respecting publisher intent
when building corpora (filter rows whose URL was disallowed for the
crawler that fetched them), and auditing an existing crawl. The
protocol itself is tiny but precedence-laden — RFC 9309 §2.2:
the group is chosen by the MOST SPECIFIC matching user-agent line
(longest agent token match, ``*`` as fallback); within the group the
rule with the LONGEST matched pattern wins, and on a tie ALLOW wins.
``*`` matches any octet sequence inside patterns; ``$`` anchors the
end; empty ``Disallow:`` means allow-all.

Scale shape: robots bodies are per-domain (one small text per host —
the reference set side), parsed once into a ``(key, pattern, allow,
specificity)`` rule table by an Arrow-batched kernel, then packed to
ONE array-of-structs row per domain; URL evaluation is a single
broadcast left join plus a JVM-side higher-order fold
(``filter`` by ``regexp_like``, ``aggregate`` with the RFC
precedence comparison — HOFs are CodegenFallback, so the fold runs
in interpreted eval, still scan-class with no Python in the per-URL
path), ZERO shuffle and zero row-multiplication on the URL side. A
crawl's robots table is ~10^8 rows of a few KB; its packed RULES
table is one row per domain and hash-partitions or broadcasts
cleanly.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "parse_robots_text",
    "parse_robots",
    "parse_robots_multi",
    "apply_robots",
    "extract_sitemaps",
]


def _parse_groups(text: str) -> list[tuple[str, list[tuple[str, bool]]]]:
    """One line-scan of a robots.txt body into its agent groups:
    ``[(agent_token_lower, [(pattern, allow), ...]), ...]`` — the
    agent-independent half of parsing, shared when several crawler
    identities are evaluated against the same body."""
    groups: list[tuple[str, list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_group_body = False

    def flush():
        nonlocal cur_agents, cur_rules, in_group_body
        if cur_agents:
            for a in cur_agents:
                groups.append((a, cur_rules))
        cur_agents, cur_rules, in_group_body = [], [], False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                flush()
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_group_body = True
            if field == "disallow" and value == "":
                continue  # empty Disallow = allow everything (no rule)
            if value:
                cur_rules.append((value, field == "allow"))
        elif field in ("sitemap", "crawl-delay"):
            # non-group records; sitemap lines don't break a group
            continue
    flush()
    return groups


def _select_rules(
    groups: list[tuple[str, list[tuple[str, bool]]]], agent: str
) -> list[tuple[str, bool, int]]:
    """Agent-group selection per RFC 9309 §2.2.1 over pre-parsed
    groups: the most specific matching agent token wins (``agent``
    already lowercased)."""
    best_len = -1
    star: list[tuple[str, bool]] = []
    chosen: list[tuple[str, bool]] = []
    for a, rules in groups:
        if a == "*":
            star.extend(rules)
        elif agent.startswith(a):
            # the group's agent value must be a prefix of the
            # crawler's product token ('googlebot' applies to
            # googlebot-news, never the reverse); longest such
            # value = most specific group
            if len(a) > best_len:
                best_len = len(a)
                chosen = list(rules)
            elif len(a) == best_len:
                chosen.extend(rules)
    if best_len < 0:
        chosen = star
    return [(p, allow, len(p)) for p, allow in chosen]


def parse_robots_text(text: str, agent: str = "*") -> list[tuple[str, bool, int]]:
    """Parse one robots.txt body into the rule list for ``agent``:
    ``[(path_pattern, allow, specificity), ...]``.

    Group selection per RFC 9309 §2.2.1: collect every group whose
    ``User-agent`` line matches ``agent`` (case-insensitive token
    prefix match); if any non-``*`` group matches, the longest agent
    match wins and ``*`` groups are ignored; otherwise the ``*``
    groups apply. Multiple groups for the same chosen agent merge.
    Specificity is the pattern's length in octets (the longest-match
    tiebreak key used by the reference implementations).
    """
    return _select_rules(_parse_groups(text), agent.lower())


def _pattern_to_regex(pattern: str) -> str:
    """RFC 9309 path pattern -> anchored regex: ``*`` is any octet
    run, a trailing ``$`` anchors the end, everything else literal."""
    anchor_end = pattern.endswith("$")
    if anchor_end:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchor_end else "")


def parse_robots(
    df: DataFrame,
    text_col: str = "robots_txt",
    key_col: str = "domain",
    agent: str = "*",
) -> DataFrame:
    """robots bodies -> rule table ``(key, pattern (regex), prefix,
    allow, specificity)``; one Arrow-batched pass, no shuffle.

    ``prefix`` is the raw path pattern when it is a pure prefix (no
    ``*``, no trailing ``$``) — the overwhelmingly common shape in
    real robots files — and null otherwise. ``apply_robots`` matches
    prefix rules with codegen ``startswith`` (a memcmp) instead of
    ``regexp_like``: measured at parity on short synthetic paths (the
    JVM caches the last-compiled pattern), but the memcmp bounds
    per-rule cost by the prefix length regardless of pattern
    complexity or path length, where a regex engine's does grow with
    both (tools/robots_scale_smoke.py)."""
    schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("pattern", StringType()),
            StructField("prefix", StringType()),
            StructField("allow", BooleanType()),
            StructField("specificity", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, txt in zip(pdf[key_col], pdf[text_col]):
                if txt is None:
                    continue
                for pat, allow, spec in parse_robots_text(str(txt), agent):
                    prefix = pat if "*" not in pat and not pat.endswith("$") else None
                    rows.append((key, _pattern_to_regex(pat), prefix, allow, spec))
            yield pd.DataFrame(
                rows,
                columns=[key_col, "pattern", "prefix", "allow", "specificity"],
            )

    return df.select(key_col, text_col).mapInPandas(run, schema=schema)


def parse_robots_multi(
    df: DataFrame,
    agents: "list[str] | tuple[str, ...]",
    text_col: str = "robots_txt",
    key_col: str = "domain",
) -> DataFrame:
    """Rule tables for SEVERAL crawler agents from ONE parse pass:
    like :func:`parse_robots` but each body's line-scan and group
    assembly runs once, then the (cheap) RFC 9309 §2.2.1 group
    selection runs per agent over the parsed groups. Output adds an
    ``agent`` column; filtering it to one agent yields exactly the
    rows :func:`parse_robots` emits for that agent, in the same
    per-body order (pinned by test).

    This is the shape for auditing one crawl archive against N
    crawler identities — the robots corpus (one body per domain,
    ~10^8 rows for a web crawl) is parsed once instead of N times.
    """
    if not agents:
        raise ValueError("agents must be non-empty")
    if len(set(agents)) != len(agents):
        raise ValueError(f"agents must be distinct, got {agents}")
    agents_lc = [(a, a.lower()) for a in agents]
    schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("agent", StringType()),
            StructField("pattern", StringType()),
            StructField("prefix", StringType()),
            StructField("allow", BooleanType()),
            StructField("specificity", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, txt in zip(pdf[key_col], pdf[text_col]):
                if txt is None:
                    continue
                groups = _parse_groups(str(txt))
                for agent, agent_lc in agents_lc:
                    for pat, allow, spec in _select_rules(groups, agent_lc):
                        prefix = (
                            pat
                            if "*" not in pat and not pat.endswith("$")
                            else None
                        )
                        rows.append(
                            (key, agent, _pattern_to_regex(pat), prefix, allow, spec)
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    key_col, "agent", "pattern", "prefix", "allow", "specificity",
                ],
            )

    return df.select(key_col, text_col).mapInPandas(run, schema=schema)


def extract_sitemaps(
    df: DataFrame,
    text_col: str = "robots_txt",
    key_col: str = "domain",
) -> DataFrame:
    """``(key, sitemap_url)`` rows from robots bodies — the crawl
    frontier's seed list. RFC 9309 §2.3 makes ``Sitemap:`` a
    standalone record: agent-group-independent, legal anywhere in the
    file (including mid-group), case-insensitive field name, one URL
    per line, ``#`` starts a comment. Pure codegen (split lines →
    strip comments → anchored extract → explode); the explode
    multiplies only the small robots table, never a corpus."""
    lines = F.split(F.col(text_col), "\r?\n")
    urls = F.filter(
        F.transform(
            lines,
            lambda l: F.regexp_extract(
                F.regexp_replace(l, "#.*", ""),
                r"(?i)^\s*sitemap\s*:\s*(\S+)\s*$",
                1,
            ),
        ),
        lambda u: u != "",
    )
    return df.select(F.col(key_col), F.explode(urls).alias("sitemap_url"))


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    path_col: str = "path",
    key_col: str = "domain",
    out_col: str = "crawlable",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Evaluate RFC 9309 precedence for every URL row: longest
    matching pattern wins, allow wins ties, no matching rule (or no
    robots at all) means crawlable.

    Relational shape (round 7 rework): the per-domain rule lists are
    packed into ONE array-of-structs row per domain (a groupBy over
    the SMALL side only), so URL evaluation is a single broadcast
    left join plus a JVM-side higher-order fold — ``filter`` the
    array by ``regexp_like(path, pattern)``, ``aggregate`` the
    survivors with the RFC precedence comparison (longest pattern
    wins, allow wins ties); HOFs are CodegenFallback (interpreted
    eval), which is fine here because the per-URL tree is shallow
    and its children are cheap. The URL side never shuffles, never
    row-multiplies, and needs no row ordinal; the previous shape
    (rule-level join + groupBy(row_id) + rejoin) shuffled the 100 TB
    side twice to compute the same verdict. Rows with no rules (or no
    robots.txt at all) fall out of the left join as null arrays →
    crawlable.
    """
    if "prefix" not in rules.columns:
        # hand-built regex-only rule tables stay valid
        rules = rules.withColumn("prefix", F.lit(None).cast("string"))
    packed = rules.groupBy(key_col).agg(
        F.collect_list(
            F.struct(
                F.col("pattern"),
                F.col("prefix"),
                F.col("allow"),
                F.col("specificity").cast("long").alias("specificity"),
            )
        ).alias("__rules")
    ).select(F.col(key_col).alias("__rk"), "__rules")
    if broadcast_rules:
        packed = F.broadcast(packed)
    best = F.expr(
        f"""
        aggregate(
          filter(__rules, r -> case
            when r.prefix is not null then startswith({path_col}, r.prefix)
            else regexp_like({path_col}, r.pattern) end),
          cast(null as struct<s: bigint, a: boolean>),
          (acc, r) -> case
            when acc is null
              or r.specificity > acc.s
              or (r.specificity = acc.s and r.allow and not acc.a)
            then named_struct('s', r.specificity, 'a', r.allow)
            else acc
          end
        )
        """
    )
    return (
        urls.join(packed, urls[key_col] == F.col("__rk"), "left")
        .withColumn(out_col, F.coalesce(best["a"], F.lit(True)))
        .drop("__rk", "__rules")
    )
