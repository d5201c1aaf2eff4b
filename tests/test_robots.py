"""robots.txt compliance (pipeline/robots.py) against RFC 9309's own
precedence rules and worked examples, plus the relational evaluation
path on Spark."""

import pytest
from pyspark.sql import functions as F

from melodist_spark.pipeline.robots import (
    _pattern_to_regex,
    apply_robots,
    parse_robots,
    parse_robots_text,
)


def _verdict(rules_txt, path, agent="*"):
    """Scalar reference evaluation through the same parse + regex
    machinery, for table-driven spec cases."""
    import re

    rules = parse_robots_text(rules_txt, agent)
    best = None
    for pat, allow, spec in rules:
        if re.search(_pattern_to_regex(pat), path):
            key = (spec, allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def test_rfc9309_longest_match_and_allow_tiebreak():
    """RFC 9309 §2.2.2: most octets matched wins; tie -> allow."""
    txt = "User-agent: *\nAllow: /example/page/\nDisallow: /example/"
    assert _verdict(txt, "/example/page/index.html") is True
    assert _verdict(txt, "/example/other") is False
    # equivalent-length allow and disallow -> allow wins
    tie = "User-agent: *\nAllow: /page\nDisallow: /page"
    assert _verdict(tie, "/page/x") is True


def test_rfc9309_wildcards_and_anchor():
    txt = (
        "User-agent: *\n"
        "Disallow: /*.gif$\n"
        "Disallow: /private*/\n"
        "Allow: /private-ok/\n"
    )
    assert _verdict(txt, "/images/cat.gif") is False
    assert _verdict(txt, "/images/cat.gif?v=2") is True  # $ anchors end
    assert _verdict(txt, "/private2/x") is False
    assert _verdict(txt, "/private-ok/x") is True  # longer match wins
    assert _verdict(txt, "/public/cat.png") is True


def test_rfc9309_agent_group_selection():
    """§2.2.1: the longest matching user-agent token wins; '*' only
    applies when no specific group matches; adjacent User-agent
    lines share one group."""
    txt = (
        "User-agent: googlebot-news\n"
        "Disallow: /news-secret/\n"
        "\n"
        "User-agent: googlebot\n"
        "Disallow: /google-secret/\n"
        "\n"
        "User-agent: a\nUser-agent: b\n"
        "Disallow: /shared/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /everyone/\n"
    )
    # specific agent: its group only (star ignored)
    assert _verdict(txt, "/everyone/x", agent="googlebot") is True
    assert _verdict(txt, "/google-secret/x", agent="googlebot") is False
    # longer token beats shorter
    assert _verdict(txt, "/news-secret/x", agent="googlebot-news") is False
    assert _verdict(txt, "/google-secret/x", agent="googlebot-news") is True
    # adjacent user-agent lines share the group body
    assert _verdict(txt, "/shared/x", agent="b") is False
    # unknown agent falls back to *
    assert _verdict(txt, "/everyone/x", agent="nobody") is False
    assert _verdict(txt, "/shared/x", agent="nobody") is True


def test_empty_disallow_comments_and_unknown_fields():
    txt = (
        "# welcome\n"
        "User-agent: *\n"
        "Disallow:\n"          # empty = allow all (no rule)
        "Crawl-delay: 10\n"
        "Sitemap: https://x.example/sitemap.xml\n"
        "Disallow: /tmp/ # trailing comment\n"
    )
    assert _verdict(txt, "/anything") is True
    assert _verdict(txt, "/tmp/file") is False
    assert parse_robots_text("", "*") == []


def test_apply_robots_relational_matches_scalar(spark):
    """The Spark evaluation (broadcast rules join + rlike + max_by
    precedence struct) agrees with the scalar reference on every
    (domain, path) combination, keeps duplicate rows distinct, and
    treats rule-less domains as crawlable."""
    robots = {
        "a.example": (
            "User-agent: *\nDisallow: /priv/\nAllow: /priv/pub*\n"
            "Disallow: /*.zip$\n"
        ),
        "b.example": "User-agent: *\nDisallow: /\nAllow: /ok/\n",
    }
    robots_df = spark.createDataFrame(
        list(robots.items()), ["domain", "robots_txt"]
    )
    rules = parse_robots(robots_df)
    got_rules = rules.collect()
    assert all(r["pattern"].startswith("^") for r in got_rules)

    paths = [
        "/priv/x", "/priv/pub/ok", "/data/big.zip", "/data/big.zip?x",
        "/", "/ok/fine", "/other",
    ]
    rows = [("a.example", p) for p in paths] + [
        ("b.example", p) for p in paths
    ] + [("c.example", "/priv/x"), ("a.example", "/priv/x")]  # dup row
    urls = spark.createDataFrame(rows, ["domain", "path"])
    out = apply_robots(urls, rules).collect()
    assert len(out) == len(rows)  # duplicates preserved

    for r in out:
        if r["domain"] == "c.example":
            assert r["crawlable"] is True  # no robots -> crawlable
        else:
            exp = _verdict(robots[r["domain"]], r["path"])
            assert r["crawlable"] == exp, (r["domain"], r["path"], exp)


def test_apply_robots_composes_with_url_curation(spark):
    """End-to-end crawl shape: normalize URL -> registered domain ->
    robots verdict, all in one frame."""
    from melodist_spark.pipeline.urls import (
        normalize_url,
        registered_domain,
        url_host,
    )

    robots_df = spark.createDataFrame(
        [("site.com", "User-agent: *\nDisallow: /admin/")],
        ["domain", "robots_txt"],
    )
    rules = parse_robots(robots_df)
    urls = spark.createDataFrame(
        [
            (1, "https://WWW.site.com/admin/panel?x=1"),
            (2, "https://www.site.com/blog/post"),
        ],
        ["id", "url"],
    ).select(
        "id",
        normalize_url(F.col("url")).alias("url_norm"),
        registered_domain(url_host(F.col("url"))).alias("domain"),
    ).withColumn(
        "path", F.regexp_replace("url_norm", r"^[a-z]+://[^/]+", "")
    )
    got = {r["id"]: r["crawlable"] for r in apply_robots(urls, rules).collect()}
    assert got == {1: False, 2: True}


def test_extract_sitemaps(spark):
    """Sitemap records per RFC 9309 §2.3: standalone (group-independent,
    legal mid-group), case-insensitive field, comments stripped, one
    URL per line; non-sitemap lines and commented-out lines ignored."""
    from melodist_spark.pipeline.robots import extract_sitemaps

    body = (
        "Sitemap: https://a.example/s1.xml\n"
        "User-agent: *\n"
        "Disallow: /x\n"
        "SITEMAP:https://a.example/s2.xml   # trailing comment\n"
        "# Sitemap: https://a.example/commented-out.xml\n"
        "  sitemap :https://a.example/space-before-colon.xml\n"
        "Crawl-delay: 5\n"
    )
    df = spark.createDataFrame(
        [("a.example", body), ("b.example", "User-agent: *\nAllow: /\n"),
         ("c.example", None)],
        "domain string, robots_txt string",
    )
    got = sorted(
        (r["domain"], r["sitemap_url"])
        for r in extract_sitemaps(df).collect()
    )
    # "sitemap :" (space before colon) is tolerated, matching the rule
    # parser, which strips whitespace around the field name too
    assert got == [
        ("a.example", "https://a.example/s1.xml"),
        ("a.example", "https://a.example/s2.xml"),
        ("a.example", "https://a.example/space-before-colon.xml"),
    ], got


def test_parse_robots_text_fuzz_total():
    """parse_robots_text is a total function over arbitrary text
    (hypothesis): any input yields a (pattern, allow, specificity)
    list, never an exception — robots.txt in the wild is unparseable
    garbage surprisingly often."""
    from hypothesis import given, settings, strategies as st

    from melodist_spark.pipeline.robots import parse_robots_text

    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=300), st.sampled_from(["*", "mybot", ""]))
    def case(text, agent):
        rules = parse_robots_text(text, agent)
        assert isinstance(rules, list)
        for pat, allow, spec in rules:
            assert isinstance(pat, str) and isinstance(allow, bool)
            assert spec == len(pat)

    case()


def test_parse_robots_multi_matches_per_agent(spark):
    """Round 13: the fused multi-agent parser (one line-scan per
    body, N group selections) must emit, for each agent, exactly the
    rows parse_robots emits for that agent alone — it replaces the
    two per-agent kernels in the hash-checked robots_eval row."""
    from melodist_spark.pipeline.robots import parse_robots, parse_robots_multi

    bodies = [
        (
            "a.example",
            "User-agent: ignorebot\nDisallow: /\n\n"
            "User-agent: *\nDisallow: /private/\nAllow: /private/pub\n"
            "Disallow: /*.tmp$\n\n"
            "User-agent: meloBot\nDisallow: /sec/\nAllow: /sec/ok\n",
        ),
        ("b.example", "User-agent: melo\nDisallow: /m/\n"),
        ("c.example", None),
        ("d.example", "Sitemap: https://d.example/s.xml\n"),
    ]
    df = spark.createDataFrame(bodies, ["domain", "robots_txt"])
    agents = ["melobot", "othercrawler"]
    multi = parse_robots_multi(df, agents=agents).collect()
    for agent in agents:
        got = sorted(
            (r["domain"], r["pattern"], r["prefix"], r["allow"], r["specificity"])
            for r in multi
            if r["agent"] == agent
        )
        want = sorted(
            (r["domain"], r["pattern"], r["prefix"], r["allow"], r["specificity"])
            for r in parse_robots(df, agent=agent).collect()
        )
        assert got == want, agent

    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        parse_robots_multi(df, agents=[])
    with pytest.raises(ValueError, match="distinct"):
        parse_robots_multi(df, agents=["a", "a"])
