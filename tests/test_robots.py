"""robots.txt protocol parsing/filtering (RFC 9309 incl. Allow lines,
longest-match precedence, ``*`` wildcards, ``$`` anchors)."""

from document_text_extraction_spark.operators.robots import (
    parse_robots_rules,
    robots_filter,
)

BODY_MULTI = """# comment
User-agent: *
Disallow: /private/
Disallow: /tmp/

User-agent: mybot
User-agent: otherbot
Disallow: /mybot-only/
"""
BODY_ALLOW_ALL = "User-agent: *\nDisallow:\n"
BODY_EVIL_ONLY = "User-agent: evilbot\nDisallow: /\n"


def _robots(spark):
    return spark.createDataFrame(
        [("a.example", BODY_MULTI), ("b.example", BODY_ALLOW_ALL),
         ("c.example", BODY_EVIL_ONLY)],
        ["host", "body"])


def _prefixes(df):
    return {x["host"]: [(r["prefix"], r["allow"]) for r in x["rules"]]
            for x in df.collect()}


def test_parse_group_selection(spark):
    """'*' group applies when the agent has no own group; a specific
    agent's group REPLACES the '*' group; empty Disallow = allow all;
    comments and consecutive user-agent lines handled."""
    r = _robots(spark)
    star = _prefixes(parse_robots_rules(r, "*"))
    assert star == {"a.example": [("/private/", False), ("/tmp/", False)]}
    mybot = _prefixes(parse_robots_rules(r, "mybot"))
    assert mybot == {"a.example": [("/mybot-only/", False)]}
    evil = _prefixes(parse_robots_rules(r, "evilbot"))
    assert evil == {"a.example": [("/private/", False), ("/tmp/", False)],
                    "c.example": [("/", False)]}


def test_filter_prefix_semantics(spark):
    pages = spark.createDataFrame([
        (1, "https://a.example/private/x"),
        (2, "https://a.example/public/x"),
        (3, "https://a.example/mybot-only/y"),
        (4, "https://b.example/anything"),
        (5, "https://c.example/z"),
        (6, "https://norules.example/z"),
        (7, "https://a.example"),  # no path → '/'
    ], ["doc_id", "url"])
    r = _robots(spark)
    star_kept = sorted(
        x["doc_id"] for x in
        robots_filter(pages, parse_robots_rules(r, "*")).collect())
    assert star_kept == [2, 3, 4, 5, 6, 7]
    evil_kept = sorted(
        x["doc_id"] for x in
        robots_filter(pages, parse_robots_rules(r, "evilbot")).collect())
    # c.example disallows '/' for evilbot → page 5 gone; a.example's
    # '*' rules apply (no evilbot group there)
    assert evil_kept == [2, 3, 4, 6, 7]


def test_crlf_tabs_and_empty_exemption(spark):
    """RFC 9309 whitespace: CRLF line endings and tab separators must
    not defeat parsing; an agent whose own group is the allow-all
    'Disallow:' exemption must NOT inherit the '*' rules."""
    body = ("User-agent: mybot\r\nDisallow:\r\n\r\n"
            "User-agent: *\r\nDisallow:\t/private/\r\n")
    r = spark.createDataFrame([("x.example", body)], ["host", "body"])
    star = _prefixes(parse_robots_rules(r, "*"))
    assert star == {"x.example": [("/private/", False)]}
    # mybot's own allow-all group suppresses the '*' fallback entirely
    assert parse_robots_rules(r, "mybot").count() == 0


def test_mixed_case_host_still_matches(spark):
    r = spark.createDataFrame(
        [("A.Example", "User-agent: *\nDisallow: /no/\n")],
        ["host", "body"])
    pages = spark.createDataFrame(
        [(1, "https://a.EXAMPLE/no/x"), (2, "https://a.example/yes/x")],
        ["doc_id", "url"])
    kept = sorted(x["doc_id"] for x in
                  robots_filter(pages, parse_robots_rules(r)).collect())
    assert kept == [2]


def test_userinfo_and_port_do_not_evade(spark):
    """RFC 9309 rules are per-host: userinfo/port decorations in the
    page url must not bypass the host's Disallow (the same evasion
    class blocklist.host_of hardens against)."""
    r = spark.createDataFrame(
        [("blocked.example", "User-agent: *\nDisallow: /secret/\n")],
        ["host", "body"])
    pages = spark.createDataFrame([
        (1, "https://blocked.example/secret/a"),
        (2, "https://blocked.example:8443/secret/b"),
        (3, "https://u@blocked.example/secret/c"),
        (4, "https://blocked.example/open/d"),
    ], ["doc_id", "url"])
    kept = sorted(x["doc_id"] for x in
                  robots_filter(pages, parse_robots_rules(r)).collect())
    assert kept == [4]


def test_allow_longest_match_precedence(spark):
    """RFC 9309 §2.2.2: the most specific (most octets) matching rule
    governs; 'Disallow: / + Allow: /public/' — the canonical real-world
    robots idiom — must NOT block the whole host."""
    body = ("User-agent: *\n"
            "Disallow: /\n"
            "Allow: /public/\n"
            "Disallow: /public/private/\n")
    r = spark.createDataFrame([("h.example", body)], ["host", "body"])
    pages = spark.createDataFrame([
        (1, "https://h.example/public/ok"),
        (2, "https://h.example/public/private/x"),
        (3, "https://h.example/other"),
        (4, "https://h.example/"),
    ], ["doc_id", "url"])
    kept = sorted(x["doc_id"] for x in
                  robots_filter(pages, parse_robots_rules(r)).collect())
    assert kept == [1]


def test_allow_wins_equal_length_tie(spark):
    """Equivalent allow and disallow rules → allow SHOULD be used
    (RFC 9309 §2.2.2) — pinned, not incidental."""
    body = ("User-agent: *\n"
            "Disallow: /dir/\n"
            "Allow: /dir/\n")
    r = spark.createDataFrame([("h.example", body)], ["host", "body"])
    pages = spark.createDataFrame(
        [(1, "https://h.example/dir/x")], ["doc_id", "url"])
    assert [x["doc_id"] for x in
            robots_filter(pages, parse_robots_rules(r)).collect()] == [1]


def test_wildcard_and_anchor(spark):
    """'*' spans any octets; trailing '$' anchors at path end; LIKE
    metacharacters in rule paths stay literal (no injection)."""
    body = ("User-agent: *\n"
            "Disallow: /*.pdf$\n"
            "Disallow: /tmp*/\n"
            "Disallow: /lit%eral_\n")
    r = spark.createDataFrame([("h.example", body)], ["host", "body"])
    pages = spark.createDataFrame([
        (1, "https://h.example/docs/a.pdf"),        # *.pdf$ → blocked
        (2, "https://h.example/docs/a.pdf?x=1"),    # query cut → blocked
        (3, "https://h.example/docs/a.pdfx"),       # not anchored end
        (4, "https://h.example/tmp123/f"),          # /tmp*/ → blocked
        (5, "https://h.example/tmp123"),            # no closing slash
        (6, "https://h.example/lit%eral_x"),        # literal % and _
        (7, "https://h.example/litXeral_x"),        # % must NOT be LIKE-%
        (8, "https://h.example/ok"),
    ], ["doc_id", "url"])
    kept = sorted(x["doc_id"] for x in
                  robots_filter(pages, parse_robots_rules(r)).collect())
    assert kept == [3, 5, 7, 8]


def test_crawl_delay_and_sitemaps(spark):
    """Crawl-delay follows group selection (min across applicable
    groups, non-numeric dropped); Sitemap URLs are group-independent
    and collected from the whole file."""
    from document_text_extraction_spark.operators.robots import (
        parse_robots_meta,
    )
    body_a = ("User-agent: mybot\nCrawl-delay: 2\n\n"
              "User-agent: *\nCrawl-delay: 10\n"
              "Sitemap: https://a.example/sm1.xml\n\n"
              "User-agent: *\nCrawl-delay: 7\n"
              "Sitemap: https://a.example/sm2.xml\n")
    body_b = "User-agent: *\nCrawl-delay: soon\nDisallow: /x/\n"
    body_c = "User-agent: *\nDisallow: /y/\n"
    r = spark.createDataFrame(
        [("a.example", body_a), ("b.example", body_b),
         ("c.example", body_c)], ["host", "body"])
    star = {x["host"]: (x["crawl_delay"], list(x["sitemaps"]))
            for x in parse_robots_meta(r, "*").collect()}
    # two '*' groups → min(10, 7); sitemaps from everywhere, sorted
    assert star == {"a.example": (7.0, ["https://a.example/sm1.xml",
                                        "https://a.example/sm2.xml"])}
    mybot = {x["host"]: (x["crawl_delay"], list(x["sitemaps"]))
             for x in parse_robots_meta(r, "mybot").collect()}
    # mybot's own group wins (2), sitemaps still global
    assert mybot["a.example"] == (2.0, ["https://a.example/sm1.xml",
                                        "https://a.example/sm2.xml"])
    # non-numeric delay → dropped; no sitemap → host absent
    assert "b.example" not in star and "c.example" not in star
