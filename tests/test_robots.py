"""robots.txt protocol parsing/filtering (RFC 9309 subset)."""

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


def test_parse_group_selection(spark):
    """'*' group applies when the agent has no own group; a specific
    agent's group REPLACES the '*' group; empty Disallow = allow all;
    comments and consecutive user-agent lines handled."""
    r = _robots(spark)
    star = {x["host"]: list(x["disallow"])
            for x in parse_robots_rules(r, "*").collect()}
    assert star == {"a.example": ["/private/", "/tmp/"]}
    mybot = {x["host"]: list(x["disallow"])
             for x in parse_robots_rules(r, "mybot").collect()}
    assert mybot == {"a.example": ["/mybot-only/"]}
    evil = {x["host"]: list(x["disallow"])
            for x in parse_robots_rules(r, "evilbot").collect()}
    assert evil == {"a.example": ["/private/", "/tmp/"],
                    "c.example": ["/"]}


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
    star = {x["host"]: list(x["disallow"])
            for x in parse_robots_rules(r, "*").collect()}
    assert star == {"x.example": ["/private/"]}
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
