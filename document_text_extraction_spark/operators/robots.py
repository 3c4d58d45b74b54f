"""robots.txt protocol filtering — the crawl-permission layer that the
``<meta name=robots>`` tag (fields.meta_robots) does not cover.

A compliant corpus pipeline must drop pages a host's ``/robots.txt``
disallows for the crawler's user-agent *before* training ingestion,
even when the crawler itself fetched them (RFC 9309; C4/CCNet apply the
same hygiene retroactively). This module is the dataset-level form:

* :func:`parse_robots_rules` — robots bodies table ``(host, body)`` →
  ``(host, disallow: array<string>)`` of path prefixes that apply to
  the given user-agent (its own groups win; the ``*`` groups apply
  only when the agent has no group of its own — including when its own
  group is the standard allow-all exemption ``Disallow:`` with no
  value). CRLF/tab whitespace tolerated per RFC 9309. Pure JVM
  expressions: one posexplode + one window for stanza grouping — no
  UDF, linear in body size.
* :func:`robots_filter` — drop every page whose url path starts with a
  disallowed prefix of its host. One hash join on the lowercased host
  (the rules table is one row per host — tiny next to the corpus;
  broadcast-able when the host set is, AQE decides) + one ``exists``
  over the prefix array per page. Hosts without rules keep their
  pages.

Simplifications vs full RFC 9309, stated: longest-match
Allow/Disallow precedence is not implemented (Allow lines are
ignored), and ``*``/``$`` wildcards inside paths match literally. Both
are extensions most simple robots files never use; the upgrade path is
a pandas-UDF parser with the same output schema.

Reference analogue: none (the reference processes local files); this
belongs to the crawl-hygiene family (robots meta, blocklists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.urls import _HOSTPORT_RE

_PATH_RE = r"^[^:/?#]+://[^/?#]*(/[^?#]*)?"


def _wtrim(col):
    """Trim ALL whitespace (F.trim strips only 0x20 — real robots.txt
    files are routinely CRLF-terminated and tab-separated, which must
    not defeat agent/prefix matching)."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def parse_robots_rules(robots: DataFrame, user_agent: str = "*",
                       host_col: str = "host",
                       body_col: str = "body") -> DataFrame:
    """``(host, body)`` → ``(host, disallow array)`` for ``user_agent``.

    Stanza semantics: a ``User-agent:`` line opens a group; consecutive
    user-agent lines share the following rule lines. The specific
    agent's groups REPLACE the ``*`` groups whenever the agent has any
    group of its own — even one whose only directive is the allow-all
    ``Disallow:`` with an empty value (the standard exemption idiom).
    """
    lines = F.split(F.col(body_col), "\n")
    clean = F.filter(
        F.transform(
            lines,
            lambda ln: _wtrim(F.regexp_replace(ln, "#.*$", "")),
        ),
        lambda ln: ln != "",
    )
    ex = robots.select(
        F.lower(F.col(host_col)).alias("host"),
        F.posexplode(clean).alias("pos", "ln"),
    ).withColumn("ua", F.lower("ln").startswith("user-agent:"))
    # stanza id: +1 whenever a user-agent line starts a NEW group (its
    # predecessor was not a user-agent line) — one window, linear
    w = Window.partitionBy("host").orderBy("pos")
    new_group = F.col("ua") & ~F.coalesce(
        F.lag("ua").over(w), F.lit(False))
    ex = ex.withColumn(
        "sid", F.sum(new_group.cast("int")).over(w))
    ua_val = F.lower(_wtrim(F.substring_index("ln", ":", -1)))
    agents = (ex.filter("ua")
              .groupBy("host", "sid")
              .agg(F.collect_set(ua_val).alias("agents")))
    dis_val = _wtrim(F.expr("substring(ln, 10)"))  # after 'Disallow:'
    rules = (ex.filter(~F.col("ua")
                       & F.lower("ln").startswith("disallow:"))
             .select("host", "sid", dis_val.alias("prefix"))
             .filter(F.col("prefix") != ""))
    me = F.lit(user_agent.lower())
    # group selection from AGENTS, not from joined rules: an agent
    # whose own group has only an empty Disallow (allow-all) must
    # still suppress the '*' fallback for that host
    my_stanzas = agents.filter(F.array_contains("agents", me))
    my_hosts = my_stanzas.select("host").distinct()
    wild_stanzas = (agents.filter(F.array_contains("agents", "*"))
                    .join(my_hosts, "host", "left_anti"))
    chosen = my_stanzas.unionAll(wild_stanzas).select("host", "sid")
    return (rules.join(chosen, ["host", "sid"])
            .groupBy("host")
            .agg(F.array_sort(F.collect_set("prefix"))
                 .alias("disallow")))


def robots_filter(pages: DataFrame, rules: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Drop pages whose url path begins with a disallowed prefix of
    their host. Hash join on the LOWERCASED host (robots hosts are
    case-insensitive; the join must not leak disallowed pages for
    mixed-case urls); per-page check is one ``exists`` over the
    (small, per-host) prefix array."""
    host = F.lower(
        F.regexp_extract(F.col(url_col), _HOSTPORT_RE, 1))
    path = F.coalesce(
        F.nullif(F.regexp_extract(F.col(url_col), _PATH_RE, 1), F.lit("")),
        F.lit("/"))
    tagged = pages.withColumn("__rb_host", host).withColumn(
        "__rb_path", path)
    joined = tagged.join(
        rules.select(F.lower(F.col("host")).alias("__rb_host"),
                     "disallow"),
        "__rb_host", "left")
    blocked = F.when(
        F.col("disallow").isNotNull(),
        F.exists("disallow",
                 lambda p: F.col("__rb_path").startswith(p)),
    ).otherwise(F.lit(False))
    return (joined.filter(~blocked)
            .drop("__rb_host", "__rb_path", "disallow"))
