"""robots.txt protocol filtering — the crawl-permission layer that the
``<meta name=robots>`` tag (fields.meta_robots) does not cover.

A compliant corpus pipeline must drop pages a host's ``/robots.txt``
disallows for the crawler's user-agent *before* training ingestion,
even when the crawler itself fetched them (RFC 9309; C4/CCNet apply the
same hygiene retroactively). This module is the dataset-level form:

* :func:`parse_robots_rules` — robots bodies table ``(host, body)`` →
  ``(host, disallow: array<string>)`` of path prefixes that apply to
  the given user-agent (its own group, plus the ``*`` group when the
  agent has none). Pure JVM array/string expressions: lines → strip
  comments/whitespace → group by user-agent stanzas → collect Disallow
  prefixes. No UDF.
* :func:`robots_filter` — drop every page whose url path starts with a
  disallowed prefix of its host. One hash join on host (the rules
  table is one row per host — tiny next to the corpus; broadcast-able
  when the host set is, AQE decides) + one ``exists`` over the
  prefix array per page. Empty-prefix ``Disallow:`` (allow all) and
  hosts without rules keep their pages.

Simplifications vs full RFC 9309, stated: longest-match Allow/Disallow
precedence is not implemented (Allow lines are ignored), and ``*``/
``$`` wildcards inside paths match literally. Both are extensions most
simple robots files never use; the upgrade path is a pandas-UDF parser
with the same output schema.

Reference analogue: none (the reference processes local files); this
belongs to the crawl-hygiene family (robots meta, blocklists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PATH_RE = r"^[^:/?#]+://[^/?#]*(/[^?#]*)?"


def parse_robots_rules(robots: DataFrame, user_agent: str = "*",
                       host_col: str = "host",
                       body_col: str = "body") -> DataFrame:
    """``(host, body)`` → ``(host, disallow array)`` for ``user_agent``.

    Stanza semantics: a ``User-agent:`` line opens a group; consecutive
    user-agent lines share the following rule lines. A group applies if
    any of its agents equals ``user_agent`` (case-insensitive) or is
    ``*``; the specific agent's groups win over ``*`` groups when both
    exist (RFC 9309 group selection, simplified to exact agent names).
    """
    lines = F.split(F.col(body_col), "\n")
    # strip comments + whitespace, drop empties — one transform chain
    clean = F.filter(
        F.transform(
            lines,
            lambda ln: F.trim(F.regexp_replace(ln, "#.*$", "")),
        ),
        lambda ln: ln != "",
    )
    # tag each line with its stanza id: a user-agent line AFTER a rule
    # line starts a new stanza (consecutive UA lines share one)
    is_ua = F.transform(
        clean, lambda ln: F.lower(ln).startswith("user-agent:"))
    # running stanza id via aggregate over (prev_was_rule, id) state
    tagged = F.aggregate(
        F.arrays_zip(clean.alias("ln"), is_ua.alias("ua")),
        F.struct(F.lit(0).alias("sid"), F.lit(True).alias("prev_rule"),
                 F.array().cast("array<struct<sid:int,ln:string,ua:boolean>>")
                 .alias("out")),
        lambda acc, x: F.struct(
            F.when(x["ua"] & acc["prev_rule"], acc["sid"] + 1)
            .otherwise(acc["sid"]).alias("sid"),
            (~x["ua"]).alias("prev_rule"),
            F.array_append(
                acc["out"],
                F.struct(
                    F.when(x["ua"] & acc["prev_rule"], acc["sid"] + 1)
                    .otherwise(acc["sid"]).alias("sid"),
                    x["ln"].alias("ln"), x["ua"].alias("ua"))).alias("out"),
        ),
        lambda acc: acc["out"],
    )
    base = robots.select(F.col(host_col).alias("host"),
                         tagged.alias("tl"))
    ex = base.select("host", F.explode("tl").alias("t")).select(
        "host", F.col("t.sid").alias("sid"), F.col("t.ln").alias("ln"),
        F.col("t.ua").alias("ua"))
    ua_val = F.lower(F.trim(F.substring_index("ln", ":", -1)))
    agents = (ex.filter("ua")
              .groupBy("host", "sid")
              .agg(F.collect_set(ua_val).alias("agents")))
    dis_val = F.trim(F.expr("substring(ln, 10)"))  # after 'Disallow:'
    rules = (ex.filter(~F.col("ua")
                       & F.lower("ln").startswith("disallow:"))
             .select("host", "sid", dis_val.alias("prefix"))
             .filter(F.col("prefix") != ""))
    joined = rules.join(agents, ["host", "sid"])
    me = F.lit(user_agent.lower())
    mine = joined.filter(F.array_contains("agents", me))
    wild = joined.filter(F.array_contains("agents", "*"))
    # specific-agent groups win; hosts with none fall back to '*'
    my_hosts = mine.select("host").distinct()
    chosen = mine.unionAll(
        wild.join(my_hosts, "host", "left_anti"))
    return (chosen.groupBy("host")
            .agg(F.array_sort(F.collect_set("prefix"))
                 .alias("disallow")))


def robots_filter(pages: DataFrame, rules: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Drop pages whose url path begins with a disallowed prefix of
    their host. Hash join on host; per-page check is one ``exists``
    over the (small, per-host) prefix array."""
    host = F.regexp_extract(F.col(url_col), r"^[^:/?#]+://([^/?#]*)", 1)
    path = F.coalesce(
        F.nullif(F.regexp_extract(F.col(url_col), _PATH_RE, 1), F.lit("")),
        F.lit("/"))
    tagged = pages.withColumn("__rb_host", host).withColumn(
        "__rb_path", path)
    joined = tagged.join(
        rules.select(F.col("host").alias("__rb_host"), "disallow"),
        "__rb_host", "left")
    blocked = F.when(
        F.col("disallow").isNotNull(),
        F.exists("disallow",
                 lambda p: F.col("__rb_path").startswith(p)),
    ).otherwise(F.lit(False))
    return (joined.filter(~blocked)
            .drop("__rb_host", "__rb_path", "disallow"))
