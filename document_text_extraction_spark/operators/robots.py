"""robots.txt protocol filtering — the crawl-permission layer that the
``<meta name=robots>`` tag (fields.meta_robots) does not cover.

A compliant corpus pipeline must drop pages a host's ``/robots.txt``
disallows for the crawler's user-agent *before* training ingestion,
even when the crawler itself fetched them (RFC 9309; C4/CCNet apply the
same hygiene retroactively). This module is the dataset-level form:

* :func:`parse_robots_rules` — robots bodies table ``(host, body)`` →
  ``(host, rules: array<struct<prefix, allow, pattern>>)`` of BOTH
  Allow and Disallow rules that apply to the given user-agent (its own
  groups win; the ``*`` groups apply only when the agent has no group
  of its own — including when its own group is the standard allow-all
  exemption ``Disallow:`` with no value). The array is sorted for
  longest-match evaluation: most octets first, Allow before Disallow at
  equal length (RFC 9309 §2.2.2: "The most specific match found MUST
  be used"; equivalent allow/disallow → allow). CRLF/tab whitespace
  tolerated per RFC 9309. Pure JVM expressions: one posexplode + one
  window for stanza grouping — no UDF, linear in body size.
* :func:`robots_filter` — drop every page whose url path's MOST
  SPECIFIC matching rule is a Disallow. One hash join on the
  lowercased, userinfo/port-stripped host (the rules table is one row
  per host — tiny next to the corpus; broadcast-able when the host set
  is, AQE decides) + one ``filter``+``element_at`` over the
  specificity-sorted rule array per page. Hosts without rules (or with
  no matching rule) keep their pages.

Wildcards: ``*`` matches any octet run and a trailing ``$`` anchors the
match at the path end (the de-facto extensions RFC 9309 §2.2.3 blesses)
— both compiled into ONE JVM ``LIKE`` pattern per rule at parse time
(``*`` → ``%``, literal ``%``/``_``/``\\`` escaped, non-anchored rules
get a trailing ``%``), so the per-page match is a JVM LIKE over a tiny
per-host array, no regex compilation in the hot path. Rule specificity
is the octet length of the raw rule path as written (wildcards count,
per Google's reference parser).

Reference analogue: none (the reference processes local files); this
belongs to the crawl-hygiene family (robots meta, blocklists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .blocklist import host_of

_PATH_RE = r"^[^:/?#]+://[^/?#]*(/[^?#]*)?"


def _wtrim(col):
    """Trim ALL whitespace (F.trim strips only 0x20 — real robots.txt
    files are routinely CRLF-terminated and tab-separated, which must
    not defeat agent/prefix matching)."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def _like_pattern(prefix):
    """Compile a robots rule path into a SQL LIKE pattern (escape char
    ``\\``): ``*`` → ``%``, trailing ``$`` anchors (no trailing ``%``),
    literal LIKE metacharacters escaped. All ``F.replace`` (literal,
    not regex) so robots bodies cannot inject pattern syntax."""
    anchored = prefix.endswith("$")
    core = F.when(
        anchored, F.expr("substring(__rb_prefix, 1, "
                         "length(__rb_prefix) - 1)")
    ).otherwise(prefix)
    esc = F.replace(core, F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit("%"), F.lit("\\%"))
    esc = F.replace(esc, F.lit("_"), F.lit("\\_"))
    pat = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(anchored, pat).otherwise(F.concat(pat, F.lit("%")))


def _grouped_lines(robots: DataFrame, host_col: str,
                   body_col: str) -> DataFrame:
    """Shared stanza machinery: body → one row per non-empty line with
    (host, pos, ln, ua flag, sid stanza id). A ``User-agent:`` line
    opens a group; consecutive user-agent lines share the following
    rule lines. One posexplode + one window — linear in body size."""
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
    return ex.withColumn("sid", F.sum(new_group.cast("int")).over(w))


def _chosen_stanzas(ex: DataFrame, user_agent: str) -> DataFrame:
    """(host, sid) pairs whose group applies to ``user_agent``: its own
    groups REPLACE the ``*`` groups whenever the agent has ANY group of
    its own — even one whose only directive is the allow-all
    ``Disallow:`` with an empty value (the standard exemption idiom).
    Selection is from AGENT lines, not joined rules, so the empty
    exemption still suppresses the ``*`` fallback."""
    ua_val = F.lower(_wtrim(F.substring_index("ln", ":", -1)))
    agents = (ex.filter("ua")
              .groupBy("host", "sid")
              .agg(F.collect_set(ua_val).alias("agents")))
    me = F.lit(user_agent.lower())
    my_stanzas = agents.filter(F.array_contains("agents", me))
    my_hosts = my_stanzas.select("host").distinct()
    wild_stanzas = (agents.filter(F.array_contains("agents", "*"))
                    .join(my_hosts, "host", "left_anti"))
    return my_stanzas.unionAll(wild_stanzas).select("host", "sid")


def parse_robots_rules(robots: DataFrame, user_agent: str = "*",
                       host_col: str = "host",
                       body_col: str = "body") -> DataFrame:
    """``(host, body)`` → ``(host, rules array)`` for ``user_agent``.

    ``rules`` is sorted most-specific-first (octet length desc, Allow
    before Disallow on ties, then prefix for determinism), so the first
    matching element IS the governing rule.
    """
    ex = _grouped_lines(robots, host_col, body_col)
    directive = F.lower(_wtrim(F.substring_index("ln", ":", 1)))
    rule_val = _wtrim(F.expr("substring(ln, locate(':', ln) + 1)"))
    rules = (ex.filter(~F.col("ua"))
             .select("host", "sid", directive.alias("d"),
                     rule_val.alias("__rb_prefix"))
             .filter(F.col("d").isin("allow", "disallow")
                     & (F.col("__rb_prefix") != "")))
    chosen = _chosen_stanzas(ex, user_agent)
    picked = (rules.join(chosen, ["host", "sid"])
              .select("host",
                      F.struct(
                          F.col("__rb_prefix").alias("prefix"),
                          (F.col("d") == "allow").alias("allow"),
                          _like_pattern(F.col("__rb_prefix"))
                          .alias("pattern"),
                      ).alias("rule")))

    def _cmp(l, r):  # noqa: E741 - l/r read naturally here
        ll, rl = F.length(l["prefix"]), F.length(r["prefix"])
        return (F.when(ll > rl, F.lit(-1)).when(ll < rl, F.lit(1))
                .when(l["allow"] & ~r["allow"], F.lit(-1))
                .when(r["allow"] & ~l["allow"], F.lit(1))
                .when(l["prefix"] < r["prefix"], F.lit(-1))
                .when(l["prefix"] > r["prefix"], F.lit(1))
                .otherwise(F.lit(0)))

    return (picked.groupBy("host")
            .agg(F.array_sort(F.collect_set("rule"), _cmp)
                 .alias("rules")))


def parse_robots_meta(robots: DataFrame, user_agent: str = "*",
                      host_col: str = "host",
                      body_col: str = "body") -> DataFrame:
    """Per-host crawl metadata beyond allow/disallow:

    * ``crawl_delay`` — the ``Crawl-delay:`` of the groups that apply
      to ``user_agent`` (same group-selection precedence as the
      rules); several applicable groups → the MINIMUM (the
      conservative rate a polite scheduler must honor); absent or
      non-numeric → null;
    * ``sitemaps`` — every ``Sitemap:`` URL in the file, sorted. Per
      the sitemaps protocol these are group-INDEPENDENT, so they are
      collected from all lines, not just chosen stanzas.

    Same pure-JVM stanza machinery as :func:`parse_robots_rules`; a
    host appears iff it has a crawl-delay or at least one sitemap.
    """
    ex = _grouped_lines(robots, host_col, body_col)
    directive = F.lower(_wtrim(F.substring_index("ln", ":", 1)))
    val = _wtrim(F.expr("substring(ln, locate(':', ln) + 1)"))
    body = ex.filter(~F.col("ua")).select(
        "host", "sid", directive.alias("d"), val.alias("v"))
    chosen = _chosen_stanzas(ex, user_agent)
    delays = (body.filter(F.col("d") == "crawl-delay")
              .join(chosen, ["host", "sid"])
              .select("host",
                      F.col("v").try_cast("double").alias("cd"))
              .filter(F.col("cd").isNotNull())
              .groupBy("host")
              .agg(F.min("cd").alias("crawl_delay")))
    maps = (body.filter((F.col("d") == "sitemap") & (F.col("v") != ""))
            .groupBy("host")
            .agg(F.array_sort(F.collect_set("v")).alias("sitemaps")))
    return (delays.join(maps, "host", "full")
            .select("host", "crawl_delay",
                    F.coalesce("sitemaps", F.array()).alias("sitemaps")))


def robots_filter(pages: DataFrame, rules: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Drop pages whose url path's most specific matching rule is a
    Disallow. Hash join on the LOWERCASED host with userinfo and port
    stripped (robots hosts are case-insensitive, and
    ``https://u@host:8443/…`` must not evade a rule for ``host`` — the
    same hardening as ``blocklist.host_of``); the per-page check keeps
    only the rules whose LIKE pattern matches and takes the first
    (most specific) — Allow or missing → keep."""
    host = F.lower(host_of(F.col(url_col)))
    path = F.coalesce(
        F.nullif(F.regexp_extract(F.col(url_col), _PATH_RE, 1), F.lit("")),
        F.lit("/"))
    tagged = pages.withColumn("__rb_host", host).withColumn(
        "__rb_path", path)
    joined = tagged.join(
        rules.select(F.lower(F.col("host")).alias("__rb_host"),
                     "rules"),
        "__rb_host", "left")
    winner = F.try_element_at(
        F.expr("filter(rules, r -> __rb_path LIKE r.pattern "
               "ESCAPE '\\\\')"), F.lit(1))
    blocked = F.when(
        F.col("rules").isNotNull() & winner.isNotNull(),
        ~winner["allow"],
    ).otherwise(F.lit(False))
    return (joined.filter(~blocked)
            .drop("__rb_host", "__rb_path", "rules"))
