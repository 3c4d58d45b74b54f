"""URL canonicalization for crawl-table keys — pure JVM expressions.

Crawl dedup and host accounting need one canonical form per resource:
case-normalized scheme/host, default ports dropped, fragments dropped,
a single trailing slash stripped, query parameters sorted. Every step
is a deterministic regex/array expression with an exact DuckDB
analogue (the ``url_canonical_planted`` oracle query).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([^:/?#]+)://"
_HOSTPORT_RE = r"^[^:/?#]+://([^/?#]*)"
_PATHQ_RE = r"^[^:/?#]+://[^/?#]*([^#]*)"


def canonical_url_col(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, drop :80/:443 default
    ports, drop the fragment, strip one trailing slash from a non-root
    path, sort query parameters."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, ":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, ":443$", ""),
    ).otherwise(hostport)
    pathq = F.regexp_extract(url, _PATHQ_RE, 1)
    path = F.substring_index(pathq, "?", 1)
    path = F.regexp_replace(path, "/$", "")
    has_q = pathq.contains("?")
    qs = F.substring_index(pathq, "?", -1)
    sorted_q = F.array_join(F.array_sort(F.split(qs, "&")), "&")
    query = F.when(has_q, F.concat(F.lit("?"), sorted_q)).otherwise(
        F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, query)


def resolve_href_col(base: Column, href: Column) -> Column:
    """Resolve an ``<a href>`` value against its page url — the
    link-graph edge destination (RFC 3986 reference resolution, the
    subset real crawl hrefs use):

    * scheme-qualified (``https://…``, ``mailto:…``) → unchanged;
    * protocol-relative ``//host/p`` → base scheme + href;
    * root-relative ``/p`` → base origin + href;
    * fragment-only ``#x`` → the base url (its own fragment stripped)
      + fragment (RFC 3986 §4.4, matching ``urllib.parse.urljoin``);
    * query-only ``?x`` → base path kept, query replaced (also §4.4);
    * path-relative ``p`` → base origin + base directory + href
      (no ``..`` normalization — crawl hrefs rarely need it, and the
      canonicalizer is a separate pass).

    Pure JVM expression: no UDF, usable under an exploded outlinks
    column at full corpus width.
    """
    scheme = F.regexp_extract(base, _SCHEME_RE, 1)
    host = F.regexp_extract(base, _HOSTPORT_RE, 1)
    origin = F.concat(scheme, F.lit("://"), host)
    base_path = F.regexp_extract(base, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    base_dir = F.when(
        base_path.contains("/"),
        F.regexp_replace(base_path, "/[^/]*$", "/"),
    ).otherwise(F.lit("/"))
    return (
        F.when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .when(href.startswith("#"),
              F.concat(F.regexp_replace(base, "#.*$", ""), href))
        # query-only ref (RFC 3986 §4.4 / urljoin): replaces the query,
        # KEEPS the base path — resolving '?page=2' against the base
        # directory would drop the filename pagination points at
        .when(href.startswith("?"),
              F.concat(F.regexp_replace(base, r"[?#].*$", ""), href))
        .otherwise(F.concat(origin, base_dir, href))
    )


# the DuckDB mirror of canonical_url_col, as a SQL expression over a
# column named ``u`` (kept adjacent so the two cannot drift silently)
CANONICAL_URL_SQL = (
    "lower(regexp_extract(u, '^([^:/?#]+)://', 1)) || '://' || "
    "CASE "
    "WHEN lower(regexp_extract(u, '^([^:/?#]+)://', 1)) = 'http' AND "
    "lower(regexp_extract(u, '^[^:/?#]+://([^/?#]*)', 1)) LIKE '%:80' "
    "THEN regexp_replace(lower(regexp_extract(u, "
    "'^[^:/?#]+://([^/?#]*)', 1)), ':80$', '') "
    "WHEN lower(regexp_extract(u, '^([^:/?#]+)://', 1)) = 'https' AND "
    "lower(regexp_extract(u, '^[^:/?#]+://([^/?#]*)', 1)) LIKE '%:443' "
    "THEN regexp_replace(lower(regexp_extract(u, "
    "'^[^:/?#]+://([^/?#]*)', 1)), ':443$', '') "
    "ELSE lower(regexp_extract(u, '^[^:/?#]+://([^/?#]*)', 1)) END || "
    "regexp_replace(string_split("
    "regexp_extract(u, '^[^:/?#]+://[^/?#]*([^#]*)', 1), '?')[1], "
    "'/$', '') || "
    "CASE WHEN contains(regexp_extract(u, "
    "'^[^:/?#]+://[^/?#]*([^#]*)', 1), '?') THEN '?' || "
    "list_aggregate(list_sort(string_split(string_split("
    "regexp_extract(u, '^[^:/?#]+://[^/?#]*([^#]*)', 1), '?')[-1], "
    "'&')), 'string_agg', '&') ELSE '' END"
)


# two-level public suffixes this pipeline recognizes — a documented
# SUBSET of the Mozilla Public Suffix List covering the highest-volume
# country registries (the PSL itself is public; swap in the full list
# by extending this tuple — both the Spark expression and the DuckDB
# mirror are generated from it, so they cannot drift)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "co.in", "co.za",
    "com.sg", "com.hk", "co.kr", "or.kr", "com.tw",
)

_IPV4_RE = r"^\d+\.\d+\.\d+\.\d+$"


def registrable_domain_col(host: Column) -> Column:
    """The registrable (pay-level) domain of a hostname — the
    granularity domain quotas, blocklists, and per-site dedup SHOULD
    key on (``news.bbc.co.uk`` and ``www.bbc.co.uk`` are one
    publisher, ``bbc.co.uk``): last two labels, or last three when the
    final two form a recognized two-level public suffix
    (:data:`TWO_LEVEL_SUFFIXES`). IPv4 literals and single-label
    hosts pass through unchanged. Pure JVM expression (split +
    element_at + one IN over a literal set) — usable under a groupBy
    at corpus width."""
    h = F.lower(F.trim(F.regexp_replace(host, r"\.$", "")))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2),
                        F.element_at(labels, -1))
    last3 = F.concat_ws(".", F.element_at(labels, -3), last2)
    return (
        F.when(h.rlike(_IPV4_RE), h)
        .when(n < 2, h)
        .when((n >= 3) & last2.isin(*TWO_LEVEL_SUFFIXES), last3)
        .otherwise(last2)
    )


# the DuckDB mirror over a column named ``host`` (kept adjacent and
# generated from the same tuple so the two cannot drift); ``_H``/_L``
# expand the normalized host / its label list textually — DuckDB
# evaluates the repeated subexpression once via CSE
_H = r"regexp_replace(lower(trim(host)), '\.$', '')"
_L = f"string_split({_H}, '.')"
REGISTRABLE_DOMAIN_SQL = (
    f"CASE WHEN regexp_matches({_H}, '^\\d+\\.\\d+\\.\\d+\\.\\d+$') THEN {_H} "
    f"WHEN len({_L}) < 2 THEN {_H} "
    f"WHEN len({_L}) >= 3 AND ({_L}[-2] || '.' || {_L}[-1]) IN ("
    + ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES) + ") "
    f"THEN {_L}[-3] || '.' || {_L}[-2] || '.' || {_L}[-1] "
    f"ELSE {_L}[-2] || '.' || {_L}[-1] END"
)
