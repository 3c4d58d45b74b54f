"""SURT keys — the web-archive world's canonical crawl-index sort key.

SURT (Sort-friendly URI Reordering Transform) is the ``urlkey`` of the
Internet Archive wayback CDX format and Common Crawl's cc-index: drop
the scheme, lowercase, strip userinfo / any port / one leading
``www[N].`` label, REVERSE the host labels comma-joined, then ``)``
plus the path with the query parameters sorted and the fragment
dropped::

    https://www.Example.org:443/a/b?z=1&a=2  →  org,example)/a/b?a=2&z=1

Reversing the host puts every subdomain of a registrable domain into
one contiguous key range, so a 100 TB crawl index range-partitioned on
``urlkey`` gives per-domain locality — domain scans become range scans
(partition pruning), not full shuffles. That is the whole point of the
transform and why every large web archive sorts on it.

Pure JVM expressions; the DuckDB mirror is kept adjacent so the two
cannot drift silently (same convention as
``urls.CANONICAL_URL_SQL``). Exercised by the ``cdx_index`` registry
query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HOSTPORT_RE = r"^[^:/?#]+://([^/?#]*)"
_PATHQ_RE = r"^[^:/?#]+://[^/?#]*([^#]*)"


def surt_key_col(url: Column) -> Column:
    """SURT key of a url column (see module docstring)."""
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, r"^[^@]*@", "")  # userinfo
    host = F.regexp_replace(host, r":\d+$", "")        # any port
    host = F.regexp_replace(host, r"^www\d*\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    pathq = F.lower(F.regexp_extract(url, _PATHQ_RE, 1))
    path = F.regexp_replace(F.substring_index(pathq, "?", 1), "/$", "")
    qs = F.substring_index(pathq, "?", -1)
    query = F.when(
        pathq.contains("?"),
        F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(qs, "&")),
                                          "&")),
    ).otherwise(F.lit(""))
    return F.concat(rev, F.lit(")"), path, query)


# DuckDB mirror of surt_key_col over a column named ``u``
SURT_KEY_SQL = (
    "array_to_string(list_reverse(string_split("
    "regexp_replace(regexp_replace(regexp_replace("
    "lower(regexp_extract(u, '^[^:/?#]+://([^/?#]*)', 1)), "
    "'^[^@]*@', ''), ':[0-9]+$', ''), '^www[0-9]*\\.', ''), "
    "'.')), ',') || ')' || "
    "regexp_replace(string_split(lower(regexp_extract(u, "
    "'^[^:/?#]+://[^/?#]*([^#]*)', 1)), '?')[1], '/$', '') || "
    "CASE WHEN contains(lower(regexp_extract(u, "
    "'^[^:/?#]+://[^/?#]*([^#]*)', 1)), '?') THEN '?' || "
    "list_aggregate(list_sort(string_split(string_split(lower("
    "regexp_extract(u, '^[^:/?#]+://[^/?#]*([^#]*)', 1)), '?')[-1], "
    "'&')), 'string_agg', '&') ELSE '' END"
)
