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
