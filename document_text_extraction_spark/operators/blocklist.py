"""URL / domain blocklist filtering — the standard pre-extraction
hygiene pass of a web-corpus pipeline (C4 / RefinedWeb drop documents
whose registered domain appears on adult/spam/malware blocklists before
any expensive processing).

Scale shape (100 TB corpus, blocklists are 10^4–10^6 rows):

* **exact hosts broadcast** into a hash LEFT ANTI join — map-side
  against every corpus partition, the corpus side never shuffles;
* **suffix rules** (``*.tracker.example``) cannot equi-join, but real
  blocklists carry few of them — they fold into ONE JVM boolean
  expression (``endswith`` chain), i.e. a plain pushed-down filter;
* applied BEFORE extraction, the predicate prunes work, not just rows:
  blocked pages never reach the Python map stage.

Reference analogue: none (single-machine scripts process whatever they
are given); this belongs to the training-pipeline layer the engine adds
(same family as ``operators.contamination`` / ``curation.curate``).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOSTPORT_PATTERN = r"^[^:/?#]+://([^/?#]*)"


def host_of(url=None) -> F.Column:
    """The url's HOST — the blocklist match key.

    The authority must stop at '/', '?' and '#' (the naive
    ``https?://([^/]+)`` let ``https://blocked.example?x=1`` extract
    ``blocked.example?x=1`` and sail past the blocklist), and userinfo
    / port decorations must not defeat an exact-host entry either:
    ``u@blocked.example:8443`` matches ``blocked.example``."""
    u = url if url is not None else F.col("url")
    hostport = F.regexp_extract(u, _HOSTPORT_PATTERN, 1)
    no_user = F.regexp_replace(hostport, r"^[^@]*@", "")
    return F.regexp_replace(no_user, r":\d+$", "")


def blocklist_filter(pages: DataFrame,
                     blocked_hosts: DataFrame | Sequence[str] = (),
                     blocked_suffixes: Sequence[str] = (),
                     url_col: str = "url") -> DataFrame:
    """Drop every page whose host is blocklisted.

    ``blocked_hosts``: exact hostnames — a single-column DataFrame
    (column ``host``) or a plain sequence; joined with an explicit
    ``broadcast()`` anti-join so the corpus side stays map-only.
    ``blocked_suffixes``: domain suffixes (e.g. ``".ads.example"``),
    compiled into one conjunctive JVM filter expression.
    """
    host = host_of(F.col(url_col))
    out = pages
    if blocked_suffixes:
        keep = reduce(
            lambda acc, sfx: acc & ~host.endswith(sfx),
            blocked_suffixes, F.lit(True))
        out = out.filter(keep)
    if isinstance(blocked_hosts, DataFrame):
        blocked = blocked_hosts.select(F.col("host").alias("__bl_host"))
    elif len(blocked_hosts):
        blocked = pages.sparkSession.createDataFrame(
            [(h,) for h in blocked_hosts], "__bl_host string")
    else:
        return out
    return (
        out.withColumn("__bl_host", host)
        .join(F.broadcast(blocked), "__bl_host", "left_anti")
        .drop("__bl_host")
    )
