"""URL parsing / domain analytics kernels for webtext corpora.

Common-Crawl-style pipelines slice by host constantly (per-domain
quality gates, hot-domain skew detection, robots/licensing filters),
so host/path/query extraction must be a pure JVM expression that fuses
into the scan stage — never a Python UDF. Built on ``F.parse_url``
(whole-stage-codegen friendly) with regex fallbacks where DuckDB-oracle
parity needs identical semantics.

No reference analog (ballet has no URL surface); required by the task
brief's webtext payload.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_host(url: Column) -> Column:
    """Hostname of a URL (``https://a.example.org/p/1`` → ``a.example.org``)."""
    return F.parse_url(url, F.lit("HOST"))


def url_path(url: Column) -> Column:
    """Path component including the leading slash (empty string when absent)."""
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))


def url_query_param(url: Column, key: str) -> Column:
    """Value of one query-string parameter (NULL when absent).

    The key is interpolated into a JVM regex by ``parse_url``
    (``(&|^)<key>=([^&]*)``) — metacharacters must be escaped or
    ``a.c`` matches ``abc`` and a PHP-style ``id[]`` key throws
    PatternSyntaxException and kills the job."""
    import re

    return F.parse_url(url, F.lit("QUERY"), F.lit(re.escape(key)))


def url_protocol(url: Column) -> Column:
    """Scheme (``https``, ``http``, ...)."""
    return F.parse_url(url, F.lit("PROTOCOL"))


def registrable_domain(url: Column) -> Column:
    """Host with a leading ``www.`` stripped — the grouping key for
    per-domain stats. (A full public-suffix-list lookup is a broadcast
    join against the PSL table at scale; the strip-www heuristic is the
    dependency-free default.)"""
    return F.regexp_replace(url_host(url), r"^www\.", "")


def path_depth(url: Column) -> Column:
    """Number of non-empty ``/``-separated path segments
    (``/a/b`` → 2, ``/`` and empty → 0)."""
    p = url_path(url)
    segs = F.filter(F.split(p, "/"), lambda s: s != "")
    return F.size(segs)


def is_https(url: Column) -> Column:
    return (url_protocol(url) == "https").cast("int")
