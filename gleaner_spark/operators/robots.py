"""Robots allow/deny filtering (S2).

The reference fetches robots.txt per source and tests every candidate
URL against the parsed group before queueing it
(``internal/summoner/acquire/utils.go:10-39``,
``resources.go:164-167,175-197``).  With a pre-crawled input table the
fetch disappears, but the FILTER is still a real operator: a deployment
re-harvesting a corpus must honor current robots rules.

Spark shape: the rules relation (host, disallow_prefix) is config-scale
→ broadcast anti-join with an equi-key on host plus the path-prefix
test, so the page table is never shuffled.  Crawl-delay handling is a
crawler politeness concern with no analogue over a static table
(documented non-goal, SURVEY.md §2 S2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .stages import url_host


def robots_filter(pages: DataFrame, robots_dim: DataFrame) -> DataFrame:
    """Drop pages whose URL path starts with a disallow prefix for their
    host.  ``robots_dim``: (host, disallow_prefix) — one row per rule,
    like the Disallow lines of a parsed robots.txt group."""
    p = pages
    if "host" not in p.columns:
        p = p.withColumn("host", url_host(F.col("url")))
    # scheme match is case-insensitive (RFC 3986); a URL with no path
    # component means path '/' for robots purposes
    path = F.regexp_replace(
        "url", r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+", ""
    )
    p = p.withColumn(
        "_path", F.when(path == "", F.lit("/")).otherwise(path)
    )
    rules = robots_dim.select(
        F.col("host").alias("_rhost"),
        F.col("disallow_prefix").alias("_prefix"),
    ).filter(
        # an empty 'Disallow:' value means ALLOW everything — it must
        # not become a match-all prefix (startswith('') is always true)
        F.length("_prefix") > 0
    )
    cond = (F.col("host") == F.col("_rhost")) & F.col("_path").startswith(
        F.col("_prefix")
    )
    return p.join(F.broadcast(rules), cond, "left_anti").drop("_path")
