"""Sitemap and robots.txt URL enumeration (S1/S3) over fetched bodies.

The reference fetches and parses sitemap XML per source
(``internal/summoner/acquire/resources.go:128-173``, XML decode in
``sitemaps/sitemap_ng.go:42-73``) and discovers sitemaps from robots.txt
``Sitemap:`` lines (``resources.go:89-118``).  The FETCH is the crawl
front-end the input table replaces; the PARSE is a real operator: given
a table of (source, url, body), enumerate page URLs — sitemap indexes
recurse by joining the extracted ``<loc>`` values back against the body
table (bounded rounds: the spec allows one index level; we follow two).

Pure JVM column expressions (``regexp_extract_all``): the reference's
XML decoder reads only ``<loc>`` elements and trims whitespace
(sitemap_ng.go:42-73 + ``strings.TrimSpace`` at resources.go:156), which
a regex over the canonical sitemap vocabulary matches exactly — no
per-row Python, and the same expression runs in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_LOC_RE = r"<loc>\s*([^<]*?)\s*</loc>"
# robots.txt directives are case-insensitive (SITEMAP:/SiteMap: occur
# in the wild; robots parsers incl. the reference's library match them)
_SITEMAP_LINE_RE = r"(?im)^sitemap:\s*(\S+)"


def extract_locs(bodies: DataFrame, body_col: str = "body") -> DataFrame:
    """(…, body) → one row per trimmed <loc> value, plus the sitemap
    kind ('index' if the body declares <sitemapindex>, else 'urlset')."""
    kind = F.when(
        F.col(body_col).contains("<sitemapindex"), F.lit("index")
    ).otherwise(F.lit("urlset"))
    return bodies.withColumn("kind", kind).select(
        "source", F.col("url").alias("sitemap_url"), "kind",
        F.explode(
            F.regexp_extract_all(F.col(body_col), F.lit(_LOC_RE), F.lit(1))
        ).alias("loc"),
    )


def sitemap_page_urls(bodies: DataFrame, start: DataFrame | None = None,
                      max_index_depth: int = 2) -> DataFrame:
    """(source, url, body) → (source, page_url): urlset locs directly;
    index locs resolve by joining back against the ``bodies`` table up
    to ``max_index_depth`` rounds (reference recursion,
    resources.go:146-155).  ``start`` picks the top-level sitemaps (the
    per-source configured URL); default: every body row.  Locs pointing
    at missing bodies are dropped (the reference logs fetch errors and
    continues)."""
    locs = extract_locs(start if start is not None else bodies)
    pages = locs.filter(F.col("kind") == "urlset").select(
        "source", F.col("loc").alias("page_url")
    )
    pending = locs.filter(F.col("kind") == "index").select(
        "source", F.col("loc").alias("url")
    )
    for _ in range(max_index_depth):
        sub = extract_locs(
            pending.join(bodies.select("url", "body"), "url")
        )
        pages = pages.unionByName(
            sub.filter(F.col("kind") == "urlset").select(
                "source", F.col("loc").alias("page_url")
            )
        )
        pending = sub.filter(F.col("kind") == "index").select(
            "source", F.col("loc").alias("url")
        )
    return pages.distinct()


def robots_sitemap_urls(robots: DataFrame, txt_col: str = "body") -> DataFrame:
    """S3: ``Sitemap:`` declarations from robots.txt bodies
    (resources.go:89-118's robots.Sitemaps loop)."""
    return robots.select(
        "source",
        F.explode(
            F.regexp_extract_all(
                F.col(txt_col), F.lit(_SITEMAP_LINE_RE), F.lit(1)
            )
        ).alias("sitemap_url"),
    ).distinct()
