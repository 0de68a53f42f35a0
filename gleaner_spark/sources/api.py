"""Paged-API source enumeration (S7).

The reference loops ``urlloc = fmt.Sprintf(source.URL, i)`` for i = 0,
1, … while responses stay 200 and i < ApiPageLimit (0 = unbounded) —
``internal/summoner/acquire/api.go:90-165``.  With fetched bodies in a
table, the HTTP loop becomes a relational computation: enumerate the
candidate page URLs per source, join against the fetch-result relation,
and keep exactly the contiguous 200-status prefix — pages after the
first failure are excluded even if they happen to exist (the reference's
loop would never have requested them).

Scale shape: candidates = sources × page-limit (config-scale) →
broadcastable side of the join against the big fetch table; no shuffle
of the fetched relation beyond the join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_PAGES_DEFAULT = 1000


def api_page_urls(sources: DataFrame, fetched: DataFrame,
                  max_pages: int = MAX_PAGES_DEFAULT) -> DataFrame:
    """sources: (source, url_template with a ``%d`` placeholder,
    apipagelimit — 0 means unbounded, capped at ``max_pages``);
    fetched: (url, status).  Returns (source, page, url) for the
    contiguous OK prefix per source, in api.go's loop order semantics."""
    limit = F.when(
        F.col("apipagelimit") > 0,
        F.least(F.col("apipagelimit"), F.lit(max_pages)),
    ).otherwise(F.lit(max_pages))
    cand = sources.select(
        "source", "url_template",
        F.explode(F.sequence(F.lit(0), limit - 1)).alias("page"),
    ).withColumn(
        "url",
        F.expr("replace(url_template, '%d', cast(page as string))"),
    ).drop("url_template")

    j = cand.join(fetched.select("url", "status"), "url", "left")
    ok = F.coalesce(F.col("status") == 200, F.lit(False))
    first_fail = (
        j.filter(~ok)
        .groupBy("source")
        .agg(F.min("page").alias("first_fail"))
    )
    return (
        j.filter(ok)
        .join(first_fail, "source", "left")
        .filter(
            F.col("first_fail").isNull()
            | (F.col("page") < F.col("first_fail"))
        )
        .select("source", "page", "url")
    )
