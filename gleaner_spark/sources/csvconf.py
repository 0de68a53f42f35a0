"""Sources-dimension loader from the reference's CSV config format.

Parity with ``internal/config/sources.go:57-167`` (``ReadSourcesCSV`` +
``populateDefaults``): header-named columns (``SourceType, Active, Name,
ProperName, URL, Headless, Domain, PID, Logo, IdentifierPath,
IdentifierType, FixContextOption, ...``), Go ``strconv.ParseBool``
boolean lexicon, ``SourceType`` defaulting to ``sitemap``, and URL
whitespace trimming ("Space from CSV causing url errors",
sources.go:124).  Unknown columns are ignored, missing ones get the
struct defaults — empty identifier/fix options resolve downstream
exactly like the reference's unset viper keys (``process_document``
treats '' as jsonsha / https).

The one Spark-side addition: ``domain`` is normalized to a bare host
(scheme and path stripped) because it is the broadcast-join key against
``pages.host`` (``operators/stages.with_source``); the reference's CSVs
carry full URLs there and it does fuzzy matching elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# strconv.ParseBool's accepted lexicon (gocsv delegates to it)
_TRUE = ("1", "t", "true")
_FALSE = ("0", "f", "false")

_STRING_FIELDS = {
    # csv header (lowercased) -> (output column, default)
    "sourcetype": ("sourcetype", "sitemap"),
    "name": ("name", ""),
    "logo": ("logo", ""),
    "url": ("url", ""),
    "pid": ("pid", ""),
    "propername": ("propername", ""),
    "domain": ("domain", ""),
    "identifierpath": ("identifierpath", ""),
    "identifiertype": ("identifiertype", ""),
    "fixcontextoption": ("fixcontextoption", ""),
}


def _parse_bool(col: str, default: bool):
    lowered = F.lower(F.trim(F.col(col)))
    return (
        F.when(lowered.isin(*_TRUE), F.lit(True))
        .when(lowered.isin(*_FALSE), F.lit(False))
        .otherwise(F.lit(default))
    )


def sources_from_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a reference-format sources CSV into the sources-dim relation
    the pipeline broadcasts (``with_source``)."""
    raw = spark.read.option("header", "true").option("quote", '"').csv(path)
    cols = {c.lower().strip().lstrip("﻿"): c for c in raw.columns}

    out = []
    for key, (name, default) in _STRING_FIELDS.items():
        if key in cols:
            out.append(F.coalesce(F.trim(F.col(f"`{cols[key]}`")),
                                  F.lit(default)).alias(name))
        else:
            out.append(F.lit(default).alias(name))
    for key, default in (("active", True), ("headless", False)):
        if key in cols:
            out.append(_parse_bool(f"`{cols[key]}`", default).alias(key))
        else:
            out.append(F.lit(default).alias(key))

    df = raw.select(*out)
    return df.select(
        # populateDefaults: empty SourceType -> sitemap (sources.go:120-127)
        F.when(F.col("sourcetype") == "", "sitemap")
        .otherwise(F.col("sourcetype")).alias("sourcetype"),
        "name", "logo",
        # URL trim already applied above (TrimSpace parity)
        "url", "pid", "propername",
        # join-key normalization: bare host from whatever the CSV carries
        F.lower(
            F.regexp_replace(
                F.regexp_replace("domain", r"^[a-zA-Z][a-zA-Z0-9+.-]*://", ""),
                r"[/:].*$", "",
            )
        ).alias("domain"),
        "identifierpath", "identifiertype", "fixcontextoption",
        "active", "headless",
    )
