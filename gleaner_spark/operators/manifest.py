"""Checkpoint manifests + resume (S14/J3).

The reference's BoltDB KV store (bucket per source, key = URL, value =
sha or ``NILL:``/``NULL:`` sentinel — acquire.go:187-191,273-294) drives
its incremental "diff" mode via a hash-set difference
(``resources.go:210-245``).  Here the manifest is a parquet table
``(run_id, stage, url, doc_sha, status)`` and resume is a left-anti
join — the same EXCEPT semantics, shuffle-free on the small side when
the manifest broadcasts, partition-prunable at scale because the
manifest is partitioned by stage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_SCHEMA = (
    "run_id string, stage string, url string, doc_sha string, status string"
)

STATUS_STORED = "stored"      # sha recorded
STATUS_NILL = "NILL"          # visited, no JSON-LD (reference sentinel)
STATUS_NULL = "NULL"          # visited, empty/invalid doc (reference sentinel)


def manifest_path(base_dir: str) -> str:
    return os.path.join(base_dir, "manifest")


def build_extract_manifest(blocks: DataFrame, run_id: str) -> DataFrame:
    """One row per visited URL from the extract stage: sha-less statuses
    mirror the reference's NILL/NULL KV sentinels."""
    per_url = blocks.groupBy("url").agg(
        F.max(F.col("block_idx")).alias("max_idx")
    )
    return per_url.select(
        F.lit(run_id).alias("run_id"),
        F.lit("extract").alias("stage"),
        "url",
        F.lit(None).cast("string").alias("doc_sha"),
        F.when(F.col("max_idx") >= 0, F.lit(STATUS_STORED))
        .otherwise(F.lit(STATUS_NILL))
        .alias("status"),
    )


def build_docs_manifest(docs: DataFrame, run_id: str) -> DataFrame:
    return docs.select(
        F.lit(run_id).alias("run_id"),
        F.lit("normalize").alias("stage"),
        "url",
        F.col("doc_sha1").alias("doc_sha"),
        F.when(F.col("valid"), F.lit(STATUS_STORED))
        .otherwise(F.lit(STATUS_NULL))
        .alias("status"),
    )


def write_manifest(manifest: DataFrame, base_dir: str) -> None:
    manifest.write.mode("append").partitionBy("stage").parquet(
        manifest_path(base_dir)
    )


def read_manifest(spark: SparkSession, base_dir: str) -> DataFrame | None:
    path = manifest_path(base_dir)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(path)
    except Exception:
        return None


def resume_filter(pages: DataFrame, manifest: DataFrame | None,
                  stage: str = "extract") -> DataFrame:
    """J3: drop URLs the manifest already covers — the reference's
    ``difference(sitemapURLs, alreadySummoned)`` (resources.go:210-245)
    as a left-anti join.  With no manifest: full mode."""
    if manifest is None:
        return pages
    done = manifest.filter(F.col("stage") == stage).select("url").distinct()
    return pages.join(done, "url", "left_anti")
