"""Full pipeline assembly: the one linear DataFrame DAG
(SURVEY.md §3.1.5) with per-stage persistence, checkpoint manifests,
per-partition lineage and resume.

    pages ─ resume-anti-join ─ extract ─ normalize ─ dedup ─ mill ─ link
                                                            └─ org/prov ─ triples

Local persistence is parquet directories (the Iceberg stand-in — the
table layout, partition columns and MERGE-shaped writes carry over to an
Iceberg catalog unchanged; see sources/tables.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import manifest as mf
from ..operators.link import link_stage
from ..operators.provenance import org_triples, partition_lineage, prov_lineage
from ..operators.stages import (
    dedup_docs,
    extract_stage,
    materialize_triples,
    mill_stage,
    normalize_stage,
    salted_repartition,
    with_source,
)
from ..operators.stats import run_stats


@dataclass
class PipelineConfig:
    output_dir: str
    run_id: str = "run-0"
    bucket: str = "gleaner"
    mode: str = "full"            # 'full' | 'diff' (resume)
    link_entities: bool = True
    salt_partitions: int | None = None
    write_stats: bool = True


@dataclass
class PipelineResult:
    blocks: DataFrame
    docs: DataFrame
    triples: DataFrame
    stats: DataFrame | None = None
    resumed_urls_skipped: int | None = None


def _write(df: DataFrame, base: str, name: str,
           partition_by: list[str] | None = None, mode: str = "overwrite"):
    """Stage persistence.  Full runs overwrite; diff (resume) runs append
    the delta — the Iceberg equivalent is MERGE INTO keyed on url/doc_sha
    (the reference appends objects to the store, never clears it)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(os.path.join(base, name))


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    sources_dim: DataFrame | None,
    cfg: PipelineConfig,
) -> PipelineResult:
    base = cfg.output_dir
    os.makedirs(base, exist_ok=True)

    skipped = None
    if cfg.mode == "diff":
        manifest = mf.read_manifest(spark, base)
        if manifest is not None:
            before = pages.count()
            pages = mf.resume_filter(pages, manifest, "extract")
            skipped = before - pages.count()

    pages = with_source(pages, sources_dim)
    if cfg.salt_partitions:
        pages = salted_repartition(pages, cfg.salt_partitions)

    # Diff (resume) semantics: every stage processes only the DELTA and
    # appends it — the table on disk accumulates across runs (the
    # reference appends objects to the store; Iceberg MERGE INTO is the
    # cluster equivalent).  localCheckpoint materializes each stage so
    # downstream stages never re-run the UDFs of an earlier one.
    write_mode = "append" if cfg.mode == "diff" else "overwrite"

    # S1 extract — persist blocks + manifest + lineage
    blocks = extract_stage(pages).localCheckpoint(eager=True)
    _write(blocks, base, "blocks", ["source"], write_mode)
    mf.write_manifest(mf.build_extract_manifest(blocks, cfg.run_id), base)
    partition_lineage(blocks, cfg.run_id, "extract").write.mode("append").parquet(
        os.path.join(base, "lineage")
    )

    # S2 normalize + dedup — persist docs
    docs_all = normalize_stage(blocks)
    docs = dedup_docs(docs_all)
    if cfg.mode == "diff":
        # cross-run content dedup: drop docs whose sha an earlier run
        # already stored (same JSON-LD reached via a new URL)
        try:
            prior = spark.read.parquet(os.path.join(base, "docs"))
            docs = docs.join(prior.select("doc_sha1"), "doc_sha1", "left_anti")
        except Exception:
            pass
    docs = docs.localCheckpoint(eager=True)
    _write(docs, base, "docs", ["source"], write_mode)
    mf.write_manifest(mf.build_docs_manifest(docs, cfg.run_id), base)
    partition_lineage(docs, cfg.run_id, "normalize").write.mode("append").parquet(
        os.path.join(base, "lineage")
    )

    # S3 mill
    triples = mill_stage(docs, cfg.bucket)

    # R4 org graphs union in (full runs only — a resumed run would
    # re-append the same org quads; reference runs org graphs once per
    # harvest, pkg/gleaner.go:18-52)
    if sources_dim is not None and cfg.mode != "diff":
        triples = triples.unionByName(org_triples(sources_dim, cfg.bucket))

    # S4 entity linking
    if cfg.link_entities:
        triples = link_stage(triples)

    # S5 materialize
    triples = materialize_triples(triples).localCheckpoint(eager=True)
    _write(triples, base, "triples", ["source"], write_mode)
    partition_lineage(triples, cfg.run_id, "materialize").write.mode(
        "append"
    ).parquet(os.path.join(base, "lineage"))

    # R5 prov lineage rows
    prov_lineage(docs.filter(F.col("valid")), sources_dim, cfg.run_id,
                 cfg.bucket).write.mode(write_mode).parquet(
        os.path.join(base, "prov")
    )

    stats = None
    if cfg.write_stats:
        stats = run_stats(blocks, docs_all)
        _write(stats, base, "stats")

    return PipelineResult(
        blocks=blocks, docs=docs, triples=triples, stats=stats,
        resumed_urls_skipped=skipped,
    )
