"""Org-graph and PROV-O lineage synthesis (R4, R5) plus per-partition
lineage rows (north rule).

The reference renders Go text/templates per source / per document
(``internal/organizations/org.go:18-33,44-94``;
``internal/summoner/acquire/prov.go:70-173``) and stores each as a
separate object.  Here both are column expressions over DataFrames —
``struct``/``to_json`` builds the JSON-LD, the same mill UDF turns the
org docs into triples, and lineage is a table instead of object spray.

Quirk note: the reference generates prov *before* upload success
(jsonutils.go:375-378) so prov can exist for failed stores; our lineage
rows are emitted from the materialized docs table, i.e. transactional
per partition (SURVEY.md §2.8.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.udfs import mill_udf

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"


def org_jsonld(sources_dim: DataFrame) -> DataFrame:
    """One schema.org Organization JSON-LD doc per source (org.go:18-33):
    identifier = PID, name = ProperName, url = URL."""
    doc = F.to_json(
        F.struct(
            F.lit("https://schema.org/").alias("@context"),
            F.col("pid").alias("@id"),
            F.lit("Organization").alias("@type"),
            F.col("url").alias("url"),
            F.col("propername").alias("name"),
            F.struct(
                F.lit("PropertyValue").alias("@type"),
                F.col("pid").alias("value"),
                F.col("pid").alias("url"),
            ).alias("identifier"),
        )
    )
    return sources_dim.select(
        F.col("name").alias("source"), doc.alias("jsonld")
    )


def org_triples(sources_dim: DataFrame, bucket: str = "gleaner") -> DataFrame:
    """R4: org JSON-LD → triples via the same mill path; graph
    ``urn:{bucket}:{source}:org``."""
    docs = org_jsonld(sources_dim)
    # the org doc uses a string @context → run it through the fix+mill
    # contract like any other doc
    from ..functions.udfs import process_doc_udf

    processed = docs.withColumn(
        "proc",
        process_doc_udf(
            F.col("jsonld"), F.lit("https"), F.lit("jsonsha"), F.lit("")
        ),
    ).select(
        "source",
        F.col("proc.jsonld_fixed").alias("jsonld_fixed"),
        F.col("proc.doc_sha1").alias("doc_sha1"),
    )
    milled = processed.withColumn(
        "quads", mill_udf(F.col("jsonld_fixed"), F.col("doc_sha1"))
    )
    return milled.select(
        "source", F.explode("quads").alias("q")
    ).select(
        F.col("q.subject").alias("subject"),
        F.col("q.predicate").alias("predicate"),
        F.col("q.object").alias("object"),
        F.concat_ws(":", F.lit("urn"), F.lit(bucket), F.col("source"),
                    F.lit("org")).alias("graph"),
        "source",
    )


def prov_lineage(docs: DataFrame, sources_dim: DataFrame | None,
                 run_id: str, bucket: str = "gleaner") -> DataFrame:
    """R5: one PROV-O JSON-LD row per summoned doc.

    Mirrors the reference's template fields (prov.go:70-173): graph URN
    ``urn:{bucket}:{source}:{sha}``, the originating URL as the
    prov:Entity, the source org as the Attribution agent, and the run id
    as the prov:Activity (the reference uses the wall-clock date; a run
    id keeps us deterministic)."""
    urn = F.concat_ws(":", F.lit("urn"), F.lit(bucket), F.col("source"),
                      F.col("norm_sha256"))
    prov = F.to_json(
        F.struct(
            F.lit("https://schema.org/").alias("@context"),
            urn.alias("@id"),
            F.lit("prov:Collection").alias("@type"),
            F.col("url").alias("prov:hadMember"),
            F.col("source").alias("prov:wasAttributedTo"),
            F.lit(run_id).alias("prov:wasGeneratedBy"),
            F.col("doc_sha1").alias("identifier"),
        )
    )
    out = docs.select(
        "url", "source", "doc_sha1", "norm_sha256",
        urn.alias("graph_urn"),
        prov.alias("prov_jsonld"),
        F.sha1(prov).alias("prov_sha"),   # H7: sha1 of rendered prov
        F.lit(run_id).alias("run_id"),
        F.spark_partition_id().alias("partition_id"),
    )
    return out


def partition_lineage(df: DataFrame, run_id: str, stage: str) -> DataFrame:
    """North-rule per-partition lineage: one row per (stage, partition)
    with row counts — written alongside each stage's output so a resumed
    run can prove which partitions completed."""
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(F.count("*").alias("rows"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "rows",
        )
    )
