"""Physical-plan audits: the optimizations the engine depends on at
scale must actually appear in the executed plans — filters reach the
parquet scan, dimension joins broadcast, aggregations have map-side
partial phases, projections prune the scan schema, and the anti-join
resume primitive stays a join (not a subquery rescan)."""

from __future__ import annotations

import pytest

from gleaner_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["hash_ids"][0](spark, SF)
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "LessThan(doc_id,50)" in plan.replace(" ", "")


def test_dimension_joins_broadcast(spark):
    df = QUERIES["broadcast_lookup_join"][0](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # nation and region both broadcast — no shuffle for the dim chain
    assert plan.count("BroadcastExchange") >= 2


def test_aggregation_is_partial(spark):
    df = QUERIES["pricing_summary"][0](spark, SF)
    plan = _plan(df)
    # map-side partial + final aggregate: two HashAggregate operators
    # (AQE shows codegen spans only in the executed final plan, so assert
    # the partial-aggregation markers instead)
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_projection_prunes_scan_schema(spark):
    df = QUERIES["token_count"][0](spark, SF)
    plan = _plan(df)
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "text" in scan_line and "doc_id" in scan_line
    # untouched wide columns must not be read
    assert "embedding" not in scan_line and "source" not in scan_line


def test_resume_antijoin_is_a_join(spark):
    df = QUERIES["anti_join_diff"][0](spark, SF)
    plan = _plan(df)
    assert "LeftAnti" in plan


def test_pipeline_source_join_broadcasts(spark):
    from gleaner_spark.operators.stages import with_source
    from gleaner_spark.sources.pages import gen_pages_spark, gen_sources_spark

    pages = with_source(gen_pages_spark(spark, 50, 2),
                        gen_sources_spark(spark))
    assert "BroadcastHashJoin" in _plan(pages)


def test_mill_explode_is_jvm_only(spark):
    """With the fused process UDF the mill is a pure JVM explode — no
    second Python stage in the plan."""
    from gleaner_spark.operators.stages import (
        extract_stage, mill_stage, normalize_stage, with_source,
    )
    from gleaner_spark.sources.pages import gen_pages_spark, gen_sources_spark

    docs = normalize_stage(
        extract_stage(
            with_source(gen_pages_spark(spark, 20, 2), gen_sources_spark(spark))
        )
    ).localCheckpoint(eager=True)
    plan = _plan(mill_stage(docs, "g"))
    assert "Generate posexplode" in plan or "Generate explode" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def _iter_nodes(node):
    """Walk a SparkPlan tree via py4j, descending through AQE wrappers."""
    yield node
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        yield from _iter_nodes(node.executedPlan())
        return
    ch = node.children()
    for i in range(ch.size()):
        yield from _iter_nodes(ch.apply(i))


def _subtree_has_limit(node) -> bool:
    bounded = {
        "TakeOrderedAndProjectExec", "GlobalLimitExec", "LocalLimitExec",
        "CollectLimitExec",
    }
    return any(
        n.getClass().getSimpleName() in bounded for n in _iter_nodes(node)
    )


# queries whose construction starts a streaming job — audited elsewhere
WINDOW_AUDIT_SKIP = {"streaming_event_counts", "streaming_incremental_kg",
                     "streaming_sessionize"}


def test_no_unbounded_unpartitioned_window(spark):
    """Scale-killer guard (round-1 VERDICT #2): a Window with no
    partitionBy moves EVERY input row to one partition.  Allowed only
    when the input is already bounded by a limit (global top-k derives
    its rank over the k-row TakeOrderedAndProject output)."""
    offenders = []
    for name, (fn, _oracle) in QUERIES.items():
        if name in WINDOW_AUDIT_SKIP:
            continue
        df = fn(spark, SF)
        root = df._jdf.queryExecution().executedPlan()
        for node in _iter_nodes(root):
            if node.getClass().getSimpleName() == "WindowExec" and \
                    node.partitionSpec().isEmpty() and \
                    not _subtree_has_limit(node):
                offenders.append(name)
    assert not offenders, (
        f"unpartitioned Window over unbounded input in: {offenders}"
    )


def test_robots_filter_is_broadcast_map_side(spark):
    """S2: the per-host rule arrays broadcast; the page relation is
    never shuffled or re-joined — REP winner selection is a map-side
    expression over the broadcast rules (no aggregation over pages)."""
    df = QUERIES["robots_filter"][0](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # pages are never sort-merge-joined (the rules-dim build may shuffle
    # its own tiny distinct, but the page relation only meets a broadcast)
    assert "SortMergeJoin" not in plan
    # winner selection must not aggregate or re-shuffle the page
    # relation: no exchange keyed on the page url anywhere in the plan
    assert "collect_list" in plan
    assert "hashpartitioning(url" not in plan


def test_ann_topk_plans_as_take_ordered(spark):
    """The brute-force and IVF top-k must plan as TakeOrderedAndProject
    (per-partition heap + driver merge), not a corpus-wide Window sort."""
    from gleaner_spark.plans.queries import q_ann_topk_bruteforce

    for name, fn in (
        ("ann_topk_bruteforce", q_ann_topk_bruteforce),
        ("ann_ivf_probe", QUERIES["ann_ivf_probe"][0]),
    ):
        df = fn(spark, SF)
        assert "TakeOrderedAndProject" in _plan(df), name


def test_minhash_on_codegen_path(spark):
    """The MinHash signature must be exploded-rows + partial-agg min —
    not interpreted higher-order functions over arrays."""
    df = QUERIES["minhash_signature"][0](spark, SF)
    plan = _plan(df)
    assert "Generate explode" in plan
    # partial + final min aggregation (SortAggregate for string min)
    assert "partial_min" in plan
    # no interpreted higher-order-function md5: the digest is a plain
    # projection over exploded rows
    assert "Project [doc_id" in plan and "md5" in plan


def test_salted_repartition_breaks_mega_domain_skew(spark):
    """North rule: mega-domain skew handled by salted repartitioning on
    url-host.  A 40%-of-the-corpus host must not pin a single partition:
    after salting, the largest partition stays near the mean instead of
    holding the whole domain."""
    from pyspark.sql import functions as F

    from gleaner_spark.operators.stages import salted_repartition, url_host

    # host-clustered input: 40% mega.example.org + 60% spread over 12
    rows = [(f"https://mega.example.org/p/{i}",) for i in range(4000)] + [
        (f"https://site{i % 12}.example.org/p/{i}",) for i in range(6000)
    ]
    pages = spark.createDataFrame(rows, "url string").withColumn(
        "host", url_host(F.col("url"))
    ).repartition(16, "host")  # simulate host-clustered layout

    before = (
        pages.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().agg(F.max("count")).first()[0]
    )
    assert before >= 4000  # the mega domain pins one partition

    salted = salted_repartition(pages, 16, salt=8)
    sizes = [
        r["count"]
        for r in salted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    ]
    mean = sum(sizes) / len(sizes)
    # the guard bounds the largest shuffle KEY at mega/salt (500 here);
    # partitions still get several keys by hashing, so assert the domain
    # is no longer pinned (≥2× better than unsalted) and the residual
    # imbalance stays within key-granularity bounds
    assert max(sizes) < before / 2, (max(sizes), before)
    assert max(sizes) <= 3.5 * mean, (max(sizes), mean)
    assert salted.count() == 10000  # nothing lost or duplicated


def test_sign_lsh_bits_scale_with_corpus(spark):
    """Round-3 VERDICT #2: sign-LSH bit-width derives from corpus size
    so mean bucket occupancy stays flat — on a 10× corpus the cap-drop
    row fraction must stay bounded instead of every bucket blowing past
    the cap as a constant width would."""
    from pyspark.sql import functions as F

    from gleaner_spark.functions.minhash import cap_buckets
    from gleaner_spark.plans.queries import (
        SIGN_LSH_MAX_BUCKET, _sign_bucket_expr, _sign_lsh_bits,
    )

    # formula: clamped, monotone, integer-exact on power-of-two edges
    assert _sign_lsh_bits(1) == 4
    assert _sign_lsh_bits(64 * 16) == 4
    assert _sign_lsh_bits(64 * 16 + 1) == 5
    assert _sign_lsh_bits(10_000) == 8
    assert _sign_lsh_bits(10**12) == 16   # clamped at the probe ceiling
    sizes = [10**k for k in range(7)]
    widths = [_sign_lsh_bits(n) for n in sizes]
    assert widths == sorted(widths)

    def corpus(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64),"
                " d -> cast(hash(id, d) as double))"
            ).alias("embedding"),
        )

    for n in (1_000, 10_000):
        eb = corpus(n).select(
            "vec_id", _sign_bucket_expr(_sign_lsh_bits(n)).alias("bucket")
        )
        kept = cap_buckets(eb, ["bucket"], SIGN_LSH_MAX_BUCKET).count()
        dropped_frac = (n - kept) / n
        assert dropped_frac < 0.05, (n, dropped_frac)


def test_ann_ivf_nprobe_recall_sweep(spark):
    """The IVF nprobe recall-vs-cost lever, MEASURED: recall@10 against
    the exact brute-force top-10 must be monotone non-decreasing in
    nprobe and reach 1.0 when every cell is probed (IVF with all cells
    == brute force).  The label quantizer partitions the space
    arbitrarily (labels are not embedding clusters), so expected recall
    at nprobe of 10 cells is ~nprobe/10 — assert at least half that;
    the TRAINED quantizer (ann_ivf_kmeans) is the quality path."""
    from gleaner_spark.plans.queries import (
        q_ann_ivf_probe, q_ann_topk_bruteforce,
    )

    exact = {r.vec_id for r in q_ann_topk_bruteforce(spark, SF).collect()}
    assert len(exact) == 10
    recalls = []
    for nprobe in (1, 2, 4, 10):
        got = {r.vec_id
               for r in q_ann_ivf_probe(spark, SF, nprobe=nprobe).collect()}
        recalls.append((nprobe, len(got & exact) / len(exact)))
    rs = [r for _, r in recalls]
    assert rs == sorted(rs), recalls
    assert rs[-1] == 1.0, recalls       # all cells probed == exact
    for nprobe, r in recalls:
        assert r >= (nprobe / 10) / 2, recalls


def test_microdata_rdfa_plan_is_shuffle_free(spark):
    """The structured-data extraction is a scan → projection (pandas
    UDF) → explode: at 100 TB it must run at scan parallelism with NO
    exchange — assert the plan carries the pushed doc_id filter and
    zero shuffles."""
    df = QUERIES["kg_microdata_rdfa"][0](spark, SF)
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
    assert "ArrowEvalPython" in plan or "EvalPython" in plan


def test_sameas_rewrite_join_strategy_gate(spark):
    """Round-5 materialize cliff: the sameAs map is reliable_ckpt'd, so
    Catalyst has NO stats for it and the subject/object rewrite joins
    silently sort-merge — shuffling the fattest relation in the pipeline
    twice (measured 1342 s vs 411 s broadcast at 960k pages / 8 cores).
    link_stage must measure the map and hint broadcast under the size
    gate; above the gate the shuffle join is the correct fallback."""
    from gleaner_spark.operators.link import canonicalize_triples, link_stage

    t = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    nm = "<https://schema.org/name>"
    org = "<https://schema.org/Organization>"
    rows = []
    for j, alias in enumerate(["Ocean Data Consortium",
                               "OCEAN DATA CONSORTIUM",
                               "Ocean-Data-Consortium"]):
        e = f"<https://ex.org/e/{j}>"
        rows.append((e, t, org, "g", "s1"))
        rows.append((e, nm, f'"{alias}"', "g", "s1"))
    triples = spark.createDataFrame(
        rows,
        "subject string, predicate string, object string, graph string,"
        " source string",
    )

    # small map -> gate picks broadcast: both rewrite joins hash-build
    linked = link_stage(triples)
    plan = _plan(linked)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # the rewrite must actually canonicalize (aliases share one id)
    subs = {r.subject for r in linked.filter(
        (linked.predicate == nm) & (linked.source == "s1")).collect()}
    assert len(subs) == 1

    # above the gate: explicit fallback keeps the shuffle join
    sameas = spark.createDataFrame(
        [("<https://ex.org/e/1>", "<https://ex.org/e/0>")],
        "entity string, canonical string",
    )
    smj = canonicalize_triples(triples, sameas, broadcast_map=False)
    assert "SortMergeJoin" in _plan(smj), _plan(smj)
    bhj = canonicalize_triples(triples, sameas, broadcast_map=True)
    assert _plan(bhj).count("BroadcastHashJoin") >= 2
