"""spark-submit entry point.

    spark-submit --py-files gleaner_spark.zip -m ...   # cluster
    python -m gleaner_spark.job --pages <parquet|synth:N> --out <dir> \
        [--mode full|diff] [--no-link] [--cores N] [--run-id ID]

Replaces the reference CLIs (``gleaner -cfg -source -mode full|diff``,
``glcon gleaner batch`` — cmd/gleaner/main.go:49-55, pkg/cli/batch.go:38-113):
the config file becomes flags + the sources-dimension table, the BoltDB
resume KV becomes the checkpoint manifest under --out.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gleaner_spark.job")
    p.add_argument("--pages", required=True,
                   help="parquet path of the pages table, or synth:N")
    p.add_argument("--sources", default=None,
                   help="parquet path of the sources dimension "
                        "(default: built-in synthetic dimension)")
    p.add_argument("--out", required=True, help="output/warehouse directory")
    p.add_argument("--mode", choices=["full", "diff"], default="full")
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--bucket", default="gleaner")
    p.add_argument("--no-link", action="store_true",
                   help="skip the entity-linking stage")
    p.add_argument("--cores", default=None,
                   help="local[N] cores (omit under spark-submit)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--salt-partitions", type=int, default=None)
    args = p.parse_args(argv)

    from .plans.pipeline import PipelineConfig, run_pipeline
    from .plans.session import build_session
    from .sources.pages import gen_pages_spark, gen_sources_spark

    spark = build_session(
        app_name=f"gleaner-spark:{args.run_id}",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()

    if args.pages.startswith("synth:"):
        n = int(args.pages.split(":", 1)[1])
        parts = args.shuffle_partitions or 32
        pages = gen_pages_spark(spark, n, parts)
    else:
        pages = spark.read.parquet(args.pages)

    sources = (
        spark.read.parquet(args.sources) if args.sources
        else gen_sources_spark(spark)
    )

    cfg = PipelineConfig(
        output_dir=args.out,
        run_id=args.run_id,
        bucket=args.bucket,
        mode=args.mode,
        link_entities=not args.no_link,
        salt_partitions=args.salt_partitions,
    )
    result = run_pipeline(spark, pages, sources, cfg)

    summary = {
        "run_id": args.run_id,
        "mode": args.mode,
        "pages_skipped_by_resume": result.resumed_urls_skipped,
        "urls": result.blocks.select("url").distinct().count(),
        "docs": result.docs.count(),
        "triples": result.triples.count(),
        "seconds": round(time.time() - t0, 2),
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
