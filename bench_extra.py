"""Round-6 measurement harness (bench.py is frozen for the driver).

Times ONLY the headline queries — same session config, warm-up and
median-of-windows methodology as bench.py — so optimization iterations
don't pay the pipeline-throughput runs.  Also supports per-query
isolation and plan dumps.

Usage:
    python bench_extra.py [--windows N] [--queries a,b,c] [--explain DIR]
Env:
    SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, _median, _warmup_dir  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--queries", type=str, default="")
    ap.add_argument("--explain", type=str, default="",
                    help="dump .explain('formatted') per query to DIR")
    ap.add_argument("--suffix", type=str, default="after",
                    help="plan filename suffix (before/after)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = [q for q in args.queries.split(",") if q] or HEADLINE

    from gleaner_spark.plans.queries import QUERIES
    from gleaner_spark.plans.session import build_session

    spark = build_session(
        app_name="bench-extra", cores=cores, shuffle_partitions=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES[HEADLINE[0]][0](spark, sf_dir).count()
    QUERIES["kg_extract_mill"][0](spark, _warmup_dir(sf_dir)).count()

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in names:
            df = QUERIES[name][0](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.explain, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        print(f"wrote {len(names)} plans to {args.explain}", file=sys.stderr)

    windows = []
    for w in range(args.windows):
        per = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"w{w}:{name}")
            t0 = time.time()
            n = QUERIES[name][0](spark, sf_dir).count()
            per[name] = round(time.time() - t0, 3)
            print(f"  w{w}/{name}: {per[name]}s ({n} rows)", file=sys.stderr)
        windows.append(per)
        spark.catalog.clearCache()
    timings = {n: round(_median([w[n] for w in windows]), 3) for n in names}
    spark.stop()
    print(json.dumps({
        "queries": timings,
        "total_sec": round(sum(timings.values()), 3),
        "sf_dir": sf_dir,
        "windows": windows,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
