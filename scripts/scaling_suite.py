"""Round-scale N-vs-4N scaling evidence suite: generate the shared heavy
corpus once, then run multiple pinned fresh-process pipeline probes at
hi (default 8) and lo (default 2) cores, appending one JSON line per run
to the output file so a partially-complete suite still yields evidence.

Usage: python scripts/scaling_suite.py [OUT_JSONL]
Env: SUITE_PAGES (960000), SUITE_HI (8), SUITE_LO (2),
     SUITE_HI_RUNS (3), SUITE_LO_RUNS (2), SUITE_CORPUS_DIR (keep/reuse).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_suite.jsonl"
    pages = int(os.environ.get("SUITE_PAGES", "960000"))
    hi = int(os.environ.get("SUITE_HI", "8"))
    lo = int(os.environ.get("SUITE_LO", "2"))
    hi_runs = int(os.environ.get("SUITE_HI_RUNS", "3"))
    lo_runs = int(os.environ.get("SUITE_LO_RUNS", "2"))

    corpus = os.environ.get("SUITE_CORPUS_DIR")
    own_corpus = False
    if not corpus or not os.path.isdir(corpus):
        corpus = tempfile.mkdtemp(prefix=f"scaling_corpus_{pages}_")
        own_corpus = True
        from gleaner_spark.plans.session import build_session
        from gleaner_spark.sources.pages import gen_pages_spark

        spark = build_session(
            app_name="scaling-gen", cores=32, shuffle_partitions=32,
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        try:
            gen_pages_spark(spark, pages, partitions=64,
                            profile="heavy").write.mode(
                "overwrite").parquet(corpus)
        finally:
            spark.stop()
    os.environ["BENCH_CORPUS_DIR"] = corpus

    # interleave hi/lo so host-weather drift hits both sides evenly
    plan: list[tuple[str, int]] = []
    for i in range(max(hi_runs, lo_runs)):
        if i < hi_runs:
            plan.append(("hi", hi))
        if i < lo_runs:
            plan.append(("lo", lo))

    try:
        with open(out_path, "a") as f:
            f.write(json.dumps({"event": "start", "pages": pages,
                                "corpus": corpus, "plan": plan}) + "\n")
            f.flush()
            for tag, cores in plan:
                s = bench._run_pipeline_pinned(cores, pages)
                rec = {"event": "run", "tag": tag, "cores": cores,
                       "pages": pages, "result": s}
                f.write(json.dumps(rec) + "\n")
                f.flush()
            f.write(json.dumps({"event": "done"}) + "\n")
    finally:
        if own_corpus and not os.environ.get("SUITE_KEEP_CORPUS"):
            shutil.rmtree(corpus, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
