#!/bin/bash
# Round-5 pinned 2-vs-8 scaling evidence over one shared pre-generated
# 960k heavy corpus (same protocol as rounds 2-4: fresh cpu-pinned
# subprocess per sample, scripts/scaling_probe.py).  Emits one JSON line
# per sample to stdout.
set -u
cd "$(dirname "$0")/.."
PAGES="${SCALING_PAGES:-960000}"
CORPUS=$(mktemp -d /tmp/scaling_corpus_r5_XXXX)
trap 'rm -rf "$CORPUS"' EXIT

python - "$PAGES" "$CORPUS" <<'EOF'
import sys
from gleaner_spark.plans.session import build_session
from gleaner_spark.sources.pages import gen_pages_spark
n, path = int(sys.argv[1]), sys.argv[2]
spark = build_session(app_name="scaling-gen", cores=32, shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
gen_pages_spark(spark, n, partitions=64, profile="heavy") \
    .write.mode("overwrite").parquet(path)
spark.stop()
print("CORPUS_READY", flush=True)
EOF

export BENCH_CORPUS_DIR="$CORPUS"
# interleave hi/lo so host-weather windows hit both sides
for round in 1 2 3; do
  for cores in 8 2; do
    echo "SAMPLE cores=$cores round=$round $(date -u +%H:%M:%S)"
    python scripts/scaling_probe.py "$cores" "$PAGES" heavy 2>/dev/null | tail -1
  done
done
