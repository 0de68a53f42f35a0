"""Generate an sf1.0-like measurement dataset by scaling the sf0.1
tables 10x (deterministic, seed 42).  MEASUREMENT ONLY: the driver's
round-end bench generates its own sf1.0; this local replica lets the
round's optimizations be timed at the same scale the driver grades at.

- documents / embeddings: fresh rows drawn from the same observed
  distribution (31-word soup, 10-100 tokens, ~5% ' dup' suffix;
  unit-norm 64-dim vectors, 10 labels) so near-dup candidate volume
  scales the way the driver's generator scales it (fixed vocab =>
  quadratic candidate growth), instead of 10x exact-copy clusters that
  replication would create.
- relational tables + events: replicated 10x with key strides, which
  preserves group cardinalities per key and multiplies row counts.

Usage: python scripts/gen_sf_scale.py [out_dir] [scale]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]


def gen_documents(out: str, n: int, rng: np.random.Generator) -> None:
    lens = rng.integers(10, 101, size=n)
    langs = rng.choice(["en", "zh", "es", "fr", "de"], size=n,
                       p=[0.412, 0.150, 0.148, 0.148, 0.142])
    srcs = rng.integers(0, 20, size=n)
    dup = rng.random(n) < 0.05
    texts = []
    for i in range(n):
        words = rng.choice(VOCAB, size=lens[i])
        t = " ".join(words)
        if dup[i]:
            t += " dup"
        texts.append(t)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"src{s}" for s in srcs], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))


def gen_embeddings(out: str, n: int, rng: np.random.Generator) -> None:
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
    })
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/bench_sf1.0"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    gen_documents(out, 5000 * scale, rng)
    gen_embeddings(out, 2000 * scale, rng)

    con = duckdb.connect()
    con.sql(f"set threads to {os.cpu_count()}")
    rep = {
        # table -> (key columns to stride, stride)
        "region": ([], 0),
        "nation": ([], 0),
        "customer": (["c_custkey"], 1_000_000),
        "supplier": (["s_suppkey"], 1_000_000),
        "part": (["p_partkey"], 1_000_000),
        "orders": (["o_orderkey", "o_custkey"], 1_000_000),
        "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], 1_000_000),
        "events": (["event_id", "user_id"], 10_000_000),
    }
    for t, (keys, stride) in rep.items():
        path = f"{src}/{t}.parquet"
        if not keys:
            con.sql(f"copy (select * from read_parquet('{path}')) to "
                    f"'{out}/{t}.parquet' (format parquet)")
            continue
        cols = [c[0] for c in con.sql(
            f"describe select * from read_parquet('{path}')").fetchall()]
        sel = ", ".join(
            f"{c} + i * {stride} as {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"copy (select {sel} from read_parquet('{path}'), "
            f"range({scale}) t(i)) to '{out}/{t}.parquet' (format parquet)"
        )
    print(f"wrote scale={scale} tables to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
