"""Local replica of the driver's correctness gate: run every registered
query through Spark AND its DuckDB oracle at a given sf dir, compare
row count + (name-sorted) columns + order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def normalize_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    return str(v)


def frame_key(df):
    cols = sorted(df.columns)
    rows = sorted(
        tuple(normalize_cell(r[c]) for c in cols) for _, r in df.iterrows()
    )
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from gleaner_spark.plans.queries import QUERIES
    from gleaner_spark.plans.session import build_session

    spark = build_session(cores=8, shuffle_partitions=16,
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"create view {t} as select * from "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, (fn, oracle) in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        if oracle is None:
            print(f"rows-only  {name}: {len(sdf)} rows "
                  f"({time.time() - t0:.1f}s)")
            if len(sdf) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            odf = con.sql(oracle).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error {str(e)[:200]}")
            continue
        scols, srows = frame_key(sdf)
        ocols, orows = frame_key(odf)
        ok = scols == ocols and srows == orows
        status = "OK   " if ok else "FAIL "
        print(f"{status} {name}: spark={len(srows)} duck={len(orows)} "
              f"({time.time() - t0:.1f}s)")
        if not ok:
            msg = []
            if scols != ocols:
                msg.append(f"cols spark={scols} duck={ocols}")
            if len(srows) != len(orows):
                msg.append(f"rowcount {len(srows)} vs {len(orows)}")
            sset, oset = set(srows), set(orows)
            extra = list(sset - oset)[:3]
            missing = list(oset - sset)[:3]
            if extra:
                msg.append(f"spark-only {extra}")
            if missing:
                msg.append(f"duck-only {missing}")
            failures.append((name, "; ".join(msg)))
            print("      " + "; ".join(msg)[:600])

    print(f"\n{len(failures)} failures")
    for n, m in failures:
        print(f"  {n}: {m[:300]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
