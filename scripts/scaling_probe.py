"""One pipeline run at a given core count over a pre-generated corpus,
with CPU-utilization sampling — run in a FRESH process so driver-memory
conf takes effect (the JVM heap is fixed at launch).

Usage: python scripts/scaling_probe.py CORES PAGES [PROFILE]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cpu_sampler(stop, samples):
    def read():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:]))

    prev = read()
    while not stop.is_set():
        time.sleep(2)
        cur = read()
        d = [b - a for a, b in zip(prev, cur)]
        tot = sum(d) or 1
        samples.append({
            "busy": 1.0 - (d[3] + d[4]) / tot,
            "iowait": d[4] / tot,
            "sys": d[2] / tot,
            "steal": (d[7] if len(d) > 7 else 0) / tot,
        })
        prev = cur


def main():
    cores = int(sys.argv[1])
    pages = int(sys.argv[2])
    profile = sys.argv[3] if len(sys.argv) > 3 else "heavy"

    # Pin this process tree to `cores` host cpus BEFORE the JVM launches
    # (children inherit affinity at fork) — an unpinned local[N] run
    # leaks GC/shuffle/python-worker work onto every host cpu.
    if hasattr(os, "sched_setaffinity") and not os.environ.get(
        "SCALING_PROBE_NO_PIN"
    ):
        avail = sorted(os.sched_getaffinity(0))
        os.sched_setaffinity(0, set(avail[:cores]))

    import bench

    stop = threading.Event()
    samples: list[float] = []
    t = threading.Thread(target=cpu_sampler, args=(stop, samples), daemon=True)
    t.start()
    # 3× cores shuffle partitions: with exactly `cores` partitions one
    # straggler stalls a whole wave (measured 49% utilization in the
    # materialize stage); smaller tasks smooth the tail and AQE coalesces
    # any that end up tiny.
    r = bench._run_pipeline(cores, pages,
                            shuffle_partitions=max(cores * 3, 8),
                            profile=profile)
    stop.set()
    n = max(len(samples), 1)
    for k in ("busy", "iowait", "sys", "steal"):
        r[f"cpu_{k}_mean"] = round(sum(s[k] for s in samples) / n, 3)
    r["cpu_busy_max"] = round(max((s["busy"] for s in samples), default=0.0), 3)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
