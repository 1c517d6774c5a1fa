#!/usr/bin/env python
"""Two-parallelism scaling evidence for the north rule.

The rule's two-cluster-size criterion (N vs 4N executors) cannot use a
real cluster in this sandbox; per the driver's instruction it is
evidenced by running the SAME job at two local parallelism levels on
identical input and reporting throughput at both plus
efficiency = throughput_4N / (4 * throughput_N).

Each level runs in its own subprocess (a SparkSession master can't be
changed in-process).  Results go to stdout and BENCH.md.

Usage:  python scaling_bench.py [--levels 8,32] [--entities 3000]
        python scaling_bench.py --worker --cores N --entities M  (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def worker(cores: int, entities: int) -> None:
    from pubmed_and_method_spark.session import get_spark

    spark = get_spark(app_name=f"scaling_{cores}", cores=cores,
                      shuffle_partitions=max(cores, 16))
    from bench import bench_and_pipeline

    # warm-up run at small size (JIT, Python worker pool spin-up)
    bench_and_pipeline(spark, n_entities=100)
    sec, n_turns = bench_and_pipeline(spark, n_entities=entities)
    print(json.dumps({"cores": cores, "sec": round(sec, 3),
                      "turns": n_turns,
                      "turns_per_sec": round(n_turns / sec, 1)}))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--entities", type=int, default=400000)
    p.add_argument("--levels", default="2,8")
    args = p.parse_args()

    if args.worker:
        worker(args.cores, args.entities)
        return 0

    lo, hi = (int(x) for x in args.levels.split(","))
    results = {}
    for cores in (lo, hi):
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, __file__, "--worker", "--cores", str(cores),
             "--entities", str(args.entities)],
            capture_output=True, text=True,
            timeout=int(os.environ.get("SPARK_GRAFT_SCALING_TIMEOUT", "7200")),
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        results[cores]["wall_incl_startup"] = round(time.time() - t0, 1)

    r_lo, r_hi = results[lo], results[hi]
    ratio = hi / lo
    efficiency = round(
        r_hi["turns_per_sec"] / (ratio * r_lo["turns_per_sec"]), 3
    )
    summary = {
        "job": "and_pipeline (signatures->blocking->pairs->features->threshold->CC)",
        "input_turns": r_lo["turns"],
        f"local[{lo}]_turns_per_sec": r_lo["turns_per_sec"],
        f"local[{hi}]_turns_per_sec": r_hi["turns_per_sec"],
        "parallelism_ratio": ratio,
        "scaling_efficiency": efficiency,
        "speedup": round(r_hi["turns_per_sec"] / r_lo["turns_per_sec"], 2),
    }
    print(json.dumps(summary, indent=2))

    # append the raw record; BENCH.md is curated by hand from these
    with open(os.path.join(os.path.dirname(__file__), "BENCH_runs.jsonl"), "a") as f:
        f.write(json.dumps({"levels": [lo, hi], **summary}) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
