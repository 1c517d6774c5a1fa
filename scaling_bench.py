#!/usr/bin/env python
"""Two-parallelism scaling evidence for the north rule.

The rule's two-cluster-size criterion (N vs 4N executors) cannot use a
real multi-host cluster in this sandbox; per the driver's instruction
it is evidenced by running the SAME job at two parallelism levels on
identical input and reporting throughput at both plus
efficiency = throughput_4N / (4 * throughput_N).

Two modes:

* ``--mode local`` (default): ``local[N]`` vs ``local[4N]`` threads in
  one JVM.  Faithful while both levels sit in the box's linear region
  (2 vs 8); at 8 vs 32 the single shared JVM (one allocator, one GC,
  one memory bus, all-core turbo droop) caps the high level — that is
  a single-process artifact, not a property of the pipeline's plan.
* ``--mode cluster``: ``local-cluster[N,c,m]`` vs
  ``local-cluster[4N,c,m]`` — N real executor JVMs, each a separate
  process with its own heap/GC, identical per-executor cores+memory at
  both levels.  This is the literal shape of the rule ("N and 4N
  executors") and removes the shared-JVM cap; what remains shared is
  the physical memory bus, as on any real multi-executor host.

Each level runs in its own subprocess (a SparkSession master can't be
changed in-process) and is pinned with ``taskset`` to exactly the
cores it is entitled to.  Results go to stdout and BENCH_runs.jsonl;
BENCH.md is curated from those records.

Usage:  python scaling_bench.py [--levels 8,32] [--entities 3000]
        python scaling_bench.py --mode cluster --levels 1,4 \
            [--exec-cores 8] [--exec-mem-mb 16384]
        python scaling_bench.py --worker ...  (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def worker(master_cores, entities: int, shuffle_partitions: int,
           content: bool = False) -> None:
    from pubmed_and_method_spark.session import get_spark

    spark = get_spark(app_name="scaling", cores=master_cores,
                      shuffle_partitions=shuffle_partitions)
    from bench import bench_and_pipeline

    # warm-up run at small size (JIT, Python worker pool spin-up)
    bench_and_pipeline(spark, n_entities=100, content=content)
    sec, n_turns = bench_and_pipeline(
        spark, n_entities=entities, content=content
    )
    print(json.dumps({"master": str(master_cores), "sec": round(sec, 3),
                      "turns": n_turns,
                      "turns_per_sec": round(n_turns / sec, 1)}))


def _pin(cmd: list[str], cores: int) -> list[str]:
    # Pin the worker (and every JVM/python child it forks) to EXACTLY
    # `cores` CPUs.  Without pinning, a small-N run on an M-core box
    # free-rides on the other M-N cores for GC, shuffle-io/netty
    # threads and Python UDF workers, inflating the small-N baseline
    # (measured at 8->32 local mode: ~5% — real but minor; the pin is
    # kept because it is the honest emulation of an N-core node).
    ncpu = os.cpu_count() or cores
    if cores < ncpu:
        return ["taskset", "-c", f"0-{cores - 1}"] + cmd
    return cmd


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--mode", choices=("local", "cluster"), default="local")
    p.add_argument("--cores", default="8",
                   help="(worker) local[N] core count or full master spec")
    p.add_argument("--entities", type=int, default=400000)
    p.add_argument("--levels", default="2,8",
                   help="thread counts (local) or executor counts (cluster)")
    p.add_argument("--exec-cores", type=int, default=8)
    p.add_argument("--exec-mem-mb", type=int, default=16384)
    p.add_argument("--shuffle-partitions", type=int, default=0)
    # r05: scale the CONTENT-carrying spine (sparse-intersection
    # TF-IDF cosine in the match rule) instead of the lean one
    p.add_argument("--content", action="store_true")
    args = p.parse_args()

    if args.worker:
        sp = args.shuffle_partitions or None
        cores = args.cores
        if not cores.startswith("local"):
            cores = int(cores)
        worker(cores, args.entities, sp, content=args.content)
        return 0

    lo, hi = (int(x) for x in args.levels.split(","))
    results = {}
    labels = {}
    for level in (lo, hi):
        if args.mode == "cluster":
            master = f"local-cluster[{level},{args.exec_cores},{args.exec_mem_mb}]"
            pin_cores = level * args.exec_cores
            # same shuffle width at both levels: sized for the BIG
            # level so the comparison never conflates partition-count
            # effects with executor-count effects
            shuffle = max(32, hi * args.exec_cores)
        else:
            master = str(level)
            pin_cores = level
            shuffle = 0  # worker default: max(32, cores)
        labels[level] = (f"local-cluster[{level}x{args.exec_cores}]"
                         if args.mode == "cluster" else f"local[{level}]")
        t0 = time.time()
        cmd = [sys.executable, __file__, "--worker", "--cores", master,
               "--entities", str(args.entities),
               "--shuffle-partitions", str(shuffle)]
        if args.content:
            cmd.append("--content")
        out = subprocess.run(
            _pin(cmd, pin_cores),
            capture_output=True, text=True,
            timeout=int(os.environ.get("SPARK_GRAFT_SCALING_TIMEOUT", "7200")),
        )
        # keep the FULL worker output per level — a failed local-cluster
        # run buries its root cause ("Caused by") thousands of lines
        # before the netty teardown noise a tail would show
        log = f"/tmp/scaling_worker_{args.mode}_{level}.log"
        with open(log, "w") as f:
            f.write(out.stdout + "\n===== stderr =====\n" + out.stderr)
        lines = [l for l in out.stdout.strip().splitlines()
                 if l.startswith("{")]
        if not lines:
            sys.stderr.write(f"worker level={level} failed; full log: {log}\n"
                             + out.stdout[-2000:] + "\n" + out.stderr[-4000:])
            return 1
        results[level] = json.loads(lines[-1])
        results[level]["wall_incl_startup"] = round(time.time() - t0, 1)

    r_lo, r_hi = results[lo], results[hi]
    ratio = hi / lo
    efficiency = round(
        r_hi["turns_per_sec"] / (ratio * r_lo["turns_per_sec"]), 3
    )
    summary = {
        "job": ("and_pipeline_content" if args.content else "and_pipeline")
               + " (signatures->blocking->pairs->features->threshold->CC)",
        "mode": args.mode,
        "input_turns": r_lo["turns"],
        f"{labels[lo]}_turns_per_sec": r_lo["turns_per_sec"],
        f"{labels[hi]}_turns_per_sec": r_hi["turns_per_sec"],
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
