"""Job entrypoint: run the full AND pipeline and print metrics JSON.

Usage (local sandbox):
    python -m pubmed_and_method_spark --cores 8 --stage-dir /tmp/stages

On a cluster the same pipeline runs under spark-submit via the thin
launcher (tools/and_submit_job.py), with the engine shipped as a
--py-files zip (tools/make_pyfiles_zip.py); the deployment contract —
imports resolve inside the zip, metrics reproduce, stages resume —
is pinned by tests/test_submit.py against a real local-cluster master.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pubmed_and_method_spark")
    p.add_argument("--cores", default="8", help="local[N] parallelism")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--algo", choices=["gbt", "rf"], default="gbt")
    p.add_argument("--num-buckets", type=int, default=4,
                   help="triangle-split salt buckets for pair generation")
    p.add_argument("--stage-dir", default=None,
                   help="checkpoint root (resumable); default: fresh temp dir")
    p.add_argument("--entities", type=int, default=40)
    args = p.parse_args(argv)

    from pubmed_and_method_spark.plans.checkpoint import StageStore
    from pubmed_and_method_spark.plans.pipeline import run_pipeline
    from pubmed_and_method_spark.session import get_spark

    spark = get_spark(cores=args.cores)
    stage_dir = args.stage_dir or tempfile.mkdtemp(prefix="and_stages_")
    store = StageStore(spark, stage_dir)
    t0 = time.time()
    metrics = run_pipeline(
        spark,
        store,
        seed=args.seed,
        algo=args.algo,
        num_buckets=args.num_buckets,
        datagen_kwargs={"n_entities": args.entities},
        blocking_metrics=True,
    )
    metrics["wall_sec"] = round(time.time() - t0, 2)
    metrics["stage_dir"] = stage_dir
    metrics["cores"] = args.cores
    print(json.dumps(metrics, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
