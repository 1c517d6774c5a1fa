#!/usr/bin/env python
"""Thin spark-submit launcher for the AND pipeline (north-rule shape).

The north rule requires the pipeline to run "via spark-submit
--py-files on a multi-executor cluster".  This file is the launcher
half of that contract: it contains NO engine code — the whole engine
arrives as a zip on the executors' and driver's sys.path via
--py-files, exactly as it would on a 1000-executor deployment:

    python tools/make_pyfiles_zip.py dist/pubmed_and_method_spark.zip
    spark-submit \
        --master local-cluster[2,2,2048] \
        --driver-memory 4g \
        --py-files dist/pubmed_and_method_spark.zip \
        tools/and_submit_job.py --entities 25 --stage-dir /tmp/stages

Prints one ``METRICS_JSON=...`` line with the pipeline metrics plus
provenance: ``package_file`` (where the engine was imported from — a
test asserts it resolves inside the shipped zip, not a repo checkout)
and ``master``.  The reference ships its engine by hand-copying SQL
into a ClickHouse console (readme.md "Usage"); this is the Spark
deployment analog.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="and_submit_job")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--algo", choices=["gbt", "rf"], default="gbt")
    p.add_argument("--num-buckets", type=int, default=2)
    p.add_argument("--entities", type=int, default=25)
    p.add_argument("--stage-dir", default=None)
    args = p.parse_args(argv)

    # Imports INSIDE main, after spark-submit has placed --py-files on
    # sys.path; a bare `import pubmed_and_method_spark` at module top
    # would also work, but keeping them here makes the provenance
    # unambiguous (nothing is imported before the submit machinery ran).
    import pubmed_and_method_spark
    from pubmed_and_method_spark.plans.checkpoint import StageStore
    from pubmed_and_method_spark.plans.pipeline import run_pipeline
    from pubmed_and_method_spark.session import get_spark

    spark = get_spark(app_name="and_submit_job", cores="submit")
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
    metrics["master"] = spark.sparkContext.master
    metrics["package_file"] = pubmed_and_method_spark.__file__
    print("METRICS_JSON=" + json.dumps(metrics, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
