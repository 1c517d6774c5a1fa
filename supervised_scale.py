#!/usr/bin/env python
"""Supervised AND pipeline at 33M-turn scale WITH the content feature
(r04 verdict task 6): run the FULL run_pipeline — checkpointed stages,
GBT scoring over the complete FEATURE_COLS stack (content_tfidf_cos
included via the r05 sparse-intersection path), connected-components
clustering, pairwise + cluster F1 — over distributed_transcripts at
$SPARK_GRAFT_BENCH_ENTITIES (default 400000 entities ~ 33M turns).

This is the run the r04 verdict said had no at-scale evidence: the
supervised path, not the unsupervised spine, carrying X11 at 33M.
Writes the result into SCALE_AB.json under "supervised_33M".

Usage:  python supervised_scale.py [--entities N] [--keep-stages]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--entities", type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_ENTITIES", "400000")),
    )
    p.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    p.add_argument("--keep-stages", action="store_true")
    p.add_argument("--tfidf-mode", default="sparse",
                   choices=("sparse", "map", "off"))
    args = p.parse_args()

    from pubmed_and_method_spark.plans.checkpoint import StageStore
    from pubmed_and_method_spark.plans.pipeline import run_pipeline
    from pubmed_and_method_spark.session import get_spark
    from pubmed_and_method_spark.sources.distributed_datagen import (
        distributed_transcripts,
    )

    # same 33M-scale sizing as scale_ab.py (see its comments): wider
    # shuffle + a 16 MB compressed advisory keep the pair-stage SMJ
    # sorts in memory; zstd + periodic GC are session defaults
    spark = get_spark(
        app_name="supervised_scale",
        cores=args.cores,
        shuffle_partitions=128,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        },
    )
    t, g = distributed_transcripts(
        spark, seed=42, n_entities=args.entities,
        n_blocks=max(2, args.entities // 4),
    )
    stage_dir = tempfile.mkdtemp(prefix="supervised_scale_")
    store = StageStore(spark, stage_dir)
    t0 = time.time()
    m = run_pipeline(
        spark, store, seed=42, algo="gbt",
        tfidf_mode=args.tfidf_mode, transcripts=t, truth=g,
    )
    wall = time.time() - t0
    n_turns = store.read("transcripts").count()
    out = {
        "entities": args.entities,
        "n_turns": n_turns,
        "tfidf_mode": args.tfidf_mode,
        "wall_sec": round(wall, 1),
        "turns_per_sec": round(n_turns / wall, 1),
        "pair_f1": round(m["pair_model"]["f1"], 6),
        "pair_precision": round(m["pair_model"]["precision"], 6),
        "pair_recall": round(m["pair_model"]["recall"], 6),
        "cluster_f1": round(m["clusters"]["f1"], 6),
        "cluster_precision": round(m["clusters"]["precision"], 6),
        "cluster_recall": round(m["clusters"]["recall"], 6),
        "n_pairs": m["n_pairs"],
        "date": time.strftime("%Y-%m-%d %H:%M"),
    }
    print(json.dumps(out))

    ab_path = os.path.join(HERE, "SCALE_AB.json")
    results = {}
    if os.path.exists(ab_path):
        with open(ab_path) as f:
            results = json.load(f)
    results["supervised_33M"] = out
    with open(ab_path, "w") as f:
        json.dump(results, f, indent=2)

    if not args.keep_stages:
        shutil.rmtree(stage_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
