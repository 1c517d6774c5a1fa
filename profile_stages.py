#!/usr/bin/env python
"""Per-stage profiling of the AND pipeline at one parallelism level.

Usage: python profile_stages.py --cores 8 --entities 3000
Prints JSON with per-stage seconds so we can see which stage
anti-scales between local[8] and local[32].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--entities", type=int, default=3000)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from pubmed_and_method_spark.operators.connected_components import (
        connected_components,
    )
    from pubmed_and_method_spark.plans.pipeline import (
        build_labeled_pairs,
        build_pair_features,
        build_signatures,
    )
    from pubmed_and_method_spark.session import get_spark
    from pubmed_and_method_spark.sources.distributed_datagen import (
        distributed_transcripts,
    )

    spark = get_spark(
        app_name=f"profile_{args.cores}", cores=args.cores,
        shuffle_partitions=max(args.cores, 16),
    )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up
    t_w, g_w = distributed_transcripts(spark, seed=1, n_entities=100, n_blocks=50)
    t_w = t_w.cache(); t_w.count()
    sig_w = build_signatures(t_w)
    pr_w = build_labeled_pairs(sig_w, g_w, num_buckets=4)
    force(build_pair_features(pr_w, sig_w))
    t_w.unpersist()

    t, g = distributed_transcripts(
        spark, seed=42, n_entities=args.entities,
        n_blocks=max(2, args.entities // 2),
    )
    t = t.cache()
    n_turns = t.count()

    timings = {}

    t0 = time.time()
    sig = build_signatures(t).cache()
    n_sig = sig.count()
    timings["signatures"] = round(time.time() - t0, 2)

    t0 = time.time()
    pairs = build_labeled_pairs(sig, g, num_buckets=4).cache()
    n_pairs = pairs.count()
    timings["pairs"] = round(time.time() - t0, 2)

    t0 = time.time()
    feats = build_pair_features(pairs, sig).cache()
    feats.count()
    timings["features"] = round(time.time() - t0, 2)

    t0 = time.time()
    matched = feats.filter(
        (F.col("name_jw") > 0.95) & (F.col("token_jacc") > 0.2)
    ).select("mention_id1", "mention_id2").cache()
    n_edges = matched.count()
    timings["threshold"] = round(time.time() - t0, 2)

    t0 = time.time()
    comps = connected_components(matched, u_col="mention_id1", v_col="mention_id2")
    force(comps)
    timings["cc"] = round(time.time() - t0, 2)

    total = round(sum(timings.values()), 2)
    print(json.dumps({
        "cores": args.cores, "turns": n_turns, "sigs": n_sig,
        "pairs": n_pairs, "edges": n_edges,
        "stages": timings, "total": total,
        "turns_per_sec": round(n_turns / total, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
