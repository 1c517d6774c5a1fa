#!/usr/bin/env python
"""Same-session A/B harness for the round-4 scale decisions
(r03 verdict #2, #6, #8): each config runs the 33M-turn pipeline spine
in its OWN subprocess (fresh JVM) back-to-back, so pairs of configs
see the same machine state — the only comparison that survives this
box's ±2x local[32] drift (BENCH.md).

Configs (over distributed_transcripts at $SPARK_GRAFT_BENCH_ENTITIES,
default 400k entities ≈ 33M turns):

  base        signatures(tfidf=False) -> labeled pairs (num_buckets=4,
              lsh) -> features -> noop      [the bench.py spine]
  adaptive    same, but adaptive_target=32 instead of global s=4
  strict      base + strict_split=True      [exact split guarantee]
  tfidf_none  signatures WITH untruncated TF-IDF maps -> same spine
              (features include map-cosine)
  tfidf_64    same with tfidf_top_k=64      [O(k) map per mention]
  sig_parquet signatures materialized to plain parquet, pair spine
              reads it back (the StageStore layout)
  sig_bucketed signatures materialized BUCKETED by mention_id (32
              buckets, sorted) — the pair double-join's two WIDE
              signature-side Exchanges disappear (write-once shuffle);
              vs sig_parquet isolates what bucketing buys the
              byte-dominant stage

Each worker reports wall seconds AND total shuffle write bytes
(Spark UI REST, enabled per-subprocess on an ephemeral port) — the
byte number is what the tfidf truncation exists to cap.

Quality side (fast, seeded gate corpus): run_pipeline cluster F1 at
tfidf_top_k=None vs 64 — the delta that licenses the truncated scale
default.

Usage:  python scale_ab.py                  (writes SCALE_AB.json)
        python scale_ab.py --worker CONFIG  (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

ENTITIES = int(os.environ.get("SPARK_GRAFT_BENCH_ENTITIES", "400000"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

CONFIGS = (
    "base", "adaptive", "strict", "tfidf_none", "tfidf_64", "tfidf_16",
    "tfidf_sparse", "tfidf_sparse_none", "tfidf_sparse_join",
    "sig_parquet", "sig_bucketed", "clu_cc", "clu_star", "clu_pivot",
)


def _shuffle_write_bytes(spark) -> int:
    """Total shuffle write bytes so far, from the in-process UI REST."""
    url = spark.sparkContext.uiWebUrl
    if not url:
        return -1
    try:
        apps = json.load(
            urllib.request.urlopen(f"{url}/api/v1/applications", timeout=10)
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{url}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=30,
            )
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def worker(config: str) -> None:
    from pyspark.sql import functions as F

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
        app_name=f"scale_ab_{config}",
        cores=CPUS,
        # r05: size shuffle partitions for the 33M pair stage — at the
        # session default (32) each SMJ sort task holds ~1 GB of
        # full-payload pair rows, just past the per-task execution
        # budget, and the resulting sorter spills filled the disk
        # (three aborted runs).  128 partitions put ~250 MB per task
        # — in-memory sorts, spill-free (the brief's own rule: size
        # shuffle partitions so partitions fit in executor memory at
        # the target SF).  AQE still coalesces the small stages.
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "128")
        ),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
            # r05: this box gives Spark ~80 GB of disk and a 33M-turn
            # run writes shuffle files across ~6 stages; the DEFAULT
            # context-cleaner GC interval (30 min) lets dead stages'
            # shuffle files accumulate past the disk (observed: 98%
            # full, then a single GC reclaimed 35 GB).  A 60 s
            # periodic GC bounds the on-disk footprint to ~live
            # stages — purely cleanup latency, no plan change.
            "spark.cleaner.periodicGC.interval": "60s",
            # AQE's coalesce targets 64 MB of COMPRESSED map output
            # per post-shuffle partition; the content pair rows
            # decompress ~8-15x, so each SMJ sort task held ~1 GB,
            # spilled, and three 33M runs filled the disk.  16 MB
            # compressed ≈ 150-250 MB raw per task — in-memory
            # sorts.  Per-partition sizing, not a plan change; the
            # production equivalent is the same advisory setting on
            # any large-shuffle job.
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        },
    )

    t, g = distributed_transcripts(
        spark, seed=42, n_entities=ENTITIES, n_blocks=max(2, ENTITIES // 4)
    )
    t = t.localCheckpoint(eager=True)
    n_turns = t.count()
    g = g.localCheckpoint(eager=True)

    with_tfidf = config.startswith("tfidf")
    # r05: sparse-intersection content paths (the scale fix for the
    # map-payload DNF) — signatures stay lean, a narrow
    # (mention_id, term, weight) table feeds either the in-row
    # aligned-array cosine (tfidf_sparse*, the default plan) or the
    # exploded pair-keyed join (tfidf_sparse_join — measured DNF at
    # 33M on this corpus shape, kept as the honest negative)
    sparse = config.startswith("tfidf_sparse")
    sparse_join = config == "tfidf_sparse_join"
    with_map = with_tfidf and not sparse
    top_k = {
        "tfidf_64": 64, "tfidf_16": 16, "tfidf_sparse": 64,
        "tfidf_sparse_join": 64,
    }.get(config)
    SIG_COLS = [
        "mention_id", "conv_id", "block_key", "given_name", "surname",
        "token_hashes", "shingle_hashes", "tool_profile",
        "ts_min", "ts_max",
    ] + (["tfidf"] if with_map else []) + (["tokens"] if sparse else [])

    t0 = time.time()
    sig_write_sec = None
    if config in ("sig_parquet", "sig_bucketed"):
        import tempfile

        d = tempfile.mkdtemp(prefix=f"ab_{config}_")
        sigdf = build_signatures(t, tfidf=False).select(*SIG_COLS)
        tw = time.time()
        if config == "sig_bucketed":
            spark.sql("DROP TABLE IF EXISTS ab_sig")
            (
                sigdf.write.mode("overwrite")
                .option("path", os.path.join(d, "sig"))
                .bucketBy(32, "mention_id")
                .sortBy("mention_id")
                .format("parquet")
                .saveAsTable("ab_sig")
            )
            sig = spark.table("ab_sig")
        else:
            sigdf.write.mode("overwrite").parquet(os.path.join(d, "sig"))
            sig = spark.read.parquet(os.path.join(d, "sig"))
        sig_write_sec = round(time.time() - tw, 3)
    else:
        sig = (
            build_signatures(t, tfidf=with_map, tfidf_top_k=top_k)
            .select(*SIG_COLS)
            .localCheckpoint(eager=True)
        )
    tfidf_terms = None
    terms_build_sec = None
    if sparse:
        from pubmed_and_method_spark.plans.pipeline import build_tfidf_terms

        tt = time.time()
        tfidf_terms = build_tfidf_terms(sig, top_k=top_k).localCheckpoint(
            eager=True
        )
        terms_build_sec = round(time.time() - tt, 3)
    # transcripts are only the lineage ROOT of the (now-materialized)
    # signature checkpoint — dropping their blocks frees ~15 GB of
    # block-manager disk/heap for the pair stage (r05 disk budget)
    t.unpersist(blocking=False)
    sb0 = _shuffle_write_bytes(spark)  # pair stages measured from here
    t_pairs = time.time()
    kwargs = dict(lsh=True)
    if config == "adaptive":
        kwargs["adaptive_target"] = 32
    elif (
        config in ("sig_parquet", "sig_bucketed")
        or config.startswith("clu_")
        or sparse
    ):
        # r05: sparse configs pair against 'adaptive' (the pipeline
        # default salting), not the legacy global-s=4 'base'
        kwargs["adaptive_target"] = 32  # current pipeline default
    else:
        kwargs["num_buckets"] = 4
    if config == "strict":
        kwargs["strict_split"] = True
    pairs = build_labeled_pairs(sig, g, **kwargs)
    feats = build_pair_features(
        pairs, sig, tfidf_terms=tfidf_terms, tfidf_join=sparse_join
    )
    matched = feats.filter(
        (F.col("name_jw") > 0.95) & (F.col("token_jacc") > 0.2)
    )
    wall_cluster = n_edges = n_clusters = None
    if config.startswith("clu_"):
        # clusterer A/B: pin the 33M-turn match graph once, then time
        # ONLY the clustering stage — the spine is shared machinery
        edges = matched.select(
            "mention_id1", "mention_id2",
            F.col("name_jw").alias("w"),
        ).localCheckpoint(eager=True)
        n_edges = edges.count()
        wall_pairs = time.time() - t_pairs
        tc = time.time()
        if config == "clu_cc":
            from pubmed_and_method_spark.operators.connected_components import (  # noqa: E501
                connected_components,
            )

            comp = connected_components(
                edges, u_col="mention_id1", v_col="mention_id2"
            ).select(F.col("component").alias("c"))
        elif config == "clu_star":
            from pubmed_and_method_spark.operators.star_clustering import (
                star_clusters,
            )

            comp = star_clusters(
                edges, id_cols=("mention_id1", "mention_id2"),
                weight_col="w", rounds=32,
            ).select(F.col("center").alias("c"))
        else:
            from pubmed_and_method_spark.operators.pivot_clustering import (
                pivot_clusters,
            )

            comp = pivot_clusters(
                edges.select("mention_id1", "mention_id2"),
                id_cols=("mention_id1", "mention_id2"), rounds=32,
            ).select(F.col("pivot").alias("c"))
        n_clusters = comp.distinct().count()
        wall_cluster = time.time() - tc
        wall_total = time.time() - t0
        sb1 = _shuffle_write_bytes(spark)
    else:
        out_cols = ["mention_id1", "mention_id2", "split_group"] + (
            ["content_tfidf_cos"] if with_tfidf else []
        )
        matched.select(*out_cols).write.format("noop").mode(
            "overwrite"
        ).save()
        wall_pairs = time.time() - t_pairs
        wall_total = time.time() - t0
        sb1 = _shuffle_write_bytes(spark)
    out = {
        "config": config,
        "n_turns": n_turns,
        "wall_total_sec": round(wall_total, 3),
        "wall_pair_stage_sec": round(wall_pairs, 3),
        "pair_stage_shuffle_bytes": (sb1 - sb0) if sb0 >= 0 and sb1 >= 0 else -1,
        "turns_per_sec": round(n_turns / wall_total, 1),
    }
    if sig_write_sec is not None:
        out["sig_write_sec"] = sig_write_sec
    if terms_build_sec is not None:
        out["tfidf_terms_build_sec"] = terms_build_sec
    if wall_cluster is not None:
        out["wall_cluster_sec"] = round(wall_cluster, 3)
        out["n_edges"] = n_edges
        out["n_clusters"] = n_clusters
    print(json.dumps(out))


def f1_quality_ab() -> dict:
    """Cluster-F1 at tfidf_top_k None vs 64 on the seeded gate corpus
    (quality is scale-independent; measured where it's cheap)."""
    import shutil
    import tempfile

    from pubmed_and_method_spark.plans.checkpoint import StageStore
    from pubmed_and_method_spark.plans.pipeline import run_pipeline
    from pubmed_and_method_spark.session import get_spark

    spark = get_spark(app_name="scale_ab_f1", cores="16")
    out = {}
    for top_k in (None, 64):
        d = tempfile.mkdtemp(prefix="scale_ab_f1_")
        try:
            m = run_pipeline(
                spark,
                StageStore(spark, d),
                seed=42,
                datagen_kwargs={"n_entities": 80, "n_blocks": 24},
                tfidf_top_k=top_k,
            )
            out[f"top_k_{top_k}"] = {
                "cluster_f1": round(m["clusters"]["f1"], 6),
                "pair_f1": round(m["pair_model"]["f1"], 6),
                "n_pairs": m["n_pairs"],
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)
    spark.stop()
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", default=None, choices=CONFIGS)
    p.add_argument("--skip-f1", action="store_true")
    p.add_argument("--configs", default=",".join(CONFIGS))
    args = p.parse_args()

    if args.worker:
        worker(args.worker)
        return 0

    out_path = os.path.join(HERE, "SCALE_AB.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)  # merge: partial re-runs keep old rows
    results.update({"entities": ENTITIES, "cpus": CPUS,
                    "date": time.strftime("%Y-%m-%d %H:%M"),
                    "epoch": time.time()})
    if not args.skip_f1:
        results["f1_quality"] = f1_quality_ab()
        print(json.dumps({"f1_quality": results["f1_quality"]}))

    for config in args.configs.split(","):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", config],
            capture_output=True, text=True, timeout=5400, cwd=HERE,
        )
        lines = [l for l in out.stdout.strip().splitlines()
                 if l.startswith("{")]
        if not lines:
            raise RuntimeError(
                f"{config} produced no JSON:\n{out.stderr[-2000:]}"
            )
        results[config] = json.loads(lines[-1])
        print(lines[-1])

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
