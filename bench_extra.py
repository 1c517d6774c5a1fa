#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN; this
file carries the extra evidence: per-query noop-isolated timings,
pipeline stage breakdowns, plan captures, and the local[8]-vs-local[32]
determinism probe for the four driver hash-flag queries).

Subcommands:
  queries  <names...> [--trials N]    median per-query seconds (noop sink)
  pipeline [--entities N] [--content] per-stage breakdown of bench_and_pipeline
  plans    <names...> [--tag before]  write plans/r06/<q>_<tag>.txt
  dump     <names...> [--out f.json]  exact output values (repr) for det-probe
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def force(df):
    df.write.format("noop").mode("overwrite").save()


def get_session():
    from pubmed_and_method_spark.session import get_spark

    return get_spark(app_name="bench_extra", cores=CPUS)


def cmd_queries(args):
    from pubmed_and_method_spark import queries as q

    spark = get_session()
    force(q.QUERIES["q01_pricing_summary"](spark, SF_DIR))  # warm
    out = {}
    for name in args.names:
        runs = []
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            force(q.QUERIES[name](spark, SF_DIR))
            runs.append(round(time.time() - t0, 3))
        out[name] = {"median": sorted(runs)[len(runs) // 2], "runs": runs}
    print(json.dumps(out, indent=2))


def cmd_pipeline(args):
    from pyspark.sql import functions as F

    from pubmed_and_method_spark.operators.connected_components import (
        connected_components,
    )
    from pubmed_and_method_spark.plans.pipeline import (
        build_labeled_pairs,
        build_pair_features,
        build_signatures,
        build_tfidf_terms,
    )
    from pubmed_and_method_spark.sources.distributed_datagen import (
        distributed_transcripts,
    )

    spark = get_session()
    t, g = distributed_transcripts(
        spark, seed=42, n_entities=args.entities,
        n_blocks=max(2, args.entities // 4),
    )
    t = t.localCheckpoint(eager=True)
    n_turns = t.count()
    g = g.localCheckpoint(eager=True)
    timings = {}
    content = args.content

    SIG_COLS = [
        "mention_id", "conv_id", "block_key", "given_name", "surname",
        "token_hashes", "shingle_hashes", "tool_profile",
        "ts_min", "ts_max",
    ] + (["tokens"] if content else [])
    t0 = time.time()
    spark.sparkContext.setJobDescription("stage: signatures")
    sig = (
        build_signatures(t, tfidf=False).select(*SIG_COLS)
        .localCheckpoint(eager=True)
    )
    timings["signatures"] = round(time.time() - t0, 2)

    terms = None
    if content:
        t0 = time.time()
        spark.sparkContext.setJobDescription("stage: tfidf_terms")
        terms = build_tfidf_terms(sig, top_k=64).localCheckpoint(eager=True)
        timings["tfidf_terms"] = round(time.time() - t0, 2)

    t0 = time.time()
    spark.sparkContext.setJobDescription("stage: pairs")
    pairs = build_labeled_pairs(
        sig, g, adaptive_target=32, lsh=True
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    timings["pairs"] = round(time.time() - t0, 2)

    t0 = time.time()
    spark.sparkContext.setJobDescription("stage: features+match")
    feats = build_pair_features(pairs, sig, tfidf_terms=terms)
    content_bar = F.col("token_jacc") > 0.2
    if content:
        content_bar = content_bar | (F.col("content_tfidf_cos") > 0.4)
    matched = feats.filter(
        (F.col("name_jw") > 0.95) & content_bar
    ).select("mention_id1", "mention_id2").localCheckpoint(eager=True)
    n_matched = matched.count()
    timings["features_match"] = round(time.time() - t0, 2)

    t0 = time.time()
    spark.sparkContext.setJobDescription("stage: connected_components")
    force(connected_components(matched, u_col="mention_id1", v_col="mention_id2"))
    timings["connected_components"] = round(time.time() - t0, 2)

    timings["total"] = round(sum(timings.values()), 2)
    print(json.dumps({
        "entities": args.entities, "n_turns": n_turns, "n_pairs": n_pairs,
        "n_matched": n_matched, "content": content, "stages": timings,
    }))


def cmd_plans(args):
    import contextlib
    import io

    from pubmed_and_method_spark import queries as q

    spark = get_session()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in args.names:
        df = q.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)


def cmd_dump(args):
    from pubmed_and_method_spark import queries as q

    spark = get_session()
    out = {}
    for name in args.names:
        df = q.QUERIES[name](spark, SF_DIR)
        cols = df.columns
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        rows = sorted(
            tuple(repr(r[i]) for i in order) for r in df.collect()
        )
        out[name] = {"cols": sorted(cols), "rows": rows}
    txt = json.dumps(out, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)
        print("wrote", args.out)
    else:
        print(txt)


def main() -> int:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pq = sub.add_parser("queries")
    pq.add_argument("names", nargs="+")
    pq.add_argument("--trials", type=int, default=3)
    pp = sub.add_parser("pipeline")
    pp.add_argument("--entities", type=int, default=100000)
    pp.add_argument("--content", action="store_true")
    pl = sub.add_parser("plans")
    pl.add_argument("names", nargs="+")
    pl.add_argument("--tag", default="before")
    pd = sub.add_parser("dump")
    pd.add_argument("names", nargs="+")
    pd.add_argument("--out", default=None)
    args = p.parse_args()
    {"queries": cmd_queries, "pipeline": cmd_pipeline,
     "plans": cmd_plans, "dump": cmd_dump}[args.cmd](args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
