#!/usr/bin/env python
"""Same-session A/B anchor: previous-round code vs current code.

Machine state on this box drifts up to ~9x day-over-day (BENCH.md
"Round-2 re-baseline"), so cross-round absolute comparisons are
meaningless.  This harness runs the SAME workload back-to-back in one
session against (a) a git worktree of the previous round's commit and
(b) the current tree, and writes the paired result to
BENCH_anchor.json — which bench.py embeds into its JSON output as the
`anchor` field.  The ratio current/previous is the honest
round-over-round performance signal.

Workload per side (own subprocess, fresh JVM):
- and_pipeline at $SPARK_GRAFT_BENCH_ENTITIES (default 400000
  entities, ~33M turns) — the headline turns/sec;
- 4 representative queries (q19 minhash, q20 simhash, q21 JW pairs,
  q22 cosine topk) x 3 trials, medians.

Usage:  python anchor_ab.py --prev-ref <sha>      (writes BENCH_anchor.json)
        python anchor_ab.py --worker --repo DIR   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
AB_QUERIES = [
    "q19_minhash_band_candidates",
    "q20_simhash16",
    "q21_name_similarity_pairs",
    "q22_cosine_topk",
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ENTITIES = int(os.environ.get("SPARK_GRAFT_BENCH_ENTITIES", "400000"))
TRIALS = 3


def worker(repo: str) -> None:
    sys.path.insert(0, repo)
    from pubmed_and_method_spark import queries as q
    from pubmed_and_method_spark.session import get_spark

    import bench

    import pubmed_and_method_spark as _pkg

    # guard against silent fallback (ADVICE r03): sys.path.insert only
    # SHADOWS — if the target tree is missing a module (partial
    # archive extraction), Python would import the current repo's copy
    # and the A/B would honestly-looking measure current-vs-current.
    # Every timed module must come from `repo`.
    want = os.path.abspath(repo) + os.sep
    for mod in (_pkg, q, bench):
        got = os.path.abspath(mod.__file__)
        assert got.startswith(want), (
            f"anchor worker loaded {mod.__name__} from {got}, "
            f"expected under {want} — aborting (would measure the "
            "wrong tree)"
        )

    spark = get_spark(app_name="anchor_ab", cores="32")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(q.QUERIES["q01_pricing_summary"](spark, SF_DIR))  # warm-up

    timings = {}
    for name in AB_QUERIES:
        runs = []
        for _ in range(TRIALS):
            t0 = time.time()
            force(q.QUERIES[name](spark, SF_DIR))
            runs.append(round(time.time() - t0, 3))
        timings[name] = sorted(runs)[len(runs) // 2]
    sec, n_turns = bench.bench_and_pipeline(spark, n_entities=ENTITIES)
    print(json.dumps({
        "repo": repo,
        "queries_median_sec": timings,
        "and_pipeline_sec": round(sec, 3),
        "and_pipeline_turns": n_turns,
        "and_pipeline_turns_per_sec": round(n_turns / sec, 1),
    }))


def run_side(repo: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", "--repo", repo],
        capture_output=True, text=True, timeout=5400, cwd=repo,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker produced no JSON:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--repo", default=HERE)
    p.add_argument("--prev-ref", default=None,
                   help="git ref of the previous round's code")
    args = p.parse_args()

    if args.worker:
        worker(args.repo)
        return 0

    assert args.prev_ref, "--prev-ref required"
    wt = tempfile.mkdtemp(prefix="anchor_prev_")
    subprocess.run(
        f"git archive {args.prev_ref} | tar -x -C {wt}",
        shell=True, check=True, cwd=HERE,
    )
    # order: previous first, current second (one fixed order; both sides
    # share whatever slow drift happens inside the ~20-minute window)
    prev = run_side(wt)
    cur = run_side(HERE)
    anchor = {
        "anchor_ref": args.prev_ref,
        "epoch": time.time(),
        "date": time.strftime("%Y-%m-%d %H:%M"),
        "entities": ENTITIES,
        "sf_dir": SF_DIR,
        "previous_round": prev,
        "current_round": cur,
        "throughput_ratio_current_over_previous": round(
            cur["and_pipeline_turns_per_sec"]
            / prev["and_pipeline_turns_per_sec"], 3
        ),
    }
    with open(os.path.join(HERE, "BENCH_anchor.json"), "w") as f:
        json.dump(anchor, f, indent=2)
    print(json.dumps(anchor, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
