#!/usr/bin/env python
"""Physical-plan audit for the headline queries.

Checks, per query, the plan properties that matter at 100 TB:
- PushedFilters reach the parquet scan (predicate pushdown);
- ReadSchema is pruned to consumed columns (no full-row scans);
- WholeStageCodegen spans cover the row-processing pipeline;
- small dimension joins broadcast, big joins sort-merge/shuffle-hash;
- no CartesianProduct outside the documented bounded cases.

Writes a markdown summary to EXPLAIN.md and exits non-zero if a red
property appears (so it can run as a regression check).
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

AUDIT = [
    # (query, must_have regexes, must_not regexes)
    ("q01_pricing_summary", [r"PushedFilters: \[IsNotNull\(l_shipdate\)", r"codegen id : "], [r"CartesianProduct"]),
    ("q04_semi_join_region", [r"LeftSemi", r"codegen id : "], [r"CartesianProduct"]),
    ("q08_top_orders_per_customer", [r"codegen id : ", r"RunningWindowFunction|Window"], [r"CartesianProduct"]),
    ("q17_fingerprint_exact_dedup", [r"ReadSchema: struct\<doc_id:bigint,text:string\>", r"HashAggregate"], [r"CartesianProduct"]),
    ("q19_minhash_band_candidates", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    ("q22_cosine_topk", [], []),  # documented bounded brute-force
    ("q36_name_feature_block", [r"PushedFilters: \[IsNotNull\(p_partkey\), LessThanOrEqual\(p_partkey,80\)"], [r"CartesianProduct"]),
    ("q32_simhash_near_dups", [r"HashAggregate"], [r"CartesianProduct"]),
    ("q37_tfidf_cosine_pairs", [r"HashAggregate"], [r"CartesianProduct"]),
    ("q40_delimited_ingest", [], [r"CartesianProduct"]),
    ("q42_gazetteer_lookup", [r"BroadcastHashJoin", r"PushedFilters: \[IsNotNull\(doc_id\), LessThanOrEqual\(doc_id,200\)"], [r"CartesianProduct"]),
    # bucketed self-join on (table,bucket): candidate generation must be
    # a hash join on bucket keys, never a cartesian over the corpus
    ("q45_lsh_topk_portable", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # winnowing: fingerprint extraction is pure narrow codegen over a
    # pruned (doc_id, text) scan; the near-dup inverted-index self-join
    # must be a hash join on fp, never cartesian
    ("q46_winnow_fingerprints", [r"ReadSchema: struct\<doc_id:bigint,text:string\>", r"codegen id : "], [r"CartesianProduct", r"Exchange"]),
    ("q47_winnow_near_dups", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # IVF: assignment/probing are narrow codegen projections against
    # literal centroids; candidate generation must be a hash join on
    # list_id, never a cartesian over the corpus
    ("q48_ivf_topk_portable", [r"codegen id : ", r"keys \[1\]: \[list_id"], [r"CartesianProduct"]),
    ("q49_ivf_topk", [r"codegen id : ", r"keys \[1\]: \[list_id"], [r"CartesianProduct"]),
    # profiling: ONE scan feeds an Expand (one branch per exact-distinct
    # column) — the reference unions ~20 per-field full scans; only the
    # expanded key stream shuffles, never the table twice
    ("q50_column_profile", [r"HashAggregate", r"Expand"], [r"CartesianProduct"]),
    # packing: one window cumsum per shard + a Generate (sequence
    # explode) — no join at all, no driver loop
    ("q51_pack_sequences", [r"Window", r"Generate"], [r"CartesianProduct", r"Join"]),
    # blocking-quality: four linear aggregations cross-joined as 1-row
    # relations (BroadcastNestedLoopJoin on single-row sides is the
    # documented cheap case); never a pair-space cartesian
    ("q52_blocking_quality", [r"HashAggregate"], [r"CartesianProduct"]),
    # golden records: cluster-keyed HashAggregates (partial-aggregable
    # merges + the (cluster,value) mode pre-agg) joined on the cluster
    # key; CC edge prep scans only doc_id+text
    ("q54_golden_records", [r"HashAggregate", r"ReadSchema: struct\<doc_id:bigint,text:string\>"], [r"CartesianProduct"]),
    # decontamination: the benchmark gram set must BROADCAST (eval sets
    # are bounded); corpus text scans pruned to (doc_id, text); the hit
    # count is a keyed HashAggregate, never a cartesian
    ("q55_benchmark_decontam", [r"BroadcastHashJoin", r"ReadSchema: struct\<doc_id:bigint,text:string\>", r"HashAggregate"], [r"CartesianProduct"]),
    # repetition metrics: token stats are narrow codegen; the top-gram
    # share is explode + two-level partial-agg groupBy — no join other
    # than the final id-keyed assembly, no cartesian
    ("q56_repetition_quality", [r"Generate", r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # curation pipeline: five stages compose WITHOUT a cartesian; the
    # benchmark side broadcasts, dedup/near-dup joins are hash joins
    ("q57_curation_pipeline", [r"BroadcastHashJoin", r"HashAggregate"], [r"CartesianProduct"]),
    # mixture: ONE source-partitioned window cumsum, no join at all
    ("q58_dataset_mixture", [r"Window", r"codegen id : "], [r"CartesianProduct", r"Join"]),
    # PII audit: a single codegen'd projection over a pruned
    # (doc_id, text) scan — no shuffle, no join, no UDF
    ("q59_pii_redaction", [r"codegen id : ", r"ReadSchema: struct\<doc_id:bigint,text:string\>"], [r"CartesianProduct", r"Join", r"Exchange"]),
    # SemDeDup: assignment is a narrow codegen projection against
    # literal centroids; the in-cluster pairing must be a hash join on
    # the cluster id, never a cartesian over the corpus
    ("q60_semantic_dedup", [r"codegen id : ", r"HashAggregate"], [r"CartesianProduct"]),
    # threshold sweep: the pair table feeds ONE histogram HashAggregate;
    # the cumulative window runs over n_bins post-agg rows only — no
    # per-threshold rescans, no cartesian
    ("q62_threshold_sweep", [r"HashAggregate", r"Window"], [r"CartesianProduct"]),
    # B-cubed/V-measure: everything reduces through the (cluster,
    # entity) contingency-cell HashAggregate; the three 1-row summary
    # relations cross-join for free (the q52 documented cheap case)
    ("q63_bcubed_vmeasure", [r"HashAggregate"], [r"CartesianProduct"]),
    # FS weights: stack unpivot (Generate) + ONE feature-keyed
    # HashAggregate — a single pass over the pair table
    ("q64_fellegi_sunter_weights", [r"HashAggregate"], [r"CartesianProduct"]),
    # transitive conflicts: CC components join the sub-threshold pairs
    # via hash joins; never a pair-space cartesian
    ("q65_transitive_conflicts", [r"codegen id : "], [r"CartesianProduct"]),
    # q66 is deliberately absent: its OUTPUT plan is a LocalTableScan
    # (<= 64 EM parameter rows built driver-side); the distributed work
    # — the one-pass pattern-histogram groupBy — runs eagerly inside
    # fs_em and is the same aggregate shape q64 audits.
    # FS decision rule: weights are plan literals — the score/decision
    # must be a codegen projection adding no join beyond pair assembly
    ("q67_fs_decision_rule", [r"codegen id : "], [r"CartesianProduct"]),
    # sorted neighborhood: rank pairing is ONE shuffled hash join on
    # the shifted rank (plus the tiny broadcast offset map); never a
    # single-partition global Window and never a cartesian
    ("q68_sorted_neighborhood_recovery", [r"codegen id : ", r"Window"], [r"CartesianProduct"]),
    # meta-blocking: CBS reduces per-block pairs through a HashAggregate
    # (map-side partial agg); node thresholds/blk counts join back as
    # hash joins — per-record tables must never broadcast... the
    # BroadcastHashJoins present are the truth/oversized-key dims only
    ("q69_meta_blocking_wnp", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # star clustering: q70's OUTPUT plan reflects the final
    # centers/satellite assembly (checkpointed peel rounds collapse to
    # scans); the guard is the same as CC — hash joins only
    ("q70_star_clusters", [r"codegen id : "], [r"CartesianProduct"]),
    # greedy matching: q71's OUTPUT plan is the checkpointed per-round
    # matches unioned + label joins — hash joins only, no cartesian
    ("q71_one_to_one_linkage", [r"codegen id : "], [r"CartesianProduct"]),
    # PPRL: Bloom encode is a pure projection (higher-order array
    # exprs); the only joins are the phonetic-block equi-join + the
    # broadcast truth dims
    ("q72_pprl_bloom_dice", [r"codegen id : "], [r"CartesianProduct"]),
    # blocking ladder: four pair sets reduced through HashAggregates;
    # the 1-row denominator relation cross-joins for free
    ("q73_blocking_ladder", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # common-neighbor evidence: triangle enumeration must be hash joins
    # reduced through a pair-keyed HashAggregate, never a cartesian
    ("q74_common_neighbor_evidence", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # duplicate spans: gram frequency is a HashAggregate (map-side
    # partial agg), dup positions rejoin by LeftSemi hash join, span
    # merge is a per-doc Window — never a doc-to-doc join
    ("q78_duplicate_spans", [r"HashAggregate", r"LeftSemi", r"Window"], [r"CartesianProduct"]),
    # TF-adjusted weights: three linear HashAggregates; the 1-row base
    # and total broadcast onto the per-value rows (BNLJ of 1-row
    # relations is the free pattern, a cartesian over data is not)
    ("q79_tf_adjusted_weights", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # Monge-Elkan: the only Python is the Arrow-batched JW
    # (ArrowEvalPython); bests/means are pair-keyed HashAggregates
    ("q80_monge_elkan_names", [r"ArrowEvalPython", r"HashAggregate"], [r"CartesianProduct"]),
    # greedy CEAF: checkpointed matching rounds collapse to scans; the
    # size joins must be hash joins, never cartesian
    ("q81_ceaf_alignment", [r"codegen id : "], [r"CartesianProduct"]),
    # JSONL ingest: declared schema must reach the json scan (no
    # inference pass), projections stay codegen
    ("q82_jsonl_ingest", [r"ReadSchema: struct\<doc_id:bigint", r"codegen id : "], [r"CartesianProduct"]),
    # churn: contingency + per-side groupBys are HashAggregates; the
    # best-b size join is a hash join
    ("q83_cluster_churn", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # review queue: ONE window partitioned by the blocking key (never
    # a global single-partition sort)
    ("q84_review_queue", [r"Window", r"codegen id : "], [r"CartesianProduct"]),
    # deletion-neighborhood: variant explode (Generate) + a hash join
    # on the variant key, never a cartesian over members
    ("q85_deletion_neighborhood", [r"Generate", r"codegen id : "], [r"CartesianProduct"]),
    # BM25: per-term stats HashAggregates + 1-row corpus broadcast;
    # top-k must be TakeOrderedAndProject, not a global sort
    ("q86_bm25_topk", [r"HashAggregate", r"TakeOrderedAndProject"], [r"CartesianProduct"]),
    # pivot clustering: like q70, the OUTPUT plan reflects the final
    # status projection over the pinned (checkpointed) round state —
    # audit that it stays codegen joins, never cartesian
    ("q87_pivot_clusters", [r"codegen id : "], [r"CartesianProduct"]),
    # block filtering: block-size HashAggregate + a hash join back to
    # memberships + ONE per-record window; never cartesian (no
    # broadcast HINT on the size table — at sf0.01 the planner
    # auto-broadcasts it under the threshold, at corpus scale the
    # same plan falls back to a shuffle join)
    ("q88_block_filtering", [r"HashAggregate", r"Window"], [r"CartesianProduct"]),
    # mutual NN: documented bounded brute-force sims (the q22 rule) —
    # the reciprocity self-join must be a hash join on the key pair
    ("q89_mutual_nn_pairs", [r"Window"], []),
    # canopy: like q70/q87 the OUTPUT plan reflects the final loose-
    # membership join over the pinned peel state — hash joins only
    ("q90_canopy_assign", [r"codegen id : "], [r"CartesianProduct"]),
    # soft-TF-IDF: weight derivation is two linear aggs + hash joins;
    # the only BroadcastNestedLoopJoin allowed is the 1-row corpus-N
    # build (the A7 scalar pattern)
    ("q91_soft_tfidf_names", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # prefix-filter Jaccard join: frequency agg + per-record sort agg,
    # candidates from a hash self-join on PREFIX tokens only, exact
    # verify via two hash joins — never cartesian
    ("q92_prefix_filter_jaccard", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # cannot-link repair: CL pairs and the evict set are hash
    # joins/anti-joins on id keys over the pinned CC output; re-keying
    # is one HashAggregate on the cluster key — never cartesian
    ("q93_cannot_link_repair", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # incremental assignment: ONE hash join on the blocking key, one
    # min-struct HashAggregate on the new-record id, one left join
    # back — the catalog is never self-joined or re-clustered
    ("q94_incremental_assignment", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # q95 is deliberately absent for the q66 reason: its OUTPUT plan is
    # a LocalTableScan of the <=6 parameter rows; the histogram
    # aggregate runs inside fs_em_missing and is the q64-audited shape
    # retention: one min-struct aggregate on the cluster key (struct
    # min is not hash-aggregable -> SortAggregate with partial/final
    # split) + a hash join back — never cartesian
    ("q96_dedup_retention", [r"SortAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # q97 is absent for the same q66/q95 reason: the learner's OUTPUT
    # is a LocalTableScan of #schemes rows; each round's anti-join +
    # scheme groupBy is the q73-audited shape
    # progressive recall: distinct-score histogram (HashAggregate) +
    # per-score tie windows + a broadcast cuts join — the rank is
    # never one global single-partition sort, never cartesian
    ("q98_progressive_recall", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # subsample CI: map-side explode by a CONSTANT replicate count +
    # conditional-sum HashAggregate; the grid join broadcasts
    # n_replicates rows — no per-replicate pass, never cartesian
    ("q99_f1_subsample_ci", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # linkage waterfall: per tier one filter + two id-keyed hash
    # anti-joins on the consumed-id set (localCheckpoint-pinned);
    # never cartesian
    ("q100_linkage_waterfall", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # merge distance / VI: ONE (cluster,entity) cell HashAggregate,
    # marginals are groupBys OF the cells, 1-row summaries broadcast-
    # crossJoin (BNLJ on 1 row is fine); never a pair expansion
    ("q101_merge_distance", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # calibration: 1-row prior broadcast + ONE bin HashAggregate +
    # 1-row summary; O(pairs), never cartesian
    ("q102_fs_calibration", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # group linkage: member-key equi-join (hash join, candidate group
    # pairs only where a key is shared) + group-pair HashAggregate;
    # never a cartesian over groups
    ("q103_group_linkage", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # PassJoin: segment/probe explode + equi hash join on (substring,
    # partner-length, segment-index); the short pool is a length-band
    # join over the alphabet-bounded short dictionary (BNLJ there is
    # bounded by construction); NEVER a cartesian over the strings
    ("q106_passjoin_edit_join", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # ranking metrics: ONE map-side-combinable groupBy on the score,
    # windows over the distinct-score frame only; never cartesian
    ("q107_ranking_metrics", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # truth discovery: claim dedup + keyed aggs; fold lists are
    # per-group sorted collects (ObjectHashAggregate); never cartesian
    ("q108_truth_discovery", [r"HashAggregate|ObjectHashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # skew profile: one count shuffle on the block key + bucket agg +
    # windows over the ~60-row bucket frame; never cartesian
    ("q109_block_skew_profile", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # cohesion audit: CC operator (checkpoint-pinned) + degree groupBy
    # + component roll-up hash joins; never cartesian
    ("q110_cluster_cohesion", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # leakage-free split: ONE groupBy on the fingerprint; the naive-
    # straddle audit rides the same pass as conditional sums — no
    # second shuffle, no join, never cartesian
    ("q111_leakage_free_split", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct", r"Join"]),
    # deletion repair: semi/anti joins on batch-bounded id sets + CC
    # re-run on the touched subgraph only; never cartesian
    ("q112_deletion_repair", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # FS threshold selection: one score groupBy + cumulative windows
    # over the distinct-score frame + a 1-row broadcast of the chosen
    # cuts; never cartesian
    ("q113_fs_threshold_selection", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # u estimation: per-bucket rank windows (16 bounded partitions,
    # no global sort) + the pair double-join + one 1-row agg
    ("q114_random_pair_u_estimation", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # compression signal: one Arrow-batched projection pass; the only
    # exchange is the presentation orderBy
    ("q115_compression_quality", [r"ArrowEvalPython"], [r"CartesianProduct", r"Join"]),
    # persistent ids: contingency-cell groupBy + size aggs + argmax
    # struct-min + hash joins back; never a pair expansion
    ("q116_persistent_ids", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # temporal decay: weights are plan literals — scoring is pure
    # projection over the pair stage (BNLJ only on 1-row scalar CTEs)
    ("q117_temporal_decay", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # interval join: bucket explode + EQUI hash join on (block,
    # bucket) — the range join must never plan as nested-loop/cartesian
    ("q118_interval_overlap_join", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct", r"BroadcastNestedLoopJoin"]),
    # collective propagation: per round a symmetrized adjacency +
    # the triangle hash join + integer-blend projection; localCheckpoint
    # PINS each round, so the audited plan is only the final projection
    # over the last checkpoint (the per-round join/agg plans are the
    # common_neighbor_features shape gated via q74) — never cartesian
    ("q119_collective_propagation", [r"codegen id : "], [r"CartesianProduct"]),
    # kNN sparsify: per-node rank windows (partition = node) + pair
    # roll-up; no global sort, never cartesian
    ("q120_knn_sparsify", [r"HashAggregate", r"Window", r"codegen id : "], [r"CartesianProduct"]),
    # alias mining: O(cells) — count shuffle, argmax struct-min, one
    # join back, one roll-up; never row-pair expansion
    ("q121_alias_mining", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
    # independence audit: ONE aggregation pass (conditional sums) +
    # a stack over the single aggregate row; BNLJ only on 1-row builds
    ("q122_fs_independence_audit", [r"HashAggregate", r"codegen id : "], [r"CartesianProduct"]),
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    from pubmed_and_method_spark import queries as q
    from pubmed_and_method_spark.session import get_spark

    # AQE wraps plans in AdaptiveSparkPlan whose pre-execution explain
    # hides codegen annotations; audit with AQE off to see the static
    # codegen layout (runtime plans re-enable AQE).
    spark = get_spark(
        app_name="explain_audit", cores="8",
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    lines = [
        "# EXPLAIN audit — physical-plan properties of headline queries",
        "",
        f"Scale dir: `{SF_DIR}`.  Regenerate: `python explain_audit.py`.",
        "",
        "| query | pushdown/pruning | codegen | joins | red flags |",
        "|---|---|---|---|---|",
    ]
    failures = []
    for name, must, must_not in AUDIT:
        plan = plan_of(q.QUERIES[name](spark, SF_DIR))
        pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
        n_codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
        joins = sorted(set(re.findall(
            r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct",
            plan,
        )))
        reds = []
        for pat in must:
            if not re.search(pat, plan):
                reds.append(f"missing `{pat}`")
        for pat in must_not:
            if re.search(pat, plan):
                reds.append(f"has `{pat}`")
        if reds:
            failures.append((name, reds))
        pushed_s = "; ".join(dict.fromkeys(pushed))[:120] or "—"
        lines.append(
            f"| {name} | {pushed_s} | {n_codegen} spans | "
            f"{', '.join(joins) or '—'} | {'; '.join(reds) or 'none'} |"
        )

    # pipeline-internal plan: adaptive triangle-split pair generation
    # (r04) — the hot-block size list must come in as a BROADCAST join
    # (never a shuffle of the members on block size), and the pair
    # build must stay cartesian-free
    from pyspark.sql import functions as F

    from pubmed_and_method_spark.operators.blocking import generate_pairs

    members = spark.range(2000).select(
        F.concat(F.lit("b"), (F.col("id") % 97).cast("string")).alias(
            "block_key"
        ),
        F.format_string("m%05d", F.col("id")).alias("mention_id"),
    )
    aplan = plan_of(generate_pairs(members, adaptive_target=16))
    areds = []
    if not re.search(r"BroadcastHashJoin", aplan):
        areds.append("adaptive hot-list join not broadcast")
    if re.search(r"CartesianProduct", aplan):
        areds.append("adaptive pair build has CartesianProduct")
    if areds:
        failures.append(("generate_pairs(adaptive)", areds))
    a_spans = len(set(re.findall(r"codegen id : (\d+)", aplan)))
    a_joins = ", ".join(sorted(set(re.findall(
        r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin", aplan
    )))) or "—"
    a_reds = "; ".join(areds) or "none"
    lines.append(
        f"| generate_pairs(adaptive_target=16) | — | {a_spans} spans | "
        f"{a_joins} | {a_reds} |"
    )

    lines += [
        "",
        "Notes:",
        "- q22 brute-force cosine is the documented bounded baseline"
        " (top-k over <=limit rows); q33 is the LSH scale path.",
        "- BroadcastNestedLoopJoin appears only for the single-row"
        " scalar-subquery normalizations (A7) — 1-row build side.",
        "- generate_pairs(adaptive): only OVERSIZED blocks ride the"
        " broadcast (size > target), so the broadcast stays tiny even"
        " with millions of block keys; typical blocks take the"
        " unreplicated s=1 path.",
    ]
    with open(os.path.join(os.path.dirname(__file__), "EXPLAIN.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    if failures:
        print("\nAUDIT FAILURES:", failures)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
