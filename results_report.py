#!/usr/bin/env python
"""Generate RESULTS.md — the engine's analog of the reference's
published quality tables (src/comparison/result.txt: per-feature-group
and per-model fold-averaged grouped-CV metrics).

Runs the full feature stack on the seeded synthetic corpus
($SPARK_GRAFT_RESULTS_ENTITIES entities, default 5000 — non-trivial
scale per the r03 verdict; 80 reproduces the old F1-gate table), then:
- feature-group ablation (ml/ablation.FEATURE_GROUPS, GBT), the analog
  of result.txt's outer_name / song_gs_combine / ... blocks;
- the 9-classifier model comparison (src/main_app.py:43 loop);
- the ANN recall@k tuning grid for lsh_topk vs the exact brute-force
  ground truth (r03 verdict #1 — the dual-implementation cross-check,
  database/and_datasets.sql:81-105, applied to the ANN scale path);
- hard-corpus tables (hardness 0.5 / 1.0, $SPARK_GRAFT_RESULTS_HARD_ENTITIES
  entities): planted homonyms, byline dropout/typos, shared
  content/tool/time evidence — the r03 verdict's "corpus is easy"
  gap.

Usage: python results_report.py   (writes RESULTS.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_ENTITIES = int(os.environ.get("SPARK_GRAFT_RESULTS_ENTITIES", "5000"))


def ann_recall_section(spark) -> list[str]:
    """Recall@5 x candidate-cost grid: lsh_topk vs brute_force_topk on
    the ER-shaped clustered corpus, plus the i.i.d.-random corpus at
    the default knobs as the honesty row (structureless data has no
    recoverable neighbors at any sub-exhaustive setting)."""
    from pubmed_and_method_spark.operators.similarity import topk_recall
    from pubmed_and_method_spark.sources.datagen import clustered_embeddings_df

    emb = clustered_embeddings_df(
        spark, n_entities=40, per_entity=6, dim=64, noise=0.15, seed=7
    ).cache()
    n = emb.count()
    lines = [
        "## ANN recall grid (lsh_topk vs exact top-5)",
        "",
        f"Clustered eval corpus: 40 entities x 6 members, dim 64, noise",
        f"0.15 (sibling cosine ~0.978), n={n}; exact work per query =",
        f"{n - 1} candidates.  recall@5 = macro-average overlap with",
        "`brute_force_topk`; cands/query = distinct same-bucket pairs",
        "(the exact cosine evaluations the index paid).  Pytest gate:",
        "recall@5 >= 0.9 at the default 8 bits x 4 tables",
        "(tests/test_training_ops.py::test_lsh_topk_recall_gate).",
        "",
        "| bits | tables | recall@5 | cands/query |",
        "|---|---|---|---|",
    ]
    for bits in (4, 8, 12):
        for tables in (1, 2, 4, 8):
            m = topk_recall(emb, dim=64, k=5, bits=bits, tables=tables, seed=42)
            mark = " **(default)**" if (bits, tables) == (8, 4) else ""
            lines.append(
                f"| {bits} | {tables} | {m['recall_at_k']:.3f}{mark} "
                f"| {m['mean_candidates_per_query']:.1f} |"
            )
    emb.unpersist()
    # honesty row: the driver's i.i.d. embeddings have near-orthogonal
    # "nearest" neighbors — recall is structurally low there and tuning
    # cannot fix it; report it so nobody reads the grid as universal
    from pubmed_and_method_spark.session import load_table

    raw = load_table(spark, "/root/testdata/sf0.001", "embeddings").cache()
    nr = raw.count()
    m = topk_recall(raw, dim=64, k=5, bits=8, tables=4, seed=42)
    raw.unpersist()
    lines += [
        "",
        f"Contrast (i.i.d. random corpus, sf0.001 embeddings, n={nr}):",
        f"recall@5 = {m['recall_at_k']:.3f} at the default knobs with",
        f"{m['mean_candidates_per_query']:.1f} cands/query — neighbors",
        "of i.i.d. Gaussian vectors sit near cos 0.4 where sign-LSH",
        "collision probability is ~0.03/table; no index setting",
        "recovers them without near-exhaustive work.  ANN presumes",
        "clustered structure; measure recall on YOUR corpus with",
        "`operators.similarity.topk_recall` before trusting the knobs.",
    ]

    # IVF grid: the trained-coarse-quantizer alternative on the same
    # corpus — nlist x nprobe trades the same recall/cost axis with a
    # data-adaptive partition instead of data-oblivious hyperplanes
    from pubmed_and_method_spark.operators.similarity import ivf_recall

    emb = clustered_embeddings_df(
        spark, n_entities=40, per_entity=6, dim=64, noise=0.15, seed=7
    ).cache()
    emb.count()
    lines += [
        "",
        "## IVF recall grid (ivf_topk vs exact top-5, same corpus)",
        "",
        "Trained k-means coarse quantizer (seeded-sample Lloyd,",
        "operators/similarity.train_ivf_centroids); recall and",
        "cands/query defined as above.  Pytest gate: recall@5 >= 0.9",
        "at the default 16 lists x 4 probes",
        "(tests/test_training_ops.py::test_ivf_topk_recall_gate);",
        "q48 is the integer-exact DuckDB-oracled twin.",
        "",
        "| nlist | nprobe | recall@5 | cands/query |",
        "|---|---|---|---|",
    ]
    for nlist in (8, 16, 32):
        for nprobe in (1, 2, 4):
            m = ivf_recall(
                emb, dim=64, k=5, nlist=nlist, nprobe=nprobe, seed=42
            )
            mark = " **(default)**" if (nlist, nprobe) == (16, 4) else ""
            lines.append(
                f"| {nlist} | {nprobe} | {m['recall_at_k']:.3f}{mark} "
                f"| {m['mean_candidates_per_query']:.1f} |"
            )
    emb.unpersist()
    return lines


def fs_section(spark) -> list[str]:
    """Supervised (q64) vs unsupervised-EM (q66) Fellegi-Sunter
    parameters side by side on the seed-42 corpus: the check that EM
    recovers the labeled estimates with no labels, per feature."""
    from pubmed_and_method_spark.queries import QUERIES

    sup = {
        r["feature"]: r
        for r in QUERIES["q64_fellegi_sunter_weights"](spark, "").collect()
    }
    em = {
        r["feature"]: r
        for r in QUERIES["q66_fellegi_sunter_em"](spark, "").collect()
    }
    any_sup = next(iter(sup.values()))
    n_m, n_n = any_sup["n_match"], any_sup["n_nonmatch"]
    prev = n_m / (n_m + n_n)
    lam = next(iter(em.values()))["lambda_match"]
    lines = [
        "## Fellegi-Sunter parameters: supervised vs unsupervised EM",
        "",
        "m = P(agree|match), u = P(agree|non-match), w = log2(m/u)",
        "bits of evidence on agreement.  'sup' columns estimated from",
        f"truth labels (q64, {n_m + n_n} candidate pairs); 'EM' columns",
        "estimated by 5 EM iterations over the agreement-pattern",
        "histogram with NO labels (q66).  Both DuckDB-value-oracled.",
        "",
        "| feature | m sup | m EM | u sup | u EM | w sup | w EM |",
        "|---|---|---|---|---|---|---|",
    ]
    for f in sorted(sup):
        s, e = sup[f], em[f]
        lines.append(
            f"| {f} | {s['m_prob']:.3f} | {e['m_prob']:.3f} "
            f"| {s['u_prob']:.3f} | {e['u_prob']:.3f} "
            f"| {s['match_weight']:+.2f} | {e['match_weight']:+.2f} |"
        )
    lines += [
        "",
        f"True match prevalence {prev:.3f} vs EM λ {lam:.3f}.  Reading:",
        "every EM weight agrees with its supervised counterpart in",
        "SIGN and ranking (tool_hi is the discriminator both ways;",
        "the name thresholds carry ~0 bits because candidate pairs",
        "already share surname + first initial — blocking absorbed",
        "the name signal, the same effect as the ablation tables'",
        "name-only collapse), but λ overshoots: the within-block",
        "features separate weakly and are correlated, exactly the",
        "independence violation the FS literature warns about.  On a",
        "WELL-separated mixture EM recovers λ to ±0.05 with no labels",
        "(tests/test_blocking.py::test_fs_em_recovers_separation);",
        "this table is the honest behavior on a corpus where blocking",
        "already ate the easy evidence.",
    ]
    lines += _fs_missing_lines(spark)
    return lines


def _fs_missing_lines(spark) -> list[str]:
    """The fastLink third-state comparison (q95): tool evidence on the
    HARD corpus under zero-fill (missing tools count as disagreement —
    the q66/reference treatment) vs missing-aware EM (missing carries
    no evidence)."""
    from pyspark.sql import functions as F

    from pubmed_and_method_spark.operators.er_metrics import fs_em
    from pubmed_and_method_spark.plans.pipeline import (
        build_labeled_pairs,
        build_pair_features,
        build_signatures,
    )
    from pubmed_and_method_spark.queries import QUERIES, _FS_EM_FEATURES
    from pubmed_and_method_spark.sources.datagen import transcripts_df

    em3 = {
        r["feature"]: r
        for r in QUERIES["q95_fs_em_missing"](spark, "").collect()
    }
    # zero-fill twin on the SAME hard-corpus pairs: the q66 treatment
    # (empty tool/token sides score jaccard 0 -> "disagree")
    t, g = transcripts_df(spark, seed=42, hardness=0.7)
    sig = build_signatures(t, tfidf=False)
    feats = build_pair_features(build_labeled_pairs(sig, g), sig)
    ag = feats.select(
        (F.round("name_jw", 6) >= 0.9).alias("name_jw_hi"),
        (F.round("given_jw", 6) >= 0.9).alias("given_jw_hi"),
        (F.round("name_lev_ratio", 6) >= 0.8).alias("lev_hi"),
        (F.round("token_jacc", 6) >= 0.5).alias("token_hi"),
        (F.round("tool_jacc", 6) >= 0.5).alias("tool_hi"),
        (F.col("time_overlap") == 1).alias("time_overlap"),
    )
    zf = {
        r["feature"]: r
        for r in fs_em(ag, _FS_EM_FEATURES, n_iter=5).collect()
    }
    z, m = zf["tool_hi"], em3["tool_hi"]
    return [
        "",
        "### Missing-aware EM (fastLink third state, q95)",
        "",
        "Hard corpus (hardness 0.7: tool dropout planted).  `tool_hi`",
        "under the two treatments of a pair where either side has NO",
        "tools — zero-fill scores it jaccard 0 (\"disagree\", the",
        "reference's 0-sentinel treatment); missing-aware (q95,",
        "Enamorado-Fifield-Imai) lets it carry no evidence:",
        "",
        "| treatment | m | u | w_agree | w_disagree | missing share |",
        "|---|---|---|---|---|---|",
        f"| zero-fill EM (q66 treatment) | {z['m_prob']:.3f} "
        f"| {z['u_prob']:.3f} | {z['match_weight']:+.2f} "
        f"| {z['disagree_weight']:+.2f} | — |",
        f"| missing-aware EM (q95) | {m['m_prob']:.3f} "
        f"| {m['u_prob']:.3f} | {m['match_weight']:+.2f} "
        f"| {m['disagree_weight']:+.2f} | {m['missing_share']:.3f} |",
        "",
        "Reading: with missing comparisons excluded from tool_hi's",
        "M-step mass, the agreement probabilities are estimated over",
        "pairs that could actually agree — the disagreement penalty",
        "stops charging mentions for tools they never logged.  Both",
        "estimators are DuckDB-value-oracled (q66/q95).",
    ]


def clustering_section(spark) -> list[str]:
    """Transitive closure (CC) vs star clustering on the SAME scored
    match graph at three thresholds: the weld-resistance comparison
    (B-cubed + V-measure + cluster-shape stats), q63's metrics applied
    to q25-style CC output vs the q70 operator."""
    from pyspark.sql import functions as F

    from pubmed_and_method_spark.operators.connected_components import (
        connected_components,
    )
    from pubmed_and_method_spark.operators.er_metrics import (
        cluster_agreement_metrics,
    )
    from pubmed_and_method_spark.operators.pivot_clustering import (
        pivot_clusters,
    )
    from pubmed_and_method_spark.operators.star_clustering import (
        star_clusters,
    )
    from pubmed_and_method_spark.plans.pipeline import (
        build_labeled_pairs,
        build_pair_features,
        build_signatures,
    )
    from pubmed_and_method_spark.queries import ensure_transcript_corpus
    from pubmed_and_method_spark.sources.datagen import transcripts_df

    n_entities = 2000
    t, g = transcripts_df(
        spark,
        seed=42,
        hardness=0.7,
        n_entities=n_entities,
        n_blocks=max(24, n_entities * 3 // 10),
    )
    sig = build_signatures(t, tfidf=False)
    feats = build_pair_features(build_labeled_pairs(sig, g), sig)
    scored = feats.select(
        "mention_id1",
        "mention_id2",
        (
            F.round("name_jw", 6)
            + F.round("token_jacc", 6)
            + F.round("tool_jacc", 6)
        ).alias("score"),
    ).localCheckpoint(eager=True)
    mentions = sig.filter(F.col("block_key") != "__unblocked__").select(
        "mention_id", F.substring_index("mention_id", "#", 1).alias("conv_id")
    )
    truth = g.select("conv_id", "entity_id")
    labeled = mentions.join(truth, "conv_id").select(
        "mention_id", "entity_id"
    ).localCheckpoint(eager=True)

    rows = []
    for thr in (1.0, 1.3, 1.6):
        edges = scored.filter(F.col("score") >= thr)
        variants = {
            "CC": connected_components(
                edges, "mention_id1", "mention_id2"
            ).select(F.col("id").alias("mention_id"), F.col("component").alias("cluster")),
            "star": star_clusters(
                edges,
                id_cols=("mention_id1", "mention_id2"),
                weight_col="score",
                rounds=16,
            ).select(F.col("node").alias("mention_id"), F.col("center").alias("cluster")),
            "pivot": pivot_clusters(
                edges.select("mention_id1", "mention_id2"),
                id_cols=("mention_id1", "mention_id2"),
                rounds=32,
            ).select(F.col("node").alias("mention_id"), F.col("pivot").alias("cluster")),
        }
        for method, asg in variants.items():
            full = labeled.join(asg, "mention_id", "left").withColumn(
                "cluster", F.coalesce("cluster", F.col("mention_id"))
            )
            m = cluster_agreement_metrics(full, "cluster", "entity_id").first()
            biggest = (
                full.groupBy("cluster").count().agg(F.max("count")).first()[0]
            )
            rows.append(
                {
                    "thr": thr,
                    "method": method,
                    "n_clusters": m["n_clusters"],
                    "max_cluster": biggest,
                    "b3_p": m["bcubed_precision"],
                    "b3_r": m["bcubed_recall"],
                    "b3_f1": m["bcubed_f1"],
                    "v": m["v_measure"],
                }
            )
            _say(f"clust {method} thr={thr}: b3_f1={m['bcubed_f1']}")

    n_ent = labeled.select("entity_id").distinct().count()
    lines = [
        "## Clustering strategy: transitive closure vs star vs pivot",
        "",
        "Same scored match graph (hard corpus, hardness=0.7,",
        f"{n_ent} entities; score = round-6 name_jw + token_jacc +",
        "tool_jacc in [0,3]), clustered three ways at three",
        "thresholds: CC (the reference's weld — q25 operator) vs",
        "star clustering (q70, diameter <= 2, degree-greedy",
        "centers) vs pivot correlation clustering (q87, diameter",
        "<= 2, hash-random pivots).  B-cubed / V-measure per q63's",
        "operator; unblocked/edge-less mentions are singletons.",
        "",
        "| thr | method | clusters | max size | B3 P | B3 R | B3 F1 | V |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['thr']} | {r['method']} | {r['n_clusters']} "
            f"| {r['max_cluster']} | {r['b3_p']:.3f} | {r['b3_r']:.3f} "
            f"| {r['b3_f1']:.3f} | {r['v']:.3f} |"
        )
    by = {(r["thr"], r["method"]): r for r in rows}
    hi_cc, hi_st = by[(1.6, "CC")], by[(1.6, "star")]
    lines += [
        "",
        "Reading: at the PERMISSIVE cut the three nearly coincide — the false",
        "edges are so dense that welded components are also single",
        "hubs' neighborhoods, so the diameter bound buys little.",
        "The separation appears as the cut tightens and false edges",
        "thin into CHAINS: closure still welds along them (max",
        f"cluster {hi_cc['max_cluster']} at thr=1.6, B3 precision",
        f"{hi_cc['b3_p']:.3f}) while star breaks them at hub",
        f"boundaries (max {hi_st['max_cluster']}, precision",
        f"{hi_st['b3_p']:.3f}, B3 F1 {hi_st['b3_f1']:.3f} vs",
        f"{hi_cc['b3_f1']:.3f}).  Star is the right default exactly",
        "where a pipeline operates — a cut tight enough that errors",
        "are chain-shaped, not blob-shaped; closure remains correct",
        "when edges are near-certain.  Pivot sits on star's side of",
        "the weld divide (same diameter bound) but its hash-random",
        f"pivots trade recall for it (B3 R {by[(1.6, 'pivot')]['b3_r']:.3f}",
        f"vs star {hi_st['b3_r']:.3f} at thr=1.6): a pivot need not",
        "be adjacent to all of its entity's match subgraph, so",
        "sparse entities fragment — the price of the",
        "correlation-clustering guarantee being about EDGES, not",
        "hubs.  All three are first-class operators because the",
        "choice is a threshold-regime decision.",
    ]
    return lines


def _say(msg: str) -> None:
    """Timestamped, flushed progress line — the long sections run for
    tens of minutes and detached logs need liveness markers."""
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def quality_tables(spark, n_entities: int, hardness: float = 0.0,
                   parallelism: int = 1):
    """Corpus -> feature stack -> (ablation rows, zoo rows, n_pairs,
    n_blocks) at the given corpus difficulty."""
    from pubmed_and_method_spark.ml.ablation import (
        feature_group_ablation,
        model_comparison,
    )
    from pubmed_and_method_spark.plans.pipeline import (
        FEATURE_COLS,
        build_labeled_pairs,
        build_pair_features,
        build_signatures,
    )
    from pubmed_and_method_spark.sources.datagen import transcripts_df

    import shutil
    import tempfile

    n_blocks = max(24, n_entities * 3 // 10)
    t, g = transcripts_df(
        spark, seed=42, n_entities=n_entities, n_blocks=n_blocks,
        hardness=hardness,
    )
    sig = build_signatures(t)
    pairs = build_labeled_pairs(sig, g, num_buckets=4, lsh=True)
    # materialize ONLY the model-relevant columns as compressed
    # parquet: the full pair-feature rows carry the signature arrays
    # (token/shingle hashes) for the error-analysis contract, and raw
    # localCheckpoint blocks of those measured ~60 GB at 5000
    # entities — 100x the columnar footprint of what the CV actually
    # consumes (filled the sandbox disk; r04 session note)
    from pubmed_and_method_spark.ml.ablation import FEATURE_GROUPS

    keep = sorted(
        set(FEATURE_COLS)
        | {c for cols in FEATURE_GROUPS.values() for c in cols}
        | {"same_entity", "split_group"}
    )
    d = tempfile.mkdtemp(prefix="results_feats_")
    try:
        build_pair_features(pairs, sig).select(*keep).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "features"))
        features = spark.read.parquet(os.path.join(d, "features"))
        n_pairs = features.count()
        # Fit-cost cap: candidate-pair volume grows superlinearly with
        # entities (5000 entities -> ~26M pairs), and 64 grouped-CV
        # fits on 26M rows is many machine-hours for table cells whose
        # metrics stabilize orders of magnitude earlier.  Above the
        # cap, fit on a DETERMINISTIC 1/k hash sample of the pairs
        # (xxhash64 over every model column -> stable across runs;
        # fold membership still decided by split_group, so the sample
        # thins groups without leaking them across folds).  The report
        # states both numbers.
        max_fit = int(
            os.environ.get("SPARK_GRAFT_RESULTS_MAX_FIT_PAIRS", "2000000")
        )
        n_fit_pairs = n_pairs
        if n_pairs > max_fit:
            from pyspark.sql import functions as F

            k = -(-n_pairs // max_fit)  # ceil
            features = features.filter(
                F.pmod(F.xxhash64(*[F.col(c) for c in keep]), F.lit(k)) == 0
            )
            features.write.mode("overwrite").parquet(
                os.path.join(d, "fit_sample")
            )
            features = spark.read.parquet(os.path.join(d, "fit_sample"))
            n_fit_pairs = features.count()
        _say(f"features built: {n_pairs} pairs ({n_entities} entities, "
             f"hardness={hardness}), fitting on {n_fit_pairs}; "
             "fitting ablation grid")
        groups = feature_group_ablation(
            features, algos=("gbt",), parallelism=parallelism,
            progress=_say,
        )
        _say("ablation done; fitting classifier zoo")
        models = model_comparison(
            features, FEATURE_COLS, parallelism=parallelism, progress=_say,
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return groups, models, n_pairs, n_blocks, n_fit_pairs


def only_ann() -> int:
    """Regenerate ONLY the ANN sections of an existing RESULTS.md
    (`--only-ann`): the model-fit tables take hours at 5000 entities,
    the ANN grids minutes — this splices fresh grids into the current
    file and stamps the partial regeneration honestly."""
    from pubmed_and_method_spark.session import get_spark

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "RESULTS.md"
    )
    with open(path) as f:
        cur = f.read()
    head, sep, _ = cur.partition("## ANN recall grid")
    if not sep:
        print("no ANN section found; run the full report", file=sys.stderr)
        return 1
    spark = get_spark(app_name="results_report_ann", cores="16")
    t0 = time.time()
    ann_lines = ann_recall_section(spark)
    wall = round(time.time() - t0, 1)
    out = head + "\n".join(ann_lines) + (
        "\n\nModel-fit tables from the last full `python "
        "results_report.py` run; ANN sections regenerated by "
        f"`python results_report.py --only-ann` in {wall}s.\n"
    )
    with open(path, "w") as f:
        f.write(out)
    print(out[out.find("## ANN recall grid"):])
    return 0


def only_fs() -> int:
    """Regenerate ONLY the Fellegi-Sunter section of an existing
    RESULTS.md (`--only-fs`): seconds vs the hours the model-fit
    sections take.  Splices before the ANN grid (which `--only-ann`
    partitions on, so the two partial-regen paths compose)."""
    from pubmed_and_method_spark.session import get_spark

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "RESULTS.md"
    )
    with open(path) as f:
        cur = f.read()
    head, sep, tail = cur.partition("## ANN recall grid")
    if not sep:
        print("no ANN section found; run the full report", file=sys.stderr)
        return 1
    fs_head, fs_sep, _ = head.partition(
        "## Fellegi-Sunter parameters"
    )
    if fs_sep:
        head = fs_head
    spark = get_spark(app_name="results_report_fs", cores="16")
    lines = fs_section(spark)
    out = head + "\n".join(lines) + "\n\n" + sep + tail
    with open(path, "w") as f:
        f.write(out)
    print("\n".join(lines))
    return 0


def only_clust() -> int:
    """Regenerate ONLY the CC-vs-star clustering section of an
    existing RESULTS.md (`--only-clust`): splices before the
    Fellegi-Sunter section (or the ANN grid if FS is absent)."""
    from pubmed_and_method_spark.session import get_spark

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "RESULTS.md"
    )
    with open(path) as f:
        cur = f.read()
    anchor = "## Fellegi-Sunter parameters"
    head, sep, tail = cur.partition(anchor)
    if not sep:
        anchor = "## ANN recall grid"
        head, sep, tail = cur.partition(anchor)
    if not sep:
        print("no splice anchor found; run the full report", file=sys.stderr)
        return 1
    c_head, c_sep, _ = head.partition(
        "## Clustering strategy: transitive closure vs star"
    )  # legacy title
    if c_sep:
        head = c_head
    spark = get_spark(app_name="results_report_clust", cores="16")
    lines = clustering_section(spark)
    out = head + "\n".join(lines) + "\n\n" + sep + tail
    with open(path, "w") as f:
        f.write(out)
    print("\n".join(lines))
    return 0


#: where per-section row dumps live between `--section` runs and
#: `--assemble` (machine-local scratch; survives the writing process)
PARTS_DIR = os.environ.get("SPARK_GRAFT_RESULTS_PARTS", "/tmp/results_parts")
SECTIONS = ("main", "hard05", "hard10", "ann", "fs")


def run_section(name: str, cores: str | None = None) -> int:
    """Compute ONE report section and dump its rows to
    PARTS_DIR/<name>.json.  The model-fit sections are independent
    Spark jobs that take hours back-to-back at 5000 entities, so the
    intended regeneration is four concurrent processes (cores split
    across them, SPARK_DRIVER_MEM sized per process) followed by
    `--assemble`; numbers are identical to the sequential run."""
    import json

    from pubmed_and_method_spark.session import get_spark

    fit_par = int(os.environ.get("SPARK_GRAFT_FIT_PARALLELISM", "4"))
    spark = get_spark(app_name=f"results_report_{name}", cores=cores or "16")
    t0 = time.time()
    hard_n = int(os.environ.get("SPARK_GRAFT_RESULTS_HARD_ENTITIES", "1000"))
    if name == "main":
        groups, models, n_pairs, n_blocks, n_fit = quality_tables(
            spark, N_ENTITIES, parallelism=fit_par
        )
        payload = {"n_entities": N_ENTITIES, "n_blocks": n_blocks,
                   "n_pairs": n_pairs, "n_fit_pairs": n_fit,
                   "groups": groups, "models": models}
    elif name in ("hard05", "hard10"):
        h = 0.5 if name == "hard05" else 1.0
        groups, models, n_pairs, n_blocks, n_fit = quality_tables(
            spark, hard_n, hardness=h, parallelism=fit_par
        )
        payload = {"hard_n": hard_n, "hardness": h, "n_blocks": n_blocks,
                   "n_pairs": n_pairs, "n_fit_pairs": n_fit,
                   "groups": groups, "models": models}
    elif name == "ann":
        payload = {"lines": ann_recall_section(spark)}
    elif name == "fs":
        payload = {"lines": fs_section(spark)}
    else:
        print(f"unknown section {name!r}; one of {SECTIONS}", file=sys.stderr)
        return 1
    payload["wall"] = round(time.time() - t0, 1)
    os.makedirs(PARTS_DIR, exist_ok=True)
    with open(os.path.join(PARTS_DIR, f"{name}.json"), "w") as f:
        json.dump(payload, f)
    _say(f"section {name} done in {payload['wall']}s -> "
         f"{os.path.join(PARTS_DIR, name + '.json')}")
    return 0


def assemble() -> int:
    """Stitch the four section dumps into RESULTS.md."""
    import json

    parts = {}
    for name in SECTIONS:
        p = os.path.join(PARTS_DIR, f"{name}.json")
        if not os.path.exists(p):
            print(
                f"missing section dump {p}; run --section {name} first",
                file=sys.stderr,
            )
            return 1
        with open(p) as f:
            parts[name] = json.load(f)
    write_report(parts)
    return 0


def lenses_section(spark) -> list[str]:
    """All four extrinsic evaluation lenses applied to the SAME
    partition (exact-name blocking vs planted truth) on the clean and
    the typo-planted hard corpus at 2000 entities: pairwise P/R/F1
    (the reference's only metric), B-cubed F1 + V-measure (q63),
    chance-corrected ARI (q76), and greedy CEAF-m accuracy (q81).
    One table so the lenses can be read against each other — pairwise
    F1 looks fine on the hard corpus while ARI and CEAF-m expose the
    typo-severed blocks."""
    from pubmed_and_method_spark.operators.er_metrics import (
        ceaf_alignment,
        cluster_agreement_metrics,
        pair_counting_metrics,
    )
    from pubmed_and_method_spark.plans.pipeline import build_signatures
    from pubmed_and_method_spark.sources.datagen import transcripts_df

    n_entities = 2000
    lines = [
        "## Evaluation lenses: one partition, four metric families",
        "",
        f"Exact-name blocking partition vs planted truth, {n_entities}"
        " entities; same blocks the pipeline's pass 1 produces.  Pair"
        " metrics from q76's exact pair counts, B³/V from q63, ARI"
        " chance-corrected, CEAF-m = Σ matched overlap / mentions from"
        " q81's greedy alignment (rounds=16).",
        "",
        "| corpus | mentions | pair P | pair R | pair F1 | B³ F1 |"
        " V | ARI | CEAF-m |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for label, hardness in (("clean", 0.0), ("hard 0.7", 0.7)):
        t, g = transcripts_df(
            spark,
            seed=42,
            hardness=hardness,
            n_entities=n_entities,
            n_blocks=max(24, n_entities * 3 // 10),
        )
        from pyspark.sql import functions as F

        assign = (
            build_signatures(t, tfidf=False)
            .filter(F.col("block_key") != "__unblocked__")
            .select("conv_id", F.col("block_key").alias("cluster"))
            .join(g.select("conv_id", "entity_id"), "conv_id")
            .cache()
        )
        pc = pair_counting_metrics(assign).collect()[0]
        ag = cluster_agreement_metrics(assign).collect()[0]
        al = ceaf_alignment(assign, rounds=16).collect()
        ceaf_m = sum(r.phi_m for r in al) / pc.n_items
        p, r = pc.pair_precision, pc.pair_recall
        f1 = round(2 * p * r / (p + r), 4) if (p + r) else 0.0
        lines.append(
            f"| {label} | {pc.n_items} | {round(p, 4)} | {round(r, 4)}"
            f" | {f1} | {round(ag.bcubed_f1, 4)} |"
            f" {round(ag.v_measure, 4)} | {round(pc.adjusted_rand, 4)} |"
            f" {round(ceaf_m, 4)} |"
        )
        assign.unpersist()
    lines += [
        "",
        "Reading: blocking is the RECALL-side stage — pair recall 1.0"
        " on the clean corpus (no true pair severed), dropping to"
        " ~0.78 under planted typos — while its precision is"
        " deliberately poor (blocks share normalized keys across"
        " entities by construction; precision is the matcher's job)."
        "  The lenses then disagree in exactly the way that makes the"
        " extra families worth having: V-measure flatters the"
        " partition (~0.84 — completeness-driven), while ARI (~0.19)"
        " and CEAF-m (~0.2-0.25, each multi-entity block can match"
        " only ONE entity) expose how far from a resolution this"
        " still is.  A metric suite that only reported pairwise F1 or"
        " only V would misread the same partition two different ways"
        " — the reference reports only the former.",
    ]
    return lines


def budget_section(spark) -> list[str]:
    """Review-budget + uncertainty view of the FS matcher (the q98 /
    q99 operators) at 2000 entities: progressive recall at each
    effort decile of the llr-ordered labeled pairs, and the
    half-sample subsampling band around the headline F1 — the two
    numbers a triage team needs that a bare point F1 doesn't carry."""
    from pyspark.sql import functions as F

    from pubmed_and_method_spark.operators.er_metrics import (
        fs_classify,
        fs_weights,
        progressive_recall,
        subsample_f1_ci,
    )
    from pubmed_and_method_spark.plans.pipeline import (
        build_labeled_pairs,
        build_pair_features,
        build_signatures,
    )
    from pubmed_and_method_spark.queries import _FS_EM_FEATURES
    from pubmed_and_method_spark.sources.datagen import transcripts_df

    n_entities = 2000
    lines = [
        "## Review budget + uncertainty: progressive recall and the F1 band",
        "",
        f"FS decision rule (q67 binarization) on the labeled candidate"
        f" pairs at {n_entities} entities.  Progressive recall (q98):"
        " resolve pairs in llr order, read recall at each effort"
        " decile — lift = recall/effort, random order = 1.0.  F1 band"
        " (q99): 16 deterministic half-sample replicates of pairwise"
        " F1 at the best-F1 llr cut.",
        "",
        "| corpus | recall@10% effort | @20% | @30% | @50% | @100% |"
        " lift@10% |",
        "|---|---|---|---|---|---|---|",
    ]
    ci_rows = []
    for label, hardness in (("clean", 0.0), ("hard 0.7", 0.7)):
        t, g = transcripts_df(
            spark,
            seed=42,
            hardness=hardness,
            n_entities=n_entities,
            n_blocks=max(24, n_entities * 3 // 10),
        )
        sig = build_signatures(t, tfidf=False)
        feats = build_pair_features(build_labeled_pairs(sig, g), sig)
        ag = feats.select(
            "mention_id1",
            "mention_id2",
            (F.round("name_jw", 6) >= 0.9).alias("name_jw_hi"),
            (F.round("given_jw", 6) >= 0.9).alias("given_jw_hi"),
            (F.round("name_lev_ratio", 6) >= 0.8).alias("lev_hi"),
            (F.round("token_jacc", 6) >= 0.5).alias("token_hi"),
            (F.round("tool_jacc", 6) >= 0.5).alias("tool_hi"),
            (F.col("time_overlap") == 1).alias("time_overlap"),
            F.col("same_entity").cast("int").alias("same_entity"),
        ).cache()
        west = {
            r["feature"]: (r["match_weight"], r["disagree_weight"])
            for r in fs_weights(ag, _FS_EM_FEATURES).collect()
        }
        scored = fs_classify(
            ag, {c: west[c] for c in _FS_EM_FEATURES}, upper=4.0, lower=0.0
        ).cache()
        curve = {
            round(r.effort_frac, 1): r
            for r in progressive_recall(
                scored, n_steps=10, score_col="llr"
            ).collect()
        }
        rec = [round(curve[e].recall, 4) for e in (0.1, 0.2, 0.3, 0.5, 1.0)]
        lines.append(
            f"| {label} | {rec[0]} | {rec[1]} | {rec[2]} | {rec[3]} |"
            f" {rec[4]} | {round(curve[0.1].lift, 2)}x |"
        )
        # the FS link band is precision-first triage, not an F1
        # operating point (q75 sizes the bands); band the F1 at the
        # best cut instead — distinct llr values are <= 2^k, so the
        # argmax is a tiny driver fold over one groupBy
        hist = (
            scored.groupBy("llr")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("same_entity").alias("p"),
            )
            .orderBy(F.desc("llr"))
            .collect()
        )
        pos = sum(r.p for r in hist)
        cum_n = cum_p = 0
        t_opt, point = None, -1.0
        for r in hist:
            cum_n += r.n
            cum_p += r.p
            f1 = 2 * cum_p / (cum_n + pos) if cum_n + pos else 0.0
            if f1 > point:
                t_opt, point = r.llr, f1
        opt = scored.withColumn(
            "opt_pred", (F.col("llr") >= t_opt).cast("string")
        )
        reps = sorted(
            r.f1
            for r in subsample_f1_ci(
                opt, pred_col="opt_pred", link_value="true"
            ).collect()
        )
        c = scored.filter(F.col("decision") == "link").select(
            F.sum((F.col("same_entity") == 1).cast("int")).alias("tp"),
            F.count(F.lit(1)).alias("pp"),
        ).collect()[0]
        link_p = c.tp / c.pp if c.pp else 0.0
        link_r = c.tp / pos if pos else 0.0
        ci_rows.append(
            f"| {label} | {round(link_p, 4)} / {round(link_r, 4)} |"
            f" {round(t_opt, 2)} | {round(point, 4)} | {round(reps[0], 4)} |"
            f" {round((reps[7] + reps[8]) / 2, 4)} | {round(reps[-1], 4)} |"
        )
        ag.unpersist()
        scored.unpersist()
    lines += [
        "",
        "| corpus | link-cut P / R | best cut (llr) | F1 at best cut |"
        " band min | band median | band max |",
        "|---|---|---|---|---|---|---|",
        *ci_rows,
        "",
        "Reading: the matcher front-loads — the first effort decile of"
        " the llr order buys several times its share of recall (the"
        " lift column), the property that makes a bounded review"
        " budget rational at 10^12 pairs.  The FS link band at the"
        " fixed upper cut is precision-first triage by design"
        " (P ~0.99 at ~1% recall here; q75 sizes the bands), so the"
        " uncertainty band is reported at the F1-argmax cut over the"
        " <= 2^6 distinct llr values (in-sample selection, the"
        " standard operating-curve read); the half-sample spread is"
        " what the point estimate alone can't claim: on ~220k pairs the"
        " spread is ~1 F1 point, so the best-cut estimate is stable —"
        " the same operator exposes instability when a corpus is too"
        " small to support its headline.  The GBT pipeline's 0.997"
        " (BASELINE.md) is the strong matcher this weak-prior rule is"
        " the triage fallback for.",
    ]
    return lines


def only_budget() -> int:
    """Regenerate ONLY the review-budget section (`--only-budget`):
    splices before the Fellegi-Sunter section (or the ANN grid)."""
    from pubmed_and_method_spark.session import get_spark

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "RESULTS.md"
    )
    with open(path) as f:
        cur = f.read()
    anchor = "## Fellegi-Sunter parameters"
    head, sep, tail = cur.partition(anchor)
    if not sep:
        anchor = "## ANN recall grid"
        head, sep, tail = cur.partition(anchor)
    if not sep:
        print("no splice anchor found; run the full report", file=sys.stderr)
        return 1
    b_head, b_sep, _ = head.partition(
        "## Review budget + uncertainty: progressive recall and the F1 band"
    )
    if b_sep:
        head = b_head
    spark = get_spark(app_name="results_report_budget", cores="16")
    lines = budget_section(spark)
    out = head + "\n".join(lines) + "\n\n" + sep + tail
    with open(path, "w") as f:
        f.write(out)
    print("\n".join(lines))
    return 0


def only_lenses() -> int:
    """Regenerate ONLY the evaluation-lenses section (`--only-lenses`):
    splices before the Fellegi-Sunter section (or the ANN grid)."""
    from pubmed_and_method_spark.session import get_spark

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "RESULTS.md"
    )
    with open(path) as f:
        cur = f.read()
    anchor = "## Fellegi-Sunter parameters"
    head, sep, tail = cur.partition(anchor)
    if not sep:
        anchor = "## ANN recall grid"
        head, sep, tail = cur.partition(anchor)
    if not sep:
        print("no splice anchor found; run the full report", file=sys.stderr)
        return 1
    l_head, l_sep, _ = head.partition(
        "## Evaluation lenses: one partition, four metric families"
    )
    if l_sep:
        head = l_head
    spark = get_spark(app_name="results_report_lenses", cores="16")
    lines = lenses_section(spark)
    out = head + "\n".join(lines) + "\n\n" + sep + tail
    with open(path, "w") as f:
        f.write(out)
    print("\n".join(lines))
    return 0


def main() -> int:
    # sweep temp feature dirs orphaned by SIGKILL'd prior runs (the
    # finally-rmtree can't run when the process is killed mid-fit).
    # ONLY in the single-process full-run path: a `--section` process
    # must not sweep, because concurrent sibling sections own live
    # results_feats_* dirs.
    import glob
    import shutil
    import tempfile

    if "--only-ann" in sys.argv:
        return only_ann()
    if "--only-fs" in sys.argv:
        return only_fs()
    if "--only-clust" in sys.argv:
        return only_clust()
    if "--only-lenses" in sys.argv:
        return only_lenses()
    if "--only-budget" in sys.argv:
        return only_budget()
    if "--assemble" in sys.argv:
        return assemble()
    if "--section" in sys.argv:
        name = sys.argv[sys.argv.index("--section") + 1]
        cores = None
        if "--cores" in sys.argv:
            cores = sys.argv[sys.argv.index("--cores") + 1]
        return run_section(name, cores)

    for d in glob.glob(os.path.join(tempfile.gettempdir(), "results_feats_*")):
        shutil.rmtree(d, ignore_errors=True)
    for name in SECTIONS:
        rc = run_section(name, cores="16")
        if rc:
            return rc
    return assemble()


def write_report(parts: dict) -> None:
    """Render the full RESULTS.md from the section payloads."""
    mn, m05, m10 = parts["main"], parts["hard05"], parts["hard10"]
    n_blocks, n_pairs = mn["n_blocks"], mn["n_pairs"]
    n_fit = mn.get("n_fit_pairs", n_pairs)
    fit_note = (
        f" (grouped-CV fits run on a deterministic 1/{-(-n_pairs // n_fit)}"
        f" hash sample: {n_fit} pairs)" if n_fit < n_pairs else ""
    )
    groups, models = mn["groups"], mn["models"]
    mgroups, mmodels, m_pairs = m05["groups"], m05["models"], m05["n_pairs"]
    hgroups, hmodels, h_pairs = m10["groups"], m10["models"], m10["n_pairs"]
    hard_n, h_blocks = m10["hard_n"], m10["n_blocks"]
    ann_lines = parts["ann"]["lines"]
    walls = ", ".join(
        f"{name} {parts[name]['wall']}s" for name in SECTIONS
    )

    def table(rows: list[dict], key: str) -> list[str]:
        out = [
            f"| {key} | n_features | acc | P | R | F1 |",
            "|---|---|---|---|---|---|",
        ]
        for r in sorted(rows, key=lambda r: -r["f1"]):
            out.append(
                f"| {r['feature_group'] if key == 'feature group' else r['algo']} "
                f"| {r['n_features']} | {r['accuracy']:.4f} | {r['precision']:.4f} "
                f"| {r['recall']:.4f} | {r['f1']:.4f} |"
            )
        return out

    lines = [
        "# RESULTS — grouped-CV quality tables (analog of "
        "src/comparison/result.txt)",
        "",
        f"Corpus: seeded synthetic transcripts (seed 42, {mn['n_entities']}",
        f"entities / {n_blocks} blocks), {n_pairs} labeled candidate pairs (exact blocks +",
        f"MinHash-LSH pass 2){fit_note}.  Every cell is 4-fold group-aware CV",
        "(folds split on `split_group` — whole blocks per side, the",
        "GroupShuffleSplit rebuild), fold-averaged like the reference",
        "(src/comparison/inner_feature_method.py:57).  Deterministic:",
        "re-running this script reproduces every number.",
        "",
        "## Feature-group ablation (GBT)",
        "",
        "Analog of result.txt's per-feature-set blocks (outer_name /",
        "song_gs_combine / outer_mag_s2_pkg / exclusions).  Groups are",
        "the transcript analogs in `ml/ablation.FEATURE_GROUPS`.",
        "",
        *table(groups, "feature group"),
        "",
        "Reading: name-only features score near zero HERE by",
        "construction — candidate pairs exist only within blocks that",
        "share surname + first initial (plus LSH pairs, which often",
        "have no parsed name at all), so name similarity cannot",
        "separate same-block entities and content/tool/time evidence",
        "carries the signal.  The reference sees the same direction on",
        "real data (name-only SONG F1 76.2 vs full-model 93.7,",
        "result.txt:38-39): blocking absorbs most of the name signal",
        "before the classifier ever sees a pair.",
        "",
        "## Classifier zoo (full feature stack)",
        "",
        "Analog of the reference's available_modes() comparison loop",
        "(src/main_app.py:43; src/model/classification.py:18-40).",
        "",
        *table(models, "algo"),
        "",
        "Reference best-published (different corpus, so directional",
        "only): GS F1 95.8 / SONG F1 93.71 with RandomForest",
        "(src/comparison/result.txt:31-34,66-69; BASELINE.md).  The",
        "engine's production gate is the CLUSTER pairwise F1 >= 0.99 on",
        "planted truth (test_pipeline_f1_gate), which the full pipeline",
        "meets at 0.997.",
        "",
        "## Hard corpora: planted real-world confusions",
        "",
        "Same stack on corpora with the confusions real AND data has",
        "(`sources/datagen.py` `hardness` knob; the hardness=0 rng",
        "stream is pytest-pinned so oracle corpora are untouched):",
        "homonymous FULL given names within a block (35%*h of later",
        "same-block entities), self-introductions dropped (30%*h) or",
        "carrying surname char-swap typos (20%*h — which also corrupt",
        "derived block keys, the SONG byline-variant analog), and",
        "same-block entities drawing word cores from one small block",
        "pool, tools from one 5-tool pool, epochs around one block day",
        "— content/tool/time evidence overlapped, as for real",
        f"same-subfield homonyms.  Both corpora: {hard_n} entities /",
        f"{h_blocks} blocks (moderate h=0.5: {m_pairs} pairs;",
        f"adversarial h=1.0: {h_pairs} pairs).",
        "",
        "### Feature-group ablation (GBT, hardness=0.5)",
        "",
        *table(mgroups, "feature group"),
        "",
        "### Classifier zoo (full stack, hardness=0.5)",
        "",
        *table(mmodels, "algo"),
        "",
        "### Feature-group ablation (GBT, hardness=1.0)",
        "",
        *table(hgroups, "feature group"),
        "",
        "### Classifier zoo (full stack, hardness=1.0)",
        "",
        *table(hmodels, "algo"),
        "",
        "Reading: at hardness=0.5 the full stack lands in the",
        "reference's own published band on its real corpora (SONG",
        "full-model F1 93.7, GS 95.8, weaker baselines 76-88,",
        "result.txt) instead of saturating — the easy-corpus 0.99s",
        "measure the pipeline's ceiling, these measure its behavior",
        "when evidence conflicts.  At hardness=1.0 (every same-block",
        "entity near-indistinguishable on every axis at once — harder",
        "than any published AND corpus) it degrades, it does not",
        "collapse.  Single-group features fall much further (names are",
        "DECEPTIVE for homonyms; time goes to ~0 when epochs are",
        "shared by construction), so the full-stack margin over every",
        "ablation row is the multi-evidence design doing its job, as",
        "in the reference's exclusion study.",
        "",
        *parts["fs"]["lines"],
        "",
        *ann_lines,
        "",
        f"Generated by `python results_report.py` (section walls: {walls};"
        " sections run as concurrent processes, assembled by"
        " `--assemble`).",
    ]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "RESULTS.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    sys.exit(main())
