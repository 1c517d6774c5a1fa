"""Blocking-quality metrics: pair completeness, reduction ratio,
block-size stats — one row of evaluation for a candidate-generation
pass.

The reference evaluates its pair generator only implicitly (dual
derivations of the same pair set, database/and_datasets.sql:81-105,
plus block-count statistics, database/statistics.sql:96-245); the
record-linkage literature's standard blocking metrics make the two
quantities that actually govern an ER system explicit:

- pair completeness (blocking recall): the fraction of TRUE pairs
  that survive blocking — the hard ceiling on end-to-end recall; no
  classifier can recover a pair blocking never generated.
- reduction ratio: 1 - |candidates| / (n choose 2) — how much of the
  quadratic comparison space blocking eliminated; the cost axis.

At 10^12 turns both sides stay linear: true pairs are COUNTED from
per-entity member counts (sum m*(m-1)/2 — never materialized), and
candidate stats aggregate the already-blocked pair set.  Block-size
max/avg come from one groupBy on the signature table and are the
hot-block early-warning (a max_block_size of 10^6 means a 5*10^11-
comparison block is coming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

METRIC_COLS = [
    "n_mentions",
    "n_entities",
    "n_true_pairs",
    "n_blocks",
    "n_blocked_mentions",
    "max_block_size",
    "avg_block_size",
    "n_candidates",
    "n_matched_true",
    "pair_completeness",
    "reduction_ratio",
]


def cluster_size_stats(
    components: DataFrame,
    component_col: str = "component",
) -> DataFrame:
    """Cluster-size distribution: one row per size —
    (cluster_size, n_clusters, n_members, member_share).

    The reference publishes exactly these distribution tables for its
    own groupings (database/statistics.sql:96-266: per-field counts
    pivoted into named distribution rows); here they describe the
    OUTPUT of clustering, where the size histogram is the first thing
    an operator inspects (a sudden giant component means an FP edge
    bridged two entities — transitive closure turns one bad edge into
    a mega-cluster).  Two linear groupBys; the share denominator rides
    a broadcast 1-row total.
    """
    dist = (
        components.groupBy(component_col)
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .withColumn(
            "n_members", F.col("cluster_size") * F.col("n_clusters")
        )
    )
    total = dist.agg(
        F.coalesce(F.sum("n_members"), F.lit(0)).alias("__t")
    )
    return (
        dist.crossJoin(F.broadcast(total))
        .select(
            "cluster_size",
            "n_clusters",
            "n_members",
            F.when(
                F.col("__t") > 0,
                F.round(F.col("n_members") / F.col("__t"), 6),
            ).alias("member_share"),
        )
        .orderBy("cluster_size")
    )


def threshold_sweep(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "same_entity",
    n_bins: int = 20,
) -> DataFrame:
    """Precision/recall/F1 at every threshold i/n_bins (i = 0..n-1) in
    ONE aggregation pass — the operating-curve table behind a match-
    probability bar.

    The reference evaluates at the single fixed cut its sklearn
    defaults give it (src/model/classification.py predict -> 0.5); an
    operator choosing the bar for a precision target needs the whole
    curve.  Computing it naively is n_bins passes over the pair table;
    here scores histogram into n_bins buckets (one groupBy with
    map-side partial agg — the ONLY pass over the data), and
    cumulative sums from the top bucket down convert the histogram
    into TP/PP at every threshold.  The window runs over n_bins
    post-aggregation rows (a single tiny task by construction — this
    is the one place an unpartitioned window is correct); the grid
    left-join guarantees exactly n_bins output rows even when buckets
    are empty.

    Scores are clamped into [0, 1); a score of exactly 1.0 counts in
    the top bucket.  ``threshold`` row i reads: classify score >=
    i/n_bins as a match.
    """
    from pyspark.sql import Window as W

    b = F.greatest(
        F.least(
            F.floor(F.col(score_col) * n_bins).cast("int"),
            F.lit(n_bins - 1),
        ),
        F.lit(0),
    )
    hist = (
        scored.select(
            b.alias("bucket"), F.col(label_col).cast("long").alias("__y")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("__y").alias("__pos"))
    )
    grid = scored.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bucket")
    )
    hist = (
        grid.join(hist, "bucket", "left")
        .withColumn("__n", F.coalesce("__n", F.lit(0)))
        .withColumn("__pos", F.coalesce("__pos", F.lit(0)))
    )
    w = W.orderBy(F.desc("bucket")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = hist.withColumn("pp", F.sum("__n").over(w)).withColumn(
        "tp", F.sum("__pos").over(w)
    )
    totals = hist.agg(F.coalesce(F.sum("__pos"), F.lit(0)).alias("__P"))
    # zero_division=0 convention (sklearn): an empty predicted-positive
    # or empty true-positive set scores 0.0, never NULL — downstream
    # sorts/joins on the curve stay total-ordered.
    prec = F.when(F.col("pp") > 0, F.col("tp") / F.col("pp")).otherwise(0.0)
    rec = F.when(F.col("__P") > 0, F.col("tp") / F.col("__P")).otherwise(0.0)
    # 2TP/(2TP+FP+FN) == 2TP/(PP+P)
    f1 = F.when(
        (F.col("pp") > 0) & (F.col("__P") > 0),
        2 * F.col("tp") / (F.col("pp") + F.col("__P")),
    ).otherwise(0.0)
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            F.round(F.col("bucket") / n_bins, 6).alias("threshold"),
            F.col("tp").cast("long").alias("tp"),
            (F.col("pp") - F.col("tp")).cast("long").alias("fp"),
            (F.col("__P") - F.col("tp")).cast("long").alias("fn"),
            F.round(prec, 6).alias("precision"),
            F.round(rec, 6).alias("recall"),
            F.round(f1, 6).alias("f1"),
        )
        .orderBy("threshold")
    )


def progressive_recall(
    scored: DataFrame,
    n_steps: int = 10,
    score_col: str = "score",
    label_col: str = "same_entity",
    id1_col: str = "mention_id1",
    id2_col: str = "mention_id2",
) -> DataFrame:
    """Progressive-ER recall curve (Whang et al., ICDE'13 pay-as-you-go
    ER): resolve candidate pairs in SCORE order and report, at each
    review budget i/n_steps of the pair table, how much recall that
    budget has already bought — plus precision inside the examined
    prefix and lift over random order (recall / effort; a perfect
    front-loader starts at lift N/P, random order sits at 1.0).

    ``threshold_sweep`` answers "what does cut t buy"; this answers
    the operational sibling "what do my FIRST k reviews buy" — the
    curve a triage team sizing a budget (or an incremental resolver
    deciding when to stop) actually reads.  The reference resolves
    everything unconditionally (its full pairwise sweep,
    src/model/classification.py); a 10^12-pair table cannot.

    Rank is EXACT and total — (score DESC, id1, id2) — but never
    computed as one global-order window (a single-partition sort at
    scale).  Two-level decomposition instead: a per-distinct-score
    histogram (one map-side-combined groupBy) turns into cumulative
    offsets via a window over the DISTINCT-SCORE table only (tiny by
    construction: round-6 scores from a k-feature model take at most
    2^k values), and a second window partitioned BY SCORE ranks ties
    by (id1, id2) in parallel.  rank = bucket offset + tie rank; the
    per-pair shuffle is one hash exchange on the score column.  Skew
    bound: the largest tie group (one distinct score) caps a
    partition, the usual salting escape applies if a degenerate
    scorer emits one constant.

    Cut ranks are integer-exact: k_i = ceil(i*N/n_steps) via integer
    div, so DuckDB re-derives every examined count, cumulative TP,
    and round-6 ratio bit-for-bit.  Empty input -> empty curve.
    """
    from pyspark.sql import Window as W

    base = scored.select(
        F.round(F.col(score_col), 6).alias("__s"),
        F.col(label_col).cast("long").alias("__y"),
        F.col(id1_col).alias("__i1"),
        F.col(id2_col).alias("__i2"),
    )
    hist = base.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__y").alias("__p")
    )
    prior = W.orderBy(F.desc("__s")).rowsBetween(
        W.unboundedPreceding, -1
    )
    offs = hist.select(
        "__s",
        F.coalesce(F.sum("__n").over(prior), F.lit(0)).alias("__off_n"),
        F.coalesce(F.sum("__p").over(prior), F.lit(0)).alias("__off_p"),
    )
    ties = W.partitionBy("__s").orderBy("__i1", "__i2")
    ranked = (
        base.join(offs, "__s")
        .withColumn(
            "__rank", F.col("__off_n") + F.row_number().over(ties)
        )
        .withColumn(
            "__ctp",
            F.col("__off_p")
            + F.sum("__y").over(
                ties.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
    )
    totals = base.agg(
        F.count(F.lit(1)).alias("__N"),
        F.coalesce(F.sum("__y"), F.lit(0)).alias("__P"),
    )
    cuts = (
        scored.sparkSession.range(1, n_steps + 1)
        .select(F.col("id").cast("int").alias("__i"))
        .crossJoin(F.broadcast(totals))
        .select(
            "__i",
            "__N",
            "__P",
            F.expr(f"(__i * __N + {n_steps} - 1) DIV {n_steps}").alias(
                "__k"
            ),
        )
    )
    rec = F.when(
        F.col("__P") > 0, F.col("__ctp") / F.col("__P")
    ).otherwise(0.0)
    prec = F.col("__ctp") / F.col("__k")
    lift = F.when(
        F.col("__P") > 0,
        (F.col("__ctp") / F.col("__P"))
        / (F.col("__k") * F.lit(1.0) / F.col("__N")),
    ).otherwise(0.0)
    return (
        cuts.join(ranked, cuts["__k"] == ranked["__rank"])
        .select(
            F.round(F.col("__i") / n_steps, 6).alias("effort_frac"),
            F.col("__k").cast("long").alias("examined"),
            F.col("__ctp").cast("long").alias("tp"),
            F.round(rec, 6).alias("recall"),
            F.round(prec, 6).alias("precision"),
            F.round(lift, 6).alias("lift"),
        )
        .orderBy("effort_frac")
    )


def subsample_f1_ci(
    decisions: DataFrame,
    n_replicates: int = 16,
    pred_col: str = "decision",
    link_value: str = "link",
    label_col: str = "same_entity",
    id1_col: str = "mention_id1",
    id2_col: str = "mention_id2",
) -> DataFrame:
    """Half-sample subsampling distribution of pairwise P/R/F1
    (Politis & Romano 1994 m-out-of-n subsampling, m = n/2): how much
    the headline F1 moves when half the evaluation pairs are removed —
    the uncertainty band the reference's single point estimate
    (src/model/classification.py) never reports.  A linkage F1 quoted
    as 0.95 on 400 labeled pairs and one quoted on 4M are different
    claims; the replicate spread is what separates them.

    Replicate membership is a pure function of (id1, id2, replicate)
    via the first md5 hex char (< '8' keeps exactly half the hash
    space) — no RNG state, so the table is identical across engines,
    runs, and partitionings, and DuckDB re-derives every replicate's
    confusion counts bit-for-bit.  Scale: one map-side explode by
    n_replicates (a constant), conditional-sum partial aggregation in
    the same pass, and a shuffle of n_replicates rows per partition —
    no join, no per-replicate pass over the pair table.

    Emits one row per replicate (n_kept, tp, fp, fn, precision,
    recall, f1 — zero_division=0 conventions as ``threshold_sweep``);
    quantiles are the caller's two-line fold over <= n_replicates
    rows.
    """
    rep = F.explode(
        F.sequence(F.lit(0), F.lit(n_replicates - 1))
    ).alias("replicate")
    keep = (
        F.substring(
            F.md5(
                F.concat_ws(
                    "#",
                    F.col(id1_col),
                    F.col(id2_col),
                    F.col("replicate").cast("string"),
                )
            ),
            1,
            1,
        )
        < "8"
    )
    pred = (F.col(pred_col) == link_value).cast("int")
    y = F.col(label_col).cast("int")
    agg = (
        decisions.select(pred.alias("__pred"), y.alias("__y"), id1_col, id2_col, rep)
        .filter(keep)
        .groupBy("replicate")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(F.col("__pred") * F.col("__y")).alias("tp"),
            F.sum(F.col("__pred") * (1 - F.col("__y"))).alias("fp"),
            F.sum((1 - F.col("__pred")) * F.col("__y")).alias("fn"),
        )
    )
    # grid left-join: exactly n_replicates rows even if a replicate
    # keeps no pairs (possible only on tiny inputs, but row count must
    # be a constant of the call, not of the data)
    grid = decisions.sparkSession.range(n_replicates).select(
        F.col("id").cast("int").alias("replicate")
    )
    agg = grid.join(agg, "replicate", "left").fillna(
        0, subset=["n_kept", "tp", "fp", "fn"]
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    ).otherwise(0.0)
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    ).otherwise(0.0)
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
    ).otherwise(0.0)
    return agg.select(
        F.col("replicate").cast("int").alias("replicate"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("replicate")


def cluster_agreement_metrics(
    assignments: DataFrame,
    cluster_col: str = "cluster",
    truth_col: str = "entity_id",
) -> DataFrame:
    """One-row extrinsic clustering evaluation: B-cubed P/R/F1 plus
    V-measure (homogeneity / completeness) of a predicted clustering
    against gold entity labels.

    The reference evaluates ONLY pairwise P/R/F1 at a fixed cut
    (src/model/classification.py); pairwise F1 is blind to the failure
    transitive closure actually produces — one false edge welds two
    entities into a mega-cluster yet costs just the cross pairs.  The
    two standard cluster-level metrics close that blind spot:

    - B-cubed (Bagga & Baldwin 1998): per-mention precision
      |C(i)∩L(i)|/|C(i)| and recall |C(i)∩L(i)|/|L(i)|, averaged.
      Mega-clusters crater per-member precision in proportion to how
      many mentions they swallow.
    - V-measure (Rosenberg & Hirschberg 2007): homogeneity
      1 − H(E|C)/H(E) and completeness 1 − H(C|E)/H(C), harmonically
      combined — the information-theoretic view of the same trade.

    Both reduce to sums over the (cluster, entity) contingency CELLS:
    B³P = Σ n_ce²/n_c / N, B³R = Σ n_ce²/n_e / N,
    H(E|C) = −Σ n_ce·ln(n_ce/n_c) / N, H(E) = ln N − Σ n_e·ln(n_e) / N
    (symmetrically for C).  At 10^12 mentions the cell table is the
    only large intermediate, built by ONE groupBy with map-side
    partial agg; marginals are groupBys OF THE CELLS (already tiny),
    and the marginal joins re-use the cells' hash partitioning.  No
    per-mention pair expansion anywhere — B-cubed via cells is O(cells),
    not O(Σ cluster²).

    Degenerate-case conventions match sklearn's homogeneity_
    completeness_v_measure: a zero-entropy gold (or predicted)
    partition scores homogeneity (completeness) 1.0; v = 0.0 when
    h + c == 0; an empty input yields one all-zero row.
    """
    cells = assignments.groupBy(cluster_col, truth_col).agg(
        F.count(F.lit(1)).alias("n_ce")
    )
    cl = cells.groupBy(cluster_col).agg(F.sum("n_ce").alias("n_c"))
    en = cells.groupBy(truth_col).agg(F.sum("n_ce").alias("n_e"))
    j = cells.join(cl, cluster_col).join(en, truth_col)
    sums = j.agg(
        F.coalesce(F.sum("n_ce"), F.lit(0)).alias("n"),
        F.sum(F.col("n_ce") * F.col("n_ce") / F.col("n_c")).alias("sp"),
        F.sum(F.col("n_ce") * F.col("n_ce") / F.col("n_e")).alias("sr"),
        F.sum(F.col("n_ce") * F.log(F.col("n_ce") / F.col("n_c"))).alias(
            "lec"
        ),
        F.sum(F.col("n_ce") * F.log(F.col("n_ce") / F.col("n_e"))).alias(
            "lce"
        ),
    )
    cl_sum = cl.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("n_c") * F.log("n_c")).alias("c_ln"),
    )
    en_sum = en.agg(
        F.count(F.lit(1)).alias("n_entities"),
        F.sum(F.col("n_e") * F.log("n_e")).alias("e_ln"),
    )
    row = sums.crossJoin(F.broadcast(cl_sum)).crossJoin(F.broadcast(en_sum))
    n = F.col("n")
    bp = F.when(n > 0, F.col("sp") / n).otherwise(0.0)
    br = F.when(n > 0, F.col("sr") / n).otherwise(0.0)
    bf = F.when(
        (F.col("sp") + F.col("sr")) > 0,
        2 * (F.col("sp") / n) * (F.col("sr") / n)
        / (F.col("sp") / n + F.col("sr") / n),
    ).otherwise(0.0)
    h_e = F.log(n) - F.col("e_ln") / n  # gold-partition entropy H(E)
    h_c = F.log(n) - F.col("c_ln") / n
    h_e_c = -F.col("lec") / n  # conditional H(E|C)
    h_c_e = -F.col("lce") / n
    hom = F.when(n <= 0, 0.0).otherwise(
        F.when(h_e > 0, F.lit(1.0) - h_e_c / h_e).otherwise(1.0)
    )
    com = F.when(n <= 0, 0.0).otherwise(
        F.when(h_c > 0, F.lit(1.0) - h_c_e / h_c).otherwise(1.0)
    )
    v = F.when((hom + com) > 0, 2 * hom * com / (hom + com)).otherwise(0.0)
    return row.select(
        n.cast("long").alias("n_items"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
        F.col("n_entities").cast("long").alias("n_entities"),
        F.round(bp, 6).alias("bcubed_precision"),
        F.round(br, 6).alias("bcubed_recall"),
        F.round(bf, 6).alias("bcubed_f1"),
        F.round(hom, 6).alias("homogeneity"),
        F.round(com, 6).alias("completeness"),
        F.round(v, 6).alias("v_measure"),
    )


def merge_distance_metrics(
    assignments: DataFrame,
    cluster_col: str = "cluster",
    truth_col: str = "entity_id",
) -> DataFrame:
    """One-row EDIT-DISTANCE view of clustering error: generalized
    merge distance (GMD, Menestrina/Whang/Garcia-Molina VLDB 2010)
    with unit costs, plus variation of information (Meilă 2003).

    The score metrics (pairwise F1, B-cubed, V-measure — q63/q76)
    say HOW WRONG a clustering is; GMD says HOW MUCH WORK fixes it —
    the minimum number of cluster split + merge operations turning
    the predicted partition into truth, which is exactly the clerical
    workload a repair queue drains.  With unit costs the optimum
    decomposes per contingency cell: a predicted cluster spanning k
    gold entities needs k−1 splits (cut it into its pure fragments);
    a gold entity scattered over m fragments needs m−1 merges.  VI =
    H(truth|pred) + H(pred|truth) is the metric-space companion (a
    true metric on partitions, unlike F1), normalized here by ln N to
    [0, 1] for cross-corpus comparison.

    Same O(cells) skeleton as ``cluster_agreement_metrics``: ONE
    (cluster, entity) groupBy with map-side partial agg builds the
    cells; splits/merges are groupBys OF the cells (distinct-partner
    counts per marginal); no per-member pair expansion anywhere, so
    the plan holds at 10^12 mentions.  Empty input yields one all-zero
    row; integer outputs are exact, floats round-6 on both engines.
    """
    cells = assignments.groupBy(cluster_col, truth_col).agg(
        F.count(F.lit(1)).alias("n_ce")
    )
    cl = cells.groupBy(cluster_col).agg(
        F.sum("n_ce").alias("n_c"), F.count(F.lit(1)).alias("k_c")
    )
    en = cells.groupBy(truth_col).agg(
        F.sum("n_ce").alias("n_e"), F.count(F.lit(1)).alias("k_e")
    )
    j = cells.join(cl, cluster_col).join(en, truth_col)
    sums = j.agg(
        F.coalesce(F.sum("n_ce"), F.lit(0)).alias("n"),
        F.sum(F.col("n_ce") * F.log(F.col("n_ce") / F.col("n_c"))).alias(
            "lec"
        ),
        F.sum(F.col("n_ce") * F.log(F.col("n_ce") / F.col("n_e"))).alias(
            "lce"
        ),
    )
    cl_sum = cl.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.coalesce(F.sum(F.col("k_c") - 1), F.lit(0)).alias("n_splits"),
    )
    en_sum = en.agg(
        F.count(F.lit(1)).alias("n_entities"),
        F.coalesce(F.sum(F.col("k_e") - 1), F.lit(0)).alias("n_merges"),
    )
    row = sums.crossJoin(F.broadcast(cl_sum)).crossJoin(F.broadcast(en_sum))
    n = F.col("n")
    vi = F.when(
        n > 0, -F.col("lec") / n - F.col("lce") / n
    ).otherwise(F.lit(0.0))
    vi_norm = F.when(n > 1, vi / F.log(n)).otherwise(F.lit(0.0))
    return row.select(
        n.cast("long").alias("n_items"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
        F.col("n_entities").cast("long").alias("n_entities"),
        F.col("n_splits").cast("long").alias("n_splits"),
        F.col("n_merges").cast("long").alias("n_merges"),
        (F.col("n_splits") + F.col("n_merges")).cast("long").alias("gmd"),
        F.round(vi, 6).alias("vi"),
        F.round(vi_norm, 6).alias("vi_norm"),
    )


def calibration_table(
    scored: DataFrame,
    score_col: str = "llr",
    label_col: str = "same_entity",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table + Brier/ECE for a pair scorer: is the score
    an honest probability?

    The reference thresholds classifier scores at sklearn's fixed 0.5
    (src/model/classification.py predict) and never asks whether 0.8
    MEANS an 80% match chance — but every downstream consumer of an
    ER score (the q84 review queue's uncertainty ordering, the q100
    waterfall's tier cut, a human setting a precision bar) implicitly
    assumes calibration.  This operator converts Fellegi-Sunter
    log-likelihood ratios to posterior probabilities via the labeled
    prior odds (p = 1 / (1 + 2^{-(llr + log2(prior_odds))}) — exact
    Bayes under the FS independence model), bins pairs by predicted
    probability, and reports per-bin predicted-vs-empirical match
    rate plus the two standard scalar summaries: Brier score (mean
    squared error of p against the 0/1 label) and expected
    calibration error (bin-size-weighted |empirical − predicted|).

    Determinism contract: per-pair posteriors are rounded to 6
    decimals BEFORE any aggregation so both engines bin identical
    values; per-bin rates are rounded before the gap/ECE arithmetic,
    making ECE a pure function of the (already engine-exact) bin
    table.  Scale: one global 1-row prior (broadcast), one
    map-side-combining groupBy on the bin index, and a 1-row summary
    crossJoin — O(pairs) with nothing driver-side, so the plan is
    unchanged at 10^12 scored pairs.
    """
    y = F.col(label_col).cast("int")
    tot = scored.agg(
        F.coalesce(F.sum(y), F.lit(0)).alias("nm"),
        F.coalesce(F.sum(1 - y), F.lit(0)).alias("nn"),
    )
    lpo = F.when(
        (F.col("nm") > 0) & (F.col("nn") > 0),
        F.round(F.log2(F.col("nm") / F.col("nn")), 6),
    ).otherwise(F.lit(0.0))
    base = scored.crossJoin(F.broadcast(tot.select(lpo.alias("lpo"))))
    p = F.round(
        F.lit(1.0)
        / (
            F.lit(1.0)
            + F.pow(F.lit(2.0), -(F.col(score_col) + F.col("lpo")))
        ),
        6,
    )
    w = base.select(
        F.least(
            F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1)
        ).alias("bin"),
        p.alias("p"),
        y.alias("y"),
    )
    bins = (
        w.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("y").alias("n_match"),
            F.sum("p").alias("__sp"),
            F.sum((F.col("p") - F.col("y")) ** 2).alias("__sq"),
        )
        .select(
            "bin",
            "n_pairs",
            "n_match",
            F.round(F.col("n_match") / F.col("n_pairs"), 6).alias(
                "match_rate"
            ),
            F.round(F.col("__sp") / F.col("n_pairs"), 6).alias("avg_post"),
            F.col("__sq"),
        )
        .withColumn(
            "gap",
            F.round(F.abs(F.col("match_rate") - F.col("avg_post")), 6),
        )
    )
    glob = bins.agg(
        F.round(F.sum("__sq") / F.sum("n_pairs"), 6).alias("brier"),
        F.round(
            F.sum(F.col("n_pairs") * F.col("gap")) / F.sum("n_pairs"), 6
        ).alias("ece"),
    )
    return (
        bins.crossJoin(F.broadcast(glob))
        .select(
            "bin",
            "n_pairs",
            "n_match",
            "match_rate",
            "avg_post",
            "gap",
            "brier",
            "ece",
        )
        .orderBy("bin")
    )


def fs_weights(
    pairs: DataFrame,
    agreement_cols: list[str],
    label_col: str = "same_entity",
    eps: float = 1e-6,
) -> DataFrame:
    """Fellegi-Sunter m/u probabilities and log2 match weights, one row
    per agreement feature, from labeled candidate pairs.

    The canonical probabilistic record-linkage model (Fellegi & Sunter
    1969; the estimator every Splink-style linker ships) that the
    reference's train-a-classifier approach skips entirely: for each
    binary agreement pattern, m = P(agree | match) and
    u = P(agree | non-match), and the evidence a comparison contributes
    is log2(m/u) on agreement, log2((1-m)/(1-u)) on disagreement —
    directly interpretable bits of evidence, summable across
    independent features into a match score with no model fit.

    One generator projection (``stack`` — rows multiply by
    len(agreement_cols), columns shrink to 3) feeds ONE groupBy on the
    feature name with map-side partial aggregation; nothing else
    touches the pair table, so at 10^12 candidate pairs this costs a
    single pass and a |features|-row shuffle.

    Probabilities are clamped into [eps, 1-eps] BEFORE the log-ratios
    (the standard smoothing for never-observed patterns), so weights
    are always finite and defined — division-by-zero can't arise even
    under ANSI mode, and an empty class yields the maximally-smoothed
    eps rather than NULL.
    """
    n = len(agreement_cols)
    stack = "stack({}, {}) as (feature, agree)".format(
        n,
        ", ".join(f"'{c}', cast(`{c}` as int)" for c in agreement_cols),
    )
    long = pairs.selectExpr(stack, f"cast(`{label_col}` as int) as __y")
    agg = long.groupBy("feature").agg(
        F.sum("__y").cast("long").alias("n_match"),
        F.sum(1 - F.col("__y")).cast("long").alias("n_nonmatch"),
        F.sum(F.col("agree") * F.col("__y")).cast("long").alias(
            "agree_match"
        ),
        F.sum(F.col("agree") * (1 - F.col("__y"))).cast("long").alias(
            "agree_nonmatch"
        ),
    )
    lo, hi = F.lit(eps), F.lit(1.0 - eps)

    def clamp(num, den):
        raw = F.when(den > 0, num / den).otherwise(lo)
        return F.greatest(F.least(raw, hi), lo)

    m = clamp(F.col("agree_match"), F.col("n_match"))
    u = clamp(F.col("agree_nonmatch"), F.col("n_nonmatch"))
    return agg.select(
        "feature",
        "n_match",
        "n_nonmatch",
        "agree_match",
        "agree_nonmatch",
        F.round(m, 6).alias("m_prob"),
        F.round(u, 6).alias("u_prob"),
        F.round(F.log2(m / u), 6).alias("match_weight"),
        F.round(F.log2((F.lit(1.0) - m) / (F.lit(1.0) - u)), 6).alias(
            "disagree_weight"
        ),
    ).orderBy("feature")


def transitive_conflicts(
    scored: DataFrame,
    threshold: float,
    id1_col: str = "mention_id1",
    id2_col: str = "mention_id2",
    score_col: str = "score",
) -> DataFrame:
    """Pairs welded ONLY by transitive closure: both endpoints land in
    the same connected component of the >= threshold match graph, yet
    their own direct score is < threshold.

    Transitive closure is where ER goes wrong at scale — one false
    edge merges two entities, and pairwise metrics barely notice (the
    reference never audits its closure; it stops at pairwise labels,
    src/model/classification.py).  This diagnostic materializes
    exactly the pairs the closure asserts beyond their direct
    evidence: joined with truth labels they split into transitivity's
    recall wins (true pairs a weak feature missed) and its welds
    (false merges to cut).  Cost: the real large-star/small-star CC
    over the thresholded edges, then two hash joins of the sub-
    threshold pairs against the (id, component) table — no pair
    expansion beyond the candidate set that already exists.

    Returns (id1, id2, component, score + every other column of
    ``scored``) for conflicting pairs only.
    """
    from pubmed_and_method_spark.operators.connected_components import (
        connected_components,
    )

    edges = scored.filter(F.col(score_col) >= threshold).select(
        F.col(id1_col).alias("u"), F.col(id2_col).alias("v")
    )
    comp = connected_components(edges)
    c1 = comp.select(
        F.col("id").alias(id1_col), F.col("component").alias("__c1")
    )
    c2 = comp.select(
        F.col("id").alias(id2_col), F.col("component").alias("__c2")
    )
    return (
        scored.filter(F.col(score_col) < threshold)
        .join(c1, id1_col)
        .join(c2, id2_col)
        .filter(F.col("__c1") == F.col("__c2"))
        .withColumn("component", F.col("__c1"))
        .drop("__c1", "__c2")
    )


def fs_em(
    pairs: DataFrame,
    agreement_cols: list[str],
    n_iter: int = 5,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.1,
    eps: float = 1e-6,
) -> DataFrame:
    """UNSUPERVISED Fellegi-Sunter parameter estimation by EM over the
    agreement-pattern histogram — m/u probabilities and log2 evidence
    weights per feature with NO labels, the estimator at the core of
    every Splink-style production linker.

    ``fs_weights`` needs truth labels; real linkage jobs rarely have
    them.  EM exploits that the pair population is a two-component
    mixture (matches / non-matches): E-step scores each agreement
    pattern's match responsibility under naive-Bayes independence,
    M-step re-estimates per-feature m_j, u_j and the match prevalence
    λ from the responsibility-weighted counts.

    Scale shape: the pair table is touched EXACTLY ONCE — a groupBy on
    the k agreement flags (map-side partial agg) reduces 10^12 pairs
    to at most 2^k pattern rows.  EM then iterates on that tiny
    histogram driver-side (k=6 → ≤64 rows; this is the 2-row
    class-count precedent, not a driver bottleneck).  Patterns are
    summed in sorted order and every iteration's parameters are
    clamped to [eps, 1-eps] and rounded to 12 decimals — a
    deterministic sync point that makes the trajectory reproducible
    bit-for-bit across engines and summation orders (the DuckDB oracle
    re-runs the same unrolled iterations and must land on identical
    round-6 outputs).

    Returns one row per feature: (feature, m_prob, u_prob,
    match_weight, disagree_weight, lambda_match), λ repeated on every
    row, all round-6.
    """
    import math

    k = len(agreement_cols)
    hist = (
        pairs.groupBy(
            *[F.col(c).cast("int").alias(c) for c in agreement_cols]
        )
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    # sorted pattern order => deterministic summation order
    pats = sorted(
        (tuple(int(r[c]) for c in agreement_cols), int(r["__n"]))
        for r in hist
    )

    def sync(x: float) -> float:
        return round(min(max(x, eps), 1.0 - eps), 12)

    m = [sync(init_m)] * k
    u = [sync(init_u)] * k
    lam = sync(init_lambda)
    for _ in range(n_iter):
        sw = swc = 0.0
        sma = [0.0] * k
        sua = [0.0] * k
        n_tot = 0
        for a, n in pats:
            pm = lam
            pu = 1.0 - lam
            for j in range(k):
                pm *= m[j] if a[j] else 1.0 - m[j]
                pu *= u[j] if a[j] else 1.0 - u[j]
            w = pm / (pm + pu)
            sw += w * n
            swc += (1.0 - w) * n
            n_tot += n
            for j in range(k):
                if a[j]:
                    sma[j] += w * n
                    sua[j] += (1.0 - w) * n
        lam = sync(sw / n_tot) if n_tot else sync(init_lambda)
        m = [sync(sma[j] / sw) if sw > 0 else m[j] for j in range(k)]
        u = [sync(sua[j] / swc) if swc > 0 else u[j] for j in range(k)]
    rows = [
        (
            c,
            round(m[j], 6),
            round(u[j], 6),
            round(math.log2(m[j] / u[j]), 6),
            round(math.log2((1.0 - m[j]) / (1.0 - u[j])), 6),
            round(lam, 6),
        )
        for j, c in enumerate(agreement_cols)
    ]
    return pairs.sparkSession.createDataFrame(
        rows,
        "feature string, m_prob double, u_prob double,"
        " match_weight double, disagree_weight double,"
        " lambda_match double",
    ).orderBy("feature")


def fs_em_missing(
    pairs: DataFrame,
    agreement_cols: list[str],
    n_iter: int = 5,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.1,
    eps: float = 1e-6,
) -> DataFrame:
    """``fs_em`` with a third comparison state: MISSING (value ``-1``,
    the X15 sentinel discipline) — the fastLink extension (Enamorado,
    Fifield & Imai, APSR 2019) of the Splink-core estimator.

    ``fs_em`` forces every comparison to agree/disagree, so a pair
    where one side simply HAS no tools (or no content tokens) counts
    as hard disagreement and drags u up / m down for everyone.  Under
    missing-at-random the right treatment is that a missing comparison
    carries NO evidence: it contributes factor 1 to both class
    likelihoods in the E-step, and drops out of that feature's M-step
    numerator AND denominator (per-feature denominators over the
    NON-missing responsibility mass only; prevalence λ still averages
    over all pairs).

    Same scale shape as ``fs_em``: one groupBy over the k three-state
    flags (≤ 3^k pattern rows; k=6 → ≤ 729), EM iterates driver-side
    with the identical clamp-to-[eps,1-eps] + round-12 sync each step,
    patterns summed in sorted order.

    Returns one row per feature: (feature, m_prob, u_prob,
    match_weight, disagree_weight, missing_share, lambda_match) —
    ``missing_share`` is the fraction of pairs where the comparison
    was missing (a data property, computed once, round-6).
    """
    import math

    k = len(agreement_cols)
    hist = (
        pairs.groupBy(
            *[F.col(c).cast("int").alias(c) for c in agreement_cols]
        )
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    pats = sorted(
        (tuple(int(r[c]) for c in agreement_cols), int(r["__n"]))
        for r in hist
    )
    bad = {v for a, _ in pats for v in a} - {-1, 0, 1}
    if bad:
        raise ValueError(
            f"agreement values must be -1/0/1, got extras {sorted(bad)}"
        )

    def sync(x: float) -> float:
        return round(min(max(x, eps), 1.0 - eps), 12)

    m = [sync(init_m)] * k
    u = [sync(init_u)] * k
    lam = sync(init_lambda)
    n_tot = sum(n for _, n in pats)
    miss_share = [
        round(
            sum(n for a, n in pats if a[j] == -1) / n_tot if n_tot else 0.0,
            6,
        )
        for j in range(k)
    ]
    for _ in range(n_iter):
        sw = 0.0
        sma = [0.0] * k
        sua = [0.0] * k
        dm = [0.0] * k
        du = [0.0] * k
        for a, n in pats:
            pm = lam
            pu = 1.0 - lam
            for j in range(k):
                if a[j] == 1:
                    pm *= m[j]
                    pu *= u[j]
                elif a[j] == 0:
                    pm *= 1.0 - m[j]
                    pu *= 1.0 - u[j]
                # a[j] == -1: no evidence, factor 1 for both classes
            w = pm / (pm + pu)
            sw += w * n
            for j in range(k):
                if a[j] != -1:
                    dm[j] += w * n
                    du[j] += (1.0 - w) * n
                    if a[j] == 1:
                        sma[j] += w * n
                        sua[j] += (1.0 - w) * n
        lam = sync(sw / n_tot) if n_tot else sync(init_lambda)
        m = [sync(sma[j] / dm[j]) if dm[j] > 0 else m[j] for j in range(k)]
        u = [sync(sua[j] / du[j]) if du[j] > 0 else u[j] for j in range(k)]
    rows = [
        (
            c,
            round(m[j], 6),
            round(u[j], 6),
            round(math.log2(m[j] / u[j]), 6),
            round(math.log2((1.0 - m[j]) / (1.0 - u[j])), 6),
            miss_share[j],
            round(lam, 6),
        )
        for j, c in enumerate(agreement_cols)
    ]
    return pairs.sparkSession.createDataFrame(
        rows,
        "feature string, m_prob double, u_prob double,"
        " match_weight double, disagree_weight double,"
        " missing_share double, lambda_match double",
    ).orderBy("feature")


def fs_classify(
    pairs: DataFrame,
    weights: dict[str, tuple[float, float]],
    upper: float,
    lower: float,
    score_alias: str = "llr",
) -> DataFrame:
    """The Fellegi-Sunter decision rule: score every pair by its total
    log2 evidence and classify into the theory's THREE classes —
    'link' (score >= upper), 'nonlink' (score <= lower), and the
    'possible' clerical-review band between them that makes FS more
    than a thresholded classifier.

    ``weights`` maps each binary agreement column to its
    (match_weight, disagree_weight) pair, as estimated by
    ``fs_weights`` (supervised) or ``fs_em`` (label-free).  The model
    is TINY (a handful of floats), so it is baked into the plan as
    literals — the score is a pure codegen projection with no join, no
    broadcast relation, no shuffle; at 10^12 pairs this adds zero
    exchanges to whatever produced the pairs.  Appends
    ``score_alias`` (round-6) and ``decision`` to the input columns.
    """
    terms = [
        F.when(F.col(c).cast("int") == 1, F.lit(mw)).otherwise(F.lit(dw))
        for c, (mw, dw) in weights.items()
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    score = F.round(total, 6)
    return pairs.withColumn(score_alias, score).withColumn(
        "decision",
        F.when(score >= upper, "link")
        .when(score <= lower, "nonlink")
        .otherwise("possible"),
    )


def blocking_quality(
    signatures: DataFrame,
    labeled_pairs: DataFrame,
    truth: DataFrame,
    unblocked_key: str = "__unblocked__",
) -> DataFrame:
    """One-row blocking evaluation.

    ``signatures``: one row per mention with ``block_key`` (the
    ``unblocked_key`` sentinel marks mentions no exact block covers).
    ``labeled_pairs``: the candidate pairs WITH planted labels
    (``same_entity`` 0/1, as built by ``plans.pipeline
    .build_labeled_pairs``).  ``truth``: (conv_id, entity_id) gold.

    Every aggregate is a distributed groupBy/agg; the four one-row
    summaries are cross-joined at the end (literally free).
    """
    sig_agg = signatures.agg(F.count(F.lit(1)).alias("n_mentions"))
    block_agg = (
        signatures.filter(F.col("block_key") != unblocked_key)
        .groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.coalesce(F.sum("sz"), F.lit(0)).alias("n_blocked_mentions"),
            F.coalesce(F.max("sz"), F.lit(0)).alias("max_block_size"),
            F.round(F.coalesce(F.avg("sz"), F.lit(0.0)), 6).alias(
                "avg_block_size"
            ),
        )
    )
    truth_agg = (
        truth.groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("m"))
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.coalesce(
                F.sum(F.col("m") * (F.col("m") - F.lit(1))), F.lit(0)
            ).alias("tp2"),
        )
        # integer `div`, not float /: exact past 2^53 true pairs
        .select("n_entities", F.expr("tp2 div 2").alias("n_true_pairs"))
    )
    pair_agg = labeled_pairs.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.coalesce(F.sum("same_entity"), F.lit(0))
        .cast("long")
        .alias("n_matched_true"),
    )
    row = sig_agg.crossJoin(block_agg).crossJoin(truth_agg).crossJoin(pair_agg)
    total_pairs = (
        F.col("n_mentions") * (F.col("n_mentions") - F.lit(1)) / F.lit(2)
    )
    return row.select(
        "n_mentions",
        "n_entities",
        "n_true_pairs",
        "n_blocks",
        "n_blocked_mentions",
        "max_block_size",
        "avg_block_size",
        "n_candidates",
        "n_matched_true",
        F.when(
            F.col("n_true_pairs") > 0,
            F.round(F.col("n_matched_true") / F.col("n_true_pairs"), 6),
        ).alias("pair_completeness"),
        F.when(
            F.col("n_mentions") > 1,
            F.round(F.lit(1.0) - F.col("n_candidates") / total_pairs, 6),
        ).alias("reduction_ratio"),
    )


def pair_counting_metrics(
    assignments: DataFrame,
    cluster_col: str = "cluster",
    truth_col: str = "entity_id",
) -> DataFrame:
    """One-row PAIR-COUNTING clustering evaluation: Rand index,
    adjusted Rand index (Hubert & Arabie 1985), Fowlkes-Mallows, and
    the raw pairwise precision/recall it decomposes into.

    Completes the extrinsic-evaluation triad next to
    ``cluster_agreement_metrics``: the reference reports pairwise
    P/R/F1 at one cut (src/model/classification.py), B-cubed/V-measure
    (q63) add the per-mention and information-theoretic views, and the
    pair-counting family here is the third standard lens — ARI is the
    chance-CORRECTED agreement (raw Rand saturates near 1.0 on any
    fine partition; ARI is 0 in expectation under random labels, so it
    is the number to compare across blocking schemes with different
    granularities).

    Everything reduces to four exact integer pair counts derived from
    the same (cluster, entity) contingency cells as q63 — one groupBy
    with map-side partial agg over the mention table, then groupBys OF
    THE CELLS; no per-member pair expansion, O(cells) at 10^12
    mentions:

      tp  = Σ_ce C(n_ce,2)   same cluster AND same entity
      pc  = Σ_c  C(n_c,2)    same cluster (predicted positives)
      pe  = Σ_e  C(n_e,2)    same entity  (gold positives)
      tot = C(n,2)

      rand = (tot - pc - pe + 2·tp) / tot
      ARI  = (tp - pc·pe/tot) / ((pc+pe)/2 - pc·pe/tot)
      FM   = tp / sqrt(pc·pe)

    Pair counts use integer `div` (exact past 2^53 pairs); only the
    final ratios are floats, computed in the same literal expression
    shape the DuckDB oracle uses so round-6 parity is structural.
    Degenerate conventions follow sklearn: ARI = 1.0 when the
    chance-corrected denominator is 0 (both partitions trivially
    agree), FM/precision/recall = 0.0 on empty denominators.
    """
    cells = assignments.groupBy(cluster_col, truth_col).agg(
        F.count(F.lit(1)).alias("n_ce")
    )
    c2 = lambda c: F.expr(f"({c} * ({c} - 1)) div 2")  # noqa: E731
    tp_row = cells.agg(
        F.coalesce(F.sum(c2("n_ce")), F.lit(0)).alias("tp"),
        F.coalesce(F.sum("n_ce"), F.lit(0)).alias("n"),
    )
    pc_row = (
        cells.groupBy(cluster_col)
        .agg(F.sum("n_ce").alias("n_c"))
        .agg(F.coalesce(F.sum(c2("n_c")), F.lit(0)).alias("pc"))
    )
    pe_row = (
        cells.groupBy(truth_col)
        .agg(F.sum("n_ce").alias("n_e"))
        .agg(F.coalesce(F.sum(c2("n_e")), F.lit(0)).alias("pe"))
    )
    row = tp_row.crossJoin(F.broadcast(pc_row)).crossJoin(
        F.broadcast(pe_row)
    )
    tot = F.expr("(n * (n - 1)) div 2")
    tp, pc, pe = F.col("tp"), F.col("pc"), F.col("pe")
    row = row.withColumn("tot", tot)
    totc = F.col("tot")
    rand = F.when(
        totc > 0, (totc - pc - pe + 2 * tp) / totc
    ).otherwise(0.0)
    expected = pc * pe / totc
    ari_den = (pc + pe) / F.lit(2.0) - expected
    ari = F.when(totc <= 0, 0.0).otherwise(
        F.when(ari_den != 0.0, (tp - expected) / ari_den).otherwise(1.0)
    )
    fm = F.when(
        (pc > 0) & (pe > 0), tp / F.sqrt(pc.cast("double") * pe)
    ).otherwise(0.0)
    return row.select(
        F.col("n").cast("long").alias("n_items"),
        tp.cast("long").alias("tp_pairs"),
        pc.cast("long").alias("pred_pairs"),
        pe.cast("long").alias("true_pairs"),
        totc.cast("long").alias("total_pairs"),
        F.round(rand, 6).alias("rand_index"),
        F.round(ari, 6).alias("adjusted_rand"),
        F.round(fm, 6).alias("fowlkes_mallows"),
        F.when(pc > 0, F.round(tp / pc, 6)).otherwise(0.0).alias(
            "pair_precision"
        ),
        F.when(pe > 0, F.round(tp / pe, 6)).otherwise(0.0).alias(
            "pair_recall"
        ),
    )


def tf_adjusted_weights(
    pairs: DataFrame,
    mentions: DataFrame,
    value_col: str,
    val1_col: str,
    val2_col: str,
    label_col: str = "same_entity",
    eps: float = 1e-6,
) -> DataFrame:
    """Per-VALUE term-frequency-adjusted Fellegi-Sunter evidence for
    one exact-agreement comparison (the Splink ``tf_adjustments``
    idea): agreement on a rare value ("zabrinsky") is far stronger
    evidence than agreement on a common one ("smith"), but the global
    u = P(agree | non-match) averages that distinction away.

    For a pair agreeing on value v, the better non-match agreement
    probability is the chance a RANDOM co-blocked mention also carries
    v — its relative frequency p_v = n_v / n among the mention table —
    so the adjusted evidence is log2(m / p_v), decomposable as the
    global weight log2(m/u) plus the per-value correction
    log2(u / p_v) (positive bits for rare values, negative for common
    ones).  This is the principled generalization of the reference's
    name-commonness feature (X16 ambiguity,
    database/pubmed_inner_outer_feature.sql) into the probabilistic
    weight framework: the SAME quantity, but calibrated in evidence
    bits instead of fed opaquely to a classifier.

    One row per distinct value with at least one agreeing candidate
    pair: mention frequency, agreeing-pair counts by label, the
    clamped p_v, and the three weights.

    Scale: three linear passes, never per-pair state —
      1. global m/u: ONE map-side-partial groupBy of the pair table
         to a single row (same plan as ``fs_weights``);
      2. value frequencies: one groupBy of the MENTION table (orders
         of magnitude smaller than pairs);
      3. agreeing pairs per value: one filtered groupBy of the pair
         table.
    The 1-row base and the total broadcast onto the per-value rows;
    nothing quadratic, no skew (a hot value is ONE row after each
    groupBy).  All counts exact integers; probabilities clamped into
    [eps, 1-eps] before the log-ratios exactly as ``fs_weights``.
    """
    agree = F.when(F.col(val1_col) == F.col(val2_col), 1).otherwise(0)
    y = F.col(label_col).cast("int")
    base = pairs.select(agree.alias("__a"), y.alias("__y")).agg(
        F.sum("__y").cast("long").alias("n_match"),
        F.sum(1 - F.col("__y")).cast("long").alias("n_nonmatch"),
        F.sum(F.col("__a") * F.col("__y")).cast("long").alias("am"),
        F.sum(F.col("__a") * (1 - F.col("__y"))).cast("long").alias("an"),
    )
    total = mentions.agg(F.count(F.lit(1)).cast("long").alias("n_mentions"))
    freq = mentions.groupBy(F.col(value_col).alias("value")).agg(
        F.count(F.lit(1)).cast("long").alias("n_value")
    )
    agreed = (
        pairs.filter(F.col(val1_col) == F.col(val2_col))
        .groupBy(F.col(val1_col).alias("value"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_agree_pairs"),
            F.sum(y).cast("long").alias("n_agree_match"),
        )
    )
    lo, hi = F.lit(eps), F.lit(1.0 - eps)

    def clamp(raw):
        return F.greatest(F.least(raw, hi), lo)

    row = (
        agreed.join(freq, "value")
        .crossJoin(F.broadcast(base))
        .crossJoin(F.broadcast(total))
    )
    m = clamp(
        F.when(F.col("n_match") > 0, F.col("am") / F.col("n_match")).otherwise(lo)
    )
    u = clamp(
        F.when(
            F.col("n_nonmatch") > 0, F.col("an") / F.col("n_nonmatch")
        ).otherwise(lo)
    )
    u_v = clamp(F.col("n_value") / F.col("n_mentions"))
    return row.select(
        "value",
        "n_value",
        "n_mentions",
        "n_agree_pairs",
        "n_agree_match",
        F.round(u_v, 6).alias("u_value"),
        F.round(F.log2(m / u), 6).alias("base_weight"),
        F.round(F.log2(m / u_v), 6).alias("tf_weight"),
        F.round(F.log2(u / u_v), 6).alias("tf_adjustment"),
    ).orderBy("value")


def ceaf_alignment(
    assignments: DataFrame,
    cluster_col: str = "cluster",
    truth_col: str = "entity_id",
    rounds: int = 12,
) -> DataFrame:
    """Greedy CEAF alignment (Luo, EMNLP'05): a 1:1 matching between
    predicted clusters and gold entities maximizing mention overlap,
    one row per matched (cluster, entity) with both phi scores — the
    fourth extrinsic lens after pairwise F1, B-cubed/V-measure (q63)
    and pair-counting ARI (q76).  CEAF is the metric that punishes
    the "one giant cluster" degenerate case hardest: a weld can match
    at most ONE gold entity, every other entity contributes zero.

    Exact CEAF needs the Hungarian algorithm (inherently sequential);
    the scalable surrogate is GREEDY max-weight matching — the same
    parallel local-dominance peel as ``linkage.greedy_one_to_one``,
    provably equal to sequential greedy by descending (overlap,
    partner id), a 1/2-approximation and in practice near-exact on
    peaked contingency tables.  Deliberately emitted as an ALIGNMENT
    TABLE, not a one-row summary: per-pair phi values are floats, and
    summing millions of them in one row would need either an
    unbounded collect_list fold or an order-sensitive float sum (the
    q44/BENCH parity rule); the per-row form is exact, scale-safe,
    and lets the caller pick the phi and the denominator.

    Input contract and scale are those of ``pair_counting_metrics``:
    one O(cells) contingency groupBy of the mention table, then
    matching rounds over the CELLS (two keyed max-aggs + anti-joins
    per round, never per-mention state).  ``phi_m`` is the raw
    integer overlap (CEAF-m numerator); ``phi_e`` is the per-pair
    2*overlap/(|C|+|E|) (CEAF-e numerator term), round-6 from exact
    integers.  Raises on non-convergence like the matching operator,
    so the output is a pure function of (assignments, rounds) and a
    SQL oracle can unroll the identical rounds.
    """
    from pubmed_and_method_spark.operators.linkage import greedy_one_to_one

    cells = assignments.groupBy(
        F.col(cluster_col).alias("cluster"),
        F.col(truth_col).alias("entity_id"),
    ).agg(F.count(F.lit(1)).alias("n_ce"))
    n_c = assignments.groupBy(F.col(cluster_col).alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_cluster")
    )
    n_e = assignments.groupBy(F.col(truth_col).alias("entity_id")).agg(
        F.count(F.lit(1)).alias("n_entity")
    )
    m = greedy_one_to_one(
        cells, "cluster", "entity_id", "n_ce", rounds=rounds
    )
    return (
        m.join(n_c, "cluster")
        .join(n_e, "entity_id")
        .select(
            "cluster",
            "entity_id",
            F.col("n_ce").cast("long").alias("phi_m"),
            "n_cluster",
            "n_entity",
            F.round(
                2 * F.col("n_ce") / (F.col("n_cluster") + F.col("n_entity")),
                6,
            ).alias("phi_e"),
            "round_matched",
        )
    )


def cluster_churn(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "mention_id",
    a_col: str = "cluster",
    b_col: str = "cluster",
) -> DataFrame:
    """Per-cluster CHURN between two clusterings of the same mentions
    — the production-ER stability report nothing in the reference
    exists to produce (its blocks are built once and never compared
    across releases): when the blocking key, model, threshold, or an
    incremental update changes the partition, which clusters survived
    intact, which SPLIT apart, and which were MERGED into something
    bigger?

    One row per A-cluster: mention count, how many B-clusters its
    mentions landed in (``n_parts_b``), the best-overlap B-cluster
    (deterministic argmax by (overlap, b) struct max) with its
    overlap and exact-ratio containment both ways, and a status:

      ``stable``  all of A is one B-cluster and that B-cluster is
                  exactly A (bijective cell);
      ``split``   A's mentions span >1 B-cluster;
      ``merged``  A maps into one B-cluster that also absorbed other
                  mentions;

    (a split whose largest part also gained members still reports
    ``split`` — span is checked first; ``frac_of_b`` exposes the
    absorption.)  Everything derives from the (A, B) contingency
    cells — one groupBy of the joined assignment table, then groupBys
    of the CELLS, O(cells) at 10^12 mentions like the other
    contingency operators; integer counts + round-6 exact ratios.
    """
    cells = (
        a.select(F.col(id_col).alias("__id"), F.col(a_col).alias("ca"))
        .join(
            b.select(F.col(id_col).alias("__id"), F.col(b_col).alias("cb")),
            "__id",
        )
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    per_a = cells.groupBy("ca").agg(
        F.sum("n_ab").cast("long").alias("n_mentions"),
        F.count(F.lit(1)).cast("long").alias("n_parts_b"),
        F.max(
            F.struct(F.col("n_ab").alias("n"), F.col("cb").alias("b"))
        ).alias("__best"),
    )
    size_b = cells.groupBy("cb").agg(
        F.sum("n_ab").cast("long").alias("n_b")
    )
    out = per_a.select(
        F.col("ca").alias("cluster_a"),
        "n_mentions",
        "n_parts_b",
        F.col("__best.b").alias("best_b"),
        F.col("__best.n").cast("long").alias("best_overlap"),
    ).join(size_b.withColumnRenamed("cb", "best_b"), "best_b")
    status = (
        F.when(F.col("n_parts_b") > 1, F.lit("split"))
        .when(F.col("n_b") > F.col("best_overlap"), F.lit("merged"))
        .otherwise(F.lit("stable"))
    )
    return out.select(
        "cluster_a",
        "n_mentions",
        "n_parts_b",
        "best_b",
        "best_overlap",
        F.round(F.col("best_overlap") / F.col("n_mentions"), 6).alias(
            "frac_of_a"
        ),
        F.round(F.col("best_overlap") / F.col("n_b"), 6).alias("frac_of_b"),
        status.alias("status"),
    )


def review_queue(
    decisions: DataFrame,
    k: int,
    lower: float,
    upper: float,
    key_col: str,
    score_col: str = "llr",
    decision_col: str = "decision",
    id1_col: str = "mention_id1",
    id2_col: str = "mention_id2",
) -> DataFrame:
    """The clerical-review QUEUE for the Fellegi-Sunter 'possible'
    band: per blocking key, the k most AMBIGUOUS pairs, most-uncertain
    first — the work order a human review team (or an active-learning
    labeler) actually consumes.  q75 sizes the band; this operator
    allocates the review budget inside it.

    Ambiguity = depth into the band, ``least(score - lower,
    upper - score)``: pairs near either threshold are nearly decided,
    pairs mid-band carry the least evidence either way and benefit
    most from a label (the standard uncertainty-sampling priority).
    Ordering is total — (depth DESC, id1, id2) — so the queue is a
    pure function of its input across engines and runs.

    Scale: one window partitioned by the BLOCKING KEY (never a global
    single-partition sort), so the rank shuffle is the same hash
    exchange the pair table already lives in, and the per-key cap k
    stops one ambiguous mega-block from hogging the whole review
    budget — the q53 histogram names those blocks, this cap contains
    them.
    """
    from pyspark.sql import Window

    band = decisions.filter(F.col(decision_col) == "possible")
    depth = F.round(
        F.least(
            F.col(score_col) - F.lit(lower),
            F.lit(upper) - F.col(score_col),
        ),
        6,
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("band_depth").desc(), id1_col, id2_col)
    )
    return (
        band.withColumn("band_depth", depth)
        .withColumn("review_rank", F.row_number().over(w))
        .filter(F.col("review_rank") <= k)
        .select(
            key_col,
            "review_rank",
            id1_col,
            id2_col,
            score_col,
            "band_depth",
        )
    )


def ranking_metrics(
    scored: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Threshold-free scorer evaluation: tie-corrected ROC AUC
    (Mann-Whitney midranks), Gini, and the Kolmogorov-Smirnov
    statistic over a scored labeled-pair table.

    q62's threshold sweep reports P/R/F1 at each cut; this is the
    integral view — AUC = P(random match outranks random nonmatch,
    ties half), KS = max CDF separation = the best achievable
    |TPR - FPR| over ALL cuts.  The pair the credit-scoring and
    linkage-calibration literatures quote together.

    Scale design: ONE map-side-combinable groupBy on the score value
    — for an FS scorer the distinct-score cardinality is bounded by
    2^k (k binary comparisons), so the subsequent ordered window runs
    over a tiny aggregated frame, never the raw pairs.  For
    continuous scores, round/bucket upstream first (the caller owns
    the binning; midranks make the result exact for whatever binning
    arrives here).
    """
    y = F.col(label_col).cast("long")
    g = scored.groupBy(F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n"), F.sum(y).alias("__pos")
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()  # over the tiny aggregated frame only
    g = (
        g.withColumn("__cum_n", F.sum("__n").over(w))
        .withColumn("__cum_pos", F.sum("__pos").over(w))
        .withColumn("__tot_n", F.sum("__n").over(tot))
        .withColumn("__tot_pos", F.sum("__pos").over(tot))
        .withColumn(
            "__midrank",
            F.col("__cum_n") - F.col("__n") + (F.col("__n") + 1) / 2.0,
        )
        .withColumn(
            "__ks_term",
            F.abs(
                F.col("__cum_pos") / F.col("__tot_pos")
                - (F.col("__cum_n") - F.col("__cum_pos"))
                / (F.col("__tot_n") - F.col("__tot_pos"))
            ),
        )
    )
    u = (
        F.sum(F.col("__pos") * F.col("__midrank"))
        - F.sum("__pos") * (F.sum("__pos") + 1) / 2.0
    )
    denom = F.sum("__pos") * (F.sum("__n") - F.sum("__pos"))
    return g.agg(
        F.sum("__pos").cast("long").alias("n_pos"),
        (F.sum("__n") - F.sum("__pos")).cast("long").alias("n_neg"),
        F.round(u / denom, 6).alias("auc"),
        F.round(2.0 * u / denom - 1.0, 6).alias("gini"),
        F.round(F.max("__ks_term"), 6).alias("ks"),
    )


def fs_select_thresholds(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    mu: tuple[int, int] = (1, 100),
    lam: tuple[int, int] = (5, 100),
) -> DataFrame:
    """Fellegi-Sunter's ORIGINAL threshold-setting procedure: derive
    the (upper, lower) decision cuts from target error rates instead
    of hardcoding them (q67 fixes upper=4, lower=0 by eye).

    FS'69 defines the optimal linkage rule by two admissible error
    bounds: mu — the false-match rate among auto-links — and lambda —
    the miss rate among true matches consigned to auto-nonlink.  On a
    labeled pair table the empirical rule is:

    - ``upper``  = the SMALLEST observed score t with
      FDR(score >= t) <= mu   (maximizes auto-link volume under the
      error bound);
    - ``lower``  = the LARGEST observed score t with
      miss(score <= t) <= lambda  (maximizes auto-nonlink volume
      under the miss bound);

    everything between is the clerical-review band whose WIDTH is now
    a consequence of the declared error tolerances — the quantity
    q75 reports for a hand-picked band.

    Both bounds are integer-ratio comparisons (den*err <= num*vol —
    no float threshold near a decision boundary), and the scan runs
    over the distinct-score frame (<= 2^k rows for k binary FS
    comparisons) with two cumulative windows; raw pairs contribute
    one map-side-combinable groupBy.  Returns ONE row: the cuts, the
    volumes and realized error rates they induce, and the review
    band's size and share.

    Degenerate cases (ADVICE r04) are explicit, never silent nulls or
    negative counts: when no score satisfies a bound, the
    corresponding cut is null, its volume is 0 (not null), and
    ``band_flag`` reports 'no_upper'/'no_lower'; with LOOSE bounds
    the selected lower can exceed upper — the auto-link and
    auto-nonlink sets then OVERLAP (some pairs satisfy both error
    budgets), ``band_flag`` = 'overlap', and n_review/review_share
    are clamped at 0 (an overlapping band means NO pair needs
    review, not a negative count).  ``band_flag`` is null on a
    healthy band.
    """
    mu_n, mu_d = mu
    lam_n, lam_d = lam
    y = F.col(label_col).cast("long")
    g = scored.groupBy(F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n"), F.sum(y).alias("__pos")
    )
    desc = Window.orderBy(F.col("__s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    asc = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    g = (
        g.withColumn("__n_ge", F.sum("__n").over(desc))
        .withColumn("__pos_ge", F.sum("__pos").over(desc))
        .withColumn("__n_le", F.sum("__n").over(asc))
        .withColumn("__pos_le", F.sum("__pos").over(asc))
        .withColumn("__tot_pos", F.sum("__pos").over(tot))
        .withColumn("__tot_n", F.sum("__n").over(tot))
    )
    # integer-exact bound checks
    ok_u = (
        F.lit(mu_d) * (F.col("__n_ge") - F.col("__pos_ge"))
        <= F.lit(mu_n) * F.col("__n_ge")
    )
    ok_l = F.lit(lam_d) * F.col("__pos_le") <= F.lit(lam_n) * F.col(
        "__tot_pos"
    )
    sel = g.agg(
        F.min(F.when(ok_u, F.col("__s"))).alias("upper"),
        F.max(F.when(ok_l, F.col("__s"))).alias("lower"),
    )
    chosen = (
        g.crossJoin(F.broadcast(sel))
        .agg(
            F.first(F.col("upper")).alias("upper"),
            F.first(F.col("lower")).alias("lower"),
            F.max(
                F.when(F.col("__s") == F.col("upper"), F.col("__n_ge"))
            ).alias("n_link"),
            F.max(
                F.when(
                    F.col("__s") == F.col("upper"),
                    F.round(
                        (F.col("__n_ge") - F.col("__pos_ge"))
                        / F.col("__n_ge"),
                        6,
                    ),
                )
            ).alias("link_fdr"),
            F.max(
                F.when(F.col("__s") == F.col("lower"), F.col("__n_le"))
            ).alias("n_nonlink"),
            F.max(
                F.when(
                    F.col("__s") == F.col("lower"),
                    F.round(F.col("__pos_le") / F.col("__tot_pos"), 6),
                )
            ).alias("miss_rate"),
            F.max("__tot_n").alias("__t"),
        )
        .select(
            "upper",
            "lower",
            F.coalesce("n_link", F.lit(0)).alias("n_link"),
            "link_fdr",
            F.coalesce("n_nonlink", F.lit(0)).alias("n_nonlink"),
            "miss_rate",
            F.greatest(
                F.lit(0),
                F.col("__t")
                - F.coalesce("n_link", F.lit(0))
                - F.coalesce("n_nonlink", F.lit(0)),
            ).alias("n_review"),
            F.round(
                F.greatest(
                    F.lit(0),
                    F.col("__t")
                    - F.coalesce("n_link", F.lit(0))
                    - F.coalesce("n_nonlink", F.lit(0)),
                )
                / F.col("__t"),
                6,
            ).alias("review_share"),
            F.when(
                F.col("upper").isNull() & F.col("lower").isNull(),
                F.lit("no_upper,no_lower"),
            )
            .when(F.col("upper").isNull(), F.lit("no_upper"))
            .when(F.col("lower").isNull(), F.lit("no_lower"))
            .when(F.col("lower") >= F.col("upper"), F.lit("overlap"))
            .alias("band_flag"),
        )
    )
    return chosen


def fs_independence_audit(
    pairs: DataFrame, feature_cols: list[str], label_col: str
) -> DataFrame:
    """Audit the conditional-independence assumption every
    Fellegi-Sunter weight sum silently makes (Winkler's interaction
    caveat): per feature pair, the ratio of observed co-agreement to
    the independence prediction, separately within matches and
    nonmatches —

        ratio = P(a AND b agree | class) /
                (P(a agree | class) * P(b agree | class))

    1.0 = independent (the weights may add); >1 = the pair
    double-counts evidence when both fire (q67's llr overstates);
    <1 = anti-correlated.  Computed as exact integer-count products
    with a single division per cell ((n_both * n_class) /
    (n_a * n_b)), round-6, null when a marginal is zero.

    ONE aggregation pass over the pair table produces every marginal
    and pairwise count as columns (2 + 2k + k(k-1) conditional sums,
    map-side combinable); the k(k-1)/2 output rows unstack from that
    single row — no second scan, no join.

    Feature names are interpolated into generated expr()/stack() SQL,
    so they are validated up front (ADVICE r04): identifiers only —
    a quoted/hyphenated column would otherwise produce a parse error
    or a silently malformed expression deep in the generated SQL.
    """
    import re

    bad = [
        c for c in feature_cols
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c)
    ]
    if bad:
        raise ValueError(
            "fs_independence_audit: feature_cols are interpolated into "
            "generated SQL and must be plain identifiers "
            f"([A-Za-z_][A-Za-z0-9_]*); got {bad!r} — alias such "
            "columns to plain identifiers first"
        )
    y = F.col(label_col).cast("long")
    aggs = [F.sum(y).alias("__nm"), F.sum(1 - y).alias("__nu")]
    for c in feature_cols:
        f = F.col(c).cast("long")
        aggs.append(F.sum(f * y).alias(f"__m_{c}"))
        aggs.append(F.sum(f * (1 - y)).alias(f"__u_{c}"))
    for i, a in enumerate(feature_cols):
        for b in feature_cols[i + 1 :]:
            fa, fb = F.col(a).cast("long"), F.col(b).cast("long")
            aggs.append(F.sum(fa * fb * y).alias(f"__bm_{a}__{b}"))
            aggs.append(F.sum(fa * fb * (1 - y)).alias(f"__bu_{a}__{b}"))
    one = pairs.agg(*aggs)

    stack_parts = []
    for i, a in enumerate(feature_cols):
        for b in feature_cols[i + 1 :]:
            rm = (
                f"CASE WHEN __m_{a} * __m_{b} > 0 THEN "
                f"round(__bm_{a}__{b} * __nm * 1.0D / (__m_{a} * __m_{b}), 6) "
                f"ELSE NULL END"
            )
            ru = (
                f"CASE WHEN __u_{a} * __u_{b} > 0 THEN "
                f"round(__bu_{a}__{b} * __nu * 1.0D / (__u_{a} * __u_{b}), 6) "
                f"ELSE NULL END"
            )
            stack_parts.append(
                f"'{a}', '{b}', CAST(__bm_{a}__{b} AS BIGINT), {rm}, "
                f"CAST(__bu_{a}__{b} AS BIGINT), {ru}"
            )
    n = len(stack_parts)
    return one.select(
        F.expr(
            f"stack({n}, {', '.join(stack_parts)}) AS "
            "(feature_a, feature_b, n_both_match, ratio_match, "
            "n_both_nonmatch, ratio_nonmatch)"
        )
    )
