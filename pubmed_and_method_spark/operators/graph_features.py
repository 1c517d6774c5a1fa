"""Structural match evidence: common-neighbor features over the
high-confidence match graph (Liben-Nowell & Kleinberg, CIKM 2003).

Every feature the reference computes is PAIR-LOCAL — two mentions'
own strings/sets/times (src/pubmed_inner_feature_extract.py).  But a
borderline pair is often decided by the graph AROUND it: if a and b
each match the same third mentions with high confidence, that shared
neighborhood is match evidence no pairwise feature sees (the cheap,
one-hop form of collective entity resolution).  This operator scores
candidate pairs by:

- ``cn`` — the number of common high-confidence neighbors;
- ``nbr_jaccard`` — |N(a)∩N(b)| / |N(a)∪N(b)|, an exact integer
  ratio (engine-stable with no rounding tricks).

Plan shape: symmetrized evidence adjacency (one distinct), degrees
(one groupBy), then the triangle enumeration as TWO hash joins —
candidates join adj on endpoint a, result joins adj on endpoint b
with the shared-neighbor equality — reduced by ONE pair-keyed count
(map-side partial agg).  Cost is Σ_z deg(z)·cand_deg(z), so hubs
dominate; ``max_degree`` drops nodes above the cap from the NEIGHBOR
role only (their own candidate pairs still score via other
neighbors) — the same hot-key discipline as the blocking caps, and at
10^12 edges the cap is what keeps the join from going quadratic on a
celebrity node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def common_neighbor_features(
    pairs: DataFrame,
    edges: DataFrame,
    id_cols: tuple[str, str] = ("id1", "id2"),
    max_degree: int | None = None,
) -> DataFrame:
    """Append (cn, nbr_jaccard) to every candidate pair.

    ``pairs``: candidate pairs to score (columns ``id_cols``).
    ``edges``: the high-confidence evidence graph (same columns).
    Pairs with no common neighbor get cn=0, nbr_jaccard=0.0 — the
    left join keeps every candidate.  Under ``max_degree`` the
    DEGREES stay uncapped (the union denominator reflects true
    neighborhood sizes) while cn becomes a lower bound — the feature
    degrades conservatively on hub-adjacent pairs.
    """
    c1, c2 = id_cols
    e = edges.select(F.col(c1).alias("a"), F.col(c2).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    adj = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    deg = adj.groupBy("a").agg(F.count("*").alias("deg"))
    if max_degree is not None:
        # drop hubs from the NEIGHBOR role only: broadcast the (few)
        # over-cap nodes, never the keep-set
        hubs = deg.filter(F.col("deg") > max_degree).select(
            F.col("a").alias("b")
        )
        nbr = adj.join(F.broadcast(hubs), "b", "left_anti")
    else:
        nbr = adj

    cand = pairs.select(F.col(c1).alias("u"), F.col(c2).alias("v"))
    cn = (
        cand.join(nbr.select(F.col("a").alias("u"), F.col("b").alias("z")), "u")
        .join(nbr.select(F.col("a").alias("v"), F.col("b").alias("z")), ["v", "z"])
        .groupBy("u", "v")
        .agg(F.count("*").alias("cn"))
    )
    out = (
        cand.join(cn, ["u", "v"], "left")
        .join(deg.select(F.col("a").alias("u"), F.col("deg").alias("__d1")), "u", "left")
        .join(deg.select(F.col("a").alias("v"), F.col("deg").alias("__d2")), "v", "left")
        .withColumn("cn", F.coalesce("cn", F.lit(0)))
        .withColumn("__d1", F.coalesce("__d1", F.lit(0)))
        .withColumn("__d2", F.coalesce("__d2", F.lit(0)))
    )
    union = F.col("__d1") + F.col("__d2") - F.col("cn")
    return out.select(
        F.col("u").alias(c1),
        F.col("v").alias(c2),
        "cn",
        F.when(union > 0, F.col("cn") / union)
        .otherwise(F.lit(0.0))
        .alias("nbr_jaccard"),
    )


def cluster_cohesion(
    edges: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    max_iter: int = 20,
) -> DataFrame:
    """Per-cluster cohesion audit of a match graph: how chain-like is
    each connected component the clusterer is about to assert?

    Single-link closure welds everything a path connects; a component
    held together by one low-degree thread is the classic homonym
    bridge (the failure q65 audits pair-by-pair — this is the
    per-CLUSTER roll-up that ranks components for review).  One row
    per component:

    - ``n_nodes`` / ``n_edges``;
    - ``density`` — n_edges / (n_nodes choose 2), round-6 (1.0 =
      clique = every merge directly evidenced; chains score ~2/n);
    - ``min_degree`` — 1 means a cut vertex's neighbor dangles;
    - ``n_leaf_nodes`` — degree-1 members, each removable by cutting
      a single edge.

    Scale: components from the iterative large-star/small-star
    operator (its own checkpoint discipline); degrees are one
    groupBy on the symmetrized edge list; the roll-up is one shuffle
    on component id.  Singleton nodes never appear (no edges), which
    matches the audit's purpose: unmerged records carry no weld risk.
    """
    from pubmed_and_method_spark.operators.connected_components import (
        connected_components,
    )

    # lazily pinned: e feeds CC + the two-way degree union + the
    # per-component edge count (4 references), cc feeds two joins —
    # unpinned, each reference re-executes the caller's upstream link
    # pipeline (q110: the whole q67 FS scoring chain)
    e = (
        edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    cc = connected_components(e, "u", "v", max_iter=max_iter).localCheckpoint(
        eager=False
    )
    bidir = e.select("u", "v").unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = bidir.groupBy(F.col("u").alias("id")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    nodes = cc.join(deg, "id")
    per_node = nodes.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("__deg").alias("min_degree"),
        F.sum((F.col("__deg") == 1).cast("long")).alias("n_leaf_nodes"),
    )
    e_comp = e.join(
        cc.select(F.col("id").alias("u"), "component"), "u"
    ).groupBy("component").agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        per_node.join(e_comp, "component")
        .select(
            "component",
            "n_nodes",
            "n_edges",
            F.round(
                F.col("n_edges")
                / (F.col("n_nodes") * (F.col("n_nodes") - 1) / 2.0),
                6,
            ).alias("density"),
            "min_degree",
            "n_leaf_nodes",
        )
    )


def propagate_scores(
    scored: DataFrame,
    id_cols: tuple[str, str] = ("id1", "id2"),
    score_col: str = "score",
    rounds: int = 2,
    alpha: tuple[int, int] = (7, 10),
    hi: float = 0.6,
) -> DataFrame:
    """Iterated collective ER: candidate-pair scores re-blended with
    the structure their own high-confidence subgraph induces
    (Bhattacharya & Getoor's collective relational ER, as a fixed
    deterministic round count — the ITERATED form of q74's one-shot
    common-neighbor features).

    Per round: edges = pairs currently >= ``hi``; every candidate's
    neighbor-Jaccard over that graph is computed (the
    common_neighbor_features triangle join); the score becomes
    ``(a*score + (b-a)*nbr_jaccard) / b`` for ``alpha = (a, b)``.  A
    borderline pair whose endpoints' other partners agree gets pulled
    UP across rounds (evidence propagates transitively); an isolated
    high scorer decays geometrically — exactly the two corrections
    pair-local features cannot make.

    Cross-engine exactness: scores live in INTEGER MICRO-UNITS
    (round-6 x 1e6) and each blend is ``(a*prev + (b-a)*jacc) div b``
    — integer floor division, no decimal rounding anywhere near a
    half boundary (a 0.7x blend of round-6 values lands on exact
    7th-decimal fives, where engines' round() disagree).  Fixed
    rounds keep the output a pure function of (pairs, rounds, alpha,
    hi); per round one symmetrized adjacency + the triangle join,
    pinned with localCheckpoint like the other iterative operators.

    Returns the pairs with ``score_0`` .. ``score_<rounds>`` (micro
    units scaled back to doubles) and ``promoted`` (crossed ``hi`` by
    iteration but not at round 0).

    PRECONDITION (ADVICE r04): ``scored`` must hold DISTINCT
    (id1, id2) rows — the candidate-pair contract every upstream
    generator in this package satisfies (build_candidate_pairs
    dedups, knn_sparsify keeps max-score per pair).  Duplicate pair
    rows would fan out through the inner join with the per-round
    common_neighbor_features frame and inflate every subsequent
    round; this operator does NOT dedup internally because with
    caller-supplied extra columns there is no principled survivor
    row to pick.
    """
    a, b = alpha
    hi_int = int(round(hi * 1_000_000))
    c1, c2 = id_cols
    extras = [c for c in scored.columns if c not in (c1, c2, score_col)]
    cur = scored.select(
        F.col(c1),
        F.col(c2),
        F.round(F.col(score_col) * 1_000_000)
        .cast("long")
        .alias("__si_0"),
        *extras,
    ).localCheckpoint(eager=True)
    for r in range(1, rounds + 1):
        prev = f"__si_{r - 1}"
        edges = cur.where(F.col(prev) >= hi_int).select(c1, c2)
        feat = common_neighbor_features(
            cur.select(c1, c2), edges, id_cols=(c1, c2)
        )
        cur = (
            cur.join(feat, [c1, c2])
            .withColumn(
                "__ji",
                F.round(F.col("nbr_jaccard") * 1_000_000).cast("long"),
            )
            .withColumn(
                f"__si_{r}",
                F.expr(
                    f"({a} * {prev} + {b - a} * __ji) div {b}"
                ),
            )
            .drop("cn", "nbr_jaccard", "__ji")
            .localCheckpoint(eager=True)
        )
    out = cur.withColumn(
        "promoted",
        (
            (F.col(f"__si_{rounds}") >= hi_int)
            & (F.col("__si_0") < hi_int)
        ).cast("int"),
    )
    for r in range(rounds + 1):
        out = out.withColumn(
            f"score_{r}", F.col(f"__si_{r}") / F.lit(1_000_000.0)
        ).drop(f"__si_{r}")
    return out


def knn_sparsify(
    scored: DataFrame,
    id_cols: tuple[str, str] = ("id1", "id2"),
    score_col: str = "score",
    k: int = 3,
    mutual: bool = False,
) -> DataFrame:
    """k-nearest-neighbor sparsification of a scored match graph:
    each node keeps only its k best-scored incident edges, and an
    edge survives if EITHER endpoint keeps it (``mutual=False``, the
    standard kNN graph) or only if BOTH do (``mutual=True``, the
    high-precision variant that kills hub attachments the way q89's
    reciprocal-top-1 does at k=1).

    The hairball valve for transitive clustering: a dense ambiguous
    block contributes O(b^2) edges, and single-link welds the lot;
    sparsified to <= k*b edges, chains must follow strong local
    agreement instead of any similarity above bar.  Rank windows are
    PER NODE (partition = node, bounded by its degree) — no global
    sort; ties break by (score desc, partner id) so the kept set is
    a pure function of the input.

    Returns canonical (id1 < id2) surviving edges with the score and
    ``kept_by`` (how many endpoints ranked it <= k: 2 = mutual).
    """
    from pyspark.sql import Window

    c1, c2 = id_cols
    e = (
        scored.select(
            F.least(F.col(c1), F.col(c2)).alias("u"),
            F.greatest(F.col(c1), F.col(c2)).alias("v"),
            F.col(score_col).alias("s"),
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.max("s").alias("s"))
    )
    sym = e.select("u", "v", "s").unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"), "s")
    )
    w = Window.partitionBy("u").orderBy(F.col("s").desc(), F.col("v"))
    kept = (
        sym.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .select(
            F.least("u", "v").alias("u"),
            F.greatest("u", "v").alias("v"),
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("kept_by"))
    )
    need = 2 if mutual else 1
    return (
        e.join(kept, ["u", "v"])
        .where(F.col("kept_by") >= need)
        .select(
            F.col("u").alias(c1),
            F.col("v").alias(c2),
            F.col("s").alias(score_col),
            "kept_by",
        )
    )
