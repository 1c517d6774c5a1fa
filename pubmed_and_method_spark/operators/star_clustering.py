"""Star clustering — the bounded-diameter alternative to transitive
closure (Aslam, Pelekhov & Rus, JGAA 2004).

Connected components (the reference's implicit clustering: every
namespace/block weld, database/and_datasets.sql:56-68) welds any two
records joined by a CHAIN of matches — one false positive edge merges
two entities, and chains grow clusters of unbounded diameter (the
mega-cluster failure q53/q65 instrument).  Star clustering instead
covers the match graph with stars: high-degree CENTERS plus their
direct neighbors as satellites.  Every cluster has diameter <= 2 —
each member is directly match-adjacent to its center, so a weld
requires a false edge incident to the CENTER, not anywhere in a chain.

Centers are the greedy maximal independent set in descending
(degree, id) priority order.  The sequential greedy scan is inherently
serial, so we run the classic parallel equivalent — derandomized
Luby peel: each round, every unresolved node that is the priority
maximum of its unresolved neighborhood becomes a center, and its
unresolved neighbors become covered.  With a fixed total priority
order this peel provably selects EXACTLY the sequential greedy MIS,
round count bounded by the longest strictly-decreasing priority path.
Per round: one neighbor-max aggregation + one semi/anti join — the
same shuffle discipline as the large-star/small-star CC operator; no
driver state beyond the loop counter and an O(1) convergence count.

Satellites then attach to their best adjacent center by
(edge weight, center degree, center id) — an order-free, engine-exact
rule (struct max), so the whole algorithm is value-oracle-able by
unrolling the same rounds as chained SQL CTEs (the q66/fs_em
precedent for iterative operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def star_clusters(
    edges: DataFrame,
    id_cols: tuple[str, str] = ("id1", "id2"),
    weight_col: str | None = None,
    rounds: int = 8,
) -> DataFrame:
    """Cluster the undirected match graph ``edges`` into stars.

    Runs exactly ``rounds`` peel rounds, then RAISES if any node is
    still unresolved — so a result is always a converged fixpoint and
    is bit-identical to the same-``rounds`` unrolled SQL derivation.
    Raising (instead of silently looping further) keeps the operator's
    output a pure function of (edges, rounds), which is what makes the
    cross-engine oracle exact.

    Returns one row per node: (node, center, is_center) — ``center``
    is the cluster id (the center's own id for centers).
    """
    c1, c2 = id_cols
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    # lazily pinned: the symmetrizing union below references e twice,
    # re-executing the caller's whole edge pipeline per reference
    e = edges.select(
        F.col(c1).alias("a"), F.col(c2).alias("b"), w.alias("w")
    ).filter(F.col("a") != F.col("b")).localCheckpoint(eager=False)
    # symmetrize once; degree = distinct neighbors.  adj is PINNED:
    # every peel round joins against it, and without the checkpoint
    # each round would recompute the whole upstream edge pipeline
    # (measured 68s -> ~15s on the q70 corpus)
    adj = (
        e.unionAll(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = adj.groupBy("a").agg(F.count("*").alias("deg"))
    # status: 0 unknown, 1 center, 2 covered
    st = deg.select(
        F.col("a").alias("node"), "deg", F.lit(0).alias("status")
    ).localCheckpoint(eager=True)

    for _ in range(rounds):
        unk = st.filter(F.col("status") == 0).select("node", "deg")
        # early exit at the fixpoint: remaining rounds are no-ops, so
        # the result is identical to running all `rounds` (what the
        # unrolled SQL oracle does) — this only skips the idle jobs
        if unk.isEmpty():
            break
        # priority max over each unknown node's UNKNOWN neighbors
        nb_max = (
            adj.join(unk.withColumnRenamed("node", "a"), "a")
            .drop("deg")
            .join(
                unk.select(
                    F.col("node").alias("b"), F.col("deg").alias("bdeg")
                ),
                "b",
            )
            .groupBy("a")
            # field names must match the comparison struct below —
            # Spark struct comparison requires identical StructTypes
            .agg(
                F.max(
                    F.struct(
                        F.col("bdeg").alias("deg"),
                        F.col("b").alias("node"),
                    )
                ).alias("mx")
            )
        )
        centers_new = (
            unk.join(nb_max, unk["node"] == nb_max["a"], "left")
            .filter(
                F.col("mx").isNull()
                | (F.struct(F.col("deg"), F.col("node")) > F.col("mx"))
            )
            .select("node")
        )
        covered_new = (
            adj.join(
                centers_new.withColumnRenamed("node", "a"), "a"
            )
            .select(F.col("b").alias("node"))
            .distinct()
            .join(centers_new, "node", "left_anti")
        )
        st = st.select(
            "node",
            "deg",
            F.when(F.col("status") != 0, F.col("status"))
            .otherwise(F.lit(None))
            .alias("__keep"),
        )
        st = (
            st.join(
                centers_new.withColumn("__c", F.lit(1)), "node", "left"
            )
            .join(covered_new.withColumn("__x", F.lit(2)), "node", "left")
            .select(
                "node",
                "deg",
                F.coalesce("__keep", "__c", "__x", F.lit(0)).alias(
                    "status"
                ),
            )
            .localCheckpoint(eager=True)
        )

    n_unresolved = st.filter(F.col("status") == 0).count()
    if n_unresolved:
        raise RuntimeError(
            f"star peel did not converge in {rounds} rounds: "
            f"{n_unresolved} unresolved nodes — raise `rounds`"
        )

    centers = st.filter(F.col("status") == 1).select("node", "deg")
    # satellite -> best adjacent center by (w, center deg, center id)
    sat_best = (
        adj.join(
            centers.select(
                F.col("node").alias("b"), F.col("deg").alias("cdeg")
            ),
            "b",
        )
        .join(centers.withColumnRenamed("node", "a"), "a", "left_anti")
        .groupBy("a")
        .agg(F.max(F.struct("w", "cdeg", "b")).alias("best"))
        .select(
            F.col("a").alias("node"),
            F.col("best.b").alias("center"),
            F.lit(0).alias("is_center"),
        )
    )
    return centers.select(
        "node", F.col("node").alias("center"), F.lit(1).alias("is_center")
    ).unionAll(sat_best)
