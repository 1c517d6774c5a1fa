"""Pivot correlation clustering — the random-permutation alternative
to transitive closure and star covering (KwikCluster, Ailon, Charikar
& Newman, STOC 2005; parallelized rounds per Chierichetti, Dalvi &
Kumar, KDD 2014).

The reference's only clustering is the namespace weld
(database/and_datasets.sql:56-68): transitive closure, where one
false edge anywhere in a chain merges two entities.  Star clustering
(operators/star_clustering.py) bounds the diameter but biases centers
toward high degree.  Pivot clustering instead draws pivots from a
RANDOM PERMUTATION of the nodes — the property behind KwikCluster's
expected 3-approximation for correlation clustering — and assigns
each remaining node to its first adjacent pivot.  Clusters are stars
around pivots (diameter <= 2) with no degree bias, so hub mentions
don't systematically swallow their neighborhoods.

We run the deterministic PARALLEL-ROUNDS variant (the form a
multi-round MapReduce/Spark job actually executes, KDD'14 §3): the
"permutation" is a portable hash priority (md5-derived, engine-exact
in both Spark and DuckDB), and each round

  1. every unresolved node whose (hash, id) priority is a strict
     LOCAL MINIMUM over its unresolved neighborhood becomes a pivot;
  2. every unresolved neighbor of a new pivot immediately joins the
     minimum-priority adjacent NEW pivot and leaves the graph.

In-round attachment is what distinguishes the semantics from the
star peel: a node claimed in round k is invisible to later pivots,
exactly like the sequential scan removes a cluster before choosing
the next pivot.  (Across rounds the parallel variant may attach a
node to a later-in-permutation pivot than the strict sequential scan
would — that is the documented KDD'14 tradeoff for O(log n) rounds,
not an implementation accident.)

Per round: one neighbor-min aggregation + two hash joins — the same
shuffle discipline as large-star/small-star CC and the star peel; no
driver state beyond the loop counter.  Pivots form an independent
set by construction (an unresolved neighbor of a pivot is resolved
the same round), and every satellite is edge-adjacent to its pivot —
both properties are pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _priority(node: Column, salt: int) -> Column:
    """Portable permutation stand-in: first 15 md5 hex chars of
    ``node#salt`` as a non-negative long (fits: 60 bits).  Engine-
    exact twin in DuckDB: CAST('0x' || substr(md5(..), 1, 15) AS
    BIGINT) — parity asserted in tests/test_queries_oracle.py via the
    q87 value oracle."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("#", node, F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("long")


def pivot_clusters(
    edges: DataFrame,
    id_cols: tuple[str, str] = ("id1", "id2"),
    rounds: int = 16,
    salt: int = 7,
) -> DataFrame:
    """Cluster the undirected match graph ``edges`` by parallel pivot.

    Runs exactly ``rounds`` election rounds, then RAISES if any node
    is still unresolved — the result is always a converged fixpoint
    and a pure function of (edges, rounds, salt), which is what makes
    the unrolled-CTE DuckDB oracle exact (the q66/q70 iterative-
    oracle pattern).  Each round removes at least the globally
    minimum-priority unresolved node and its neighborhood, and with
    hash priorities the expected round count is O(log n), so 16
    rounds is far past the corpus fixpoint (observed: 3-4).

    Returns one row per node that appears in ``edges``:
    (node, pivot, is_pivot) — ``pivot`` is the cluster id (the
    pivot's own id for pivots).  Isolated mentions never enter the
    edge list and stay singleton clusters by the same caller
    convention as connected_components / star_clusters.
    """
    c1, c2 = id_cols
    # lazily pinned: the symmetrizing union below references e twice,
    # re-executing the caller's whole edge pipeline per reference
    e = edges.select(F.col(c1).alias("a"), F.col(c2).alias("b")).filter(
        F.col("a") != F.col("b")
    ).localCheckpoint(eager=False)
    # symmetrize once and PIN: every round joins against adj, and
    # without the checkpoint each round would recompute the whole
    # upstream edge pipeline (the star-peel lesson,
    # operators/star_clustering.py:66-76)
    adj = (
        e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # status: 0 unresolved, 1 pivot, 2 attached
    st = (
        adj.select("a")
        .distinct()
        .select(
            F.col("a").alias("node"),
            _priority(F.col("a"), salt).alias("h"),
            F.lit(0).alias("status"),
            F.lit(None).cast(adj.schema["a"].dataType).alias("pivot"),
        )
        .localCheckpoint(eager=True)
    )

    for _ in range(rounds):
        unk = st.filter(F.col("status") == 0).select("node", "h")
        # fixpoint early-exit: remaining rounds are no-ops, so the
        # result equals the full-``rounds`` unrolled SQL derivation
        if unk.isEmpty():
            break
        # min (h, id) priority over each unresolved node's unresolved
        # neighbors; field names must match the comparison struct
        # (Spark struct comparison requires identical StructTypes)
        nb_min = (
            adj.join(unk.withColumnRenamed("node", "a").drop("h"), "a")
            .join(
                unk.select(
                    F.col("node").alias("b"), F.col("h").alias("bh")
                ),
                "b",
            )
            .groupBy("a")
            .agg(
                F.min(
                    F.struct(
                        F.col("bh").alias("h"), F.col("b").alias("node")
                    )
                ).alias("mn")
            )
        )
        pivots_new = (
            unk.join(nb_min, unk["node"] == nb_min["a"], "left")
            .filter(
                F.col("mn").isNull()
                | (F.struct(F.col("h"), F.col("node")) < F.col("mn"))
            )
            .select("node", "h")
        )
        # in-round attachment: unresolved non-pivot neighbors join the
        # minimum-priority adjacent NEW pivot and leave the graph
        attached_new = (
            adj.join(
                pivots_new.select(
                    F.col("node").alias("b"), F.col("h").alias("ph")
                ),
                "b",
            )
            .join(unk.select(F.col("node").alias("a")), "a")
            .join(
                pivots_new.select(F.col("node").alias("a")),
                "a",
                "left_anti",
            )
            .groupBy("a")
            .agg(
                F.min(
                    F.struct(
                        F.col("ph").alias("h"), F.col("b").alias("node")
                    )
                ).alias("bp")
            )
            .select(
                F.col("a").alias("node"), F.col("bp.node").alias("to")
            )
        )
        st = (
            st.join(
                pivots_new.select("node").withColumn("__p", F.lit(1)),
                "node",
                "left",
            )
            .join(attached_new.withColumn("__x", F.lit(2)), "node", "left")
            .select(
                "node",
                "h",
                F.when(F.col("status") != 0, F.col("status"))
                .otherwise(F.coalesce("__p", "__x", F.lit(0)))
                .alias("status"),
                F.when(F.col("status") != 0, F.col("pivot"))
                .when(F.col("__p") == 1, F.col("node"))
                .otherwise(F.col("to"))
                .alias("pivot"),
            )
            .localCheckpoint(eager=True)
        )

    n_unresolved = st.filter(F.col("status") == 0).count()
    if n_unresolved:
        raise RuntimeError(
            f"pivot rounds did not converge in {rounds}: "
            f"{n_unresolved} unresolved nodes — raise `rounds`"
        )
    return st.select(
        "node",
        "pivot",
        (F.col("status") == 1).cast("int").alias("is_pivot"),
    )
