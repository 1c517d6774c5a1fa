"""Canopy clustering — overlapping cheap-metric pre-groups (McCallum,
Nigam & Ungar, KDD 2000).

The classic two-threshold pre-clustering: pick a center, everything
within the LOOSE threshold joins its canopy (non-exclusively — a
point may sit in several canopies), everything within the TIGHT
threshold can never become a center itself; repeat until every point
is a center or tight-covered.  Downstream expensive comparison (the
pair feature stack) then runs only within canopies.  Canopies are the
OVERLAPPING complement of the engine's exclusive blocking passes:
exact/phonetic/LSH keys partition hard — a borderline mention lands
in one block — while canopies let it belong to every group it is
loosely similar to, so the expensive stage never loses a pair to an
arbitrary tie-break.  The reference has only hard keys
(database/model_building_using_rich_features.sql:438-444).

Deterministic parallel-rounds formulation (the same derandomized-peel
discipline as operators/pivot_clustering.py, which provably emulates
a sequential scan in priority order on the TIGHT graph):

  per round, every still-active point that is the strict
  (md5-hash, id) priority minimum over its still-active
  tight-neighborhood becomes a CENTER; active tight-neighbors of new
  centers are DEACTIVATED (they can never become centers);

  after the peel, canopy membership = every point within the loose
  threshold of a center, plus each center itself.

Sequential canopy formulations differ on whether loose-covered points
stay center-eligible; this operator pins the McCallum variant where
only TIGHT coverage removes candidates (loose membership is computed
from the full point set), documented here because the DuckDB oracle
re-derives exactly this variant.

Inputs are a directed similarity table (any candidate generator —
exact bounded, LSH buckets, IVF), so "cheap metric" is the caller's
choice, as the paper intends.  Per round: one neighbor-min
aggregation + two hash joins on the pinned symmetrized tight
adjacency; the loose join is one hash join at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pubmed_and_method_spark.operators.pivot_clustering import _priority


def canopy_assign(
    sims: DataFrame,
    q_col: str = "query_id",
    c_col: str = "cand_id",
    score_col: str = "cos",
    loose: float = 0.5,
    tight: float = 0.8,
    rounds: int = 16,
    salt: int = 7,
) -> DataFrame:
    """Overlapping canopy memberships from a similarity table.

    ``sims`` rows with score >= ``loose`` define the loose graph;
    rows with score >= ``tight`` the tight one (tight must imply
    loose: ``tight >= loose`` is asserted).  Runs exactly ``rounds``
    peel rounds on the tight graph, RAISES if any point is still
    undecided (the q70/q87 fixed-round convergence contract that
    makes the unrolled-CTE oracle exact), then emits

        (node, canopy, is_center)

    one row per membership: every point within loose of a center
    (``is_center`` = 0) plus each center in its own canopy
    (``is_center`` = 1).  Points that appear in ``sims`` but end up
    within loose of NO center cannot exist (every point is a center
    or tight-adjacent to one, and tight implies loose), so the
    output covers every node of the loose graph.  Isolated points
    never enter ``sims`` and stay implicit singletons by the same
    caller convention as the other clusterers.
    """
    if tight < loose:
        raise ValueError(f"tight ({tight}) must be >= loose ({loose})")
    # base is lazily pinned: the symmetrizing union references it
    # twice and loose/tight each materialize it again — unpinned, the
    # caller's similarity pipeline (e.g. the q90 pair-feature stack
    # with its Jaro-Winkler stage) re-executed once per reference
    base = sims.select(
        F.col(q_col).alias("a"),
        F.col(c_col).alias("b"),
        F.col(score_col).alias("s"),
    ).filter(F.col("a") != F.col("b")).localCheckpoint(eager=False)
    sym = base.unionAll(
        base.select(F.col("b").alias("a"), F.col("a").alias("b"), "s")
    )
    # pinned per-graph adjacency: every peel round re-joins tight_adj
    loose_adj = (
        sym.filter(F.col("s") >= loose)
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    tight_adj = (
        sym.filter(F.col("s") >= tight)
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # status over ALL loose-graph nodes: 0 active, 1 center, 2 removed
    st = (
        loose_adj.select("a")
        .distinct()
        .select(
            F.col("a").alias("node"),
            _priority(F.col("a"), salt).alias("h"),
            F.lit(0).alias("status"),
        )
        .localCheckpoint(eager=True)
    )

    for _ in range(rounds):
        act = st.filter(F.col("status") == 0).select("node", "h")
        if act.isEmpty():
            break
        nb_min = (
            tight_adj.join(act.withColumnRenamed("node", "a").drop("h"), "a")
            .join(
                act.select(
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
        centers_new = (
            act.join(nb_min, act["node"] == nb_min["a"], "left")
            .filter(
                F.col("mn").isNull()
                | (F.struct(F.col("h"), F.col("node")) < F.col("mn"))
            )
            .select("node")
        )
        removed_new = (
            tight_adj.join(
                centers_new.withColumnRenamed("node", "a"), "a"
            )
            .select(F.col("b").alias("node"))
            .distinct()
            .join(centers_new, "node", "left_anti")
        )
        st = (
            st.join(
                centers_new.withColumn("__c", F.lit(1)), "node", "left"
            )
            .join(removed_new.withColumn("__x", F.lit(2)), "node", "left")
            .select(
                "node",
                "h",
                F.when(F.col("status") != 0, F.col("status"))
                .otherwise(F.coalesce("__c", "__x", F.lit(0)))
                .alias("status"),
            )
            .localCheckpoint(eager=True)
        )

    n_active = st.filter(F.col("status") == 0).count()
    if n_active:
        raise RuntimeError(
            f"canopy peel did not converge in {rounds} rounds: "
            f"{n_active} active points — raise `rounds`"
        )

    centers = st.filter(F.col("status") == 1).select(
        F.col("node").alias("canopy")
    )
    members = (
        loose_adj.join(
            centers.withColumnRenamed("canopy", "b"), "b"
        )
        .select(
            F.col("a").alias("node"), F.col("b").alias("canopy")
        )
        .distinct()
        .withColumn("is_center", F.lit(0))
    )
    own = centers.select(
        F.col("canopy").alias("node"), "canopy", F.lit(1).alias("is_center")
    )
    # a center within loose of ANOTHER center is a plain member there
    # too (loose_adj never holds self-edges, so no duplicate arises)
    return own.unionAll(members)
