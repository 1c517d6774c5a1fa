"""Large-star / small-star (hash-min) connected components.

The reference stops at pairwise labels; the north rule requires
transitive entity clusters.  This is the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) expressed as pure DataFrame ops —
no collect_list per node (a hot node's neighbor list never
materializes in one task), no RDDs, O(log n) rounds.

Physical-plan choices (measured on 1.2M-edge graphs, local[8/32]):

- groupBy+join (NOT window-min) per star: groupBy keeps map-side
  partial aggregation, so hub-node neighbor lists reduce before the
  shuffle instead of buffering in one task;
- every star round is materialized (localCheckpoint) before the
  next: star plans reference their input 2-4x, so lazy composition
  recomputes the base exponentially in the number of fused rounds;
- AQE is toggled OFF inside the loop: the loop bodies are small,
  fixed-size shuffles where adaptive re-optimization adds a driver
  round-trip per stage and contributes nothing (partition count is
  pinned to the cluster's parallelism instead);
- per-iteration ``localCheckpoint`` truncates lineage, and the
  previous iteration's blocks are unpersisted (at production scale
  this is an Iceberg stage write per iteration — plans/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame, n_parts: int) -> DataFrame:
    """(u,v) -> for every neighbor v > u: (v, min(N(u) ∪ {u})).

    groupBy + join rather than a window min: groupBy gets map-side
    partial aggregation, so a hub node's edge list is reduced to one
    row per map partition BEFORE the shuffle — a window would shuffle
    and buffer the hub's entire neighborhood in a single task.

    Partitioning is pinned per-plan with repartition(n, u) — the
    groupBy and the min-join both reuse it, and no session conf is
    touched (the loop must be safe to run concurrently with other
    queries in the same session).
    """
    bidir = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).repartition(n_parts, "u")
    mins = bidir.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.withColumn("mn", F.least("mn", "u"))
    # no trailing distinct: the next _small_star dedupes on entry, and
    # input edges are already distinct, so duplicate output rows are
    # bounded at one per input edge — skipping the shuffle is free.
    # shuffle_hash hint: both sides are already hash-partitioned on u
    # (repartition above; groupBy preserves it), so a broadcast here
    # saves NO exchange while its driver-side relation build would
    # linger in driver memory one round per star (ContextCleaner frees
    # broadcasts only after a driver GC) — the same accumulation that
    # exhausted the cluster-mode driver in the upstream pair plan at
    # 33M turns (session.py AQE-threshold note).  The hint pins the
    # zero-extra-shuffle plan in every round.
    return (
        bidir.join(mins.hint("shuffle_hash"), "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame, n_parts: int) -> DataFrame:
    """Direct edges high->low, then point each neighborhood at its min.

    No entry ``distinct`` (r06, guide §2.4 "a distinct on data that is
    already unique"): large_star's duplicate output rows (bounded at
    one per input edge) don't change groupBy-min, and the relinked
    duplicates they produce are removed by the FINAL distinct this
    function already pays for the convergence checksum — the entry
    distinct was a whole extra (u, v)-keyed exchange per round for
    set-identical output."""
    directed = (
        edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .repartition(n_parts, "u")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("mn"))
    # shuffle_hash for the same no-extra-exchange reason as _large_star
    relinked = (
        directed.join(mins.hint("shuffle_hash"), "u")
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    self_link = mins.select(F.col("u"), F.col("mn").alias("v"))
    return relinked.union(self_link).distinct()


def connected_components(
    edges: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    max_iter: int = 20,
) -> DataFrame:
    """Return (id, component) where component = min node id reachable.

    ``edges`` may be strings or numerics; comparison uses the column's
    natural ordering.  Isolated nodes (absent from edges) are the
    caller's concern — union them back with component = own id.
    """
    spark = edges.sparkSession
    e = (
        edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
        .where(F.col(u_col) != F.col(v_col))
        .distinct()
    )
    # first materialization runs the caller's upstream plan — keep the
    # session's AQE setting for that (skew/coalesce still valuable there)
    e = e.localCheckpoint(eager=True)

    def _checksum(df: DataFrame):
        # order-insensitive set fingerprint: xor of row hashes (no
        # overflow under ANSI mode, unlike sum).
        return df.select(
            F.count("*").alias("c"),
            F.coalesce(
                F.bit_xor(F.xxhash64("u", "v")), F.lit(0).cast("long")
            ).alias("h"),
        ).first()

    # Partitioning inside the loop is pinned per-plan via
    # repartition(n, u) in the stars — NOT by mutating session conf
    # (spark.conf.set is process-global: it would silently re-plan any
    # concurrently-planned query in this session and make the loop
    # non-reentrant).  Explicit repartition also keeps AQE from
    # inserting a re-optimization round-trip per tiny fixed-size stage:
    # AQE does not coalesce user-specified repartitionings.
    n_parts = spark.sparkContext.defaultParallelism
    prev = _checksum(e)
    for _ in range(max_iter):
        # materialize EVERY star: each star's plan references its
        # input 2-4x (union + groupBy branch + join branch), so
        # fusing k stars into one lazy plan recomputes the base up
        # to 4^k times — measured 90s/round fused vs ~6s/round
        # materialized on a 1.3M-edge graph.  Spark's ReuseExchange
        # only dedupes identical exchanges inside one stage tree,
        # not across nested star compositions.
        e1 = _large_star(e, n_parts).localCheckpoint(eager=True)
        e2 = _small_star(e1, n_parts).localCheckpoint(eager=True)
        e1.unpersist()
        new = _checksum(e2)
        # free the previous iteration's checkpointed blocks —
        # without this the loop accumulates one stale RDD per round
        # in the block manager.
        e.unpersist()
        e = e2
        if prev.c == new.c and prev.h == new.h:
            break
        prev = new

    members = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return members.union(roots).groupBy("id").agg(
        F.min("component").alias("component")
    )


def update_components(
    components: DataFrame,
    new_edges: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    max_iter: int = 20,
) -> DataFrame:
    """Incremental merge: fold a batch of new edges into an existing
    (id, component) labeling by re-running hash-min CC ONLY on the
    components the batch touches.

    Because labels are canonical (min reachable id), recomputing the
    union of the touched components' star edges (id -> component) with
    the batch edges reproduces exactly what batch CC over the whole
    graph would assign — row-identical, pytest-pinned
    (tests/test_connected_components.py::test_update_components_matches_batch).
    Untouched components pass through without a shuffle of their
    members' neighborhoods.

    Per-batch cost is O(touched members + batch), never O(graph): the
    touched-id and affected-component sets are batch-bounded and ride
    broadcast semi/anti joins against the big labeling, so the only
    full pass over ``components`` is two one-scan hash probes.  This is
    the clustering half of the streaming frontier
    (streaming/incremental.run_incremental_pairs feeds it).
    """
    e = new_edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
    touched = (
        e.select(F.col("u").alias("id"))
        .union(e.select(F.col("v").alias("id")))
        .distinct()
    )
    affected = (
        components.join(F.broadcast(touched), "id")
        .select("component")
        .distinct()
    )
    sub = components.join(F.broadcast(affected), "component", "left_semi")
    untouched = components.join(
        F.broadcast(affected), "component", "left_anti"
    )
    star_edges = sub.select(
        F.col("id").alias("u"), F.col("component").alias("v")
    )
    merged = connected_components(
        star_edges.unionByName(e), max_iter=max_iter
    )
    return untouched.select("id", "component").unionByName(merged)


def delete_and_repair(
    components: DataFrame,
    edges: DataFrame,
    deleted: DataFrame,
    id_col: str = "id",
    u_col: str = "u",
    v_col: str = "v",
    max_iter: int = 20,
) -> DataFrame:
    """Retract records from a clustering and repair ONLY the touched
    components — the deletion complement of :func:`update_components`
    (which folds new edges in).

    Deleting a record can SPLIT its component (it may have been the
    bridge), so unlike the additive case the repair must re-resolve
    the touched components from their remaining raw edges, not their
    star edges.  Because labels are canonical (min reachable id),
    re-running hash-min CC on exactly those edges reproduces what a
    full batch recompute over the remaining graph would assign —
    row-identical, pytest-pinned.  Untouched components pass through
    without a shuffle of their neighborhoods; surviving members whose
    every edge died re-emerge as singletons.

    The production shape is a privacy retraction: drop a user's
    conversations, and the entity clusters they bridged must fall
    apart rather than keep asserting the weld.  Per-batch cost is
    O(touched members + their edges), never O(graph).
    """
    dd = deleted.select(F.col(id_col).alias("id")).distinct()
    affected = (
        components.join(dd, "id", "left_semi")
        .select("component")
        .distinct()
    )
    untouched = components.join(affected, "component", "left_anti")
    survivors = components.join(affected, "component", "left_semi").join(
        dd, "id", "left_anti"
    )
    e = (
        edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .join(
            survivors.select(F.col("id").alias("u")), "u", "left_semi"
        )
        .join(
            survivors.select(F.col("id").alias("v")), "v", "left_semi"
        )
    )
    repaired = connected_components(e, "u", "v", max_iter=max_iter)
    singles = survivors.select("id").join(
        repaired, "id", "left_anti"
    ).select("id", F.col("id").alias("component"))
    return (
        untouched.select("id", "component")
        .unionByName(repaired.select("id", "component"))
        .unionByName(singles)
    )
