"""One-to-one record linkage: greedy max-weight bipartite matching by
parallel local dominance.

The reference links catalogs with unconstrained similarity joins plus
a 1:1 pre-enforcement filter (J7; database/
link_pubmed_to_aminer_amg_s2.sql) — every left record keeps its best
right INDEPENDENTLY, so two lefts can claim the same right and a
homonym silently double-links.  The linkage-correct discipline is a
MATCHING: each record on either side used at most once, conflicts
resolved globally by score.

Exact max-weight matching is sequential (Hungarian); the standard
scalable surrogate is GREEDY matching by descending (score, l, r) —
a 1/2-approximation with strong practical quality.  Sequential greedy
is also unparallelizable as written, so we run its provably
equivalent parallel form (the same local-dominance argument as the
star-clustering peel): each round, an edge is matched iff it is the
priority maximum of BOTH endpoints' surviving edges ("locally
dominant"); matched endpoints leave the graph; repeat.  Every round
matches at least the globally maximum surviving edge, and with a
total priority order the union of rounds is EXACTLY the sequential
greedy matching.

Scale: per round, two keyed max-aggregations (map-side partial) + two
hash semi/anti joins on a strictly shrinking edge set; state is
localCheckpoint-pinned like the CC operator.  Worst case is an
equal-score bipartite clique (c rounds for a c-clique — greedy is
inherently serial there), which is why ``rounds`` is explicit and the
operator RAISES on non-convergence instead of silently truncating:
the output stays a pure function of (pairs, rounds), which is what
lets a SQL oracle unroll the identical rounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def greedy_one_to_one(
    pairs: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
    score_col: str = "score",
    rounds: int = 12,
) -> DataFrame:
    """Greedy 1:1 matching of a scored bipartite pair table.

    Returns (left_col, right_col, score_col, round_matched) — one row
    per matched pair; records whose every candidate lost a conflict
    are simply absent (unmatched).  Raises if conflicts survive all
    ``rounds``.
    """
    e = pairs.select(
        F.col(left_col).alias("l"),
        F.col(right_col).alias("r"),
        F.col(score_col).cast("double").alias("s"),
    ).localCheckpoint(eager=True)
    matched: list[DataFrame] = []

    for k in range(1, rounds + 1):
        if e.isEmpty():
            break
        bl = e.groupBy("l").agg(
            F.max(
                F.struct(F.col("s").alias("s"), F.col("r").alias("o"))
            ).alias("bl")
        )
        br = e.groupBy("r").agg(
            F.max(
                F.struct(F.col("s").alias("s"), F.col("l").alias("o"))
            ).alias("br")
        )
        m = (
            e.join(bl, "l")
            .filter(
                F.struct(F.col("s").alias("s"), F.col("r").alias("o"))
                == F.col("bl")
            )
            .join(br, "r")
            .filter(
                F.struct(F.col("s").alias("s"), F.col("l").alias("o"))
                == F.col("br")
            )
            .select("l", "r", "s", F.lit(k).alias("round_matched"))
            .localCheckpoint(eager=True)
        )
        matched.append(m)
        e = (
            e.join(m.select("l"), "l", "left_anti")
            .join(m.select("r"), "r", "left_anti")
            .localCheckpoint(eager=True)
        )

    if not e.isEmpty():
        n = e.count()
        raise RuntimeError(
            f"greedy matching did not converge in {rounds} rounds: "
            f"{n} conflicted pairs remain — raise `rounds`"
        )

    spark = pairs.sparkSession
    if not matched:
        out = spark.createDataFrame(
            [], "l string, r string, s double, round_matched int"
        )
    else:
        out = matched[0]
        for m in matched[1:]:
            out = out.unionAll(m)
    return out.select(
        F.col("l").alias(left_col),
        F.col("r").alias(right_col),
        F.col("s").alias(score_col),
        "round_matched",
    )


def linkage_waterfall(
    pairs: DataFrame,
    tiers: list[tuple[str, Column]],
    id1_col: str = "mention_id1",
    id2_col: str = "mention_id2",
) -> DataFrame:
    """Tiered linkage waterfall (the census/Splink production cascade;
    Winkler's multi-pass design): run DETERMINISTIC passes first, and
    every record matched by an earlier pass is CONSUMED — later tiers
    only see pairs whose both endpoints are still unmatched.  The
    reference scores every candidate pair with one model
    unconditionally; a production linkage spends its cheap exact
    rules first and its probabilistic budget only on what survives
    them.

    ``tiers`` is an ordered list of (name, boolean Column over the
    pair row).  Within a tier ALL qualifying pairs match
    simultaneously (no order dependence); between tiers, consumption
    is two hash anti-joins per tier on the matched-id set — a fixed
    small number of id-keyed exchanges on a strictly shrinking pair
    table, no global sort, no driver state.  Matched-id sets are
    localCheckpoint-pinned so tier t+1 never recomputes tier t's
    filter chain.

    Returns (id1, id2, tier) for every matched pair, tier = the FIRST
    tier whose rule fired with both endpoints alive.
    """
    out = None
    remaining = pairs
    for name, cond in tiers:
        # lazy-pin: `hit` is referenced twice (output rows + consumed
        # ids) and `remaining` twice per subsequent tier — unpinned,
        # each reference re-inlines the whole upstream filter/anti-join
        # chain into the plan (r06: Catalyst planning time dominated
        # the corpus-scale queries; guide §3.3)
        hit = remaining.filter(cond).localCheckpoint(eager=False)
        tier_rows = hit.select(
            F.col(id1_col), F.col(id2_col), F.lit(name).alias("tier")
        )
        out = tier_rows if out is None else out.unionByName(tier_rows)
        ids = (
            hit.select(F.col(id1_col).alias("__id"))
            .unionByName(hit.select(F.col(id2_col).alias("__id")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        remaining = remaining.join(
            ids.select(F.col("__id").alias(id1_col)), id1_col, "left_anti"
        ).join(
            ids.select(F.col("__id").alias(id2_col)), id2_col, "left_anti"
        ).localCheckpoint(eager=False)
    return out
