"""Group linkage: link GROUPS of records across two disjoint record
sets by the overlap of their matched members (On/Koudas/Srivastava/
Toman, "Group Linkage", ICDE 2007 — the set-resemblance instance).

The reference links individual mentions and only ever within one
corpus snapshot (database/link_pubmed_to_aminer_amg_s2.sql links
RECORD to RECORD); production ER regularly needs the group-level
question instead — is the author BLOCK in yesterday's snapshot the
same real-world group as this block in today's, did a source rename
split a group, which incoming group should absorb this batch?  No
member record is shared across snapshots (the record sets are
disjoint), so q83's containment churn — which keys on shared
mention_ids — cannot answer it.  Group linkage matches members by a
robust member KEY (here: phonetic surname + shown given name, the
q61 typo-absorbing key) and scores group pairs by the Jaccard
resemblance of their member-key sets.

Scale: member keys explode to one row per (group, key) — distinct-
deduped per side — then ONE equi-join on the member key and one
(group_a, group_b) groupBy; group sizes are groupBys of the same
narrow tables joined back by group id.  Nothing is quadratic in
groups: candidate group pairs exist only where a member key is
shared, exactly like a blocking pass.  The one skew hazard is an
ultra-frequent member key (a "john S530_john" shared by thousands of
groups fans out quadratically in the key join); ``max_key_freq``
drops keys above a global frequency cap before the join — the
standard stop-key discipline, same rationale as the MinHash band
caps (operators/blocking.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_linkage(
    a: DataFrame,
    b: DataFrame,
    group_col: str = "group_id",
    member_col: str = "member_key",
    min_jaccard: float = 0.0,
    max_key_freq: int | None = None,
) -> DataFrame:
    """Link groups in ``a`` to groups in ``b`` by member-key Jaccard.

    Inputs are (group, member) tables — one row per member record;
    member keys are deduplicated per group (set semantics).  Returns
    (group_a, group_b, n_a, n_b, n_common, jaccard) for every group
    pair sharing at least one member key and passing ``min_jaccard``
    (applied as an exact integer-vs-product comparison so the float
    threshold behaves identically across engines).  ``max_key_freq``
    (counted over BOTH sides' deduped keys) drops promiscuous member
    keys before the join — a recall-for-cost knob at scale, off by
    default so small-scale results stay exact.
    """
    ga = a.select(
        F.col(group_col).alias("group_a"), F.col(member_col).alias("mk")
    ).distinct()
    gb = b.select(
        F.col(group_col).alias("group_b"), F.col(member_col).alias("mk")
    ).distinct()
    if max_key_freq is not None:
        freq = (
            ga.select("mk")
            .unionAll(gb.select("mk"))
            .groupBy("mk")
            .agg(F.count(F.lit(1)).alias("__kf"))
            .filter(F.col("__kf") <= max_key_freq)
            .select("mk")
        )
        ga = ga.join(freq, "mk")
        gb = gb.join(freq, "mk")
    na = ga.groupBy("group_a").agg(F.count(F.lit(1)).alias("n_a"))
    nb = gb.groupBy("group_b").agg(F.count(F.lit(1)).alias("n_b"))
    common = (
        ga.join(gb, "mk")
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    denom = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return (
        common.join(na, "group_a")
        .join(nb, "group_b")
        .filter(F.col("n_common") >= F.lit(min_jaccard) * denom)
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(F.col("n_common") / denom, 6).alias("jaccard"),
        )
    )
