"""Exact edit-distance similarity self-join by segment partitioning
(PassJoin family — Li, Deng, Jiang, Feng, VLDB'12 "PASS-JOIN: a
partition-based method for similarity joins").

The edit-distance counterpart of the exact set-similarity join in
``operators/set_join.py`` (q92): ALL string pairs within Levenshtein
distance tau, with provable 100% recall — no band/bucket scheme
(MinHash q19, SimHash q20, phonetic q61, del-1 q85) can promise that,
and del-1 deletion neighborhoods only reach tau=1.  The reference
thresholds raw edit counts between name variants
(src/eutilities/string_utils.py:59-77, feature X2); this operator
turns that per-pair score into a scalable *join*.

Algorithm (pigeonhole): partition every string of length ``l >= tau+1``
into ``tau+1`` contiguous segments (even split — the first segments get
``l div (tau+1)`` chars, the last ``l mod (tau+1)`` segments one char
more).  If ``ed(r, s) <= tau`` and ``|r| <= |s|``, then ``s`` contains
at least one of ``r``'s segments verbatim, within ``tau`` positions of
its home offset.  So: index (segment, source-length, segment-index)
from the shorter side, probe with the longer side's substrings at the
allowed (length, index, shifted-position) triples, verify candidates
with the native ``levenshtein``.

Scale design: one shuffle join keyed on the (substring, partner-length,
segment-index) triple — segment fan-out is ``tau+1`` rows per record,
probe fan-out is ``O(tau^2 * (tau+1))`` substrings per record, both
constants; no all-pairs step anywhere.  Strings shorter than ``tau+1``
cannot be segmented and fall into a short-pool length-bucket join whose
left side is *bounded by the alphabet*: there are at most
``sum(26^i, i<tau+1)`` distinct strings shorter than ``tau+1``, so the
bucket join is O(short-dictionary x length-band), not O(n^2).
Verification is the JVM-native ``levenshtein`` on candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments_expr(tau: int) -> str:
    """Segments of column s (length l): array<struct<i,seg>>.

    Even partition into k=tau+1 pieces: with b = l div k, rm = l mod k,
    segment j has length b + (j >= k-rm) and 1-based start
    1 + j*b + max(0, j - (k-rm)).
    """
    k = tau + 1
    return f"""
        transform(sequence(0, {tau}), j -> struct(
            j AS i,
            substring(s, 1 + j * (l div {k}) + greatest(0, j - ({k} - l % {k})),
                      (l div {k}) + CASE WHEN j >= {k} - (l % {k})
                                         THEN 1 ELSE 0 END) AS seg))
    """


def _probes_expr(tau: int) -> str:
    """Probe substrings of column s (length l): array<struct<lr,i,sub>>.

    For every partner length lr in [max(k, l - tau), l], every segment
    index j, and every start within tau of the segment's home offset
    (clamped to valid substring starts), emit the substring of the
    partner-segment's length.  The window is a superset of PassJoin's
    tight multi-match window, so completeness is preserved; the
    verify step removes the extra candidates.
    """
    k = tau + 1
    # P = home start of partner-segment j, LEN = its length; the probe
    # window [P-tau, P+tau] is always ascending (P >= 1), with starts
    # running past the end filtered out (st + LEN - 1 <= l).
    p = f"(1 + j * (lr div {k}) + greatest(0, j - ({k} - lr % {k})))"
    seg_len = (
        f"((lr div {k}) + CASE WHEN j >= {k} - (lr % {k}) "
        f"THEN 1 ELSE 0 END)"
    )
    return f"""
        flatten(transform(sequence(greatest({k}, l - {tau}), l), lr ->
            flatten(transform(sequence(0, {tau}), j ->
                transform(
                    filter(sequence(greatest(1, {p} - {tau}), {p} + {tau}),
                           st -> st + {seg_len} - 1 <= l),
                    st -> struct(
                        lr AS lr, j AS i,
                        substring(s, st, {seg_len}) AS sub))))))
    """


def passjoin_edit_join(
    df: DataFrame, str_col: str, tau: int = 2
) -> DataFrame:
    """All distinct unordered string pairs with levenshtein <= tau.

    Returns (s1, s2, ed) with s1 < s2 lexicographically; empty strings
    are dropped (the reference's X2 feature treats empties as a null
    sentinel, not a name).
    """
    if tau < 1:
        raise ValueError("tau must be >= 1")
    k = tau + 1
    strs = (
        df.select(F.col(str_col).alias("s"))
        .where(F.length("s") > 0)
        .distinct()
        .withColumn("l", F.length("s"))
    )

    longs = strs.where(F.col("l") >= k)
    seg = longs.select(
        F.col("s").alias("r"),
        F.col("l").alias("lr"),
        F.explode(F.expr(_segments_expr(tau))).alias("g"),
    ).select("r", "lr", F.col("g.i").alias("i"), F.col("g.seg").alias("seg"))
    probe = longs.select(
        F.col("s").alias("s2"),
        F.col("l").alias("l2"),
        F.explode(F.expr(_probes_expr(tau))).alias("p"),
    ).select(
        "s2",
        "l2",
        F.col("p.lr").alias("lr"),
        F.col("p.i").alias("i"),
        F.col("p.sub").alias("sub"),
    )
    seg_cand = (
        seg.join(
            probe,
            (seg.seg == probe.sub) & (seg.lr == probe.lr) & (seg.i == probe.i),
        )
        .where((F.col("l2") > seg.lr) | (F.col("r") < F.col("s2")))
        .select("r", "s2")
        .distinct()
    )

    # short pool: strings of length < k (bounded alphabet dictionary)
    # against every string within tau of their length, both directions
    shorts = strs.where(F.col("l") < k).select(
        F.col("s").alias("r"), F.col("l").alias("lr")
    )
    short_cand = (
        shorts.join(
            strs.select(F.col("s").alias("s2"), F.col("l").alias("l2")),
            F.col("l2").between(F.col("lr") - tau, F.col("lr") + tau),
        )
        .where(F.col("r") != F.col("s2"))
        .select(
            F.least("r", "s2").alias("r"), F.greatest("r", "s2").alias("s2")
        )
        .distinct()
    )

    cand = seg_cand.unionByName(short_cand)
    return (
        cand.withColumn("ed", F.levenshtein("r", "s2"))
        .where(F.col("ed") <= tau)
        .select(
            F.least("r", "s2").alias("s1"),
            F.greatest("r", "s2").alias("s2"),
            "ed",
        )
        .distinct()
    )
