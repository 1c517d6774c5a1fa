"""Within-block hierarchical agglomerative clustering (HAC).

The fourth pluggable clusterer, and the one the AND literature
actually defaults to (threshold-stopped agglomerative merging over
pairwise scores — the reference's own comparison table pits exactly
this family against its classifier, src/comparison/result.txt): where
connected components (transitive closure) welds on ANY chain, star
bounds diameter at 2, and pivot (KwikCluster) approximates correlation
clustering, HAC merges the two closest clusters while their LINKAGE —
single / average / complete over the candidate-pair similarity graph,
absent pairs counting 0 — stays at or above a threshold.  Complete
linkage yields threshold-cliques (every internal pair scored >= t);
average linkage is the classic AND operating point between the
chain-happy single end (== connected components at t, proven by a
dual-implementation test) and the clique-strict complete end.

Scale shape: HAC is inherently sequential WITHIN a cluster hierarchy
but embarrassingly parallel ACROSS blocks — exactly the reference's
regime (its widest exact-name block is bounded, and every upstream
blocking pass here caps or salts block size).  So the operator is
``applyInPandas`` over the block key: one shuffle on ``block_col``,
then an Arrow-batched in-memory Lance-Williams agglomeration per
block, O(n^2) memory / O(n^3) worst-case time in the BLOCK size (not
the corpus), with a hard ``max_block_records`` guard that raises
rather than silently attempting a 10^5-record matrix.  At 10^12
mentions the plan is: blocking caps the block width, HAC parallelism
is #blocks, and no stage ever materializes cross-block state.

Determinism: merges pick the highest linkage, ties broken by the
smallest (min-id, min-id) cluster pair under lexicographic string
order; all arithmetic is float64 in a fixed order, so the result is a
pure function of the edge set — invariant to input row order and
partitioning (pytest-pinned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINKAGES = ("single", "average", "complete")

_OUT_SCHEMA = (
    "block_key string, id string, cluster string, cluster_size int"
)


def _hac_block(
    ids: list[str],
    edges: list[tuple[int, int, float]],
    threshold: float,
    linkage: str,
) -> dict[str, tuple[str, int]]:
    """Exact threshold-stopped HAC on one block.

    ``ids`` sorted; ``edges`` as (i, j, sim) index pairs.  Returns
    id -> (cluster id = min member id, cluster size).
    Lance-Williams updates keep each merge O(n): with missing pairs
    as 0, average linkage is the MEAN over all |A|*|B| cross pairs,
    so d(A+B, C) = (|A| d(A,C) + |B| d(B,C)) / (|A|+|B|); single is
    max, complete is min (absent pair = 0 floors it).
    """
    n = len(ids)
    sim = np.zeros((n, n), dtype=np.float64)
    for i, j, s in edges:
        v = max(sim[i, j], s)
        sim[i, j] = sim[j, i] = v
    np.fill_diagonal(sim, 0.0)

    active = list(range(n))
    members: dict[int, list[int]] = {i: [i] for i in range(n)}
    # min member id (string) per cluster for the deterministic tie-break
    rep: dict[int, str] = {i: ids[i] for i in range(n)}

    while len(active) > 1:
        # numpy argmax over the active submatrix (O(n^2) per merge);
        # exact-float ties (identical arithmetic -> identical bits)
        # break by the smallest (min-id, min-id) cluster pair
        act = np.array(active)
        sub = sim[np.ix_(act, act)]
        iu = np.triu_indices(len(act), 1)
        vals = sub[iu]
        vmax = vals.max()
        if vmax < threshold:
            break
        best = None  # ((repA, repB), a, b)
        for c in np.nonzero(vals == vmax)[0]:
            a, b = int(act[iu[0][c]]), int(act[iu[1][c]])
            ra, rb = rep[a], rep[b]
            if ra > rb:
                ra, rb = rb, ra
            if best is None or (ra, rb) < best[0]:
                best = ((ra, rb), a, b)
        _, a, b = best
        na, nb = len(members[a]), len(members[b])
        if linkage == "average":
            merged = (na * sim[a] + nb * sim[b]) / (na + nb)
        elif linkage == "single":
            merged = np.maximum(sim[a], sim[b])
        else:  # complete
            merged = np.minimum(sim[a], sim[b])
        sim[a] = merged
        sim[:, a] = merged
        sim[a, a] = 0.0
        members[a].extend(members[b])
        rep[a] = min(rep[a], rep[b])
        del members[b], rep[b]
        active.remove(b)

    out: dict[str, tuple[str, int]] = {}
    for c in active:
        cid = rep[c]
        size = len(members[c])
        for i in members[c]:
            out[ids[i]] = (cid, size)
    return out


def hac_within_blocks(
    edges: DataFrame,
    block_col: str = "block_key",
    id_cols: tuple[str, str] = ("id1", "id2"),
    sim_col: str = "sim",
    threshold: float = 0.5,
    linkage: str = "average",
    max_block_records: int = 10_000,
) -> DataFrame:
    """Cluster each block's candidate-pair graph by threshold-stopped
    HAC.  ``edges``: one row per scored candidate pair, both ids
    inside ``block_col``'s block (string ids).  Output: one row per
    distinct id per block — (block_key, id, cluster, cluster_size),
    cluster = smallest member id.  Records never paired stay
    singletons only if they appear in ``edges``; callers union
    unpaired records themselves (same contract as the other
    clusterers).
    """
    if linkage not in LINKAGES:
        raise ValueError(f"linkage {linkage!r}; one of {LINKAGES}")
    c1, c2 = id_cols
    slim = edges.select(
        F.col(block_col).cast("string").alias("block_key"),
        F.col(c1).cast("string").alias("__i1"),
        F.col(c2).cast("string").alias("__i2"),
        F.col(sim_col).cast("double").alias("__s"),
    ).filter(F.col("__i1") != F.col("__i2"))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        bk = pdf["block_key"].iloc[0]
        ids = sorted(set(pdf["__i1"]) | set(pdf["__i2"]))
        if len(ids) > max_block_records:
            raise ValueError(
                f"block {bk!r} has {len(ids)} records > "
                f"max_block_records={max_block_records}; cap the "
                "blocking pass upstream"
            )
        idx = {v: i for i, v in enumerate(ids)}
        ed = [
            (idx[a], idx[b], float(s))
            for a, b, s in zip(pdf["__i1"], pdf["__i2"], pdf["__s"])
        ]
        assign = _hac_block(ids, ed, threshold, linkage)
        return pd.DataFrame(
            {
                "block_key": bk,
                "id": ids,
                "cluster": [assign[v][0] for v in ids],
                "cluster_size": [assign[v][1] for v in ids],
            }
        )

    return slim.groupBy("block_key").applyInPandas(run, _OUT_SCHEMA)
