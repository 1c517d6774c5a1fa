"""Property-based invariants (hypothesis) for the kernels whose
hand-computed tests only pin a few points: the pure-Python JW kernel,
the portable phonetic key (vs an independent pure-Python model of the
documented algorithm), and randomized brute-force cross-checks of the
contingency pair counts and duplicate-span extraction.

Spark-backed properties use few examples (every example is a Spark
job); the pure kernels run hundreds.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401  (fixture deps)

words = st.text(alphabet="abcde", min_size=0, max_size=10)


@given(words, words)
@settings(max_examples=200, deadline=None)
def test_jaro_winkler_properties(a, b):
    from pubmed_and_method_spark.functions.strings import jaro_winkler

    v = jaro_winkler(a, b)
    assert 0.0 <= v <= 1.0
    assert v == jaro_winkler(b, a)  # symmetric
    if a and a == b:
        assert v == 1.0
    if a and b and v == 1.0:
        assert a == b  # 1.0 only on identity (nonempty)
    # null/empty contract (reference string_utils.py:80-83)
    assert jaro_winkler("", b) == 0.0 and jaro_winkler(a, None) == 0.0


@given(words, words)
@settings(max_examples=200, deadline=None)
def test_editops_diff_properties(a, b):
    from pubmed_and_method_spark.functions.strings import (
        _editops_diff_chars,
    )

    d = _editops_diff_chars(a, b)
    assert (d == []) == (a == b)  # empty iff equal
    assert len(d) <= len(a) + len(b)


_PHON_CODES_TEST = None


def _py_phonetic_key(s: str) -> str:
    """Independent pure-Python model of functions/names.phonetic_key's
    documented algorithm (module variant: vowels AND h/w both
    separate codes): lower -> strip non-letters -> map to Soundex
    digit classes -> collapse runs -> drop first code -> drop 0s ->
    first letter + first 3 codes padded with 0."""
    global _PHON_CODES_TEST
    if _PHON_CODES_TEST is None:
        from pubmed_and_method_spark.functions.names import _PHON_CODES

        _PHON_CODES_TEST = _PHON_CODES
    table = str.maketrans("abcdefghijklmnopqrstuvwxyz", _PHON_CODES_TEST)
    s = "".join(ch for ch in s.lower() if ch.isalpha() and ch.isascii())
    if not s:
        return ""
    code = s.translate(table)
    out = [code[0]]
    for ch in code[1:]:
        if ch != out[-1]:
            out.append(ch)
    tail = "".join(c for c in out[1:] if c != "0")
    return s[0].upper() + (tail[:3]).ljust(3, "0")


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@given(st.text(alphabet="abcdehw", min_size=0, max_size=12),
       st.integers(min_value=0, max_value=11))
@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_phonetic_key_properties(duck, s, i):
    """The portable SQL key equals an independent Python model of the
    documented algorithm; output shape is pinned; inserting an
    adjacent duplicate letter never changes the key (Soundex run
    collapse)."""
    import re

    from pubmed_and_method_spark.functions.names import phonetic_key_sql

    expr = phonetic_key_sql("s")
    got = duck.execute(
        f"SELECT {expr} FROM (SELECT ? AS s)", [s]
    ).fetchone()[0]
    assert got == _py_phonetic_key(s)
    assert re.fullmatch(r"|[A-Z][0-6]{3}", got)
    if s:
        j = min(i, len(s) - 1)
        doubled = s[: j + 1] + s[j] + s[j + 1 :]
        got2 = duck.execute(
            f"SELECT {expr} FROM (SELECT ? AS s)", [doubled]
        ).fetchone()[0]
        assert got2 == got


assignment_lists = st.lists(
    st.tuples(
        st.sampled_from(["C1", "C2", "C3"]),
        st.sampled_from(["e1", "e2", "e3"]),
    ),
    min_size=0,
    max_size=12,
)


@given(assignment_lists)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pair_counting_matches_bruteforce(spark, rows):
    """q76's O(cells) pair counts equal the literal all-pairs
    enumeration on random small assignments."""
    from itertools import combinations

    from pubmed_and_method_spark.operators.er_metrics import (
        pair_counting_metrics,
    )

    df = spark.createDataFrame(rows, "cluster string, entity_id string") \
        if rows else spark.createDataFrame([], "cluster string, entity_id string")
    r = pair_counting_metrics(df).collect()[0]
    tp = pc = pe = 0
    for (c1, e1), (c2, e2) in combinations(rows, 2):
        pc += c1 == c2
        pe += e1 == e2
        tp += (c1 == c2) and (e1 == e2)
    n = len(rows)
    assert (r.n_items, r.tp_pairs, r.pred_pairs, r.true_pairs,
            r.total_pairs) == (n, tp, pc, pe, n * (n - 1) // 2)


doc_lists = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "omega"]),
        min_size=0,
        max_size=10,
    ),
    min_size=1,
    max_size=5,
)


@given(doc_lists)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_duplicate_spans_matches_bruteforce(spark, docs):
    """q78's shuffle-based span extraction equals the literal
    suffix-scan: grams counted across docs, dup positions merged with
    the gap > k rule, 1-based inclusive offsets."""
    from collections import Counter

    from pubmed_and_method_spark.operators.dedup import duplicate_spans

    k = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_dup_grams)
        for r in duplicate_spans(df, "doc_id", "text", k=k).collect()
    )

    grams = Counter()
    per_doc = {}
    for i, toks in enumerate(docs):
        gs = [tuple(toks[p : p + k]) for p in range(len(toks) - k + 1)]
        per_doc[i] = gs
        grams.update(gs)  # count every occurrence, like the operator
    dup = {g for g, c in grams.items() if c >= 2}
    expect = []
    for i, gs in per_doc.items():
        pos = [p + 1 for p, g in enumerate(gs) if g in dup]
        if not pos:
            continue
        start = prev = pos[0]
        n = 1
        for p in pos[1:]:
            if p - prev > k:
                expect.append((i, start, prev + k - 1,
                               prev + k - start, n))
                start, n = p, 0
            prev = p
            n += 1
        expect.append((i, start, prev + k - 1, prev + k - start, n))
    assert got == sorted(expect)


cl_fixtures = st.tuples(
    # clusters: up to 10 nodes in up to 3 clusters
    st.lists(
        st.tuples(st.integers(0, 9), st.sampled_from([100, 200, 300])),
        min_size=1, max_size=10, unique_by=lambda t: t[0],
    ),
    # cannot-link pairs over the same node space (any order/dups)
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0, max_size=8,
    ),
)


@given(cl_fixtures)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cannot_link_repair_matches_bruteforce(spark, fixture):
    """q93's one-pass repair equals the literal Python rule on random
    clusterings + constraint sets: evict the greater-(md5,id) endpoint
    of every violating pair, re-key survivors to min(kept id), and no
    violation may survive."""
    import hashlib

    from pubmed_and_method_spark.operators.constrained_clustering import (
        cannot_link_repair,
    )

    rows, cl = fixture
    clusters = spark.createDataFrame(rows, "id long, cluster long")
    cl_df = (
        spark.createDataFrame(cl, "id1 long, id2 long")
        if cl
        else spark.createDataFrame([], "id1 long, id2 long")
    )
    got = {
        r.id: (r.repaired_cluster, r.evicted)
        for r in cannot_link_repair(clusters, cl_df).collect()
    }

    # brute-force model
    cmap = dict(rows)
    h = lambda i: hashlib.md5(str(i).encode()).hexdigest()  # noqa: E731
    evict = set()
    for a, b in cl:
        if a != b and a in cmap and b in cmap and cmap[a] == cmap[b]:
            evict.add(a if (h(a), a) > (h(b), b) else b)
    want = {}
    for i, c in rows:
        if i in evict:
            want[i] = (i, 1)
        else:
            kept_ids = [j for j, cj in rows if cj == c and j not in evict]
            want[i] = (min(kept_ids), 0)
    assert got == want
    # invariant: no CL pair co-clustered post-repair
    for a, b in cl:
        if a != b and a in got and b in got:
            assert got[a][0] != got[b][0]


assign_fixtures = st.tuples(
    # new records: (id, toks) — ids 100+; token alphabet of 5
    st.lists(
        st.tuples(
            st.integers(100, 109),
            st.lists(st.sampled_from("abcde"), min_size=0, max_size=4,
                     unique=True),
        ),
        min_size=1, max_size=6, unique_by=lambda t: t[0],
    ),
    # catalog members: (member_id, cluster, toks)
    st.lists(
        st.tuples(
            st.integers(0, 9),
            st.sampled_from([1, 2]),
            st.lists(st.sampled_from("abcde"), min_size=1, max_size=4,
                     unique=True),
        ),
        min_size=0, max_size=8, unique_by=lambda t: t[0],
    ),
)


@given(assign_fixtures)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_assignment_matches_bruteforce(spark, fixture):
    """q94's blocked argmax assignment equals the literal Python rule
    (block on min token, jaccard argmax with (ratio desc, cluster,
    member) order, integer 1/2 threshold, singleton fallback)."""
    from pubmed_and_method_spark.operators.incremental_assign import (
        assign_to_clusters,
    )

    new_rows, cat_rows = fixture
    new = spark.createDataFrame(
        [(i, min(t) if t else None, t) for i, t in new_rows],
        "id long, block string, toks array<string>",
    )
    cat = spark.createDataFrame(
        [(m, c, min(t), t) for m, c, t in cat_rows],
        "member_id long, cluster long, block string, toks array<string>",
    )
    got = {
        r.id: (r.cluster, r.is_new_cluster, r.n_inter, r.n_union)
        for r in assign_to_clusters(new, cat, num=1, den=2).collect()
    }
    want = {}
    for i, t in new_rows:
        cands = []
        if t:
            for m, c, ct in cat_rows:
                if min(ct) == min(t):
                    inter = len(set(t) & set(ct))
                    union = len(set(t) | set(ct))
                    cands.append((-(inter / union), c, m, inter, union))
        if cands:
            cands.sort()
            _, c, _, inter, union = cands[0]
            if 2 * inter >= union:
                want[i] = (c, 0, inter, union)
                continue
        want[i] = (i, 1, 0, 0)
    assert got == want


pr_pairs = st.lists(
    st.tuples(
        st.sampled_from([0.1, 0.25, 0.5, 0.9]),  # few values -> ties
        st.booleans(),
    ),
    min_size=1,
    max_size=12,
)


@given(pr_pairs)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_progressive_recall_matches_bruteforce(spark, pairs):
    """q98's two-level rank (distinct-score offsets + per-score tie
    windows) equals the literal sorted-list model at every cut on
    random tie-heavy fixtures."""
    from pubmed_and_method_spark.operators.er_metrics import (
        progressive_recall,
    )

    rows = [
        (s, int(y), f"m{j:02d}", f"n{j:02d}")
        for j, (s, y) in enumerate(pairs)
    ]
    df = spark.createDataFrame(
        rows,
        "score double, same_entity int, mention_id1 string, "
        "mention_id2 string",
    )
    n_steps = 4
    got = {
        r.examined: (r.tp, r.recall, r.precision, r.lift)
        for r in progressive_recall(df, n_steps=n_steps).collect()
    }
    order = sorted(rows, key=lambda r: (-r[0], r[2], r[3]))
    n = len(order)
    p = sum(r[1] for r in order)
    want = {}
    for i in range(1, n_steps + 1):
        k = -((-i * n) // n_steps)  # ceil
        tp = sum(r[1] for r in order[:k])
        rec = round(tp / p, 6) if p else 0.0
        want[k] = (
            tp,
            rec,
            round(tp / k, 6),
            round((tp / p) / (k * 1.0 / n), 6) if p else 0.0,
        )
    assert got == want
