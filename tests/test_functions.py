"""Unit tests for the similarity/normalization primitives.

Mirrors the reference's ad-hoc checks
(test/eutilities/string_utils_test.py) plus DuckDB cross-validation of
Jaro-Winkler — our UDF must match duckdb's jaro_winkler_similarity
bit-for-bit (that parity is what the driver's oracle gate hashes).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from pubmed_and_method_spark.functions.normalize import clean_tokens, normalize_text, shingles
from pubmed_and_method_spark.functions.strings import (
    jaro_winkler,
    jaro_winkler_udf,
    levenshtein_ratio,
    token_jaccard,
    token_overlap,
)


CASES = [
    ("martha", "marhta"),
    ("DIXON", "DICKSONX"),
    ("", "a"),
    ("", ""),
    ("abc", "abc"),
    ("jellyfish", "smellyfish"),
    ("a", "b"),
    ("prefixmatch", "prefixmxtch"),
]


def test_jaro_winkler_matches_duckdb_pointwise():
    for a, b in CASES:
        want = duckdb.sql(
            "select jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == pytest.approx(want, abs=1e-12), (a, b)


def test_jaro_winkler_null_contract():
    # reference: jaro_winkler_similarity returns 0.0 on null inputs
    # (src/eutilities/string_utils.py:80-83)
    assert jaro_winkler(None, "x") == 0.0
    assert jaro_winkler("x", None) == 0.0


def test_c_jw_probe_set_self_consistent():
    """The probe pairs used to gate a C-backed JW lib must be
    well-formed for the pure-Python anchor (no exceptions, values in
    [0,1]) and must cover the boost boundary: at least one probe with
    jaro <= 0.7 (no boost) and one with a full 4-char common prefix.

    ASCII probes are additionally pinned to DuckDB (the oracle); the
    unicode probes intentionally are NOT — DuckDB walks UTF-8 bytes
    while the engine (and rapidfuzz) use codepoints, and every
    oracle-checked name path is ASCII by construction (NAME_RE)."""
    import duckdb as dk

    from pubmed_and_method_spark.functions import strings as S

    probes = S._JW_PROBES
    assert len(probes) >= 20
    has_low_jaro = False
    has_4prefix = False
    for a, b in probes:
        v = jaro_winkler(a, b)
        assert 0.0 <= v <= 1.0
        if S._jaro(a, b) <= 0.7:
            has_low_jaro = True
        if a[:4] == b[:4] and len(a) >= 4:
            has_4prefix = True
        if a.isascii() and b.isascii():
            want = dk.sql(
                "select jaro_winkler_similarity(?, ?)", params=[a, b]
            ).fetchone()[0]
            assert v == pytest.approx(want, abs=1e-12), (a, b)
    assert has_low_jaro and has_4prefix


def test_c_jw_parity_when_lib_present():
    """Runs ONLY when rapidfuzz/jellyfish is importable (production
    images): the gated C scorer must match the pure-Python anchor on a
    seeded random corpus much wider than the probe set."""
    import random

    from pubmed_and_method_spark.functions import strings as S

    if S._C_JW is None:
        pytest.skip("no C-backed JW lib in this environment")
    rng = random.Random(17)
    alpha = "abcdefghijklmnopqrstuvwxyzàéîöü北京 "
    for _ in range(500):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 24)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 24)))
        assert S._C_JW(a, b) == pytest.approx(jaro_winkler(a, b), abs=1e-12)


def test_compiled_jw_batch_kernel_parity():
    """The runtime-compiled C batch kernel (functions/_cjw.py) must
    match the pure-Python anchor bit-for-bit on a seeded random corpus
    far wider than the probe gate: unicode, empties, identical pairs,
    long strings.  Skips only where no C compiler exists (the kernel
    is probe-gated at import, so _C_JW_BATCH is None there and the
    pure-Python path serves)."""
    import random

    from pubmed_and_method_spark.functions import strings as S

    kern = S._get_batch_kernel()
    if kern is None:
        pytest.skip("no C compiler in this environment")
    rng = random.Random(23)
    alpha = "abcdefghijklmnopqrstuvwxyzàéîöü北京 "
    pairs = []
    for _ in range(2000):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        pairs.append((a, b))
    pairs += [("", ""), ("x", ""), ("", "x"), ("same", "same"),
              ("a" * 200, "a" * 199 + "b")]
    got = kern([a for a, _ in pairs], [b for _, b in pairs])
    for (a, b), v in zip(pairs, got):
        assert v == pytest.approx(jaro_winkler(a, b), abs=1e-12), (a, b)


def test_jw_kernel_astral_probes():
    """r04 verdict task 7: the probe GATE itself must cover the astral
    plane (codepoints > 0xFFFF) so a UTF-16-confused kernel could
    never pass it; and the active kernel (when a compiler exists) must
    match the pure-Python anchor on every astral probe bit-for-bit."""
    from pubmed_and_method_spark.functions import strings as S

    astral = [
        (a, b)
        for a, b in S._JW_PROBES
        if any(ord(c) > 0xFFFF for c in a + b)
    ]
    assert len(astral) >= 5, "probe set lost its astral coverage"
    kern = S._get_batch_kernel()
    if kern is None:
        pytest.skip("no C compiler in this environment")
    got = kern([a for a, _ in astral], [b for _, b in astral])
    for (a, b), v in zip(astral, got):
        assert v == jaro_winkler(a, b), (a, b)


def test_jw_kernel_hypothesis_differential():
    """r04 verdict task 7: property-based differential test — on
    arbitrary unicode (BMP + astral, surrogates excluded since python
    can't UTF-32-encode lone surrogates) the compiled batch kernel is
    BIT-identical to the pure-Python anchor.  Hypothesis shrinks any
    divergence to a minimal counterexample."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pubmed_and_method_spark.functions import strings as S

    kern = S._get_batch_kernel()
    if kern is None:
        pytest.skip("no C compiler in this environment")

    txt = st.text(
        alphabet=st.characters(
            min_codepoint=0x20,
            max_codepoint=0x10FFFF,
            blacklist_categories=("Cs",),  # lone surrogates
        ),
        max_size=48,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.tuples(txt, txt), min_size=1, max_size=16))
    def inner(pairs):
        got = kern([a for a, _ in pairs], [b for _, b in pairs])
        for (a, b), v in zip(pairs, got):
            assert v == jaro_winkler(a, b), (a, b)

    inner()


def test_jaro_winkler_udf_batch(spark):
    df = spark.createDataFrame(CASES, ["a", "b"])
    got = {
        (r.a, r.b): r.jw
        for r in df.withColumn("jw", jaro_winkler_udf("a", "b")).collect()
    }
    for a, b in CASES:
        want = duckdb.sql(
            "select jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert got[(a, b)] == pytest.approx(want, abs=1e-12)


def test_levenshtein_ratio(spark):
    df = spark.createDataFrame(
        [("kitten", "sitting"), ("", ""), ("abc", "abc"), (None, "x")], ["a", "b"]
    )
    rows = df.withColumn("lr", levenshtein_ratio("a", "b")).collect()
    by = {(r.a, r.b): r.lr for r in rows}
    assert by[("kitten", "sitting")] == pytest.approx(1 - 3 / 7)
    assert by[("", "")] == 1.0
    assert by[("abc", "abc")] == 1.0
    assert by[(None, "x")] == 0.0


def test_token_jaccard_and_overlap(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], ["b", "c", "d"]), ([], [])],
        "a array<string>, b array<string>",
    )
    rows = (
        df.withColumn("j", token_jaccard("a", "b"))
        .withColumn("o", token_overlap("a", "b"))
        .collect()
    )
    assert rows[0].j == pytest.approx(2 / 4)
    assert rows[0].o == 2
    assert rows[1].j == 0.0  # empty-union -> 0.0 (reference contract)


def test_normalize_and_tokens(spark):
    df = spark.createDataFrame(
        [("The QUICK, brown-fox!! 42 jumps the a of",)], ["t"]
    )
    row = (
        df.select(
            normalize_text("t").alias("n"), clean_tokens("t").alias("toks")
        ).first()
    )
    assert row.n == "the quick brown fox 42 jumps the a of"
    # stopwords (the/a/of), short tokens, pure numbers dropped
    assert row.toks == ["quick", "brown", "fox", "jumps"]


def test_shingles(spark):
    df = spark.createDataFrame([("alpha beta gamma delta",), ("tiny one",), ("", )], ["t"])
    rows = df.select(shingles("t", 3).alias("s")).collect()
    assert rows[0].s == ["alpha beta gamma", "beta gamma delta"]
    assert rows[1].s == ["tiny one"]
    assert rows[2].s == []


def test_tfidf_top_k_truncation(spark):
    """top_k=None and top_k>=vocab are identical; small top_k bounds
    map size and re-normalizes to unit L2 after truncation."""
    from pubmed_and_method_spark.functions.tfidf import tfidf_weight_maps

    df = spark.createDataFrame(
        [(1, [10, 10, 20, 30, 40]), (2, [10, 20, 20, 50, 60]), (3, [70, 80])],
        "id long, toks array<long>",
    )
    exact = {r.id: r.tfidf for r in tfidf_weight_maps(df, "id", "toks").collect()}
    big = {
        r.id: r.tfidf
        for r in tfidf_weight_maps(df, "id", "toks", top_k=100).collect()
    }
    assert exact == big
    for r in tfidf_weight_maps(df, "id", "toks", top_k=2).collect():
        assert len(r.tfidf) <= 2
        norm2 = sum(v * v for v in r.tfidf.values())
        assert abs(norm2 - 1.0) < 1e-9


def test_sentinel_overlap_null_contract(spark):
    """Null array input must yield 0 (the reference's None contract),
    never the -1 disagreement sentinel — regression for the legacy
    sizeOfNull=-1 aliasing (r02 advice)."""
    from pubmed_and_method_spark.functions.strings import sentinel_overlap

    df = spark.createDataFrame(
        [
            (1, ["a", "b"], ["c", "d"]),   # disjoint non-empty -> -1
            (2, ["a", "b"], ["b", "c"]),   # overlap -> 1
            (3, None, ["a"]),              # null -> 0
            (4, ["a"], None),              # null -> 0
            (5, [], ["a"]),                # empty -> 0 (not "both sides")
        ],
        "id long, a array<string>, b array<string>",
    )
    got = {
        r.id: r.s
        for r in df.select("id", sentinel_overlap("a", "b").alias("s")).collect()
    }
    assert got == {1: -1, 2: 1, 3: 0, 4: 0, 5: 0}
