"""X6/X2 name features, N2 reconstruction, N4 shape flags, LSH caps.

The editops expectations mirror the reference's own
test/eutilities/string_utils_test.py (str1='deceukelaire',
str2='de ceukelairef').
"""

import pytest
from pyspark.sql import functions as F

from pubmed_and_method_spark.functions.names import (
    name_shape_flags,
    reconstruct_given_names,
)
from pubmed_and_method_spark.functions.strings import (
    _editops_diff_chars,
    char_jaccard,
    edit_diff_char_count,
    edit_diff_chars_udf,
    uniq_char_diff,
)


def test_editops_diff_chars_reference_case():
    # reference test case: the two strings differ by a space and 'f'
    chars = _editops_diff_chars("deceukelaire", "de ceukelairef")
    assert sorted(chars) == [" ", "f"]
    # count always equals the levenshtein distance
    assert len(chars) == 2


def test_editops_swap_to_longer_convention():
    # symmetric by construction (swap-to-longer first)
    assert _editops_diff_chars("ab", "abcd") == _editops_diff_chars("abcd", "ab")
    assert _editops_diff_chars(None, "x") == []
    assert _editops_diff_chars("same", "same") == []


def test_name_feature_exprs(spark):
    rows = [
        ("smith", "john", "smith", "j"),       # abbreviated pair
        ("garcia", "maria", "garcia", "mario"),  # near-name
        ("", "", "lee", "ann"),                # missing side
    ]
    df = spark.createDataFrame(rows, ["l1", "f1", "l2", "f2"])
    got = df.select(
        char_jaccard(F.concat("l1", "f1"), F.concat("l2", "f2")).alias("cj"),
        uniq_char_diff(F.concat("l1", "f1"), F.concat("l2", "f2")).alias("ud"),
        edit_diff_char_count(F.concat("l1", "f1"), F.concat("l2", "f2")).alias("ed"),
        edit_diff_chars_udf(F.concat("l1", "f1"), F.concat("l2", "f2")).alias("chars"),
    ).collect()

    def py_char_jacc(a, b):
        sa, sb = set(a), set(b)
        return len(sa & sb) / len(sa | sb) if (sa | sb) else 0.0

    for (l1, f1, l2, f2), r in zip(rows, got):
        a, b = l1 + f1, l2 + f2
        assert r["cj"] == pytest.approx(py_char_jacc(a, b))
        sa, sb = set(a), set(b)
        assert r["ud"] == min(len(sa - sb), len(sb - sa))
        assert r["ed"] == len(_editops_diff_chars(a, b))
        assert len(r["chars"]) == r["ed"]


def test_reconstruct_given_names(spark):
    rows = [
        ("c1", "smith_j", "john"),
        ("c2", "smith_j", "j"),       # abbreviated -> inherits "john"
        ("c3", "smith_j", "john"),
        ("c4", "lee_a", "ann"),
        ("c5", "__unblocked__", ""),  # untouched
    ]
    df = spark.createDataFrame(rows, ["conv_id", "block_key", "given_name"])
    out = {
        r["conv_id"]: (r["given_name_wellform"], r["name_reconstructed"])
        for r in reconstruct_given_names(df).collect()
    }
    assert out["c2"] == ("john", 1)
    assert out["c1"] == ("john", 0)
    assert out["c4"] == ("ann", 0)
    assert out["c5"] == ("", 0)


def test_name_shape_flags(spark):
    rows = [("jean-luc maria",), ("ann",), ("j2x",)]
    df = spark.createDataFrame(rows, ["given_name"])
    got = name_shape_flags(df).collect()
    by = {r["given_name"]: r for r in got}
    # dashes removed first: "jeanluc" (7) beats "maria" (5)
    assert by["jean-luc maria"]["fn_max_len_str"] == "jeanluc"
    assert by["jean-luc maria"]["fn_contain_dash"] == 1
    assert by["jean-luc maria"]["fn_contain_other_chars"] == 0
    assert by["ann"]["fn_contain_dash"] == 0
    assert by["j2x"]["fn_contain_other_chars"] == 1


def test_signatures_reconstruct_abbreviated_intros(spark, corpus):
    """N2 done-criterion: abbreviated-intro conversations land in the
    right block (no LSH needed) AND their given name is upgraded to
    the block's full form."""
    from pubmed_and_method_spark.plans.pipeline import build_signatures

    t, truth = corpus
    sig = build_signatures(t, tfidf=False)
    abbrev = sig.filter(
        (F.length("given_name_shown") == 1) & (F.col("block_key") != "__unblocked__")
    )
    n_abbrev = abbrev.count()
    assert n_abbrev > 0, "datagen should plant abbreviated intros"
    upgraded = abbrev.filter(
        (F.col("name_reconstructed") == 1) & (F.length("given_name") > 1)
    ).count()
    # every abbreviated mention whose block has a full-form sibling is
    # upgraded; with ~20% abbreviation rate nearly all blocks have one
    assert upgraded >= 0.8 * n_abbrev


def test_lsh_degenerate_band_cap(spark):
    """Judge done-criterion: a planted degenerate band (many identical
    token sets) completes with a bounded pair count under
    max_block_size instead of going quadratic."""
    from pubmed_and_method_spark.operators.blocking import lsh_candidate_pairs

    n = 1000
    rows = [(f"d{i:04d}", ["alpha", "beta", "gamma"]) for i in range(n)]
    # plus a small genuine near-dup group with distinct signatures
    rows += [(f"x{i}", ["delta", "epsilon", "zeta", f"w{i}"]) for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    capped = lsh_candidate_pairs(
        df, "doc_id", "toks", num_hashes=8, bands=4, max_block_size=50
    )
    n_pairs = capped.count()
    # uncapped would be ~n*(n-1)/2 = 499500 from the degenerate bucket
    assert n_pairs < 10_000
    # the small healthy group still pairs up
    healthy = capped.filter(F.col("doc_id1").startswith("x")).count()
    assert healthy >= 1


def test_simhash_band_cap(spark):
    from pubmed_and_method_spark.operators.dedup import simhash_near_dups

    rows = [(f"d{i:04d}", ["alpha", "beta", "gamma"]) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    capped = simhash_near_dups(
        df, "doc_id", "toks", max_hamming=3, max_block_size=50
    )
    assert capped.count() == 0  # every bucket oversized -> all dropped
    uncapped = simhash_near_dups(df, "doc_id", "toks", max_hamming=3)
    assert uncapped.count() == 500 * 499 // 2


def test_phonetic_key_classic_values(spark):
    """Hand-checked Soundex values (classic on the standard examples
    except the documented h/w-separator variant: ashcraft A226 here vs
    A261 classic) + cross-engine parity with the DuckDB SQL twin."""
    import duckdb

    from pubmed_and_method_spark.functions.names import (
        phonetic_key,
        phonetic_key_sql,
    )

    cases = {
        "smith": "S530", "smyth": "S530", "garcia": "G620",
        "gracia": "G620", "robert": "R163", "pfister": "P236",
        "jackson": "J250", "tymczak": "T522", "honeyman": "H555",
        "lee": "L000", "ashcraft": "A226", "o'brien": "O165",
        "x": "X000", "": "", "42": "", "MUELLER": "M460",
        "muller": "M460",
    }
    df = spark.createDataFrame(
        [(k,) for k in cases], "n string"
    ).select("n", phonetic_key("n").alias("k"))
    got = {r.n: r.k for r in df.collect()}
    assert got == cases
    con = duckdb.connect()
    sql = phonetic_key_sql("n")
    for n, want in cases.items():
        assert con.execute(
            f"SELECT {sql} FROM (SELECT ? AS n)", [n]
        ).fetchone()[0] == want, n


def test_phonetic_pass_supersets_exact(spark):
    """phonetic=True only ADDS pairs (tagged ph_*), never drops or
    re-labels exact-pass pairs; on the hard corpus it recovers
    typo-severed true pairs; and every recovered pair's members share
    a phonetic key but NOT an exact block key."""
    from pubmed_and_method_spark.functions.names import phonetic_key
    from pubmed_and_method_spark.plans.pipeline import (
        build_candidate_pairs,
        build_signatures,
    )
    from pubmed_and_method_spark.sources.datagen import transcripts_df

    t, g = transcripts_df(spark, seed=42, hardness=0.7)
    sig = build_signatures(t, tfidf=False).cache()
    base = build_candidate_pairs(sig)
    both = build_candidate_pairs(sig, phonetic=True).cache()
    base_set = {
        (r.mention_id1, r.mention_id2) for r in base.collect()
    }
    exact_rows = [r for r in both.collect() if not r.block_key.startswith("ph_")]
    phon_rows = [r for r in both.collect() if r.block_key.startswith("ph_")]
    assert {(r.mention_id1, r.mention_id2) for r in exact_rows} == base_set
    assert phon_rows, "phonetic pass recovered nothing on the hard corpus"
    assert not base_set & {
        (r.mention_id1, r.mention_id2) for r in phon_rows
    }
    # recovered pairs: same phonetic key, different exact block
    info = {
        r.mention_id: (r.block_key, r.surname)
        for r in sig.select(
            "mention_id", "block_key", "surname",
            phonetic_key("surname").alias("pk"),
        ).collect()
    }
    pk = {
        r.mention_id: r.pk
        for r in sig.select(
            "mention_id", phonetic_key("surname").alias("pk")
        ).collect()
    }
    for r in phon_rows:
        assert info[r.mention_id1][0] != info[r.mention_id2][0]
        assert pk[r.mention_id1] == pk[r.mention_id2]
    # truth: at least one recovered pair is a true match (recall won)
    ent = {r.conv_id: r.entity_id for r in g.collect()}
    conv = lambda m: m.split("#")[0]  # noqa: E731
    assert any(
        ent[conv(r.mention_id1)] == ent[conv(r.mention_id2)]
        for r in phon_rows
    )
    sig.unpersist()
    both.unpersist()
