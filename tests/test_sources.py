"""S1/S2 delimited ingest + O3 seeded ordering operators."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pubmed_and_method_spark.operators.sampling import (
    seeded_sample,
    seeded_shuffle,
)
from pubmed_and_method_spark.sources.text_source import (
    read_delimited,
    split_to_array,
    write_delimited,
)


def test_delimited_roundtrip_with_declared_schema(spark, tmp_path):
    rows = [
        (1, "alice;bob;carol", 'quoted "text", with commas\tand tab'),
        (2, "", "plain"),
        (3, None, None),
    ]
    df = spark.createDataFrame(rows, ["id", "authors", "note"])
    path = str(tmp_path / "dump")
    write_delimited(df, path, delimiter="\t", header=True)

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("authors", T.StringType()),
            T.StructField("note", T.StringType()),
        ]
    )
    loaded = read_delimited(
        spark, path, schema, delimiter="\t", header=True,
        transforms={"authors": split_to_array(";")},
    )
    got = {r["id"]: r for r in loaded.collect()}
    assert got[1]["authors"] == ["alice", "bob", "carol"]
    assert got[1]["note"] == rows[0][2]  # exact roundtrip incl quotes/tab
    assert got[2]["authors"] == []
    assert got[3]["authors"] == []
    # declared schema, no inference: id is a real long
    assert dict(loaded.dtypes)["id"] == "bigint"


def test_corrupt_record_capture(spark, tmp_path):
    p = tmp_path / "bad.tsv"
    p.write_text("id\tval\n1\t10\nnot_a_number\t20\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
    )
    loaded = read_delimited(
        spark, str(p), schema, delimiter="\t", header=True, keep_corrupt=True
    )
    rows = loaded.collect()
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and "not_a_number" in corrupt[0]["_corrupt_record"]


def test_jsonl_nested_roundtrip_and_corrupt(spark, tmp_path):
    """read_jsonl: declared NESTED schema (no inference), flatten-on-
    ingest transform, and PERMISSIVE corrupt-line capture."""
    from pubmed_and_method_spark.sources.text_source import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": 1, "meta": {"lang": "en", "src": "web"}, "text": "a b"}\n'
        '{"id": 2, "meta": {"lang": "fr", "src": "pdf"}, "text": ""}\n'
        "this line is not json\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("lang", T.StringType()),
                        T.StructField("src", T.StringType()),
                    ]
                ),
            ),
            T.StructField("text", T.StringType()),
        ]
    )
    loaded = read_jsonl(
        spark,
        str(p),
        schema,
        transforms={"text": lambda c: F.coalesce(c, F.lit(""))},
        keep_corrupt=True,
    )
    rows = {r["id"]: r for r in loaded.collect()}
    assert rows[1]["meta"]["lang"] == "en" and rows[1]["text"] == "a b"
    assert rows[2]["meta"]["src"] == "pdf" and rows[2]["text"] == ""
    corrupt = [r for r in rows.values() if r["_corrupt_record"]]
    assert len(corrupt) == 1 and "not json" in corrupt[0]["_corrupt_record"]
    assert dict(loaded.dtypes)["id"] == "bigint"  # declared, not inferred


def test_seeded_shuffle_deterministic_and_seed_sensitive(spark):
    df = spark.range(500).select(F.col("id"))
    a = [r["id"] for r in seeded_shuffle(df, ["id"], seed=1).collect()]
    b = [r["id"] for r in seeded_shuffle(df.repartition(7), ["id"], seed=1).collect()]
    c = [r["id"] for r in seeded_shuffle(df, ["id"], seed=2).collect()]
    assert a == b  # partitioning-independent total order
    assert a != c  # seed changes the permutation
    assert sorted(a) == list(range(500))


def test_seeded_sample_reproducible(spark):
    df = spark.range(10_000)
    s1 = seeded_sample(df, ["id"], 0.1, seed=3)
    s2 = seeded_sample(df.repartition(13), ["id"], 0.1, seed=3)
    a = sorted(r["id"] for r in s1.collect())
    assert a == sorted(r["id"] for r in s2.collect())
    assert 700 < len(a) < 1300  # ~10%


# ---------------------------------------------------------------------------
# Synthetic corpus generator (sources/datagen.py)
# ---------------------------------------------------------------------------


def test_default_corpus_rng_stream_pinned():
    """The seed-42 default corpus is the q26/q27/q44 oracle input; any
    edit that shifts the generator's rng stream (e.g. a new knob that
    draws on the default path) silently changes what those oracles
    check.  Pin its exact bytes."""
    import hashlib

    from pubmed_and_method_spark.sources.datagen import generate_transcripts

    t, g = generate_transcripts(seed=42)
    md5 = lambda pdf: hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()
    assert md5(t) == "f4fbce70cb24f0bd851005865fae3700"
    assert md5(g) == "66b2d1f7e697ea3e3ff6fcba8cafd963"


def test_hard_corpus_plants_confusions():
    """hardness=1 must plant the advertised confusions: homonymous
    full names within a block, dropped self-introductions, surname
    typos, and heavy same-block core-vocabulary overlap."""
    from pubmed_and_method_spark.sources.datagen import (
        _SURNAMES,
        generate_transcripts,
    )

    t, g = generate_transcripts(seed=42, n_entities=60, n_blocks=12, hardness=1.0)
    intros = t[t.text.str.startswith("Hello, I am agent ")].copy()
    names = intros.text.str.extract(r"agent (\w+) (\w+)\.")
    intros["given"], intros["sur"] = names[0], names[1]

    # dropout: a meaningful fraction of conversations have no byline
    n_convs = g.conv_id.nunique()
    intro_rate = len(intros) / n_convs
    assert 0.5 < intro_rate < 0.9

    # typos: some shown surnames are not canonical
    assert (~intros.sur.isin(set(_SURNAMES))).sum() >= 5

    # homonyms: >1 entity sharing the same FULL given name in a block
    full = intros[intros.given.str.len() > 1][["conv_id", "given"]]
    ent = g.merge(full, on="conv_id")
    per = ent.groupby(["block_key", "given"]).entity_id.nunique()
    assert (per > 1).sum() >= 3

    # hardness=0 and hardness=1 differ (the knob actually binds)
    t0, _ = generate_transcripts(seed=42, n_entities=60, n_blocks=12)
    assert not t0.text.equals(t.text)
