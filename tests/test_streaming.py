"""Structured-Streaming incremental signature frontier tests."""

import os

from pyspark.sql import functions as F

from pubmed_and_method_spark.sources.datagen import transcripts_df
from pubmed_and_method_spark.streaming.incremental import (
    current_signatures,
    run_incremental_signatures,
)


def test_stateful_turn_sessions_cross_batch(spark, corpus, tmp_path_factory):
    """applyInPandasWithState keyed by conv_id: turns of the SAME
    conversation arrive across two micro-batches; the second emit must
    aggregate both (state persisted) and full_text must be in
    (turn_idx) order regardless of arrival order."""
    from pubmed_and_method_spark.sources.datagen import TRANSCRIPT_SCHEMA
    from pubmed_and_method_spark.streaming.stateful import (
        stateful_conversation_sessions,
    )

    t, _ = corpus
    base = tmp_path_factory.mktemp("stateful")
    inp, ckpt, out = (str(base / "in"), str(base / "ckpt"), str(base / "out"))
    os.makedirs(inp)

    # split TURNS (not conversations): even turn_idx first, odd second,
    # so every conversation straddles the two files
    t.filter(F.col("turn_idx") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(inp, "f1")
    )
    t.filter(F.col("turn_idx") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(inp, "f2")
    )

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp + "/*")
    )
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        stateful_conversation_sessions(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from pyspark.sql import Window as W

    emitted = spark.read.parquet(out)
    w = W.partitionBy("conv_id").orderBy(F.desc("n_turns"))
    latest = (
        emitted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    from pubmed_and_method_spark.plans.pipeline import build_signatures

    batch = build_signatures(t, tfidf=False).select(
        "conv_id",
        F.col("full_text").alias("expect_text"),
        F.col("n_turns").alias("expect_turns"),
    )
    joined = latest.join(batch, "conv_id")
    assert joined.count() == batch.count()
    # state crossed batches: final aggregates equal the batch builder's
    assert joined.filter(
        (F.col("full_text") != F.col("expect_text"))
        | (F.col("n_turns") != F.col("expect_turns"))
    ).count() == 0


def test_stateful_idle_eviction_and_clean_restart(spark, tmp_path_factory):
    """Event-time timeout: an idle conversation's state is evicted once
    the watermark passes last-turn + idle_timeout; turns arriving after
    eviction rebuild state from scratch (n_turns restarts) instead of
    accumulating onto stale state."""
    import datetime as dt

    from pubmed_and_method_spark.sources.datagen import TRANSCRIPT_SCHEMA
    from pubmed_and_method_spark.streaming.stateful import (
        stateful_conversation_sessions,
    )

    base = tmp_path_factory.mktemp("evict")
    inp, ckpt, out = (str(base / "in"), str(base / "ckpt"), str(base / "out"))
    os.makedirs(inp)

    t0 = dt.datetime(2024, 1, 1)

    def turns(conv, start, n, prefix):
        return [
            (conv, i, "assistant", f"{prefix} turn {i}", "",
             start + dt.timedelta(seconds=60 * i))
            for i in range(n)
        ]

    batches = [
        turns("cA", t0, 4, "early"),                       # A: 4 turns, day 0
        turns("cB", t0 + dt.timedelta(days=10), 2, "b"),   # watermark -> day 10
        turns("cC", t0 + dt.timedelta(days=20), 2, "c"),   # A evicted here
        turns("cA", t0 + dt.timedelta(days=30), 3, "late"),  # A re-keyed
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA).coalesce(
            1
        ).write.parquet(os.path.join(inp, f"f{i}"))

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp + "/*")
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        stateful_conversation_sessions(
            stream, idle_timeout=dt.timedelta(hours=1)
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.read.parquet(out).filter(F.col("conv_id") == "cA")
    # two emissions for cA: the pre-eviction aggregate and the
    # re-keyed one
    rows = {r.n_turns: r for r in emitted.collect()}
    assert 4 in rows and 3 in rows, f"got n_turns {sorted(rows)}"
    late = rows[3]
    # clean restart: the rebuilt state saw ONLY the post-eviction turns
    assert "early" not in late.full_text
    assert late.ts_min >= int(
        (dt.datetime(2024, 1, 31) - dt.datetime(1970, 1, 1)).total_seconds()
    )


def test_incremental_idf_snapshot_parity(spark, corpus, tmp_path_factory):
    """r03 verdict missing #3: incremental signatures built against a
    materialized corpus-level IDF snapshot must carry the SAME tfidf
    weight maps as the batch builder on a static corpus — every
    (conv, token) weight equal, no keys missing on either side."""
    from pubmed_and_method_spark.plans.pipeline import build_signatures
    from pubmed_and_method_spark.streaming.incremental import (
        materialize_idf_snapshot,
    )

    t, _ = corpus
    base = tmp_path_factory.mktemp("idfsnap")
    inp = str(base / "in")
    os.makedirs(inp)
    t.coalesce(2).write.parquet(os.path.join(inp, "all"))

    # bootstrap pass (no tfidf) -> snapshot from the full store
    ck1, out1 = str(base / "ck1"), str(base / "out1")
    run_incremental_signatures(spark, inp + "/*", ck1, out1)
    snap = str(base / "snap")
    materialize_idf_snapshot(spark, out1, snap)

    # second pass over the same corpus, snapshot attached
    ck2, out2 = str(base / "ck2"), str(base / "out2")
    run_incremental_signatures(
        spark, inp + "/*", ck2, out2, idf_snapshot_dir=snap
    )
    streamed = current_signatures(spark, out2).select(
        "conv_id", F.explode("tfidf").alias("k", "v_stream")
    )
    batch = build_signatures(t, tfidf=True).select(
        "conv_id", F.explode("tfidf").alias("k", "v_batch")
    )
    j = streamed.join(batch, ["conv_id", "k"], "full_outer")
    assert j.filter(
        F.col("v_stream").isNull() | F.col("v_batch").isNull()
    ).count() == 0
    worst = j.agg(
        F.max(F.abs(F.col("v_stream") - F.col("v_batch"))).alias("d")
    ).collect()[0]["d"]
    assert worst < 1e-9, worst


def test_incremental_matches_batch(spark, corpus, tmp_path_factory):
    t, _ = corpus
    base = tmp_path_factory.mktemp("stream")
    inp, ckpt, out = (
        str(base / "in"), str(base / "ckpt"), str(base / "out"),
    )
    os.makedirs(inp)

    convs = [r.conv_id for r in t.select("conv_id").distinct().collect()]
    half = set(convs[: len(convs) // 2])

    # batch 1: first half of the conversations
    t.filter(F.col("conv_id").isin(half)).write.parquet(
        os.path.join(inp, "batch1")
    )
    run_incremental_signatures(spark, inp + "/*", ckpt, out)
    got1 = current_signatures(spark, out)
    assert got1.count() == len(half)

    # batch 2: the rest — the stream must pick up ONLY new files
    t.filter(~F.col("conv_id").isin(half)).write.parquet(
        os.path.join(inp, "batch2")
    )
    run_incremental_signatures(spark, inp + "/*", ckpt, out)
    got2 = current_signatures(spark, out)
    assert got2.count() == len(convs)

    # streamed signatures == batch signatures (same builder, same data)
    from pubmed_and_method_spark.plans.pipeline import build_signatures

    batch = build_signatures(t).select("conv_id", "block_key", "full_text")
    streamed = got2.select("conv_id", "block_key", "full_text")
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_incremental_pairs_match_batch(spark, corpus, tmp_path_factory):
    """Streaming pair frontier == batch exact-block pair set: drain
    the corpus in three file batches through run_incremental_pairs and
    compare the union of emitted (block_key, id1, id2) against
    build_candidate_pairs on the full corpus (lsh=False).  Also pins
    the no-double-emission property (every pair exactly once) and the
    store's block_bucket partition layout."""
    from pubmed_and_method_spark.plans.pipeline import (
        build_candidate_pairs,
        build_signatures,
    )
    from pubmed_and_method_spark.streaming.incremental import (
        run_incremental_pairs,
    )

    t, _ = corpus
    base = tmp_path_factory.mktemp("pairstream")
    inp = str(base / "in")
    ckpt, sig_dir, pairs_dir = (
        str(base / "ckpt"), str(base / "sigs"), str(base / "pairs"),
    )
    os.makedirs(inp)

    convs = sorted(r.conv_id for r in t.select("conv_id").distinct().collect())
    thirds = [set(convs[i::3]) for i in range(3)]
    for i, third in enumerate(thirds):
        t.filter(F.col("conv_id").isin(third)).write.parquet(
            os.path.join(inp, f"batch{i}")
        )
        # one drain per landed file set: three real micro-batches, so
        # new-vs-store and new-vs-new paths both carry real volume
        run_incremental_pairs(spark, inp + "/*", ckpt, sig_dir, pairs_dir)

    streamed = spark.read.parquet(pairs_dir)
    batch = build_candidate_pairs(
        build_signatures(t), num_buckets=1, lsh=False
    ).select("block_key", "mention_id1", "mention_id2")

    cols = ["block_key", "mention_id1", "mention_id2"]
    assert streamed.count() == batch.count()  # exactly-once emission
    assert streamed.select(*cols).exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed.select(*cols)).count() == 0

    # store layout: partition-pruned scans need the bucket directories
    bucket_dirs = [
        d for d in os.listdir(sig_dir) if d.startswith("block_bucket=")
    ]
    assert bucket_dirs, "signature store is not partitioned by block_bucket"


def test_incremental_assignments_match_sequential(
    spark, corpus, tmp_path_factory
):
    """Streaming assignment frontier == the batch q94 operator applied
    sequentially: seed a catalog from half the corpus, stream the rest
    in three landings, then re-derive every batch's assignments with
    the batch assign_to_clusters against the catalog state implied by
    the OBSERVED batch_ids (order-robust — the model consumes the
    batch composition the stream actually produced).  Also pins
    exactly-once emission and the catalog's block_bucket layout."""
    from pubmed_and_method_spark.operators.incremental_assign import (
        assign_to_clusters,
    )
    from pubmed_and_method_spark.plans.pipeline import build_signatures
    from pubmed_and_method_spark.streaming.incremental import (
        _UNBLOCKED,
        _block_bucket,
        run_incremental_assignments,
    )

    t, _ = corpus
    base = tmp_path_factory.mktemp("assignstream")
    inp, ckpt = str(base / "in"), str(base / "ckpt")
    cat_dir, out_dir = str(base / "catalog"), str(base / "out")
    os.makedirs(inp)

    convs = sorted(
        r.conv_id for r in t.select("conv_id").distinct().collect()
    )
    old = set(convs[: len(convs) // 2])
    rest = convs[len(convs) // 2:]

    def sig_of(conv_set):
        return build_signatures(
            t.filter(F.col("conv_id").isin(conv_set)), tfidf=False
        )

    # seed catalog: block-key clusters over the old half (cluster =
    # min mention per block), partitioned like the store expects
    so = sig_of(old).filter(F.col("block_key") != _UNBLOCKED)
    seed = so.join(
        so.groupBy("block_key").agg(F.min("mention_id").alias("cluster")),
        "block_key",
    ).select(
        F.col("mention_id").alias("member_id"),
        "cluster",
        F.col("block_key").alias("block"),
        F.col("token_hashes").alias("toks"),
        _block_bucket("block_key"),
    )
    seed.write.partitionBy("block_bucket").parquet(cat_dir)
    seed_rows = seed.collect()

    for i in range(3):
        third = set(rest[i::3])
        t.filter(F.col("conv_id").isin(third)).write.parquet(
            os.path.join(inp, f"batch{i}")
        )
        run_incremental_assignments(
            spark, inp + "/*", ckpt, cat_dir, out_dir
        )

    streamed = spark.read.parquet(out_dir)
    n_new_mentions = sig_of(set(rest)).count()
    assert streamed.count() == n_new_mentions  # exactly once
    assert streamed.select("mention_id").distinct().count() == n_new_mentions

    # sequential re-derivation against the observed batch composition
    cat = spark.createDataFrame(
        [(r.member_id, r.cluster, r.block, r.toks) for r in seed_rows],
        "member_id string, cluster string, block string, toks array<bigint>",
    )
    for b in sorted(
        r.batch_id
        for r in streamed.select("batch_id").distinct().collect()
    ):
        got_rows = {
            r.mention_id: (
                r.cluster, r.is_new_cluster, r.n_inter, r.n_union
            )
            for r in streamed.filter(F.col("batch_id") == b).collect()
        }
        batch_convs = {m.rsplit("#", 1)[0] for m in got_rows}
        newb = sig_of(batch_convs).select(
            F.col("mention_id").alias("id"),
            F.when(
                F.col("block_key") != _UNBLOCKED, F.col("block_key")
            ).alias("block"),
            F.col("token_hashes").alias("toks"),
        )
        want = {
            r.id: (r.cluster, r.is_new_cluster, r.n_inter, r.n_union)
            for r in assign_to_clusters(
                newb, cat, id_col="id", member_col="member_id",
                cluster_col="cluster", toks_col="toks", block_col="block",
            ).collect()
        }
        assert got_rows == want, f"batch {b} diverged"
        cat = cat.unionByName(
            newb.filter(F.col("block").isNotNull())
            .join(
                spark.createDataFrame(
                    [(m, v[0]) for m, v in want.items()],
                    "id string, cluster string",
                ),
                "id",
            )
            .select(
                F.col("id").alias("member_id"), "cluster", "block", "toks"
            )
        )

    # store layout: bucket-partitioned for pruned scans
    assert any(
        d.startswith("block_bucket=") for d in os.listdir(cat_dir)
    ), "catalog store is not partitioned by block_bucket"
