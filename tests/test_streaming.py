"""Structured-Streaming incremental signature frontier tests."""

import os

from pyspark.sql import functions as F

from pubmed_and_method_spark.sources.datagen import transcripts_df
from pubmed_and_method_spark.streaming.incremental import (
    current_signatures,
    run_incremental_signatures,
)


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
