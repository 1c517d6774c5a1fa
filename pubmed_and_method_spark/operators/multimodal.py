"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct.  The Spark-side plumbing (schema, partition-friendly
batch iteration, Arrow batch shape) is real and tested; the actual
codec step is stubbed deterministically because decode libraries are
not in this container — swap ``_fake_decode`` for a real decoder
(PIL/librosa/av) in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, modality string, n_bytes int, checksum string, "
    "width int, height int, feature array<float>"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload builder: treat the utf-8 text bytes as an opaque
    blob + metadata struct (in production the blob comes from the
    lake; this exercises the exact schema/plumbing)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "meta",
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.col(text_col)).alias("n_bytes"),
        ),
    )


def _fake_decode(blob: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for image decode + feature extraction.
    STUB: replace with a real codec; signature and batch shape are the
    contract."""
    if blob is None:
        raise NotImplementedError("real decoder required for null-payload docs")
    w = (len(blob) % 64) + 1
    h = (sum(blob[:16]) % 64) + 1 if len(blob) else 1
    feat = [float(b) / 255.0 for b in blob[:8]]
    feat += [0.0] * (8 - len(feat))
    return w, h, feat


def decode_batches(df: DataFrame) -> DataFrame:
    """mapInPandas decode: per-partition Arrow batches in, typed rows
    out — the scale-path shape for a real decoder (each batch is
    decoded inside one Python worker; no per-row serde)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "checksum": [
                        __import__("hashlib").md5(b).hexdigest() for b in pdf["payload"]
                    ],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )

    return df.select("doc_id", "payload", "meta").mapInPandas(
        run, schema=DECODED_SCHEMA
    )
