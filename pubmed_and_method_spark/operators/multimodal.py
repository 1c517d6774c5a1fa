"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct.  The Spark-side plumbing (schema, partition-friendly
batch iteration, Arrow batch shape) is real and tested.  The codec is
GUARDED (the same probe pattern as the C Jaro-Winkler hook,
functions/strings.py): when Pillow is importable — the ``multimodal``
extra in pyproject.toml — ``codec='auto'`` decodes/resizes real image
bytes with PIL; otherwise it falls back to the documented
deterministic stub.  ``codec='stub'`` pins the fake path (used by q29
so its checksum column is byte-identical in every environment);
``codec='pil'`` forces the real one (raises without Pillow).  Video
frame demux (av/ffmpeg) remains stub-only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _probe_pil():
    """Pillow when importable, else None (never raises)."""
    try:
        from PIL import Image  # noqa: F401

        return Image
    except Exception:
        return None


_PIL = _probe_pil()


def _resolve_codec(codec: str) -> str:
    if codec == "auto":
        return "pil" if _PIL is not None else "stub"
    if codec == "pil" and _PIL is None:
        raise ImportError(
            "codec='pil' requires Pillow (pip install "
            "'pubmed-and-method-spark[multimodal]')"
        )
    if codec not in ("pil", "stub"):
        raise ValueError(f"unknown codec {codec!r}; 'auto'|'pil'|'stub'")
    return codec

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


def _pil_decode(blob: bytes) -> tuple[int, int, list[float]]:
    """Real image decode + 8-bin luminance-histogram feature (PIL)."""
    from io import BytesIO

    if blob is None:
        raise ValueError("null payload")
    img = _PIL.open(BytesIO(blob)).convert("L")
    w, h = img.size
    hist = img.histogram()  # 256 luminance bins
    tot = float(sum(hist)) or 1.0
    feat = [sum(hist[i * 32:(i + 1) * 32]) / tot for i in range(8)]
    return w, h, feat


def decode_batches(df: DataFrame, codec: str = "auto") -> DataFrame:
    """mapInPandas decode: per-partition Arrow batches in, typed rows
    out — the scale-path shape for a real decoder (each batch is
    decoded inside one Python worker; no per-row serde).  ``codec``:
    'auto' (PIL when importable, else stub) | 'pil' | 'stub'."""
    decode = _pil_decode if _resolve_codec(codec) == "pil" else _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode(b) for b in pdf["payload"]]
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


RESIZED_SCHEMA = (
    "doc_id long, width int, height int, resized binary, resize_ratio double"
)


def _fake_resize(blob: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic stand-in for an image resample.  STUB: replace
    with PIL `Image.resize` in production; the contract is
    bytes -> bytes with output size proportional to target area."""
    if blob is None:
        raise NotImplementedError("real codec required for null payloads")
    out_len = max(1, min(len(blob), target_w * target_h // 64))
    step = max(1, len(blob) // out_len)
    return blob[::step][:out_len]


def _pil_resize(blob: bytes, target_w: int, target_h: int) -> bytes:
    """Real PIL resample to (target_w, target_h), re-encoded PNG."""
    from io import BytesIO

    if blob is None:
        raise ValueError("null payload")
    img = _PIL.open(BytesIO(blob)).resize((target_w, target_h))
    buf = BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def resize_batches(
    df: DataFrame, target_w: int = 224, target_h: int = 224,
    codec: str = "auto",
) -> DataFrame:
    """mapInPandas resize: the standard vision-pipeline preprocessing
    step (decode -> resize to model input size).  1 row in -> 1 row
    out; batch shape and schema are production-real.  ``codec='auto'``
    resamples with PIL when importable, else the deterministic stub."""
    use_pil = _resolve_codec(codec) == "pil"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = _pil_resize if use_pil else _fake_resize
        for pdf in batches:
            resized = [fn(b, target_w, target_h) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "resized": resized,
                    "resize_ratio": [
                        len(r) / max(1, len(b))
                        for r, b in zip(resized, pdf["payload"])
                    ],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, n_frames int, frame binary, ts_offset_ms long"
)


def frame_sample_batches(
    df: DataFrame, every_k: int = 4, frame_bytes: int = 32, fps: int = 25
) -> DataFrame:
    """mapInPandas frame sampling: the video path's 1 -> N row
    expansion (one output row per SAMPLED frame) — the batch shape a
    real demuxer (av/ffmpeg) produces.  Frame count and frame bytes
    are derived deterministically from the payload (STUB: replace the
    slicing with a real keyframe/seek demux); sampling keeps every
    k-th frame with its timestamp offset at ``fps``.

    Scale note: the expansion factor is n_frames/every_k per row —
    bound memory by keeping input partitions small
    (spark.sql.files.maxPartitionBytes), not by buffering whole videos
    per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "n_frames": [],
                "frame": [], "ts_offset_ms": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                if blob is None:
                    raise NotImplementedError(
                        "real demuxer required for null payloads"
                    )
                n_frames = max(1, len(blob) // frame_bytes)
                for i in range(0, n_frames, every_k):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["n_frames"].append(n_frames)
                    out["frame"].append(
                        blob[i * frame_bytes: (i + 1) * frame_bytes]
                    )
                    out["ts_offset_ms"].append(i * 1000 // fps)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=FRAMES_SCHEMA)
