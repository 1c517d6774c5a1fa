"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct.  The Spark-side plumbing (schema, partition-friendly
batch iteration, Arrow batch shape) is real and tested.  Codecs:

* ``'pnm'`` — a REAL, dependency-free decoder for binary PGM (P5)
  grayscale images (restricted grammar: single-space header,
  maxval 255): numpy header parse + raster decode + 8-bin luminance
  histogram; resize is a real nearest-neighbour resample.  Payloads
  for it are built engine-side by :func:`attach_pnm_payload`.  This
  is the default correctness path (q29's oracle value-checks it).
* ``'pil'`` — Pillow, GUARDED by the same probe pattern as the C
  Jaro-Winkler hook (functions/strings.py): importable via the
  ``multimodal`` extra in pyproject.toml; handles compressed formats
  (PNG/JPEG) the pnm codec cannot.
* ``'stub'`` — the documented deterministic fake for opaque payloads
  of unknown format.
* ``'auto'`` — pil when importable, else stub (NOT pnm: auto must
  accept arbitrary blobs, and pnm raises on non-PGM bytes — that
  strictness is what makes it a real decoder).

Video frame demux (av/ffmpeg) remains stub-only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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
    if codec not in ("pil", "stub", "pnm"):
        raise ValueError(
            f"unknown codec {codec!r}; 'auto'|'pil'|'pnm'|'stub'"
        )
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


def attach_pnm_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build REAL binary PGM (P5) grayscale images engine-side: the
    document's utf-8 bytes become the pixel raster (zero-padded to
    w*h), under a standard ``P5 <w> <h> 255\\n`` header.  Dimensions
    derive deterministically from the text length (w in 4..16), so an
    external oracle can re-derive every decoded value.  All byte
    assembly is native (encode/format_string/rpad/concat) — no UDF."""
    w = (F.length(text_col) % 13 + 4).cast("int")
    h = F.ceil(F.length(text_col) / w).cast("int")
    return (
        df.withColumn("_w", w)
        .withColumn("_h", h)
        .withColumn(
            "payload",
            F.concat(
                F.encode(
                    F.format_string("P5 %d %d 255\n", "_w", "_h"), "utf-8"
                ),
                F.expr(f"rpad(encode({text_col}, 'utf-8'), _w * _h, X'00')"),
            ),
        )
        .withColumn(
            "meta",
            F.struct(
                F.lit("image/x-portable-graymap").alias("mime"),
                F.octet_length("payload").alias("n_bytes"),
            ),
        )
        .drop("_w", "_h")
    )


def _pnm_parse(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a restricted-grammar binary PGM: ``P5 <w> <h> 255\\n``
    header (single spaces, maxval 255) + w*h raster bytes.  Raises on
    anything else — strictness is the point of a real decoder."""
    if blob is None:
        raise ValueError("null payload")
    header, sep, raster = bytes(blob).partition(b"\n")
    parts = header.split(b" ")
    if not sep or len(parts) != 4 or parts[0] != b"P5" or parts[3] != b"255":
        raise ValueError(f"not a supported PGM header: {header[:32]!r}")
    w, h = int(parts[1]), int(parts[2])
    if w <= 0 or h <= 0 or len(raster) < w * h:
        raise ValueError(f"truncated raster: {len(raster)} < {w}x{h}")
    return w, h, np.frombuffer(raster, dtype=np.uint8, count=w * h)


def _pnm_decode(blob: bytes) -> tuple[int, int, list[float]]:
    """Real image decode: header-parsed dimensions + 8-bin luminance
    histogram (32-wide bins) over the actual pixel raster, normalized
    by pixel count."""
    w, h, px = _pnm_parse(blob)
    hist = np.bincount(px >> 5, minlength=8).astype(np.float64) / (w * h)
    return w, h, hist.tolist()


def _pnm_resize(blob: bytes, target_w: int, target_h: int) -> bytes:
    """Real nearest-neighbour resample of a P5 image to
    (target_w, target_h), re-encoded as P5."""
    w, h, px = _pnm_parse(blob)
    img = px.reshape(h, w)
    rows = (np.arange(target_h) * h) // target_h
    cols = (np.arange(target_w) * w) // target_w
    out = img[np.ix_(rows, cols)]
    return b"P5 %d %d 255\n" % (target_w, target_h) + out.tobytes()


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
    'auto' (PIL when importable, else stub) | 'pil' | 'pnm' | 'stub'."""
    decode = {
        "pil": _pil_decode,
        "pnm": _pnm_decode,
        "stub": _fake_decode,
    }[_resolve_codec(codec)]

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
    resolved = _resolve_codec(codec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = {
            "pil": _pil_resize,
            "pnm": _pnm_resize,
            "stub": _fake_resize,
        }[resolved]
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
