"""Multimodal columns: opaque binary payloads + typed metadata.

Design for 100 TB of image/audio/video (SURVEY north star): media
lives as a ``binary`` column with a struct of metadata beside it;
decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` operators so each executor core processes
whole record batches and the bytes never round-trip through the driver.

The actual codec work (PIL/ffmpeg/soundfile) is NOT available in this
container, so the decode step is stubbed two ways:
- ``decode_stub="fake"`` → a deterministic fake decoder (shape +
  checksum-derived features) so the full Spark plumbing — schema,
  partitioning, UDF signature, batch shape — is real and tested;
- ``decode_stub="raise"`` → ``NotImplementedError`` marking exactly
  where the real library call plugs in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width: int, height: int, sample_rate: int, n_frames: int, codec: string>"
)

FEATURES_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, checksum string, "
    "features array<double>, decode_ok boolean"
)


def attach_media_meta(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    kind: str = "image",
    sample_rate: int | None = None,
) -> DataFrame:
    """Stamp typed metadata next to an opaque binary column."""
    return df.withColumn("kind", F.lit(kind)).withColumn(
        "meta",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(sample_rate).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit("unknown").alias("codec"),
        ),
    )


def _fake_decode(payload: bytes, n_features: int) -> list[float]:
    """Deterministic stand-in for a real decoder: derives a fixed-width
    feature vector from the payload digest (stable across runs/executors)."""
    digest = hashlib.sha256(payload or b"").digest()
    return [digest[i % len(digest)] / 255.0 for i in range(n_features)]


def extract_features(
    media: DataFrame,
    *,
    n_features: int = 8,
    decode_stub: str = "fake",
) -> DataFrame:
    """Decode + featurize binary payloads, Arrow batch at a time.

    Replace ``_fake_decode`` with the real library call (PIL decode →
    resize → embed, or ffmpeg frame-sample) — the operator contract
    (schema, batching, null handling) does not change.
    """
    if decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise'")

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg/soundfile (absent in "
                    "this container); use decode_stub='fake' for plumbing tests"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "checksum": [
                        hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "features": [
                        _fake_decode(p, n_features) for p in pdf["payload"]
                    ],
                    "decode_ok": [p is not None and len(p) > 0 for p in pdf["payload"]],
                }
            )
            yield out

    return media.mapInPandas(featurize, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width: int, height: int, sample_rate: int, n_frames: int, codec: string>"
)

FRAMES_SCHEMA = "media_id bigint, frame_idx int, frame binary, n_bytes bigint"


def resize_images(
    media: DataFrame,
    *,
    width: int,
    height: int,
    decode_stub: str = "fake",
) -> DataFrame:
    """Resize operator: same row count, payload rewritten, meta updated
    with the target dimensions. The fake decoder emits a deterministic
    payload derived from (input digest, dims) so plumbing tests can
    assert stability; the real implementation decodes → resamples →
    re-encodes inside the same Arrow batch loop (PIL/`cv2` plug in at
    the marked line). 1-in-1-out keeps the operator narrow: no shuffle,
    scales linearly with input splits."""
    if decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise'")

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real resize requires PIL/cv2 (absent in this container)"
                )
            # real impl: Image.open(BytesIO(p)).resize((width, height)).save(...)
            payloads = [
                hashlib.sha256((p or b"") + f"{width}x{height}".encode()).digest()
                for p in pdf["payload"]
            ]
            out = pdf.copy()
            out["payload"] = payloads
            out["meta"] = [
                {**(m if isinstance(m, dict) else {}), "width": width, "height": height}
                for m in pdf["meta"]
            ]
            yield out

    return media.mapInPandas(do_resize, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame,
    *,
    n_frames: int = 4,
    decode_stub: str = "fake",
) -> DataFrame:
    """Frame-sampling operator: one video row fans out to ``n_frames``
    frame rows (1-in-N-out inside the Arrow batch — mapInPandas is the
    natural shape for row-expanding media ops; no shuffle, the fan-out
    happens executor-local). Real impl: ffmpeg keyframe extraction at
    the marked line; the fake emits deterministic per-index digests."""
    if decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise'")

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg (absent in this container)"
                )
            rows = {"media_id": [], "frame_idx": [], "frame": [], "n_bytes": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for i in range(n_frames):
                    # real impl: ffmpeg -ss <t_i> -frames:v 1
                    frame = hashlib.sha256((p or b"") + str(i).encode()).digest()
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(frame)
                    rows["n_bytes"].append(len(frame))
            yield pd.DataFrame(rows)

    return media.mapInPandas(do_sample, schema=FRAMES_SCHEMA)


SEGMENTS_SCHEMA = (
    "media_id bigint, segment_idx int, start_ms bigint, segment binary, n_bytes bigint"
)


def segment_audio(
    media: DataFrame,
    *,
    window_ms: int = 25,
    hop_ms: int = 10,
    decode_stub: str = "fake",
) -> DataFrame:
    """Audio windowing operator (the MFCC/fbank front-end shape): one
    audio row fans out to overlapping fixed-length windows
    (``window_ms`` long every ``hop_ms``). Unlike the constant-count
    video sampler, the fan-out is DATA-DEPENDENT: the number of
    windows derives from the clip duration, which derives from the
    payload size and ``meta.sample_rate`` (16-bit mono PCM assumed:
    ``n_samples = n_bytes // 2``). 1-in-N-out inside the Arrow batch —
    executor-local, no shuffle, linear in input splits.

    Real impl: soundfile/librosa frame slicing at the marked line; the
    fake emits deterministic per-window digests so the data-dependent
    fan-out itself is oracle-checkable in SQL.
    """
    if decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise'")

    def do_segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real audio decode requires soundfile/librosa (absent in "
                    "this container)"
                )
            rows = {
                "media_id": [],
                "segment_idx": [],
                "start_ms": [],
                "segment": [],
                "n_bytes": [],
            }
            for mid, p, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                nb = len(p or b"")
                sr = (m or {}).get("sample_rate") or 0
                if nb == 0 or sr <= 0:
                    continue  # nothing decodable → no windows
                duration_ms = ((nb // 2) * 1000) // sr
                n_seg = 1 if duration_ms <= window_ms else 1 + (
                    (duration_ms - window_ms) // hop_ms
                )
                for i in range(n_seg):
                    # real impl: samples[i*hop*sr//1000 : (i*hop+window)*sr//1000]
                    seg = hashlib.sha256((p or b"") + b"seg" + str(i).encode()).digest()
                    rows["media_id"].append(mid)
                    rows["segment_idx"].append(i)
                    rows["start_ms"].append(i * hop_ms)
                    rows["segment"].append(seg)
                    rows["n_bytes"].append(len(seg))
            yield pd.DataFrame(rows)

    return media.mapInPandas(do_segment, schema=SEGMENTS_SCHEMA)
