"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads travel as ``binary`` columns (or object
store path pointers for >~1 MB payloads) with a sibling metadata struct;
decode / feature-extraction runs as Arrow-batched pandas iterators
(mapInPandas), which is the supported way to run per-record Python at
cluster scale without row-at-a-time serialization.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_stub`` produces deterministic fake features so the
Spark-side plumbing — schema, batching, partitioning — is real and tested;
swap `_decode_batch` for a real decoder (PIL/librosa/ffmpeg) in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        # float64: the Python decoder computes in double anyway, and float32
        # storage would perturb values across the exact-halfway rounding
        # boundaries the oracle comparison prints at
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload —
    exercises the binary-column path against real testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass: byte length + content hash, no decode.
    This is the cheap pre-filter you run before shipping bytes to Python."""
    return media.select(
        "media_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB decoder: deterministic fake 8-dim feature from payload bytes.

    Production: replace with e.g. PIL.Image.open(io.BytesIO(b)) → resize →
    np.asarray; the mapInPandas contract (Arrow batches in/out) is unchanged.
    """
    feats = []
    for b in pdf["payload"]:
        b = bytes(b or b"")
        # deterministic fake: byte-histogram moments over 8 buckets
        buckets = [0] * 8
        for byte in b[:4096]:
            buckets[byte % 8] += 1
        total = max(sum(buckets), 1)
        feats.append([float(c) / total for c in buckets])
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "n_bytes": [len(bytes(b or b"")) for b in pdf["payload"]],
            "feature": feats,
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas (the scale path for
    per-record Python).  Batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return media.select("media_id", "payload").mapInPandas(run, FEATURES_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Frame sampling — the 1->N multimodal shape (one media row fans out to
    several frame rows) as an Arrow-batched mapInPandas.

    The "decoder" is a DETERMINISTIC STUB (fixed-size byte chunks stand in
    for keyframes — no ffmpeg in this container); production swaps the
    chunk loop for real keyframe extraction while the Spark-side plumbing
    (fan-out schema, batch iteration, per-frame hashing) stays identical.
    Deterministic chunking also makes this the one Python mapInPandas op
    with a full SQL oracle (blob substring + sha256 in DuckDB).
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "frame_sha256": [], "n_bytes": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload or b"")
                n_frames = min(max_frames, max(1, (len(b) + frame_bytes - 1) // frame_bytes))
                for i in range(n_frames):
                    chunk = b[i * frame_bytes:(i + 1) * frame_bytes]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_sha256"].append(hashlib.sha256(chunk).hexdigest())
                    out["n_bytes"].append(len(chunk))
            frame = pd.DataFrame(out)
            frame["frame_idx"] = frame["frame_idx"].astype("int32")
            yield frame

    return media.select("media_id", "payload").mapInPandas(run, FRAMES_SCHEMA)


THUMBNAIL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("thumbnail", T.BinaryType()),
    ]
)


def resize_thumbnails(media: DataFrame, thumb_w: int = 8, thumb_h: int = 8) -> DataFrame:
    """Resize — the 1->1 binary-to-binary multimodal shape: each payload
    becomes a fixed-size thumbnail byte grid.

    STUB resizer (no PIL in this container): deterministic byte striding
    samples thumb_w*thumb_h evenly-spaced payload bytes (a real resize is
    `PIL.Image.open(...).resize((w, h)).tobytes()` with the identical
    mapInPandas contract).  Output stays a typed ``binary`` column so
    downstream ops (payload_stats, extract_features) compose unchanged.
    """
    n_px = thumb_w * thumb_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for payload in pdf["payload"]:
                b = bytes(payload or b"")
                if not b:
                    thumbs.append(bytes(n_px))
                    continue
                step = max(len(b) // n_px, 1)
                sampled = b[::step][:n_px]
                thumbs.append(sampled.ljust(n_px, b"\x00"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb_w": pd.Series([thumb_w] * len(pdf), dtype="int32"),
                    "thumb_h": pd.Series([thumb_h] * len(pdf), dtype="int32"),
                    "thumbnail": thumbs,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, THUMBNAIL_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Real image decode is NOT available in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; use extract_features (stub) for the plumbing"
    )
