"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas kernels.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features clearly marked as such / NotImplementedError
for real decoding) — but the Spark-side plumbing is real and tested:
schema (binary payload + metadata struct), mapInPandas batch iteration,
partition-preserving narrow execution.

At 100 TB the shape matters: media blobs stay columnar in parquet, the
kernel streams Arrow batches (no per-row Python), and feature extraction
is a narrow map — no shuffle until the (tiny) feature vectors aggregate.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, width int, height int, "
    "feat_mean double"
)

HAVE_CODECS = False  # no PIL/librosa/ffmpeg in this environment


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat the utf-8 bytes of `text` as an opaque media
    payload plus a metadata struct — the schema a real ingest would carry
    (payload binary, meta struct<mime,codec>)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit("none").alias("codec"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real decode path — requires codecs not present in this container."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg — not available; "
        "use extract_features (deterministic fake) for plumbing tests"
    )


def _fake_features(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic FAKE feature extractor (stands in for decode+resize+
    embed): derives pseudo width/height/mean from the payload bytes so the
    pipeline shape is exercised end-to-end with stable outputs."""
    import hashlib

    out = []
    for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
        b = bytes(payload)
        h = hashlib.md5(b).hexdigest()
        out.append(
            {
                "doc_id": int(doc_id),
                "n_bytes": len(b),
                "checksum": h,
                "width": int(h[:4], 16) % 1920,
                "height": int(h[4:8], 16) % 1080,
                "feat_mean": (sum(b[:64]) / max(min(len(b), 64), 1)) / 255.0,
            }
        )
    return pd.DataFrame(out)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — Arrow batches
    in, Arrow batches out, narrow (partition-preserving)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _fake_features(batch)

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, off long, n_bytes long, checksum string"


def sample_frames(
    df: DataFrame, frame_size: int = 64, step: int = 4
) -> DataFrame:
    """Video-style frame sampling over opaque binary payloads: the payload
    is treated as a sequence of fixed-size byte frames and every
    ``step``-th frame is emitted with its offset and checksum — the
    decode-free half of a frame-sample pipeline (a real decoder would
    replace the checksum with pixel features; see decode_image for the
    honest stub).

    Shape: mapInPandas with a 1→N row fan-out per document — Arrow
    batches, narrow, partition-preserving; no shuffle at any size."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_size - 1) // frame_size
                for fi in range(0, n_frames, step):
                    chunk = b[fi * frame_size : (fi + 1) * frame_size]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": fi,
                            "off": fi * frame_size,
                            "n_bytes": len(chunk),
                            "checksum": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "off", "n_bytes", "checksum"],
            )

    return df.mapInPandas(kernel, schema=FRAME_SCHEMA)
