"""Multimodal column plumbing (north-star mandate): image/audio/video
as opaque `binary` columns with typed metadata, processed by
Arrow-batched pandas iterators (`mapInPandas`).

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic fake behind the real Spark plumbing —
schema, partitioning, UDF signature and batch shape are production-
real; swapping `_decode_stub` for PIL/ffmpeg is a one-function change.

Scale posture: media bytes never pass through the driver, never join
as strings, and never explode row-per-pixel. Each task decodes its own
Arrow batch; per-batch vectorization amortizes codec setup. Metadata
(width/height/duration) travels as plain columns so Catalyst can filter
on it BEFORE decode (predicate ordering matters at 100 TB: prune on
cheap metadata, decode the survivors).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, width int, height int,"
    " feat_mean double, feat_std double, thumb binary"
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic opaque binary column + metadata from the
    documents fixture (no media fixtures exist): bytes = utf-8 text,
    media_type cycles by doc_id, dims derived from length. Stands in
    for a parquet table with real `binary` payloads."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        (F.length("text") % 640 + 16).cast("int").alias("width"),
        (F.length("text") % 480 + 16).cast("int").alias("height"),
    )


def _decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB — deterministic fake decoder. A real deployment replaces
    this with PIL.Image.open / soundfile / pyav frame extraction. The
    fake: interpret bytes as uint8 samples, tile/truncate to (h, w)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    tiled = np.resize(arr, need)  # deterministic tile/truncate
    return tiled.reshape(height, width)


def decode_and_featurize(media: DataFrame, thumb_side: int = 4) -> DataFrame:
    """mapInPandas decode → feature-extract → thumbnail pipeline.

    Output per row: payload stats (mean/std of decoded samples) and a
    downsampled thumb (thumb_side² bytes) — the shape of a real
    image-featurization pass, minus the codec.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "width": pdf["width"],
                "height": pdf["height"],
            }
            means, stds, thumbs = [], [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = _decode_stub(payload, int(w), int(h))
                means.append(float(img.mean()))
                stds.append(float(img.std()))
                # nearest-neighbor downsample to thumb_side x thumb_side
                ys = np.linspace(0, img.shape[0] - 1, thumb_side).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, thumb_side).astype(int)
                thumbs.append(img[np.ix_(ys, xs)].tobytes())
            out["feat_mean"] = means
            out["feat_std"] = stds
            out["thumb"] = thumbs
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' on the opaque payload: one sample row per
    every_n_bytes offset — pure column exprs (sequence + explode), the
    pattern for video-frame fan-out where each frame row then feeds the
    decode pipeline."""
    return media.select(
        "doc_id",
        "media_type",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.length("payload") - 1, F.lit(0)),
                F.lit(every_n_bytes),
            )
        ).alias("frame_offset"),
    )
