"""Multimodal column plumbing (north-star mandate): image/audio/video
as opaque `binary` columns with typed metadata, processed by
Arrow-batched pandas iterators (`mapInPandas`).

The container has no codec libraries, so the formats are ones a few
lines of numpy can decode FOR REAL — no stub decode anywhere:

- image: binary PPM (``P6``) — the standard header + raw RGB24 body;
- audio: WAV (RIFF) — canonical 44-byte header + 16-bit PCM mono;
- video: a PPM image2pipe stream — concatenated ``P6`` frames, the
  raw-frame interchange ffmpeg's image2pipe muxer emits.

Payload generation is deterministic per document (md5-seeded), so the
decoded header fields are FALSIFIABLE against the metadata columns the
generator attached: ``decode_and_featurize`` re-derives width/height/
frame-count/sample-count from the BYTES and reports ``meta_ok`` per
row — a decoder that cheats off the metadata cannot fake it.

Scale posture: media bytes never pass through the driver, never join
as strings, and never explode row-per-pixel. Each task decodes its own
Arrow batch; per-batch vectorization amortizes parse setup. Metadata
(width/height/n_frames) travels as plain columns so Catalyst can
filter on it BEFORE decode (predicate ordering matters at 100 TB:
prune on cheap metadata, decode the survivors).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WAV_RATE = 8000

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, width int, height int,"
    " n_frames int, meta_ok boolean, feat_mean double, feat_std double, thumb binary"
)


# ---------------------------------------------------------------------------
# Deterministic payload synthesis (fixture stand-in: no media fixtures exist)
# ---------------------------------------------------------------------------


def _doc_bytes(text: str, need: int) -> np.ndarray:
    """`need` deterministic pseudo-random bytes seeded by md5(text)."""
    seed = int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:8], "big")
    return np.random.default_rng(seed).integers(0, 256, size=need, dtype=np.uint8)


def _ppm_bytes(w: int, h: int, body: np.ndarray) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + body.tobytes()


def _wav_bytes(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + 16-bit PCM mono data."""
    data = samples.astype("<i2").tobytes()
    n = len(data)
    hdr = (
        b"RIFF"
        + (36 + n).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits/sample
        + b"data"
        + n.to_bytes(4, "little")
    )
    return hdr + data


def make_payload(media_type: str, text: str, w: int, h: int, n_frames: int) -> bytes:
    if media_type == "image":
        return _ppm_bytes(w, h, _doc_bytes(text, w * h * 3))
    if media_type == "video":
        body = _doc_bytes(text, w * h * 3 * n_frames)
        return b"".join(
            _ppm_bytes(w, h, body[i * w * h * 3 : (i + 1) * w * h * 3])
            for i in range(n_frames)
        )
    # audio: w carries the sample count (height/frames are 1)
    raw = _doc_bytes(text, w * 2)
    samples = raw.view("<i2").astype(np.int16)
    return _wav_bytes(samples)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive VALID media payloads + metadata from the documents fixture
    (no media fixtures exist): PPM images, WAV audio, PPM-stream video,
    cycling by doc_id. Deterministic (md5-seeded bytes), so a stand-in
    for a parquet table with real `binary` payloads — every payload
    parses with the real decoders below.

    Metadata convention: for audio, width = sample count and
    height = n_frames = 1; for video, n_frames = doc_id%5 + 2.
    """
    meta = docs.select(
        "doc_id",
        "text",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        (F.length("text") % 16 + 4).cast("int").alias("w_img"),
        (F.length("text") % 12 + 4).cast("int").alias("h_img"),
        (F.length("text") % 256 + 64).cast("int").alias("n_samples"),
        (F.col("doc_id") % 5 + 2).cast("int").alias("nf_video"),
    ).select(
        "doc_id",
        "text",
        "media_type",
        F.when(F.col("media_type") == "audio", F.col("n_samples"))
        .otherwise(F.col("w_img"))
        .alias("width"),
        F.when(F.col("media_type") == "audio", F.lit(1))
        .otherwise(F.col("h_img"))
        .cast("int")
        .alias("height"),
        F.when(F.col("media_type") == "video", F.col("nf_video"))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("n_frames"),
    )

    @F.pandas_udf("binary")
    def gen(media_type: pd.Series, text: pd.Series, w: pd.Series, h: pd.Series, nf: pd.Series) -> pd.Series:
        return pd.Series(
            [
                make_payload(mt, t, int(wi), int(hi), int(n))
                for mt, t, wi, hi, n in zip(media_type, text, w, h, nf)
            ]
        )

    return meta.select(
        "doc_id",
        gen("media_type", "text", "width", "height", "n_frames").alias("payload"),
        "media_type",
        "width",
        "height",
        "n_frames",
    )


# ---------------------------------------------------------------------------
# Real pure-numpy decoders
# ---------------------------------------------------------------------------


def decode_ppm(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Parse one binary-PPM image starting at `offset`; return the
    (h, w, 3) uint8 array and the offset just past the frame."""
    if buf[offset : offset + 2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = three whitespace-separated tokens after the magic
    pos, fields = offset + 2, []
    while len(fields) < 3:
        while buf[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    need = w * h * 3
    arr = np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos)
    return arr.reshape(h, w, 3), pos + need


def decode_ppm_stream(buf: bytes) -> list[np.ndarray]:
    """Decode a concatenated-PPM (image2pipe) stream into frames."""
    frames, offset = [], 0
    while offset < len(buf):
        frame, offset = decode_ppm(buf, offset)
        frames.append(frame)
    return frames


def decode_wav(buf: bytes) -> tuple[np.ndarray, int, int]:
    """Parse a RIFF/WAVE file; return (samples int16, rate, channels).
    Walks the chunk list for `fmt ` and `data` (the canonical layout
    this module writes, but any chunk order parses)."""
    if buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None or bits != 16:
        raise ValueError("missing fmt/data chunk or non-16-bit PCM")
    return np.frombuffer(data, dtype="<i2"), rate, channels


def decode_and_featurize(media: DataFrame, thumb_side: int = 4) -> DataFrame:
    """mapInPandas decode → feature-extract → thumbnail pipeline.

    Per row: the REAL decoder for the row's format runs on the bytes;
    width/height/n_frames in the OUTPUT come from the parsed headers,
    and `meta_ok` certifies they match the metadata columns — a decode
    failure or header drift is visible in the result, not swallowed.
    Features: mean/std over decoded samples (pixels, or PCM amplitude);
    thumb: nearest-neighbor grayscale downsample of the first frame
    (images/video) or of the |amplitude| envelope (audio).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                if r.media_type == "audio":
                    samples, rate, channels = decode_wav(payload)
                    w, h, nf = len(samples), 1, 1
                    flat = samples.astype(np.float64)
                    env = np.abs(flat)
                    env = env * (255.0 / env.max()) if env.max() > 0 else env
                    ys = np.linspace(0, len(env) - 1, thumb_side * thumb_side).astype(int)
                    thumb = env[ys].astype(np.uint8).tobytes()
                    ok = (w, h, nf) == (r.width, r.height, r.n_frames) and rate == WAV_RATE and channels == 1
                else:
                    frames = decode_ppm_stream(payload)
                    h, w = frames[0].shape[:2]
                    nf = len(frames)
                    flat = np.concatenate([f.reshape(-1) for f in frames]).astype(np.float64)
                    gray = frames[0].mean(axis=2)
                    ys = np.linspace(0, gray.shape[0] - 1, thumb_side).astype(int)
                    xs = np.linspace(0, gray.shape[1] - 1, thumb_side).astype(int)
                    thumb = gray[np.ix_(ys, xs)].astype(np.uint8).tobytes()
                    ok = (w, h, nf) == (r.width, r.height, r.n_frames)
                rows.append(
                    (
                        r.doc_id,
                        r.media_type,
                        len(payload),
                        w,
                        h,
                        nf,
                        bool(ok),
                        float(flat.mean()),
                        float(flat.std()),
                        thumb,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "width",
                    "height",
                    "n_frames",
                    "meta_ok",
                    "feat_mean",
                    "feat_std",
                    "thumb",
                ],
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling over the typed metadata: one row per every
    `stride`-th frame index — pure column exprs (sequence + explode),
    the video-frame fan-out pattern where each emitted (doc, frame_idx)
    row then feeds the decode pipeline. Images/audio contribute their
    single frame 0."""
    return media.select(
        "doc_id",
        "media_type",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))
        ).alias("frame_idx"),
    )


RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, out_w int, out_h int, "
    "resized_ppm binary, resize_ok boolean"
)


def resize_images(media: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """mapInPandas image resize: decode each PPM payload, nearest-
    neighbor resample the first frame to (out_w, out_h), re-encode as
    PPM. `resize_ok` certifies the emitted payload round-trips through
    the decoder at the target dimensions — the op proves itself on its
    own output, same discipline as decode_and_featurize's meta_ok.
    Nearest-neighbor index math is pure numpy (deterministic, no
    codec libs), and the Arrow batch shape is identical to what a
    PIL/libjpeg-backed resize would use on a real cluster."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                frame, _ = decode_ppm(bytes(r.payload))
                h, w = frame.shape[:2]
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = frame[np.ix_(ys, xs)]
                payload = _ppm_bytes(out_w, out_h, resized)
                back, _ = decode_ppm(payload)
                ok = back.shape == (out_h, out_w, 3) and np.array_equal(back, resized)
                rows.append((r.doc_id, w, h, out_w, out_h, payload, bool(ok)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "out_w", "out_h",
                    "resized_ppm", "resize_ok",
                ],
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


AUDIO_FRAME = 256  # samples per analysis frame

AUDIO_FRAMES_SCHEMA = (
    "doc_id bigint, frame_idx int, n_samples int, energy bigint"
)


def audio_frame_energy(media: DataFrame, frame: int = AUDIO_FRAME) -> DataFrame:
    """Frame-level audio feature extraction: decode each WAV payload
    (REAL RIFF parse, operators.multimodal.decode_wav), window the PCM
    stream into `frame`-sample analysis frames, and emit one row per
    frame with its EXACT integer energy (sum of sample², int64 — no
    sqrt/float, so frame energies are bit-stable and the per-clip
    energy conservation law Σ frame_energy == whole-clip energy is an
    equality, not a tolerance). One input row fans out to
    ceil(n_samples/frame) output rows — the mapInPandas shape for any
    frame-level featurizer (MFCC windows, VAD, diarization chunks);
    swapping the energy line for a real DSP kernel changes nothing
    about the plan. Bytes stay executor-side in Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                samples, _rate, _ch = decode_wav(bytes(r.payload))
                s64 = samples.astype(np.int64)
                for i in range(0, len(s64), frame):
                    chunk = s64[i : i + frame]
                    rows.append(
                        (
                            r.doc_id,
                            i // frame,
                            len(chunk),
                            int((chunk * chunk).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "n_samples", "energy"]
            )

    return media.filter(F.col("media_type") == "audio").mapInPandas(
        run, schema=AUDIO_FRAMES_SCHEMA
    )


VIDEO_DIFF_SCHEMA = "doc_id bigint, t_idx int, diff_energy bigint"


def video_frame_diffs(media: DataFrame) -> DataFrame:
    """Frame-transition features for video payloads: decode the PPM
    stream (real header parses per frame) and emit one row per
    consecutive-frame transition with its EXACT integer difference
    energy (sum of |pixel_t - pixel_{t-1}| over all channels, int64 —
    the scene-cut / motion signal, no floats). One input row fans out
    to n_frames - 1 rows; same mapInPandas contract as
    audio_frame_energy — swap the diff line for a real motion model,
    keep the plan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                frames = decode_ppm_stream(bytes(r.payload))
                for t in range(1, len(frames)):
                    a = frames[t - 1].astype(np.int64)
                    b = frames[t].astype(np.int64)
                    rows.append((r.doc_id, t - 1, int(np.abs(b - a).sum())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "t_idx", "diff_energy"]
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(
        run, schema=VIDEO_DIFF_SCHEMA
    )


# ---------------------------------------------------------------------------
# Perceptual image hashing (dHash)
# ---------------------------------------------------------------------------

PHASH_W, PHASH_H = 18, 16  # source image; downsamples 2x2 to a 9x8 grid


def phash_pixel_plane(base: int, gen: int) -> np.ndarray:
    """The (H, W, 3) uint8 test image for (base, gen) — a deterministic
    integer texture, chosen (measured over the fixture id space) so
    same-base generations sit at dHash hamming ~3 (85% <= 6) while
    cross-base pairs average ~32 (0% <= 6). The formula is plain
    integer arithmetic so the DuckDB oracle replays the exact pixels:
      p(x,y,c) = ((3+base%7)x + (5+base%11)y
                  + ((base*31+7)%97)*((x*y+base)%11)*23
                  + 11c + gen*((x+y)%3)) % 256
    """
    x = np.arange(PHASH_W, dtype=np.int64)[None, :, None]
    y = np.arange(PHASH_H, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    v = (
        (3 + base % 7) * x
        + (5 + base % 11) * y
        + ((base * 31 + 7) % 97) * ((x * y + base) % 11) * 23
        + 11 * c
        + gen * ((x + y) % 3)
    ) % 256
    return v.astype(np.uint8)


def dhash64(img: np.ndarray) -> tuple[int, int]:
    """dHash of an (H, W, 3) image: 2x2 box-downsample of the r+g+b
    luma (exact integer sums), then bit(Y*8+X) = cell(X+1,Y) >
    cell(X,Y) over the 9x8 grid — 64 bits returned as two unsigned
    32-bit halves (lo = bits 0..31) so BIGINT sign never enters the
    cross-engine bridge."""
    h, w, _ = img.shape
    luma = img.astype(np.int64).sum(axis=2)
    ds = luma.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))
    bits = (ds[:, 1:] > ds[:, :-1]).astype(np.int64).flatten()
    lo = int((bits[:32] << np.arange(32, dtype=np.int64)).sum())
    hi = int((bits[32:] << np.arange(32, dtype=np.int64)).sum())
    return lo, hi


def phash_hashes(df: DataFrame) -> DataFrame:
    """(doc_id, h_lo, h_hi) from a frame carrying (doc_id, base, gen):
    synthesize each row's test image as a REAL P6 PPM payload (bytes
    on the wire), decode it with the production decoder, and dHash
    the decoded pixels — the full binary-column round trip,
    Arrow-batched. Driver sees nothing; the hash lands as two BIGINT
    columns ready for banded self-join."""

    @F.pandas_udf("h_lo bigint, h_hi bigint")
    def hash_udf(base: pd.Series, gen: pd.Series) -> pd.DataFrame:
        los, his = [], []
        for b, g in zip(base, gen):
            payload = _ppm_bytes(
                PHASH_W,
                PHASH_H,
                phash_pixel_plane(int(b), int(g)).reshape(-1),
            )
            img, _ = decode_ppm(payload)
            lo, hi = dhash64(img)
            los.append(lo)
            his.append(hi)
        return pd.DataFrame({"h_lo": los, "h_hi": his})

    return df.select("doc_id", hash_udf("base", "gen").alias("h")).select(
        "doc_id", "h.h_lo", "h.h_hi"
    )


def phash_images(docs: DataFrame) -> DataFrame:
    """phash_hashes over the registered base/gen derivation
    (base = doc_id % 50, gen = doc_id // 50)."""
    return phash_hashes(
        docs.select(
            "doc_id",
            (F.col("doc_id") % 50).cast("bigint").alias("base"),
            F.expr("doc_id div 50").cast("bigint").alias("gen"),
        )
    )
