"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

No analog in the reference (text-only); this is the media leg of a
training-data pipeline. The input_hint already carries `html: binary`,
so binary payload columns are first-class here.

Decode engines:
  - "headers" — REAL, dependency-free container parsing: PNG (IHDR),
    BMP (BITMAPINFOHEADER), GIF (logical screen descriptor + frame
    count), WAV (RIFF fmt/data chunks -> sample rate, channels, sample
    frames), PPM/PGM (ASCII header). These are actual decoders of the
    on-disk formats, not fakes; unrecognized magic falls through to
    codec='unknown' with size/sha only.
  - "fake" (default for the oracle path) — deterministic metadata
    derived from the bytes (length + sha), so the driver-contract
    oracle can mirror it in SQL.
  - "real" — the integration point for pixel/sample decoding (PIL /
    av / soundfile), which is NOT in this container: raises at PLAN
    time (a task-time raise would poison the job).

Scale shape: all three operators are narrow mapInPandas passes (no
shuffle). Media bytes never leave the executor that read them; only
small metadata/feature rows flow on. `spark.sql.files.maxPartitionBytes`
governs task sizing for large binary scans; frame sampling fans out
rows within the partition (flatMap-shaped, still narrow).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = "media_id string, kind string, content binary"

META_SCHEMA = (
    "media_id string, kind string, n_bytes long, content_sha string, "
    "width int, height int, n_frames int, codec string"
)

FEATURE_SCHEMA = "media_id string, feature array<float>"

FRAME_SCHEMA = "media_id string, frame_idx int, frame_bytes binary"


def _fake_meta(media_id: str, kind: str, content: bytes) -> tuple:
    """Deterministic stand-in decoder: metadata derived from the bytes.
    Real decoders (PIL.Image.open / av / soundfile) drop in here."""
    n = len(content) if content is not None else 0
    sha = hashlib.sha256(content or b"").hexdigest()
    h = int(sha[:8], 16)
    return (
        media_id,
        kind,
        n,
        sha,
        64 + h % 1024,           # fake width
        64 + (h >> 10) % 1024,   # fake height
        1 + h % 300,             # fake frame count
        f"fake/{kind}",
    )


def _header_meta(media_id: str, kind: str, content: bytes) -> tuple:
    """REAL container-header decode (no third-party deps).

    Formats: PNG, BMP, GIF (n_frames = image-descriptor count), WAV
    (width=sample_rate, height=channels, n_frames=sample frames —
    audio reuses the spatial slots, see META_SCHEMA note), PPM/PGM.
    Truncated/unknown payloads degrade to codec='unknown' with
    size/sha only — never a task failure."""
    import struct

    c = content or b""
    n = len(c)
    sha = hashlib.sha256(c).hexdigest()
    w = h = frames = 0
    codec = "unknown"
    try:
        if c[:8] == b"\x89PNG\r\n\x1a\n" and c[12:16] == b"IHDR":
            w, h = struct.unpack(">II", c[16:24])
            frames, codec = 1, "image/png"
        elif c[:2] == b"BM" and n >= 26:
            w = struct.unpack("<i", c[18:22])[0]
            h = abs(struct.unpack("<i", c[22:26])[0])  # may be top-down
            frames, codec = 1, "image/bmp"
        elif c[:6] in (b"GIF87a", b"GIF89a") and n >= 10:
            w, h = struct.unpack("<HH", c[6:10])
            frames = max(1, c.count(b"\x2c"))  # image descriptors (upper bound)
            codec = "image/gif"
        elif c[:4] == b"RIFF" and c[8:12] == b"WAVE":
            # walk RIFF chunks for fmt + data
            off, rate, channels, block_align, data_len = 12, 0, 0, 0, 0
            while off + 8 <= n:
                cid, clen = c[off : off + 4], struct.unpack("<I", c[off + 4 : off + 8])[0]
                if cid == b"fmt " and off + 24 <= n:
                    channels = struct.unpack("<H", c[off + 10 : off + 12])[0]
                    rate = struct.unpack("<I", c[off + 12 : off + 16])[0]
                    block_align = struct.unpack("<H", c[off + 20 : off + 22])[0]
                elif cid == b"data":
                    data_len = clen
                off += 8 + clen + (clen & 1)  # chunks are word-aligned
            w, h = rate, channels
            frames = data_len // block_align if block_align else 0
            codec = "audio/wav"
        elif c[:2] in (b"P5", b"P6"):
            toks, i = [], 2
            while len(toks) < 2 and i < n:
                while i < n and c[i : i + 1].isspace():
                    i += 1
                if c[i : i + 1] == b"#":  # comment line
                    while i < n and c[i : i + 1] != b"\n":
                        i += 1
                    continue
                j = i
                while j < n and not c[j : j + 1].isspace():
                    j += 1
                toks.append(c[i:j])
                i = j
            w, h = int(toks[0]), int(toks[1])
            frames = 1
            codec = "image/ppm" if c[:2] == b"P6" else "image/pgm"
    except (struct.error, ValueError, IndexError):
        w = h = frames = 0
        codec = "unknown"
    return (media_id, kind, n, sha, w, h, frames, codec)


def decode_media(media: DataFrame, engine: str = "fake") -> DataFrame:
    """(media_id, kind, content) -> typed metadata rows.

    engine="headers" is a real dependency-free container decoder (see
    `_header_meta`); engine="real" (pixel/sample decoding) is the
    PIL/av/soundfile integration point — not available in this
    environment, raises at PLAN time (a task-time raise would poison
    the job).
    """
    if engine == "fake":
        meta = _fake_meta
    elif engine == "headers":
        meta = _header_meta
    else:
        raise NotImplementedError(
            "pixel/sample decoding requires image/audio libraries not present "
            "in this environment; use engine='headers' (real container "
            "metadata) or engine='fake' (deterministic stub)"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "kind", "n_bytes", "content_sha",
            "width", "height", "n_frames", "codec",
        ]
        for pdf in batches:
            rows = [
                meta(m, k, c)
                for m, k, c in zip(pdf["media_id"], pdf["kind"], pdf["content"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "kind", "content").mapInPandas(_decode, META_SCHEMA)


def extract_features(media: DataFrame, dim: int = 16, engine: str = "fake") -> DataFrame:
    """(media_id, content) -> dense feature vector array<float>.

    Fake engine: dim floats in [0, 1) from sha256(content) — stable
    across runs/partitions, so downstream ANN/dedup operators
    (operators.similarity, operators.dedup) can be tested end-to-end
    on media columns today and swap in a real encoder later.
    """
    if engine != "fake":
        raise NotImplementedError("real feature extraction not available here")

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for m, c in zip(pdf["media_id"], pdf["content"]):
                digest = hashlib.sha256(c or b"")
                vals = []
                counter = 0
                raw = b""
                while len(vals) < dim:
                    raw = hashlib.sha256(digest.digest() + bytes([counter])).digest()
                    vals.extend(b / 255.0 for b in raw)
                    counter += 1
                out.append((m, [float(v) for v in vals[:dim]]))
            yield pd.DataFrame(out, columns=["media_id", "feature"])

    return media.select("media_id", "content").mapInPandas(_feat, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 4096, max_frames: int = 16) -> DataFrame:
    """Flat-map each media blob into sampled 'frame' rows (fake frames =
    fixed-stride byte slices; a real video path would seek keyframes).
    One input row -> up to max_frames output rows, still a narrow map.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    continue
                for idx, off in enumerate(range(0, len(c), every_n_bytes)):
                    if idx >= max_frames:
                        break
                    rows.append((m, idx, bytes(c[off : off + every_n_bytes])))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return media.select("media_id", "content").mapInPandas(_frames, FRAME_SCHEMA)
