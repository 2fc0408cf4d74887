"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

No analog in the reference (text-only); this is the media leg of a
training-data pipeline. The input_hint already carries `html: binary`,
so binary payload columns are first-class here.

The DECODE step is STUBBED: the real image/audio libraries are not in
this container, so `decode_media(..., engine="real")` raises
NotImplementedError, and the default `engine="fake"` derives
deterministic metadata/features from the bytes themselves (length +
md5). Everything AROUND the decode — schema, mapInPandas batch shape,
partitioning, null handling — is real and tested; swapping in PIL /
torchaudio later only changes the per-batch body.

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


def decode_media(media: DataFrame, engine: str = "fake") -> DataFrame:
    """(media_id, kind, content) -> typed metadata rows.

    engine="real" is the integration point for actual codecs — not
    available in this environment (NotImplementedError raised at task
    runtime would poison the job, so it raises at PLAN time here).
    """
    if engine != "fake":
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; use engine='fake' (deterministic stub)"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "kind", "n_bytes", "content_sha",
            "width", "height", "n_frames", "codec",
        ]
        for pdf in batches:
            rows = [
                _fake_meta(m, k, c)
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
