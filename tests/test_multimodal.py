"""Multimodal plumbing tests: the decode engine is a deterministic
stub, but the Spark-side schema / batch shape / null handling / narrow
plan are real — that's what these pin down."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("m1", "image", b"\x89PNG fake image bytes" * 100),
        ("m2", "audio", b"RIFF fake wav" * 1000),
        ("m3", "video", b"\x00\x00\x01\xba fake mpeg" * 2000),
        ("m4", "image", None),  # null payload must not crash the batch
    ]
    return spark.createDataFrame(rows, "media_id string, kind string, content binary")


class TestDecode:
    def test_meta_schema_and_determinism(self, spark, media_df):
        from easyner_spark.operators.multimodal import decode_media

        out = decode_media(media_df)
        assert out.schema.simpleString() == (
            "struct<media_id:string,kind:string,n_bytes:bigint,content_sha:string,"
            "width:int,height:int,n_frames:int,codec:string>"
        )
        rows = {r.media_id: r for r in out.collect()}
        assert rows["m1"].n_bytes == 2100
        assert rows["m1"].content_sha == hashlib.sha256(b"\x89PNG fake image bytes" * 100).hexdigest()
        assert 64 <= rows["m1"].width < 64 + 1024
        assert rows["m4"].n_bytes == 0  # null payload -> empty-bytes semantics
        # determinism: rerun gives identical rows
        again = {r.media_id: r for r in decode_media(media_df).collect()}
        assert rows == again

    def test_real_engine_raises_at_plan_time(self, media_df):
        from easyner_spark.operators.multimodal import decode_media

        with pytest.raises(NotImplementedError):
            decode_media(media_df, engine="real")

    def test_plan_is_narrow(self, spark, media_df):
        from easyner_spark.operators.multimodal import decode_media

        plan = decode_media(media_df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestFeatures:
    def test_feature_shape_and_range(self, spark, media_df):
        from easyner_spark.operators.multimodal import extract_features

        rows = {r.media_id: r.feature for r in extract_features(media_df, dim=16).collect()}
        assert set(rows) == {"m1", "m2", "m3", "m4"}
        for v in rows.values():
            assert len(v) == 16 and all(0.0 <= x <= 1.0 for x in v)
        assert rows["m1"] != rows["m2"]

    def test_features_feed_ann(self, spark, media_df):
        """The fake features plug straight into the similarity operator —
        the point of keeping the plumbing real."""
        from easyner_spark.operators.multimodal import extract_features
        from easyner_spark.operators.similarity import brute_force_topk

        emb = extract_features(media_df, dim=8).select(
            F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding")
        )
        out = brute_force_topk(emb, k=2, id_col="vec_id")
        assert out.groupBy("query_id").count().count() == 4


class TestFrameSample:
    def test_fanout_and_cap(self, spark, media_df):
        from easyner_spark.operators.multimodal import frame_sample

        out = frame_sample(media_df, every_n_bytes=1000, max_frames=5)
        counts = {r.media_id: r["count"] for r in out.groupBy("media_id").count().collect()}
        assert counts["m1"] == 3      # 2100 bytes / 1000 -> 3 slices
        assert counts["m3"] == 5      # capped at max_frames
        assert "m4" not in counts     # null payload -> no frames
        first = out.where("media_id='m1' AND frame_idx=0").collect()[0]
        assert bytes(first.frame_bytes) == (b"\x89PNG fake image bytes" * 100)[:1000]


class TestHeaderDecoder:
    """engine='headers': REAL container parsing, crafted byte fixtures."""

    def _decode(self, spark, blobs):
        from easyner_spark.operators.multimodal import decode_media

        df = spark.createDataFrame(blobs, "media_id string, kind string, content binary")
        return {r.media_id: r for r in decode_media(df, engine="headers").collect()}

    def test_png_bmp_gif(self, spark):
        import struct, zlib

        ihdr = struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00"
        png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
               + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
        bmp = (b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
               + struct.pack("<IiiHH", 40, 17, -9, 1, 24))  # top-down: height -9
        gif = b"GIF89a" + struct.pack("<HH", 12, 7) + b"\x00" * 4 + b"\x2c" + b"\x00" * 9
        got = self._decode(spark, [("p", "image", png), ("b", "image", bmp), ("g", "image", gif)])
        assert (got["p"].width, got["p"].height, got["p"].codec) == (640, 480, "image/png")
        assert (got["b"].width, got["b"].height, got["b"].codec) == (17, 9, "image/bmp")
        assert (got["g"].width, got["g"].height, got["g"].n_frames, got["g"].codec) == (12, 7, 1, "image/gif")

    def test_wav_sample_frames(self, spark):
        import struct

        fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
        data = b"\x00" * 800  # 200 sample frames at block_align 4
        wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16) + fmt
               + b"data" + struct.pack("<I", len(data)) + data)
        got = self._decode(spark, [("w", "audio", wav)])
        r = got["w"]
        # audio reuses the spatial slots: width=rate, height=channels
        assert (r.width, r.height, r.n_frames, r.codec) == (44100, 2, 200, "audio/wav")

    def test_ppm_with_comment_and_unknown(self, spark):
        ppm = b"P6\n# a comment\n320 200\n255\n" + b"\x00" * 10
        got = self._decode(spark, [("x", "image", ppm), ("u", "image", b"\x01\x02garbage")])
        assert (got["x"].width, got["x"].height, got["x"].codec) == (320, 200, "image/ppm")
        u = got["u"]
        assert u.codec == "unknown" and u.width == 0 and u.n_bytes == 9
        # size/sha still real for unknown payloads
        import hashlib

        assert u.content_sha == hashlib.sha256(b"\x01\x02garbage").hexdigest()
