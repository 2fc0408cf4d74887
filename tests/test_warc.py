"""WARC segment loader (sources/warc.py): record-boundary math,
type gating, gzip member handling, and the pages projection. Value
parity of the full parse is pinned by the warc_extract adversarial
oracle query."""

import gzip

import pytest

from easyner_spark.sources.warc import (
    build_warc_gz,
    build_warc_record,
    iter_warc_records,
    parse_http_response,
    parse_warc_bytes,
)

DECOY = b"<html>\r\n\r\nWARC/1.0 fake\r\nContent-Length: 9999\r\n\r\n</html>"


def _segment(member_per_record=True) -> bytes:
    recs = [
        build_warc_record("urn:i", "2024-01-01T00:00:00Z", b"software: t\r\n",
                          warc_type="warcinfo"),
        build_warc_record("http://a/1", "2024-01-01T00:00:01Z", b"",
                          warc_type="request"),
        build_warc_record("http://a/1", "2024-01-01T00:00:01Z", DECOY),
        build_warc_record("http://b/2", "2024-02-03T04:05:06Z", "é-bodé".encode(),
                          status=404, mime="text/plain"),
    ]
    return build_warc_gz(recs, member_per_record=member_per_record)


class TestWarcParse:
    def test_decoy_and_multibyte_boundaries(self):
        rows = parse_warc_bytes(_segment())
        assert [(r[0], r[2], r[3]) for r in rows] == [
            ("http://a/1", 200, "text/html"),
            ("http://b/2", 404, "text/plain"),
        ]
        assert rows[0][4] == DECOY
        assert rows[1][4] == "é-bodé".encode()

    def test_single_member_gzip_and_plain(self):
        rows_multi = parse_warc_bytes(_segment(member_per_record=True))
        rows_single = parse_warc_bytes(_segment(member_per_record=False))
        plain = gzip.decompress(_segment(member_per_record=False))
        assert rows_multi == rows_single == parse_warc_bytes(plain)

    def test_non_response_records_skipped(self):
        blob = build_warc_record("urn:i", "2024-01-01T00:00:00Z", b"x",
                                 warc_type="metadata")
        assert parse_warc_bytes(blob) == []

    def test_malformed_length_stops_cleanly(self):
        good = build_warc_record("http://a/1", "2024-01-01T00:00:00Z", b"ok")
        bad = good.replace(b"Content-Length:", b"Content-Length: zz\r\nX:")
        assert parse_warc_bytes(bad) == []
        # a good record BEFORE the bad one still parses
        assert len(parse_warc_bytes(good + bad)) == 1

    def test_raw_resource_payload(self):
        status, mime, body = parse_http_response(b"no http envelope here")
        assert (status, mime, body) == (0, "", b"no http envelope here")


class TestWarcSpark:
    def test_load_and_pages_projection(self, spark, tmp_path):
        import pandas as pd

        from easyner_spark.sources.warc import warc_load, warc_pages

        p = tmp_path / "seg-00000.warc.gz"
        p.write_bytes(_segment())
        recs = warc_load(spark, str(p))
        got = recs.orderBy("url").collect()
        assert [r["url"] for r in got] == ["http://a/1", "http://b/2"]
        assert bytes(got[0]["html"]) == DECOY

        pages = warc_pages(recs).collect()
        # 404/text-plain page gated out; timestamp parsed
        assert len(pages) == 1
        assert pages[0]["url"] == "http://a/1"
        assert pd.Timestamp(pages[0]["warc_ts"]).second == 1

    def test_pages_keep_all(self, spark, tmp_path):
        from easyner_spark.sources.warc import warc_load, warc_pages

        p = tmp_path / "seg.warc"
        p.write_bytes(gzip.decompress(_segment(member_per_record=False)))
        assert warc_pages(warc_load(spark, str(p)), ok_only=False).count() == 2
