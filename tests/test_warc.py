"""WARC source: record parse, gzip members, HTTP split, error isolation."""

import gzip

from mcpvectordb_spark.sources.warc import parse_warc_records, parse_warc_stage, read_warc


def _record(warc_type: str, uri: str, body: bytes, rec_id: str = "<urn:uuid:1>") -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {rec_id}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return hdr + body + b"\r\n\r\n"


def _http(body: bytes, status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n\r\n".encode() + body
    )


def test_parse_plain_and_http_split():
    blob = _record("warcinfo", "-", b"software: test") + _record(
        "response", "http://example.com/", _http(b"<html>hi</html>")
    )
    recs = list(parse_warc_records(blob))
    assert len(recs) == 2
    assert recs[0]["headers"]["warc-type"] == "warcinfo"
    assert recs[1]["status"] == 200 and recs[1]["payload"] == b"<html>hi</html>"


def test_parse_gzip_members_and_truncation():
    good = gzip.compress(_record("response", "http://a/", _http(b"A" * 10)))
    good2 = gzip.compress(_record("response", "http://b/", _http(b"B" * 20)))
    recs = list(parse_warc_records(good + good2))
    assert [r["payload"] for r in recs] == [b"A" * 10, b"B" * 20]

    bad = _record("response", "http://c/", _http(b"C" * 50))[:-60]  # cut mid-body
    errs = list(parse_warc_records(bad))
    assert errs and errs[-1].get("error")


def test_warc_stage_end_to_end(spark, tmp_path):
    arc = tmp_path / "crawl-00000.warc.gz"
    members = b"".join(
        gzip.compress(_record("response", f"http://site{i}.test/page", _http(f"<p>doc {i}</p>".encode())))
        for i in range(5)
    ) + gzip.compress(_record("request", "http://site0.test/page", b"GET / HTTP/1.1\r\n\r\n"))
    arc.write_bytes(members)

    out = read_warc(spark, str(tmp_path)).collect()
    responses = [r for r in out if r["warc_type"] == "response"]
    assert len(out) == 6 and len(responses) == 5
    assert {r["http_status"] for r in responses} == {200}
    assert sorted(r["target_uri"] for r in responses)[0] == "http://site0.test/page"
    assert all(r["error"] is None for r in out)
    assert responses[0]["payload"].startswith(b"<p>doc")


def test_warc_corrupt_archive_is_error_row_not_failure(spark):
    rows = [("bad.warc.gz", bytearray(b"\x1f\x8b" + b"\x00" * 40))]
    df = spark.createDataFrame(rows, "archive string, content binary")
    out = parse_warc_stage(df).collect()
    assert len(out) == 1 and "unreadable" in (out[0]["error"] or "") or out[0]["error"]
