"""WARC (Web ARChive, ISO 28500) source — Common-Crawl-style ingestion.

The reference ingests individual files and URLs (ingestor.py:90-101,
417-442); a large-scale training-data pipeline ingests crawl archives:
thousands of multi-GB ``.warc.gz`` files, each a concatenation of
independently-gzipped records.  This source reads them Spark-natively:

- listing + byte transport via the built-in ``binaryFile`` reader (same
  as sources/files.py — distributed listing is the scheduler's job);
- record parsing inside an Arrow-batched ``mapInPandas`` flatMap (one
  archive row → many record rows), pure stdlib (zlib multi-member
  decompression + header parse), no external WARC library;
- malformed records become error rows, never task failures — one corrupt
  record in a 100 TB crawl must not kill the job.

Scale notes: WARC archives are not splittable mid-file (per-record gzip
members), so the parallelism unit is the archive — the standard layout
(Common Crawl ships ~1 GiB archives × 80k files/crawl) gives plenty of
partitions.  ``spark.sql.files.maxPartitionBytes`` cannot split these;
one task per archive is the correct granularity.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    import pandas as pd
    from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "archive string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, payload binary, "
    "n_bytes long, error string"
)


def _split_gzip_members(blob: bytes):
    """Decompress a possibly multi-member gzip stream, yielding one bytes
    object per member (each WARC record is its own member).  Plain
    (uncompressed) input is yielded whole."""
    import zlib

    if blob[:2] != b"\x1f\x8b":
        yield blob
        return
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(blob[pos:])
        if d.eof:
            consumed = len(blob) - pos - len(d.unused_data)
        else:  # truncated trailing member
            consumed = len(blob) - pos
        if out:
            yield out
        if consumed <= 0:
            break
        pos += consumed


def parse_warc_records(blob: bytes):
    """Parse WARC records out of (decompressed) archive bytes.

    Yields dicts with the WARC headers we surface plus the payload.  For
    ``response`` records the embedded HTTP response is split: status code
    is extracted and the payload is the HTTP body only.
    """
    for member in _split_gzip_members(blob):
        pos = 0
        while True:
            start = member.find(b"WARC/", pos)
            if start < 0:
                break
            hdr_end = member.find(b"\r\n\r\n", start)
            if hdr_end < 0:
                yield {"error": "truncated record header"}
                break
            headers: dict[str, str] = {}
            lines = member[start:hdr_end].decode("utf-8", "replace").split("\r\n")
            for line in lines[1:]:
                k, sep, v = line.partition(":")
                if sep:
                    headers[k.strip().lower()] = v.strip()
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                yield {"error": "missing/invalid Content-Length", "headers": headers}
                break
            body = member[hdr_end + 4 : hdr_end + 4 + length]
            if len(body) < length:
                yield {"error": "truncated record body", "headers": headers}
                break
            status = None
            if headers.get("warc-type") == "response" and body[:5] == b"HTTP/":
                http_end = body.find(b"\r\n\r\n")
                if http_end >= 0:
                    status_line = body[: body.find(b"\r\n")].decode("ascii", "replace")
                    parts = status_line.split()
                    if len(parts) >= 2 and parts[1].isdigit():
                        status = int(parts[1])
                    body = body[http_end + 4 :]
            yield {"headers": headers, "status": status, "payload": body}
            pos = hdr_end + 4 + length


def read_warc(spark: "SparkSession", path: str, recursive: bool = True) -> "DataFrame":
    """Archive folder/file → one row per WARC record (WARC_SCHEMA)."""
    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if recursive else "false")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select(
            spark_regexp_strip_scheme(), "content"
        )
    )
    return parse_warc_stage(raw)


def spark_regexp_strip_scheme():
    from pyspark.sql import functions as F

    return F.regexp_replace(F.col("path"), "^file:", "").alias("archive")


def parse_warc_stage(df: "DataFrame", archive_col: str = "archive", bytes_col: str = "content") -> "DataFrame":
    """The parsing flatMap, reusable over any (archive, bytes) frame."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cols = [
            "archive", "record_id", "warc_type", "target_uri", "warc_date",
            "content_type", "http_status", "payload", "n_bytes", "error",
        ]
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                blob = bytes(rec[bytes_col] or b"")
                try:
                    parsed = list(parse_warc_records(blob))
                except Exception as exc:  # defensive: corrupt gzip etc.
                    parsed = [{"error": f"unreadable archive: {exc}"}]
                for p in parsed:
                    h = p.get("headers", {})
                    rows.append(
                        (
                            rec[archive_col],
                            h.get("warc-record-id"),
                            h.get("warc-type"),
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            h.get("content-type"),
                            p.get("status"),
                            p.get("payload"),
                            len(p.get("payload") or b""),
                            p.get("error"),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=WARC_SCHEMA)
