"""WARC (Web ARChive, ISO 28500) record source — the wire format of
Common Crawl, the corpus the north-star schema models.

``parse_warc`` turns a DataFrame of raw WARC blobs (each holding one or
MANY concatenated records, as real ``.warc`` segment files do) into the
engine's page schema ``(url, warc_ts, html BINARY)``. The parser is the
real thing in miniature: it walks records by the ``Content-Length``
header — the only correct framing, since an HTML payload may itself
contain the ``\\r\\n\\r\\n`` separator that naive splitting would trip
over — keeps ``WARC-Type: response`` records, and strips the enclosed
HTTP response header block from the payload.

Runs as ``mapInPandas`` over binary cells (Arrow-batched; byte work in
Python per record is bounded by header size — payloads are sliced, not
scanned). At 100 TB this is the classic first map stage over
``binaryFile``-read segment objects: embarrassingly parallel, zero
shuffles, output columns feed ``extract_pages`` -> ``assign_dense_doc_ids``
directly.

``synth_warc_records`` builds byte-faithful records deterministically
from any (url, ts, html) rows — the test/oracle twin (same pattern as
the html synthesis in the extraction entry: construction is replayable
in SQL, so gates compare the Spark synth->parse ROUND TRIP against the
directly constructed values).
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["parse_warc", "synth_warc_records", "warc_record_bytes"]

_CRLF = b"\r\n"


def warc_record_bytes(url: str, ts: _dt.datetime, html: bytes) -> bytes:
    """One WARC/1.0 response record wrapping an HTTP 200 response."""
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + f"Content-Length: {len(html)}\r\n\r\n".encode()
        + html
    )
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode()
        + f"Content-Length: {len(http)}\r\n".encode()
        + b"\r\n"
    )
    return hdr + http + b"\r\n\r\n"


def _parse_blob(blob: bytes) -> Iterator[tuple[str, str, bytes]]:
    """Yield (url, date, html) per response record, framed by Content-Length."""
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record padding
        while blob.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        end_hdr = blob.find(b"\r\n\r\n", pos)
        if end_hdr < 0:
            break
        headers: dict[str, str] = {}
        first = None
        for line in blob[pos:end_hdr].split(_CRLF):
            if first is None:
                first = line
                continue
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("ascii", "replace")
            )
        if first is None or not first.startswith(b"WARC/"):
            break
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            # A malformed Content-Length must quarantine ONE record, not
            # poison the whole mapInPandas batch; with the length unknown
            # the rest of this blob can't be framed, so stop walking it.
            break
        if clen < 0:
            break
        body = blob[end_hdr + 4 : end_hdr + 4 + clen]
        pos = end_hdr + 4 + clen
        if headers.get("warc-type") != "response":
            continue
        http_end = body.find(b"\r\n\r\n")
        payload = body[http_end + 4 :] if http_end >= 0 else body
        yield (
            headers.get("warc-target-uri", ""),
            headers.get("warc-date", ""),
            payload,
        )


def parse_warc(blobs: DataFrame, col: str = "content") -> DataFrame:
    """(… ``col`` BINARY …) -> (url STRING, warc_ts TIMESTAMP, html BINARY).

    Each input cell may hold one record or a whole concatenated segment.
    Non-response records are dropped; a record's HTTP header block is
    stripped so ``html`` is the raw payload bytes.
    """
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
        ]
    )

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[col]:
                if blob is None:
                    continue
                for url, date, payload in _parse_blob(bytes(blob)):
                    try:
                        ts = _dt.datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ")
                    except ValueError:
                        ts = None
                    rows.append({"url": url, "warc_ts": ts, "html": payload})
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    return blobs.mapInPandas(_go, schema=schema)


def synth_warc_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """(…) -> (content BINARY): one record per row, byte-faithful.

    Runs through :func:`warc_record_bytes` in the same Arrow pass shape as
    the parser — the deterministic test twin for round-trip gates.
    """
    schema = T.StructType([T.StructField("content", T.BinaryType())])

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                warc_record_bytes(
                    u, t.to_pydatetime() if hasattr(t, "to_pydatetime") else t,
                    bytes(h),
                )
                for u, t, h in zip(pdf[url_col], pdf[ts_col], pdf[html_col])
            ]
            yield pd.DataFrame({"content": out})

    return pages.select(url_col, ts_col, html_col).mapInPandas(_go, schema=schema)
