"""WARC source: Common-Crawl-style archives → the input_hint pages table.

The input corpus the north_rule describes ("Iceberg table of
Common-Crawl-style web pages") is distributed, in the wild, as WARC files
(ISO 28500): concatenated records of the form

    WARC/1.0\r\n
    <warc headers>\r\n
    \r\n
    <block: http response headers \r\n\r\n payload>
    \r\n\r\n

Common Crawl ships ~1 GB ``.warc.gz`` segments where every record is its
own gzip member — concatenated-member streams that ``zlib`` inflates in one
pass, so the standard Spark ingestion shape is ONE FILE PER TASK: Spark's
``binaryFile`` source lists the segment files, and an Arrow-batched
``mapInPandas`` parses each file's records executor-side. No record ever
crosses a partition boundary (the classic "WARC files don't split" rule),
parallelism = number of segment files — exactly how a 100 TB crawl dump is
laid out (tens of thousands of segments).

From-scratch parser (no warcio in this sandbox, and none needed): WARC and
HTTP framing are byte-exact header blocks split on CRLFCRLF with
``Content-Length``-framed blocks. Only ``WARC-Type: response`` records
become pages rows; the html payload is the HTTP body (headers stripped),
``url`` = WARC-Target-URI, ``warc_ts`` = WARC-Date. ``text``/``lang`` are
left NULL — they are downstream extraction products, not archive contents.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_CRLF2 = b"\r\n\r\n"


def _inflate_members(data: bytes) -> bytes:
    """Inflate a (possibly multi-member) gzip stream; passthrough if plain."""
    if len(data) < 2 or data[:2] != b"\x1f\x8b":
        return data
    out = []
    while data:
        if data[:2] != b"\x1f\x8b":  # plain bytes appended after members
            out.append(data)
            break
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    """Header block → {lower(name): value}; tolerant of bare LF and folds."""
    headers: dict[str, str] = {}
    last = None
    for raw in block.split(b"\n"):
        line = raw.rstrip(b"\r")
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:  # obs-fold
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        if b":" not in line:
            continue
        k, v = line.split(b":", 1)
        last = k.strip().decode("latin-1").lower()
        headers[last] = v.strip().decode("latin-1")
    return headers


def parse_warc_records(data: bytes):
    """Yield (headers: dict, block: bytes) per WARC record.

    Content-Length framing per ISO 28500 §4; a record missing or lying
    about Content-Length ends the well-formed prefix (corrupt-tolerant:
    everything parsed so far is kept, the tail is skipped — the PERMISSIVE
    posture the extract-summary source uses too)."""
    data = _inflate_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] in (b"\r\n", b"\n"):
            pos += 2 if data[pos : pos + 2] == b"\r\n" else 1
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            return  # tail garbage — stop at the well-formed prefix
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            return
        headers = _parse_headers(data[pos : hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        block_start = hdr_end + len(_CRLF2)
        block_end = block_start + length
        if block_end > n:
            return
        yield headers, data[block_start:block_end]
        pos = block_end


def _http_body(block: bytes) -> bytes:
    """HTTP response block → payload (headers stripped; tolerate bare body)."""
    if block[:5] in (b"HTTP/",):
        sep = block.find(_CRLF2)
        if sep >= 0:
            return block[sep + len(_CRLF2):]
    return block


def _http_redirect(block: bytes) -> str | None:
    """3xx response block → Location header value, else None."""
    if block[:5] != b"HTTP/":
        return None
    sep = block.find(_CRLF2)
    head = block[: sep if sep >= 0 else len(block)]
    status_line = head.split(b"\n", 1)[0]
    parts = status_line.split()
    if len(parts) < 2 or not parts[1].isdigit() or parts[1][:1] != b"3":
        return None
    return _parse_headers(head).get("location") or None


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) → input_hint pages DataFrame (url, warc_ts, html, text,
    lang). ``path`` accepts globs (``segments/*.warc.gz``). One task per
    file — the Common-Crawl segment layout IS the parallelism unit."""
    import pandas as pd
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "redirect_to": []}
            for content in pdf["content"]:
                for headers, block in parse_warc_records(bytes(content)):
                    if headers.get("warc-type") != "response":
                        continue
                    url = headers.get("warc-target-uri")
                    if not url:
                        continue
                    rows["url"].append(url)
                    rows["warc_ts"].append(headers.get("warc-date"))
                    rows["html"].append(_http_body(block))
                    # 3xx Location → the engine's redirect_to column, so a
                    # WARC corpus drives CrawlConfig.follow_redirects natively
                    rows["redirect_to"].append(_http_redirect(block))
            yield pd.DataFrame(rows)

    raw = files.mapInPandas(
        parse, "url string, warc_ts string, html binary, redirect_to string"
    )
    return raw.select(
        "url",
        F.to_timestamp(F.col("warc_ts")).alias("warc_ts"),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        "redirect_to",
    )


def build_warc_bytes(records: list[tuple[str, str, bytes]], gzip_members: bool = False) -> bytes:
    """Synthesize a WARC stream for tests/benchmarks: (url, iso_date, html)
    → response records (with HTTP framing), optionally one gzip member per
    record (the Common Crawl layout)."""
    import gzip as _gzip

    out = []
    for rec in records:
        url, date, html = rec[0], rec[1], rec[2]
        location = rec[3] if len(rec) > 3 else None
        if location:
            http = (
                b"HTTP/1.1 301 Moved Permanently\r\n"
                + f"Location: {location}\r\n".encode()
                + f"Content-Length: {len(html)}\r\n\r\n".encode()
                + html
            )
        else:
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Length: {len(html)}\r\n\r\n".encode()
                + html
            )
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {date}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n"
            + http
            + b"\r\n\r\n"
        )
        out.append(_gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)


def write_warc(pages: DataFrame, out_dir: str, gzip_members: bool = True) -> DataFrame:
    """pages table → WARC segment files, one per partition (the inverse of
    ``read_warc``): each executor partition writes ``seg-<part>-<uuid>.warc.gz``
    with one gzip member per record, Common-Crawl style. Returns a DataFrame
    (path, n_records) of the written segments — an action the caller fires.

    Scale shape: writing happens entirely executor-side (no driver collect);
    segment count = partition count, so ``pages.repartition(n)`` before the
    call sizes the segments. Pages with NULL html are skipped (nothing to
    archive). ``warc_ts`` is emitted as ISO-8601 Z; absent → epoch."""
    import os
    import uuid

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    cols = [c for c in ("url", "warc_ts", "html", "redirect_to") if c in pages.columns]

    def write_part(batches):
        recs = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if row.html is None:
                    continue
                ts = getattr(row, "warc_ts", None)
                iso = (
                    ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                    if ts is not None and not pd.isna(ts)
                    else "1970-01-01T00:00:00Z"
                )
                loc = getattr(row, "redirect_to", None)
                recs.append((row.url, iso, bytes(row.html), loc or None))
        if not recs:
            yield pd.DataFrame({"path": [], "n_records": []})
            return
        path = os.path.join(out_dir, f"seg-{uuid.uuid4().hex}.warc" + (".gz" if gzip_members else ""))
        with open(path, "wb") as fh:
            fh.write(build_warc_bytes(recs, gzip_members=gzip_members))
        yield pd.DataFrame({"path": [path], "n_records": [len(recs)]})

    return pages.select(*cols).mapInPandas(write_part, "path string, n_records long")
