"""WARC source/sink — the raw-crawl ingest boundary.

Common-Crawl-style pages (BASELINE.json input_hint / reference corpus,
``preprocess.py``'s web-text assumption) arrive as WARC 1.0 files:
concatenated *response* records, each record individually gzipped (the
Common Crawl member-per-record convention, so a reader can split a
file without decompressing the whole thing). This module turns that
format into the engine's pages shape ``(url, warc_ts, html)`` — the
table every pipeline stage starts from — without any external WARC
library (none in this environment; the format is a stable public
spec, ISO 28500).

Scale design: parallelism is PER FILE (``binaryFile`` source → one
task per WARC), which is exactly how Common Crawl ships — ~10⁵ files
of ~1 GB per snapshot, far above any cluster's core count, so
file-level parallelism saturates executors without record-level
splits. Parsing runs in ``mapInPandas`` (Arrow batches of file blobs,
gzip-member splitting + header parsing in one pass per file); the
output lands in the same columns the parquet/Iceberg pages table
uses, so ``with_extracted_text`` onward is format-agnostic.

The writer exists for fixtures and round-trip verification: a
driver-side byte builder (``warc_bytes``) plus a distributed sink
(``write_warc``: one WARC file per partition, emitted through the
same per-record-gzip convention the reader splits on).
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = "url string, warc_ts timestamp, html binary"

_CRLF = b"\r\n"


def _record_bytes(url: str, ts: datetime, html: bytes) -> bytes:
    """One WARC 1.0 response record (uncompressed): WARC headers +
    an HTTP/1.1 response block carrying the page bytes."""
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html; charset=utf-8" + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF
        + html
    )
    headers = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"WARC-Date: "
        + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return headers + http + _CRLF + _CRLF


def warc_bytes(rows, per_record_gzip: bool = True) -> bytes:
    """rows of (url, ts, html-bytes) → one WARC file's bytes.
    ``per_record_gzip``: each record is its own gzip member
    (Common Crawl convention); False writes a plain .warc.

    Codec contract: any url WITHOUT trailing ASCII space/tab
    round-trips byte-exactly through ``_parse_warc`` (readers OWS-trim
    header values per the WARC grammar, so trailing space/tab is
    unrepresentable unencoded — raw spaces are illegal in URIs per
    RFC 3986 anyway; Unicode whitespace such as NBSP survives)."""
    out = io.BytesIO()
    for url, ts, html in rows:
        rec = _record_bytes(url, ts, bytes(html))
        if per_record_gzip:
            # mtime=0 → deterministic bytes (fixtures are hashed)
            out.write(gzip.compress(rec, mtime=0))
        else:
            out.write(rec)
    return out.getvalue()


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Split concatenated gzip members (wbits=47 auto-detects the gzip
    wrapper; ``unused_data`` marks the member boundary). Plain
    (non-gzip) input is yielded whole — the reader accepts both."""
    if not data[:2] == b"\x1f\x8b":
        yield data
        return
    while data:
        d = zlib.decompressobj(wbits=47)
        try:
            member = d.decompress(data)
        except zlib.error:
            # damaged member: surrender the REST of this file (member
            # boundaries are unrecoverable past corruption) instead of
            # killing the whole ingest task
            return
        yield member
        nxt = d.unused_data
        if len(nxt) >= len(data):  # truncated tail cannot progress
            return
        data = nxt


def _parse_warc(data: bytes) -> Iterator[tuple[str, datetime, bytes]]:
    """File bytes → (url, ts, html) per *response* record. Records of
    other WARC types (warcinfo, request, metadata) are skipped, as are
    malformed trailers — crawl archives contain them and a 10⁵-file
    ingest must not die on one bad record."""
    for member in _gzip_members(data):
        pos = 0
        n = len(member)
        while pos < n:
            head_end = member.find(_CRLF + _CRLF, pos)
            if head_end < 0:
                break
            head = member[pos:head_end].decode("utf-8", errors="replace")
            lines = head.split("\r\n")
            if not lines[0].startswith("WARC/"):
                break
            h = {}
            for line in lines[1:]:
                k, _, v = line.partition(":")
                # ASCII space/tab only: bare str.strip() eats Unicode
                # whitespace (NBSP, ideographic space …) out of dirty
                # crawl URLs and breaks the byte-exact round-trip
                h[k.strip(" \t").lower()] = v.strip(" \t")
            try:
                clen = int(h.get("content-length", ""))
            except ValueError:
                break
            block = member[head_end + 4 : head_end + 4 + clen]
            # next record starts after the block + record trailer
            pos = head_end + 4 + clen
            while member[pos : pos + 2] == _CRLF:
                pos += 2
            if h.get("warc-type") != "response":
                continue
            url = h.get("warc-target-uri")
            date = h.get("warc-date")
            if not url or not date:
                continue
            try:
                ts = datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ")
            except ValueError:
                continue
            # the block is an HTTP response: body follows its headers
            body_at = block.find(_CRLF + _CRLF)
            html = block[body_at + 4 :] if body_at >= 0 else block
            yield url, ts, html


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under ``path`` (glob ok) → pages DataFrame
    (url, warc_ts, html) — the same shape the parquet/Iceberg pages
    table carries, so every downstream stage is source-agnostic.
    ``warc_ts`` is the record's WARC-Date (UTC wall time, emitted
    naive — matching the fixture pages table's NTZ convention)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list = []
            tss: list = []
            htmls: list = []
            for blob in pdf["content"]:
                for url, ts, html in _parse_warc(bytes(blob)):
                    urls.append(url)
                    tss.append(ts)
                    htmls.append(html)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": pd.Series(tss, dtype="datetime64[us]"),
                    "html": htmls,
                }
            )

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(run, WARC_SCHEMA)


def pages_from_warc(
    spark: SparkSession, path: str, default_lang: str | None = None
) -> DataFrame:
    """WARC files → the FULL pages-table shape (url, warc_ts, html,
    lang) the pipeline starts from. A raw crawl carries no lang
    column; ``default_lang`` stamps a constant when the slice's
    language is known out-of-band (Common Crawl publishes language
    partitions), otherwise the textstats marker heuristic runs over
    the extracted text — one extra extraction pass paid ONCE at
    ingest, when the crawl lands in the pages table, not per query."""
    from pyspark.sql import functions as F

    pages = read_warc(spark, path)
    if default_lang is not None:
        return pages.withColumn("lang", F.lit(default_lang))
    from ..operators.mentions import extract_text_udf
    from ..operators.textstats import lang_scores

    tmp = pages.withColumn("_text", extract_text_udf("html"))
    scores = lang_scores("_text")
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in sorted(scores, reverse=True):  # earliest wins last
        pred = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(pred)
    return tmp.select("url", "warc_ts", "html", pred.alias("lang"))


def write_warc(pages: DataFrame, out_dir: str) -> int:
    """Distributed WARC sink: one ``part-NNNNN.warc.gz`` per partition
    of ``pages`` (url, warc_ts, html), per-record-gzip members.
    Returns the number of records written. Local/NFS path in this
    sandbox; on a cluster the same pattern writes through the Hadoop
    FileSystem API (or stages to object storage) — the record encoding
    is the portable part."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = []
        for pdf in batches:
            for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                rows.append((url, ts.to_pydatetime(), bytes(html)))
        if rows:
            with open(
                os.path.join(out_dir, f"part-{pid:05d}.warc.gz"), "wb"
            ) as fh:
                fh.write(warc_bytes(rows))
        yield pd.DataFrame({"n": [len(rows)]})

    counts = pages.select("url", "warc_ts", "html").mapInPandas(
        part, "n long"
    )
    return sum(r.n for r in counts.collect())
