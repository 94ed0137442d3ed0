"""WARC source/sink: byte round-trip, Common-Crawl-style per-record
gzip splitting, tolerance of non-response records, and pipeline
compatibility (WARC-read pages extract byte-identical text)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.fixtures import make_fixtures
from type_filtered_entity_linker_spark.sources.warc import (
    read_warc,
    warc_bytes,
    write_warc,
)


def _fixture_pages(spark, n_pages=30):
    fx = make_fixtures(seed=77, n_pages=n_pages)
    return spark.createDataFrame(
        fx["pages"][["url", "warc_ts", "html", "text"]]
    )


def test_warc_roundtrip_distributed(spark, tmp_path):
    """write_warc (one file per partition, per-record gzip) →
    read_warc reproduces (url, warc_ts, html) byte-exactly."""
    pages = _fixture_pages(spark).repartition(4)
    out = str(tmp_path / "crawl")
    n = write_warc(pages, out)
    assert n == pages.count()
    back = read_warc(spark, out)
    want = {
        (r.url, r.warc_ts, bytes(r.html))
        for r in pages.select("url", "warc_ts", "html").collect()
    }
    got = {(r.url, r.warc_ts, bytes(r.html)) for r in back.collect()}
    assert got == want


def test_warc_read_feeds_pipeline_extraction(spark, tmp_path):
    """Pages ingested from WARC are downstream-identical to the
    parquet pages table: extract_text over the WARC read equals the
    fixture's original text per url (the north-rule byte invariant,
    now holding across the raw-crawl ingest boundary)."""
    from pyspark.sql import functions as F

    from type_filtered_entity_linker_spark.operators.mentions import (
        extract_text_udf,
    )

    pages = _fixture_pages(spark)
    out = str(tmp_path / "crawl")
    write_warc(pages.repartition(3), out)
    got = {
        r.url: r.t
        for r in read_warc(spark, out)
        .select("url", extract_text_udf("html").alias("t"))
        .collect()
    }
    want = {r.url: r.text for r in pages.select("url", "text").collect()}
    assert got == want


def test_warc_parser_skips_non_response_records(tmp_path):
    """A crawl file starts with a warcinfo record and may hold request
    records — the reader must return only the responses, and a
    trailing malformed record must not kill the file's parse."""
    from type_filtered_entity_linker_spark.sources.warc import _parse_warc

    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
        b"robo\r\n\r\n"
    )
    ts = dt.datetime(2024, 3, 1, 12, 0, 0)
    resp = warc_bytes(
        [("http://x.test/a", ts, b"<html>A</html>")], per_record_gzip=False
    )
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: http://x.test/a\r\n"
        b"WARC-Date: 2024-03-01T12:00:00Z\r\nContent-Length: 2\r\n\r\n"
        b"GE\r\n\r\n"
    )
    junk = b"NOT-A-WARC-HEADER without terminator"
    records = list(_parse_warc(info + resp + req + junk))
    assert records == [("http://x.test/a", ts, b"<html>A</html>")]


def test_warc_corrupt_gzip_member_does_not_kill_file(tmp_path):
    """A damaged gzip member mid-file yields the records before it and
    skips the unrecoverable rest — one bad byte range must not fail
    the whole ingest task."""
    from type_filtered_entity_linker_spark.sources.warc import _parse_warc

    ts = dt.datetime(2024, 3, 1, 12, 0, 0)
    good = warc_bytes([("http://x.test/ok", ts, b"<p>ok</p>")])
    bad = b"\x1f\x8b\x08\x00GARBAGE-NOT-DEFLATE"
    tail = warc_bytes([("http://x.test/lost", ts, b"<p>lost</p>")])
    records = list(_parse_warc(good + bad + tail))
    assert [r[0] for r in records] == ["http://x.test/ok"]


def test_warc_plain_uncompressed_also_readable(spark, tmp_path):
    """Plain .warc (no gzip) parses through the same reader — the
    member splitter passes non-gzip bytes straight through."""
    ts = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (f"http://x.test/{i}", ts + dt.timedelta(seconds=i), f"<p>{i}</p>".encode())
        for i in range(5)
    ]
    p = tmp_path / "f.warc"
    p.write_bytes(warc_bytes(rows, per_record_gzip=False))
    got = sorted(
        (r.url, r.warc_ts, bytes(r.html))
        for r in read_warc(spark, str(p)).collect()
    )
    assert got == sorted(rows)


def test_warc_ingest_end_to_end_links_match_parquet_path(spark, tmp_path):
    """Full ingest boundary: linking pages ingested from WARC
    (pages_from_warc with a stamped slice language) produces the SAME
    links as the parquet pages table — the raw-crawl path is a drop-in
    pages source for the whole pipeline."""
    from type_filtered_entity_linker_spark.config import LinkerConfig
    from type_filtered_entity_linker_spark.fixtures import (
        fixtures_to_spark,
        make_fixtures,
    )
    from type_filtered_entity_linker_spark.plans.pipeline import (
        link_pages_batch,
    )
    from type_filtered_entity_linker_spark.sources.warc import (
        pages_from_warc,
    )

    fx = make_fixtures(seed=99, n_pages=60)
    inputs = fixtures_to_spark(spark, fx)
    cfg = LinkerConfig()
    en_pages = inputs["pages"].where(F.col("lang") == cfg.lang)

    out = str(tmp_path / "crawl")
    write_warc(
        en_pages.select("url", "warc_ts", "html").repartition(3), out
    )
    warc_pages = pages_from_warc(spark, out, default_lang=cfg.lang)

    def links_of(pages):
        return sorted(
            (r.url, r.mention_id, r.item_id)
            for r in link_pages_batch(pages, inputs, cfg)
            .select("url", "mention_id", "item_id")
            .collect()
        )

    got = links_of(warc_pages)
    want = links_of(en_pages)
    assert got and got == want


def test_pages_from_warc_detects_language(spark, tmp_path):
    """Without a stamped slice language the marker heuristic assigns
    lang per page from the extracted text."""
    from type_filtered_entity_linker_spark.sources.warc import (
        pages_from_warc,
    )
    from type_filtered_entity_linker_spark.textlib import make_html

    ts = dt.datetime(2024, 3, 1)
    rows = [
        ("http://x.test/en", ts, make_html("the cat and the dog of note")),
        ("http://x.test/de", ts, make_html("der hund ist nicht die katze")),
        ("http://x.test/und", ts, make_html("zzz qqq barewords")),
    ]
    p = tmp_path / "f.warc.gz"
    p.write_bytes(warc_bytes(rows))
    got = {
        r.url: r.lang
        for r in pages_from_warc(spark, str(p)).collect()
    }
    assert got == {
        "http://x.test/en": "en",
        "http://x.test/de": "de",
        "http://x.test/und": "und",
    }


def test_warc_record_codec_property():
    """Property: any (url, ts, html-bytes) rows round-trip through
    warc_bytes → _parse_warc exactly, gzipped or plain — including
    html bodies containing CRLF pairs, WARC-header-like lines and
    gzip magic bytes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from type_filtered_entity_linker_spark.sources.warc import _parse_warc

    # trailing ASCII space/tab is OUT of the codec contract: header
    # values are OWS-trimmed per the WARC grammar, so such URLs are
    # unrepresentable unencoded (and raw spaces are illegal in URIs
    # per RFC 3986 anyway). Unicode whitespace like NBSP must survive
    # — that regression is pinned separately.
    urls = (
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs", "Cc"),
                blacklist_characters="\r\n>",
            ),
            min_size=1,
            max_size=50,
        )
        .map(lambda s: "http://t/" + s)
        .filter(lambda u: not u.endswith((" ", "\t")))
    )
    tss = st.datetimes(
        min_value=dt.datetime(1990, 1, 1), max_value=dt.datetime(2100, 1, 1)
    ).map(lambda d: d.replace(microsecond=0))
    htmls = st.one_of(
        st.binary(max_size=200),
        st.sampled_from(
            [
                b"a\r\n\r\nb",
                b"WARC/1.0\r\nWARC-Type: response\r\n\r\n",
                b"\x1f\x8b\x08\x00fake",
                b"",
            ]
        ),
    )
    rows = st.lists(st.tuples(urls, tss, htmls), max_size=8)

    @settings(max_examples=60, deadline=None)
    @given(rows=rows, gz=st.booleans())
    def check(rows, gz):
        data = warc_bytes(rows, per_record_gzip=gz)
        assert list(_parse_warc(data)) == rows

    check()


def test_warc_unicode_whitespace_url_survives():
    """Regression (hypothesis find): a URL ending in U+00A0 must
    round-trip byte-exactly — header-value trimming is ASCII
    space/tab only, never Unicode str.strip()."""
    from type_filtered_entity_linker_spark.sources.warc import _parse_warc

    rows = [("http://t/\xa0", dt.datetime(2000, 1, 1), b"x")]
    assert list(_parse_warc(warc_bytes(rows, per_record_gzip=False))) == rows
    assert list(_parse_warc(warc_bytes(rows, per_record_gzip=True))) == rows
