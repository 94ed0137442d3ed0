"""GERBIL-style NIF-over-HTTP exchange surface (reference
``gerbil.py:42-99``: a web service receiving NIF Turtle documents,
running the linker, answering NIF with the found entities).

SURVEY.md §3.2 maps each request to ONE micro-batch appended to the
pages table, and that is exactly what the handler does: NIF body →
one-row pages DataFrame (the document text wrapped through
``textlib.make_html`` so the extraction invariant holds end-to-end) →
the same ``link_mentions_batch`` chain every other path uses → NIF
response. A request carrying premarked spans runs the D2KB path
(reference ``el/entity_linker.py:49-64``); one without runs A2KB
detection — the reference's experiment-type switch expressed by the
request's own content.

Dependency-free (``http.server`` stdlib, threading server): the
reference wraps Flask, which is absent here and adds nothing to the
exchange semantics. Scale note: this surface is a DEMO/evaluation
boundary (GERBIL drives it document-by-document); bulk traffic belongs
on the streaming micro-batch path (``incremental_link_pages``), which
amortizes Spark job overhead across whole file batches.
"""

from __future__ import annotations

import datetime as dt
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from ..config import LinkerConfig
from .nif import generate_nif, read_nif


def spark_linker(
    spark: SparkSession, inputs: dict, cfg: LinkerConfig = LinkerConfig()
):
    """→ ``link(doc dict) -> doc dict`` running one request as one
    micro-batch. ``doc['mentions']`` present → D2KB over those spans;
    absent/empty → A2KB detection. The returned doc carries each
    linked span with its entity URL and score, ready for
    ``generate_nif``."""
    from ..operators.mentions import (
        detect_mentions_df,
        ner_spans_df,
        prepare_premarked_mentions,
        with_extracted_text,
    )
    from ..plans.pipeline import link_mentions_batch
    from ..textlib import make_html

    def link(doc: dict) -> dict:
        uri, text = doc["uri"], doc["text"]
        pages = spark.createDataFrame(
            [(uri, dt.datetime(2024, 1, 1), make_html(text), cfg.lang)],
            "url string, warc_ts timestamp, html binary, lang string",
        )
        pages_text = with_extracted_text(pages, cfg)
        pre = [
            (uri, int(m["start"]), int(m["end"]))
            for m in doc.get("mentions", [])
        ]
        mentions = (
            prepare_premarked_mentions(
                pages_text,
                spark.createDataFrame(
                    pre, "url string, start int, end int"
                ),
                cfg,
            )
            if pre
            else detect_mentions_df(pages_text, inputs["gazetteer"], cfg)
        )
        spans = ner_spans_df(pages_text) if cfg.filter_mode == "span" else None
        links = link_mentions_batch(mentions, inputs, cfg, spans=spans)
        rows = (
            links.join(
                mentions.select("url", "mention_id", "start", "end"),
                ["url", "mention_id"],
            )
            .select("start", "end", "item_url", "score")
            .collect()
        )
        out = dict(doc)
        out["mentions"] = [
            {
                "start": int(r.start),
                "end": int(r.end),
                "entity": {
                    "item_url": r.item_url,
                    "score": float(r.score),
                },
            }
            for r in sorted(rows, key=lambda r: (r.start, r.end))
        ]
        return out

    return link


def make_gerbil_server(
    linker, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """HTTP server: POST a NIF Turtle document, receive the annotated
    NIF Turtle back. ``linker`` is any ``doc dict -> doc dict``
    (``spark_linker`` in production; tests may inject a fake to
    exercise the exchange without a session). ``port=0`` binds an
    ephemeral port (``server.server_address[1]``); run with
    ``serve_forever()`` on a thread and ``shutdown()`` to stop."""

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (stdlib casing)
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode("utf-8")
            try:
                doc = read_nif(body)
                data = generate_nif(linker(doc)).encode("utf-8")
            except Exception as e:  # malformed NIF / linker failure
                msg = str(e).encode("utf-8")
                self.send_response(400)
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/x-turtle")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *args):  # keep test output clean
            pass

    return ThreadingHTTPServer((host, port), Handler)
