"""GERBIL NIF-over-HTTP exchange surface (reference gerbil.py:42-99):
HTTP round-trip with an injected linker, error handling, and the
Spark per-request micro-batch linker (D2KB + A2KB)."""

import http.client
import threading

from type_filtered_entity_linker_spark.sources.gerbil import (
    make_gerbil_server,
    spark_linker,
)
from type_filtered_entity_linker_spark.sources.nif import (
    generate_nif,
    read_nif,
)


def _post(port: int, body: bytes):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request(
        "POST", "/annotate", body=body,
        headers={"Content-Type": "application/x-turtle"},
    )
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, data


def test_gerbil_http_roundtrip_with_injected_linker():
    def fake(doc):
        out = dict(doc)
        out["mentions"] = [
            {
                "start": 0,
                "end": 5,
                "entity": {
                    "item_url": "http://www.wikidata.org/entity/Q1",
                    "score": 0.5,
                },
            }
        ]
        return out

    srv = make_gerbil_server(fake)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        body = generate_nif(
            {"uri": "http://d.test/1", "text": "Alpha beta gamma."}
        ).encode("utf-8")
        status, data = _post(port, body)
        assert status == 200
        doc = read_nif(data.decode("utf-8"))
        assert doc["text"] == "Alpha beta gamma."
        (m,) = doc["mentions"]
        assert (m["start"], m["end"]) == (0, 5)
        assert m["entity"]["item_url"].endswith("Q1")
        # malformed turtle → 400, server stays up for the next request
        status, _ = _post(port, b"this is not NIF")
        assert status == 400
        status, _ = _post(port, body)
        assert status == 200
    finally:
        srv.shutdown()


def test_gerbil_spark_linker_d2kb_links_premarked_span(spark):
    """A NIF request carrying a premarked span runs the D2KB path and
    returns the span annotated with the fixture's ground-truth
    entity."""
    from type_filtered_entity_linker_spark.fixtures import (
        fixtures_to_spark,
        make_fixtures,
    )

    fx = make_fixtures(seed=31, n_pages=30)
    inputs = fixtures_to_spark(spark, fx)
    gt = fx["gt_mentions"]
    row = gt[gt.lang == "en"].iloc[0]
    pages = fx["pages"]
    text = pages[pages.url == row.url].text.iloc[0]
    doc = {
        "uri": row.url,
        "text": text,
        "mentions": [{"start": int(row.start), "end": int(row.end)}],
    }
    link = spark_linker(spark, inputs)
    out = link(doc)
    (m,) = out["mentions"]
    assert (m["start"], m["end"]) == (row.start, row.end)
    assert m["entity"]["item_url"].endswith(str(row.item_id))
    assert m["entity"]["score"] >= 0.0


def test_gerbil_spark_linker_a2kb_detects_and_links(spark):
    """A NIF request WITHOUT spans runs A2KB detection; every link it
    returns must match the batch pipeline's links for that page."""
    from pyspark.sql import functions as F

    from type_filtered_entity_linker_spark.config import LinkerConfig
    from type_filtered_entity_linker_spark.fixtures import (
        fixtures_to_spark,
        make_fixtures,
    )
    from type_filtered_entity_linker_spark.plans.pipeline import (
        link_pages_batch,
    )

    fx = make_fixtures(seed=31, n_pages=30)
    inputs = fixtures_to_spark(spark, fx)
    cfg = LinkerConfig()
    pages_pdf = fx["pages"]
    url = pages_pdf[pages_pdf.lang == "en"].iloc[0].url
    text = pages_pdf[pages_pdf.url == url].text.iloc[0]

    out = spark_linker(spark, inputs, cfg)({"uri": url, "text": text})
    got = sorted(
        (m["start"], m["end"], m["entity"]["item_url"])
        for m in out["mentions"]
    )

    batch_links = link_pages_batch(
        inputs["pages"].where(F.col("url") == url), inputs, cfg
    )
    want_urls = sorted(r.item_url for r in batch_links.collect())
    assert got and sorted(u for _, _, u in got) == want_urls


def test_gerbil_concurrent_overlapping_requests(spark):
    """Verdict r03 item 7: two NIF POSTs genuinely IN FLIGHT at the
    same time against the real Spark-backed linker (the reference
    needed per-thread TF-session rebinding; one shared SparkSession
    serves concurrent jobs natively). A barrier at linker entry forces
    both handler threads inside link() simultaneously; each response
    must carry its own document's text and its own page's annotations
    — no cross-request bleed."""
    import threading as th

    from type_filtered_entity_linker_spark.config import LinkerConfig
    from type_filtered_entity_linker_spark.fixtures import (
        fixtures_to_spark,
        make_fixtures,
    )

    fx = make_fixtures(seed=31, n_pages=30)
    inputs = fixtures_to_spark(spark, fx)
    base = spark_linker(spark, inputs, LinkerConfig())
    # warm the UDF/Arrow stages once so the overlapped phase measures
    # concurrency, not cold-start (and the sequential-parity replays
    # below reuse the warm path)
    base({"uri": "warm://0", "text": "warm up text"})
    barrier = th.Barrier(2, timeout=240)

    def overlapped(doc):
        barrier.wait()  # both requests provably concurrent
        return base(doc)

    srv = make_gerbil_server(overlapped)
    port = srv.server_address[1]
    th.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        en = fx["pages"][fx["pages"].lang == "en"]
        docs = [
            {"uri": en.iloc[i].url, "text": en.iloc[i].text}
            for i in range(2)
        ]
        results: dict[int, tuple[int, bytes]] = {}

        def post(i):
            # module _post times out at 30s — two concurrent COLD
            # linkage chains on local[4] can take longer; this test is
            # about correctness under overlap, not latency
            body = generate_nif(docs[i]).encode("utf-8")
            conn = http.client.HTTPConnection(
                "127.0.0.1", port, timeout=300
            )
            conn.request(
                "POST", "/annotate", body=body,
                headers={"Content-Type": "application/x-turtle"},
            )
            r = conn.getresponse()
            results[i] = (r.status, r.read())
            conn.close()

        ts = [th.Thread(target=post, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        assert set(results) == {0, 1}
        singles = {}
        for i in (0, 1):
            status, data = results[i]
            assert status == 200, data[:200]
            out = read_nif(data.decode("utf-8"))
            assert out["text"] == docs[i]["text"]  # no bleed
            singles[i] = sorted(
                (m["start"], m["end"], m["entity"]["item_url"])
                for m in out["mentions"]
            )
        # and each concurrent answer equals the sequential answer
        for i in (0, 1):
            seq = base(docs[i])
            want = sorted(
                (m["start"], m["end"], m["entity"]["item_url"])
                for m in seq["mentions"]
            )
            assert singles[i] == want
    finally:
        srv.shutdown()
