"""Wave 28 (round 5): CDC chunking, Flesch readability, CUSUM drift."""

from pyspark.sql import functions as F


def test_cdc_chunks_reassemble_and_local_edit_stability(spark):
    from type_filtered_entity_linker_spark.operators.dedup import cdc_chunks

    base = " ".join(f"tok{i % 13}w{i % 7}" for i in range(120))
    edited = "INSERTED " + base  # one token prepended
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    ch = cdc_chunks(docs, k=3, divisor=4).collect()

    # chunks reassemble to the original token stream, in order
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in ((1, base), (2, edited)):
        rows = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        n_tokens = len(text.split(" "))
        assert sum(r.chunk_tokens for r in rows) == n_tokens
        assert rows[0].chunk_start == 0
        for a, b in zip(rows, rows[1:]):
            assert b.chunk_start == a.chunk_start + a.chunk_tokens

    # content-defined boundaries: the single prepended token must NOT
    # invalidate the whole chunking — the two docs share most chunk
    # hashes (fixed-size chunking would share none)
    h1 = {r.chunk_hash for r in by_doc[1]}
    h2 = {r.chunk_hash for r in by_doc[2]}
    assert len(h1) > 3  # the doc actually chunked
    shared = len(h1 & h2)
    assert shared >= len(h1) - 2, (shared, len(h1))


def test_cdc_chunks_matches_python_reference(spark):
    """Exact parity with a transparent sequential reference."""
    import hashlib

    from type_filtered_entity_linker_spark.operators.dedup import cdc_chunks

    text = "a quick brown fox jumps over the lazy dog again and again"
    k, d = 2, 3

    def md5_60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    toks = text.split(" ")
    bounds = [
        t
        for t in range(len(toks))
        if t >= k and md5_60(" ".join(toks[t - k : t])) % d == 0
    ]
    expect = []
    starts = [0] + bounds
    ends = bounds + [len(toks)]
    for cid, (s, e) in enumerate(zip(starts, ends)):
        expect.append((s, e - s, md5_60(" ".join(toks[s:e]))))

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(
        (r.chunk_start, r.chunk_tokens, r.chunk_hash)
        for r in cdc_chunks(docs, k=k, divisor=d, hash_fn="md5_60").collect()
    )
    assert got == sorted(expect)


def test_readability_hand_computed(spark):
    from type_filtered_entity_linker_spark.operators.textstats import (
        readability,
    )

    docs = spark.createDataFrame(
        [
            # 4 words, 2 sentences, syllables: the=1, cat=1, sat=1,
            # down=1 -> flesch = 206.835 - 1.015*2 - 84.6*1 = 120.205
            (1, "The cat. Sat down."),
            # no words at all -> NULL flesch, sentence floor 1
            (2, "... !!!"),
            # unterminated single sentence: banana=3 syllables
            (3, "banana"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in readability(docs).collect()}
    r1 = rows[1]
    assert (r1.n_sentences, r1.n_words, r1.n_syllables) == (2, 4, 4)
    assert abs(r1.flesch - 120.205) < 1e-9
    assert rows[2].n_words == 0 and rows[2].flesch is None
    r3 = rows[3]
    assert (r3.n_sentences, r3.n_words, r3.n_syllables) == (1, 1, 3)


def test_cusum_matches_textbook_recursion_and_flags_drift(spark):
    import math

    from type_filtered_entity_linker_spark.operators.diagnostics import (
        cusum_anomalies,
    )

    # flat at 10, then a sustained +3 drift no single-point z would
    # flag strongly
    series = [10] * 20 + [13] * 10
    rows = [(1, i, v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "k long, slot long, v long")
    out = sorted(
        cusum_anomalies(df, ["k"], "slot", "v", 0.5, 4.0).collect(),
        key=lambda r: r.slot,
    )

    n = len(series)
    mean = sum(series) / n
    sigma = math.sqrt(sum(x * x for x in series) / n - mean * mean)
    s, ref = 0.0, []
    for x in series:
        s = max(0.0, s + (x - mean - 0.5 * sigma))
        ref.append(s)
    for r, expect in zip(out, ref):
        assert abs(r.cusum - expect) < 1e-6, (r.slot, r.cusum, expect)
    alarms = [r.slot for r in out if r.is_alarm]
    ref_alarms = [i for i, s in enumerate(ref) if s > 4.0 * sigma]
    assert alarms == ref_alarms and alarms  # drift IS detected
    # constant series: sigma 0, no alarm, cusum 0
    const = spark.createDataFrame(
        [(2, i, 5) for i in range(10)], "k long, slot long, v long"
    )
    cout = cusum_anomalies(const, ["k"], "slot", "v").collect()
    assert all(not r.is_alarm and r.cusum == 0.0 for r in cout)


def test_sniff_mime_detects_mislabeled_payloads(spark):
    """The router must trust bytes, not labels: payloads carried under
    a WRONG declared media_type sniff to their true type (the
    off-diagonal case the closed-form fixture cannot produce)."""
    from type_filtered_entity_linker_spark.operators.multimodal import (
        make_media_payload,
        sniff_mime,
    )

    wav, _ = make_media_payload(1, "x")   # doc_id 1 -> audio/wav
    bmp, _ = make_media_payload(2, "x")   # -> image/bmp
    png, _ = make_media_payload(3, "x")   # -> image/png
    rows = [
        (1, wav, "image/png"),            # mislabeled
        (2, bmp, "text/plain"),           # mislabeled
        (3, png, "image/png"),
        (4, b"hello world", "audio/wav"), # mislabeled text
        (5, b"\x00\x01\x02", "text/plain"),
        (6, b"", "text/plain"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    got = {r.doc_id: r.sniffed_mime for r in sniff_mime(df).collect()}
    assert got == {
        1: "audio/wav",
        2: "image/bmp",
        3: "image/png",
        4: "text/plain",
        5: "application/octet-stream",
        6: "application/octet-stream",
    }


def test_bpe_fertility_baseline_and_monotone(spark):
    from type_filtered_entity_linker_spark.operators.bpe import bpe_fertility

    docs = spark.createDataFrame(
        [(1, "s1", "ab ab xyz"), (2, "s2", "ab xyz xyz")],
        "doc_id long, source string, text string",
    )
    # zero merges: every word tokenizes to chars + </w>, so
    # n_sub(word) = len(word) + 1 exactly
    base = {
        r.source: r for r in bpe_fertility(docs, n_merges=0).collect()
    }
    # s1: ab(2 words, 3 subs each) + xyz(1 word, 4 subs) = 10/3
    assert (base["s1"].n_words, base["s1"].n_subwords) == (3, 10)
    assert abs(base["s1"].fertility - round(10 / 3, 6)) < 1e-9
    # s2: ab(1) + xyz(2) = 3 + 8 = 11/3
    assert (base["s2"].n_words, base["s2"].n_subwords) == (3, 11)
    # merges only ever join symbols: fertility is non-increasing in
    # n_merges, and enough merges collapse repeated words entirely
    merged = {
        r.source: r for r in bpe_fertility(docs, n_merges=6).collect()
    }
    for s in ("s1", "s2"):
        assert merged[s].fertility <= base[s].fertility
        assert merged[s].n_words == base[s].n_words


def test_cdc_incremental_probes_new_side_only(spark):
    from type_filtered_entity_linker_spark.operators.dedup import (
        cdc_shared_passages_incremental,
    )

    base = " ".join(f"tok{i % 13}w{i % 7}" for i in range(120))
    old = spark.createDataFrame(
        [(1, base), (2, base), (3, "entirely different short words")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, "EDIT " + base)],  # near-copy, one token prepended
        "doc_id long, text string",
    )
    rows = {
        (r.doc_a, r.doc_b): r.n_shared_chunks
        for r in cdc_shared_passages_incremental(
            old, new, k=3, divisor=4
        ).collect()
    }
    # old x old (1,2) share everything but must NOT appear
    assert (1, 2) not in rows
    # the content-defined boundaries survive the prepended token:
    # the new doc shares chunks with BOTH stored copies
    assert rows[(1, 100)] >= 3 and rows[(2, 100)] >= 3
    assert (3, 100) not in rows
    import pytest as _pytest

    with _pytest.raises(ValueError, match="disjoint"):
        cdc_shared_passages_incremental(old, old.limit(1))


def test_cdc_chunks_property_python_parity(spark):
    """Hypothesis sweep: on random corpora the distributed chunking is
    row-identical to the transparent sequential reference — boundary
    rule, chunk extents, and hashes."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from type_filtered_entity_linker_spark.operators.dedup import cdc_chunks

    def md5_60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def ref(text, k, d):
        toks = text.split(" ")
        bounds = [
            t
            for t in range(len(toks))
            if t >= k and md5_60(" ".join(toks[t - k : t])) % d == 0
        ]
        out = []
        for s, e in zip([0] + bounds, bounds + [len(toks)]):
            out.append((s, e - s, md5_60(" ".join(toks[s:e]))))
        return sorted(out)

    token = st.sampled_from(["aa", "b", "ccc", "dd", "e1", "aa"])
    doc = st.lists(token, min_size=1, max_size=30).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(docs=st.lists(doc, min_size=1, max_size=6), k=st.integers(1, 4),
           d=st.integers(2, 5))
    def run(docs, k, d):
        sdf = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        got = {}
        for r in cdc_chunks(sdf, k=k, divisor=d, hash_fn="md5_60").collect():
            got.setdefault(r.doc_id, []).append(
                (r.chunk_start, r.chunk_tokens, r.chunk_hash)
            )
        for i, text in enumerate(docs):
            assert sorted(got[i]) == ref(text, k, d), (text, k, d)

    run()


def test_stream_cdc_index_carries_state_across_batches(spark, tmp_path):
    """A batch-2 document must find its shared chunks in the index the
    batch-1 trigger stored — the cross-batch dependency a stateless
    per-batch chunker cannot produce."""
    import os
    import shutil

    from type_filtered_entity_linker_spark.plans.driver_queries import (
        stage_snapshot_files,
    )
    from type_filtered_entity_linker_spark.streaming.incremental import (
        read_cdc_pairs,
        stream_cdc_index,
    )

    base = " ".join(f"tok{i % 13}w{i % 7}" for i in range(120))
    b1 = spark.createDataFrame(
        [(1, base), (2, "totally unrelated little text")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(100, "EDIT " + base)], "doc_id long, text string"
    )
    stage = str(tmp_path / "stage")
    stage_snapshot_files(stage, [(1, b1), (2, b2)])
    wd = str(tmp_path / "wd")
    metrics = []
    root = stream_cdc_index(
        spark,
        stage,
        wd,
        spark.read.parquet(os.path.join(stage, "snap_1.parquet")).schema,
        k=3,
        divisor=4,
        metrics=metrics,
    )
    rows = {
        (r.doc_a, r.doc_b): r.n_shared_chunks
        for r in read_cdc_pairs(spark, root).collect()
    }
    # the cross-batch pair exists; batch-1-internal docs share nothing
    assert rows.get((1, 100), 0) >= 3
    assert (1, 2) not in rows
    # two triggers ran; the pair was emitted at the LATER member's batch
    assert [m["batch_id"] for m in metrics] == [0, 1]
    assert metrics[0]["n_pairs"] == 0 and metrics[1]["n_pairs"] == 1
    shutil.rmtree(wd, ignore_errors=True)
