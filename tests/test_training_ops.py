"""Unit tests for the training-data pipeline operators."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.operators.dedup import (
    exact_duplicates,
    near_duplicates_minhash,
    near_duplicates_ngram,
    simhash64,
)
from type_filtered_entity_linker_spark.operators.multimodal import (
    extract_media_features,
    with_binary_payload,
)
from type_filtered_entity_linker_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    pq_adc_topk,
)
from type_filtered_entity_linker_spark.operators.textstats import (
    fingerprints,
    lang_id,
)


def test_exact_duplicates(spark):
    d = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3, 4], "text": ["aa", "bb", "aa", "aa"]}
        )
    )
    out = {r.doc_id: r.keeper_id for r in exact_duplicates(d).collect()}
    assert out == {1: 1, 3: 1, 4: 1}


def test_minhash_finds_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    d = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    base,
                    base.replace("today", "tomorrow"),  # near-dup of 1
                    "completely different words in this one unrelated entirely now",
                ],
            }
        )
    )
    pairs = {(r.doc_a, r.doc_b) for r in near_duplicates_minhash(d, threshold=0.5).collect()}
    assert pairs == {(1, 2)}


def test_ngram_jaccard_exact_values(spark):
    # docs 1/2 share 6 of 8 union 3-shingles; doc 3 is disjoint
    d = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "a b c d e f g h",
                    "a b c d e f g x",
                    "p q r s t u v w",
                ],
            }
        )
    )
    rows = near_duplicates_ngram(d, threshold=0.1).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(1, 2)]
    # 6 shingles each; 5 shared ("a b c".."d e f" span) -> 5/7
    assert abs(rows[0].jaccard - 5 / 7) < 1e-6


def test_ngram_equals_minhash_verified_output(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    d = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [base, base + " tonight", "completely different words here now"],
            }
        )
    )
    ng = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in near_duplicates_ngram(d, threshold=0.5).collect()
    }
    mh = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in near_duplicates_minhash(d, threshold=0.5).collect()
    }
    assert ng == mh and len(ng) == 1


def test_ngram_short_doc_fallback_shingle(spark):
    # docs with < 3 tokens contribute one whole-text shingle; two
    # identical short docs must pair with jaccard 1.0 (the SQL oracle
    # mirrors this CASE branch)
    d = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["tiny doc", "tiny doc", "other"]})
    )
    rows = near_duplicates_ngram(d, threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]


def test_ngram_max_doc_freq_prunes_boilerplate(spark):
    # identical boilerplate in all docs; unique tails -> with the
    # boilerplate shingles DF-cut, no pair survives the threshold
    boiler = "terms of service apply to all pages on this site"
    d = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [f"{boiler} unique tail number {i} extra" for i in range(4)],
            }
        )
    )
    full = near_duplicates_ngram(d, threshold=0.5)
    cut = near_duplicates_ngram(d, threshold=0.5, max_doc_freq=3)
    assert full.count() == 6 and cut.count() == 0


def test_simhash_identical_and_near(spark):
    base = " ".join(f"tok{i}" for i in range(30))
    d = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [base, base, " ".join(f"x{i}" for i in range(30))],
            }
        )
    )
    sh = {r.doc_id: r.simhash for r in simhash64(d).collect()}
    assert sh[1] == sh[2]
    assert sh[1] != sh[3]


def test_brute_force_topk_exact(spark):
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [0, 1, 2, 3],
                "embedding": [
                    [1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [-1.0, 0.0]
                ],
            }
        )
    )
    q = corpus.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    got = [
        (r.vec_id, r.rank)
        for r in brute_force_topk(q, corpus, k=3).orderBy("rank").collect()
    ]
    assert got == [(1, 1), (2, 2), (3, 3)]


def _random_vectors(spark, n, dim=16, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(n),
                "embedding": [rng.randn(dim).tolist() for _ in range(n)],
            }
        )
    )


def test_ivf_exhaustive_probe_equals_brute_force(spark):
    corpus = _random_vectors(spark, 60)
    queries = corpus.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    bf = brute_force_topk(queries, corpus, k=5).collect()
    ivf = ivf_topk(queries, corpus, k=5, n_cells=8, n_probe=8).collect()
    key = lambda rows: sorted((r.query_id, r.vec_id, r.rank) for r in rows)
    assert key(bf) == key(ivf)


def test_ivf_partial_probe_recall(spark):
    corpus = _random_vectors(spark, 120)
    queries = corpus.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    bf = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(queries, corpus, k=5).collect()
    }
    got = ivf_topk(queries, corpus, k=5, n_cells=8, n_probe=4).collect()
    hits = {(r.query_id, r.vec_id) for r in got}
    # every query returns k results from probed cells, with decent recall
    assert all(
        sum(1 for q, _ in hits if q == qid) == 5 for qid in range(6)
    )
    assert len(hits & bf) / len(bf) >= 0.5


def test_pq_identical_vectors_share_codes_and_distance(spark):
    """An exact copy of a corpus vector maps to the same subspace codes,
    so every query sees the SAME ADC distance for both — the pair ranks
    adjacently, tie broken by vec_id."""
    corpus = _random_vectors(spark, 60)
    twin = corpus.where(F.col("vec_id") == 30).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    queries = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    got = pq_adc_topk(
        queries, corpus.unionByName(twin), centroid_ids=(40, 47), k=61
    ).collect()
    d = {(r.query_id, r.vec_id): r.adc_dist for r in got}
    ranks = {(r.query_id, r.vec_id): r.rank for r in got}
    for qid in range(3):
        assert d[(qid, 30)] == d[(qid, 1030)]
        assert ranks[(qid, 1030)] == ranks[(qid, 30)] + 1


def test_pq_adc_groups_queries_with_their_cluster(spark):
    """On well-separated clusters, ADC over sampled-codebook codes puts
    every top-k neighbor in the query's own cluster (the quantization
    semantics that matter; within-cluster order is below PQ resolution)."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(4, 16) * 5.0
    embs = [
        (centers[i % 4] + rng.randn(16) * 0.1).tolist() for i in range(80)
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(80), "embedding": embs})
    )
    queries = corpus.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # codebook ids 8..15 cover each cluster twice (i % 4 layout)
    got = pq_adc_topk(queries, corpus, centroid_ids=(8, 15), k=5).collect()
    assert all(
        sum(1 for r in got if r.query_id == qid) == 5 for qid in range(4)
    )
    assert all(r.vec_id % 4 == r.query_id % 4 for r in got)


def test_embedding_dedup_lsh_blocks_on_any_dim(spark):
    """Inferred-dim hyperplanes: with 24-dim vectors (not the old
    hardcoded 64) the LSH path still finds exactly the planted copies,
    and the bucketing actually splits the corpus (no silent
    one-bucket degeneration)."""
    from type_filtered_entity_linker_spark.operators.similarity import (
        embedding_near_duplicates,
        hyperplanes,
        lsh_bucket,
    )

    v = _random_vectors(spark, 50, dim=24)
    copies = v.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    corpus = v.unionByName(copies)
    got = embedding_near_duplicates(corpus, tau=0.9999, lsh_bits=6)
    assert {(r.id_a, r.id_b) for r in got.collect()} == {
        (i, i + 1000) for i in range(5)
    }
    n_buckets = (
        corpus.select(
            lsh_bucket(F.col("embedding"), hyperplanes(24, 6, 11)).alias("b")
        )
        .distinct()
        .count()
    )
    assert n_buckets > 1


def test_lang_id_markers(spark):
    d = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the cat and the dog of it",
                    "der hund und die katze ist",
                    "xyzzy plugh",
                ],
            }
        )
    )
    out = {r.doc_id: r.pred_lang for r in lang_id(d).collect()}
    assert out == {1: "en", 2: "de", 3: "und"}


def test_fingerprint_order_sensitive(spark):
    d = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["aa bb cc", "cc bb aa"]})
    )
    fps = {r.doc_id: r.fingerprint for r in fingerprints(d).collect()}
    assert fps[1] != fps[2]


def test_media_features_segmented_reduction(spark):
    # empty payloads interleaved: checksum 0 / first_byte -1, and the
    # neighbors' segment sums must be unaffected
    d = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": ["abc", "", "z", ""]})
    )
    rows = {
        r.doc_id: (r.n_bytes, r.first_byte, r.byte_checksum)
        for r in extract_media_features(with_binary_payload(d)).collect()
    }
    assert rows == {
        1: (3, 97, 97 + 98 + 99),
        2: (0, -1, 0),
        3: (1, 122, 122),
        4: (0, -1, 0),
    }


def test_media_stub_raises_for_codec_formats(spark):
    # JPEG has no stdlib decoder — the honest stub boundary (WAV/BMP/
    # PNG are really decoded since r4)
    d = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["hello"]})
    )
    media = with_binary_payload(d).withColumn(
        "media_type", F.lit("image/jpeg")
    )
    with pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        extract_media_features(media).collect()


def test_media_stdlib_decoders_on_spark(spark):
    """Mixed fixture payloads really decode: dimensions, rates and
    decoded-sample checksums match the generator's closed forms."""
    from type_filtered_entity_linker_spark.operators.multimodal import (
        _bmp_params,
        _png_params,
        _wav_params,
        with_media_payload,
    )

    d = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(1, 13)),
                      "text": ["some text"] * 12})
    )
    rows = {
        r.doc_id: r
        for r in extract_media_features(with_media_payload(d)).collect()
    }
    assert len(rows) == 12
    for did, r in rows.items():
        m = did % 4
        if m == 0:
            assert r.media_type == "text/plain"
            assert r.byte_checksum == sum(b"some text")
            assert r.width is None and r.sample_checksum is None
        elif m == 1:
            rate, n = _wav_params(did)
            assert (r.media_type, r.sample_rate, r.n_samples, r.n_channels) == (
                "audio/wav", rate, n, 1)
            assert r.n_bytes == 44 + n and r.first_byte == ord("R")
            assert r.sample_checksum == sum(
                (did * 31 + 7 * i) % 256 for i in range(n))
        elif m == 2:
            w, h = _bmp_params(did)
            assert (r.media_type, r.width, r.height, r.n_channels) == (
                "image/bmp", w, h, 3)
            assert r.sample_checksum == sum(
                (did * 13 + 5 * j) % 256 for j in range(w * h * 3))
        else:
            w, h = _png_params(did)
            assert (r.media_type, r.width, r.height, r.n_channels) == (
                "image/png", w, h, 1)
            assert r.sample_checksum == sum(
                (did * 17 + 11 * j) % 256 for j in range(w * h))


def test_png_sub_filter_and_unsupported_paths():
    """The Sub (type 1) unfilter path, plus the explicit raise for a
    filter type the decoder does not implement (Paeth) and a non-
    grayscale color type."""
    import struct
    import zlib

    import numpy as np

    from type_filtered_entity_linker_spark.operators.multimodal import (
        _decode_png,
    )

    def png(w, h, raw, ctype=0):
        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data)))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    # 1x4 row [10, 250, 7, 7] Sub-filtered: deltas [10, 240, 13, 0]
    raw = bytes([1, 10, 240, 13, 0])
    f = _decode_png(png(4, 1, raw))
    assert f["sample_checksum"] == 10 + 250 + 7 + 7
    assert (f["width"], f["height"]) == (4, 1)
    with pytest.raises(NotImplementedError, match="filter type 4"):
        _decode_png(png(2, 1, bytes([4, 1, 2])))
    with pytest.raises(NotImplementedError, match="color_type=2"):
        _decode_png(png(1, 1, bytes([0, 1, 2, 3]), ctype=2))


def test_media_features_text_payload(spark):
    d = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["abc"]})
    )
    r = extract_media_features(with_binary_payload(d)).collect()[0]
    assert r.n_bytes == 3 and r.first_byte == 97
    assert r.byte_checksum == 97 + 98 + 99


def test_paragraph_dedup_first_occurrence_wins(spark):
    from type_filtered_entity_linker_spark.operators.dedup import (
        paragraph_dedup,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "P1\nP2",
                    "P2\nP3",  # P2 repeated from doc 1
                    "P4\nP4\n\nP5",  # intra-doc repeat + empty paragraph
                ],
            }
        )
    )
    got = {
        r.doc_id: (r.n_paras, r.n_removed, r.text_clean)
        for r in paragraph_dedup(docs).collect()
    }
    assert got[1] == (2, 0, "P1\nP2")
    assert got[2] == (2, 1, "P3")
    assert got[3] == (3, 1, "P4\nP5")  # empty para dropped, repeat removed
