"""Round-3 webtext/ER additions: Gopher-style repetition signals
(operators/textstats.py), crawl-URL canonicalization
(operators/curation.py) and rarest-token blocking + relational TF-IDF
pair scoring (operators/blocking.py) — each checked against a small
hand-computable or pure-Python reference."""

import math
from collections import Counter

from type_filtered_entity_linker_spark.operators.blocking import (
    rarest_token_blocks,
    tfidf_pair_scores,
)
from type_filtered_entity_linker_spark.operators.curation import (
    canonicalize_urls,
)
from type_filtered_entity_linker_spark.operators.textstats import (
    repetition_signals,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_signals_hand_computed(spark):
    rows = [
        # "a b a b a" -> bigrams [a b, b a, a b, b a]: top 2/4, dup 4/4
        (1, "a b a b a"),
        # all-distinct bigrams
        (2, "w x y z"),
        # shorter than n tokens -> both fractions 0
        (3, "solo"),
    ]
    out = {
        r["doc_id"]: r
        for r in repetition_signals(_docs(spark, rows), n=2).collect()
    }
    assert out[1]["top_ngram_frac"] == 0.5
    assert out[1]["dup_ngram_frac"] == 1.0
    assert out[1]["distinct_token_ratio"] == 0.4  # {a,b} of 5
    assert out[2]["top_ngram_frac"] == round(1 / 3, 6)
    assert out[2]["dup_ngram_frac"] == 0.0
    assert out[2]["distinct_token_ratio"] == 1.0
    assert out[3]["top_ngram_frac"] == 0.0
    assert out[3]["dup_ngram_frac"] == 0.0
    assert out[3]["distinct_token_ratio"] == 1.0


def test_canonicalize_urls_rules(spark):
    rows = [
        (1, "HTTPS://WWW.News.Example.COM:443/A/b?utm_source=f&b=2&a=1#x"),
        # same page, params reordered, no junk -> same canonical key
        (2, "https://news.example.com/A/b?a=1&b=2"),
        # http default port + empty path -> '/'
        (3, "http://Example.org:80?gclid=z"),
        # non-default port must survive in the key AND not leak into
        # the registered domain
        (4, "https://api.example.org:8443/v1?fbclid=y&q=1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in canonicalize_urls(df).collect()}
    assert out[1]["canonical_url"] == "https://news.example.com/A/b?a=1&b=2"
    assert out[2]["canonical_url"] == out[1]["canonical_url"]
    assert {out[1]["dup_rank"], out[2]["dup_rank"]} == {1, 2}
    assert out[1]["dup_rank"] == 1  # lowest id is the keeper
    assert out[1]["registered_domain"] == "example.com"
    assert out[3]["canonical_url"] == "http://example.org/"
    assert out[3]["registered_domain"] == "example.org"
    assert out[4]["canonical_url"] == "https://api.example.org:8443/v1?q=1"
    assert out[4]["registered_domain"] == "example.org"


def test_rarest_token_blocks_argmin_and_df_bounds(spark):
    rows = [
        (1, "common rare1 noise1"),
        (2, "common rare1 noise2"),
        (3, "common rare2 unique9"),
        (4, "common rare2"),
        (5, "common only"),  # 'only' df=1 < min_df; 'common' df=5 > max_df
    ]
    out = {
        r["doc_id"]: (r["block_key"], r["df"])
        for r in rarest_token_blocks(
            _docs(spark, rows), min_df=2, max_df=4
        ).collect()
    }
    assert out[1] == ("rare1", 2)
    assert out[2] == ("rare1", 2)
    assert out[3] == ("rare2", 2)
    assert out[4] == ("rare2", 2)
    assert 5 not in out  # no pairable token at all


def _py_tfidf_cosine(texts, a, b, min_len=3):
    toks = {d: [t for t in txt.split() if len(t) >= min_len] for d, txt in texts.items()}
    df = Counter()
    for ts in toks.values():
        df.update(set(ts))
    n = len(texts)

    def w(d):
        tf = Counter(toks[d])
        return {t: c * math.log(n / df[t]) for t, c in tf.items()}

    wa, wb = w(a), w(b)
    dot = sum(wa[t] * wb[t] for t in wa.keys() & wb.keys())
    na = math.sqrt(sum(v * v for v in wa.values()))
    nb = math.sqrt(sum(v * v for v in wb.values()))
    return round(dot / (na * nb), 6)


def test_tfidf_pair_scores_match_python(spark):
    texts = {
        1: "alpha beta gamma rarekey",
        2: "alpha beta delta rarekey",
        3: "epsilon zeta eta otherkey",
        4: "epsilon theta iota otherkey",
    }
    docs = _docs(spark, list(texts.items()))
    blocks = rarest_token_blocks(docs, min_df=2, max_df=3)
    out = {
        (r["doc_a"], r["doc_b"]): r["cosine_tfidf"]
        for r in tfidf_pair_scores(docs, blocks).collect()
    }
    # blocks: every token here has df<=2; rarest ties break lexically
    assert set(out) == {(1, 2), (3, 4)}
    for (a, b), got in out.items():
        assert abs(got - _py_tfidf_cosine(texts, a, b)) <= 1e-6


def _py_bm25(texts, terms, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in texts.items()}
    n = len(texts)
    dl = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dl.values()) / n
    tf = {d: Counter(t) for d, t in toks.items()}
    df = Counter()
    for d in texts:
        df.update({t for t in tf[d] if t in terms})
    out = {}
    for d in texts:
        s = 0.0
        for t in terms:
            f = tf[d].get(t, 0)
            if f == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl[d] / avgdl))
        if s > 0:
            out[d] = round(s, 6)
    return out


def test_bm25_matches_python_reference(spark):
    from type_filtered_entity_linker_spark.operators.textstats import bm25_scores

    texts = {
        1: "spark table spark join",
        2: "table scan filter",
        3: "hash join hash hash probe build side",
        4: "nothing relevant here",
    }
    terms = ["spark", "hash", "table"]
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(_docs(spark, list(texts.items())), terms).collect()
    }
    want = _py_bm25(texts, terms)
    assert set(got) == set(want) == {1, 2, 3}
    for d in want:
        assert abs(got[d] - want[d]) <= 1e-6


def test_phonetic_key_groups_similar_names(spark):
    from pyspark.sql import functions as F

    from type_filtered_entity_linker_spark.operators.blocking import (
        phonetic_key_col,
    )

    rows = [(i, n) for i, n in enumerate(
        ["smith", "Smyth", "robert", "Rupert", "gear", "12", ""]
    )]
    df = spark.createDataFrame(rows, "i long, name string")
    out = dict(
        df.select("name", phonetic_key_col(F.col("name")).alias("k")).collect()
    )
    assert out["smith"] == out["Smyth"] == "S530"
    assert out["robert"] == out["Rupert"] == "R163"
    assert out["gear"] == "G600"
    assert out["12"] is None and out[""] is None


def test_dedup_clusters_transitive_keep_one(spark):
    """A~B and B~C must form ONE cluster with ONE survivor (the
    longest text); docs outside any pair are their own kept
    singletons."""
    from type_filtered_entity_linker_spark.operators.dedup import (
        dedup_clusters,
    )

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd"),       # in chain, len 11
            (2, "aa bb cc dd ee"),    # in chain, len 14 -> survivor
            (3, "aa bb cc"),          # in chain, len 8
            (4, "zz yy xx"),          # singleton
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert out[1] == (1, 0)
    assert out[2] == (1, 1)  # longest text wins the cluster
    assert out[3] == (1, 0)
    assert out[4] == (4, 1)  # singleton keeps itself


def test_dedup_clusters_tie_breaks_to_lowest_id(spark):
    from type_filtered_entity_linker_spark.operators.dedup import (
        dedup_clusters,
    )

    docs = spark.createDataFrame(
        [(7, "same len"), (9, "also len")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(7, 9)], "doc_a long, doc_b long")
    out = {
        r["doc_id"]: r["keep"] for r in dedup_clusters(docs, pairs).collect()
    }
    assert out == {7: 1, 9: 0}


def test_kmeans_separates_two_blobs(spark):
    """Two well-separated 4-d blobs, k=2: every vector lands with its
    blob, assignments are deterministic across reruns."""
    from type_filtered_entity_linker_spark.operators.kmeans import (
        kmeans_topics,
    )

    rows = []
    for i in range(6):  # blob around (0,0,0,0)
        rows.append((i, [0.0 + i * 0.01, 0.0, 0.1, 0.0]))
    for i in range(6):  # blob around (10,10,10,10)
        rows.append((10 + i, [10.0, 10.0 + i * 0.01, 10.0, 9.9]))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = kmeans_topics(e, k=2, n_iter=2).collect()
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["vec_id"])
    assert sorted(len(v) for v in by_cluster.values()) == [6, 6]
    low = {v for v in by_cluster[min(by_cluster)] if v < 10}
    assert len(low) in (0, 6)  # no blob is split
    again = kmeans_topics(e, k=2, n_iter=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_kmeans_update_moves_centroid_to_mean(spark):
    """One cluster (k=1): after one update the centroid is the mean,
    so every dist2 equals the vector's squared distance to the mean."""
    from type_filtered_entity_linker_spark.operators.kmeans import (
        kmeans_topics,
    )

    e = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [2.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["dist2"] for r in kmeans_topics(e, k=1, n_iter=1).collect()}
    # mean = (1, 2); d2(0,0) = 1+4 = 5; d2(2,4) = 1+4 = 5
    assert got == {1: 5.0, 2: 5.0}


def test_pagerank_symmetric_cycle(spark):
    """2-cycle: symmetry fixes rank at 0.5/0.5 for every iteration."""
    from type_filtered_entity_linker_spark.operators.graph import pagerank

    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(e, n_iter=4).collect()}
    assert got == {1: 0.5, 2: 0.5}


def test_pagerank_dangling_mass_and_conservation(spark):
    """A→B with B dangling: hand-computed first iteration; total mass
    stays 1 (the dangling term's job)."""
    from type_filtered_entity_linker_spark.operators.graph import pagerank

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(e, n_iter=1).collect()}
    # r1(A) = 0.15/2 + 0.85*(0 + 0.5/2) = 0.2875
    # r1(B) = 0.15/2 + 0.85*(0.5 + 0.5/2) = 0.7125
    assert got == {1: 0.2875, 2: 0.7125}
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_drops_self_loops_and_dup_edges(spark):
    from type_filtered_entity_linker_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 1), (2, 1)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(e, n_iter=3).collect()}
    assert got == {1: 0.5, 2: 0.5}  # reduces to the 2-cycle


def test_vocab_topk_counts_cut_and_order(spark):
    from type_filtered_entity_linker_spark.operators.textstats import (
        vocab_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "aa bb aa cc!"),
            (2, "aa bb dd"),
            (3, "aa zz"),
        ],
        "doc_id long, text string",
    )
    got = [tuple(r) for r in vocab_topk(docs, k=10, min_df=2).collect()]
    # aa: tf 4 df 3; bb: tf 2 df 2; cc/dd/zz/'!': df 1 -> cut
    assert got == [("aa", 4, 3, 1), ("bb", 2, 2, 2)]


def test_dedup_semantic_drops_planted_copies(spark):
    """SemDeDup composition: every planted exact copy (vec_id+10000)
    lands in its original's k-means cell, crosses tau, and is dropped
    with group_id pointing at the surviving original; no original is
    dropped in favor of its copy (min-id survivorship)."""
    from type_filtered_entity_linker_spark.plans.driver_queries import (
        q_dedup_semantic,
    )

    rows = q_dedup_semantic(spark, "/root/testdata/sf0.001").collect()
    drops = [r for r in rows if not r.keep]
    assert drops, "planted copies must produce dropped rows"
    assert all(r.vec_id >= 10000 for r in drops)
    assert all(r.group_id == r.vec_id - 10000 for r in drops)
    keeps = {r.vec_id for r in rows if r.keep}
    assert all(r.group_id in keeps for r in drops)
