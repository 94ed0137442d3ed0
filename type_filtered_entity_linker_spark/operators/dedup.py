"""Document deduplication for large-scale training-data pipelines.

Four families, all designed to stay JVM-side (whole-stage codegen /
higher-order functions — no Python in any hot path):

- exact:   md5(text) hash-groupBy
- minhash: token-shingle MinHash signatures + banded LSH bucket join,
           then exact-Jaccard verification (so the output equals the
           brute-force n-gram-Jaccard result — standard
           candidates-then-verify)
- simhash: 64-bit SimHash + pigeonhole band blocking + Hamming verify
- ngram:   exact token-shingle Jaccard (the verification primitive)

Scale notes: the LSH band join shuffles on (band, band_hash) — bucket
sizes are bounded by near-duplicate cluster sizes, and AQE skew-join
handles pathological buckets. At 100 TB the signature table (k=64
longs/doc) is ~0.05% of corpus size.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mersenne-31 universal-hash prime: with a,b,h < 2^31, a*h+b < 2^62 —
# safe in a BIGINT under Spark's ANSI overflow checking.
MERSENNE = (1 << 31) - 1


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, keeper_id) for every doc whose text occurs more than
    once; keeper = min doc_id of the group."""
    h = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
    groups = (
        h.groupBy("text_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n"))
        .where(F.col("n") > 1)
    )
    return (
        h.join(groups, "text_hash")
        .select(F.col(id_col).alias("doc_id"), "keeper_id")
    )


def token_shingles(text_col: str = "text", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of a text column (JVM-side)."""
    toks = F.split(F.col(text_col), r"\s+")
    joined = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(joined)


def _perm_coeffs(k: int, seed: int) -> tuple[list[int], list[int]]:
    rng = random.Random(seed)
    a = [rng.randrange(1, MERSENNE) for _ in range(k)]
    b = [rng.randrange(0, MERSENNE) for _ in range(k)]
    return a, b


# k in lsh_candidate_pairs is the BAND count; rows-per-band is
# derived from the signature length at runtime.


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    shingle_n: int = 3,
    seed: int = 7,
) -> DataFrame:
    """(doc_id, sig: array<bigint>[k]) MinHash signature per doc.
    All JVM: shingle → xxhash64 → k universal-hash mins via nested
    higher-order functions (no Python, no shuffle)."""
    a, b = _perm_coeffs(k, seed)
    # explode shingles → ONE hash-aggregate with k min() columns:
    # map-side combined, whole-stage codegen, each shingle hashed once
    # (a nested higher-order-function formulation recomputes the k×|sh|
    # expression tree per consumer — measured 40× slower)
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(token_shingles(text_col, shingle_n)).alias("s"),
    ).select("doc_id", F.pmod(F.xxhash64("s"), F.lit(MERSENNE)).alias("h"))
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(F.pmod(F.col("h") * a[j] + b[j], F.lit(MERSENNE))).alias(f"m{j}")
            for j in range(k)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"m{j}") for j in range(k)]).alias("sig")
    )


def _banded(sigs: DataFrame, bands: int, k: int) -> DataFrame:
    """(doc_id, band, bh) — the banded LSH bucket keys, one row per
    (doc, band). Shared by the batch self-join and the incremental
    new-side probe."""
    rows_per_band = k // bands
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("sig")[j]
                                for j in range(
                                    bi * rows_per_band,
                                    (bi + 1) * rows_per_band,
                                )
                            ]
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band", "b.bh")


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16, k: int = 64) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become a candidate pair.
    (doc_a, doc_b) with doc_a < doc_b, distinct. Band hashes built by a
    static Python loop (fixed k) — plain codegen expressions.

    ``sigs`` is materialized once (localCheckpoint) before the
    self-join: the banded explode differs per side, so Catalyst gets no
    ReusedExchange, and without the barrier BOTH sides recompute the
    64-min signature aggregate — measured 132 s vs 31 s composed at a
    50k-doc 10x probe (scripts/scale_probe.py, round 4). At cluster
    scale the same barrier is a reliable-storage checkpoint of the
    signature table — one row per doc, the cheapest table in the job."""
    sigs = sigs.localCheckpoint()
    banded = _banded(sigs, bands, k)
    l = banded.select(F.col("doc_id").alias("doc_a"), "band", "bh")
    r = banded.select(F.col("doc_id").alias("doc_b"), "band", "bh")
    return (
        l.join(r, ["band", "bh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def exact_jaccard(
    pairs: DataFrame, docs: DataFrame, shingle_n: int = 3
) -> DataFrame:
    """(doc_a, doc_b, jaccard) by exact distinct-shingle Jaccard."""
    sh = docs.select(
        F.col("doc_id"), token_shingles("text", shingle_n).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard")
        )
    )


def near_duplicates_minhash(
    docs: DataFrame, threshold: float = 0.6, k: int = 64, bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard ≥ threshold.
    Output equals brute-force Jaccard join (candidates-then-verify),
    provided LSH recall at the threshold is 1 on the corpus — the
    (k, bands) defaults put the S-curve midpoint at
    (1/16)^(1/4) ≈ 0.5 < 0.6."""
    sigs = minhash_signatures(docs, k=k, shingle_n=shingle_n)
    cands = lsh_candidate_pairs(sigs, bands=bands)
    j = exact_jaccard(cands, docs, shingle_n)
    return j.where(F.col("jaccard") >= threshold)


def near_duplicates_ngram(
    docs: DataFrame,
    threshold: float = 0.6,
    shingle_n: int = 3,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs via an inverted shingle index —
    no candidate generation.

    Plan: explode distinct shingles → self-equi-join on the shingle
    (the inverted-index posting-list join) → groupBy pair count =
    |A∩B| → join per-doc shingle counts → Jaccard.

    Exactness: with ``max_doc_freq=None`` the result is EXACT Jaccard,
    unconditionally (every pair with jaccard > 0 shares a shingle).
    With the DF-cut active, per-doc sizes and intersections are counted
    AFTER pruning, so surviving pairs report Jaccard over the pruned
    shingle sets — an approximation that can drop pairs held together
    only by boilerplate shingles (usually the desired behavior for
    near-dup mining) and shifts reported values on docs that contain
    pruned shingles. On a corpus where no shingle exceeds the cut the
    two modes are identical.

    Scale: the self-join shuffles on the shingle; head shingles
    (boilerplate headers/footers shared by millions of pages) create
    QUADRATIC posting lists, so the DF-cut ships ON by default
    (``max_doc_freq=1000`` → any shingle's pair contribution is
    bounded at ~500k instead of corpus²). Use ``shingle_df_stats`` to
    observe how many shingles the cut drops; AQE skew-join splits the
    surviving heavy keys.
    """
    sh = docs.select(
        F.col("doc_id"),
        F.explode(token_shingles("text", shingle_n)).alias("s"),
    )
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("s")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_doc_freq)
            .select("s")
        )
        sh = sh.join(rare, "s", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def containment_duplicates(
    docs: DataFrame,
    threshold: float = 0.8,
    shingle_n: int = 3,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Asymmetric shingle-CONTAINMENT near-dup pairs: |A∩B|/|A| and
    |A∩B|/|B|, keeping pairs where either direction ≥ ``threshold``.

    Jaccard misses subset duplication — a page quoted wholesale inside
    a longer page has high containment but low Jaccard (the classic
    Broder distinction; web corpora are full of syndicated excerpts
    and quoted reposts). This is the containment complement of
    ``near_duplicates_ngram``: the SAME inverted shingle-index
    posting-list join and the SAME DF-cut scale guard, only the final
    ratio differs — so its 100 TB shape is identical (shingle-keyed
    shuffle, quadratic posting lists bounded by ``max_doc_freq``,
    AQE skew-join on surviving heavy keys).

    With ``max_doc_freq=None`` the output is EXACT containment over
    distinct token shingles (every pair with intersection > 0 shares a
    shingle, so the posting-list join loses nothing).
    """
    sh = docs.select(
        F.col("doc_id"),
        F.explode(token_shingles("text", shingle_n)).alias("s"),
    )
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("s")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_doc_freq)
            .select("s")
        )
        sh = sh.join(rare, "s", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    c_a = F.col("i") / F.col("na")
    c_b = F.col("i") / F.col("nb")
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(F.greatest(c_a, c_b) >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.round(c_a, 6).alias("cont_a_in_b"),
            F.round(c_b, 6).alias("cont_b_in_a"),
        )
    )


def shingle_hash(
    col: "str | F.Column" = "tok", hash_fn: str = "xxhash64"
) -> F.Column:
    """64-bit shingle hash. ``xxhash64`` (default): the JVM-native fast
    path for production. ``md5_60``: 60-bit hash derived from the first
    15 hex chars of md5 — slower, but md5 is identical in every engine,
    so results are reproducible in DuckDB/Trino/Postgres for oracle
    verification (bits 60-63 are always 0; SimHash/banding semantics
    are unaffected, the top bits simply never vote set)."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5_60":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def shingle_df_stats(
    docs: DataFrame, shingle_n: int = 3, max_doc_freq: int = 1000
) -> DataFrame:
    """One-row metrics table for the DF-cut: total distinct shingles,
    how many the cut would drop, and the worst posting-list length —
    the observable 'logged drop count' companion of
    ``near_duplicates_ngram`` (run it as a metrics query next to the
    dedup job; at scale silently-pruned coverage must be visible)."""
    df = (
        docs.select(
            F.col("doc_id"),
            F.explode(token_shingles("text", shingle_n)).alias("s"),
        )
        .groupBy("s")
        .agg(F.count("*").alias("df"))
    )
    return df.agg(
        F.count("*").alias("n_shingles"),
        F.sum((F.col("df") > max_doc_freq).cast("long")).alias(
            "n_dropped_shingles"
        ),
        F.max("df").alias("max_doc_freq_seen"),
    )


def simhash64(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, simhash: bigint) — 64-bit SimHash over distinct tokens.

    Plan: explode tokens → one hash-aggregate with 64 static-bit vote
    sums (whole-stage codegen; the single shuffle is on doc_id and is
    map-side combined). Static Python loop builds the 64 column
    expressions — no per-row Python."""
    th = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(token_shingles(text_col, 3)).alias("tok"),
    ).select("doc_id", shingle_hash("tok", hash_fn).alias("h"))
    votes = th.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim.bitwiseXOR(
            F.when(
                F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("doc_id", sim.alias("simhash"))


def near_duplicates_simhash(
    docs: DataFrame, max_hamming: int = 3, hash_fn: str = "xxhash64"
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ max_hamming.

    Pigeonhole blocking with ``max_hamming + 1`` bands: a pair within
    Hamming ≤ h differs in at most h bands, so with h+1 bands it agrees
    on ≥1 band → EXACT recall, then bit_count(xor) verify. The whole
    operator is therefore exact (equals the brute-force all-pairs
    Hamming join) at any max_hamming, while only shuffling banded keys.
    """
    bands = max_hamming + 1
    width = 64 // bands  # last band absorbs the remainder
    offs = [bi * width for bi in range(bands)]
    widths = [width] * (bands - 1) + [64 - width * (bands - 1)]
    # same double-compute shape as lsh_candidate_pairs: the 64-vote
    # aggregate feeds both sides of the band self-join — materialize
    # the (doc_id, simhash) table once
    sh = simhash64(docs, hash_fn=hash_fn).localCheckpoint()
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("simhash"), offs[bi])
                        .bitwiseAND(
                            F.lit(
                                (1 << widths[bi]) - 1
                                if widths[bi] < 64
                                else -1
                            )
                        )
                        .alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band", "b.bh")
    l = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "bh"
    )
    r = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "bh"
    )
    return (
        l.join(r, ["band", "bh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Global paragraph-level exact dedup (the MassiveText/Gopher rule,
    finer-grained than whole-doc ``exact_duplicates``): every repeated
    paragraph keeps only its FIRST occurrence — lowest (doc_id,
    paragraph index) — and each doc is rebuilt from its surviving
    paragraphs. Empty paragraphs (consecutive separators) are dropped
    up front. Output: (doc_id, n_paras, n_removed, text_clean).

    ``sep`` must be literal-safe for a regex (it feeds ``F.split``).

    Plan shape at 10^12 docs: posexplode is a narrow map; first-owner
    election is ONE partial-aggregated shuffle on md5(paragraph) —
    min(struct(doc_id, idx)) combines map-side, so a boilerplate
    paragraph repeated 10^9 times ships one row per input partition,
    not 10^9; the rebuild is one more shuffle on doc_id. Boilerplate
    skew therefore never concentrates on a key (contrast a naive
    row_number window over the hash, which would sort the whole
    repeat group in one task)."""
    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("idx", "para"),
    ).where(F.col("para") != "")
    paras = paras.withColumn("ph", F.md5(F.col("para")))
    owners = paras.groupBy("ph").agg(
        F.min(F.struct(F.col(id_col), F.col("idx"))).alias("first")
    )
    flagged = paras.join(owners, "ph").withColumn(
        "keep",
        (F.col("first")[id_col] == F.col(id_col))
        & (F.col("first.idx") == F.col("idx")),
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_paras"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_removed"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("idx", "para"))
                        )
                    ),
                    lambda s: s["para"],
                ),
                sep,
            ),
            F.lit(""),
        ).alias("text_clean"),
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs → transitive dedup CLUSTERS → keep-one decision:
    the step a real corpus dedup runs after pair mining (pairs alone
    over-delete: A~B and B~C must drop two docs, not up to four
    endpoints of two independent pairs).

    Plan: connected components (large-star/small-star, the same
    iterative CC as entity clustering) over the verified pair edges;
    every doc outside any pair is its own singleton cluster; the
    canonical survivor per cluster is the LONGEST text (tie → lowest
    id) — the standard keep-best-copy rule.

    Output: (id, cluster_id, keep∈{0,1}) for EVERY input doc.

    Scale: edges are near-dup pairs only (≪ corpus); CC state is one
    row per involved doc. The keep election is a window over
    cluster_id — dup clusters are small by nature, and a mega-cluster
    (boilerplate explosion) is the upstream pair-miner's DF-cut
    problem, observable via the cluster-size distribution before this
    step is run.
    """
    from .clustering import connected_components

    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    assign = connected_components(edges)
    base = docs.select(F.col(id_col), F.length(text_col).alias("n"))
    withc = base.join(
        assign, base[id_col] == assign["node"], "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        F.col("n"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n"), F.col(id_col).asc()
    )
    return withc.select(
        F.col(id_col),
        F.col("cluster_id"),
        (F.row_number().over(w) == 1).cast("int").alias("keep"),
    )


def repeated_spans(
    docs: DataFrame,
    k: int = 8,
    min_occurrences: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: "str | None" = "xxhash64",
) -> DataFrame:
    """Intra-corpus repeated-substring detection at k-token-window
    granularity — the distributed shape of Lee et al. 2022's
    ExactSubstr dedup ("Deduplicating Training Data Makes Language
    Models Better"): any token run whose every k-window occurs >=
    ``min_occurrences`` times ANYWHERE in the corpus (other docs or
    the same doc — templated boilerplate repeats both ways) is a
    duplicated span a training-data pipeline cuts out, even when the
    containing documents are nowhere near whole-doc duplicates (so
    MinHash/SimHash never pair them).

    Returns one row per MAXIMAL duplicated span: (doc_id, span_start,
    span_end, span_tokens, n_windows) with token indices 0-based and
    span_end exclusive. Overlapping and exactly-adjacent duplicated
    windows merge into one span (adjacency means the two runs abut in
    the text, so the cut is contiguous).

    Plan, and why it survives 100 TB:
    - windows are built per-row with higher-order functions (sequence
      -> transform -> slice), a map-side k-times expansion with no
      shuffle and no Python;
    - the ONE corpus-wide shuffle is the occurrence count, grouped on
      a 64-bit window signature (``hash_fn``: xxhash64 for
      production, md5_60 for cross-engine oracles, None groups the
      raw window string — exact but shuffles full text). Partial
      aggregation collapses boilerplate map-side, so a window
      repeated 10^9 times ships one partial per task, not 10^9 rows;
    - the window->duplicated-window join is a semi join on the same
      signature (co-partitioned with the count's shuffle output);
    - the interval merge is a per-doc window function — state bounded
      by document length, never by corpus size.

    Granularity caveat (documented, inherent): a run must cover >= k
    consecutive tokens to produce a window, so repeats shorter than k
    tokens are invisible; Lee et al. use 50-token thresholds at web
    scale for the same reason.
    """
    from pyspark.sql import Window as W

    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    wins = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.struct(
                i.alias("pos"),
                F.concat_ws(" ", F.slice(toks, i + 1, k)).alias("win"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,win:string>>"))
    w = (
        docs.select(F.col(id_col), F.explode(wins).alias("w"))
        .select(F.col(id_col), F.col("w.pos").alias("pos"), F.col("w.win").alias("win"))
    )
    sig = shingle_hash("win", hash_fn) if hash_fn else F.col("win")
    w = w.withColumn("sig", sig).drop("win")
    dup_sigs = (
        w.groupBy("sig")
        .agg(F.count(F.lit(1)).alias("occ"))
        .where(F.col("occ") >= min_occurrences)
        .select("sig")
    )
    hits = w.join(dup_sigs, "sig", "left_semi")
    ord_w = W.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        ord_w.rowsBetween(W.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end), 1
    ).otherwise(0)
    segs = hits.withColumn("brk", brk).withColumn(
        "seg", F.sum("brk").over(ord_w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        segs.groupBy(id_col, "seg")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col(id_col),
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start"))
            .cast("int")
            .alias("span_tokens"),
            F.col("n_windows").cast("int").alias("n_windows"),
        )
    )


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 3,
    window: int = 4,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    SIGMOD'03 — the MOSS local fingerprinting algorithm): hash every
    word k-gram at its POSITION, slide a window over ``window``
    consecutive k-gram hashes, keep each window's minimum, and dedupe
    per document. The winnowing guarantee: any shared token run of at
    least window + k - 1 words contributes at least one SHARED
    fingerprint — position-aware local dedup evidence that whole-set
    Jaccard (minhash) and global-vote fingerprints (simhash) both
    lack; the excerpt/quotation detector of the family.

    Documents shorter than ``window`` k-grams fingerprint their global
    minimum (the pos-0 window already spans the whole doc). Returns
    DISTINCT (id_col, fp). hash_fn as in shingle_hash: xxhash64
    production / md5_60 for engine-exact oracles.

    Scale shape: ENTIRELY array-native per document (the cdc_chunks
    rewrite pattern, r5): token/gram/hash arrays materialized once as
    columns, window minima via array_min over slices, per-doc dedup
    via array_distinct — zero shuffles, zero windows; the final
    cross-document DISTINCT is the only exchange. (The original
    posexplode + two-per-doc-window formulation shuffled every gram
    row; same outputs, measured ~an order of magnitude slower on
    long documents.)"""
    toks = F.split(F.col(text_col), r"\s+")
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    tk = F.col("_toks")
    grams = F.when(
        F.size(tk) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - k),
            lambda i: F.concat_ws(" ", F.slice(tk, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", tk)))
    hashed = base.select(
        id_col,
        F.transform(grams, lambda g: shingle_hash(g, hash_fn)).alias(
            "_h"
        ),
    )
    h = F.col("_h")
    fps = F.when(
        F.size(h) >= window,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(h) - window),
                lambda i: F.array_min(F.slice(h, i + 1, window)),
            )
        ),
    ).otherwise(F.array(F.array_min(h)))
    return (
        hashed.select(F.col(id_col), F.explode(fps).alias("fp"))
        .distinct()
    )


def near_duplicates_incremental(
    existing: DataFrame,
    new: DataFrame,
    threshold: float = 0.6,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental near-dup detection — the nightly-crawl-batch shape:
    every near-dup pair involving AT LEAST ONE new document
    (new-vs-existing and new-vs-new), while existing-vs-existing is
    never re-examined. The band join probes FROM the new side only:
    the left input is the new docs' band keys, the right the full
    index, so old×old bucket pairs are structurally impossible rather
    than filtered after the fact — at 10^12 stored documents the
    difference between the two is the whole job. In production the
    right side's signatures are the PERSISTED dedup index (one row
    per doc — the checkpoint/tableio contract); here both sides are
    computed from text so the operator stays self-contained, with one
    localCheckpoint of the union signature table feeding both probe
    sides (the r4 both-sides-recompute rule).

    Same (k, bands) S-curve argument as near_duplicates_minhash: at
    recall 1 for the threshold, output equals brute-force Jaccard
    restricted to pairs with a new member.

    CONTRACT: ``existing`` and ``new`` doc_ids must be disjoint (the
    crawl-batch invariant — new snapshot ids are minted after the
    stored index's). A colliding id would put two rows for one doc_id
    into the signature table and let the new-side semi-join classify
    a stored row as new (ADVICE r04). Enforced with a cheap
    new-side-sized anti-join assertion rather than trusted.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    clash = (
        new.select("doc_id")
        .join(existing.select("doc_id"), "doc_id", "semi")
        .limit(1)
        .count()
    )
    if clash:
        raise ValueError(
            "near_duplicates_incremental: existing and new doc_ids "
            "must be disjoint (crawl-batch contract)"
        )
    all_docs = existing.select("doc_id", "text").unionByName(
        new.select("doc_id", "text")
    )
    sigs = minhash_signatures(
        all_docs, k=k, shingle_n=shingle_n
    ).localCheckpoint()
    banded = _banded(sigs, bands, k)
    probe = banded.join(
        new.select("doc_id"), "doc_id", "semi"
    ).select(F.col("doc_id").alias("doc_n"), "band", "bh")
    cands = (
        probe.join(
            banded.select(F.col("doc_id").alias("doc_o"), "band", "bh"),
            ["band", "bh"],
        )
        .where(F.col("doc_n") != F.col("doc_o"))
        .select(
            F.least("doc_n", "doc_o").alias("doc_a"),
            F.greatest("doc_n", "doc_o").alias("doc_b"),
        )
        .distinct()
    )
    j = exact_jaccard(cands, all_docs, shingle_n)
    return j.where(F.col("jaccard") >= threshold)


def shingle_novelty(
    docs: DataFrame, shingle_n: int = 3
) -> DataFrame:
    """Per-document novelty profile: what fraction of a doc's distinct
    shingles had never appeared in any EARLIER document (doc_id order
    = arrival order)? The dataset-curation dial between 'mostly
    template' (novelty near 0 — boilerplate reprints, mirrors) and
    'fresh content'; cumulative novelty is also the standard
    diminishing-returns curve for deciding when more crawl stops
    buying new text.

    Exact and one-pass: a shingle's FIRST owner is min(doc_id) over
    its postings (one hash aggregate), and a doc's novel count is how
    many of its shingles it owns — no ordered scan, no window, order
    semantics encoded entirely in the min. Returns
    (doc_id, n_shingles, n_novel, novelty [6dp]).
    """
    sh = docs.select(
        F.col("doc_id"),
        F.explode(token_shingles("text", shingle_n)).alias("s"),
    )
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    per = (
        sh.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(
                (F.col("doc_id") == F.col("first_doc")).cast("long")
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias(
            "novelty"
        ),
    )


def batch_novelty(
    existing: DataFrame, new: DataFrame, shingle_n: int = 3
) -> DataFrame:
    """Novelty of a NEW crawl batch against the STORED corpus: per new
    doc, the fraction of its distinct shingles absent from every
    existing document — the acquisition-value score that decides
    whether a source is still worth crawling (the incremental
    companion to shingle_novelty's arrival-order curve, and the
    cheap-first filter to run BEFORE near_duplicates_incremental:
    a batch at ~0 novelty need never reach pairwise verification).

    Shape: existing contributes only its DISTINCT shingle set (one
    map-side-combined aggregate); the new batch's postings left-anti
    semi-join against it (shingle-keyed — no doc pairs ever form),
    then one per-doc rollup. Returns (doc_id, n_shingles, n_unseen,
    novelty [6dp]) for every new doc.
    """
    seen = (
        existing.select(
            F.explode(token_shingles("text", shingle_n)).alias("s")
        )
        .distinct()
    )
    sh = new.select(
        F.col("doc_id"),
        F.explode(token_shingles("text", shingle_n)).alias("s"),
    )
    unseen = sh.join(seen, "s", "left_anti")
    tot = sh.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles")
    )
    nov = unseen.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_unseen")
    )
    return (
        tot.join(nov, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_unseen", F.lit(0)).cast("long").alias(
                "n_unseen"
            ),
            F.round(
                F.coalesce("n_unseen", F.lit(0)) / F.col("n_shingles"), 6
            ).alias("novelty"),
        )
    )


def cdc_chunks(
    docs: DataFrame,
    k: int = 3,
    divisor: int = 8,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking at token granularity — the
    storage-dedup idea (LBFS/Rabin chunking) applied to corpus text:
    a chunk boundary falls BEFORE token t whenever the hash of the
    k-token gram ENDING at t-1 is ≡ 0 (mod divisor). Because the
    boundary decision depends only on local content, an insertion or
    deletion re-chunks ONLY its neighborhood — unlike fixed-size
    chunking, where one shifted token invalidates every later chunk.
    That makes shared chunk hashes a robust shared-passage signal
    across near-identical documents (the syndication/boilerplate
    shape), with expected chunk length ``divisor`` tokens.

    Deterministic and engine-replayable: hash_fn as in shingle_hash
    (xxhash64 production, md5_60 for bit-identical DuckDB oracles).
    Scale shape: ENTIRELY array-native per document — boundary
    positions via one filter over the token index sequence, chunk
    structs sliced straight from the token array (both materialized
    once as columns so nothing re-evaluates per element), then a
    single explode of the finished chunks. Zero shuffles, zero
    windows; the r5 10x probe measured the first explode+window
    formulation at 104 s / 5M tokens and this one at a scan-bound
    fraction of that, both linear. Returns
    (doc_id, chunk_id, chunk_start, chunk_tokens, chunk_hash).
    """
    toks = F.split(F.col(text_col), r"\s+")
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    tk = F.col("_toks")
    bpos = F.filter(
        F.sequence(F.lit(0), F.size(tk) - 1),
        lambda t: (t >= k)
        & (
            F.pmod(
                shingle_hash(
                    F.concat_ws(
                        " ",
                        F.slice(tk, F.greatest(t - k + 1, F.lit(1)), k),
                    ),
                    hash_fn,
                ),
                F.lit(divisor),
            )
            == 0
        ),
    )
    withb = base.select(
        id_col,
        "_toks",
        F.concat(
            F.array(F.lit(0)), bpos, F.array(F.size(tk))
        ).alias("_bounds"),
    )
    b = F.col("_bounds")
    chunk = lambda i: F.struct(  # noqa: E731
        i.cast("long").alias("chunk_id"),
        F.element_at(b, i + 1).cast("int").alias("chunk_start"),
        (F.element_at(b, i + 2) - F.element_at(b, i + 1))
        .cast("long")
        .alias("chunk_tokens"),
        F.concat_ws(
            " ",
            F.slice(
                F.col("_toks"),
                F.element_at(b, i + 1) + 1,
                F.element_at(b, i + 2) - F.element_at(b, i + 1),
            ),
        ).alias("chunk_text"),
    )
    return withb.select(
        F.col(id_col),
        F.explode(
            F.transform(F.sequence(F.lit(0), F.size(b) - 2), chunk)
        ).alias("c"),
    ).select(
        id_col,
        "c.chunk_id",
        "c.chunk_start",
        "c.chunk_tokens",
        shingle_hash(F.col("c.chunk_text"), hash_fn).alias("chunk_hash"),
    )


def cdc_shared_passages_incremental(
    existing: DataFrame,
    new: DataFrame,
    k: int = 3,
    divisor: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Incremental shared-passage detection over CDC chunks — the
    nightly-batch form of the cdc_chunks report: every document pair
    sharing at least one chunk hash where AT LEAST ONE side is new
    (new-vs-existing and new-vs-new), while existing-vs-existing is
    never generated. The probe side is the NEW docs' distinct chunk
    hashes only, joined against the full chunk index — in production
    the right side is the PERSISTED chunk index (the cheap table CDC
    chunking exists to maintain: chunking itself is a narrow map, so
    the nightly cost is one |new|-sided hash join), and because the
    boundaries are content-defined, a near-copy of a stored document
    shares its unedited chunks verbatim no matter how its edits
    shifted the token positions.

    CONTRACT: disjoint doc_ids between sides (the
    near_duplicates_incremental crawl-batch invariant, enforced the
    same way). Returns (doc_a, doc_b, n_shared_chunks, shared_tokens)
    with doc_a < doc_b, one row per pair, counting each shared chunk
    HASH once per pair with its token length."""
    clash = (
        new.select("doc_id")
        .join(existing.select("doc_id"), "doc_id", "semi")
        .limit(1)
        .count()
    )
    if clash:
        raise ValueError(
            "cdc_shared_passages_incremental: existing and new doc_ids "
            "must be disjoint (crawl-batch contract)"
        )
    all_docs = existing.select("doc_id", "text").unionByName(
        new.select("doc_id", "text")
    )
    ch = (
        cdc_chunks(all_docs, k=k, divisor=divisor, hash_fn=hash_fn)
        .select("doc_id", "chunk_hash", "chunk_tokens")
        .distinct()
        .localCheckpoint()  # index re-referenced by both probe sides
    )
    probe = ch.join(new.select("doc_id"), "doc_id", "semi").select(
        F.col("doc_id").alias("doc_n"),
        "chunk_hash",
        "chunk_tokens",
    )
    return (
        probe.join(
            ch.select(F.col("doc_id").alias("doc_o"), "chunk_hash"),
            "chunk_hash",
        )
        .where(F.col("doc_n") != F.col("doc_o"))
        .select(
            F.least("doc_n", "doc_o").alias("doc_a"),
            F.greatest("doc_n", "doc_o").alias("doc_b"),
            "chunk_hash",
            "chunk_tokens",
        )
        .distinct()
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_chunks"),
            F.sum("chunk_tokens").cast("long").alias("shared_tokens"),
        )
    )
