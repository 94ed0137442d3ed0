"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All pure JVM
column expressions (codegen; no UDFs) so they run at scan speed and are
exactly reproducible in the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker vocabularies for the n-gram/markers language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "es": ["el", "la", "que", "de", "los"],
    "fr": ["le", "la", "et", "les", "des"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "on", "at", "for", "with"]

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"

FP_MOD = 1_000_000_007


def tokens_col(text_col: str = "text") -> F.Column:
    """THE whitespace-token contract for text columns. Java's (and so
    Spark's) ASCII ``\\s`` is exactly ``[ \\t\\n\\x0B\\f\\r]``; the
    paired DuckDB oracles spell that class out explicitly
    (``regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')``) because
    RE2's ``\\s`` lacks ``\\x0B`` — single-space ``string_split`` is
    NOT parity-safe on multi-whitespace text (advice r03)."""
    return F.split(F.col(text_col), r"\s+")


def bpe_token_count(text_col: str = "text") -> F.Column:
    """BPE-ish token count of a text column — THE tokenizer-count
    contract shared by token_counts, pack_sequences and
    token_budget_mix (one definition, one thing for the SQL oracles'
    hardcoded regex to stay in lockstep with)."""
    return F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
    )


def lang_scores(text_col: str = "text") -> list[tuple[str, F.Column]]:
    toks = tokens_col(text_col)
    out = []
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(
            F.filter(toks, lambda t: F.array_contains(marker_arr, t))
        )
        out.append((lang, score))
    return out


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, score): argmax marker-hit count; ties break
    to the alphabetically-first language; zero hits → 'und'."""
    scores = lang_scores(text_col)
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in sorted(scores, reverse=True):  # reverse → earliest wins last
        pred = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(pred)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("pred_lang"),
        best.cast("int").alias("marker_hits"),
    )


def quality_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Document-quality features + combined score: length, token stats,
    punctuation ratio, stopword ratio."""
    toks = tokens_col(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9 \t\n\x0B\f\r]", ""))
    avg_tok = n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double")
    stop_ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double")
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    quality = F.round(
        F.lit(0.4) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.4) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.2) * F.least(n_tokens.cast("double") / 50.0, F.lit(1.0)),
        6,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        quality.alias("quality"),
    )


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text_col)).alias("ws_tokens"),
        bpe_token_count(text_col).alias("bpe_tokens"),
    )


def _word_ngrams(toks: F.Column, n: int) -> F.Column:
    """Word n-grams of a token array as space-joined strings; empty
    array when the document has fewer than n tokens (F.sequence would
    otherwise count DOWN from 1 and fabricate grams)."""
    starts = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - top_ngram_frac: occurrences of the single most frequent word
      n-gram / total n-gram occurrences (boilerplate and SEO spam push
      this up),
    - dup_ngram_frac: fraction of n-gram occurrences whose n-gram
      appears >= 2 times in the document,
    - distinct_token_ratio: |distinct tokens| / |tokens| (low = loops).

    Documents shorter than n tokens report 0 for both n-gram fractions.

    Scale: the n-gram mode is computed relationally — explode to
    (doc_id, gram), two hash aggregations keyed by (doc_id, gram) then
    doc_id — so per-row cost is linear in document length (no O(d^2)
    in-row mode search) and both aggregations partial-combine map-side.
    The distinct-token ratio never leaves the row (codegen).
    """
    toks = tokens_col(text_col)
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_word_ngrams(toks, n)).alias("gram"),
    )
    per_gram = grams.where(F.col("gram").isNotNull()).groupBy("doc_id", "gram").agg(
        F.count("*").alias("cnt")
    )
    per_doc = per_gram.groupBy("doc_id").agg(
        F.max("cnt").alias("top_cnt"),
        F.sum("cnt").alias("total_grams"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(0)).alias("dup_cnt"),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )
    j = base.join(per_doc, "doc_id", "left")
    total = F.coalesce(F.col("total_grams"), F.lit(0)).cast("double")
    return j.select(
        "doc_id",
        F.round(
            F.when(total > 0, F.col("top_cnt").cast("double") / total).otherwise(0.0),
            6,
        ).alias("top_ngram_frac"),
        F.round(
            F.when(total > 0, F.col("dup_cnt").cast("double") / total).otherwise(0.0),
            6,
        ).alias("dup_ngram_frac"),
        F.round(
            F.col("n_distinct").cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
            6,
        ).alias("distinct_token_ratio"),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranking of the corpus against a bag of query terms, fully
    relationally (Robertson/Sparck-Jones with the Lucene idf variant
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``):

        score(d, Q) = sum_{t in Q} idf(t) * tf * (k1+1)
                      / (tf + k1 * (1 - b + b * dl/avgdl))

    Returns (doc_id, bm25) for documents matching >= 1 term.

    Scale: one explode feeding two hash aggregations (doc length and
    per-(doc, term) tf — the term filter is pushed below the tf agg,
    so only query-term postings shuffle); corpus stats (N, avgdl) and
    per-term df are tiny and broadcast. No UDF, no driver collect.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("tok"),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.where(F.col("tok").isin(list(query_terms)))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + k1 * (
        1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl")
    )
    return (
        tf.join(F.broadcast(dfq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * tf_d * (k1 + 1.0) / denom).alias("contrib"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
    )


def pmi_bigrams(
    docs: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level PMI collocations (Church & Hanks 1990): for every
    adjacent token bigram with corpus count ≥ ``min_count``,

        pmi(x, y) = ln( p(x,y) / (p(x)·p(y)) )

    with p(x,y) over total bigram occurrences and p(x), p(y) over
    total token occurrences — the standard collocation / multi-word-
    expression miner (tokenizer-vocab prep, boilerplate-phrase
    discovery) next to ``vocab_topk``.

    Returns (w1, w2, n_pair, pmi), pmi rounded to the house 1e-6.

    Scale: two hash aggregations (bigram counts, unigram counts) over
    one pass of the corpus, then the vocab-sized unigram table joins
    onto the bigram table by word — AQE broadcasts it when the vocab
    is small, and a shuffle join on the word key stays balanced
    otherwise because ``min_count`` prunes the bigram tail first. The
    probability ratio is composed in double in a fixed operation
    order, mirrored exactly by the oracle SQL."""
    toks = docs.select(tokens_col(text_col).alias("l"))
    pair_structs = F.when(
        F.size("l") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("l") - 1),
            lambda i: F.struct(
                F.element_at(F.col("l"), i).alias("w1"),
                F.element_at(F.col("l"), i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = toks.select(F.explode(pair_structs).alias("p")).select(
        "p.w1", "p.w2"
    )
    uni = toks.select(F.explode("l").alias("w"))
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    c1 = uni.groupBy("w").agg(F.count("*").alias("cw"))
    totals = c1.agg(F.sum("cw").alias("n_uni"))
    n_bi = c12.agg(F.sum("n_pair").alias("n_bi"))
    pxy = F.col("n_pair").cast("double") / F.col("n_bi").cast("double")
    px = F.col("c_w1").cast("double") / F.col("n_uni").cast("double")
    py = F.col("c_w2").cast("double") / F.col("n_uni").cast("double")
    return (
        c12.where(F.col("n_pair") >= min_count)
        .join(c1.select(F.col("w").alias("w1"), F.col("cw").alias("c_w1")), "w1")
        .join(c1.select(F.col("w").alias("w2"), F.col("cw").alias("c_w2")), "w2")
        .crossJoin(F.broadcast(n_bi))
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(F.log(pxy / (px * py)), 6).alias("pmi"),
        )
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase retrieval via a positional inverted index — the
    relational form of Lucene's phrase query: (doc, term, position)
    postings, one inner join per phrase term aligning positions
    (term_i at base position + i), then a per-doc match count.

    Returns (doc_id, n_matches) for documents containing the phrase
    at least once (overlapping occurrences each count).

    Scale: the ``tok = term_i`` filters sit directly on the exploded
    postings — only the phrase terms' postings ever shuffle (the same
    pushdown shape as ``bm25_scores``). Every join keys on
    (doc_id, base_pos), so after the first exchange the remaining
    joins reuse the same partitioning (one Exchange, chained
    sort-merge/hash joins on identical keys)."""
    terms = phrase.split(" ")
    if not terms or any(not t for t in terms):
        raise ValueError(f"phrase must be non-empty space-separated tokens: {phrase!r}")
    postings = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "tok"),
    )
    matched = postings.where(F.col("tok") == terms[0]).select(
        "doc_id", F.col("pos").alias("base_pos")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = postings.where(F.col("tok") == t).select(
            "doc_id", (F.col("pos") - i).alias("base_pos")
        )
        matched = matched.join(nxt, ["doc_id", "base_pos"])
    return matched.groupBy("doc_id").agg(F.count("*").alias("n_matches"))


def fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Rolling polynomial token fingerprint:
    fold(tokens, 0, (acc, t) -> (acc*31 + len(t)*7 + ascii(t[0])) % M).
    Order-sensitive (unlike a bag-of-words hash) and reproducible in
    ANSI SQL (DuckDB list_reduce)."""
    fp = F.aggregate(
        tokens_col(text_col),
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * 31
            + F.length(t).cast("long") * 7
            + F.coalesce(F.ascii(F.substring(t, 1, 1)).cast("long"), F.lit(0)),
            F.lit(FP_MOD),
        ),
    )
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))


def vocab_topk(
    docs: DataFrame,
    k: int = 500,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary builder — the tokenizer-training prep step:
    global term frequency + document frequency per BPE-ish token, a
    document-frequency cut (hapax/noise removal), and a deterministic
    global top-K by (tf desc, token asc).

    Scale: explode → ONE partial-aggregated hash agg keyed on the
    token computing tf=count(*) and df=count(distinct doc) together
    (distinct-by-doc rides a first-level (token, doc) pre-aggregation
    so a corpus-wide stopword never concentrates rows in one task);
    the top-K is orderBy+limit = TakeOrdered (parallel per-partition
    partial top-K), never a single-partition global sort. The rank
    window runs over the k survivors only."""
    toks = docs.select(
        F.col(id_col).alias("d"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
        ).alias("token"),
    )
    # (token, doc) pre-agg: tf partial per doc, df becomes a plain count
    per_doc = toks.groupBy("token", "d").agg(F.count("*").alias("c"))
    stats = per_doc.groupBy("token").agg(
        F.sum("c").cast("long").alias("tf"), F.count("*").alias("df")
    )
    top = (
        stats.where(F.col("df") >= min_df)
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("tf").desc(), F.col("token").asc())
    return top.select(
        "token", "tf", "df", F.row_number().over(w).alias("rank")
    )


def token_entropy(
    docs: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Shannon entropy of the token distribution per group — the
    vocabulary-diversity quality signal (a boilerplate/spam slice
    shows low entropy; a natural-language slice sits near the Zipf
    expectation). Computed from exact integer counts via
    H = ln(N) − (Σ c·ln c)/N (nats), plus entropy normalized by the
    max ln(vocab) — two hash aggregations, partial-agg shuffles, no
    UDFs. Degenerate single-token vocab → norm_entropy 0."""
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens_col(text_col)).alias("t"),
    )
    counts = toks.groupBy("grp", "t").agg(F.count("*").alias("c"))
    n = F.sum("c")
    vocab = F.count("*")
    ent = F.log(n) - F.sum(F.col("c") * F.log("c")) / n
    return counts.groupBy("grp").agg(
        n.alias("n_tokens"),
        vocab.alias("vocab"),
        F.round(ent, 6).alias("entropy"),
        F.round(
            F.when(vocab > 1, ent / F.log(vocab)).otherwise(F.lit(0.0)), 6
        ).alias("norm_entropy"),
    ).select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "vocab",
        "entropy",
        "norm_entropy",
    )


def host_health(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-host corpus-health scorecard — the crawl-triage view a
    web-corpus team reads before spending dedup/quality budget on a
    host (CCNet/RefinedWeb-style per-domain curation, applied at the
    host rollup): document volume, exact-duplicate rate (md5 text
    fingerprints), mean document size, and the language-mix entropy
    that separates single-language content hosts from mixed-boiler
    aggregators.

    Returns one row per host: (host, n_docs, n_unique_docs, dup_rate,
    avg_chars, n_langs, lang_entropy) with entropy in nats over the
    host's language distribution (ln(N) - sum(c ln c)/N — the repo's
    token-entropy convention), dup_rate = 1 - unique/docs, both
    rounded to 6.

    Shape: two host-keyed hash aggregates (one through a
    (host, fingerprint) pre-aggregate for the dup stats + exact
    distinct, one through (host, lang) for the entropy) joined on
    host — all map-side-combinable, no window, no UDF; hosts are the
    natural shuffle key and a viral host only widens ONE reduce
    group's value list, never a sort."""
    fp = (
        docs.groupBy(
            F.col(host_col).alias("host"), F.md5(F.col(text_col)).alias("fp")
        )
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum(chars_col).cast("long").alias("chars_sum"),
        )
    )
    # NULL-text documents (fetch failures, extraction gaps) all land in
    # the fp-IS-NULL group; counting that group as ONE unique doc would
    # call them duplicates of each other and inflate dup_rate past a
    # curation cut. They were never compared equal to anything, so each
    # counts as its own unique document (code-review r04).
    base = fp.groupBy("host").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        (
            F.count(F.when(F.col("fp").isNotNull(), True))
            + F.coalesce(
                F.sum(F.when(F.col("fp").isNull(), F.col("cnt"))), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_unique_docs"),
        F.sum("chars_sum").cast("long").alias("_chars_sum"),
    )
    lang = (
        docs.groupBy(
            F.col(host_col).alias("host"), F.col(lang_col).alias("lang")
        )
        .agg(F.count("*").cast("long").alias("c"))
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_langs"),
            F.round(
                F.log(F.sum("c"))
                - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
                6,
            ).alias("lang_entropy"),
        )
    )
    return (
        base.join(lang, "host")
        .select(
            "host",
            "n_docs",
            "n_unique_docs",
            F.round(
                F.lit(1.0) - F.col("n_unique_docs") / F.col("n_docs"), 6
            ).alias("dup_rate"),
            F.round(F.col("_chars_sum") / F.col("n_docs"), 6).alias(
                "avg_chars"
            ),
            "n_langs",
            "lang_entropy",
        )
    )


def template_shingles(
    docs: DataFrame,
    key_col: str = "source",
    min_frac: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-group boilerplate detection: shingles appearing in at
    least ``min_frac`` of a group's documents — the per-host
    template/chrome signal (nav bars, footers, cookie banners repeat
    on most of a HOST's pages while staying rare corpus-wide, which
    is why the global DF-cut alone misses them). The output is the
    removal list a host-aware boilerplate stripper consumes.

    Shape: distinct (group, doc, shingle) postings → one (group,
    shingle) doc-frequency aggregate + one group-size aggregate,
    joined and filtered; everything partial-aggregates map-side, and
    the result is bounded by the template shingles themselves (the
    filter is pushed before the join output).

    Returns (key, shingle, df, n_docs, frac [6dp]) for
    frac >= min_frac.
    """
    from .dedup import token_shingles as _shingles

    sh = docs.select(
        F.col(key_col).alias("key"),
        "doc_id",
        F.explode(_shingles("text", shingle_n)).alias("shingle"),
    )
    df_ = sh.groupBy("key", "shingle").agg(
        F.count("*").cast("long").alias("df")
    )
    sizes = docs.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    frac = F.round(F.col("df") / F.col("n_docs"), 6)
    return (
        df_.join(F.broadcast(sizes), "key")
        .select("key", "shingle", "df", "n_docs", frac.alias("frac"))
        .where(F.col("frac") >= min_frac)
    )


def doc_keywords(
    docs: DataFrame, top_k: int = 3
) -> DataFrame:
    """Per-document TF-IDF keywords: the top-k terms that distinguish
    each doc from the corpus — the labeling/routing primitive behind
    search snippets, topic routing, and weak-label generation (the
    per-DOC counterpart of source_keywords' per-source labels).

    tf = the term's count in the doc; idf = ln(N / df) with df = the
    number of docs containing the term (no smoothing — a term in
    every doc scores exactly 0 and can never be a keyword, which is
    the desired boilerplate behavior). Ranking is (tfidf DESC, term
    ASC), rounded to 1e-6 — the ln and the division replay exactly in
    the oracle as double arithmetic.

    Shape: one token explode → (doc, term) counts (map-side partial),
    one term-keyed df aggregate joined back, then a per-doc top-k
    window over that doc's distinct terms only. Returns
    (doc_id, term, tf, df, tfidf, rank) for rank <= top_k.
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    n = docs.count()
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= top_k)


def readability(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease per document with fully deterministic
    sub-counts — the curation quality dial between 'grade-school
    prose' and 'legalese/spam wall' that length/punctuation ratios
    (quality_score) don't capture. Heuristics chosen for ENGINE
    PARITY, not linguistics (same contract as lang_id's n-gram rule):

    - sentences: count of ``[.!?]+`` separator runs, floor 1 (an
      unterminated trailing fragment joins the last sentence);
    - words: whitespace tokens containing at least one alphanumeric;
    - syllables: per word, count of ``[aeiouy]+`` vowel groups in the
      lowercased word, floor 1 (the standard vowel-cluster
      approximation; no silent-e rule — it is not expressible
      identically in every regex engine).

    flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    words), rounded to 6dp; both engines evaluate the same arithmetic
    on the same exact integers, so the oracle is bit-identical. Zero
    UDFs, zero shuffles — a pure narrow projection (higher-order
    functions over the token array), scan-speed at any corpus size.
    Docs with no words report NULL flesch rather than a division
    artifact. Returns (doc_id, n_sentences, n_words, n_syllables,
    flesch)."""
    words = F.filter(
        tokens_col(text_col), lambda w: w.rlike("[A-Za-z0-9]")
    )
    n_words = F.size(words)
    n_sent = F.greatest(
        F.lit(1), F.regexp_count(F.col(text_col), F.lit(r"[.!?]+"))
    )
    n_syll = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(
                F.lit(1), F.regexp_count(F.lower(w), F.lit("[aeiouy]+"))
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return docs.select(
        F.col(id_col),
        n_sent.cast("long").alias("n_sentences"),
        n_words.cast("long").alias("n_words"),
        n_syll.cast("long").alias("n_syllables"),
        F.when(
            n_words > 0,
            F.round(
                F.lit(206.835)
                - F.lit(1.015)
                * (n_words.cast("double") / n_sent.cast("double"))
                - F.lit(84.6)
                * (n_syll.cast("double") / n_words.cast("double")),
                6,
            ),
        ).alias("flesch"),
    )
