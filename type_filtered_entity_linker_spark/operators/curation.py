"""Corpus-curation operators for training-data pipelines: deterministic
train/val/test splits, per-stratum sampling, per-domain caps and PII
redaction. Everything is pure JVM column expressions (codegen, no
UDFs) so the ops run at scan speed, and every randomness source is a
cross-engine-reproducible hash (the md5→60-bit-int idiom shared with
``dedup.simhash64(hash_fn='md5_60')``) so each op has an exact DuckDB
oracle.

Why hash-based instead of ``df.sample``/``sampleBy``: Spark's samplers
are seeded per-partition, so the selected rows change whenever the
partitioning changes — repartition the corpus and your "fixed" eval
split silently rotates. Keying the decision on a content hash makes
splits/samples a pure function of the ROW, stable across partitioning,
cluster size, engine version, and resumable reruns — the property a
training pipeline actually needs from a split (and the reason every
row lands in exactly one split by construction).

Scale notes (10^12 docs): split/sample/redact are narrow, shuffle-free
map stages. ``domain_cap`` is one shuffle on the domain key + a
per-key window sort; a head domain (say 10^8 docs of one host) makes
that one task's sort huge, so the operator takes a ``two_phase``
switch — the classic salted top-k-per-key: phase 1 ranks within
(domain, salt-of-row) so the head domain's sort splits across
``n_salts`` tasks, phase 2 ranks the ≤ k·n_salts survivors per
domain. Exact by construction (a global top-k row is top-k within
its own salt bucket — pruning a non-survivor can never evict it), no
sketch, no verification pass needed. See ``domain_cap``'s plan note
for how this composes with Catalyst's own WindowGroupLimit partial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# split/sample decisions use integer buckets in [0, SPLIT_BUCKETS) so
# fraction thresholds are exact integers — no float rounding to
# diverge between engines
SPLIT_BUCKETS = 10_000

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# separators spelled EXPLICITLY ([ \t]), never \s: the \s class is
# engine-specific (Java includes \x0B, RE2/DuckDB excludes it, Python
# adds unicode spaces like \xa0), so a \s here would silently break
# the oracle parity this module promises (code-review r03)
PHONE_RE = r"\+?[0-9][0-9\- \t()]{7,}[0-9]"


def bucket(key: F.Column, salt: str) -> F.Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS): first 60 bits of
    md5(salt ':' key) mod SPLIT_BUCKETS. md5 is bit-identical in every
    engine (``dedup.shingle_hash(..., 'md5_60')`` is the ONE canonical
    implementation of the idiom — every oracle replays it), so the
    assignment — unlike ``df.sample``'s partition-seeded RNG — never
    moves when the data is repartitioned or re-read."""
    from .dedup import shingle_hash

    h = shingle_hash(
        F.concat(F.lit(salt + ":"), key.cast("string")), "md5_60"
    )
    return h % SPLIT_BUCKETS


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bucket) cumulative thresholds; the last
    split absorbs any rounding remainder so every bucket is owned."""
    total = sum(weights.values())
    out: list[tuple[str, int]] = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        out.append((name, round(acc * SPLIT_BUCKETS)))
    out.append((names[-1], SPLIT_BUCKETS))
    return out


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """+ ``split`` column: every row assigned to exactly one named
    split with the given weight proportions, as a pure function of
    ``key_col`` (train/val/test membership survives repartitioning,
    reruns and engine changes). Narrow op — no shuffle."""
    b = bucket(F.col(key_col), salt)
    expr = None
    for name, hi in split_thresholds(weights):
        expr = (
            F.when(b < hi, F.lit(name))
            if expr is None
            else expr.when(b < hi, F.lit(name))
        )
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ``fractions[stratum]`` share of each
    stratum (Spark ``sampleBy`` semantics, but partition-stable):
    row kept iff bucket(key) < frac·SPLIT_BUCKETS. Strata absent from
    ``fractions`` are dropped. Narrow op — no shuffle; the fractions
    map rides the plan as a literal CASE, no join needed."""
    b = bucket(F.col(key_col), salt)
    cut = None
    for stratum, frac in sorted(fractions.items()):
        hi = F.lit(round(frac * SPLIT_BUCKETS))
        cond = F.col(strata_col) == stratum
        cut = F.when(cond, hi) if cut is None else cut.when(cond, hi)
    cut = cut.otherwise(F.lit(0))
    return df.where(b < cut)


def domain_cap(
    docs: DataFrame,
    domain_col: str = "source",
    k: int = 5,
    order_cols: list[str] | None = None,
    two_phase: bool = False,
    n_salts: int = 32,
) -> DataFrame:
    """At most ``k`` docs per domain, best-first by ``order_cols``
    (default: longest text, then lowest doc_id — a deterministic total
    order). The common-crawl "domain cap" curation step: stops head
    hosts from dominating the training mix. Output keeps the input
    columns + ``rank_in_domain`` (1-based).

    ``two_phase=True`` is the head-domain scale path (see module
    docstring): phase 1 ranks within ``(domain, xxhash64(tiebreak) %
    n_salts)`` and keeps each bucket's top k; phase 2 ranks the
    ≤ k·n_salts survivors per domain exactly. Provably identical to
    the single-window answer: every global top-k row is top-k inside
    its own salt bucket, so phase 1 never drops one.

    Plan note (`.explain`): Catalyst's WindowGroupLimit already adds a
    map-side PARTIAL top-k before the shuffle for `row_number() <= k`,
    so even the plain path ships at most k rows per (domain, map task).
    What the partial limit does NOT split is the FINAL per-domain
    rank: with M map tasks the cap domain still sorts up to k·M rows
    in one task (k=100, M=10^5 → 10^7 rows). ``two_phase`` divides
    exactly that residual hot task by ``n_salts``."""
    order_cols = order_cols or ["n_chars", "doc_id"]
    ordering = [F.col(order_cols[0]).desc()] + [
        F.col(c).asc() for c in order_cols[1:]
    ]
    in_cols = docs.columns
    if two_phase:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salts)
        )
        w1 = Window.partitionBy(F.col(domain_col), salt).orderBy(*ordering)
        docs = (
            docs.withColumn("_r1", F.row_number().over(w1))
            .where(F.col("_r1") <= k)
            .select(*in_cols)
        )
    w = Window.partitionBy(domain_col).orderBy(*ordering)
    return (
        docs.withColumn("rank_in_domain", F.row_number().over(w))
        .where(F.col("rank_in_domain") <= k)
    )


# query-string parameters that never affect page identity: analytics
# attribution junk a crawl-dedup must ignore (utm_* per Google's
# attribution spec, fbclid/gclid click ids)
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonical_url_cols(url: F.Column) -> dict[str, F.Column]:
    """Column expressions for crawl URL canonicalization — the key a
    web-scale URL-level dedup groups on. Rules (each a documented,
    reversible-in-review choice, not a guess):

    - scheme and host lowercased (RFC 3986 §6.2.2.1 case norm);
    - leading ``www.`` stripped from the host;
    - default ports dropped (``:443`` for https, ``:80`` for http);
    - fragment dropped (never sent to the server);
    - tracking params (``utm_*``, ``fbclid``, ``gclid``) removed and
      the survivors SORTED so param order can't split a page into two
      keys; empty query drops the ``?``;
    - empty path becomes ``/``.

    Pure column expressions (codegen, no UDF), exactly replicated in
    the DuckDB oracle. ``registered_domain`` is the last two host
    labels — a public-suffix-list lookup (``co.uk``) would need a
    broadcast-joined suffix table, noted not shipped."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host_nowww = F.regexp_replace(hostport, r"^www\.", "")
    # only the scheme's OWN default port is dropped; :8080 etc. survive
    host = (
        F.when(scheme == "https", F.regexp_replace(host_nowww, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(host_nowww, r":80$", ""))
        .otherwise(host_nowww)
    )
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qparts = F.split(F.regexp_extract(url, _QUERY_RE, 1), "&")
    kept = F.array_sort(
        F.filter(
            qparts,
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("fbclid")
            & ~p.startswith("gclid"),
        )
    )
    query = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    canonical = F.concat(scheme, F.lit("://"), host, path, query)
    # port already stripped for default schemes; drop any :port from
    # the domain labels so e.g. host 'x.com:8080' registers as 'x.com'
    bare = F.regexp_replace(host, r":[0-9]+$", "")
    labels = F.split(bare, r"\.")
    registered = F.array_join(
        F.slice(labels, F.greatest(F.size(labels) - 1, F.lit(1)), 2), "."
    )
    return {"canonical_url": canonical, "registered_domain": registered}


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Attach ``canonical_url`` + ``registered_domain`` and rank each
    row within its canonical-URL group (``dup_rank`` 1 = the kept
    representative, lowest id wins — deterministic). One shuffle on the
    canonical key; recrawl-heavy hot URLs are bounded by crawl dedup
    upstream, and the window is a top-1-per-key shape Catalyst rewrites
    to a partial WindowGroupLimit (no full per-key sort materialized)."""
    cols = canonical_url_cols(F.col(url_col))
    out = df.withColumn("canonical_url", cols["canonical_url"]).withColumn(
        "registered_domain", cols["registered_domain"]
    )
    w = Window.partitionBy("canonical_url").orderBy(id_col)
    return out.withColumn("dup_rank", F.row_number().over(w))


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails / phone-number shapes with placeholder tokens
    and count what was redacted. Patterns are deliberately restricted
    to the regex subset with identical semantics in Java regex and
    RE2 (no backrefs/lookaround), so the DuckDB oracle replays them
    verbatim. Columns added: ``n_emails``, ``n_phones``,
    ``text_redacted``. Phone matching runs on the email-redacted
    text so the two counts never overlap on the same characters."""
    t = F.col(text_col)
    emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    red1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    phones = F.size(F.regexp_extract_all(red1, F.lit(PHONE_RE), F.lit(0)))
    red2 = F.regexp_replace(red1, PHONE_RE, "<PHONE>")
    return (
        df.withColumn("n_emails", emails)
        .withColumn("n_phones", phones)
        .withColumn("text_redacted", red2)
    )


def decontaminate(
    docs: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Eval-set decontamination: flag training docs sharing any token
    ``n``-gram with an evaluation set (the GPT-3/PaLM 13-gram-overlap
    rule; the reference pipeline has no equivalent — this is part of
    the training-data mandate). Output per doc: ``n_grams`` (distinct
    grams in the doc), ``n_contaminated`` (grams also in the eval
    set), ``contaminated`` (1 iff n_contaminated ≥ min_hits).

    Plan shape at 10^12 docs: the eval side is small by nature
    (benchmarks are ~10^5 docs), so its distinct gram set broadcasts;
    the corpus side is explode → broadcast semi-probe → partial-agg
    count back to one row per doc — ONE shuffle, on doc_id, carrying
    two ints per gram hit, never the gram strings of clean docs.
    Docs shorter than ``n`` tokens fall back to a whole-doc gram
    (same convention as ``dedup.token_shingles``), so a verbatim
    short eval prompt is still caught."""
    from .dedup import token_shingles

    grams = docs.select(
        F.col(id_col), F.explode(token_shingles(text_col, n)).alias("gram")
    )
    eval_grams = (
        eval_set.select(F.explode(token_shingles(text_col, n)).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_doc = grams.join(F.broadcast(eval_grams), "gram", "left").groupBy(
        id_col
    ).agg(
        F.count("*").alias("n_grams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
    )
    return per_doc.withColumn(
        "contaminated",
        (F.col("n_contaminated") >= min_hits).cast("int"),
    )


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 512,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the step between a curated
    corpus and tokenized training shards: documents are concatenated
    per output shard (bucket) and cut into fixed ``ctx_len`` token
    windows; every doc learns which contexts it lands in.

    Contract: packing order is (bucket, doc_id) — DETERMINISTIC PER
    SHARD, not global (real packers pack per output shard for exactly
    this reason: a global order is one giant sequential fill, per-shard
    order is embarrassingly parallel and just as reproducible). The
    bucket is a modulo of the id here; a production pipeline would use
    the hash-stable ``bucket()`` above.

    Output per doc: (doc_id, bucket, start_tok, end_tok exclusive,
    pack_first, pack_last) where packs are ``ctx_len``-token windows of
    the bucket's concatenated token stream — a doc spans
    ``pack_last - pack_first + 1`` contexts (boundary docs straddle).

    Scale: one shuffle on the bucket + a per-bucket window cumsum
    (running sum is O(1) state, streams partition-sorted rows);
    bucket count bounds the partition sort. Token counts ride the
    BPE-ish regex tokenizer (textstats) — scan-speed, no UDF."""
    from .textstats import bpe_token_count

    d = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_buckets).alias("bucket"),
        bpe_token_count(text_col).alias("n_tok"),
    ).where(F.col("n_tok") > 0)
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("end_tok", F.sum("n_tok").over(w))
    # integer `div`, not floor(double /): a double quotient loses
    # exactness once a bucket's running total passes ~2^52 — the
    # "integer arithmetic end to end" contract must hold at the
    # 10^12-doc scale this module advertises (code-review r03)
    return d.select(
        F.col(id_col),
        "bucket",
        (F.col("end_tok") - F.col("n_tok")).alias("start_tok"),
        "end_tok",
        F.expr(f"(end_tok - n_tok) div {ctx_len}").alias("pack_first"),
        F.expr(f"(end_tok - 1) div {ctx_len}").alias("pack_last"),
    )


def token_budget_mix(
    docs: DataFrame,
    weights: dict[str, int],
    budget_pct: int = 50,
    n_buckets: int = 16,
    strat_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize a training data MIXTURE: each stratum (language /
    source) gets a token budget = ``weights[stratum]``% of
    (``budget_pct``% of the eligible corpus tokens), filled in
    deterministic md5 order until the budget is hit — the step that
    turns a data-mixing recipe ("50% en, 20% de, ...") into an actual
    document selection.

    Everything is INTEGER arithmetic (weights and budget in percent,
    one ``div``) so the selection is bit-reproducible in any engine —
    no float thresholds to drift.

    Scale: the per-stratum fill is sub-bucketed by a content hash and
    each (stratum, bucket) gets budget/n_buckets — fills run as
    n_buckets parallel windows per stratum instead of one giant
    sequential cumsum (the same reasoning as ``pack_sequences``'
    per-shard contract; hash uniformity makes per-bucket fills
    statistically identical to the global fill). The corpus total is
    a 1-row aggregate broadcast back via crossJoin — never collected.

    Output: every eligible doc with (stratum, n_tok, selected 0/1);
    docs in strata outside the recipe are excluded (weight 0 ≡ absent).
    A doc straddling the budget boundary is selected iff it STARTS
    inside the budget (first-fit; matches pack_sequences' boundary
    rule)."""
    from .dedup import shingle_hash
    from .textstats import bpe_token_count

    toks = bpe_token_count(text_col)
    h = shingle_hash(
        F.concat(F.lit("mix:"), F.col(id_col).cast("string")), "md5_60"
    )
    pct = F.lit(None).cast("long")
    for name, w in weights.items():
        pct = F.when(F.col(strat_col) == name, F.lit(w)).otherwise(pct)
    d = (
        docs.select(
            F.col(id_col),
            F.col(strat_col),
            toks.alias("n_tok"),
            h.alias("h"),
            pct.alias("pct"),
        )
        .where(F.col("n_tok") > 0)
        .where(F.col("pct").isNotNull())
        .withColumn("bucket", F.col("h") % n_buckets)
    )
    total = d.agg(F.sum("n_tok").cast("long").alias("total_tok"))
    w_fill = (
        Window.partitionBy(strat_col, "bucket")
        .orderBy(F.col("h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("end_tok", F.sum("n_tok").over(w_fill)).crossJoin(
        F.broadcast(total)
    )
    budget = F.expr(
        f"(total_tok * pct * {budget_pct}) div {10000 * n_buckets}"
    )
    return d.select(
        F.col(id_col),
        F.col(strat_col),
        "n_tok",
        ((F.col("end_tok") - F.col("n_tok")) < budget)
        .cast("int")
        .alias("selected"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-snapshot diff — the incremental-ingest primitive: which
    pages were added / removed / changed / unchanged between two crawl
    snapshots (drives re-extraction of only the changed slice instead
    of reprocessing 100 TB).

    One full-outer shuffle join on the id comparing content digests
    (md5 — cross-engine, and at scale you diff digests, never text
    bytes: 32 hex chars ship instead of 10 KB bodies).

    Presence is carried as explicit flags, NOT inferred from digest
    nullness: md5(NULL text) is NULL, so a digest-null presence test
    would misreport a doc whose text is NULL on one side as
    added/removed (code-review r03). The digest compare itself is
    null-safe (NULL text ≠ non-NULL text → changed)."""
    o = old.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("h_old"),
        F.lit(1).alias("in_old"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("h_new"),
        F.lit(1).alias("in_new"),
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("h_old").eqNullSafe(F.col("h_new")), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def scd2_intervals(
    snapshots: DataFrame,
    id_col: str = "doc_id",
    version_col: str = "snap_ver",
    text_col: str = "text",
) -> DataFrame:
    """Fold a stack of crawl snapshots into SCD-type-2 validity
    intervals: one row per (key, maximal run of consecutive versions
    with identical content), with ``valid_from``/``valid_to`` version
    bounds and an ``is_current`` flag — the crawl-history table shape
    (WARC revisit records, wayback-style dedup) that lets a pipeline
    ask "what did this URL say at crawl t" without storing every
    snapshot's bytes.

    Semantics: an interval BREAKS when the content digest changes OR
    the key skips a snapshot (absence closes the interval; a
    re-appearance starts a new one, even with identical content — the
    page was genuinely down). Generalizes ``snapshot_diff`` from one
    adjacent pair to the whole history in a single pass.

    Plan: digest per row (bodies never ship — 32 hex chars do), one
    window over (key ORDER BY version) marking run breaks, a running
    sum turning breaks into segment ids (islands-and-gaps), one
    groupBy (key, segment). Both the window and the groupBy partition
    by the key, so the shuffle is ONE exchange reused across both and
    per-task state is bounded by versions-per-key (the snapshot count,
    ~dozens) — no global sort, skew-free at any corpus width.
    ``is_current`` compares against the global max version, a 1-row
    aggregate broadcast back (never collected)."""
    h = snapshots.select(
        F.col(id_col),
        F.col(version_col).alias("snap_ver"),
        F.md5(F.col(text_col)).alias("digest"),
    )
    w = Window.partitionBy(id_col).orderBy("snap_ver")
    pv = F.lag("snap_ver").over(w)
    pd = F.lag("digest").over(w)
    brk = (
        pv.isNull()
        | (F.col("snap_ver") != pv + F.lit(1))
        | ~F.col("digest").eqNullSafe(pd)
    )
    seg = h.select(
        id_col, "snap_ver", "digest",
        F.sum(brk.cast("int")).over(w).alias("seg"),
    )
    vmax = snapshots.agg(F.max(version_col).alias("vmax"))
    return (
        seg.groupBy(id_col, "seg")
        .agg(
            F.min("digest").alias("digest"),
            F.min("snap_ver").alias("valid_from"),
            F.max("snap_ver").alias("valid_to"),
        )
        .crossJoin(F.broadcast(vmax))
        .select(
            id_col,
            "digest",
            "valid_from",
            "valid_to",
            (F.col("valid_to") == F.col("vmax")).alias("is_current"),
        )
    )


def scd2_apply_snapshot(
    history: DataFrame,
    snap: DataFrame,
    new_ver: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    validate: bool = True,
) -> DataFrame:
    """Incrementally fold ONE arriving crawl snapshot (version
    ``new_ver``) into an existing SCD2 history table (the output shape
    of ``scd2_intervals``) — the maintenance path: per crawl you touch
    the OPEN slice (≤ one row per live URL) and the new snapshot, never
    the closed history, so cost is proportional to the live corpus
    width, not to history depth.

    Rules (equivalent BY CONSTRUCTION to re-running
    ``scd2_intervals`` over all snapshots — pinned by a property test
    folding random stacks):
    - open interval with ``valid_to == new_ver - 1`` and an unchanged
      digest → extend (``valid_to = new_ver``);
    - changed digest, version gap, or brand-new/returning key → open a
      fresh ``[new_ver, new_ver]`` interval (the old row survives,
      closed);
    - key absent from the snapshot → its interval simply stops
      extending.
    ``is_current`` is recomputed globally as ``valid_to == new_ver``
    (a narrow map — no data moves).

    Plan: closed rows pass through a filter+union (NO shuffle); the
    open slice full-outer-joins the snapshot digests on the key —
    one exchange pair sized by the live corpus. ``new_ver`` may skip
    numbers (a crawl that never ran is a gap for every key).

    Feed ``history`` as a MATERIALIZED table (it is your stored
    history between crawls — parquet/Iceberg in production,
    checkpoint in tests): the operator scans it twice (open/closed
    split), so chaining many folds over one unmaterialized lineage
    re-executes the whole chain per scan.

    Two batch-equivalence edge cases (code-review r04, both
    reproduced before the fix):
    - ``validate=True`` (default) runs a 1-row aggregate asserting
      ``new_ver > max(valid_to)`` — folding a LATE crawl (time-travel
      write) would otherwise silently mark the newest content stale
      forever; SCD2 rejects it loud instead. The check is one tiny
      driver-side job per crawl; pass ``validate=False`` only when the
      caller already fences ordering (the streaming wrapper does not —
      late file delivery must fail there too).
    - an EMPTY snapshot returns the history UNCHANGED: batch
      ``scd2_intervals`` can never observe a version with no rows, so
      a crawl that found nothing must be a no-op (not a close-all)."""
    h = history.select(
        id_col, "digest", "valid_from", "valid_to", "is_current"
    )
    if validate:
        prior_max = h.agg(F.max("valid_to")).first()[0]
        if prior_max is not None and new_ver <= prior_max:
            raise ValueError(
                f"scd2_apply_snapshot: new_ver={new_ver} is not newer "
                f"than the stored history (max valid_to={prior_max}); "
                "late/time-travel snapshots are rejected"
            )
    if snap.isEmpty():
        return h
    s = snap.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("h_new"),
        F.lit(1).alias("in_snap"),
    )
    open_rows = h.where(F.col("is_current"))
    closed_rows = h.where(~F.col("is_current"))
    j = open_rows.join(s, id_col, "full_outer")
    extend = (
        F.col("valid_to").isNotNull()
        & (F.col("valid_to") == new_ver - 1)
        & F.col("digest").eqNullSafe(F.col("h_new"))
        & F.col("in_snap").isNotNull()
    )
    # the surviving old interval: everything except the extended case
    # (extension REPLACES the row with a longer one)
    kept_old = j.where(~extend & F.col("valid_from").isNotNull()).select(
        id_col, "digest", "valid_from", "valid_to"
    )
    extended = j.where(extend).select(
        id_col, "digest", "valid_from",
        F.lit(new_ver).alias("valid_to"),
    )
    opened = j.where(~extend & F.col("in_snap").isNotNull()).select(
        id_col,
        F.col("h_new").alias("digest"),
        F.lit(new_ver).alias("valid_from"),
        F.lit(new_ver).alias("valid_to"),
    )
    out = (
        closed_rows.select(id_col, "digest", "valid_from", "valid_to")
        .unionByName(kept_old)
        .unionByName(extended)
        .unionByName(opened)
    )
    return out.select(
        id_col, "digest", "valid_from", "valid_to",
        (F.col("valid_to") == F.lit(new_ver)).alias("is_current"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES, IPL 2006): each row draws u = (md5_60(salt:id)+1)/2^60 in
    (0, 1] and the k rows with the largest u^(1/w) win — realized as
    the order-equivalent key ln(u)/w (exp is monotone), which avoids
    pow() and keeps the key a composition of ops both engines compute
    identically. Inclusion probability is proportional-to-weight
    without replacement for ANY positive weight (fractional included);
    rows with weight <= 0 are excluded up front (zero probability —
    A-ES is undefined there); the draw is the module's usual content-hash
    uniform, so the SAMPLE IS A PURE FUNCTION OF THE ROWS — stable
    under repartitioning and re-reads, unlike rand()-keyed sampling.

    Scale: top-k by key is TakeOrderedAndProject (per-partition heap
    of k, then a k·partitions merge on the driver) — no global sort,
    no shuffle. The weighted data-mixing counterpart to
    ``token_budget_mix``'s budget fill."""
    from .dedup import shingle_hash

    h = shingle_hash(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")), "md5_60"
    )
    # add 1 in INTEGER space, then cast: matches the oracle's
    # (h + 1)::DOUBLE bit-for-bit (casting first would round h to a
    # double before the +1 and can differ by an ulp near 2^60)
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    # rows with w <= 0 are excluded (zero weight = zero inclusion
    # probability; negative is undefined in A-ES) — dividing by the RAW
    # positive weight keeps inclusion exactly proportional-to-weight
    # for fractional weights too (advice r03: the old greatest(w, 1)
    # clamp silently flattened every w < 1 to uniform)
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_skey", key)
        .orderBy(F.desc("_skey"), F.asc(id_col))
        .limit(k)
        .select(
            id_col,
            weight_col,
            F.round(F.col("_skey"), 6).alias("sample_key"),
        )
    )


def contrastive_pairs(
    docs: DataFrame, positives: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Contrastive training-pair mining for embedding models (the
    SimCSE/E5-style data prep a web corpus feeds a bi-encoder):
    positives are the corpus's VERIFIED near-dup pairs (doc_a, doc_b —
    from any detector in the dedup family), negatives the
    deterministic id-adjacency heuristic — (d, d+1) pairs present in
    the corpus that are NOT near-dups (adjacent crawl records share
    fetch context but rarely content, making them mildly hard
    negatives; and the rule is reproducible, unlike random sampling).
    Output (doc_a, doc_b, label) with label 1/0.

    Scale shape: one self-join on the shifted id (equi, no skew — ids
    are unique) + one anti-join against the positives; linear in the
    corpus."""
    ids = docs.select(F.col(id_col))
    adj = ids.select(
        F.col(id_col).alias("doc_a"), (F.col(id_col) + 1).alias("doc_b")
    ).join(ids.select(F.col(id_col).alias("doc_b")), "doc_b")
    pos = positives.select("doc_a", "doc_b").distinct()
    neg = adj.join(pos, ["doc_a", "doc_b"], "left_anti")
    return pos.withColumn("label", F.lit(1)).unionByName(
        neg.withColumn("label", F.lit(0))
    )


def chunk_overlap(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size overlapping token chunks — retrieval/embedding prep
    (the RAG counterpart to pack_sequences' training prep): each doc
    splits into windows of ``chunk_tokens`` whitespace tokens with
    ``overlap`` tokens shared between neighbors, so no boundary
    sentence is ever seen by zero chunks. Chunk starts are
    0, stride, 2·stride, … below (size − overlap) with stride =
    chunk_tokens − overlap (the huggingface convention: the final
    window is the only short one, and no window is fully contained in
    its predecessor). Zero-token docs are dropped.

    All JVM: one split + sequence/transform explode per doc — no
    shuffle at all until whatever consumes the chunks; per-row output
    is bounded by ceil(size/stride) rows.

    Returns (doc_id, chunk_id, start_token, n_tokens, chunk_text).
    """
    assert 0 <= overlap < chunk_tokens, "need 0 <= overlap < chunk"
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("l")
    ).where(F.size("l") > 0)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("l") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    return base.select(
        "doc_id",
        F.posexplode(starts).alias("chunk_id", "start_token"),
        F.col("l"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_token").cast("long").alias("start_token"),
        F.least(
            F.lit(chunk_tokens), F.size("l") - F.col("start_token")
        ).cast("long").alias("n_tokens"),
        F.concat_ws(
            " ", F.slice("l", F.col("start_token") + 1, chunk_tokens)
        ).alias("chunk_text"),
    )
