"""Web link-graph construction: hyperlink extraction from raw page
HTML and host-level aggregation, feeding the graph family (PageRank
host authority, k-core, label propagation) that large-scale corpus
curation uses for spam/quality signals.

Reference relationship: the reference operates on already-extracted
page text (its NIF corpus reader, inout/nif.py, never sees markup);
the crawl-side link structure is beyond-reference surface in the same
class as the WARC source — the curation layer a Common-Crawl-scale
deployment needs before text ever reaches the linker (host authority
as a keep/drop prior, mirror-host detection via shared outlink sets).

Scale shape: link extraction is one generated-column projection per
page (regexp_extract_all + explode — JVM codegen, no UDF); host
aggregation is a hash aggregate keyed by (src_host, dst_host), whose
cardinality is bounded by host-pair counts, orders of magnitude below
page counts. Nothing here shuffles page bodies: the explode projects
urls only, so the wide html column is pruned at the scan after the
extraction projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HREF_RE = r'href="([^"]+)"'
_HOST_RE = r"^https?://([^/]+)"


def host_of(col: "Column | str") -> Column:
    """Registrable host of an absolute http(s) URL ('' if none)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, _HOST_RE, 1)


def extract_outlinks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, out_url) — one row per href attribute in each page's
    html (binary or string; cast is a no-op for string). Relative
    links are kept verbatim (host_of maps them to '' downstream —
    callers filter as policy dictates)."""
    return pages.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(
                F.col(html_col).cast("string"), F.lit(_HREF_RE), 1
            )
        ).alias("out_url"),
    )


def host_graph(links: DataFrame) -> DataFrame:
    """Aggregate page-level links to the host level: (src_host,
    dst_host, n_links) including self-host rows — the raw material
    for both the simple host graph (distinct non-self pairs) and
    intra-host link stats."""
    return (
        links.select(
            host_of("url").alias("src_host"),
            host_of("out_url").alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("long").alias("n_links"))
    )


def host_authority(
    host_edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Host-level PageRank + degree profile over the aggregated host
    graph (host_graph output). Self-host links are dropped and
    multi-links collapsed for the rank computation (pagerank's
    simple-graph semantics — node ids are hosts, the operator is
    key-type agnostic); n_outlinks keeps the RAW per-host link count
    including self-host, so crawl ops can see both the graph position
    and the raw link volume in one row.

    Returns (host, rank, out_hosts, in_hosts, n_outlinks) for every
    host in the simple graph.
    """
    from .graph import pagerank

    e = (
        host_edges.where(F.col("src_host") != F.col("dst_host"))
        .select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        .distinct()
    )
    pr = pagerank(e, n_iter=n_iter, damping=damping)
    outd = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("out_hosts")
    )
    ind = e.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").cast("long").alias("in_hosts")
    )
    raw = host_edges.groupBy(F.col("src_host").alias("node")).agg(
        F.sum("n_links").cast("long").alias("n_outlinks")
    )
    return (
        pr.join(outd, "node", "left")
        .join(ind, "node", "left")
        .join(raw, "node", "left")
        .select(
            F.col("node").alias("host"),
            "rank",
            F.coalesce("out_hosts", F.lit(0)).alias("out_hosts"),
            F.coalesce("in_hosts", F.lit(0)).alias("in_hosts"),
            F.coalesce("n_outlinks", F.lit(0)).alias("n_outlinks"),
        )
    )


_ANCHOR_TAG_RE = r'<a href="[^"]*">[^<]*</a>'


def anchor_text_index(
    pages: DataFrame,
    top_k: int = 3,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Anchor-text index per TARGET host — the classic web-search
    signal (the text of links pointing AT a page describes it better
    than the page describes itself; Brin & Page '98 §2.2 made it a
    first-class index). Parsing is two-stage so each engine's
    single-group regex API suffices: extract whole anchor tags, then
    pull the href and the inner text out of each tag separately.

    Scale shape: tag extraction + both field parses are generated
    columns inside one projection (JVM codegen, html pruned after);
    the aggregate is keyed by (target host, term); the top-k window
    partitions by host over at most |distinct terms per host| rows.

    Returns (host, term, n_mentions, rank) for rank <= top_k, rank
    ordered by (count DESC, term ASC).
    """
    from pyspark.sql import Window

    tags = pages.select(
        F.explode(
            F.regexp_extract_all(
                F.col(html_col).cast("string"), F.lit(_ANCHOR_TAG_RE), 0
            )
        ).alias("tag")
    )
    parsed = tags.select(
        host_of(F.regexp_extract("tag", r'href="([^"]+)"', 1)).alias(
            "host"
        ),
        F.regexp_extract("tag", r">([^<]*)<", 1).alias("term"),
    ).where((F.col("host") != "") & (F.col("term") != ""))
    counts = parsed.groupBy("host", "term").agg(
        F.count("*").cast("long").alias("n_mentions")
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n_mentions").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_k)
    )


def mirror_hosts(
    links: DataFrame, tau: float = 0.8
) -> DataFrame:
    """Mirror-host detection: host pairs whose DISTINCT outlink-target
    sets overlap at Jaccard >= tau — mirrors, aggregator clones, and
    parked-domain farms replicate link structure even when body text
    is templated away, so this catches what content dedup misses (and
    at corpus scale a mirror farm silently multiplies every document
    it hosts).

    Exact set-similarity via a target-keyed equi-join: (host, target)
    distinct pairs joined on target, counted per host pair, Jaccard
    from the per-host set sizes. Scale note: per-target fanout is
    (#hosts linking to it)^2 — a web-famous target is the Zipf head
    here, the same shape dedup_allpairs solves losslessly with a
    rarest-token prefix filter; at fixture scale the exact join IS
    the right plan, and the AllPairs machinery
    (operators/set_similarity.py) is the documented scale path.

    Returns (host_a, host_b, n_a, n_b, n_common, jaccard) with
    host_a < host_b and jaccard >= tau, jaccard rounded to 1e-6.
    """
    hs = (
        links.select(
            host_of("url").alias("host"), F.col("out_url").alias("t")
        )
        .where(F.col("host") != "")
        .distinct()
    )
    sizes = hs.groupBy("host").agg(F.count("*").cast("long").alias("n"))
    common = (
        hs.alias("a")
        .join(hs.alias("b"), "t")
        .where(F.col("a.host") < F.col("b.host"))
        .groupBy(
            F.col("a.host").alias("host_a"),
            F.col("b.host").alias("host_b"),
        )
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    jac = F.round(
        F.col("n_common")
        / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        6,
    )
    return (
        common.join(
            sizes.select(
                F.col("host").alias("host_a"), F.col("n").alias("n_a")
            ),
            "host_a",
        )
        .join(
            sizes.select(
                F.col("host").alias("host_b"), F.col("n").alias("n_b")
            ),
            "host_b",
        )
        .select(
            "host_a", "host_b", "n_a", "n_b", "n_common",
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= tau)
    )
