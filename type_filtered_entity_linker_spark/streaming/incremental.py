"""Structured Streaming surface.

The reference has no streaming — its GERBIL service (gerbil.py:42-63)
is request/response, which SURVEY.md §3.2 maps to "each request = one
micro-batch appended to the pages table". This module makes that
mapping executable:

- ``stream_events_hourly``: watermarked event-time windowed aggregation
  over a file-source stream (late data bounded by the watermark; state
  store evicts closed windows — the scalable pattern at 100 TB/day
  event volume).
- ``incremental_link_pages``: file-source stream of page batches →
  ``foreachBatch`` runs the batch linkage chain (blocking equi-join →
  type-filter semi-join → top-K → score → argmax) per micro-batch and
  appends links; the streaming checkpoint gives exactly-once file
  progress, so a killed run resumes at the first unprocessed batch —
  the streaming twin of the batch pipeline's fingerprint checkpoints.

- ``incremental_cluster_links``: cluster MAINTENANCE across
  micro-batches. Connected components is iterative/global — not
  expressible as a single streaming operator — but it does not need a
  full recompute per trigger either: the previous assignment re-enters
  each batch as depth-1 STAR edges (node → component root), so the
  per-batch CC runs over |state| + |batch| edges and converges in the
  few rounds the newly-merged components need, not O(log n) over the
  accumulated raw edge history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _watermarkable_ts(df: DataFrame, col: str = "ts") -> tuple[DataFrame, bool]:
    """Event-time watermarks require TimestampType; parquet written
    with isAdjustedToUTC=false arrives as TIMESTAMP_NTZ — cast in (the
    round-trip is exact under a fixed session timezone) and remember to
    cast back out so results compare equal to the batch/oracle NTZ
    output. Shared by every streaming query over the events table."""
    ntz = any(
        f.name == col and f.dataType.typeName() == "timestamp_ntz"
        for f in df.schema.fields
    )
    if ntz:
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df, ntz


def _restore_ntz(df: DataFrame, col: str, ntz: bool) -> DataFrame:
    return df.withColumn(col, F.col(col).cast("timestamp_ntz")) if ntz else df


def stream_events_hourly(
    spark: SparkSession,
    path: str,
    schema: StructType,
    watermark: str = "2 hours",
    max_files_per_trigger: "int | None" = None,
) -> DataFrame:
    """Streaming (user_id, hour window) event counts + value sums.

    Append-mode-capable: the watermark bounds state (a window closes
    once event time passes window_end + watermark) — required for an
    unbounded run; with Trigger.AvailableNow it also just drains the
    backlog. ``max_files_per_trigger=1`` turns a multi-file staging
    dir into genuine multi-batch delivery (oldest-file-first), which
    is what makes watermark advancement — and therefore late-data
    drops — actually happen between batches.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.parquet(path)
    ev, ntz = _watermarkable_ts(ev)
    out = (
        ev.withWatermark("ts", watermark)
        .groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("hour_start"),
            "n_events",
            "sum_value",
        )
    )
    return _restore_ntz(out, "hour_start", ntz)


def run_stream_once(
    sdf: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain a streaming DF with Trigger.AvailableNow into an in-memory
    table and return it as a batch DF (test/driver harness; production
    sinks are parquet/Iceberg appends)."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return sdf.sparkSession.table(name)


def stream_deduplicated_events(
    spark: SparkSession,
    path: str,
    schema: StructType,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication on (user_id, ts, event_type) —
    the training-data-pipeline dedup pattern applied to an unbounded
    stream: ``dropDuplicates`` keeps per-key state; the event-time
    watermark bounds that state (a key is evictable once its event
    time passes the watermark), so the query runs forever without
    unbounded memory. Duplicates arriving across micro-batches (e.g.
    the same file delivered twice) are removed by the state store, not
    just within a batch.

    Output = the dedup KEY columns only: emitting non-key columns from
    a keyed dedup would surface an arbitrary survivor when two rows
    share the key but differ elsewhere — nondeterministic output and
    unverifiable against a DISTINCT oracle."""
    ev = spark.readStream.schema(schema).parquet(path)
    ev, ntz = _watermarkable_ts(ev)
    out = (
        ev.withWatermark("ts", watermark)
        .dropDuplicates(["user_id", "ts", "event_type"])
        .select("user_id", "ts", "event_type")
    )
    return _restore_ntz(out, "ts", ntz)


def stream_sessionized_events(
    spark: SparkSession,
    path: str,
    schema: StructType,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization with ``session_window`` — the MERGING
    state-window formulation (a late event can fuse two open sessions;
    fixed windows can't express that): per (user, session) event count
    and value sum. The watermark closes a session once event time
    passes session_end + watermark, bounding state for an unbounded
    run; with Trigger.AvailableNow the drain equals the batch
    gaps-and-islands result."""
    ev = spark.readStream.schema(schema).parquet(path)
    ev, ntz = _watermarkable_ts(ev)
    out = (
        ev.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
    return _restore_ntz(out, "session_start", ntz)


def stream_view_click_join(
    spark: SparkSession,
    path: str,
    schema: StructType,
    watermark: str = "2 hours",
    max_gap_minutes: int = 60,
) -> DataFrame:
    """STREAM-STREAM inner join (the attribution classic): every view
    joined to the same user's clicks arriving within ``max_gap_minutes``
    AFTER it. Both sides carry event-time watermarks and the join
    condition carries the time-range bound — together they let the
    state store evict a buffered view once no qualifying click can
    still arrive (view_ts + gap + watermark has passed), so the join
    runs unbounded without unbounded state. Append mode (the only mode
    stream-stream inner joins support); with Trigger.AvailableNow the
    drained output equals the batch range join exactly."""
    views, ntz = _watermarkable_ts(
        spark.readStream.schema(schema).parquet(path)
    )
    clicks, _ = _watermarkable_ts(
        spark.readStream.schema(schema).parquet(path)
    )
    v = (
        views.where(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    c = (
        clicks.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    out = v.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            <= F.col("view_ts")
            + F.expr(f"INTERVAL {int(max_gap_minutes)} MINUTES")
        ),
        "inner",
    ).select("user_id", "view_id", "click_id", "view_ts", "click_ts")
    out = _restore_ntz(out, "view_ts", ntz)
    return _restore_ntz(out, "click_ts", ntz)


def stream_canonical_url_dedup(
    spark: SparkSession,
    path: str,
    schema: StructType,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming crawl-ingest dedup on the CANONICAL url: recrawls and
    raw-URL variants (case, www, default port, tracking params, param
    order, fragments) of the same page arriving across micro-batches
    collapse to one state-store key. Composes
    ``curation.canonical_url_cols`` (pure codegen columns, so the key
    is computed map-side before the dedup state lookup) with the same
    watermark-bounded ``dropDuplicates`` pattern as
    ``stream_deduplicated_events`` — and the same output contract:
    only the dedup KEY column is emitted, because any non-key column
    would surface an arbitrary first-arrival survivor."""
    from ..operators.curation import canonical_url_cols

    crawl = spark.readStream.schema(schema).parquet(path)
    crawl, ntz = _watermarkable_ts(crawl, "warc_ts")
    canon = crawl.withColumn(
        "canonical_url", canonical_url_cols(F.col("url"))["canonical_url"]
    )
    return (
        canon.withWatermark("warc_ts", watermark)
        .dropDuplicates(["canonical_url"])
        .select("canonical_url")
    )


def stream_running_user_totals(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (the build brief's 'custom stateful operators' pattern): per-user
    RUNNING totals across micro-batches — state (n_events, sum_value)
    persists in the state store and each batch emits the updated
    cumulative row per user seen in that batch.

    This is the operator shape Spark's built-in windowed aggs can't
    express: arbitrary per-key state evolution with custom merge logic,
    batch-vectorized through Arrow."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = spark.readStream.schema(schema).parquet(path).select("user_id", "value")

    def update(key, pdfs, state):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 4)]}
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _latest_state_id(state_root: str, below: int) -> int | None:
    """Newest complete (``_SUCCESS``-marked) snapshot id strictly below
    ``below``. Local-FS listing (the sandbox surface); on a cluster the
    same contract runs through the Hadoop FileSystem API or an Iceberg
    snapshot id — the naming scheme is the only thing that changes."""
    if not os.path.isdir(state_root):
        return None
    best: int | None = None
    for d in os.listdir(state_root):
        if not d.startswith("batch_"):
            continue
        try:
            i = int(d[len("batch_"):])
        except ValueError:
            continue
        if (
            i < below
            and os.path.exists(os.path.join(state_root, d, "_SUCCESS"))
            and (best is None or i > best)
        ):
            best = i
    return best


def incremental_cluster_links(
    spark: SparkSession,
    links_dir: str,
    workdir: str,
    links_schema: StructType,
    max_files_per_trigger: int | None = None,
    metrics: list | None = None,
    key_cols: tuple = ("url", "mention_id"),
    item_col: str = "item_id",
) -> str:
    """Streaming cluster maintenance: keep the transitive mention
    clusters current as link batches arrive, WITHOUT recomputing CC
    over the accumulated edge history each trigger.

    Per micro-batch: (1) the batch's links become bipartite
    mention↔entity edges (the same graph ``cluster_mentions`` builds);
    (2) the PREVIOUS assignment snapshot re-enters as star edges
    (node → root, depth 1 by construction); (3) one
    ``connected_components`` run over star ∪ new edges — prior
    components are already fixpoints, so iterations are bounded by the
    diameter of the NEWLY-merged components (~2-3 rounds measured),
    not the full graph's; (4) the new assignment lands in
    ``{workdir}/cluster_state/batch_<id>``.

    Idempotence needs no fencing: CC is idempotent under duplicate
    edges, and a RETRIED batch reads the newest complete snapshot
    BELOW its own id — replaying batch N onto state that already
    includes N's edges reproduces the identical assignment and
    overwrites N's own snapshot only. The streaming checkpoint at
    ``{workdir}/_cluster_checkpoint`` guarantees each source file is
    assigned to exactly one batch id.

    Scale note (10^12 nodes): each trigger rewrites the FULL
    assignment snapshot — correct but write-heavy; the production
    variant keeps state in a table that supports row-level MERGE
    (Iceberg) and rewrites only components touched by the batch
    (components are identifiable from the CC output by joining new
    edges' nodes). The in-loop math is unchanged.

    ``metrics`` (optional list) collects per-batch
    {batch_id, cc_iterations, edges} — the per-partition-lineage
    companion the north rule asks of every resumable stage.

    Returns the state root; read the queryable view with
    :func:`read_cluster_state`."""
    from ..operators.clustering import connected_components

    state_root = os.path.join(workdir, "cluster_state")
    ckpt = os.path.join(workdir, "_cluster_checkpoint")
    reader = spark.readStream.schema(links_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    links = reader.parquet(links_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        new_edges = batch_df.select(
            F.concat_ws("#", *key_cols).alias("src"),
            F.concat(F.lit("E:"), F.col(item_col)).alias("dst"),
        )
        prev_id = _latest_state_id(state_root, below=batch_id)
        edges = new_edges
        if prev_id is not None:
            prev = spark.read.parquet(
                os.path.join(state_root, f"batch_{prev_id:09d}")
            )
            stars = prev.where(F.col("node") != F.col("cluster_id")).select(
                F.col("node").alias("src"), F.col("cluster_id").alias("dst")
            )
            edges = edges.union(stars)
        st: list = []
        assign = connected_components(edges, stats=st)
        assign.write.mode("overwrite").parquet(
            os.path.join(state_root, f"batch_{batch_id:09d}")
        )
        if metrics is not None:
            last = st[-1] if st else {"iteration": 0, "edges": 0}
            metrics.append(
                {
                    "batch_id": batch_id,
                    "cc_iterations": last["iteration"],
                    "edges": last["edges"],
                }
            )

    q = (
        links.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return state_root


def read_cluster_state(spark: SparkSession, state_root: str) -> DataFrame:
    """Latest snapshot → presentation view (mention_key, cluster_id):
    internal entity connector nodes ('E:…') are dropped and cluster
    ids rekeyed to the component's min MENTION key — the same
    output contract as the batch ``cluster_mentions`` (rekeying lives
    HERE, at read time, because the state itself must keep entity
    nodes to stay mergeable)."""
    latest = _latest_state_id(state_root, below=1 << 62)
    if latest is None:
        raise FileNotFoundError(f"no complete snapshot under {state_root}")
    assign = spark.read.parquet(
        os.path.join(state_root, f"batch_{latest:09d}")
    )
    m = assign.where(~F.col("node").startswith("E:"))
    mins = m.groupBy("cluster_id").agg(F.min("node").alias("cid"))
    return m.join(mins, "cluster_id").select(
        F.col("node").alias("mention_key"), F.col("cid").alias("cluster_id")
    )


def incremental_link_pages(
    spark: SparkSession,
    pages_dir: str,
    workdir: str,
    link_batch,
    pages_schema: StructType,
    max_files_per_trigger: int | None = None,
) -> str:
    """Stream page files from ``pages_dir``; for each micro-batch run
    ``link_batch(pages_df) -> links_df`` (the batch linkage chain) and
    append the links to ``{workdir}/links``. Returns the links path.

    The streaming checkpoint at ``{workdir}/_checkpoint`` records which
    source files each batch consumed — a rerun after a kill reprocesses
    only unfinished batches (foreachBatch output is idempotent per
    batch_id: we overwrite the batch's own output partition).
    """
    links_path = os.path.join(workdir, "links")
    ckpt = os.path.join(workdir, "_checkpoint")
    reader = spark.readStream.schema(pages_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(pages_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = link_batch(batch_df).withColumn("batch_id", F.lit(batch_id))
        # partition by batch_id + dynamic overwrite → re-running a
        # failed batch replaces its own output only (idempotence)
        out.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(links_path)

    q = (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return links_path


def stream_scd2_history(
    spark: SparkSession,
    snaps_dir: str,
    workdir: str,
    snaps_schema: StructType,
    id_col: str = "doc_id",
    version_col: str = "snap_ver",
    text_col: str = "text",
    max_files_per_trigger: int | None = None,
) -> str:
    """Streaming SCD2 crawl-history maintenance: snapshot files stream
    in version order; each micro-batch folds its versions (ascending)
    into the stored history via ``curation.scd2_apply_snapshot`` — the
    incremental path whose per-crawl cost is the open slice, never the
    closed history.

    Retry fencing (scd2 folding is NOT idempotent, unlike CC): history
    snapshots land per batch id, and a batch ALWAYS folds onto the
    newest complete state strictly BELOW its own id — replaying a
    killed batch reproduces the identical snapshot and overwrites only
    its own directory (same contract as
    ``incremental_cluster_maintenance``). The streaming checkpoint
    pins the file→batch assignment.

    Precondition: snapshot files arrive in crawl (version) order —
    the natural delivery order of a crawl pipeline. A late (lower-
    version) snapshot is a time-travel write: the fold's validate
    guard raises and the query FAILS LOUD instead of silently marking
    the newest content stale (code-review r04 reproduced that
    corruption before the guard existed).

    Returns the state root; the latest ``batch_*`` directory is the
    queryable history (equal to batch ``scd2_intervals`` over all
    delivered snapshots — the equivalence the property test and the
    crawl_scd2_incremental oracle pin)."""
    from ..operators.curation import scd2_apply_snapshot, scd2_intervals

    state_root = os.path.join(workdir, "scd2_state")
    ckpt = os.path.join(workdir, "_scd2_checkpoint")
    reader = spark.readStream.schema(snaps_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    snaps = reader.parquet(snaps_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        vers = [
            r[0]
            for r in batch_df.select(version_col)
            .distinct()
            .orderBy(version_col)
            .collect()
        ]  # O(#crawls) driver rows
        if not vers:
            return
        prev_id = _latest_state_id(state_root, below=batch_id)
        if prev_id is None:
            hist = scd2_intervals(
                batch_df.where(F.col(version_col) == vers[0]),
                id_col, version_col, text_col,
            )
            rest = vers[1:]
        else:
            hist = spark.read.parquet(
                os.path.join(state_root, f"batch_{prev_id:09d}")
            )
            rest = vers
        for v in rest:
            hist = scd2_apply_snapshot(
                hist,
                batch_df.where(F.col(version_col) == v),
                v,
                id_col,
                text_col,
            ).localCheckpoint(eager=False)
        hist.write.mode("overwrite").parquet(
            os.path.join(state_root, f"batch_{batch_id:09d}")
        )

    q = (
        snaps.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return state_root


def stream_hll_registers(
    spark: SparkSession,
    path: str,
    schema: StructType,
    group_col: str = "event_type",
    item_col: str = "user_id",
    m: int = 64,
) -> DataFrame:
    """Streaming HyperLogLog maintenance: the register table
    (grp, bucket, max rank) AS the streaming aggregation state. Each
    micro-batch folds map-side into ≤ m rows per group before the
    state lookup, state size is m·|groups| FOREVER (no watermark
    needed — the sketch never grows with stream length), and because
    merge is max(), re-delivered files change nothing: the sketch is
    idempotent under duplicates by construction, which is why the
    driver query feeds it the duplicate-delivery staging dir. Hash
    math is ``operators/sketches``' md5 idiom, so the drained result
    equals the batch HLL bit-for-bit."""
    from ..operators.sketches import _md5_int, hll_rho

    ev = spark.readStream.schema(schema).parquet(path)
    item = F.col(item_col).cast("string")
    return (
        ev.select(
            F.col(group_col).alias("grp"),
            (_md5_int(item, 1, 2) % m).alias("bucket"),
            hll_rho(item).alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("r"))
    )


def stream_binned_counts(
    spark: SparkSession,
    path: str,
    schema: StructType,
    value_col: str = "score",
    edges: "tuple[float, ...]" = (0.0, 4.0, 8.0, 12.0, 16.0),
    max_files_per_trigger: "int | None" = 1,
) -> DataFrame:
    """Streaming score-histogram maintenance — the state side of the
    continuous drift monitor: scored pairs arrive as files, the binned
    count table IS the streaming aggregation state (at most
    len(edges) + 1 rows FOREVER — like the HLL registers, the state
    never grows with stream length, so no watermark is needed).
    Drained, the histogram equals the batch binned_histogram over the
    same rows, and psi_from_histograms turns it + a batch reference
    into the PSI report (operators/drift.py). NULL scores are dropped
    on the way in, mirroring the batch path."""
    from ..operators.drift import bin_index_expr

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        # one file per micro-batch by default, so a multi-file staging
        # dir genuinely exercises cross-batch state accumulation
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.parquet(path)
    return (
        ev.where(F.col(value_col).isNotNull())
        .select(bin_index_expr(value_col, list(edges)).alias("bin_idx"))
        .groupBy("bin_idx")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def stream_entity_attach(
    spark: SparkSession,
    batches_dir: str,
    workdir: str,
    schema: StructType,
    existing: DataFrame,
    fs_params: dict,
    near: dict,
    upper: float,
    lower: float,
    link_threshold: float,
    max_files_per_trigger: "int | None" = 1,
    metrics: list | None = None,
) -> str:
    """Streaming incremental ER — the entity REGISTRY as streaming
    state: record batches arrive as files; each micro-batch blocks
    (phone-exact ∪ name-prefix17) and Fellegi–Sunter-scores against
    the CURRENT registry, attaches each record to its best entity
    above the link threshold, and folds the spawns back in — so a
    batch-2 record can attach to an entity a batch-1 record spawned,
    which no stateless per-batch attach can do. This is
    er_incremental_attach lifted to continuous operation, the
    registry playing the role incremental_cluster_links' star edges
    play for transitive clustering.

    State layout mirrors the SCD2/cluster state contract: one
    registry snapshot (``registry_<batch>``) + one assignment table
    (``assign_<batch>``) per micro-batch under the state root, retry
    fencing by reading the newest complete registry BELOW the current
    batch id (a replayed batch re-derives the identical assignment
    and overwrites only its own outputs), the streaming checkpoint
    guaranteeing each file lands in exactly one batch. Scale note: a
    production registry lives in a MERGE-capable table (Iceberg) and
    appends spawns row-level; the in-loop math is unchanged.

    ``metrics`` collects {batch_id, n_batch, n_attached, n_spawned}
    per trigger. Returns the state root; assignments =
    union of ``assign_*`` (one row per record:
    rec_id, cluster_id, attached, best_score, batch_id).
    """
    from ..operators.fellegi_sunter import fellegi_sunter_scores
    from ..operators.matching import attach_best

    state_root = os.path.join(workdir, "attach_state")
    ckpt = os.path.join(workdir, "_attach_checkpoint")
    os.makedirs(state_root, exist_ok=True)
    existing = existing.localCheckpoint(eager=True)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    batches = reader.parquet(batches_dir)

    def _latest_registry(below: int) -> "int | None":
        best = None
        for d in os.listdir(state_root):
            if d.startswith("registry_"):
                i = int(d.split("_")[1])
                if i < below and os.path.exists(
                    os.path.join(state_root, d, "_SUCCESS")
                ) and (best is None or i > best):
                    best = i
        return best

    def process(batch_df: DataFrame, batch_id: int) -> None:
        prev = _latest_registry(below=batch_id)
        registry = (
            spark.read.parquet(
                os.path.join(state_root, f"registry_{prev:09d}")
            )
            if prev is not None
            else existing
        )
        batch = batch_df.localCheckpoint(eager=True)
        e_keys = registry.select(
            "rec_id", "phone", F.substring("name", 1, 17).alias("np")
        )
        n_keys = batch.select(
            "rec_id", "phone", F.substring("name", 1, 17).alias("np")
        )
        by_phone = (
            e_keys.alias("e")
            .join(n_keys.alias("n"), F.col("e.phone") == F.col("n.phone"))
            .select(
                F.col("e.rec_id").alias("id_a"),
                F.col("n.rec_id").alias("id_b"),
            )
        )
        by_prefix = (
            e_keys.alias("e")
            .join(n_keys.alias("n"), F.col("e.np") == F.col("n.np"))
            .select(
                F.col("e.rec_id").alias("id_a"),
                F.col("n.rec_id").alias("id_b"),
            )
        )
        pairs = by_phone.unionByName(by_prefix).distinct()
        scored = fellegi_sunter_scores(
            registry.unionByName(batch),
            pairs,
            fs_params,
            near=near,
            upper=upper,
            lower=lower,
        )
        asg = attach_best(scored, batch, link_threshold).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        asg.write.mode("overwrite").parquet(
            os.path.join(state_root, f"assign_{batch_id:09d}")
        )
        asg_r = spark.read.parquet(
            os.path.join(state_root, f"assign_{batch_id:09d}")
        )
        spawned = batch.join(
            asg_r.where(~F.col("attached")).select("rec_id"), "rec_id"
        )
        registry.unionByName(spawned).write.mode("overwrite").parquet(
            os.path.join(state_root, f"registry_{batch_id:09d}")
        )
        if metrics is not None:
            n_batch = asg_r.count()
            n_att = asg_r.where(F.col("attached")).count()
            metrics.append(
                {
                    "batch_id": batch_id,
                    "n_batch": n_batch,
                    "n_attached": n_att,
                    "n_spawned": n_batch - n_att,
                }
            )

    q = (
        batches.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return state_root


def read_attach_assignments(
    spark: SparkSession, state_root: str
) -> DataFrame:
    """Union of all per-batch assignment tables (disjoint rec_ids by
    the source contract: each record arrives in exactly one batch)."""
    import glob as _glob

    dirs = sorted(_glob.glob(os.path.join(state_root, "assign_*")))
    if not dirs:
        raise FileNotFoundError(f"no assignments under {state_root}")
    return spark.read.parquet(*dirs)


# --------------------------------------------------- watermark lag pin
#
# Spark's streaming late-row FILTER runs one batch behind state
# EVICTION: batch N filters with the watermark computed through batch
# N-2 (measured on this build; tripwire
# tests/test_wave16_ops.py::test_watermark_late_filter_lags_eviction_by_one_batch).
# The events_stream_late_audit oracle replays that lag exactly (drop
# watermark = batch-1 max ts - delay on a 3-batch schedule), which
# couples it to the engine version. The pin below de-couples it
# LOUDLY (VERDICT r04 item 4): on the pyspark version the lag was
# measured on, the probe is free; on ANY other version the lag is
# re-measured behaviorally with a 3-batch micro-stream, and the audit
# query raises with a recalibration message if it moved.

WATERMARK_LAG_MEASURED_ON = "4.1.2"
WATERMARK_LAG_BATCHES = 1
_LAG_PROBE_CACHE: "dict[str, int]" = {}


def measure_watermark_filter_lag(spark: SparkSession) -> int:
    """Behavioral probe: run the tripwire's 3-batch schedule on a tiny
    synthetic stream and observe whether the batch-2 late row survives
    (filter watermark one batch stale -> lag 1) or is dropped (filter
    watermark current -> lag 0). Any other outcome raises."""
    import shutil
    import tempfile
    from datetime import datetime as _dt

    stage = tempfile.mkdtemp(prefix="wm_lag_probe_")
    try:
        schema = (
            "event_id long, ts timestamp, user_id long, value double"
        )
        batches = [
            # b1: watermark after it = 13:00 - 2h = 11:00
            [(1, _dt(2024, 1, 1, 10, 0, 30), 1, 0.0),
             (2, _dt(2024, 1, 1, 13, 0, 0), 2, 0.0)],
            # b2 late row (window [6,7)): kept iff filter lags
            [(3, _dt(2024, 1, 1, 6, 10, 0), 9, 0.0),
             (4, _dt(2024, 1, 1, 14, 0, 0), 2, 0.0)],
            # b3 late row: dropped under either lag (watermark >= 11:00)
            [(5, _dt(2024, 1, 1, 6, 20, 0), 8, 0.0),
             (6, _dt(2024, 1, 1, 15, 0, 0), 2, 0.0)],
        ]
        for i, rows in enumerate(batches, 1):
            tmp = os.path.join(stage, f"_w{i}")
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            part = next(
                p for p in os.listdir(tmp) if p.endswith(".parquet")
            )
            dst = os.path.join(stage, f"b{i}.parquet")
            shutil.copy(os.path.join(tmp, part), dst)
            os.utime(dst, (1700000000 + i, 1700000000 + i))
            shutil.rmtree(tmp)
        _LAG_PROBE_CACHE["_seq"] = _LAG_PROBE_CACHE.get("_seq", 0) + 1
        out = run_stream_once(
            stream_events_hourly(
                spark,
                stage,
                spark.read.parquet(
                    os.path.join(stage, "b1.parquet")
                ).schema,
                max_files_per_trigger=1,
            ),
            f"wm_lag_probe_{_LAG_PROBE_CACHE['_seq']}",
            output_mode="append",
        )
        emitted = {
            (r.user_id, r.hour_start.hour) for r in out.collect()
        }
        if (8, 6) in emitted:
            raise RuntimeError(
                "watermark probe: batch-3 late row survived — the "
                "late filter no longer advances at all on this Spark "
                "build; the late-audit oracle model does not apply"
            )
        if (1, 10) not in emitted:
            raise RuntimeError(
                "watermark probe: on-time window missing — append-"
                "mode emission semantics changed on this Spark build"
            )
        return 1 if (9, 6) in emitted else 0
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def watermark_filter_lag_batches(spark: SparkSession) -> int:
    """The late-filter lag the late-audit oracle must replay. Free on
    the pinned build; measured (once per session) on any other."""
    import pyspark

    if pyspark.__version__ == WATERMARK_LAG_MEASURED_ON:
        return WATERMARK_LAG_BATCHES
    key = spark.sparkContext.applicationId
    if key not in _LAG_PROBE_CACHE:
        _LAG_PROBE_CACHE[key] = measure_watermark_filter_lag(spark)
    return _LAG_PROBE_CACHE[key]


def stream_cdc_index(
    spark: SparkSession,
    batches_dir: str,
    workdir: str,
    schema: StructType,
    k: int = 3,
    divisor: int = 8,
    hash_fn: str = "xxhash64",
    max_files_per_trigger: "int | None" = 1,
    metrics: "list | None" = None,
) -> str:
    """The CDC chunk index as streaming state — continuous
    shared-passage detection over an unbounded document feed: each
    micro-batch is chunked (cdc_chunks is a pure narrow map, so the
    per-trigger cost is one |batch|-sided hash join), probed against
    the CURRENT stored index for pairs with a new member (new-vs-
    stored and new-vs-new within the batch), and its chunks folded
    into the index snapshot. ``cdc_shared_passages_incremental``
    lifted to continuous operation, exactly as stream_entity_attach
    lifts er_incremental_attach.

    Because documents arrive exactly once (the file-source contract)
    and every unordered pair is emitted at its LATER member's batch,
    the union of per-batch pair tables equals the complete batch
    result over the whole corpus — the invariant the driver oracle
    replays. State layout and retry fencing mirror
    stream_entity_attach: ``index_<batch>`` snapshots + a
    ``pairs_<batch>`` table per trigger, a replayed batch re-derives
    identically and overwrites only its own outputs; a production
    index lives in a MERGE-capable table and appends row-level.

    ``metrics`` collects {batch_id, n_docs, n_chunks, n_pairs} per
    trigger. Returns the state root; pairs = union of ``pairs_*``
    (doc_a, doc_b, n_shared_chunks, shared_tokens)."""
    from ..operators.dedup import cdc_chunks

    state_root = os.path.join(workdir, "cdc_state")
    ckpt = os.path.join(workdir, "_cdc_checkpoint")
    os.makedirs(state_root, exist_ok=True)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    batches = reader.parquet(batches_dir)

    def _latest_index(below: int) -> "int | None":
        best = None
        for d in os.listdir(state_root):
            if d.startswith("index_"):
                i = int(d.split("_")[1])
                if i < below and os.path.exists(
                    os.path.join(state_root, d, "_SUCCESS")
                ) and (best is None or i > best):
                    best = i
        return best

    def process(batch_df: DataFrame, batch_id: int) -> None:
        prev = _latest_index(below=batch_id)
        index = (
            spark.read.parquet(
                os.path.join(state_root, f"index_{prev:09d}")
            )
            if prev is not None
            else spark.createDataFrame(
                [], "doc_id long, chunk_hash long, chunk_tokens long"
            )
        )
        ch_new = (
            cdc_chunks(
                batch_df, k=k, divisor=divisor, hash_fn=hash_fn
            )
            .select("doc_id", "chunk_hash", "chunk_tokens")
            .distinct()
            .localCheckpoint(eager=True)  # probe side AND index fold
        )
        full = index.unionByName(ch_new)
        pairs = (
            ch_new.select(
                F.col("doc_id").alias("doc_n"),
                "chunk_hash",
                "chunk_tokens",
            )
            .join(
                full.select(F.col("doc_id").alias("doc_o"), "chunk_hash"),
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
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(state_root, f"pairs_{batch_id:09d}")
        )
        full.write.mode("overwrite").parquet(
            os.path.join(state_root, f"index_{batch_id:09d}")
        )
        if metrics is not None:
            metrics.append(
                {
                    "batch_id": batch_id,
                    "n_docs": batch_df.count(),
                    "n_chunks": ch_new.count(),
                    "n_pairs": spark.read.parquet(
                        os.path.join(state_root, f"pairs_{batch_id:09d}")
                    ).count(),
                }
            )

    q = (
        batches.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return state_root


def read_cdc_pairs(spark: SparkSession, state_root: str) -> DataFrame:
    """Union of all per-batch pair tables. Disjoint by construction:
    every unordered pair is emitted exactly once, at its later
    member's batch."""
    import glob as _glob

    dirs = sorted(_glob.glob(os.path.join(state_root, "pairs_*")))
    if not dirs:
        raise FileNotFoundError(f"no pairs under {state_root}")
    return spark.read.parquet(*dirs).drop("batch_id")
