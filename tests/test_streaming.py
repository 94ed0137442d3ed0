"""Structured Streaming surface: watermarked windowed aggregation and
the incremental foreachBatch linkage with checkpoint resume
(SURVEY.md §3.2 — GERBIL request/response mapped to micro-batches)."""

import os

import pandas as pd
from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.config import LinkerConfig
from type_filtered_entity_linker_spark.plans.pipeline import link_pages_batch
from type_filtered_entity_linker_spark.streaming.incremental import (
    incremental_link_pages,
    run_stream_once,
    stream_events_hourly,
)


def _write_events(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def test_stream_window_equals_batch(spark, tmp_path):
    src = str(tmp_path / "ev")
    rows = [
        (i, f"2024-01-01 {h:02d}:{m:02d}:00", i % 3, float(i))
        for i, (h, m) in enumerate(
            [(0, 5), (0, 55), (1, 10), (1, 40), (2, 30), (5, 15)]
        )
    ]
    _write_events(spark, src, rows)
    schema = spark.read.parquet(src).schema
    got = run_stream_once(
        stream_events_hourly(spark, src, schema), "t_stream_eq"
    ).toPandas()
    want = (
        spark.read.parquet(src)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .toPandas()
    )
    key = ["user_id", "hour_start"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns]
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_watermark_emits_closed_windows_across_restarts(spark, tmp_path):
    """Append mode: a window is emitted once the watermark (2h) passes
    its end; restart from checkpoint carries the watermark forward."""
    src, ckpt, out = str(tmp_path / "ev"), str(tmp_path / "ck"), str(tmp_path / "out")
    _write_events(
        spark,
        src,
        [
            (0, "2024-01-01 00:30:00", 1, 1.0),
            (1, "2024-01-01 00:45:00", 1, 2.0),
            (2, "2024-01-01 05:30:00", 1, 4.0),
        ],
    )
    schema = spark.read.parquet(src).schema

    def drain():
        # parquet sink (memory sink can't recover from a checkpoint)
        q = (
            stream_events_hourly(spark, src, schema)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        return {
            (r.user_id, str(r.hour_start)): r.n_events
            for r in spark.read.parquet(out).collect()
        }

    first = drain()
    # run 1: watermark ends at 05:30-2h=03:30 -> only the 00:00 window
    # (end 01:00) is closed
    assert first == {(1, "2024-01-01 00:00:00"): 2}
    # new file arrives 4h later -> watermark passes 06:00, closing 05:00
    _write_events(spark, src, [(3, "2024-01-01 09:30:00", 1, 8.0)])
    second = drain()
    # sink now additionally holds the 05:00 window, closed by the
    # watermark restored from the checkpoint and advanced to 07:30
    assert second == {
        (1, "2024-01-01 00:00:00"): 2,
        (1, "2024-01-01 05:00:00"): 1,
    }


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-user state persists across restarts
    via the checkpointed state store; the second drain's emitted rows
    are CUMULATIVE over both file batches."""
    from type_filtered_entity_linker_spark.streaming.incremental import (
        stream_running_user_totals,
    )

    src, ckpt, out = str(tmp_path / "ev"), str(tmp_path / "ck"), str(tmp_path / "out")
    _write_events(spark, src, [(0, "2024-01-01 00:00:00", 1, 1.0),
                               (1, "2024-01-01 00:01:00", 1, 2.0),
                               (2, "2024-01-01 00:02:00", 2, 5.0)])
    schema = spark.read.parquet(src).schema

    def drain():
        def sink(df, batch_id):
            df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out)

        q = (
            stream_running_user_totals(spark, src, schema)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        rows = spark.read.parquet(out).collect()
        last = max(r.batch_id for r in rows)
        return {
            r.user_id: (r.n_events, r.sum_value)
            for r in rows
            if r.batch_id == last
        }

    first = drain()
    assert first == {1: (2, 3.0), 2: (1, 5.0)}
    _write_events(spark, src, [(3, "2024-01-01 00:03:00", 1, 10.0)])
    second = drain()
    # only user 1 appears in batch 2, with state carried forward
    assert second == {1: (3, 13.0)}


def test_incremental_linkage_matches_batch(spark, inputs, fx, tmp_path):
    """Pages arriving in two file batches through the stream produce
    exactly the batch pipeline's links; the checkpoint makes run 2 skip
    run 1's files."""
    cfg = LinkerConfig()
    pages_dir = str(tmp_path / "pages")
    workdir = str(tmp_path / "wd")
    pages = inputs["pages"]
    schema = pages.schema
    b1 = pages.where(F.crc32("url") % 2 == 0)
    b2 = pages.where(F.crc32("url") % 2 == 1)

    def link(batch_df):
        return link_pages_batch(batch_df, inputs, cfg)

    b1.write.mode("append").parquet(pages_dir)
    links_path = incremental_link_pages(spark, pages_dir, workdir, link, schema)
    n_after_1 = spark.read.parquet(links_path).count()
    b2.write.mode("append").parquet(pages_dir)
    incremental_link_pages(spark, pages_dir, workdir, link, schema)

    got = spark.read.parquet(links_path)
    assert got.select("batch_id").distinct().count() == 2
    assert got.count() > n_after_1 > 0
    want = link_pages_batch(pages, inputs, cfg)
    key = ["url", "mention_id"]
    gp = got.select(*key, "item_id", "score").toPandas().sort_values(key).reset_index(drop=True)
    wp = want.select(*key, "item_id", "score").toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(gp, wp, check_dtype=False, atol=1e-9)
    # no mention linked twice despite the restart
    assert got.groupBy(*key).count().where(F.col("count") > 1).count() == 0


def test_incremental_clustering_merges_across_batches(spark, tmp_path):
    """Incremental CC maintenance: a later batch's link must MERGE two
    components formed in an earlier batch (the transitive case a
    per-batch-only clustering would get wrong), and the final state
    must equal batch connected-components over ALL links."""
    from type_filtered_entity_linker_spark.operators.clustering import (
        connected_components,
    )
    from type_filtered_entity_linker_spark.streaming.incremental import (
        incremental_cluster_links,
        read_cluster_state,
    )

    links_dir = str(tmp_path / "links")
    wd = str(tmp_path / "wd")
    cols = "url string, mention_id int, item_id string"
    # batch file 1: {a#0, a#1} -> Q1 ; {b#0} -> Q2  (two components)
    b1 = spark.createDataFrame(
        [("a", 0, "Q1"), ("a", 1, "Q1"), ("b", 0, "Q2")], cols
    )
    # batch file 2: c#0 links BOTH Q1 and Q2 -> the bridge that merges
    # them; d#0 -> Q9 opens a fresh component
    b2 = spark.createDataFrame(
        [("c", 0, "Q1"), ("c", 0, "Q2"), ("d", 0, "Q9")], cols
    )
    b1.coalesce(1).write.mode("append").parquet(links_dir)
    b2.coalesce(1).write.mode("append").parquet(links_dir)

    schema = spark.read.parquet(links_dir).schema
    metrics: list = []
    state_root = incremental_cluster_links(
        spark, links_dir, wd, schema, max_files_per_trigger=1,
        metrics=metrics,
    )
    # two triggers really ran (one per file), each with lineage metrics
    assert [m["batch_id"] for m in metrics] == [0, 1]
    assert all(m["cc_iterations"] >= 1 for m in metrics)

    got = {
        (r.mention_key, r.cluster_id)
        for r in read_cluster_state(spark, state_root).collect()
    }
    # ground truth: batch CC over the union of all link edges,
    # rekeyed to min mention key exactly like the streaming view
    all_links = spark.read.parquet(links_dir)
    edges = all_links.select(
        F.concat_ws("#", "url", "mention_id").alias("src"),
        F.concat(F.lit("E:"), F.col("item_id")).alias("dst"),
    )
    assign = connected_components(edges)
    m = assign.where(~F.col("node").startswith("E:"))
    mins = m.groupBy("cluster_id").agg(F.min("node").alias("cid"))
    want = {
        (r.node, r.cid)
        for r in m.join(mins, "cluster_id").collect()
    }
    assert got == want
    # and the bridge genuinely merged: a#*, b#0, c#0 share one cluster
    by_key = dict(got)
    assert (
        by_key["a#0"] == by_key["a#1"] == by_key["b#0"] == by_key["c#0"]
    )
    assert by_key["d#0"] != by_key["a#0"]


def test_incremental_clustering_retry_is_idempotent(spark, tmp_path):
    """Replaying the stream into the same workdir after completion (a
    crashed-then-restarted driver at worst replays the last batch)
    leaves the assignment unchanged: CC is idempotent under duplicate
    edges and each retry reads the newest snapshot below its own id."""
    from type_filtered_entity_linker_spark.streaming.incremental import (
        incremental_cluster_links,
        read_cluster_state,
    )

    links_dir = str(tmp_path / "links")
    wd = str(tmp_path / "wd")
    cols = "url string, mention_id int, item_id string"
    spark.createDataFrame(
        [("a", 0, "Q1"), ("b", 0, "Q1")], cols
    ).coalesce(1).write.mode("append").parquet(links_dir)
    schema = spark.read.parquet(links_dir).schema
    state_root = incremental_cluster_links(spark, links_dir, wd, schema)
    first = sorted(
        (r.mention_key, r.cluster_id)
        for r in read_cluster_state(spark, state_root).collect()
    )
    # new file arrives; resumed run processes ONLY it (checkpoint) —
    # and the merged state is still right
    spark.createDataFrame(
        [("c", 0, "Q1")], cols
    ).coalesce(1).write.mode("append").parquet(links_dir)
    state_root = incremental_cluster_links(spark, links_dir, wd, schema)
    second = dict(
        (r.mention_key, r.cluster_id)
        for r in read_cluster_state(spark, state_root).collect()
    )
    assert dict(first)["a#0"] == second["a#0"] == second["c#0"]
    assert len(second) == 3


def test_canonical_url_dedup_collapses_variants_across_batches(spark, tmp_path):
    from type_filtered_entity_linker_spark.streaming.incremental import (
        stream_canonical_url_dedup,
    )

    src = str(tmp_path / "crawl")
    # two raw spellings of page A delivered in SEPARATE files (separate
    # micro-batches), one page B; state must collapse A across batches
    rows_a = [("HTTPS://WWW.A.com:443/x?utm_source=f&b=2&a=1#y", "2024-01-01 00:00:00")]
    rows_b = [
        ("https://a.com/x?a=1&b=2", "2024-01-01 00:10:00"),
        ("http://b.org/", "2024-01-01 00:20:00"),
    ]
    for i, rows in enumerate([rows_a, rows_b]):
        pdf = pd.DataFrame(rows, columns=["url", "warc_ts"])
        pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    got = run_stream_once(
        stream_canonical_url_dedup(spark, src, schema),
        "t_url_dedup",
        output_mode="append",
    ).toPandas()
    assert sorted(got["canonical_url"]) == [
        "http://b.org/",
        "https://a.com/x?a=1&b=2",
    ]


def test_stream_stream_join_matches_batch_range_join(spark, tmp_path):
    """Stream-stream view->click attribution: two files (separate
    micro-batches) so matches CROSS the batch boundary — the buffered
    view from batch 1 must still join a click arriving in batch 2;
    the drained output equals the batch range join over all rows."""
    from type_filtered_entity_linker_spark.streaming.incremental import (
        stream_view_click_join,
    )

    src = str(tmp_path / "ev")
    batch1 = [
        (1, "2024-01-01 10:00:00", 7, "view", 1.0, "{}"),
        (2, "2024-01-01 10:05:00", 7, "click", 1.0, "{}"),  # in-batch hit
        (3, "2024-01-01 10:50:00", 8, "view", 1.0, "{}"),
    ]
    batch2 = [
        (4, "2024-01-01 11:20:00", 8, "click", 1.0, "{}"),  # cross-batch hit
        (5, "2024-01-01 13:00:00", 7, "click", 1.0, "{}"),  # outside 60 min
        (6, "2024-01-01 11:00:00", 9, "click", 1.0, "{}"),  # no view
    ]
    for rows in (batch1, batch2):
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    got = run_stream_once(
        stream_view_click_join(spark, src, schema),
        "t_ssjoin",
        output_mode="append",
    ).toPandas()
    assert sorted(zip(got["view_id"], got["click_id"])) == [(1, 2), (3, 4)]


def test_stream_hll_duplicate_delivery_equals_batch_sketch(spark, tmp_path):
    """HLL registers as streaming state: the same file delivered twice
    must drain to EXACTLY the batch register table over one copy
    (max-merge is idempotent under duplicates), and the estimate must
    be near-exact in the linear-counting range."""
    from type_filtered_entity_linker_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from type_filtered_entity_linker_spark.streaming.incremental import (
        stream_hll_registers,
    )

    src = str(tmp_path / "hll_ev")
    rows = [
        (i, "2024-01-01 00:00:00", i % 7, float(i)) for i in range(40)
    ]
    # two identical deliveries
    _write_events(spark, src, rows)
    _write_events(spark, src, rows)
    schema = spark.read.parquet(src).schema
    got = run_stream_once(
        stream_hll_registers(
            spark, src, schema, group_col="event_id", item_col="user_id"
        ),
        "t_stream_hll",
    )
    # batch sketch over ONE copy (distinct rows)
    one = spark.read.parquet(src).distinct().select(
        F.col("event_id").cast("string").alias("g"),
        F.col("user_id").cast("string").alias("it"),
    )
    want = hll_registers(one, "g", "it")
    got_n = got.withColumn("grp", F.col("grp").cast("string"))
    diff = got_n.exceptAll(want).count() + want.exceptAll(got_n).count()
    assert diff == 0
    ests = hll_estimate(got).collect()
    # every group has 1 distinct user; linear counting must be tight
    assert all(abs(r["hll_est"] - 1.0) < 0.2 for r in ests)


def test_watermark_lag_pin_free_on_pinned_build(spark):
    """On the pinned pyspark version the lag pin costs nothing (no
    probe job) and reports the measured constant."""
    import pyspark

    from type_filtered_entity_linker_spark.streaming import incremental as inc

    assert pyspark.__version__ == inc.WATERMARK_LAG_MEASURED_ON, (
        "pyspark upgraded: re-run the tripwire + probe, recalibrate "
        "the late-audit oracle if the lag moved, then update "
        "WATERMARK_LAG_MEASURED_ON"
    )
    assert inc.watermark_filter_lag_batches(spark) == 1


def test_watermark_lag_probe_measures_one_on_this_build(spark):
    """The behavioral probe (the loud path taken after an upgrade)
    must agree with the pinned constant on the build it was pinned
    on — this is what makes a future lag change fail loudly instead
    of silently flipping the oracle."""
    from type_filtered_entity_linker_spark.streaming.incremental import (
        measure_watermark_filter_lag,
    )

    assert measure_watermark_filter_lag(spark) == 1
