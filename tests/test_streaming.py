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
