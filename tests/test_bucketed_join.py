"""Bucketed-table co-located joins (shuffle-free at the storage layer).

The reference runs single-process, so every lookup is an in-memory
dict (``el/entity_linker.py`` pipeline glue); the Spark-native analog
of "the tables that meet in a join live pre-partitioned on the key"
is catalog bucketing (Iceberg: ``bucket(N, key)`` + storage-partitioned
joins). These tests pin the physical contract: same-bucket-count
tables joined on the bucket key produce a SortMergeJoin with NO
Exchange on either side, and one file per bucket (the write-side
repartition trap).
"""

import os

from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.sources.tableio import write_bucketed


def _physical_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def test_bucketed_join_is_shuffle_free(spark, inputs, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("buckets"))
    pages = inputs["pages"]
    left = pages.select("url", "lang")
    right = pages.select("url", F.length("text").alias("text_len"))
    lb = write_bucketed(
        left, "t_bucket_left", "url", n_buckets=8, path=f"{base}/left"
    )
    rb = write_bucketed(
        right, "t_bucket_right", "url", n_buckets=8, path=f"{base}/right"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    try:
        # force the join shape a 100 TB fact-fact join takes (neither
        # side broadcastable); the test tables are tiny so Catalyst
        # would otherwise broadcast and hide the Exchange question
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        j = lb.join(rb, "url")
        plan = _physical_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

        # control: the same join over unbucketed frames DOES shuffle —
        # the assertion above is meaningful, not vacuous
        plan_u = _physical_plan(left.join(right, "url"))
        assert "Exchange" in plan_u

        # semantics unchanged by the storage layout
        got = {(r.url, r.lang, r.text_len) for r in j.collect()}
        want = {
            (r.url, r.lang, r.text_len)
            for r in left.join(right, "url").collect()
        }
        assert got == want and len(got) == pages.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe
            )
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bucket_left")
        spark.sql("DROP TABLE IF EXISTS t_bucket_right")


def test_bucketed_write_one_file_per_bucket(spark, inputs, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("buckets_files"))
    pages = inputs["pages"]
    write_bucketed(
        pages.select("url", "lang").repartition(16),  # simulate many tasks
        "t_bucket_files",
        "url",
        n_buckets=8,
        path=f"{base}/t",
    )
    try:
        files = [
            f
            for f in os.listdir(f"{base}/t")
            if f.endswith(".parquet") and not f.startswith("_")
        ]
        # without the matching pre-write repartition this would be up
        # to 16 tasks x 8 buckets = 128 files
        assert len(files) == 8, sorted(files)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_files")
