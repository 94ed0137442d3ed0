"""Resumability: kill-after-stage-k → re-run skips clean stages and
reproduces identical final clusters (SURVEY.md §5.2 item 5)."""

import shutil

from type_filtered_entity_linker_spark.config import LinkerConfig
from type_filtered_entity_linker_spark.plans.pipeline import run_pipeline


def _clusters(res):
    return sorted(map(tuple, res.clusters.collect()))


def test_resume_after_partial_delete(spark, inputs, workdir):
    cfg = LinkerConfig()
    first = run_pipeline(spark, inputs, workdir, cfg)
    want = _clusters(first)
    assert all(not m["cached"] for m in first.metrics)

    # simulate mid-run kill: downstream checkpoints lost
    shutil.rmtree(f"{workdir}/links")
    shutil.rmtree(f"{workdir}/clusters")

    second = run_pipeline(spark, inputs, workdir, cfg)
    by_stage = {m["stage"]: m for m in second.metrics}
    assert by_stage["scored"]["cached"]  # upstream skipped
    assert not by_stage["links"]["cached"]  # lost stages recomputed
    assert not by_stage["clusters"]["cached"]
    assert _clusters(second) == want


def test_config_change_invalidates(spark, inputs, workdir):
    run_pipeline(spark, inputs, workdir, LinkerConfig())
    third = run_pipeline(
        spark, inputs, workdir, LinkerConfig(candidates_limit=100)
    )
    assert all(not m["cached"] for m in third.metrics)


def test_metrics_have_lineage(spark, inputs, workdir):
    res = run_pipeline(spark, inputs, workdir, LinkerConfig())
    for m in res.metrics:
        assert m["fingerprint"] and m["rows"] >= 0 and m["partitions"] >= 1
