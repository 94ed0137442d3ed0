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


def test_torn_scored_state_discarded_and_recomputed(
    spark, inputs, workdir
):
    """The exact post-SIGKILL disk states of the scored stage — parquet
    written but (a) no manifest, (b) a torn half-written manifest —
    must both read as dirty: the partial write is discarded, the stage
    recomputes, and the final clusters are identical. (The manifest is
    written strictly AFTER the parquet data, so these two states are
    the complete set a mid-write kill can leave.)"""
    import os

    cfg = LinkerConfig()
    first = run_pipeline(spark, inputs, workdir, cfg)
    want = _clusters(first)

    # state (a): kill landed between parquet write and manifest write
    os.remove(f"{workdir}/scored/_MANIFEST.json")
    # downstream of a dirty stage is dirty too in a real kill
    shutil.rmtree(f"{workdir}/links")
    shutil.rmtree(f"{workdir}/clusters")
    second = run_pipeline(spark, inputs, workdir, cfg)
    by_stage = {m["stage"]: m for m in second.metrics}
    assert not by_stage["scored"]["cached"]
    assert by_stage["candidates_topk"]["cached"]
    assert _clusters(second) == want

    # state (b): kill landed mid-manifest-write (torn JSON)
    with open(f"{workdir}/scored/_MANIFEST.json", "w") as f:
        f.write('{"fingerprint": "abc, "rows":')
    shutil.rmtree(f"{workdir}/links")
    shutil.rmtree(f"{workdir}/clusters")
    third = run_pipeline(spark, inputs, workdir, cfg)
    by_stage = {m["stage"]: m for m in third.metrics}
    assert not by_stage["scored"]["cached"]
    assert _clusters(third) == want


def test_sigkill_during_run_then_resume(tmp_path):
    """Chaos gate (VERDICT r04 item 8): SIGKILL a real pipeline
    subprocess while the scored stage is being written (scored dir
    exists, manifest not yet durable), then re-run: the fenced partial
    state recomputes and the clusters equal a clean run's."""
    import json as _json
    import os
    import signal
    import subprocess
    import sys
    import time

    wd = str(tmp_path / "chaos_wd")
    script = f"""
import sys
sys.path.insert(0, "/root/repo")
from type_filtered_entity_linker_spark.config import LinkerConfig
from type_filtered_entity_linker_spark.fixtures import (
    fixtures_to_spark, make_fixtures)
from type_filtered_entity_linker_spark.plans.pipeline import run_pipeline
from type_filtered_entity_linker_spark.session import spark_session
spark = spark_session(app_name="chaos", master="local[2]",
                      shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
fx = make_fixtures(seed=42, n_pages=200)
inputs = fixtures_to_spark(spark, fx)
run_pipeline(spark, inputs, {wd!r}, LinkerConfig())
print("PIPELINE_DONE", flush=True)
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
    )
    scored = os.path.join(wd, "scored")
    manifest = os.path.join(scored, "_MANIFEST.json")
    killed = False
    deadline = time.time() + 300
    while time.time() < deadline and proc.poll() is None:
        if os.path.isdir(scored) and not os.path.exists(manifest):
            proc.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.005)
    proc.wait(timeout=60)
    assert killed, "scored stage never appeared (or finished instantly)"
    # fencing: whatever parquet landed, the manifest must not be a
    # VALID one for this fingerprint
    from type_filtered_entity_linker_spark.sources.tableio import (
        read_manifest,
    )

    assert read_manifest(scored) is None

    # clean re-run in-process resumes upstream and recomputes scored+
    from type_filtered_entity_linker_spark.session import spark_session

    spark = spark_session(
        app_name="chaos-resume", master="local[2]", shuffle_partitions=4
    )
    from type_filtered_entity_linker_spark.fixtures import (
        fixtures_to_spark,
        make_fixtures,
    )

    fx = make_fixtures(seed=42, n_pages=200)
    inputs = fixtures_to_spark(spark, fx)
    res = run_pipeline(spark, inputs, wd, LinkerConfig())
    by_stage = {m["stage"]: m for m in res.metrics}
    assert not by_stage["scored"]["cached"]

    # ground truth: clean run in a fresh workdir
    wd2 = str(tmp_path / "clean_wd")
    clean = run_pipeline(spark, inputs, wd2, LinkerConfig())
    assert _clusters(res) == _clusters(clean)
