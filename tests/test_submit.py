"""spark-submit --py-files deployment smoke (north-rule run mode):
package the engine as a zip, submit a tiny fixture job in a separate
JVM, and check the JSON summary + resume behavior."""

import json
import os
import shutil
import subprocess

import pytest

REPO = "/root/repo"


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_submit_py_files_end_to_end(tmp_path):
    wd = str(tmp_path / "wd")

    def run():
        out = subprocess.run(
            [
                "bash", f"{REPO}/scripts/submit.sh",
                "--master", "local[4]",
                "--workdir", wd, "--n-pages", "120",
            ],
            capture_output=True, text=True, timeout=420,
            env=dict(os.environ, SPARK_DRIVER_MEM="4g"),
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        assert lines, f"no JSON summary; stderr tail: {out.stderr[-2000:]}"
        return json.loads(lines[-1])

    first = run()
    assert first["n_links"] > 0 and first["n_clusters"] > 0
    assert all(not s["cached"] for s in first["stages"])
    second = run()
    assert all(s["cached"] for s in second["stages"])
    assert second["n_links"] == first["n_links"]
