"""Real spark-submit --py-files run of the ingest job (north-rule packaging
requirement): the library ships as a zip, the job script runs in a fresh
driver, and the archive it writes decodes byte-exactly."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path):
    repo = "/root/repo"
    zpath = str(tmp_path / "clp_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(repo, "clp_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, repo))

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    out = str(tmp_path / "archive")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zpath,
            os.path.join(repo, "clp_spark", "job.py"),
            "--input", "/root/testdata/sf0.001/events.parquet",
            "--synthesize-transcripts",
            "--out", out,
        ],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),  # NOT the repo dir: the zip must provide the pkg
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert metrics_lines, proc.stdout[-2000:]
    metrics = json.loads(metrics_lines[-1])
    assert metrics["n_turns"] == 1000
    assert os.path.isdir(os.path.join(out, "messages"))
    assert os.path.isdir(os.path.join(out, "counts_conv"))
