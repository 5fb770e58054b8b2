"""spark-submit --py-files execution mode (the north_rule's stated run
mechanism): package the library into a zip, launch jobs/run_pipeline.py
through the real spark-submit binary with ONLY the zip on --py-files, and
check the pipeline's counters — proving the package is fully importable
from the archive (no repo checkout needed on executors)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit binary")
def test_spark_submit_pyfiles_roundtrip(tmp_path):
    sys.path.insert(0, REPO)
    from tools.package import build

    zip_path = build(str(tmp_path / "dist"))
    out_dir = str(tmp_path / "kg_out")
    p = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "run_pipeline.py"),
            "--synth-convs", "80",
            "--output", out_dir,
            "--n-parts", "2",
        ],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # NOT the repo root: imports must come from the zip
    )
    assert p.returncode == 0, p.stderr[-2000:]
    report = json.loads([ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1])
    assert report["mode"] == "full"
    assert report["counters"]["triples_emitted"] > 0
    assert report["processed_partitions"] == 2
    # the emitted tables landed
    assert os.path.isdir(os.path.join(out_dir, "edges"))
    assert os.path.isdir(os.path.join(out_dir, "checkpoints"))
