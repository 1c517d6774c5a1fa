"""spark-submit --py-files deployment contract (north-rule shape).

The north rule requires the pipeline to run "via spark-submit
--py-files on a multi-executor cluster".  This test runs the REAL
thing end-to-end in the sandbox: package the engine into a zip
(tools/make_pyfiles_zip.py), launch tools/and_submit_job.py through
the pyspark-shipped spark-submit against a local-cluster master (two
real executor JVMs), with the repo scrubbed from PYTHONPATH and the
working directory moved away — so the ONLY way the job can find the
engine is the --py-files zip.  Provenance is asserted, not assumed:
the job reports where the package was imported from.

A second submit against the same --stage-dir must resume from the
stage manifests (no stage rewritten — byte-identical manifests and
untouched mtimes) and reproduce the metrics, the rule's
"resumable from checkpoint" clause in deployment shape.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.path.dirname(pyspark.__file__), "bin", "spark-submit"
)


def _run_submit(tmp: str, zip_path: str, stage_dir: str) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local-cluster[2,2,2048]",
            "--driver-memory",
            "4g",
            "--py-files",
            zip_path,
            os.path.join(REPO, "tools", "and_submit_job.py"),
            "--entities",
            "25",
            "--num-buckets",
            "2",
            "--stage-dir",
            stage_dir,
        ],
        cwd=tmp,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [
        l for l in proc.stdout.splitlines() if l.startswith("METRICS_JSON=")
    ]
    assert len(lines) == 1, proc.stdout[-2000:]
    return json.loads(lines[0].removeprefix("METRICS_JSON="))


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not shipped"
)
def test_spark_submit_pyfiles_roundtrip(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles_zip import build_zip
    finally:
        sys.path.pop(0)
    zip_path = build_zip(str(tmp_path / "pubmed_and_method_spark.zip"))
    stage_dir = str(tmp_path / "stages")

    m1 = _run_submit(str(tmp_path), zip_path, stage_dir)
    # Provenance: the engine came from the shipped zip, not a checkout.
    assert "pubmed_and_method_spark.zip/" in m1["package_file"]
    assert not m1["package_file"].startswith(REPO)
    assert m1["master"] == "local-cluster[2,2,2048]"
    assert m1["clusters"]["f1"] >= 0.99
    assert m1["n_pairs"] > 0

    manifests = sorted(
        f for f in os.listdir(stage_dir) if f.endswith(".manifest.json")
    )
    assert manifests, "no stage manifests written"
    before = {
        f: (
            os.path.getmtime(os.path.join(stage_dir, f)),
            open(os.path.join(stage_dir, f)).read(),
        )
        for f in manifests
    }

    m2 = _run_submit(str(tmp_path), zip_path, stage_dir)
    assert m2["clusters"] == m1["clusters"]
    assert m2["n_pairs"] == m1["n_pairs"]
    after = {
        f: (
            os.path.getmtime(os.path.join(stage_dir, f)),
            open(os.path.join(stage_dir, f)).read(),
        )
        for f in before
    }
    # Resume served every stage from storage: manifests untouched.
    assert after == before
