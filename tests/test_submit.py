"""Deployment-surface test (SURVEY §3 E1; north rule "run via spark-submit
--py-files"): the batch job really runs under ``spark-submit`` with the
engine imported from a ``--py-files`` zip — not from the repo checkout —
and its tier outputs are bit-identical to an in-process run.

The job script is copied to a temp directory and submitted from there, so
neither the driver's cwd, the script's parent directory, nor rollup.py's
own ``sys.path.insert`` (which points at the *temp* parent) can resolve the
package; the only way the import succeeds is through the shipped zip —
exactly the path a 1000-executor cluster uses.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "features_engineering_of_motion_data_spark"
TIERS = ["1m", "1h", "1d"]


def _build_zip(dest: str) -> str:
    path = os.path.join(dest, "engine.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return path


def _read_tiers(root: str) -> dict[str, pd.DataFrame]:
    out = {}
    for t in TIERS:
        df = pd.read_parquet(os.path.join(root, f"tier={t}"))
        df["s2"] = df["s2"].map(int)
        out[t] = df.sort_values(
            ["conv_id", "channel", "bucket_start"], kind="mergesort"
        ).reset_index(drop=True)
    return out


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_matches_in_process(tmp_path, tiny_path):
    from jobs.rollup import parse_args, run

    expected_out = str(tmp_path / "expected")
    args = ["--input", tiny_path, "--tiers", ",".join(TIERS), "--num-parts", "4",
            "--output", expected_out, "--master", "local[4]"]
    assert run(parse_args(args)) == 0

    # stage the deployment artifacts away from the repo
    zip_path = _build_zip(str(tmp_path))
    job_path = str(tmp_path / "submitted_rollup.py")
    shutil.copyfile(os.path.join(REPO, "jobs", "rollup.py"), job_path)
    submit_out = str(tmp_path / "submitted")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=2g",
            "--py-files", zip_path,
            job_path,
            "--input", tiny_path,
            "--output", submit_out,
            "--tiers", ",".join(TIERS),
            "--num-parts", "4",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    a, b = _read_tiers(expected_out), _read_tiers(submit_out)
    for t in TIERS:
        pd.testing.assert_frame_equal(a[t], b[t], check_exact=True)


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_features_matrix_matches_in_process(tmp_path, tiny_path):
    """The feature-matrix job is deployable the same way: spark-submit
    --py-files with the script staged outside the repo, output bit-identical
    to an in-process run."""
    from jobs.features import parse_args, run

    expected_out = str(tmp_path / "expected_matrix")
    args = ["--input", tiny_path, "--output", expected_out, "--tier", "1h",
            "--master", "local[4]"]
    assert run(parse_args(args)) == 0

    zip_path = _build_zip(str(tmp_path))
    job_path = str(tmp_path / "submitted_features.py")
    shutil.copyfile(os.path.join(REPO, "jobs", "features.py"), job_path)
    submit_out = str(tmp_path / "submitted_matrix")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=2g",
            "--py-files", zip_path,
            job_path,
            "--input", tiny_path,
            "--output", submit_out,
            "--tier", "1h",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    def _read(root):
        df = pd.read_parquet(os.path.join(root, "tier=1h"))
        return df.sort_values(
            ["conv_id", "bucket_start"], kind="mergesort"
        ).reset_index(drop=True)

    pd.testing.assert_frame_equal(
        _read(expected_out), _read(submit_out), check_exact=True
    )
