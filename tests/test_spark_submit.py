"""End-to-end spark-submit --py-files deployment test (north-rule clause:
"run via spark-submit --py-files on a multi-executor cluster").

Builds the ges.zip with scripts/make_pyfiles.py, copies the entry script to
a temp dir OUTSIDE the repo (so the package is importable ONLY from the
zip — the same situation as a real cluster node), and runs a partitioned
checkpoint validation over the sf0.001 lineitem parquet through the real
``spark-submit`` binary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SUBMIT_SF", "/root/testdata/sf0.001")
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
@pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "lineitem.parquet")),
    reason="testdata missing",
)
def test_spark_submit_pyfiles_checkpoint(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_pyfiles

    zip_path = make_pyfiles.build(str(tmp_path / "ges.zip"))
    # entry script copied AWAY from the repo: its sys.path bootstrap then
    # points at a dir with no package, so the import must come from the zip
    script = shutil.copy(
        os.path.join(REPO, "scripts", "run_validation.py"), tmp_path
    )

    suite = {
        "name": "submit_smoke",
        "expectations": [
            {
                "expectation_type": "expect_column_values_to_not_be_null",
                "kwargs": {"column": "l_orderkey"},
            },
            {
                "expectation_type": "expect_column_values_to_be_between",
                "kwargs": {"column": "l_quantity", "min_value": 1, "max_value": 50},
            },
            {
                "expectation_type": "expect_table_row_count_to_be_between",
                "kwargs": {"min_value": 1, "max_value": 10**12},
            },
        ],
    }
    suite_path = tmp_path / "suite.json"
    suite_path.write_text(json.dumps(suite))

    env = dict(os.environ)
    # a PYTHONPATH pointing at the repo would defeat the zip-only check
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        script,
        "--input", os.path.join(SF_DIR, "lineitem.parquet"),
        "--suite", str(suite_path),
        "--partition-by", "l_returnflag",
        "--store", str(tmp_path / "store"),
        "--result-format", "BASIC",
    ]
    proc = subprocess.run(
        cmd, cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert payload["partitions_run"] >= 1
    assert payload["failed_expectations"] == 0
    # the store materialized on disk (results + metrics + lineage tables)
    assert os.path.exists(tmp_path / "store")
