"""scripts/run_validation.py — the spark-submit deployment entry point."""

import json
import subprocess
import sys

REPO = "/root/repo"


def _run(args):
    return subprocess.run(
        [sys.executable, f"{REPO}/scripts/run_validation.py", *args],
        capture_output=True,
        text=True,
        timeout=300,
    )


def _suite_file(tmp_path, passing: bool):
    suite = {
        "name": "cli",
        "expectations": [
            {
                "expectation_type": "expect_column_values_to_be_between",
                "kwargs": {
                    "column": "l_quantity",
                    "min_value": 1,
                    "max_value": 50 if passing else 10,
                },
            }
        ],
    }
    p = tmp_path / ("pass.json" if passing else "fail.json")
    p.write_text(json.dumps(suite))
    return str(p)


def test_cli_simple_pass_and_fail(tmp_path):
    out = _run(
        ["--input", "/root/testdata/sf0.001/lineitem.parquet",
         "--suite", _suite_file(tmp_path, True)]
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["success"] is True

    out2 = _run(
        ["--input", "/root/testdata/sf0.001/lineitem.parquet",
         "--suite", _suite_file(tmp_path, False)]
    )
    assert out2.returncode == 1
    payload2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert payload2["success"] is False


def test_cli_checkpoint_resume(tmp_path):
    store = str(tmp_path / "store")
    args = [
        "--input", "/root/testdata/sf0.001/lineitem.parquet",
        "--suite", _suite_file(tmp_path, True),
        "--partition-by", "l_returnflag",
        "--store", store,
        "--run-id", "cli-run-1",
    ]
    out = _run(args)
    assert out.returncode == 0, out.stderr[-2000:]
    p1 = json.loads(out.stdout.strip().splitlines()[-1])
    assert p1["partitions_run"] == 3 and p1["partitions_skipped"] == 0

    out2 = _run([*args[:-2], "--run-id", "cli-run-2"])
    assert out2.returncode == 0, out2.stderr[-2000:]
    p2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert p2["partitions_run"] == 0 and p2["partitions_skipped"] == 3


def test_cli_resume_exit_code_counts_skipped_failures(tmp_path):
    """A failing run's re-run skips completed partitions but must still
    exit 1 — the stored verdicts count (documented contract: exit 0 iff
    suite passed)."""
    store = str(tmp_path / "store2")
    args = [
        "--input", "/root/testdata/sf0.001/lineitem.parquet",
        "--suite", _suite_file(tmp_path, False),
        "--partition-by", "l_returnflag",
        "--store", store,
        "--run-id", "fail-run-1",
    ]
    out = _run(args)
    assert out.returncode == 1, out.stderr[-2000:]

    out2 = _run([*args[:-2], "--run-id", "fail-run-2"])
    p2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert p2["partitions_run"] == 0 and p2["partitions_skipped"] == 3
    assert p2["skipped_partitions_with_failures"] == 3
    assert out2.returncode == 1, "re-run must not mask stored failures"


def test_cli_clean_corpus(tmp_path):
    out_path = str(tmp_path / "cleaned.parquet")
    r = subprocess.run(
        [
            sys.executable, f"{REPO}/scripts/clean_corpus.py",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out_path,
            "--min-quality", "0.2", "--min-tokens", "3",
            "--scrub-pii", "--dedup", "exact",
            "--pack-max-tokens", "256",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["stages"][:2] == ["quality", "pii_scrub"]
    assert 0 < summary["output_rows"] <= summary["input_rows"]
    assert summary["stage_counts"]["quality"] >= summary["output_rows"]
    assert summary["packs_output"].endswith("_packs.parquet")


def test_cli_actions_config(tmp_path):
    actions = tmp_path / "actions.json"
    actions.write_text(json.dumps([
        {"name": "hook", "action": {
            "class_name": "WebhookNotificationAction",
            "module_name": "great_expectations.checkpoint",
            "url": "https://h.invalid", "notify_on": "all"}}
    ]))
    out = _run([
        "--input", "/root/testdata/sf0.001/lineitem.parquet",
        "--suite", _suite_file(tmp_path, passing=True),
        "--actions", str(actions),
    ])
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout.strip().splitlines()[-1])["success"] is True
