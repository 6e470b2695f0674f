"""Evaluation-parameter substitution (reference validator.py:356-361,
core/evaluation_parameters.py:307-421 — plain-name binding, no URN grammar)."""

import os

import pytest

from great_expectations_spark.core.config import (
    EvaluationParameterError,
    ExpectationConfiguration,
    ExpectationSuite,
    substitute_evaluation_parameters,
)
from great_expectations_spark.engine import SparkValidationEngine

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_substitute_nested():
    cfg = ExpectationConfiguration(
        "expect_column_values_to_be_between",
        {"column": "x", "min_value": {"$PARAMETER": "lo"}, "max_value": 10},
    )
    out = substitute_evaluation_parameters(cfg, {"lo": 3})
    assert out.kwargs == {"column": "x", "min_value": 3, "max_value": 10}
    # original untouched
    assert cfg.kwargs["min_value"] == {"$PARAMETER": "lo"}


def test_unbound_raises():
    cfg = ExpectationConfiguration(
        "expect_column_values_to_be_between",
        {"column": "x", "min_value": {"$PARAMETER": "nope"}},
    )
    with pytest.raises(EvaluationParameterError):
        substitute_evaluation_parameters(cfg, {})


def test_engine_binding_priority(spark, lineitem):
    suite = ExpectationSuite(name="ep", evaluation_parameters={"max_q": 5})
    suite.add(
        "expect_column_max_to_be_between",
        column="l_quantity",
        max_value={"$PARAMETER": "max_q"},
    )
    eng = SparkValidationEngine(spark)
    # suite-level binding: max 50 > 5 → fail
    res = eng.validate(lineitem, suite)
    assert res.results[0].success is False
    # explicit arg overrides suite-level → pass
    res2 = eng.validate(lineitem, suite, evaluation_parameters={"max_q": 100})
    assert res2.results[0].success is True


def test_unbound_parameter_becomes_failed_evr(spark, lineitem):
    suite = ExpectationSuite(name="ep2", evaluation_parameters={"other": 1})
    suite.add(
        "expect_column_max_to_be_between",
        column="l_quantity",
        max_value={"$PARAMETER": "missing"},
    )
    res = SparkValidationEngine(spark).validate(lineitem, suite)
    assert res.results[0].success is False
    assert res.results[0].exception_info["raised_exception"] is True


# ---- expression language (reference core/evaluation_parameters.py) -------


def test_expression_arithmetic_and_functions():
    from great_expectations_spark.core.eval_params import parse_evaluation_parameter as p
    import datetime
    import math

    assert p("1 + 2 * 3") == 7
    assert p("2^3^2") == 512  # right-associative exponent
    assert abs(p("cos(0) + sin(PI/2)") - 2.0) < 1e-12
    assert p("trunc(x / 3)", {"x": 10}) == 3
    assert p("x * 0.9", {"x": 20}) == 18.0
    assert isinstance(p("now()"), datetime.datetime)
    assert p("datetime(2003, 1, 1)") == datetime.datetime(2003, 1, 1)
    old = p("now() - timedelta(weeks=52*100)")
    assert old.year <= datetime.datetime.now().year - 99


def test_expression_in_suite_no_bound_params(spark, lineitem):
    """now()-style expressions substitute even with zero bound parameters."""
    suite = ExpectationSuite(name="exp")
    suite.add(
        "expect_column_max_to_be_between",
        column="l_quantity",
        max_value={"$PARAMETER": "trunc(25 * 2)"},
    )
    res = SparkValidationEngine(spark).validate(lineitem, suite)
    assert res.results[0].success is True


def test_urn_resolution_against_results_store(spark, lineitem, tmp_path):
    """Chained suites: run 1 stores observed row_count; run 2's expectation
    references it through a validations URN with ±10% arithmetic."""
    from great_expectations_spark.core.eval_params import ResultsStoreUrnResolver
    from great_expectations_spark.sources.stores import ResultsStore

    store = ResultsStore(spark, str(tmp_path / "store"))
    eng = SparkValidationEngine(spark)

    s1 = ExpectationSuite(name="daily")
    s1.add("expect_table_row_count_to_be_between", min_value=1, max_value=10**12)
    r1 = eng.validate(lineitem, s1)
    store.write_results(r1, run_id="run-1")

    urn = (
        "urn:great_expectations:validations:daily:"
        "expect_table_row_count_to_be_between.result.observed_value"
    )
    s2 = ExpectationSuite(name="tomorrow")
    s2.add(
        "expect_table_row_count_to_be_between",
        min_value={"$PARAMETER": f"trunc({urn} * 0.9)"},
        max_value={"$PARAMETER": f"trunc({urn} * 1.1)"},
    )
    res = eng.validate(lineitem, s2, urn_resolver=ResultsStoreUrnResolver(store))
    assert res.results[0].success is True
    n = lineitem.count()
    assert res.results[0].result["observed_value"] == n

    # bare URN substitutes the stored value verbatim
    s3 = ExpectationSuite(name="exact")
    s3.add(
        "expect_table_row_count_to_be_between",
        min_value={"$PARAMETER": urn},
        max_value={"$PARAMETER": urn},
    )
    res3 = eng.validate(lineitem, s3, urn_resolver=ResultsStoreUrnResolver(store))
    assert res3.results[0].success is True


def test_urn_latest_run_wins(spark, lineitem, tmp_path):
    from great_expectations_spark.core.eval_params import ResultsStoreUrnResolver
    from great_expectations_spark.sources.stores import ResultsStore

    store = ResultsStore(spark, str(tmp_path / "store2"))
    eng = SparkValidationEngine(spark)
    s = ExpectationSuite(name="d2")
    s.add("expect_column_max_to_be_between", column="l_quantity", min_value=0)
    store.write_results(eng.validate(lineitem, s), run_id="a")
    store.write_results(eng.validate(lineitem.limit(10), s), run_id="b")
    urn = (
        "urn:great_expectations:validations:d2:"
        "expect_column_max_to_be_between.result.observed_value:column=l_quantity"
    )
    v = ResultsStoreUrnResolver(store)(urn)
    small_max = lineitem.limit(10).agg({"l_quantity": "max"}).collect()[0][0]
    assert v == small_max  # second (latest) run's observed value


def test_checkpoint_actions_and_failed_partitions(spark, lineitem, tmp_path):
    """WebhookNotificationAction fires per partition + per run; lineage
    records suite_success; failed_partitions reflects the latest verdict."""
    from great_expectations_spark.sources.stores import (
        CheckpointRunner,
        ResultsStore,
        WebhookNotificationAction,
    )

    events = []
    action = WebhookNotificationAction(
        "https://example.invalid/webhook",
        notify_on="all",
        transport=lambda url, payload: events.append(payload),
    )
    fail_only = []
    fail_action = WebhookNotificationAction(
        "https://example.invalid/failures",
        notify_on="failure",
        transport=lambda url, payload: fail_only.append(payload),
    )

    store = ResultsStore(spark, str(tmp_path / "ck"))
    suite = ExpectationSuite(name="ck")
    suite.add(
        "expect_column_values_to_be_between",
        column="l_quantity", min_value=1, max_value=10,  # fails on every partition
    )
    out = CheckpointRunner(spark, store, actions=[action, fail_action]).run(
        lineitem, suite, partition_by=["l_returnflag"], input_fingerprint="fp-1"
    )
    assert len(out["partitions_failed"]) == 3
    kinds = [e["event_type"] for e in events]
    assert kinds.count("partition_validated") == 3
    assert kinds.count("run_completed") == 1
    assert all(e["success"] is False for e in fail_only if e["event_type"] == "partition_validated")
    assert len(store.failed_partitions(suite.id, "fp-1")) == 3

    # a later PASSING verdict for the same partitions supersedes the failure
    suite2 = ExpectationSuite(name="ck")
    suite2.add(
        "expect_column_values_to_be_between",
        column="l_quantity", min_value=1, max_value=50,
    )
    assert suite2.id != suite.id  # different suite → different scope
    CheckpointRunner(spark, store).run(
        lineitem, suite2, partition_by=["l_returnflag"], input_fingerprint="fp-2"
    )
    assert store.failed_partitions(suite2.id, "fp-2") == set()


def test_slack_notification_action_payload_and_gating():
    """SlackNotificationAction renders the reference SlackRenderer shape
    (blocks + abbreviated root text, status emoji, n-of-m summary) and gates
    on notify_on like the reference (actions.py:229-233). No Spark needed."""
    from great_expectations_spark.sources.stores import (
        SlackNotificationAction,
        render_slack_payload,
    )

    ok_event = {
        "event_type": "partition_validated",
        "run_id": "r-1",
        "suite_name": "nightly",
        "partition": {"l_returnflag": "A"},
        "success": True,
        "statistics": {"evaluated_expectations": 6, "successful_expectations": 5},
    }
    payload = render_slack_payload(ok_event)
    assert payload["text"] == "nightly: Success :tada:"
    body = payload["blocks"][0]["text"]["text"]
    assert "*Batch Validation Status*: Success :tada:" in body
    assert "`nightly`" in body and "`r-1`" in body
    assert "*5* of *6* expectations were met" in body
    assert payload["blocks"][1] == {"type": "divider"}
    assert payload["blocks"][2]["type"] == "context"

    done = dict(ok_event, event_type="run_completed", success=False,
                partitions_run=2, partitions_skipped=1, partitions_failed=1)
    p2 = render_slack_payload(done)
    assert p2["text"] == "nightly: Failed :x:"
    assert "2 partitions run, 1 skipped, 1 failed" in p2["blocks"][0]["text"]["text"]

    sent = []
    act = SlackNotificationAction(
        "https://hooks.slack.invalid/T000/B000",
        notify_on="failure",
        transport=lambda url, payload: sent.append(payload),
    )
    act.run(ok_event)          # success, failure-only gate -> suppressed
    assert sent == []
    act.run(done)
    assert len(sent) == 1 and sent[0]["text"].endswith("Failed :x:")
    # transport errors never propagate into the checkpoint
    def boom(url, payload):
        raise RuntimeError("slack down")
    SlackNotificationAction("u", transport=boom).run(done)


def test_email_notification_action_payload_and_gating():
    """EmailNotificationAction renders the reference EmailRenderer shape
    (subject '<suite>: <status>', <p><strong> HTML lines) and requires an
    explicit transport (no network in this container)."""
    from great_expectations_spark.sources.stores import (
        EmailNotificationAction,
        render_email_message,
    )

    event = {
        "event_type": "run_completed",
        "run_id": "r-9",
        "suite_name": "nightly",
        "success": True,
        "partitions_run": 3,
        "partitions_skipped": 0,
        "partitions_failed": 0,
    }
    msg = render_email_message(event)
    assert msg["subject"] == "nightly: Success 🎉"
    assert "<p><strong>Batch Validation Status</strong>: Success 🎉</p>" in msg["html"]
    assert "3 partitions run, 0 skipped, 0 failed" in msg["html"]

    with pytest.raises(ValueError, match="transport"):
        EmailNotificationAction(to=["a@b.c"])

    sent = []
    act = EmailNotificationAction(
        to=["oncall@example.invalid"],
        notify_on="success",
        transport=lambda to, msg: sent.append((to, msg)),
    )
    act.run(dict(event, success=False))  # success-only gate -> suppressed
    assert sent == []
    act.run(event)
    assert len(sent) == 1
    to, m = sent[0]
    assert to == ["oncall@example.invalid"] and m["to"] == to
    assert m["subject"].endswith("Success 🎉")


def test_checkpoint_global_rollup_urn_chaining(spark, lineitem, tmp_path):
    """Partition-wise checkpoint runs write global (partition_key-NULL) rows
    so validations-URN chaining resolves against checkpoint flows too:
    'conjunction' merges counts across partitions (including resume-skipped
    ones, from their latest stored rows); 'validate' runs one true global
    pass with real observed_value semantics and is itself resumable."""
    from great_expectations_spark.core.eval_params import ResultsStoreUrnResolver
    from great_expectations_spark.sources.stores import CheckpointRunner, ResultsStore

    store = ResultsStore(spark, str(tmp_path / "gr"))
    suite = ExpectationSuite(name="gr")
    suite.add(
        "expect_column_values_to_be_between",
        column="l_quantity", min_value=1, max_value=50,
    )
    runner = CheckpointRunner(spark, store)
    out1 = runner.run(
        lineitem, suite, partition_by=["l_returnflag"], input_fingerprint="fp-g"
    )
    assert len(out1["partitions_run"]) == 3

    from pyspark.sql import functions as F

    glob = store.read_results().filter(F.col("partition_key").isNull()).collect()
    assert len(glob) == 1
    total = lineitem.count()
    assert glob[0]["element_count"] == total
    assert glob[0]["success"] is True

    urn = (
        "urn:great_expectations:validations:gr:"
        "expect_column_values_to_be_between.result.element_count:column=l_quantity"
    )
    assert ResultsStoreUrnResolver(store)(urn) == total

    # resume: every partition skipped — the rollup still covers them all
    # (merged from their latest stored rows)
    out2 = runner.run(
        lineitem, suite, partition_by=["l_returnflag"], input_fingerprint="fp-g"
    )
    assert out2["partitions_run"] == [] and len(out2["partitions_skipped"]) == 3
    glob2 = (
        store.read_results()
        .filter(F.col("partition_key").isNull())
        .orderBy(F.desc("created_at"))
        .collect()
    )
    assert len(glob2) == 2 and glob2[0]["element_count"] == total

    # 'validate' mode: real global observed_value, resumable as '__global__'
    store_v = ResultsStore(spark, str(tmp_path / "grv"))
    suite_v = ExpectationSuite(name="grv")
    suite_v.add("expect_column_max_to_be_between", column="l_quantity", min_value=0)
    runner_v = CheckpointRunner(spark, store_v)
    runner_v.run(
        lineitem, suite_v, partition_by=["l_returnflag"],
        input_fingerprint="fp-v", global_rollup="validate",
    )
    urn_v = (
        "urn:great_expectations:validations:grv:"
        "expect_column_max_to_be_between.result.observed_value:column=l_quantity"
    )
    vmax = lineitem.agg({"l_quantity": "max"}).collect()[0][0]
    assert ResultsStoreUrnResolver(store_v)(urn_v) == vmax
    runner_v.run(
        lineitem, suite_v, partition_by=["l_returnflag"],
        input_fingerprint="fp-v", global_rollup="validate",
    )
    lin = store_v.spark.read.parquet(str(tmp_path / "grv" / "lineage"))
    assert lin.filter(F.col("partition_key") == "__global__").count() == 1


def test_checkpoint_validate_rollup_global_failure_fails_first_run(
    spark, lineitem, tmp_path
):
    """global_rollup='validate' exists to catch whole-table failures the
    per-partition passes can't see (cross-partition uniqueness, global
    row-count bounds). A first, non-resumed run whose GLOBAL pass fails must
    report success=false (ADVICE r3: the summary only counted
    partition_key-NOT-NULL rows, so run 1 exited 0 and the resumed run 2
    exited 1 — inconsistent)."""
    from pyspark.sql import functions as F

    from great_expectations_spark.sources.checkpoint_config import (
        load_checkpoint_config,
        run_checkpoint,
    )

    total = lineitem.count()
    biggest = (
        lineitem.groupBy("l_returnflag").count().agg(F.max("count")).collect()[0][0]
    )
    bound = (biggest + total) // 2  # every partition passes, the table fails
    doc = {
        "name": "gval",
        "batch": {"path": f"{SF_DIR}/lineitem.parquet"},
        "suite": {
            "name": "gval",
            "expectations": [
                {
                    "expectation_type": "expect_table_row_count_to_be_between",
                    "kwargs": {"min_value": 0, "max_value": int(bound)},
                }
            ],
        },
        "partition_by": ["l_returnflag"],
        "store": str(tmp_path / "gvalstore"),
        "global_rollup": "validate",
    }
    cfg = load_checkpoint_config(doc, env={})
    out1 = run_checkpoint(spark, cfg, run_id="gval-1")
    assert out1["partitions_run"] == 3
    assert out1["failed_expectations"] == 1, "global failing row must count"
    assert out1["success"] is False

    # resumed run: everything (incl. '__global__') skips, verdict consistent
    out2 = run_checkpoint(spark, cfg, run_id="gval-2")
    assert out2["partitions_run"] == 0 and out2["partitions_skipped"] == 3
    assert out2["success"] is False


def test_checkpoint_null_partition_key_and_fingerprint_scoping(spark, tmp_path):
    """(1) A NULL partition-key value must validate ITS rows, not an empty
    frame; (2) the conjunction rollup for resume-skipped partitions must pull
    rows from the run that validated THIS fingerprint, not newer rows of the
    same suite on different data."""
    from pyspark.sql import functions as F

    from great_expectations_spark.sources.stores import CheckpointRunner, ResultsStore

    store = ResultsStore(spark, str(tmp_path / "nfp"))
    runner = CheckpointRunner(spark, store)

    # (1) null partition key: the k>=100 rows live under fmt=NULL and FAIL
    df_null = spark.createDataFrame(
        [("a", 1), ("a", 2), (None, 500), (None, 501)], ["fmt", "k"]
    )
    s = ExpectationSuite(name="nullpart")
    s.add("expect_column_values_to_be_between", column="k", min_value=0, max_value=100)
    out = runner.run(df_null, s, partition_by=["fmt"], input_fingerprint="fp-n")
    assert len(out["partitions_run"]) == 2
    assert {p["fmt"] for p in out["partitions_failed"]} == {None}
    null_rows = store.read_results().filter(
        F.col("partition_key") == '{"fmt": null}'
    ).collect()
    assert null_rows and null_rows[0]["element_count"] == 2
    assert null_rows[0]["unexpected_count"] == 2

    # (2) fingerprint scoping: same suite name+id, two datasets sharing keys
    store2 = ResultsStore(spark, str(tmp_path / "scope"))
    runner2 = CheckpointRunner(spark, store2)
    s2 = ExpectationSuite(name="scoped")
    s2.add("expect_column_values_to_not_be_null", column="k")
    march = spark.createDataFrame([("x", 1)] * 10, ["fmt", "k"])
    april = spark.createDataFrame([("x", 1)] * 99, ["fmt", "k"])
    runner2.run(march, s2, partition_by=["fmt"], input_fingerprint="fp-march")
    runner2.run(april, s2, partition_by=["fmt"], input_fingerprint="fp-april")
    out3 = runner2.run(march, s2, partition_by=["fmt"], input_fingerprint="fp-march")
    assert out3["partitions_run"] == [] and len(out3["partitions_skipped"]) == 1
    latest_global = (
        store2.read_results()
        .filter(F.col("partition_key").isNull())
        .orderBy(F.desc("created_at"))
        .collect()[0]
    )
    # must be March's 10 rows (lineage-scoped), NOT April's newer 99
    assert latest_global["element_count"] == 10


def test_urn_resolver_skips_null_field_rows(spark, lineitem, tmp_path):
    """A conjunction rollup row (observed_value NULL) must not bind None into
    a chained parameter — the resolver falls through to an older row that
    has the field."""
    from great_expectations_spark.core.eval_params import ResultsStoreUrnResolver
    from great_expectations_spark.sources.stores import CheckpointRunner, ResultsStore

    store = ResultsStore(spark, str(tmp_path / "nullskip"))
    eng = SparkValidationEngine(spark)
    s = ExpectationSuite(name="ns")
    s.add("expect_column_max_to_be_between", column="l_quantity", min_value=0)
    # older engine run: real observed_value
    store.write_results(eng.validate(lineitem, s), run_id="real")
    # newer checkpoint run: conjunction rollup row with observed_value NULL
    CheckpointRunner(spark, store).run(
        lineitem, s, partition_by=["l_returnflag"], input_fingerprint="fp"
    )
    urn = (
        "urn:great_expectations:validations:ns:"
        "expect_column_max_to_be_between.result.observed_value:column=l_quantity"
    )
    vmax = lineitem.agg({"l_quantity": "max"}).collect()[0][0]
    assert ResultsStoreUrnResolver(store)(urn) == vmax


def test_reference_format_suite_loads_and_runs(spark, lineitem, tmp_path):
    """A suite JSON written by the reference (ExpectationSuiteSchema key
    layout: expectation_suite_name / data_asset_type / ge_cloud_id, with
    $PARAMETER-URN kwargs — core/expectation_suite.py:970-976) loads
    unchanged, runs end-to-end against a store, and round-trips back to the
    reference key layout."""
    import json

    from great_expectations_spark.core.eval_params import ResultsStoreUrnResolver
    from great_expectations_spark.sources.stores import ResultsStore

    store = ResultsStore(spark, str(tmp_path / "refstore"))
    eng = SparkValidationEngine(spark)
    seed = ExpectationSuite(name="upstream.default")
    seed.add("expect_table_row_count_to_be_between", min_value=1, max_value=10**12)
    store.write_results(eng.validate(lineitem, seed), run_id="run-1")

    ref_json = json.dumps(
        {
            "expectation_suite_name": "downstream.default",
            "data_asset_type": "Dataset",
            "ge_cloud_id": None,
            "meta": {"great_expectations_version": "0.15.21"},
            "expectations": [
                {
                    "expectation_type": "expect_table_row_count_to_equal",
                    "kwargs": {
                        "value": {
                            "$PARAMETER": (
                                "urn:great_expectations:validations:upstream.default:"
                                "expect_table_row_count_to_be_between.result.observed_value"
                            )
                        }
                    },
                },
                {
                    "expectation_type": "expect_column_values_to_not_be_null",
                    "kwargs": {"column": "l_orderkey"},
                    "meta": None,
                },
            ],
        }
    )
    suite = ExpectationSuite.from_json(ref_json)
    assert suite.name == "downstream.default"
    assert suite.meta["reference_extras"] == {"data_asset_type": "Dataset"}

    res = eng.validate(lineitem, suite, urn_resolver=ResultsStoreUrnResolver(store))
    assert res.success is True
    assert res.results[0].result["observed_value"] == lineitem.count()

    out = suite.to_reference_dict()
    assert out["expectation_suite_name"] == "downstream.default"
    assert out["data_asset_type"] == "Dataset"
    assert "name" not in out and "reference_extras" not in out.get("meta", {})
    # round-trip is stable
    assert ExpectationSuite.from_dict(out).to_reference_dict() == out


def test_pagerduty_action_payload_and_gating():
    """PagerdutyAlertAction builds the reference's Events-v2 enqueue body
    (routing_key / dedup_key=suite / trigger / critical payload,
    actions.py:336-349) and defaults to notify_on='failure'."""
    from great_expectations_spark.sources.stores import (
        PagerdutyAlertAction,
        render_pagerduty_event,
    )

    ev_fail = {"event_type": "run_completed", "suite_name": "s1", "success": False}
    body = render_pagerduty_event(ev_fail, routing_key="rk-123")
    assert body["routing_key"] == "rk-123"
    assert body["dedup_key"] == "s1"
    assert body["event_action"] == "trigger"
    assert body["payload"]["severity"] == "critical"

    sent = []
    act = PagerdutyAlertAction(
        "rk-123", transport=lambda url, p: sent.append((url, p))
    )
    act.run({"suite_name": "s1", "success": True})  # default failure gate
    assert sent == []
    act.run(ev_fail)
    assert len(sent) == 1 and sent[0][0] == PagerdutyAlertAction.DEFAULT_URL
    import pytest as _pytest

    with _pytest.raises(ValueError):
        PagerdutyAlertAction("")


def test_opsgenie_action_payload_and_gating():
    from great_expectations_spark.sources.stores import (
        OpsgenieAlertAction,
        render_opsgenie_payload,
    )

    ev = {
        "event_type": "partition_validated",
        "suite_name": "s2",
        "run_id": "r-9",
        "partition": {"fmt": "png"},
        "success": False,
        "statistics": {"evaluated_expectations": 4, "successful_expectations": 1},
    }
    p = render_opsgenie_payload(ev, priority="P2", tags=["etl"])
    assert p["message"] == "expectation suite s2 failed"
    assert "1 of 4 expectations were met" in p["description"]
    assert p["priority"] == "P2" and p["tags"] == ["etl"]

    sent = []
    act = OpsgenieAlertAction(
        "key-1", region="eu", transport=lambda url, payload: sent.append(url)
    )
    act.run(dict(ev, success=True))
    assert sent == []
    act.run(ev)
    assert sent == ["https://api.eu.opsgenie.com/v2/alerts"]


def test_teams_action_payload_and_gating():
    from great_expectations_spark.sources.stores import (
        MicrosoftTeamsNotificationAction,
        render_teams_payload,
    )

    ev = {
        "event_type": "partition_validated",
        "suite_name": "s3",
        "run_id": "r-2",
        "success": True,
        "statistics": {"evaluated_expectations": 3, "successful_expectations": 3},
    }
    msg = render_teams_payload(ev)
    assert msg["type"] == "message"
    card = msg["attachments"][0]
    assert card["contentType"] == "application/vnd.microsoft.card.adaptive"
    texts = [
        item["items"][0]["text"] for item in card["content"]["body"]
    ]
    assert texts[0] == "Validation results"
    assert any("Success !!!" in t for t in texts)
    assert any("3 of 3 expectations were met" in t for t in texts)

    sent = []
    act = MicrosoftTeamsNotificationAction(
        "https://outlook.office.invalid/webhook",
        notify_on="success",
        transport=lambda url, payload: sent.append(payload),
    )
    act.run(dict(ev, success=False))
    assert sent == []
    act.run(ev)
    assert len(sent) == 1


def test_sns_action_message_and_gating():
    """SNSNotificationAction renders the reference send_sns_notification
    publish kwargs (checkpoint/util.py:517-525) and requires an explicit
    transport (no AWS client in this engine)."""
    import json as _json

    import pytest as _pytest

    from great_expectations_spark.sources.stores import (
        SNSNotificationAction,
        render_sns_message,
    )

    ev = {"event_type": "run_completed", "suite_name": "s4", "run_id": "r-7", "success": True}
    msg = render_sns_message(ev, "arn:aws:sns:us-east-1:1:topic", None)
    assert msg["Subject"] == "s4"  # falls back to suite name
    assert msg["MessageStructure"] == "json"
    assert msg["MessageAttributes"]["String"]["StringValue"] == "ValidationResults"
    assert _json.loads(msg["Message"])["run_id"] == "r-7"
    assert render_sns_message({"run_id": "r-9"}, "arn", None)["Subject"] == "r-9"

    with _pytest.raises(ValueError, match="explicit transport"):
        SNSNotificationAction("arn")
    sent = []
    act = SNSNotificationAction(
        "arn", sns_message_subject="daily", notify_on="failure",
        transport=lambda arn, kw: sent.append((arn, kw)),
    )
    act.run(ev)
    assert sent == []
    act.run(dict(ev, success=False))
    assert len(sent) == 1 and sent[0][1]["Subject"] == "daily"


def test_from_dict_does_not_mutate_input():
    d = {
        "expectation_suite_name": "s",
        "ge_cloud_id": "G",
        "meta": {"reference_extras": {"data_asset_type": "D"}},
        "expectations": [],
    }
    import copy

    snapshot = copy.deepcopy(d)
    suite = ExpectationSuite.from_dict(d)
    assert d == snapshot  # caller's dict untouched
    suite.meta["reference_extras"]["x"] = 1
    assert d == snapshot  # no aliasing of the nested dict either


def test_action_from_config_shapes():
    from great_expectations_spark.sources.stores import (
        OpsgenieAlertAction,
        SlackNotificationAction,
        action_from_config,
    )

    bare = action_from_config(
        {"class_name": "SlackNotificationAction", "url": "https://h", "notify_on": "failure"}
    )
    assert isinstance(bare, SlackNotificationAction) and bare.notify_on == "failure"
    # the reference's action_list entry shape
    wrapped = action_from_config(
        {
            "name": "send_opsgenie_alert_on_validation_result",
            "action": {"class_name": "OpsgenieAlertAction", "api_key": "k", "region": "eu"},
        }
    )
    assert isinstance(wrapped, OpsgenieAlertAction)
    assert wrapped.url == "https://api.eu.opsgenie.com/v2/alerts"
    with pytest.raises(ValueError, match="unknown action class_name"):
        action_from_config({"class_name": "UpdateDataDocsAction"})
    # transport-required actions surface their own explicit error
    with pytest.raises(ValueError, match="explicit transport"):
        action_from_config({"class_name": "SNSNotificationAction", "sns_topic_arn": "arn"})


def test_action_from_config_strips_reference_structural_keys():
    from great_expectations_spark.sources.stores import (
        SlackNotificationAction,
        action_from_config,
    )

    a = action_from_config(
        {
            "name": "send_slack",
            "action": {
                "class_name": "SlackNotificationAction",
                "module_name": "great_expectations.checkpoint",
                "renderer": {"class_name": "SlackRenderer"},
                "notify_with": None,
                "url": "https://h",
            },
        }
    )
    assert isinstance(a, SlackNotificationAction) and a.url == "https://h"


def test_run_completed_render_without_partition_counts():
    from great_expectations_spark.sources.stores import (
        render_email_message,
        render_slack_payload,
    )

    ev = {
        "event_type": "run_completed",
        "suite_name": "s",
        "run_id": "r",
        "success": False,
        "statistics": {"evaluated_expectations": 4, "successful_expectations": 1},
    }
    body = render_slack_payload(ev)["blocks"][0]["text"]["text"]
    assert "partitions run" not in body
    assert "*1* of *4* expectations were met" in body
    html = render_email_message(ev)["html"]
    assert "partitions run" not in html and "of <strong>4</strong>" in html
    # checkpoint-shaped events keep the partitions line
    ck = dict(ev, partitions_run=3, partitions_skipped=1, partitions_failed=1)
    assert "3 partitions run" in render_slack_payload(ck)["blocks"][0]["text"]["text"]


def test_checkpoint_document_evaluation_parameters_partitioned(
    spark, lineitem, tmp_path
):
    """A checkpoint document's evaluation_parameters must reach the
    store+partition_by execution path (they were silently dropped there):
    a $PARAMETER-bounded suite passes per partition only when the bound
    parameter is applied."""
    import json as _json

    from great_expectations_spark.sources.checkpoint_config import (
        load_checkpoint_config,
        run_checkpoint,
    )

    suite_path = tmp_path / "s.json"
    suite_path.write_text(_json.dumps({
        "name": "evalp",
        "expectations": [{
            "expectation_type": "expect_column_values_to_be_between",
            "kwargs": {
                "column": "l_quantity",
                "min_value": 0,
                "max_value": {"$PARAMETER": "qty_cap"},
            },
        }],
    }))
    cfg = load_checkpoint_config({
        "name": "evalp-ckpt",
        "batch": {"path": "/root/testdata/sf0.001/lineitem.parquet"},
        "suite": str(suite_path),
        "partition_by": ["l_returnflag"],
        "store": str(tmp_path / "store"),
        "evaluation_parameters": {"qty_cap": 1000},
    }, env={})
    out = run_checkpoint(spark, cfg, run_id="r1")
    assert out["success"] is True and out["partitions_run"] >= 2


def test_checkpoint_env_substitution_skips_suite_data_and_digit_dollars():
    """Inline suite kwargs are data, not config: '$100' in a value_set (and
    any digit-led dollar) must pass through untouched, while real $VARs in
    config strings still substitute and unknown identifier $VARs raise."""
    import pytest as _pytest

    from great_expectations_spark.sources.checkpoint_config import (
        substitute_env_variables,
    )

    doc = {
        "store": "$ROOT/results",
        "suite": {
            "name": "s",
            "expectations": [{
                "expectation_type": "expect_column_values_to_be_in_set",
                "kwargs": {"column": "price", "value_set": ["$100", "$250"]},
            }],
        },
        "run_name_template": "run-$100-%Y",  # digit-led: not a variable
    }
    got = substitute_env_variables(doc, {"ROOT": "/data"})
    assert got["store"] == "/data/results"
    assert got["suite"]["expectations"][0]["kwargs"]["value_set"] == ["$100", "$250"]
    assert got["run_name_template"] == "run-$100-%Y"
    with _pytest.raises(KeyError, match="UNDEFINED"):
        substitute_env_variables({"store": "$UNDEFINED"}, {})


def test_checkpoint_template_merges_nested_dicts_recursively(tmp_path):
    """batch.reader_options from the template must survive a document that
    overrides only one of its keys (second-level merge, not replacement)."""
    import json as _json

    from great_expectations_spark.sources.checkpoint_config import (
        load_checkpoint_config,
    )

    (tmp_path / "t.json").write_text(_json.dumps({
        "config_version": 1.0,
        "batch": {
            "path": "/data/x.csv",
            "reader_options": {"header": "true", "sep": "|"},
        },
    }))
    doc = tmp_path / "c.json"
    doc.write_text(_json.dumps({
        "name": "nested",
        "suite": "s.json",
        "template": "t.json",
        "batch": {"reader_options": {"quote": "'"}},
    }))
    cfg = load_checkpoint_config(str(doc), env={})
    assert cfg.batch["reader_options"] == {
        "header": "true", "sep": "|", "quote": "'",
    }
    assert cfg.batch["path"] == "/data/x.csv"


def test_checkpoint_resume_revalidates_on_changed_parameters(
    spark, lineitem, tmp_path
):
    """Changed evaluation_parameters must NOT resume from the old lineage:
    the fingerprint is salted with the parameter values, so a re-run with a
    tighter bound revalidates every partition and reports the new verdicts
    instead of the stale passes."""
    import json as _json

    from great_expectations_spark.sources.checkpoint_config import (
        load_checkpoint_config,
        run_checkpoint,
    )

    suite_path = tmp_path / "s.json"
    suite_path.write_text(_json.dumps({
        "name": "evalp2",
        "expectations": [{
            "expectation_type": "expect_column_values_to_be_between",
            "kwargs": {
                "column": "l_quantity",
                "min_value": 0,
                "max_value": {"$PARAMETER": "qty_cap"},
            },
        }],
    }))
    base = {
        "name": "evalp2-ckpt",
        "batch": {"path": "/root/testdata/sf0.001/lineitem.parquet"},
        "suite": str(suite_path),
        "partition_by": ["l_returnflag"],
        "store": str(tmp_path / "store2"),
    }
    loose = load_checkpoint_config(
        {**base, "evaluation_parameters": {"qty_cap": 1000}}, env={}
    )
    out1 = run_checkpoint(spark, loose, run_id="r1")
    assert out1["success"] is True and out1["partitions_skipped"] == 0

    # same parameters resume: everything skips
    out1b = run_checkpoint(spark, loose, run_id="r1b")
    assert out1b["partitions_run"] == 0 and out1b["partitions_skipped"] >= 2

    # tightened parameter: every partition REVALIDATES and now fails
    tight = load_checkpoint_config(
        {**base, "evaluation_parameters": {"qty_cap": 1}}, env={}
    )
    out2 = run_checkpoint(spark, tight, run_id="r2")
    assert out2["partitions_skipped"] == 0
    assert out2["partitions_run"] >= 2
    assert out2["success"] is False
