"""Alert payload construction tests (pure data — no network)."""

from stock_market_etl_pipeline_spark.alerts import (
    classify,
    email_payload,
    slack_payload,
)
from stock_market_etl_pipeline_spark.pipeline import PipelineResult


def _result(**kw):
    base = dict(
        success=True, validation_rate=1.0, validation_passed=True,
        records_loaded=1000, unique_symbols=10, sink_path="/tmp/x",
    )
    base.update(kw)
    return PipelineResult(**base)


def test_classify_levels():
    assert classify(_result()) == "success"
    assert classify(_result(validation_passed=False, validation_rate=0.8)) == "warning"
    assert classify(_result(success=False)) == "failure"


def test_email_payload_fields():
    p = email_payload(_result(), run_id="r1")
    assert "SUCCESS" in p["subject"]
    assert p["body"]["records_loaded"] == 1000
    assert p["body"]["validation_rate"] == 100.0


def test_slack_payload_blockkit_shape():
    p = slack_payload(_result(validation_passed=False, validation_rate=0.85), "r2")
    assert p["status"] == "warning"
    types = [b["type"] for b in p["blocks"]]
    assert types == ["header", "section", "context"]
    assert any("85%" in f["text"] for f in p["blocks"][1]["fields"])
