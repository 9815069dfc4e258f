"""Alert payload construction (SURVEY.md §2.1 S11/S12) — data, not I/O.

The reference sends HTML email (``src/alerts.py:11-91``) and Slack
Block-Kit JSON (``src/slack_alerts.py:9-109``) as pipeline side effects.
In the engine, alerting is a pure payload-construction layer: the pipeline
returns records, and the transport (SMTP/webhook) is deployment glue kept
outside — so alerts are testable, replayable, and don't couple the plan to
network effects. The payload shapes mirror the reference's fields.
"""

from __future__ import annotations

from dataclasses import asdict
from datetime import datetime, timezone
from typing import Any

from .pipeline import PipelineResult

_STATUS_EMOJI = {"success": "✅", "warning": "⚠️", "failure": "❌"}


def classify(result: PipelineResult) -> str:
    if not result.success:
        return "failure"
    if not result.validation_passed:
        return "warning"
    return "success"


def email_payload(result: PipelineResult, run_id: str) -> dict[str, Any]:
    """Subject/body fields matching the reference's mail content
    (src/alerts.py:94-157 wrappers)."""
    status = classify(result)
    return {
        "subject": f"{_STATUS_EMOJI[status]} Stock ETL Pipeline: {status.upper()}",
        "status": status,
        "body": {
            "run_id": run_id,
            "records_loaded": result.records_loaded,
            "unique_symbols": result.unique_symbols,
            "validation_rate": round(result.validation_rate * 100, 1),
            "sink_path": result.sink_path,
            "completed_at": datetime.now(timezone.utc).isoformat(),
        },
    }


def slack_payload(result: PipelineResult, run_id: str) -> dict[str, Any]:
    """Block-Kit-shaped message (src/slack_alerts.py:9-109)."""
    status = classify(result)
    fields = [
        f"*Records:* {result.records_loaded:,}",
        f"*Symbols:* {result.unique_symbols}",
        f"*Validation:* {result.validation_rate:.0%}",
    ]
    return {
        "blocks": [
            {
                "type": "header",
                "text": {
                    "type": "plain_text",
                    "text": f"{_STATUS_EMOJI[status]} Stock ETL {status.upper()}",
                },
            },
            {
                "type": "section",
                "fields": [{"type": "mrkdwn", "text": f} for f in fields],
            },
            {
                "type": "context",
                "elements": [
                    {"type": "mrkdwn", "text": f"run `{run_id}` → {result.sink_path}"}
                ],
            },
        ],
        "status": status,
        "result": asdict(result),
    }
