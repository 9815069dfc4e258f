from .analytics import (
    db_summary,
    performance_summary,
    predictions,
    top_movers,
    trading_signals,
)
from .quality import CheckResult, run_quality_suite, stock_quality_checks

__all__ = [
    "predictions",
    "trading_signals",
    "top_movers",
    "performance_summary",
    "db_summary",
    "run_quality_suite",
    "stock_quality_checks",
    "CheckResult",
]
