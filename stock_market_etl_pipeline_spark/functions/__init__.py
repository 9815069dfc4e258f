from .dateparts import pandas_day_of_week, with_date_parts
from .stock import (
    categorize_volatility,
    confidence_expr,
    predicted_change_percent_expr,
    trend_expr,
    trend_strength_expr,
    volume_category_expr,
)

__all__ = [
    "pandas_day_of_week",
    "with_date_parts",
    "categorize_volatility",
    "volume_category_expr",
    "trend_expr",
    "trend_strength_expr",
    "predicted_change_percent_expr",
    "confidence_expr",
]
