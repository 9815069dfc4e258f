"""Watermarked stream-stream join: correlate two live event streams on a
key plus an event-time interval, with bounded state.

The reference joins its feeds only at rest (warehouse tables); the
streaming-native equivalent is Structured Streaming's stream-stream inner
join, where BOTH sides buffer rows in state and the join's time-range
condition + watermarks bound how long: a click can only match views at
most ``max_lag`` older, so once the watermark passes a view's ts +
max_lag, its state row is freed. Without the range condition the state
would grow forever — the condition is what makes the join runnable on an
unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_to_click_attribution(
    views: DataFrame,
    clicks: DataFrame,
    max_lag: str = "1 hour",
    watermark_delay: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join clicks to the views they follow within ``max_lag`` for the
    same user — the attribution join (which impression led to this
    click). Works identically on bounded frames (batch parity tests) and
    on streams (state + watermark).

    ``how="left_outer"`` additionally emits unmatched views (impressions
    that never converted) — in streaming mode these rows appear only once
    the watermark proves no matching click can still arrive (view_ts +
    max_lag fully below the watermark), i.e. exactly when the view's
    state row is freed. Unconverted-impression reporting and state expiry
    are the same event.

    Output: user_id, view_ts, click_ts (null when unconverted), lag_us.
    """
    v = (
        views.select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark_delay)
    )
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark_delay)
    )
    joined = v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {max_lag}")
        ),
        how,
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_ts",
        "click_ts",
        (
            F.unix_micros("click_ts") - F.unix_micros("view_ts")
        ).alias("lag_us"),
    )
