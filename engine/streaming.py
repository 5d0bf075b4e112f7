"""Structured Streaming counterparts of the batch feature families
(SURVEY.md §7.6) — the event-time semantics were chosen so these drop
in without changing the batch contract.

Covered here:

- `stream_sessionize`: gap sessionization via the built-in
  `session_window(ts, gap)` — per-(conv, session) aggregates with a
  watermark bounding state. (The batch engine's session_id is a
  0-based *index*; the streaming surface keys sessions by their window
  struct instead — indices require total history, which a stream by
  definition lacks. Aggregates per session are identical.)
- `stream_rolling_counts`: sliding event-time window counts per
  conversation (`window(ts, size, slide)` + watermark) — the streaming
  analog of the batch RANGE-frame rolling stats.
- `stream_turn_features`: stateless per-turn features (text kernel,
  threshold bins) — identical code path as batch (pandas_udf is
  streaming-safe).

All operators take and return streaming DataFrames; sinks/triggers are
the caller's. Tests drive them with a file source + `availableNow`
trigger into a memory sink and compare against the batch engine on the
same rows (tests/test_streaming.py).

At cluster scale: state-store size is bounded by the watermark horizon
× active conversations; shuffle partitioning for the session window is
on conv_id (same key as batch). `applyInPandasWithState` would host
the as-of/expanding-top-k state machines if a fully streaming feature
vector were needed; deliberately out of the minimum slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from engine.schema import ROLL_WINDOW_S, SESSION_GAP_S


def stream_turn_features(df: DataFrame) -> DataFrame:
    """Stateless per-turn features — same kernel as batch."""
    from engine.pipeline import add_text_features

    return add_text_features(df)


def stream_sessionize(
    df: DataFrame,
    gap_s: float = SESSION_GAP_S,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-(conv_id, session) aggregates with gap-based session windows.

    Returns one row per closed session: conv_id, session start/end,
    n_turns, total txt_len-equivalent (sum of text lengths), n_tools.
    """
    return (
        df.withWatermark("ts", watermark)
        .groupBy(
            F.col("conv_id"),
            F.session_window("ts", f"{int(gap_s)} seconds").alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("total_text_len"),
            F.count("tool").alias("n_tool_turns"),
        )
        .select(
            "conv_id",
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_turns",
            "total_text_len",
            "n_tool_turns",
        )
    )


def stream_rolling_counts(
    df: DataFrame,
    window_s: float = ROLL_WINDOW_S,
    slide_s: float | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding event-time window counts per conversation — the
    streaming analog of the batch rolling RANGE frame."""
    slide = int(slide_s or max(1, int(window_s) // 5))
    return (
        df.withWatermark("ts", watermark)
        .groupBy(
            F.col("conv_id"),
            F.window("ts", f"{int(window_s)} seconds", f"{slide} seconds").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("roll_cnt"),
            F.avg(F.length("text")).alias("roll_avg_raw_len"),
        )
        .select(
            "conv_id",
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "roll_cnt",
            "roll_avg_raw_len",
        )
    )
