"""Window-expressible feature families — pure Spark built-ins.

Everything here stays inside whole-stage codegen (no Python): lag/lead,
ts-gap sessionization (SURVEY.md §2.5 W4 — the reference's spatial
adjacency grouping re-expressed as temporal adjacency), ffill/backfill
context, and event-time rolling frames.

All windows share the one total order that the engine guarantees
everywhere: partition by conv_id, order by (ts, turn_idx) —
(reference analog: sort lines by bbox y then assemble,
text_extractor.py:177-193). A single hash repartition on conv_id is
reused by every window below (hashpartitioning(conv_id) satisfies the
clustered distribution of (conv_id, …) sub-windows), so the whole
family costs exactly one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from engine.schema import ROLL_WINDOW_S, SESSION_GAP_S

TS_SEC = "_ts_sec"  # internal epoch-seconds double column


def turn_order():
    return [F.col("ts").asc(), F.col("turn_idx").asc()]


def conv_window() -> Window:
    return Window.partitionBy("conv_id").orderBy(*turn_order())


def with_ts_sec(df: DataFrame) -> DataFrame:
    # timestamp → epoch seconds as double (µs-exact for ms-precision data;
    # identical to pandas int64-ns/1e9 under IEEE correctly-rounded division)
    return df.withColumn(TS_SEC, F.col("ts").cast("double"))


def add_lag_lead(df: DataFrame) -> DataFrame:
    """lag/lead turn features + inter-turn gaps (seconds, double)."""
    w = conv_window()
    return (
        df.withColumn("lag_text_len", F.lag("txt_len").over(w))
        .withColumn("lead_text_len", F.lead("txt_len").over(w))
        .withColumn("gap_prev_s", F.col(TS_SEC) - F.lag(TS_SEC).over(w))
        .withColumn("gap_next_s", F.lead(TS_SEC).over(w) - F.col(TS_SEC))
    )


def add_sessionization(df: DataFrame, gap_s: float = SESSION_GAP_S) -> DataFrame:
    """ts-gap sessionization within conv_id (W4).

    New session iff gap_prev_s > gap_s (strict). session_id is 0-based
    per conversation; sess_turn_no is 1-based within session;
    sess_len_so_far is the running sum of txt_len within the session
    (inclusive of the current turn).
    """
    w = conv_window()
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col(TS_SEC) - F.lag(TS_SEC).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    df = df.withColumn(
        "session_id", (F.sum(new_sess).over(cum) - F.lit(1)).cast("int")
    )
    ws = Window.partitionBy("conv_id", "session_id").orderBy(*turn_order())
    ws_cum = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("sess_turn_no", F.row_number().over(ws)).withColumn(
        "sess_len_so_far",
        F.sum(F.coalesce(F.col("txt_len"), F.lit(0)).cast("long")).over(ws_cum),
    )


def add_context_ffill(df: DataFrame) -> DataFrame:
    """Forward-fill of tool / last-user-text context (backfill family).

    `last(col, ignorenulls=True)` over an unbounded-preceding frame —
    the canonical Spark ffill; inclusive of the current turn (the
    current row is not the future, so this is leakage-free).
    """
    cum = conv_window().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "ctx_last_tool", F.last("tool", ignorenulls=True).over(cum)
    ).withColumn(
        "ctx_last_user_text",
        F.last(
            F.when(F.col("role") == "user", F.col("text")), ignorenulls=True
        ).over(cum),
    )


def add_rolling(
    df: DataFrame, window_s: float = ROLL_WINDOW_S, approx_distinct: bool = False
) -> DataFrame:
    """Event-time rolling stats over the past `window_s` seconds.

    RANGE frame [ts - window_s, ts] — inclusive of both boundaries and
    of all peers of the current timestamp (rows with equal ts), which
    is exactly the `ts' <= ts` leakage rule.

    Distinct-tool count is exact (collect_list → array_distinct) for
    test parity; at benchmark scale `approx_distinct=True` switches the
    rolling distinct to a cheaper approximation EXCLUDED from allclose
    columns (SURVEY.md §7.4).
    """
    wr = (
        Window.partitionBy("conv_id")
        .orderBy(F.col(TS_SEC))
        .rangeBetween(-int(window_s), Window.currentRow)
    )
    df = df.withColumn("roll_cnt_5m", F.count(F.lit(1)).over(wr)).withColumn(
        "roll_avg_len_5m", F.avg("txt_len").over(wr)
    )
    # collect_list skips nulls; array_distinct over the frame's tools
    distinct = F.size(F.array_distinct(F.collect_list("tool").over(wr)))
    return df.withColumn("roll_tools_distinct_5m", distinct.cast("int"))
