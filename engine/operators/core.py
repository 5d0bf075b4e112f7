"""Generic, entity-parametrized point-in-time operators.

The transcript pipeline binds these to (conv_id, ts, turn_idx); the
driver-table queries bind them to (user_id, ts, event_id). One
implementation, two surfaces — every operator shuffles once on the
entity key and computes inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def order_cols(ts: str, idx: str) -> list[Column]:
    return [F.col(ts).asc(), F.col(idx).asc()]


def entity_window(entity: str, ts: str, idx: str) -> Window:
    return Window.partitionBy(entity).orderBy(*order_cols(ts, idx))


def cum_frame(entity: str, ts: str, idx: str):
    return entity_window(entity, ts, idx).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )


def ts_seconds(ts: str) -> Column:
    """Timestamp → epoch seconds as double (µs-exact).

    TIMESTAMP_NTZ (how Spark 4 reads naive parquet timestamps) cannot
    cast directly to double; route through TIMESTAMP first — with the
    engine's pinned UTC session timezone this interprets naive values
    as UTC instants, matching DuckDB's epoch_us().
    """
    return F.col(ts).cast("timestamp").cast("double")


def add_gap_prev(df: DataFrame, entity: str, ts: str, idx: str, out: str = "gap_prev_s") -> DataFrame:
    w = entity_window(entity, ts, idx)
    sec = ts_seconds(ts)
    return df.withColumn(out, sec - F.lag(sec).over(w))


def sessionize(
    df: DataFrame,
    entity: str,
    ts: str,
    idx: str,
    gap_s: float,
    session_col: str = "session_id",
    seq_col: str | None = "sess_seq",
    strict_boundary: bool = False,
) -> DataFrame:
    """ts-gap sessionization: new session iff gap to previous row
    strictly exceeds gap_s (default), or iff gap >= gap_s when
    `strict_boundary` — the latter matches Structured Streaming's
    `session_window` (end-exclusive window [start, last+gap)).
    0-based session id per entity; optional 1-based row sequence
    within session.

    Every expression runs over the ONE (entity)×(ts, idx) window the
    whole pipeline shares — sess_seq is derived as
    row_number − row_number-at-session-start + 1 instead of a
    row_number over (entity, session), which would force a second sort
    per partition (measurably expensive at scale)."""
    w = entity_window(entity, ts, idx)
    cum = cum_frame(entity, ts, idx)
    sec = ts_seconds(ts)
    gap = sec - F.lag(sec).over(w)
    breaks = (gap >= gap_s) if strict_boundary else (gap > gap_s)
    df = df.withColumn(
        "_new_sess",
        F.when(gap.isNull() | breaks, 1).otherwise(0),
    )
    df = df.withColumn(
        session_col, (F.sum("_new_sess").over(cum) - F.lit(1)).cast("int")
    )
    if seq_col:
        df = df.withColumn("_rn", F.row_number().over(w))
        start_rn = F.last(
            F.when(F.col("_new_sess") == 1, F.col("_rn")), ignorenulls=True
        ).over(cum)
        df = df.withColumn(seq_col, (F.col("_rn") - start_rn + 1).cast("int")).drop(
            "_rn"
        )
    return df.drop("_new_sess")


def ffill(
    df: DataFrame, entity: str, ts: str, idx: str, src: Column | str, out: str
) -> DataFrame:
    """Forward-fill: last non-null value of `src` at or before this row."""
    cum = cum_frame(entity, ts, idx)
    return df.withColumn(out, F.last(src, ignorenulls=True).over(cum))


def bfill(
    df: DataFrame, entity: str, ts: str, idx: str, src: Column | str, out: str
) -> DataFrame:
    """Backfill: first non-null value of `src` at or after this row.

    NOTE on leakage: unlike ffill, a backfilled column looks FORWARD in
    time — it is a training-label/imputation tool (the north rule's
    'backfill of tool and role context'), never a feature for the row's
    own timestamp. Callers own that discipline; the operator shares the
    one (entity)×(ts, idx) window spec (reversed frame, same sort)."""
    fut = entity_window(entity, ts, idx).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return df.withColumn(out, F.first(src, ignorenulls=True).over(fut))


def lag_lead(
    df: DataFrame, entity: str, ts: str, idx: str, src: str, n: int = 1
) -> DataFrame:
    w = entity_window(entity, ts, idx)
    return df.withColumn(f"lag_{src}", F.lag(src, n).over(w)).withColumn(
        f"lead_{src}", F.lead(src, n).over(w)
    )


def rolling_range(
    df: DataFrame,
    entity: str,
    ts: str,
    window_s: float,
    aggs: dict[str, Column],
    order_col: str | None = None,
) -> DataFrame:
    """Event-time RANGE frame [ts - window_s, ts] (inclusive, with
    ts-peers — the `ts' <= ts` leakage rule). `aggs` maps output column
    name → aggregate expression.

    All aggregates are evaluated over ONE window spec in ONE select:
    adding them via separate withColumn calls creates per-agg copies of
    the order expression, which Catalyst cannot unify — the plan then
    carries one Sort per aggregate (measured: 3 extra per-partition
    sorts in the flagship pipeline). Pass `order_col` when the epoch-
    seconds column is already materialized upstream.

    Fractional `window_s` is honored at millisecond precision by
    ordering over a ms-scaled long key (rangeBetween bounds are
    integral) — it used to truncate to whole seconds silently
    (round-3 review finding)."""
    order = F.col(order_col) if order_col else ts_seconds(ts)
    if float(window_s) == int(window_s):
        bound, okey = int(window_s), order
    else:
        bound = int(round(float(window_s) * 1000))
        # floor(x*1000 + 0.5): ONE explicit rounding rule shared with the
        # oracle mirror (engine/oracle/features.py). F.round (HALF_UP) vs
        # np.round (half-to-even) disagree on exact half-millisecond
        # boundaries, which would flip window membership between engine
        # and oracle. Epoch seconds are nonnegative, so floor(x+0.5)
        # == HALF_UP here.
        okey = F.floor(order * 1000 + F.lit(0.5)).cast("long")
    wr = (
        Window.partitionBy(entity)
        .orderBy(okey)
        .rangeBetween(-bound, Window.currentRow)
    )
    # withColumn-style replace-on-collision: pre-existing columns whose
    # names collide with aggs keys are dropped, not duplicated
    keep = [c for c in df.columns if c not in aggs]
    return df.select(
        *keep, *[expr.over(wr).alias(out) for out, expr in aggs.items()]
    )


def dedup_first(df: DataFrame, keys: list[str], ts: str, idx: str) -> DataFrame:
    """Order-preserving dedup (W5): keep the first row per key set by
    (ts, idx)."""
    w = Window.partitionBy(*keys).orderBy(*order_cols(ts, idx))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def argmax_by(
    df: DataFrame, entity: str, value: str, tie: str
) -> DataFrame:
    """Per-entity arg-max row (A7): max `value`, ties broken by
    smallest `tie`."""
    w = Window.partitionBy(entity).orderBy(F.col(value).desc(), F.col(tie).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def topk_by_count(
    df: DataFrame, entity: str, key: str, k: int, count_col: str = "cnt", rank_col: str = "rank"
) -> DataFrame:
    """Frequency top-k per entity (A2/A3 + W6): hash-agg count with
    map-side partial combine, then windowed rank ≤ k; ties broken by
    key ascending for determinism."""
    counts = df.groupBy(entity, key).agg(F.count(F.lit(1)).alias(count_col))
    w = Window.partitionBy(entity).orderBy(F.col(count_col).desc(), F.col(key).asc())
    return counts.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def bin_threshold(col: Column, hi: float, mid: float, labels=("Light", "Regular", "Bold")) -> Column:
    """3-way threshold binning (P11): >= hi → labels[0], > mid →
    labels[1], else labels[2]; null passes through as null."""
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(col >= hi, labels[0])
        .when(col > mid, labels[1])
        .otherwise(labels[2])
    )
