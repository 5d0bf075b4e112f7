"""Point-in-time (as-of) join — the engine's core custom operator.

Spark's DataFrame API has no ASOF join (as of Spark 4.1), so it is
built as a *composition* of primitives, in two interchangeable
formulations that differential-test each other (SURVEY.md §7.3):

  strategy='jvm'    — union-tag + last(..., ignorenulls=True) over a
                      cumulative window. 100% JVM/codegen, one shuffle,
                      scales to arbitrarily hot keys. DEFAULT.
  strategy='kernel' — cogrouped applyInPandas with pd.merge_asof per
                      entity (sort-merge semantics, Arrow-batched).
                      The model for "expensive external per-group
                      kernel" (reference analog: the per-item Tesseract
                      subprocess, text_extractor.py:88-106).

Semantics (both strategies, bit-identical):
  for each probe row (on, probe_ts, probe_idx): among context rows of
  the same `on` key with ctx_ts <= probe_ts (strict=False) or
  ctx_ts < probe_ts (strict=True), take the one with max
  (ctx_ts, ctx_idx); emit its payload columns (the *matched row's*
  values — possibly null — never an older row's, i.e. merge_asof
  semantics, not per-column ffill). No match → nulls. Leakage-free by
  construction: a future context row can never be selected.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def asof_join(
    probe: DataFrame,
    context: DataFrame,
    on: str = "conv_id",
    probe_ts: str = "ts",
    probe_idx: str = "turn_idx",
    ctx_ts: str = "event_ts",
    ctx_idx: str = "event_idx",
    payload: list[str] | None = None,
    strict: bool = False,
    strategy: str = "jvm",
    prefix: str = "asof_",
) -> DataFrame:
    """As-of join probe ← context; appends `prefix`+payload columns."""
    if payload is None:
        payload = [
            c for c in context.columns if c not in (on, ctx_ts, ctx_idx)
        ]
    args = (probe, context, on, probe_ts, probe_idx, ctx_ts, ctx_idx, payload, strict, prefix)
    if strategy == "jvm":
        return _asof_union_tag(*args)
    if strategy == "kernel":
        return _asof_kernel(*args)
    raise ValueError(f"unknown asof strategy: {strategy}")


def _asof_union_tag(
    probe: DataFrame,
    context: DataFrame,
    on: str,
    probe_ts: str,
    probe_idx: str,
    ctx_ts: str,
    ctx_idx: str,
    payload: list[str],
    strict: bool,
    prefix: str,
) -> DataFrame:
    # Tag: within equal ts, context sorts BEFORE probe for <= semantics
    # (so an exactly-coincident event is visible), AFTER it for strict <.
    ctx_side, probe_side = (0, 1) if not strict else (1, 0)

    probe_cols = probe.columns
    payload_struct = T.StructType(
        [T.StructField(c, context.schema[c].dataType) for c in payload]
    )
    ctx = context.select(
        F.col(on),
        F.col(ctx_ts).alias(probe_ts),
        F.lit(ctx_side).alias("_side"),
        F.col(ctx_idx).cast("long").alias("_ev_idx"),
        F.struct(*payload).alias("_ctx"),
        *[
            F.lit(None).cast(probe.schema[c].dataType).alias(c)
            for c in probe_cols
            if c not in (on, probe_ts)
        ],
    )
    prb = probe.select(
        on,
        probe_ts,
        F.lit(probe_side).alias("_side"),
        F.lit(None).cast("long").alias("_ev_idx"),
        F.lit(None).cast(payload_struct).alias("_ctx"),
        *[c for c in probe_cols if c not in (on, probe_ts)],
    )
    unioned = ctx.unionByName(prb)

    # Total order: (ts, side, ctx_idx). Context rows carry a non-null
    # _ctx struct; the cumulative last(_ctx, ignorenulls) is therefore the
    # latest admissible context row AS A WHOLE (struct-ffill — per-column
    # ffill would wrongly resurrect an older row's non-null payload).
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(probe_ts).asc(),
            F.col("_side").asc(),
            F.col("_ev_idx").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_ctx", ignorenulls=True).over(w)
    return (
        unioned.withColumn("_m", matched)
        .filter(F.col("_side") == probe_side)
        .select(
            *probe_cols,
            *[F.col(f"_m.{c}").alias(prefix + c) for c in payload],
        )
    )


def _asof_kernel(
    probe: DataFrame,
    context: DataFrame,
    on: str,
    probe_ts: str,
    probe_idx: str,
    ctx_ts: str,
    ctx_idx: str,
    payload: list[str],
    strict: bool,
    prefix: str,
) -> DataFrame:
    out_names = [prefix + c for c in payload]
    out_schema = T.StructType(
        list(probe.schema.fields)
        + [T.StructField(prefix + c, context.schema[c].dataType) for c in payload]
    )
    probe_cols = probe.columns
    rename = {c: prefix + c for c in payload}

    def kernel(p: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([probe_ts, probe_idx], kind="mergesort")
        if len(c) == 0:
            for name, src in zip(out_names, payload):
                p[name] = pd.Series(dtype=c[src].dtype if len(c) else "object")
            return p[probe_cols + out_names]
        # sort so the last row among equal ctx_ts has max ctx_idx —
        # merge_asof backward then selects exactly that row
        c = c.sort_values([ctx_ts, ctx_idx], kind="mergesort")
        merged = pd.merge_asof(
            p,
            c[[ctx_ts] + payload].rename(columns=rename),
            left_on=probe_ts,
            right_on=ctx_ts,
            direction="backward",
            allow_exact_matches=not strict,
        )
        return merged[probe_cols + out_names]

    return (
        probe.groupBy(on)
        .cogroup(context.groupBy(on))
        .applyInPandas(kernel, schema=out_schema)
    )
