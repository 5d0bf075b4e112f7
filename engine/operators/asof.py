"""Point-in-time (as-of) join — the engine's core custom operator.

Spark's DataFrame API has no ASOF join (as of Spark 4.1), so it is
built as a *composition* of primitives, in two interchangeable
formulations that differential-test each other (SURVEY.md §7.3):

  strategy='jvm'    — union-tag + last(..., ignorenulls=True) over a
                      cumulative window. 100% JVM/codegen, one shuffle,
                      scales to arbitrarily hot keys. DEFAULT.
  strategy='kernel' — cogrouped applyInPandas with pd.merge_asof per
                      conv_id (sort-merge semantics, Arrow-batched).
                      The model for "expensive external per-group
                      kernel" (reference analog: the per-item Tesseract
                      subprocess, text_extractor.py:88-106).

Semantics (both strategies, bit-identical):
  for each probe row (conv_id, ts, turn_idx): among context rows of
  the same conv_id with event_ts <= ts (strict=False) or event_ts < ts
  (strict=True), take the one with max (event_ts, event_idx); emit its
  ctx_value / ctx_label (the *matched row's* label — possibly null —
  never an older row's, i.e. merge_asof semantics, not per-column
  ffill). No match → nulls. Leakage-free by construction: a context
  row in the future of the probe can never be selected.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def asof_join(
    probe: DataFrame,
    context: DataFrame,
    strict: bool = False,
    strategy: str = "jvm",
    prefix: str = "asof_",
) -> DataFrame:
    """As-of join `probe` (conv_id, ts, turn_idx, ...) ← `context`
    (conv_id, event_ts, event_idx, ctx_value, ctx_label)."""
    if strategy == "jvm":
        return _asof_union_tag(probe, context, strict, prefix)
    if strategy == "kernel":
        return _asof_kernel(probe, context, strict, prefix)
    raise ValueError(f"unknown asof strategy: {strategy}")


def _asof_union_tag(
    probe: DataFrame, context: DataFrame, strict: bool, prefix: str
) -> DataFrame:
    # Tag: within equal ts, context sorts BEFORE probe for <= semantics
    # (so an exactly-coincident event is visible), AFTER it for strict <.
    ctx_side, probe_side = (0, 1) if not strict else (1, 0)

    probe_cols = probe.columns
    ctx = context.select(
        F.col("conv_id"),
        F.col("event_ts").alias("ts"),
        F.lit(ctx_side).alias("_side"),
        F.col("event_idx").alias("_ev_idx"),
        F.struct("ctx_value", "ctx_label").alias("_ctx"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe_cols if c not in ("conv_id", "ts")],
    )
    prb = probe.select(
        "conv_id",
        "ts",
        F.lit(probe_side).alias("_side"),
        F.lit(None).cast("int").alias("_ev_idx"),
        F.lit(None)
        .cast(
            T.StructType(
                [
                    T.StructField("ctx_value", T.DoubleType()),
                    T.StructField("ctx_label", T.StringType()),
                ]
            )
        )
        .alias("_ctx"),
        *[c for c in probe_cols if c not in ("conv_id", "ts")],
    )
    unioned = ctx.unionByName(prb)

    # Total order: (ts, side, event_idx). Context rows carry a non-null
    # _ctx struct; the cumulative last(_ctx, ignorenulls) is therefore the
    # latest admissible context row AS A WHOLE (struct-ffill — per-column
    # ffill would wrongly resurrect an older row's non-null label).
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("ts").asc(), F.col("_side").asc(), F.col("_ev_idx").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_ctx", ignorenulls=True).over(w)
    out = (
        unioned.withColumn("_m", matched)
        .filter(F.col("_side") == probe_side)
        .select(
            *probe_cols,
            F.col("_m.ctx_value").alias(prefix + "ctx_value"),
            F.col("_m.ctx_label").alias(prefix + "ctx_label"),
        )
    )
    return out


def _asof_kernel(
    probe: DataFrame, context: DataFrame, strict: bool, prefix: str
) -> DataFrame:
    out_schema = T.StructType(
        list(probe.schema.fields)
        + [
            T.StructField(prefix + "ctx_value", T.DoubleType()),
            T.StructField(prefix + "ctx_label", T.StringType()),
        ]
    )
    probe_cols = probe.columns

    def kernel(p: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["ts", "turn_idx"], kind="mergesort")
        if len(c) == 0:
            p[prefix + "ctx_value"] = pd.Series(dtype="float64")
            p[prefix + "ctx_label"] = pd.Series(dtype="object")
            return p[probe_cols + [prefix + "ctx_value", prefix + "ctx_label"]]
        # sort so the last row among equal event_ts has max event_idx —
        # merge_asof backward then selects exactly that row
        c = c.sort_values(["event_ts", "event_idx"], kind="mergesort")
        merged = pd.merge_asof(
            p,
            c[["event_ts", "ctx_value", "ctx_label"]].rename(
                columns={
                    "ctx_value": prefix + "ctx_value",
                    "ctx_label": prefix + "ctx_label",
                }
            ),
            left_on="ts",
            right_on="event_ts",
            direction="backward",
            allow_exact_matches=not strict,
        )
        return merged[probe_cols + [prefix + "ctx_value", prefix + "ctx_label"]]

    return (
        probe.groupBy("conv_id")
        .cogroup(context.groupBy("conv_id"))
        .applyInPandas(kernel, schema=out_schema)
    )
