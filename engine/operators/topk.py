"""Per-entity frequency top-k — the dominant-value family.

The reference's "5 dominant colors" contract (kmeans palette →
frequency rank → drop white/black sentinels → top-3 accents → pad to
fixed arity; color_extractor.py:203-300, SURVEY.md §2.4 A2/A3 + §2.3
F9 + §2.5 W6/W7) becomes: per conversation, the top-k most frequent
*tools*, computed **point-in-time** (expanding: tools seen up to and
including the current turn), null/'' filtered, tie-broken
(count desc, tool asc), padded to arity k by repeating the last
element (W7; empty stays empty).

The expanding variant is genuinely kernel-shaped (a running
multiset-rank), so it runs as a grouped Arrow kernel via
applyInPandas. The whole-conversation (non-expanding) variant is pure
SQL — `top_tools_final` below — and doubles as the DuckDB-checkable
formulation.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from engine.schema import TOP_K_TOOLS


def top_tools_expanding_py(
    tools: pd.Series, k: int = TOP_K_TOOLS
) -> list[list[str]]:
    """Running top-k over one conversation's tool sequence (already in
    (ts, turn_idx) order). Shared verbatim with the pandas oracle."""
    counts: dict[str, int] = {}
    out: list[list[str]] = []
    for tool in tools:
        if tool is not None and not pd.isna(tool) and tool != "":
            counts[tool] = counts.get(tool, 0) + 1
        if counts:
            ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            top = [t for t, _ in ranked]
            while len(top) < k:  # W7 pad: repeat last until arity k
                top.append(top[-1])
        else:
            top = []
        out.append(top)
    return out


def add_top_tools_expanding(df: DataFrame, k: int = TOP_K_TOOLS) -> DataFrame:
    """Append `top_tools` (array<string>) via a per-conversation Arrow
    kernel. Input may arrive in any order; the kernel sorts by the
    engine's total order (ts, turn_idx) and returns rows in that order."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("top_tools", T.ArrayType(T.StringType()))]
    )
    cols = df.columns

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "turn_idx"], kind="mergesort")
        g["top_tools"] = top_tools_expanding_py(g["tool"], k)
        return g[cols + ["top_tools"]]

    return df.groupBy("conv_id").applyInPandas(kernel, schema=out_schema)


def top_tools_final(df: DataFrame, k: int = TOP_K_TOOLS) -> DataFrame:
    """Whole-conversation top-k dominant tools, pure built-ins:
    hash-agg count (map-side partial combine) → windowed rank ≤ k.
    Returns (conv_id, tool, tool_count, rank). SQL-oracle-checkable."""
    counts = (
        df.filter(F.col("tool").isNotNull() & (F.col("tool") != ""))
        .groupBy("conv_id", "tool")
        .agg(F.count(F.lit(1)).alias("tool_count"))
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.col("tool_count").desc(), F.col("tool").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
