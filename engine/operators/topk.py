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
    (ts, turn_idx) order). NOTE: the pandas oracle deliberately does
    NOT share this function — engine/oracle/features.py carries its own
    independent implementation so the differential test compares two
    codebases, not one function with itself (a semantics change here
    must be mirrored there CONSCIOUSLY, and the parity gate will catch
    a one-sided edit)."""
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


def add_top_tools_expanding(
    df: DataFrame,
    k: int = TOP_K_TOOLS,
    assume_partitioned: bool = False,
    strategy: str = "stream",
) -> DataFrame:
    """Append `top_tools` (array<string>), the running top-k.

    strategy='stream' (default): mapInPandas over partitions locally
    sorted by (conv_id, ts, turn_idx), carrying the per-conversation
    count state across Arrow batch boundaries. One Python call per
    ~64k-row batch instead of one per conversation — per-group pandas
    overhead was the single largest cost in the whole pipeline (~25s of
    a 40s run at 750k rows; the stream kernel removes it). With
    `assume_partitioned` (upstream already hash-partitioned every
    conversation into one partition, as the pipeline guarantees) only a
    local sort is added — no shuffle.

    strategy='grouped': the original groupBy.applyInPandas per-
    conversation kernel; kept as the differential check (tests compare
    both) and for callers without a partitioning guarantee.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("top_tools", T.ArrayType(T.StringType()))]
    )
    cols = df.columns

    if strategy == "grouped":
        def kernel(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "turn_idx"], kind="mergesort")
            g["top_tools"] = top_tools_expanding_py(g["tool"], k)
            return g[cols + ["top_tools"]]

        return df.groupBy("conv_id").applyInPandas(kernel, schema=out_schema)

    if strategy != "stream":
        raise ValueError(f"unknown top-k strategy: {strategy}")

    if not assume_partitioned:
        df = df.repartition("conv_id")
    df = df.sortWithinPartitions("conv_id", "ts", "turn_idx")

    def gen(batches):
        # mapInArrow, NOT mapInPandas: the kernel reads only
        # (conv_id, tool); the other ~20 columns pass through as raw
        # Arrow buffers with ZERO conversion. The pandas version
        # materialized every string cell as a Python object both ways —
        # measured +12.6 s at 1.5M wide rows for a passthrough kernel;
        # the Arrow version is ~10× cheaper.
        import pyarrow as pa

        list_ty = pa.list_(pa.string())
        # state carried across batches of ONE partition (the iterator
        # is per-partition; conversations never span partitions)
        cur_conv: object = object()
        counts: dict[str, int] = {}
        for batch in batches:
            convs = batch.column("conv_id").to_pylist()
            tools = batch.column("tool").to_pylist()
            out: list[list[str]] = []
            for conv, tool in zip(convs, tools):
                if conv != cur_conv:
                    cur_conv = conv
                    counts = {}
                if tool:  # None and '' both falsy
                    counts[tool] = counts.get(tool, 0) + 1
                if counts:
                    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
                    top = [t for t, _ in ranked]
                    while len(top) < k:
                        top.append(top[-1])
                else:
                    top = []
                out.append(top)
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [pa.array(out, type=list_ty)],
                names=cols + ["top_tools"],
            )

    return df.mapInArrow(gen, schema=out_schema)


def add_top_tools_vocab(
    df: DataFrame, k: int = TOP_K_TOOLS, vocab: list[str] | None = None
) -> DataFrame:
    """Expanding top-k dominant tools with NO Python stage.

    Tool vocabularies are small and bounded (a dozen tools per agent
    fleet), which unlocks a pure-codegen formulation: one cumulative
    window count per vocabulary value (all over the ONE shared conv
    window spec — a single Window node, single sort), then a per-row
    sort of a |V|-element struct array picks the top k with the
    (count desc, tool asc) tie-break. Measured: removes the ~9-13 s
    Arrow IPC round-trip of the kernel strategies at 1.5M wide rows.

    `vocab` defaults to the distinct non-null tools in `df` (one tiny
    aggregate job). Callers with |V| > ~64 should use the 'stream'
    kernel instead — the column count grows with |V|.
    """
    if vocab is None:
        vocab = [
            r["tool"]
            for r in df.filter(
                F.col("tool").isNotNull() & (F.col("tool") != "")
            ).select("tool").distinct().collect()
        ]
    # set(): a duplicated catalog-stat entry would otherwise count the
    # same tool in two _tc columns and repeat it inside top_tools
    vocab = sorted(set(vocab))
    if not vocab:
        # no tools anywhere (empty input / all-null tool column): the
        # expanding top-k is [] for every row — and F.array() of zero
        # structs would type as array<void> and break the lambda below
        return df.withColumn("top_tools", F.array().cast("array<string>"))

    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cnt_cols = [
        F.sum(F.when(F.col("tool") == t, 1).otherwise(0)).over(w).alias(f"_tc{j}")
        for j, t in enumerate(vocab)
    ]
    df = df.select("*", *cnt_cols)

    entries = F.array(
        *[
            F.struct(
                (-F.col(f"_tc{j}")).cast("long").alias("negc"),
                F.lit(t).alias("t"),
            )
            for j, t in enumerate(vocab)
        ]
    )
    # struct array sorts lexicographically by field order: (-count, tool)
    ranked = F.slice(
        F.filter(F.array_sort(entries), lambda e: e.negc < 0), 1, k
    )
    top = F.transform(ranked, lambda e: e.t)
    padded = F.when(F.size(top) == 0, top).otherwise(
        F.slice(F.concat(top, F.array_repeat(F.element_at(top, -1), k)), 1, k)
    )
    return df.withColumn("top_tools", padded).drop(
        *[f"_tc{j}" for j in range(len(vocab))]
    )


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
