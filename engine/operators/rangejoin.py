"""Interval (range) join with bucket blocking — the missing Spark join.

Spark has no native range-join physical operator (Databricks ships one
behind a hint): a point-in-interval theta join `f.ts BETWEEN i.lo AND
i.hi` plans as BroadcastNestedLoopJoin (fine only when intervals
broadcast) or, with an equi-key, as a SortMergeJoin whose range
predicate runs as a post-join filter over every key-pair — quadratic
per key. This operator makes it a HASH join:

- each interval explodes to the time BUCKETS it covers
  (floor(lo/w)..floor(hi/w) for bucket width w);
- each fact row maps to its single bucket floor(ts/w);
- hash-join on (keys..., bucket), then the exact containment filter.

Cost: |intervals| × (len/w + 1) exploded rows (choose w ≈ typical
interval length → ~2 rows per interval) and ONE shuffle of each side
keyed on (keys, bucket); a fact meets only the intervals overlapping
its bucket instead of every interval sharing its key. Skewed buckets
fall under the same AQE skew-join handling as any hash join. This is
the standard bucketized interval-join recipe (as in genomics/telemetry
engines); the reference has no joins at all (SURVEY.md §2.9), so this
is part of the engine's beyond-reference join surface.

The explode stays bounded: intervals longer than `max_buckets_per_row`
buckets raise rather than silently exploding the build side — pick a
bigger width for long intervals (or split them upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    keys: list[str] | None = None,
    bucket_s: float = 3600.0,
    how: str = "inner",
    max_buckets_per_row: int = 10_000,
) -> DataFrame:
    """Join each fact row to every interval row with
    `lo <= ts <= hi` (and equal `keys`, if given), via bucket blocking.

    `ts_col` on facts and `lo_col`/`hi_col` on intervals are epoch
    SECONDS (double or long) — cast timestamps with
    `ts.cast('double')` upstream. `how='inner'` or `'left'` (facts
    with no covering interval keep NULL interval columns). Non-key
    column names must be disjoint between the two frames (checked);
    inverted intervals (lo > hi) match nothing — exactly the theta
    join's behavior — and are dropped before the explode (they must
    not reach `sequence`, which would happily build a huge DESCENDING
    bucket array for them). The long-interval guard is an IN-PLAN
    `assert_true`, not a driver action: it costs nothing extra and
    never re-executes the intervals lineage just to check."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    keys = keys or []
    clash = (set(facts.columns) & set(intervals.columns)) - set(keys)
    if clash:
        raise ValueError(
            f"facts and intervals share non-key columns {sorted(clash)}: "
            f"rename one side before joining"
        )
    b = F.lit(float(bucket_s))

    n_buckets = (
        F.floor(F.col(hi_col) / b) - F.floor(F.col(lo_col) / b) + 1
    )
    # the guard is fused into the sequence's upper bound (assert_true
    # yields NULL on success → coalesce adds 0), so column pruning can
    # never optimize it away and it costs no separate action
    guard = F.coalesce(
        F.assert_true(
            n_buckets <= F.lit(max_buckets_per_row),
            F.concat(
                F.lit(
                    f"interval spans more than {max_buckets_per_row} "
                    f"buckets at bucket_s={bucket_s}: widen bucket_s or "
                    f"split long intervals; offending [{lo_col}, {hi_col}]"
                    f" = ["
                ),
                F.col(lo_col).cast("string"),
                F.lit(", "),
                F.col(hi_col).cast("string"),
                F.lit("]"),
            ),
        ).cast("bigint"),
        F.lit(0),
    )
    iv = intervals.filter(F.col(lo_col) <= F.col(hi_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b), F.floor(F.col(hi_col) / b) + guard
            )
        ),
    )

    f = facts.withColumn("_bucket", F.floor(F.col(ts_col) / b))
    if how == "inner":
        contains = (F.col(ts_col) >= F.col(lo_col)) & (
            F.col(ts_col) <= F.col(hi_col)
        )
        return (
            f.join(iv, on=keys + ["_bucket"], how="inner")
            .filter(contains)
            .drop("_bucket")
        )
    # left: containment must live in the join CONDITION (a post-join
    # filter would drop the null rows a left join exists to keep)
    fa, ia = f.alias("f"), iv.alias("i")
    cond = (
        (F.col("f._bucket") == F.col("i._bucket"))
        & (F.col(f"f.{ts_col}") >= F.col(f"i.{lo_col}"))
        & (F.col(f"f.{ts_col}") <= F.col(f"i.{hi_col}"))
    )
    for k in keys:
        cond = cond & (F.col(f"f.{k}") == F.col(f"i.{k}"))
    iv_cols = [c for c in intervals.columns if c not in set(keys)]
    return fa.join(ia, cond, "left").select(
        *[F.col(f"f.{c}") for c in facts.columns],
        *[F.col(f"i.{c}") for c in iv_cols],
    )
