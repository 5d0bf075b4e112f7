"""Executor-side (distributed) fixture generation for scale benches.

`engine/generate.py`'s pandas generators build the whole table in the
driver process — right for unit-test fixtures, hopeless at the 10^7+
conversation scale the 10× flagship datapoint needs. The transcript
side already has a distributed path (the registered custom DataSource,
engine/sources/transcript_source.py, per-conversation seeding). This
module adds the CONTEXT side: the same table shape as
`generate_context_events` (CONTEXT_SCHEMA; ≈events_per_conv events per
conversation interleaved with the turn span, spread over [-5%, +15%]
of it so some events precede the first turn and some trail the last;
~2% ghost conv_ids exercising the unmatched-join path), built entirely
from codegen expressions over ONE groupBy of the transcripts — no
driver-side rows, fully deterministic from (conv_id, i, seed) hashing.

Documented approximations vs the pandas generator (workload-shape
equivalents, not bit-equal): per-conv event count is uniform in
[1, 2·events_per_conv] (mean ≈ events_per_conv + 0.5) instead of
1 + Poisson; label frequencies are uniform over the 5 labels instead
of the skewed categorical; no events forced exactly onto turn
timestamps (the <= / < boundary behavior is pinned by unit tests and
the sf0.01 oracle gate, not by bench fixtures).

Scale shape: one shuffle (the span groupBy — at 10^12 turns this is
the same per-conv aggregate every feature already pays), then a narrow
explode; output size ≈ events_per_conv × n_convs rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _unit_uniform(*cols) -> F.Column:
    """Deterministic uniform [0, 1) from hashing the given columns."""
    return F.pmod(F.xxhash64(*cols), F.lit(1_000_000)) / F.lit(1_000_000.0)


def generate_context_events_distributed(
    transcripts: DataFrame,
    seed: int = 43,
    events_per_conv: float = 6.0,
) -> DataFrame:
    spans = transcripts.groupBy("conv_id").agg(
        F.min("ts").alias("_lo"), F.max("ts").alias("_hi")
    )
    k2 = max(1, int(2 * events_per_conv))
    n_ev = (
        F.pmod(F.xxhash64("conv_id", F.lit(seed)), F.lit(k2)) + 1
    ).cast("int")
    ev = spans.withColumn(
        "event_idx", F.explode(F.sequence(F.lit(0), n_ev - 1))
    )
    frac = F.lit(-0.05) + F.lit(1.2) * _unit_uniform(
        "conv_id", "event_idx", F.lit(seed + 1)
    )
    span_ms = F.unix_millis("_hi") - F.unix_millis("_lo")
    event_ts = F.timestamp_millis(
        F.unix_millis("_lo") + (span_ms * frac).cast("long")
    )
    ghost = (
        F.pmod(F.xxhash64("conv_id", "event_idx", F.lit(seed + 3)), F.lit(100))
        < 2
    )
    conv_out = F.when(
        ghost,
        F.concat(
            F.lit("ghost-"),
            F.lpad(
                F.pmod(
                    F.xxhash64("conv_id", "event_idx", F.lit(seed + 4)),
                    F.lit(999),
                ).cast("string"),
                8,
                "0",
            ),
        ),
    ).otherwise(F.col("conv_id"))
    labels = F.array(
        F.lit("ok"), F.lit("warn"), F.lit("err"), F.lit("info"),
        F.lit(None).cast("string"),
    )
    return ev.select(
        conv_out.alias("conv_id"),
        event_ts.alias("event_ts"),
        F.col("event_idx").cast("int").alias("event_idx"),
        F.round(
            _unit_uniform("conv_id", "event_idx", F.lit(seed + 2)) * 1000, 6
        ).alias("ctx_value"),
        F.element_at(
            labels,
            (
                F.pmod(
                    F.xxhash64("conv_id", "event_idx", F.lit(seed + 5)),
                    F.lit(5),
                )
                + 1
            ).cast("int"),
        ).alias("ctx_label"),
    )
