"""Boundary validation → good/quarantine split.

The reference validates at the boundary with typed error codes and
routes failures to an error sidecar instead of failing the request
(app/utils/image_validator.py:16-124; FeatureError,
app/api/v1/models/analyze.py:13-28). The engine mirrors that: rows
failing a gate go to a quarantine DataFrame with (code, message,
severity); good rows proceed untouched. Codes per FIXTURES.md §4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from engine.schema import MAX_TEXT_LEN, ROLE_DOMAIN

# (code, predicate-of-failure, message) — first failing gate wins,
# mirroring the reference's sequential validator ordering.
def _gates():
    return [
        (
            "MISSING_KEY",
            F.col("conv_id").isNull() | F.col("ts").isNull(),
            "null conv_id or ts",
        ),
        (
            "INVALID_ENUM",
            F.col("role").isNotNull() & ~F.col("role").isin(*ROLE_DOMAIN),
            "role outside domain whitelist",
        ),
        (
            "ROW_TOO_LARGE",
            F.length(F.col("text")) > MAX_TEXT_LEN,
            f"text longer than {MAX_TEXT_LEN}",
        ),
        (
            "BAD_TURN_INDEX",
            F.col("turn_idx").isNull() | (F.col("turn_idx") < 0),
            "negative or null turn_idx",
        ),
    ]


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Return (good, errors). `errors` has ERROR_SCHEMA columns."""
    code = F.lit(None).cast("string")
    msg = F.lit(None).cast("string")
    for c, pred, m in reversed(_gates()):
        code = F.when(pred, F.lit(c)).otherwise(code)
        msg = F.when(pred, F.lit(m)).otherwise(msg)
    tagged = df.withColumn("_err_code", code).withColumn("_err_msg", msg)
    good = tagged.filter(F.col("_err_code").isNull()).drop("_err_code", "_err_msg")
    errors = tagged.filter(F.col("_err_code").isNotNull()).select(
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("_err_code").alias("code"),
        F.col("_err_msg").alias("message"),
        F.lit("error").alias("severity"),
    )
    return good, errors
