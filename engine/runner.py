"""Resumable batched feature-extraction job.

Splits the input by a deterministic hash bucket of the entity key into
B independent batches; each batch runs the full pipeline and commits
its own snapshot (features + errors) with a run_id derived from
(job_id, batch). A killed run resumes by skipping committed batches —
exactly-once output with no recomputation of finished work.

This is the `spark-submit` entry shape for the 10^12-turn job: at that
scale one monolithic write is operationally hopeless; hash-bucketed
batches bound failure blast radius and give linear, lineage-tracked
progress (each snapshot manifest carries rows/bytes/watermark per
file). Buckets use the same key as the pipeline's internal repartition
(conv_id), so batching adds no extra shuffle skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from engine.pipeline import extract_features
from engine.tableio import TableIO


def batch_filter(entity_col: str, n_batches: int, batch: int) -> F.Column:
    """Deterministic bucket predicate (non-negative hash mod)."""
    return F.pmod(F.xxhash64(F.col(entity_col)), F.lit(n_batches)) == batch


def run_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    context: DataFrame | None,
    io: TableIO,
    job_id: str,
    n_batches: int = 8,
    entity_col: str = "conv_id",
    **pipeline_kwargs,
) -> dict:
    """Run the feature pipeline in `n_batches` resumable batches.

    Returns a job summary: per-batch status (committed / skipped) and
    aggregate rows. Re-invoking with the same job_id after a crash
    re-runs only uncommitted batches.
    """
    # Hoist tool-vocab discovery to ONCE per job: without this, every
    # batch would pay its own one-column discovery scan (n_batches
    # extra passes at 10^12 rows). Callers with a catalog stat pass
    # vocab= themselves and skip even this single scan.
    if "vocab" not in pipeline_kwargs:
        from engine.pipeline import discover_tool_vocab

        pipeline_kwargs = {
            **pipeline_kwargs,
            "vocab": discover_tool_vocab(transcripts),
        }
    summary = {"job_id": job_id, "n_batches": n_batches, "batches": []}
    for b in range(n_batches):
        run_id = f"{job_id}-b{b:04d}"
        if io.is_committed("features", run_id):
            m = io.read_manifest("features", run_id)
            summary["batches"].append(
                {"batch": b, "status": "skipped", "rows": m["total_rows"]}
            )
            continue
        t_b = transcripts.filter(batch_filter(entity_col, n_batches, b))
        c_b = (
            context.filter(batch_filter(entity_col, n_batches, b))
            if context is not None
            else None
        )
        features, errors, meta = extract_features(spark, t_b, c_b, **pipeline_kwargs)
        # Commit ORDER matters for exactly-once: the features manifest is
        # the batch's commit point (resume gates on it above), so the
        # errors snapshot must commit FIRST. A crash between the two
        # commits then re-runs the batch (errors append is an idempotent
        # no-op on its committed run_id) instead of skipping it and
        # silently dropping the batch's error rows.
        io.append(spark, errors, "errors", run_id, ts_col="ts")
        m = io.append(
            spark, features, "features", run_id, ts_col="ts",
            extra_meta={"pipeline": meta, "batch": b},
        )
        summary["batches"].append(
            {"batch": b, "status": "committed", "rows": m["total_rows"]}
        )
    summary["total_rows"] = sum(x["rows"] for x in summary["batches"])
    return summary
