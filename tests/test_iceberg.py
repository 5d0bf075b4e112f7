"""IcebergTableIO contract test — runs ONLY when the iceberg-spark
runtime jar is on the classpath (never in this sandbox; see
engine/tableio_iceberg.py header for the spark-submit config). The
module itself must always import cleanly and the API must mirror
TableIO's surface."""

from __future__ import annotations

import pytest

from engine.tableio_iceberg import IcebergTableIO


def test_api_mirrors_tableio():
    """The three-method contract (append / is_committed / read +
    manifest surface) matches TableIO, so runner.py callers swap
    implementations without code changes."""
    from engine.tableio import TableIO

    for name in ("append", "is_committed", "read", "read_manifest", "committed_runs"):
        assert hasattr(IcebergTableIO, name)
        assert hasattr(TableIO, name)


def test_iceberg_roundtrip(spark, transcripts_df):
    if not IcebergTableIO.available(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath (sandbox)")
    io = IcebergTableIO("local", "engine_test")
    m = io.append(spark, transcripts_df.limit(100), "t_rt", "run-0001")
    assert m["total_rows"] == 100
    assert io.is_committed(spark, "t_rt", "run-0001")
    # idempotent re-append
    m2 = io.append(spark, transcripts_df.limit(100), "t_rt", "run-0001")
    assert m2["snapshot_id"] == m["snapshot_id"]
    assert io.read(spark, "t_rt").count() == 100
