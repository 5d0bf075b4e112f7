"""Incremental IVF maintenance (engine/operators/ann_incremental.py):
batch-parity of assign-only epochs, drift-triggered retrain parity
with the batch trainer, replay idempotence, and the stored-inverted-
file query path.

Reference analog: the reference re-extracts features per request
(analyze.py one-shot); the engine's index instead persists and is
maintained per ingest epoch — the operational shape a 100 TB corpus
needs (assign-only ingest, drift-triggered re-train)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from engine.operators.ann_incremental import (
    ann_query,
    assign_cells,
    ingest_ann_increment,
    latest_assignment,
    latest_centroids,
)
from engine.operators.similarity import train_centroids
from engine.tableio import TableIO


def _mk_vecs(spark, ids, rng, dim=8, shift=0.0):
    rows = [
        (int(i), [float(x) for x in rng.normal(shift, 1.0, dim)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture()
def warehouse(tmp_path):
    return TableIO(str(tmp_path / "ann_wh"))


def _np_assign(vecs, cents):
    """Independent numpy argmin-L2 with smaller-cell-id tie-break."""
    out = {}
    for vid, v in vecs:
        d2 = [float(np.sum((np.array(v) - np.array(c)) ** 2)) for _, c in cents]
        out[vid] = int(min(range(len(cents)), key=lambda j: (d2[j], cents[j][0])))
    return out


def test_assign_only_epochs_match_batch_assignment(spark, warehouse):
    rng = np.random.default_rng(7)
    e1 = _mk_vecs(spark, range(0, 40), rng)
    e2 = _mk_vecs(spark, range(40, 70), rng)  # same distribution: no drift
    r1 = ingest_ann_increment(spark, warehouse, e1, "e1", k=4)
    r2 = ingest_ann_increment(spark, warehouse, e2, "e2", k=4)
    assert r1["status"] == "trained"
    assert r2["status"] == "assigned"

    cents = [
        (r["cell_id"], list(r["centroid"]))
        for r in latest_centroids(spark, warehouse).collect()
    ]
    all_vecs = [
        (r["vec_id"], list(r["embedding"]))
        for r in e1.unionByName(e2).collect()
    ]
    expect = _np_assign(all_vecs, sorted(cents))
    got = {
        r["vec_id"]: r["cell_id"]
        for r in latest_assignment(spark, warehouse).collect()
    }
    assert got == expect
    # and the committed snapshot equals the batch trainer on epoch 1
    batch = train_centroids(e1, 4, max_iter=10)
    for (ga, gc), (ba, bc) in zip(sorted(cents), batch):
        assert ga == ba
        np.testing.assert_allclose(gc, bc, rtol=1e-12)


def test_drift_triggers_retrain_with_batch_parity(spark, warehouse):
    rng = np.random.default_rng(11)
    e1 = _mk_vecs(spark, range(0, 40), rng)
    e2 = _mk_vecs(spark, range(40, 80), rng, shift=25.0)  # planted drift
    ingest_ann_increment(spark, warehouse, e1, "e1", k=4, drift_factor=4.0)
    r2 = ingest_ann_increment(
        spark, warehouse, e2, "e2", k=4, drift_factor=4.0
    )
    assert r2["status"] == "retrained"
    # retrain state == batch train+assign over the FULL corpus
    full = e1.unionByName(e2)
    batch_cents = train_centroids(full, 4, max_iter=10)
    got_cents = sorted(
        (r["cell_id"], list(r["centroid"]))
        for r in latest_centroids(spark, warehouse).collect()
    )
    for (ga, gc), (ba, bc) in zip(got_cents, batch_cents):
        assert ga == ba
        np.testing.assert_allclose(gc, bc, rtol=1e-12)
    all_vecs = [
        (r["vec_id"], list(r["embedding"])) for r in full.collect()
    ]
    expect = _np_assign(all_vecs, got_cents)
    got = {
        r["vec_id"]: r["cell_id"]
        for r in latest_assignment(spark, warehouse).collect()
    }
    assert got == expect


def test_replay_is_idempotent(spark, warehouse):
    rng = np.random.default_rng(3)
    e1 = _mk_vecs(spark, range(0, 30), rng)
    r1 = ingest_ann_increment(spark, warehouse, e1, "e1", k=3)
    r1b = ingest_ann_increment(spark, warehouse, e1, "e1", k=3)
    assert r1["status"] == "trained" and r1b["status"] == "replayed"
    assert r1["assign_rows"] == r1b["assign_rows"]
    assert latest_assignment(spark, warehouse).count() == 30


def test_query_uses_stored_index_and_matches_fresh_ivf(spark, warehouse):
    rng = np.random.default_rng(5)
    e1 = _mk_vecs(spark, range(0, 50), rng)
    ingest_ann_increment(spark, warehouse, e1, "e1", k=4)
    probes = e1.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    got = ann_query(spark, warehouse, probes, k=3, nprobe=2)
    # differential: recompute assignment fresh via assign_cells and
    # rank within the same candidate cells
    from engine.operators.similarity import ivf_topk

    cents = latest_centroids(spark, warehouse).withColumnRenamed(
        "centroid", "centroid"
    )
    fresh = ivf_topk(
        e1, probes, cents, k=3, nprobe=2,
        centroid_id="cell_id", centroid_vec="centroid",
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, fresh.collect())
    )
