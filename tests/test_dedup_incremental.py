"""Incremental MinHash dedup for streaming ingest: per-epoch signature
checks against committed state must reproduce EXACTLY the batch
`near_dup_clusters` keep-list (including retroactive cluster merges a
later epoch's bridge doc forces), survive crash replays, and compose
with Structured Streaming's foreachBatch."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from engine.operators.dedup import near_dup_clusters
from engine.operators.dedup_incremental import (
    DOCS_TABLE,
    REP_TABLE,
    SIGS_TABLE,
    dedup_keep_list,
    ingest_dedup_increment,
    latest_rep,
    stream_dedup_ingest,
)
from engine.tableio import TableIO

A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
C = "one two three four five six seven eight nine ten"
B = A + " " + C  # bridges A and C: J(A,B)=J(B,C)=8/18≈0.44, J(A,C)=0

THRESH = 0.3


@pytest.fixture()
def io(tmp_path):
    return TableIO(str(tmp_path / "dedup_wh"))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_keep(spark, all_rows):
    df = _mk(spark, all_rows)
    clusters = near_dup_clusters(df, threshold=THRESH)
    return {
        r["doc_id"]
        for r in clusters.groupBy("cluster_id")
        .agg(F.min("doc_id").alias("keep"))
        .select(F.col("keep").alias("doc_id"))
        .collect()
    }


def _corpus():
    """Three epochs with clusters spanning epochs + a retroactive
    merge: doc 3 (epoch 3) bridges doc 1 (epoch 1) and doc 2
    (epoch 2), which are NOT near-dups of each other."""
    e1 = [(1, A), (10, "completely unrelated text about weather patterns today"),
          (11, A + " tail")]          # 11 near-dups 1 within epoch 1
    e2 = [(2, C), (20, "another singleton document discussing cooking recipes now")]
    e3 = [(3, B),                      # the bridge: merges clusters of 1 and 2
          (30, "third epoch unique content regarding mountain hiking routes")]
    return e1, e2, e3


def test_incremental_matches_batch_with_retroactive_merge(spark, io):
    e1, e2, e3 = _corpus()
    for i, epoch in enumerate((e1, e2, e3)):
        s = ingest_dedup_increment(
            spark, io, _mk(spark, epoch), f"job-e{i}", threshold=THRESH
        )
        assert s["status"] == "committed"

    got = {r["doc_id"] for r in dedup_keep_list(spark, io).collect()}
    exp = _batch_keep(spark, e1 + e2 + e3)
    assert got == exp
    # the merge really happened: 1, 2, 3 share one cluster, rep = 1
    rep = {r["doc_id"]: r["rep_id"] for r in latest_rep(spark, io).collect()}
    assert rep[1] == rep[2] == rep[3] == 1
    assert 2 not in got and 3 not in got and 11 not in got
    assert {10, 20, 30} <= got


def test_incremental_epoch_replay_is_noop(spark, io):
    e1, e2, _ = _corpus()
    ingest_dedup_increment(spark, io, _mk(spark, e1), "job-e0", threshold=THRESH)
    before = sorted(map(tuple, latest_rep(spark, io).collect()))
    # foreachBatch at-least-once: the same epoch id is re-delivered
    s = ingest_dedup_increment(spark, io, _mk(spark, e1), "job-e0", threshold=THRESH)
    assert s["status"] == "replayed"
    assert sorted(map(tuple, latest_rep(spark, io).collect())) == before
    # and the state keeps evolving correctly afterwards
    ingest_dedup_increment(spark, io, _mk(spark, e2), "job-e1", threshold=THRESH)
    got = {r["doc_id"] for r in dedup_keep_list(spark, io).collect()}
    assert got == _batch_keep(spark, e1 + e2)


def test_incremental_crash_between_commits_recovers(spark, io):
    """Crash after docs+sigs committed but before doc_rep (the epoch's
    commit point): the retry re-runs the epoch — earlier appends no-op
    on their run_id — and parity with batch still holds."""
    from engine.operators.dedup_incremental import _band_rows

    e1, e2, _ = _corpus()
    ingest_dedup_increment(spark, io, _mk(spark, e1), "job-e0", threshold=THRESH)
    # simulated crash in epoch 1: docs and sigs land, rep does not
    new = _mk(spark, e2)
    io.append(spark, new, DOCS_TABLE, "job-e1", ts_col=None)
    io.append(spark, _band_rows(new, 8, 4, 3), SIGS_TABLE, "job-e1", ts_col=None)
    assert not io.is_committed(REP_TABLE, "job-e1")

    s = ingest_dedup_increment(spark, io, new, "job-e1", threshold=THRESH)
    assert s["status"] == "committed"
    got = {r["doc_id"] for r in dedup_keep_list(spark, io).collect()}
    assert got == _batch_keep(spark, e1 + e2)
    # no duplicate state rows from the partial epoch
    docs = io.read(spark, DOCS_TABLE)
    assert docs.count() == docs.select("doc_id").distinct().count()


def test_incremental_first_epoch_crash_recovers(spark, io):
    """Crash in the FIRST epoch between the sigs and rep commits: the
    retry used to wedge forever (have_state keyed on the sigs table
    made latest_rep read the still-empty doc_rep table — round-4
    review finding #1). The retry must recompute the epoch without
    double-counting its own already-committed docs/sigs rows."""
    from engine.operators.dedup_incremental import _band_rows

    e1, e2, _ = _corpus()
    new = _mk(spark, e1)
    io.append(spark, new, DOCS_TABLE, "job-e0", ts_col=None)
    io.append(spark, _band_rows(new, 8, 4, 3), SIGS_TABLE, "job-e0", ts_col=None)
    assert not io.is_committed(REP_TABLE, "job-e0")

    s = ingest_dedup_increment(spark, io, new, "job-e0", threshold=THRESH)
    assert s["status"] == "committed"
    got = {r["doc_id"] for r in dedup_keep_list(spark, io).collect()}
    assert got == _batch_keep(spark, e1)
    # state stays consistent for later epochs
    ingest_dedup_increment(spark, io, _mk(spark, e2), "job-e1", threshold=THRESH)
    assert {r["doc_id"] for r in dedup_keep_list(spark, io).collect()} == (
        _batch_keep(spark, e1 + e2)
    )


def test_band_rows_rejects_indivisible_params(spark):
    """The incremental state builder shares the batch banding helper,
    so invalid num_hashes/bands raise instead of silently truncating
    trailing hashes (recall loss + batch-parity break)."""
    from engine.operators.dedup_incremental import _band_rows

    with pytest.raises(ValueError, match="divisible"):
        _band_rows(_mk(spark, [(1, A)]), 10, 4, 3)


def test_stream_dedup_ingest_parity_and_restart(spark, io, tmp_path):
    """The foreachBatch wrapper over a file stream
    (maxFilesPerTrigger=1 → one epoch per file): keep-list equals the
    batch operator; a restart with the same checkpoint + job_id picks
    up new files without reprocessing committed epochs."""
    e1, e2, e3 = _corpus()
    src = tmp_path / "stream_src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    _mk(spark, e1).coalesce(1).write.parquet(str(src / "f1"))
    _mk(spark, e2).coalesce(1).write.parquet(str(src / "f2"))

    def run_stream():
        sdf = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = stream_dedup_ingest(
            sdf, io, "sjob", checkpoint_dir=ckpt, threshold=THRESH
        ).trigger(availableNow=True).start()
        q.awaitTermination(180)

    run_stream()
    got = {r["doc_id"] for r in dedup_keep_list(spark, io).collect()}
    assert got == _batch_keep(spark, e1 + e2)

    # restart: a new file arrived; committed epochs must not re-run
    n_rep_snapshots = len(io.committed_runs(REP_TABLE))
    _mk(spark, e3).coalesce(1).write.parquet(str(src / "f3"))
    run_stream()
    got = {r["doc_id"] for r in dedup_keep_list(spark, io).collect()}
    assert got == _batch_keep(spark, e1 + e2 + e3)
    # exactly one new epoch commit (the new file), no replays re-committed
    assert len(io.committed_runs(REP_TABLE)) == n_rep_snapshots + 1
    # the retroactive merge arrived via the stream too
    rep = {r["doc_id"]: r["rep_id"] for r in latest_rep(spark, io).collect()}
    assert rep[1] == rep[2] == rep[3] == 1


def test_incremental_random_differential(spark, io, tmp_path):
    """Randomized differential: random corpora over a tiny token
    alphabet (dense near-dup structure: chains, merges, singletons),
    random epoch splits — the incremental keep-list must equal the
    batch operator's on every draw. Seeded loop rather than hypothesis:
    each draw spins real TableIO state, so example count matters."""
    import random

    from engine.tableio import TableIO

    alphabet = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
                "theta", "iota", "kappa"]
    for trial in range(3):
        rng = random.Random(1000 + trial)
        rows = []
        for doc_id in range(40):
            n = rng.randint(3, 12)
            # small alphabet + short docs → frequent shared shingles
            rows.append(
                (doc_id, " ".join(rng.choice(alphabet) for _ in range(n)))
            )
        n_epochs = rng.randint(2, 4)
        assign = [rng.randrange(n_epochs) for _ in rows]
        t_io = TableIO(str(tmp_path / f"wh{trial}"))
        for ep in range(n_epochs):
            batch = [r for r, a in zip(rows, assign) if a == ep]
            if not batch:
                continue
            ingest_dedup_increment(
                spark, t_io, _mk(spark, batch), f"t{trial}-e{ep}",
                threshold=THRESH,
            )
        got = {r["doc_id"] for r in dedup_keep_list(spark, t_io).collect()}
        exp = _batch_keep(spark, rows)
        assert got == exp, (trial, sorted(got ^ exp))
