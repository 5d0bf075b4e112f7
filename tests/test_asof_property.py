"""Property-based as-of join tests (hypothesis): on random small
probe/context tables — duplicate timestamps, empty sides, unmatched
entities included by construction — both engine strategies agree with
a naive O(n·m) Python reference, for strict and non-strict boundaries.

One Spark round-trip per example is slow, so hypothesis drives the
TABLE GENERATOR and the examples are batched into a handful of Spark
jobs (max_examples kept small; the generator's edge-case weighting —
ties, boundary-equal timestamps — does the heavy lifting)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from engine.operators.asof import asof_join

TS = [1000, 2000, 2000, 3000, 5000]  # duplicate ts by construction


@st.composite
def tables(draw):
    n_probe = draw(st.integers(1, 8))
    n_ctx = draw(st.integers(0, 8))
    entities = ["a", "b"]
    probe = [
        (
            draw(st.sampled_from(entities)),
            draw(st.sampled_from(TS)),
            i,
        )
        for i in range(n_probe)
    ]
    ctx = [
        (
            draw(st.sampled_from(entities + ["c"])),  # 'c' never probed
            draw(st.sampled_from(TS)),
            i,
            float(draw(st.integers(0, 100))),
        )
        for i in range(n_ctx)
    ]
    return probe, ctx


def _reference(probe, ctx, strict):
    out = {}
    for on, pts, pidx in probe:
        best = None
        for con, cts, cidx, val in ctx:
            if con != on:
                continue
            ok = cts < pts if strict else cts <= pts
            if ok and (best is None or (cts, cidx) > best[:2]):
                best = (cts, cidx, val)
        out[(on, pts, pidx)] = None if best is None else best[2]
    return out


@settings(max_examples=12, deadline=None)
@given(tables(), st.booleans())
def test_asof_strategies_match_reference(spark_global, tb, strict):
    probe_rows, ctx_rows = tb
    probe = spark_global.createDataFrame(
        [(a, float(b), c) for a, b, c in probe_rows],
        "conv string, pts double, pidx long",
    )
    ctx = spark_global.createDataFrame(
        [(a, float(b), c, d) for a, b, c, d in ctx_rows],
        "conv string, cts double, cidx long, val double",
    )
    expect = _reference(probe_rows, ctx_rows, strict)
    for strategy in ("jvm", "kernel"):
        got = asof_join(
            probe, ctx,
            on="conv", probe_ts="pts", probe_idx="pidx",
            ctx_ts="cts", ctx_idx="cidx", payload=["val"],
            strict=strict, strategy=strategy, kernel_buckets=4, kernel_chunks=2,
        ).collect()
        assert len(got) == len(probe_rows), strategy
        for r in got:
            key = (r["conv"], r["pts"], r["pidx"])
            assert r["asof_val"] == expect[key], (strategy, key, dict(expect))


# module-scoped spark fixture alias: hypothesis re-runs the test body
# many times; the session must not be rebuilt per example
import pytest


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


def test_asof_null_timestamps_parity(spark):
    """Null-timestamp semantics (round-3 review): a NULL-ctx_ts context
    row is never admissible (the jvm null-first sort used to serve its
    payload to every early probe), and a NULL-ts probe emits null
    payloads in BOTH strategies (merge_asof used to crash)."""
    from datetime import datetime

    from engine.operators.asof import asof_join

    T0 = datetime(2024, 1, 1)

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, s)

    probe = spark.createDataFrame(
        [("c1", 0, ts(10)), ("c1", 1, ts(20)), ("c1", 2, None)],
        "conv_id string, turn_idx int, ts timestamp",
    )
    context = spark.createDataFrame(
        [
            ("c1", None, 0, 999.0, "poison"),   # null event time
            ("c1", ts(15), 1, 1.0, "ok"),
        ],
        "conv_id string, event_ts timestamp, event_idx int, "
        "ctx_value double, ctx_label string",
    )
    for strategy in ("jvm", "kernel"):
        rows = {
            r["turn_idx"]: (r["asof_ctx_value"], r["asof_ctx_label"])
            for r in asof_join(
                probe, context, strategy=strategy, kernel_chunks=1
            ).collect()
        }
        # probe at t=10: only the null-ts row precedes it → NO match
        assert rows[0] == (None, None), strategy
        # probe at t=20: the real t=15 event
        assert rows[1] == (1.0, "ok"), strategy
        # null-ts probe: no admissible event, nulls — not a crash
        assert rows[2] == (None, None), strategy
