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
