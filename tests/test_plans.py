"""Physical-plan regression tests: the optimizations the engine relies
on at 100 TB must be visible in the plan — predicate pushdown reaching
the scan, column pruning, broadcast joins for small dims, and the
flagship's bounded exchange/sort counts (explain-only; no jobs run)."""

from __future__ import annotations

import re

import pytest

SF = "/root/testdata/sf0.001"


def _formatted(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark):
    from engine.queries import q_pricing_summary

    plan = _formatted(spark, q_pricing_summary(spark, SF))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "l_shipdate" in m.group(1), "date filter must push into the scan"


def test_column_pruning(spark):
    from engine.doc_queries import q_doc_token_stats

    plan = _formatted(spark, q_doc_token_stats(spark, SF))
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m, plan
    schema = m.group(1)
    assert "text" in schema and "doc_id" in schema
    # untouched columns must NOT be read
    assert "lang" not in schema and "source" not in schema


def test_broadcast_join_for_small_dims(spark):
    from engine.queries import q_top_customers

    plan = _formatted(spark, q_top_customers(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, "both dim joins must broadcast"
    assert "SortMergeJoin" not in plan


def test_flagship_plan_shape(spark, transcripts_df, context_df):
    from engine.pipeline import extract_features

    f, _e, _m = extract_features(
        spark, transcripts_df, context_df, repartition_before_text=False
    )
    plan = _formatted(spark, f)
    nodes = re.findall(
        r"\(\d+\) (Exchange|Sort|ArrowEvalPython|MapInPandas)\b", plan
    )
    counts = {k: nodes.count(k) for k in set(nodes)}
    # single-shuffle path: window exchange + as-of union exchange only
    assert counts.get("Exchange", 0) <= 2, counts
    # one sort per distinct ordering: window chain, rolling (ts_sec),
    # as-of union tag, and the final output ordering
    assert counts.get("Sort", 0) <= 4, counts
    # exactly ONE Python stage (the text kernel): the expanding top-k
    # runs as the pure-codegen vocab formulation, no kernel at all
    assert counts.get("ArrowEvalPython", 0) == 1
    assert counts.get("MapInPandas", 0) == 0


def test_asof_probe_filter_prunes_columns(spark):
    from engine.queries import q_asof_purchase

    plan = _formatted(spark, q_asof_purchase(spark, SF))
    # both scans of events must push the event_type filter
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("event_type" in p for p in pushed), pushed


def _n_jobs(spark) -> int:
    return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()


def test_flagship_no_prepass_with_explicit_vocab(spark, transcripts_df, context_df):
    """With vocab passed (the production catalog-stat path), building
    the ENTIRE feature plan launches ZERO Spark jobs — no vocab
    discovery scan, no hidden collect anywhere in plan construction.
    Without vocab, exactly ONE narrow discovery job runs."""
    from engine.generate import TOOLS
    from engine.pipeline import extract_features

    before = _n_jobs(spark)
    f, _e, _m = extract_features(
        spark, transcripts_df, context_df, vocab=list(TOOLS),
        repartition_before_text=False,
    )
    assert _n_jobs(spark) == before, "plan construction must launch no jobs"
    assert _m["topk_strategy"] == "vocab"

    before = _n_jobs(spark)
    f, _e, _m = extract_features(
        spark, transcripts_df, context_df, repartition_before_text=False
    )
    # one discovery QUERY (AQE may stage it as >1 job); bounded small
    assert 1 <= _n_jobs(spark) - before <= 3, "vocab=None costs one bounded discovery query"


def test_ivf_assignment_never_shuffles_corpus(spark):
    """IVF cell assignment must stay a per-row projection over the
    broadcast centroid array: the only allowed non-broadcast exchanges
    are the two k-row centroid collects and the per-probe candidate
    top-k (the round-3 rewrite — the window-per-id argmin it replaced
    cost 14 exchanges + 12 sorts)."""
    from pyspark.sql import functions as F

    from engine.operators.similarity import ivf_topk

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = spark.createDataFrame(
        [(i, [float(i)] * 64) for i in range(4)],
        "cell_id int, centroid array<double>",
    )
    probes = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    plan = _formatted(spark, ivf_topk(e, probes, cents, k=3, nprobe=2))
    n_bcast = plan.count("BroadcastExchange")
    n_exch = len(re.findall(r"\(\d+\) Exchange\b", plan))
    n_sort = len(re.findall(r"\(\d+\) Sort\b", plan))
    assert n_exch <= 3, (n_exch, plan[:3000])
    assert n_sort <= 4, n_sort
    assert n_bcast >= 2  # centroid array to both sides + probe cells


def test_funnel_steps_plan_shape(spark):
    """The sessionized funnel stays codegen end-to-end: no Python
    stages, bounded exchanges (sessionize window, per-session agg,
    global roll-up)."""
    from engine.queries import q_funnel_steps

    plan = _formatted(spark, q_funnel_steps(spark, SF))
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    n_exch = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exch <= 4, n_exch


def test_multimodal_is_one_python_stage(spark):
    """Binary decode: exactly one Arrow-batched MapInPandas over the
    scan; payload synthesis stays codegen (no extra Python stage)."""
    from engine.doc_queries import q_multimodal_meta

    plan = _formatted(spark, q_multimodal_meta(spark, SF))
    assert len(re.findall(r"\(\d+\) MapInPandas\b", plan)) == 1
    assert "ArrowEvalPython" not in plan


def _exchanges(plan: str) -> list[tuple[str, str]]:
    """(input_columns, partitioning_args) per Exchange node in a
    formatted plan's details section."""
    return [
        (m.group(1), m.group(2))
        for m in re.finditer(
            r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]"
            r"\s*\nArguments: ([^\n]*)",
            plan,
        )
    ]


@pytest.mark.parametrize("name", ["dedup_near_pairs", "dedup_simhash_pairs"])
def test_dedup_pair_join_plan_shape(spark, name):
    """The dedup family's candidate generation must stay BUCKETED at
    any scale (round-3 verdict pin request): the banded/chunked
    self-join may never plan a BroadcastNestedLoopJoin or
    CartesianProduct (all-pairs), the scan must prune to doc_id+text
    only, and every HASH-partitioned exchange (a join/agg shuffle)
    must carry only ids and hashes — document text may move only in
    the adaptive round-robin scan-spread repartition (sandbox-only:
    single-file inputs; at real scale the scan has many splits and
    that repartition is skipped, engine/doc_queries._heavy)."""
    from engine.doc_queries import QUERIES

    plan = _formatted(spark, QUERIES[name](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # column pruning at the source
    for rs in re.findall(r"ReadSchema: ([^\n]*)", plan):
        assert "lang" not in rs and "source" not in rs, rs
    exchanges = _exchanges(plan)
    assert exchanges, "expected Exchange detail nodes in the plan"
    for cols, args in exchanges:
        if "hashpartitioning" in args:
            assert "text#" not in cols, (
                f"hash shuffle carries raw text: [{cols}] via {args}"
            )


def test_bucketed_join_is_shuffle_free(spark, tmp_path_factory):
    """Disk bucketing: both sides bucketed by the join key into the
    same bucket count join WITHOUT an Exchange — the co-located-join
    layout a 100 TB fact/fact join relies on (shuffle happens once at
    write time, amortized over every later join)."""
    import os

    wh = str(tmp_path_factory.mktemp("warehouse"))
    ev = spark.read.parquet(f"{SF}/events.parquet")
    for name, df in (
        ("b_views", ev.filter("event_type = 'view'").select("user_id", "event_id", "ts")),
        ("b_purch", ev.filter("event_type = 'purchase'").select("user_id", "value")),
    ):
        (
            df.write.mode("overwrite")
            .option("path", os.path.join(wh, name))
            .bucketBy(8, "user_id").sortBy("user_id")
            .saveAsTable(name)
        )
    # disable auto-broadcast: the point is the co-located shuffle-free
    # SMJ/SHJ (at 100 TB neither side broadcasts), not dim broadcasting
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_views").join(spark.table("b_purch"), "user_id")
        plan = _formatted(spark, j)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        for name in ("b_views", "b_purch"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_contamination_plan_broadcasts_bench_side(spark):
    """Decontamination joins the tiny benchmark gram set by broadcast —
    never a shuffled or nested-loop join against the corpus grams."""
    from engine.doc_queries import q_doc_contamination

    plan = _formatted(spark, q_doc_contamination(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_auto_salted_topk_plan_shape(spark):
    """The conditional-salt dispatch stays a two-stage hash aggregate:
    no Python stages, no join of any kind in the aggregation path."""
    from engine.queries import q_topk_auto_salted

    plan = _formatted(spark, q_topk_auto_salted(spark, SF))
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_contamination13_gram_stage_parallelism(spark):
    """Round-6 scale fix: the long-doc n=13 fixture must not collapse
    onto 1-2 tasks. The chunked core hash-repartitions token chunks by
    (doc_id, chunk_idx) into a FIXED width (REPARTITION_BY_NUM — AQE
    may not coalesce it), computes the gram subplan exactly once (no
    bench/corpus double-filter), and aggregates by gram hash with no
    join of any kind."""
    from engine.doc_queries import q_doc_contamination13

    plan = _formatted(spark, q_doc_contamination13(spark, SF))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert re.search(
        r"hashpartitioning\(doc_id#\d+L?, _ci#\d+, %d\)" % n_part, plan
    ), "gram stage must be a fixed-width hash repartition over chunks"
    for node in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, node
