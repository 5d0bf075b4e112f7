"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

- brute_force_topk: exact cosine top-k. The probe set is broadcast
  (small by construction); the corpus scans once; per-pair math is
  pure `zip_with`/`aggregate` column expressions inside whole-stage
  codegen (no Python). At 100 TB this is the right plan whenever
  |probes| is small — one broadcast, no shuffle of the corpus, and
  the windowed top-k is a partial TakeOrderedAndProject per probe.

- lsh_topk: sign-LSH bucketing — an 8-bit code from the signs of the
  first 8 dimensions (axis-aligned hyperplanes; deterministic and
  oracle-expressible). Probes only join their own bucket, cutting the
  candidate set ~256× on centered data; exact cosine re-ranks inside
  the bucket. The bucket join is a hash join on the code; for IVF-at-
  scale swap the code for a trained coarse-quantizer cell id — the
  plan shape is identical.

All arithmetic casts float→double BEFORE multiplying, and accumulates
left-to-right, matching the DuckDB oracle (`embedding::DOUBLE[]` +
list_dot_product) bit-for-bit on the same input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sign_code(arr: Column, bits: int = 8) -> Column:
    """Sign-LSH bucket code: bit i set iff element i+1 > 0."""
    code = None
    for i in range(bits):
        term = F.when(F.element_at(arr, i + 1) > 0, F.lit(1 << i)).otherwise(0)
        code = term if code is None else code + term
    return code.cast("int")


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "probe_id",
) -> DataFrame:
    """Exact cosine top-k of `corpus` for each probe row. `probes` must
    carry (probe_id, vec_col); self-matches (same id) are excluded.
    Ranking is fully tie-broken (cosine desc, id asc) for determinism."""
    p = F.broadcast(probes.select(F.col(probe_id), F.col(vec_col).alias("_pv")))
    pairs = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(p)
    pairs = pairs.filter(F.col(id_col) != F.col(probe_id)).withColumn(
        "cos", cosine(F.col(vec_col), F.col("_pv"))
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, id_col, F.round("cos", 6).alias("cos"), "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "probe_id",
    bits: int = 8,
) -> DataFrame:
    """Sign-LSH bucketed ANN: candidates share the probe's sign code;
    exact cosine re-ranks within the bucket. Recall < 1 by design (the
    scale path); `brute_force_topk` is the exactness baseline."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col), sign_code(F.col(vec_col), bits).alias("_code")
    )
    p = F.broadcast(
        probes.select(
            F.col(probe_id),
            F.col(vec_col).alias("_pv"),
            sign_code(F.col(vec_col), bits).alias("_code"),
        )
    )
    pairs = c.join(p, "_code").filter(F.col(id_col) != F.col(probe_id))
    pairs = pairs.withColumn("cos", cosine(F.col(vec_col), F.col("_pv")))
    w = Window.partitionBy(probe_id).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, id_col, F.round("cos", 6).alias("cos"), "rank")
    )


def cosine_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share a
    sign-LSH bucket (same blocking as lsh_topk — near-identical vectors
    agree on every sign w.h.p.), then exact cosine filters at
    `threshold`. Returns (id_a < id_b, cos). The self-join shuffles
    only (code, id, vector); bucket sizes are ~|corpus|/2^bits."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col), sign_code(F.col(vec_col), bits).alias("_code")
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b,
        (F.col("a._code") == F.col("b._code"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    return (
        pairs.withColumn(
            "cos", cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        )
        .filter(F.col("cos") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round("cos", 6).alias("cos"),
        )
    )
