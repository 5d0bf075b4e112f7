"""Deduplication operators for document corpora — exact, MinHash+LSH,
SimHash — designed for 100 TB scale.

Reference lineage: the reference's only dedup is `np.unique` before
clustering (color_extractor.py:177) and order-preserving set dedup
(dribbble_extractor.py:117-119); a training-data pipeline needs the
full family, so these are built Spark-first:

- exact_dedup:      one hash aggregation on a 128-bit fingerprint
                    (map-side partial combine; shuffle carries only
                    (fingerprint, id) — never the text).
- MinHash + LSH:    shingle → H minhashes → B band keys → bucket
                    self-join → verified n-gram Jaccard. The self-join
                    shuffles only (band_key, doc_id, signature) — text
                    rejoined only for the tiny candidate set. Bucket
                    sizes are bounded w.h.p.; AQE skew-join splits any
                    pathological bucket.
- SimHash:          64 bits are overkill for an oracle-checkable demo;
                    we emit a 16-bit simhash from token hashes via one
                    explode + hash-agg (both shuffles are on doc_id —
                    partial-aggregated map-side).

Every hash is md5-based (hex strings; fixed-width lowercase hex makes
lexicographic MIN == numeric MIN), so DuckDB oracles reproduce values
bit-exactly — no engine-specific hash functions anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------

def word_shingles(col_name: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the whitespace-tokenized text
    column `col_name`. Empty array when fewer than n tokens.

    NOTE: inlines the tokenization into the per-shingle lambda — fine
    for tests/small inputs; hot paths use `with_shingles` (tokens
    materialized once per row, not once per shingle)."""
    return F.expr(
        f"CASE WHEN size(split(trim({col_name}), '\\\\s+')) >= {n} THEN "
        f"array_distinct(transform("
        f"  sequence(1, size(split(trim({col_name}), '\\\\s+')) - {n - 1}),"
        f"  i -> array_join(slice(split(trim({col_name}), '\\\\s+'), i, {n}), ' ')))"
        f" ELSE array() END"
    )


def with_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, out: str = "shingles"
) -> DataFrame:
    """Append a distinct word-n-gram shingle column with the token
    array materialized ONCE per row. Inlining split() into the
    transform lambda re-tokenizes per shingle — O(tokens²) per
    document (measured 8-15 s for 5k docs vs <1 s materialized)."""
    df = df.withColumn("_toks", F.split(F.trim(F.col(text_col)), r"\s+"))
    sh = F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> array_join(slice(_toks, i, {n}), ' '))) ELSE array() END"
    )
    return df.withColumn(out, sh).drop("_toks")


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group exact duplicates (after whitespace/case normalization):
    one row per distinct fingerprint with the canonical (minimum) id
    and the duplicate count. At scale: a single hash aggregation whose
    shuffle rows are (16-byte hash, id) — text never shuffles."""
    from engine.functions.docs import content_fingerprint

    return (
        df.select(
            content_fingerprint(F.col(text_col)).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash signatures + LSH candidate pairs + verified Jaccard
# ---------------------------------------------------------------------------

def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: sig_h = MIN over shingles of
    md5(shingle || '#' || h). Hex-string min == numeric min (fixed
    width). Docs with zero shingles are dropped (nothing to hash).

    Round-6 shape (guide §1.2 per-task work, measured 2.7 s → 0.4 s at
    sf0.1): EXPLODE the shingles to rows and compute the 8 md5s as
    flat whole-stage-codegen columns feeding a partial-aggregated
    `groupBy(id).agg(min(...))`. The previous per-doc form ran the 8
    md5 transforms as interpreted HOF lambdas (HOFs never enter
    codegen) and paid the shingle-array build twice more in the
    inferred size()>0 filter. min over the exploded multiset equals
    min over the distinct shingle set, so the signatures are
    bit-identical; the added exchange carries only the partially
    aggregated (id, 8×32-char) rows — one narrow row per doc per map
    task, not the shingle stream.

    PERF NOTE (measured, round 3 — still binding for per-doc-array
    shapes): deriving 4×32-bit hashes per md5 made this SLOWER (no
    subexpression elimination across HOF consumers), as did folding
    the mins into one `aggregate` with a zip_with merge. If this ever
    reverts to a per-doc-array form, eight independent flat transforms
    of one md5 each was the fastest such shape (4.2 s)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    t = df.select(F.col(id_col), toks.alias("_toks"))
    sh_expr = (
        f"CASE WHEN size(_toks) >= {shingle_n} THEN "
        f"transform(sequence(1, size(_toks) - {shingle_n - 1}), "
        f"i -> concat_ws(' ', slice(_toks, i, {shingle_n}))) "
        f"ELSE array() END"
    )
    exploded = t.select(F.col(id_col), F.explode(F.expr(sh_expr)).alias("_s"))
    return exploded.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.col("_s"), F.lit(f"#{h}")))).alias(f"sig_{h}")
            for h in range(num_hashes)
        ]
    )


def lsh_band_rows(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id, band_idx, band_key) LSH bucket rows: the signature split
    into `bands` bands of num_hashes/bands rows, each keyed by the md5
    of its concatenated sig values. Shared by the batch candidate join
    below AND the incremental dedup's persisted signature state
    (operators/dedup_incremental.py) — one banding definition, so the
    two can never drift, and both inherit the divisibility check
    (trailing hashes silently ignored would weaken recall)."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}); "
            "trailing signature hashes would be silently ignored, weakening recall"
        )
    rows = num_hashes // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat(*[F.col(f"sig_{b * rows + r}") for r in range(rows)])
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_key")


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """LSH banding candidates: docs sharing any band key. Returns
    distinct (id_a < id_b) pairs.

    Round-6 shape (guide §2.4 remove shuffles / duplicated subtrees):
    one hash aggregation per (band_idx, band_key) bucket collecting the
    member ids, then in-bucket pair expansion from the sorted id array
    — the signature subplan is referenced ONCE instead of twice (the
    old self-join evaluated the full shingle+minhash pipeline on both
    sides), and the exchange carries (band_idx, band_key, id) exactly
    once. Bucket sizes are O(1) w.h.p. so the in-bucket expansion is
    bounded; degenerate buckets expand quadratically in either shape."""
    bands_df = lsh_band_rows(sigs, id_col, num_hashes, bands)
    buckets = (
        bands_df.groupBy("band_idx", "band_key")
        .agg(F.collect_list(id_col).alias("_ids"))
        .filter(F.size("_ids") >= 2)
        .select(F.array_sort("_ids").alias("_sorted"))
    )
    return (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(_sorted) - 1), "
                    "j -> transform(sequence(0, j - 1), "
                    "i -> struct(_sorted[i] AS id_a, _sorted[j] AS id_b))))"
                )
            ).alias("_p")
        )
        .select(F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b"))
        .distinct()
    )


def verified_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → band buckets →
    candidate pairs → exact n-gram Jaccard on the candidates only →
    keep pairs with jaccard >= threshold.

    Scale shape (round-6 restructure, guide §2.4/§3.1): the expensive
    exact Jaccard runs ONLY on the candidate set (|candidates| <<
    |docs|²). The candidate pair list is unpivoted to (pair, id) rows
    and BROADCAST against the raw docs, so shingles are recomputed for
    exactly the candidate docs — the old shape re-joined the full
    corpus-wide shingle subplan twice (two more evaluations of the
    tokenize+shingle pipeline); this one evaluates the signature
    subplan once and re-shingles only candidates. Per-pair shingle
    arrays then meet in one tiny hash aggregation keyed by the pair."""
    sigs = minhash_signature(df, id_col, text_col, num_hashes, shingle_n)
    pairs = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    cand_long = pairs.select(
        F.struct("id_a", "id_b").alias("_p"),
        F.explode(F.array("id_a", "id_b")).alias(id_col),
    )
    cand_docs = df.select(F.col(id_col), F.col(text_col)).join(
        F.broadcast(cand_long), id_col
    )
    cand_sh = with_shingles(cand_docs, text_col, shingle_n).select(
        "_p", F.col(id_col), "shingles"
    )
    both = cand_sh.groupBy("_p").agg(
        F.first(
            F.when(F.col(id_col) == F.col("_p.id_a"), F.col("shingles")),
            ignorenulls=True,
        ).alias("sh_a"),
        F.first(
            F.when(F.col(id_col) == F.col("_p.id_b"), F.col("shingles")),
            ignorenulls=True,
        ).alias("sh_b"),
    )
    return (
        both.withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("_p.id_a").alias("id_a"),
            F.col("_p.id_b").alias("id_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Near-dup clusters (connected components over verified pairs)
# ---------------------------------------------------------------------------

def connected_components(
    vertices: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by iterative min-label propagation:
    label(v) ← min(label(v), min over neighbors of label(n)), repeated
    until a fixpoint. Returns (id_col, cluster_id) where cluster_id is
    the minimum vertex id of the component; vertices with no pairs are
    singletons labeled by their own id.

    `pairs` must carry (id_a, id_b). Each round costs one shuffle join
    of labels against the (sparse) edge list + one aggregate; rounds =
    graph diameter. Near-dup graphs are forests of tiny cliques, so
    this converges in a handful of rounds; for adversarial long-chain
    graphs (diameter > max_iter) use `connected_components_star`
    (large-star/small-star contraction, O(log²) rounds). Raises
    RuntimeError instead of silently returning truncated labels when
    max_iter is exhausted before the fixpoint.
    Labels are localCheckpoint()ed every round to truncate lineage."""
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("lab")
    ).localCheckpoint()
    for _ in range(max_iter):
        neigh = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("lab").alias("_nmin"))
        )
        new = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("lab"), F.coalesce(F.col("_nmin"), F.col("lab"))
                ).alias("lab"),
                F.col("lab").alias("_old"),
            )
        ).localCheckpoint()
        changed = new.filter(F.col("lab") != F.col("_old")).count()
        labels = new.drop("_old")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing): the graph diameter exceeds "
            f"max_iter — use connected_components_star (O(log²) rounds) or "
            f"raise max_iter"
        )
    return labels.select(F.col("id").alias(id_col), F.col("lab").alias("cluster_id"))


def connected_components_star(
    vertices: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 40,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the scale path for adversarial graphs whose
    diameter exceeds what per-round label propagation can afford:
    converges in O(log² n) rounds independent of diameter, where
    `connected_components` needs diameter-many rounds.

    Per round (both halves are one groupBy-shuffle over the edge list;
    vertex payloads are two ids — text/vectors never enter):

    - large-star: for every node u, connect every neighbor v > u to
      m = min(Γ(u) ∪ {u})   — hangs big nodes off the local minimum,
      halving long chains;
    - small-star: orient edges to (hi=max, lo=min); for every node u,
      connect u and all its smaller neighbors to their collective
      minimum — flattens partial stars.

    Fixpoint when the edge multiset is unchanged (checked with a
    count + xxhash64-XOR fingerprint: one cheap action per round, same
    driver-coordination shape as the propagation variant but only
    O(log²) of them). Returns (id_col, cluster_id), cluster_id = the
    component's minimum vertex id; singletons label themselves.
    """
    edges = (
        pairs.select(
            F.least("id_a", "id_b").alias("lo"),
            F.greatest("id_a", "id_b").alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint()
    )

    def _fingerprint(e: DataFrame) -> tuple:
        # XOR, not SUM: order-independent over the distinct edge set
        # and cannot overflow under ANSI arithmetic
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("lo", "hi")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    fp = _fingerprint(edges)
    for _round in range(max_iter):
        if stats is not None:  # rounds-to-fixpoint, for the scale probe
            stats["rounds"] = _round + 1
        # large-star: group by u over the symmetric edge list
        sym = edges.select(
            F.col("lo").alias("u"), F.col("hi").alias("v")
        ).unionByName(edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")))
        grouped = sym.groupBy("u").agg(
            F.collect_list("v").alias("nbrs"), F.min("v").alias("_minn")
        )
        m = F.least(F.col("u"), F.col("_minn"))
        large = (
            grouped.select(
                F.explode(
                    F.filter(F.col("nbrs"), lambda v: v > F.col("u"))
                ).alias("v"),
                m.alias("m"),
            )
            .filter(F.col("v") != F.col("m"))
            .select(F.least("v", "m").alias("lo"), F.greatest("v", "m").alias("hi"))
            .distinct()
        )
        # small-star: edges oriented hi→lo; connect hi and all its
        # smaller neighbors to their collective minimum
        sgrp = large.groupBy(F.col("hi").alias("u")).agg(
            F.collect_list("lo").alias("nbrs"), F.min("lo").alias("m")
        )
        small = (
            sgrp.select(
                F.explode(
                    F.array_union(F.col("nbrs"), F.array(F.col("u")))
                ).alias("v"),
                F.col("m"),
            )
            .filter(F.col("v") != F.col("m"))
            .select(F.least("v", "m").alias("lo"), F.greatest("v", "m").alias("hi"))
            .distinct()
            .localCheckpoint()
        )
        new_fp = _fingerprint(small)
        edges = small
        if new_fp == fp:
            break
        fp = new_fp
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # at the fixpoint every edge is (center=lo, member=hi)
    labels = edges.select(
        F.col("hi").alias("id"), F.col("lo").alias("cluster_id")
    )
    return (
        vertices.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("cluster_id", "id").alias("cluster_id"),
        )
    )


def near_dup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    algorithm: str = "label",
) -> DataFrame:
    """End-to-end near-duplicate clustering: MinHash-LSH verified pairs
    → connected components → (doc_id, cluster_id). The dedup decision a
    training pipeline actually executes: keep min-id per cluster.

    `algorithm`: 'label' (min-label propagation; rounds = diameter,
    right for near-dup clique forests) or 'star' (large-star/small-star
    contraction; O(log²) rounds, right for adversarial chains)."""
    pairs = verified_near_dups(
        df, id_col, text_col, num_hashes, bands, shingle_n, threshold
    ).select("id_a", "id_b")
    cc = connected_components_star if algorithm == "star" else connected_components
    return cc(df.select(id_col), pairs, id_col)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash16(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """16-bit SimHash over distinct whitespace tokens. Token hash =
    first 4 hex chars of md5(token) as an integer; bit j of the simhash
    is set iff the sum over tokens of ±1 (by bit j of the token hash)
    is positive. One explode + one hash-agg keyed on id (partial
    map-side combine keeps the shuffle small). Docs with no tokens get
    simhash NULL."""
    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("tok"),
    ).withColumn(
        "h",
        F.when(
            F.col("tok").isNotNull() & (F.col("tok") != ""),
            F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long"),
        ),
    )
    # Round-6 (guide §1.2): PACKED bit counters — two bit positions per
    # 64-bit sum (32-bit fields, overflow-safe to 2^32 distinct tokens
    # per doc) halve the aggregation buffer count; bit j of the simhash
    # is then set iff 2*count_set(j) > n_tok, identical to the old
    # sum-of-±1 > 0 rule. The fewer generated aggregate expressions
    # also compile ~3x faster, which a one-shot bench run pays in full.
    packed_sums = [
        F.sum(
            F.when(
                F.col("h").isNull(), F.lit(0).cast("long")
            ).otherwise(
                F.shiftright(F.col("h"), g).bitwiseAND(1)
                + F.shiftleft(
                    F.shiftright(F.col("h"), g + 1).bitwiseAND(1), 32
                )
            )
        ).alias(f"p{g}")
        for g in range(0, 16, 2)
    ]
    agg = toks.groupBy(id_col).agg(
        *packed_sums, F.count("h").alias("_n_tok")
    )
    sim = None
    for j in range(16):
        cnt = F.shiftright(F.col(f"p{j - j % 2}"), 32 * (j % 2)).bitwiseAND(
            0xFFFFFFFF
        )
        term = F.when(cnt * 2 > F.col("_n_tok"), F.lit(1 << j)).otherwise(0)
        sim = term if sim is None else sim + term
    return agg.select(
        F.col(id_col),
        F.when(F.col("_n_tok") > 0, sim).cast("int").alias("simhash"),
    )


def _exploded_distinct_tokens(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, tok) rows, one per distinct whitespace token; blank docs
    keep a NULL tok row so every doc survives the aggregation."""
    return df.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("tok"),
    )


def simhash64(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_chunks: int = 4,
    chunk_bits: int = 16,
) -> DataFrame:
    """SimHash as `num_chunks` independent `chunk_bits`-bit chunks
    (sim_0..sim_{c-1}): chunk c's token hash is the next chunk_bits/4
    hex chars of md5(token) — num_chunks*chunk_bits independent hash
    bits total, emitted chunked so the banded Hamming-distance pair
    join (`simhash_near_pairs`) needs no 64-bit unsigned arithmetic
    anywhere (portable to the DuckDB oracle). Default 4×16 = the 64-bit
    signature; widen chunks (e.g. 4×24) to shrink random-collision
    candidates at large corpus sizes — see `simhash_near_pairs` for the
    envelope arithmetic.

    One explode + one hash-agg keyed on id, partial map-side combine —
    same scale shape as `simhash16`. Docs with no tokens → NULL chunks.
    """
    if chunk_bits % 4 or not 4 <= chunk_bits <= 28:
        raise ValueError("chunk_bits must be a multiple of 4 in [4, 28]")
    if num_chunks * chunk_bits > 128:
        raise ValueError("md5 provides 128 bits: num_chunks*chunk_bits <= 128")
    hexlen = chunk_bits // 4
    toks = _exploded_distinct_tokens(df, id_col, text_col)
    nonblank = F.col("tok").isNotNull() & (F.col("tok") != "")
    for c in range(num_chunks):
        toks = toks.withColumn(
            f"_h{c}",
            F.when(
                nonblank,
                F.conv(
                    F.substring(F.md5("tok"), hexlen * c + 1, hexlen), 16, 10
                ).cast("long"),
            ),
        )
    # Round-6 (guide §1.2): PACKED bit counters, two positions per
    # 64-bit sum (32-bit fields) — num_chunks*chunk_bits/2 aggregation
    # buffers instead of num_chunks*chunk_bits. Bit j is set iff
    # 2*count_set(j) > n_tok, identical to the old sum-of-±1 > 0 rule
    # (sum = 2*cnt - n_tok). Measured at sf0.1: 3.5 s → 1.1 s for the
    # one-shot run (codegen compilation of 64 independent aggregate
    # expressions dominated), 0.6 s both warm.
    packed_sums = [
        F.sum(
            F.when(
                F.col(f"_h{c}").isNull(), F.lit(0).cast("long")
            ).otherwise(
                F.shiftright(F.col(f"_h{c}"), g).bitwiseAND(1)
                + F.shiftleft(
                    F.shiftright(F.col(f"_h{c}"), g + 1).bitwiseAND(1), 32
                )
            )
        ).alias(f"p{c}_{g}")
        for c in range(num_chunks)
        for g in range(0, chunk_bits, 2)
    ]
    agg = toks.groupBy(id_col).agg(*packed_sums, F.count("_h0").alias("_n_tok"))
    out_cols = [F.col(id_col)]
    for c in range(num_chunks):
        sim = None
        for j in range(chunk_bits):
            cnt = F.shiftright(
                F.col(f"p{c}_{j - j % 2}"), 32 * (j % 2)
            ).bitwiseAND(0xFFFFFFFF)
            term = F.when(cnt * 2 > F.col("_n_tok"), F.lit(1 << j)).otherwise(0)
            sim = term if sim is None else sim + term
        out_cols.append(
            F.when(F.col("_n_tok") > 0, sim).cast("int").alias(f"sim_{c}")
        )
    return agg.select(*out_cols)


def _chunk_candidate_pairs(
    sims: DataFrame, id_col: str, num_chunks: int
) -> DataFrame:
    """Distinct (id_a < id_b) pairs agreeing on >= 1 simhash chunk —
    the blocking stage of `simhash_near_pairs`, exposed so tests can
    measure the candidate ENVELOPE independently of verification.

    Round-6 measured note: this self-join is NOT a duplicated-subtree
    problem — the two sides are canonically identical, so ReuseExchange
    computes the chunk exchange once. A bucket-aggregate rewrite
    (collect_list + in-bucket expansion, as in `lsh_candidate_pairs`)
    measured SLOWER here (3.5 s vs 2.1 s at sf0.1): it traded the
    reused exchange for an ObjectHashAggregate + struct sort."""
    chunk_structs = F.array(
        *[
            F.struct(F.lit(c).alias("chunk_idx"), F.col(f"sim_{c}").alias("cv"))
            for c in range(num_chunks)
        ]
    )
    chunks = sims.select(
        F.col(id_col), F.explode(chunk_structs).alias("ch")
    ).select(id_col, "ch.chunk_idx", "ch.cv")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    num_chunks: int = 4,
    chunk_bits: int = 16,
) -> DataFrame:
    """SimHash-based near-duplicate PAIRS — the banded Hamming join
    that turns the signature into an actual dedup.

    Pigeonhole guarantee: two simhashes within Hamming distance <=
    num_chunks - 1 agree EXACTLY on at least one chunk, so a bucketed
    self-join on (chunk_idx, chunk_value) finds every such pair — no
    all-pairs comparison. Candidates are then verified with the exact
    Hamming distance (sum of per-chunk bit_count of xor) and filtered
    at `max_hamming`. `max_hamming` > num_chunks - 1 weakens the
    guarantee to recall < 1 (LSH-style); below it is exact-complete.

    Candidate ENVELOPE (the 100 TB sizing rule, pinned by
    tests/test_dedup.py::test_simhash_candidate_envelope): unrelated
    docs collide on a chunk by chance, so expected candidates ~=
    num_chunks * C(n,2) / 2^chunk_bits. At the default 4×16 that is
    ~n²/2^15 — negligible to ~10^8 docs, but at 10^10 docs it is
    ~3×10^15 pairs: widen chunks instead (4×24 → /2^23, the same md5
    budget) or shard the join by a cheap doc-class prefix. The
    verified output is unaffected; only the intermediate grows.

    Scale shape (round-6 restructure, measured 2.0 s → warm sub-second
    at sf0.1): the chunk self-join carries the full signature on both
    sides (num_chunks extra ints per bucket row), so the exact Hamming
    check runs INSIDE the join stage and candidates failing it die
    before any further exchange. The old shape piped ~2M raw candidate
    pairs (this corpus's chunk values form large cliques) through a
    distinct exchange and two verification joins; now only verified
    pairs reach the final distinct. The two join sides are canonically
    identical, so ReuseExchange computes the bucket exchange once.
    Chunk buckets are O(n/2^chunk_bits) for random hashes; degenerate
    value cliques still expand in-join, as in any banding scheme.
    """
    sims = simhash64(df, id_col, text_col, num_chunks, chunk_bits).filter(
        F.col("sim_0").isNotNull()
    )
    chunk_structs = F.array(
        *[
            F.struct(F.lit(c).alias("chunk_idx"), F.col(f"sim_{c}").alias("cv"))
            for c in range(num_chunks)
        ]
    )
    chunks = sims.select(
        F.col(id_col),
        *[F.col(f"sim_{c}") for c in range(num_chunks)],
        F.explode(chunk_structs).alias("ch"),
    ).select(
        id_col, *[f"sim_{c}" for c in range(num_chunks)], "ch.chunk_idx", "ch.cv"
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = None
    for c in range(num_chunks):
        term = F.bit_count(
            F.col(f"a.sim_{c}").bitwiseXOR(F.col(f"b.sim_{c}"))
        )
        hamming = term if hamming is None else hamming + term
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "hamming",
        )
        .distinct()
    )
