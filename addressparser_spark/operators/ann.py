"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. The
  dot product is a Catalyst ``zip_with``+``aggregate`` fold over double-cast
  arrays (JVM, codegen'd; left-to-right fold order is deterministic and
  reproducible in the DuckDB oracle's list functions).
- ``lsh_topk``: the scale path — random-hyperplane (sign) LSH buckets from
  md5-derived ±1 hyperplanes, candidate generation within buckets, exact
  re-rank inside. At 10^9 vectors the bucket join replaces the full cross
  product; the hyperplanes are data-independent and engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOP_K = 5
N_QUERIES = 10
LSH_TABLES = 8
LSH_BITS_PER_TABLE = 4
# embedding dimensionality of the engine's test corpus. ONE constant shared
# by the Spark queries and the DuckDB oracle wiring (so they cannot diverge);
# callers with a different corpus pass dim explicitly. Kept as config, not
# inferred with .first(): arrays carry no dim in the schema and a driver
# action before the plan (or a crash on an empty table) is worse than a
# parameter.
EMB_DIM = 64


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a: Column, b: Column) -> Column:
    d = _norm(a) * _norm(b)
    return F.when(d == 0, F.lit(0.0)).otherwise(_dot(a, b) / d)


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def cosine_topk(
    embeddings: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): exact top-k for the probe set.

    Probe set = vec_id < n_queries (deterministic). The probe side is tiny and
    broadcast; the corpus side streams — at 10^9 vectors this is one scan.
    Ties broken by neighbor_id so ranks are total-order deterministic.
    """
    e = _as_double(embeddings).select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    j = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = j.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine_col(F.col("q_emb"), F.col("embedding")), 6).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane_values(plane: int, dim: int) -> list[float]:
    """±1 hyperplane from md5(plane|d) — computed ONCE driver-side.

    Same rule the DuckDB oracle derives in SQL (first hex char of
    md5('<plane>|<d>') >= '8' -> +1), so results are unchanged; but baking
    the planes into literal arrays removes the per-row md5 storm the r01
    plan had (~n_tables*bits*dim ≈ 2048 md5 calls PER ROW — a scale-killer
    at 10^9 vectors). Hyperplanes are data-independent constants; constants
    belong in the plan, not the row loop.
    """
    import hashlib

    return [
        1.0 if hashlib.md5(f"{plane}|{d}".encode()).hexdigest()[0] >= "8" else -1.0
        for d in range(dim)
    ]


def _hyperplane_sign(emb: Column, plane: int, dim: int) -> Column:
    """Sign bit of <v, h_plane> with the plane embedded as a literal array."""
    h = F.array(*[F.lit(v) for v in _hyperplane_values(plane, dim)])
    proj = F.aggregate(
        F.zip_with(emb, h, lambda x, hv: x * hv),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(proj >= 0, "1").otherwise("0")


def lsh_buckets_col(
    emb: Column,
    dim: int,
    n_tables: int = LSH_TABLES,
    bits_per_table: int = LSH_BITS_PER_TABLE,
) -> Column:
    """Array of per-table bucket keys: 't<i>|' + sign bits of that table's planes.

    Multi-table LSH: one selective signature has near-zero recall on weakly
    correlated vectors; L independent shorter signatures trade candidate count
    for recall (match in >=1 table). Plane (t, j) uses global index
    t*bits_per_table + j so tables are independent.
    """
    keys = []
    for t in range(n_tables):
        bits = F.concat(
            *[
                _hyperplane_sign(emb, t * bits_per_table + j, dim)
                for j in range(bits_per_table)
            ]
        )
        keys.append(F.concat(F.lit(f"t{t}|"), bits))
    return F.array(*keys)


EMB_COSINE_DUP = 0.9
EMB_MAX_BUCKET = 200


def embedding_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = EMB_COSINE_DUP,
    n_tables: int = LSH_TABLES,
    bits_per_table: int = LSH_BITS_PER_TABLE,
    max_bucket: int = EMB_MAX_BUCKET,
) -> DataFrame:
    """(vec_id_a, vec_id_b, cosine, is_dup): embedding-cosine near-dup dedup.

    The fifth dedup family (exact / MinHash / SimHash / n-gram Jaccard /
    embedding cosine): ALL-PAIRS near-duplicates, not a per-query top-k —
    candidates come from the multi-table sign-LSH buckets (same precomputed
    literal hyperplanes as :func:`lsh_topk`), oversized buckets are capped
    (cap + never silent: :func:`embedding_dropped_buckets`), and the exact
    cosine re-rank inside buckets decides ``is_dup``. At 10^9 vectors the
    bucket self-join is the only quadratic step and it is bounded by
    ``max_bucket**2`` per bucket.
    """
    e = _as_double(embeddings).select(
        "vec_id",
        "embedding",
        F.explode(
            lsh_buckets_col(F.col("embedding"), dim, n_tables, bits_per_table)
        ).alias("bucket"),
    )
    from pyspark.storagelevel import StorageLevel

    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = e.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    kept = e.join(sizes.filter(F.col("n") <= max_bucket), "bucket", "left_semi")
    a = kept.select("bucket", F.col("vec_id").alias("vec_id_a"))
    b = kept.select("bucket", F.col("vec_id").alias("vec_id_b"))
    cand = (
        a.join(b, "bucket")
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b")
        .dropDuplicates(["vec_id_a", "vec_id_b"])
    )
    emb = _as_double(embeddings).select("vec_id", "embedding")
    j = (
        cand.join(
            emb.select(F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("emb_a")),
            "vec_id_a",
        )
        .join(
            emb.select(F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("emb_b")),
            "vec_id_b",
        )
    )
    cos = F.round(cosine_col(F.col("emb_a"), F.col("emb_b")), 6)
    return j.select(
        "vec_id_a",
        "vec_id_b",
        cos.alias("cosine"),
        (cos >= threshold).alias("is_dup"),
    )


def embedding_dropped_buckets(
    embeddings: DataFrame,
    dim: int,
    n_tables: int = LSH_TABLES,
    bits_per_table: int = LSH_BITS_PER_TABLE,
    max_bucket: int = EMB_MAX_BUCKET,
) -> DataFrame:
    """(bucket, bucket_n, pairs_dropped): capped embedding-LSH buckets."""
    e = _as_double(embeddings).select(
        "vec_id",
        F.explode(
            lsh_buckets_col(F.col("embedding"), dim, n_tables, bits_per_table)
        ).alias("bucket"),
    )
    sizes = e.groupBy("bucket").agg(F.count(F.lit(1)).alias("bucket_n"))
    return sizes.filter(F.col("bucket_n") > max_bucket).select(
        "bucket",
        "bucket_n",
        ((F.col("bucket_n") * (F.col("bucket_n") - 1)) / 2)
        .cast("bigint")
        .alias("pairs_dropped"),
    )


def lsh_topk(
    embeddings: DataFrame,
    dim: int,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_tables: int = LSH_TABLES,
    bits_per_table: int = LSH_BITS_PER_TABLE,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): top-k among multi-table LSH candidates.

    Approximate: recall < 1 vs ``cosine_topk`` by construction; the exploded
    bucket equi-join is what survives a 10^9-vector corpus (hash-partitioned
    on the bucket key, candidates deduped across tables, exact re-rank inside).
    """
    e = _as_double(embeddings).select(
        "vec_id",
        "embedding",
        F.explode(
            lsh_buckets_col(F.col("embedding"), dim, n_tables, bits_per_table)
        ).alias("bucket"),
    )
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket"),
    )
    cand = (
        e.join(F.broadcast(q.select("query_id", "bucket")), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "embedding")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    q_emb = q.select("query_id", "q_emb").dropDuplicates(["query_id"])
    scored = cand.join(F.broadcast(q_emb), "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine_col(F.col("q_emb"), F.col("embedding")), 6).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-partitioned scale path
# ---------------------------------------------------------------------------

IVF_CENTROIDS = 16
IVF_PROBES = 4


def ivf_centroids(
    embeddings: DataFrame, n_centroids: int = IVF_CENTROIDS
) -> list[tuple[int, list[float]]]:
    """Collect the coarse-quantizer centroids (the IVF *model*) driver-side.

    An IVF index is a two-phase structure: a small learned model (K
    centroids) plus a partitioned corpus. The model legitimately lives on
    the driver — Spark ML's KMeans holds its cluster centers exactly this
    way — and is embedded into the assignment plan as literal arrays, so
    the per-vector assignment is a zero-shuffle projection (same principle
    as the LSH hyperplane literals above: constants belong in the plan).

    Deterministic seed rule (sandbox): centroid ``c`` = the embedding of
    ``vec_id == c``, reproducible in any engine, so the DuckDB oracle
    derives the identical quantizer. Production would run k-means|| here
    and feed the learned centers through the same (list_id, vector) shape;
    nothing downstream changes. K rows collected — O(K·dim) bytes, not a
    scan (predicate pushdown prunes on vec_id).
    """
    rows = (
        _as_double(embeddings)
        .filter(F.col("vec_id") < n_centroids)
        .select("vec_id", "embedding")
        .collect()
    )
    return sorted((int(r["vec_id"]), [float(v) for v in r["embedding"]]) for r in rows)


def _nearest_lists_col(
    emb: Column, centroids: list[tuple[int, list[float]]], n_probe: int
) -> Column:
    """Array of the ``n_probe`` nearest centroid list_ids for a vector.

    Order: cosine desc, list_id asc (total order — rounded to 6 places
    first so the tie-break is engine-reproducible). Pure projection over
    literal centroid arrays: no join, no shuffle, whole-stage codegen.
    """
    scored = F.array(
        *[
            F.struct(
                F.round(cosine_col(emb, F.array(*[F.lit(v) for v in vec])), 6).alias("c"),
                F.lit(-lid).alias("nl"),
            )
            for lid, vec in centroids
        ]
    )
    # array_sort ascending by (c, nl); reversed -> c desc, nl desc = list_id asc
    top = F.slice(F.reverse(F.array_sort(scored)), 1, n_probe)
    return F.transform(top, lambda s: -s["nl"])


def ivf_assign(
    embeddings: DataFrame, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """Corpus with its inverted-list assignment: +(list_id) — each vector in
    exactly ONE list (a partition, unlike LSH's overlapping buckets).

    At 10^9 vectors this column is the table's physical partition/bucket key:
    write the corpus ``partitionBy("list_id")`` and probing prunes to
    ``n_probe/K`` of the data at scan time (partition pruning, no shuffle).
    """
    e = _as_double(embeddings)
    return e.withColumn(
        "list_id", _nearest_lists_col(F.col("embedding"), centroids, 1)[0]
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBES,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): IVF top-k — the second ANN
    scale path beside multi-table LSH (``lsh_topk``).

    Shape: assign every vector to its nearest of K centroids (inverted
    file); per query, probe only the ``n_probe`` nearest lists; exact
    cosine re-rank inside the probed lists. The probe side is
    (n_queries x n_probe) rows and broadcast; the corpus side streams with
    partition pruning on ``list_id``. Because lists partition the corpus,
    candidates need NO cross-table dedup (contrast: LSH's multi-table
    union does). Approximate by construction: a true neighbor assigned to
    an unprobed list is missed — recall vs ``cosine_topk`` is measured in
    tests, tunable via ``n_probe``.
    """
    cents = ivf_centroids(embeddings, n_centroids)
    e = ivf_assign(embeddings, cents).select("vec_id", "embedding", "list_id")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.explode(
            _nearest_lists_col(F.col("embedding"), cents, n_probe)
        ).alias("list_id"),
    )
    cand = (
        e.join(F.broadcast(q.select("query_id", "list_id")), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "embedding")
    )
    q_emb = q.select("query_id", "q_emb").dropDuplicates(["query_id"])
    scored = cand.join(F.broadcast(q_emb), "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine_col(F.col("q_emb"), F.col("embedding")), 6).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
