"""Explicit skew handling: salted aggregation and hot-key salted joins.

AQE's skew-join splitting (enabled in session.py) handles moderate skew at
runtime; these operators are the *explicit* layer for pathological keys the
north rule calls out (e.g. one (role, tool) combination covering 30%+ of all
rows — the blocking analog of a mega-city in the reference's data).

Both transformations are semantics-preserving and deterministic: the salt is
derived by hashing a distinguishing column (never ``rand()``), so reruns
produce identical plans and results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_SALTS = 16
HOT_KEY_THRESHOLD = 100_000


def with_salt(df: DataFrame, distinct_col: str, n_salts: int = N_SALTS) -> DataFrame:
    """Deterministic salt in [0, n_salts) from a high-cardinality column."""
    return df.withColumn("__salt", F.pmod(F.xxhash64(distinct_col), F.lit(n_salts)))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    aggs: dict[str, Column],
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    Stage 1 groups by (keys + salt) — the hot key's rows spread over n_salts
    reducers; stage 2 combines the partials. Supports decomposable aggregates
    expressed as (partial expression, combine function) pairs; the built-ins
    here cover count and sum, the shapes the pipeline needs (block-size
    stats, per-key pair counts).

    ``aggs``: mapping output-name -> partial aggregate Column (e.g.
    ``{"n": F.count(F.lit(1)), "total": F.sum("x")}``); partials are combined
    with SUM, which is correct for count/sum-like partials.
    """
    salted = with_salt(df, distinct_col, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(f"__p_{name}") for name, c in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in aggs]
    )


def hot_keys(df: DataFrame, key: str, threshold: int = HOT_KEY_THRESHOLD) -> DataFrame:
    """Keys whose row count exceeds the threshold (one pass, map-side combine)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
        .select(key)
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    distinct_col: str,
    n_salts: int = N_SALTS,
    threshold: int = HOT_KEY_THRESHOLD,
    hot: DataFrame | None = None,
) -> DataFrame:
    """Equi-join with hot keys salted, cold keys joined normally.

    Hot fact rows get a deterministic salt; the dim rows for hot keys are
    replicated n_salts times so every (key, salt) partition finds its match.
    Cold rows take the plain join. Output = union, column set = facts ∪ dim.

    ``hot``: optional precomputed one-column DataFrame of hot keys. A caller
    that already aggregated the key distribution (e.g. the candidate-pair
    probe) passes it down so the plan carries ONE aggregation whose shuffle
    exchange is reused, instead of a second identical groupBy.
    """
    if hot is None:
        hot = hot_keys(facts, key, threshold)
    hot = hot.select(key).withColumn("__hot", F.lit(1))
    facts_tagged = facts.join(F.broadcast(hot), key, "left")
    hot_facts = facts_tagged.filter(F.col("__hot").isNotNull()).drop("__hot")
    cold_facts = facts_tagged.filter(F.col("__hot").isNull()).drop("__hot")

    cold_out = cold_facts.join(dim, key)

    dim_hot = dim.join(F.broadcast(hot.select(key)), key, "left_semi")
    dim_replicated = dim_hot.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    hot_out = (
        with_salt(hot_facts, distinct_col, n_salts)
        .join(dim_replicated, [key, "__salt"])
        .drop("__salt")
    )
    return cold_out.unionByName(hot_out)
