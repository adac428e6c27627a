"""Heavy-mode substring/contains join (the J2 escalation path).

Analog of the reference's heavy search mode: when the exact/light key joins
miss, it falls back to a full-text token join with a ``LIKE '%query%'``
verification (``AddressParser/Core/Db/DataContextBase_AddrObject.cs:115-141``
— ``CONTAINS(Name, @token)`` candidate fetch, then ``Name LIKE '%'+@q+'%'``
post-filter). The LSH band join covers *set-overlap* near-dups; this operator
covers *substring containment* — pairs whose texts embed one another even
when shingle bands disagree (heavy interleaving, long insertions).

Spark-first shape (no full-text index service at 100 TB, so build the
inverted index as data):

1. explode distinct token 3-gram shingles per conversation ->
   ``(key, conv_id)`` — the index unit is the shingle, not the bare token:
   selective index entries are what make an inverted index useful, and
   word-level entries stop being selective on a small vocabulary (exactly
   like the reference only benefits from CONTAINS on discriminative name
   words)
2. document-frequency cap: only keys with ``df <= rare_df_cap`` join
   (a hot key's bucket would be quadratic; the cap mirrors the block-size
   guardrail and the skipped-key volume is observable via :func:`hot_keys`)
3. self equi-join on the key = the inverted-index probe (hash-partitions
   uniformly on the key string)
4. ``contains`` post-filter: keep pairs where one side's anchor phrase
   (first ``anchor_tokens`` tokens) appears verbatim inside the other
   side's full concatenated text — the LIKE-'%...%' verification.

Every step is Catalyst (explode / groupBy / join / contains); the quadratic
blow-up is bounded by ``df_cap**2`` pairs per key before dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokens import distinct_shingles_col, stem_tokens_col

RARE_DF_CAP = 10
ANCHOR_TOKENS = 8
INDEX_SHINGLE_K = 3


def token_index(profiles: DataFrame, stem: bool = True) -> DataFrame:
    """(conv_id, key): distinct-shingle inverted index.

    Tokens are suffix-stemmed before shingling (``stem_tokens_col``), so
    inflectional variants collide in the same index bucket — the stemming
    arm of the reference's full-text ``CONTAINS`` candidate fetch
    (``Db/DataContextBase_AddrObject.cs:115-141``). The verbatim
    ``contains`` post-filter downstream is unchanged: stemming widens the
    candidate fetch, verification stays exact (same fetch-wide/verify-exact
    split as the reference's CONTAINS -> LIKE).
    """
    toks = stem_tokens_col(F.col("tokens")) if stem else F.col("tokens")
    return profiles.select(
        "conv_id",
        F.explode(distinct_shingles_col(toks, INDEX_SHINGLE_K)).alias("key"),
    )


def hot_keys(profiles: DataFrame, df_cap: int = RARE_DF_CAP) -> DataFrame:
    """(key, df): index entries skipped by the df cap — never silent."""
    idx = token_index(profiles)
    return (
        idx.groupBy("key")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cap)
    )


def substring_pairs(
    profiles: DataFrame,
    df_cap: int = RARE_DF_CAP,
    anchor_tokens: int = ANCHOR_TOKENS,
) -> DataFrame:
    """(conv_a, conv_b, a_contains_b, b_contains_a): verified containment pairs.

    ``a_contains_b`` = conv_b's anchor phrase occurs inside conv_a's full
    text (and vice versa); only pairs where at least one direction holds
    survive — exactly the reference's token-candidates-then-LIKE shape.
    """
    from pyspark.storagelevel import StorageLevel

    idx = token_index(profiles).persist(StorageLevel.MEMORY_AND_DISK)
    df_counts = idx.groupBy("key").agg(F.count(F.lit(1)).alias("df"))
    rare = idx.join(
        df_counts.filter(F.col("df") <= df_cap), "key", "left_semi"
    )
    a = rare.select("key", F.col("conv_id").alias("conv_a"))
    b = rare.select("key", F.col("conv_id").alias("conv_b"))
    cand = (
        a.join(b, "key")
        .filter(F.col("conv_a") < F.col("conv_b"))
        .select("conv_a", "conv_b")
        .dropDuplicates(["conv_a", "conv_b"])
    )
    payload = profiles.select(
        "conv_id",
        F.col("concat_text").alias("full_text"),
        F.array_join(F.slice("tokens", 1, anchor_tokens), " ").alias("anchor"),
    )
    j = (
        cand.join(
            payload.select(
                F.col("conv_id").alias("conv_a"),
                F.col("full_text").alias("text_a"),
                F.col("anchor").alias("anchor_a"),
            ),
            "conv_a",
        )
        .join(
            payload.select(
                F.col("conv_id").alias("conv_b"),
                F.col("full_text").alias("text_b"),
                F.col("anchor").alias("anchor_b"),
            ),
            "conv_b",
        )
    )
    j = j.select(
        "conv_a",
        "conv_b",
        F.contains("text_a", F.col("anchor_b")).alias("a_contains_b"),
        F.contains("text_b", F.col("anchor_a")).alias("b_contains_a"),
    )
    return j.filter(F.col("a_contains_b") | F.col("b_contains_a"))
