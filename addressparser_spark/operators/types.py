"""Type-dictionary split/join + qualifier reposition (B3, B5, B6).

Reference analogs:

- ``GetTypes`` (``Parser.cs:771-813``): match every word against the type
  dictionary -> here a **broadcast join** of position-exploded tokens
  against the ``TYPES_DIM`` dimension (the classic broadcast-dim shape the
  north star demands in place of per-row SQL lookups).
- ``SplitNameAndTypes`` / ``SplitNamesBy`` (``Parser.cs:620-711``): split a
  phrase into (typed part, name part) keeping the pure-name fallback ->
  per-conversation re-aggregation into the ordered name-only key plus the
  sorted type-id set.
- ``ReplaceReduct`` (``Parser.cs:816-826``): qualifier moved to head/tail
  of the phrase -> a canonical reposition key (leading qualifier tokens
  rotate to the tail) so both spellings collide on one block key.

Scale shape: explode is linear in tokens, the dim side is KBs (broadcast),
and the only shuffle is the one groupBy(conv_id) re-agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..data.types_dim import TYPES_DIM
from .text_analysis import QUALIFIER_WORDS


def types_dim_df(spark) -> DataFrame:
    return spark.createDataFrame(TYPES_DIM, "token string, type_id string, family string")


def type_split(profiles: DataFrame) -> DataFrame:
    """(conv_id, name_key, type_ids, n_typed, n_tokens): typed/name split.

    ``name_key`` = md5 over the order-preserved non-typed tokens (the
    pure-name fallback key); ``type_ids`` = sorted distinct dictionary ids
    the conversation's tokens matched.
    """
    spark = profiles.sparkSession
    dim = F.broadcast(types_dim_df(spark))
    ex = profiles.select(
        "conv_id", F.posexplode("tokens").alias("pos", "token")
    )
    j = ex.join(dim, "token", "left")
    agg = j.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.when(F.col("type_id").isNull(), F.struct("pos", "token")))
        ).alias("name_toks"),
        F.array_sort(F.collect_set("type_id")).alias("type_ids"),
        F.count("type_id").alias("n_typed"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    name_key = F.md5(
        F.array_join(F.transform("name_toks", lambda s: s["token"]), " ")
    )
    # type_ids serialized to one string: scalar columns survive any engine's
    # value-hash canonicalization (array cells round-trip as list vs ndarray)
    return agg.select(
        "conv_id",
        name_key.alias("name_key"),
        F.array_join("type_ids", ",").alias("type_ids"),
        "n_typed",
        "n_tokens",
    )


def requalified_key(profiles: DataFrame) -> DataFrame:
    """(conv_id, src='requal', block_key): qualifier-position-canonical key.

    Leading qualifier tokens are rotated to the tail before hashing, so
    'fast scan table' and 'scan table fast' land in the same block —
    the ``ReplaceReduct`` head/tail variant collapsed into one canonical
    position instead of generating both variants.
    """
    quals = F.array(*[F.lit(w) for w in QUALIFIER_WORDS])
    toks = F.col("tokens")
    # longest qualifier prefix length, found without a Python loop:
    # first position whose token is NOT a qualifier (0-based), else size
    non_q = F.filter(
        F.transform(toks, lambda t, i: F.struct(i.alias("i"), F.array_contains(quals, t).alias("q"))),
        lambda s: ~s["q"],
    )
    prefix_len = F.when(F.size(non_q) == 0, F.size(toks)).otherwise(
        F.element_at(non_q, 1)["i"]
    )
    rotated = F.concat(
        F.slice(toks, prefix_len + 1, F.size(toks)),
        F.slice(toks, 1, prefix_len),
    )
    return profiles.select(
        "conv_id",
        F.lit("requal").alias("src"),
        F.md5(F.array_join(rotated, " ")).alias("block_key"),
    )
