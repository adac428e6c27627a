"""Blocking: per-conversation signatures and candidate-generation keys.

Pipeline position: normalize -> **block** -> pairs -> score -> cluster.

Three complementary key families, unioned (the reference likewise probes
several key forms at once — formal/official x typed/untyped 4-way UNION,
``Db/DataContextBase_AddrObject.cs:59-77``):

1. ``sig``     — exact signature: md5 over (role '#' norm_text) per turn,
                 '|'-joined in stable ``turn_idx`` order. Catches duplicates
                 that normalization makes identical.
2. ``prefix``  — md5 over the first ``PREFIX_TURNS`` turns' norm text:
                 deterministic key for truncations/resumptions (analog of the
                 incomplete-address fallback, ``AddressSearcher.cs:103-125``).
3. ``mh<b>``   — MinHash LSH bands over distinct token 3-gram shingles:
                 probabilistic near-duplicate recall.

All expressions are Catalyst-native (md5/min/array ops on the JVM); the only
shuffle is one groupBy(conv_id) to build signatures, plus one per-band
explode. Hot blocking keys are handled downstream by the block-size cap +
AQE skew-join (see pairs.py).

Scale notes (100 TB): signatures are one map-side-combinable aggregation over
conv_id — convs are bounded (<=~10^3 turns), so collect_list per key is safe;
the explode for MinHash multiplies rows by NUM_HASHES only on the *distinct
shingle* level, and band keys are fixed-width md5 strings that hash-partition
uniformly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import normalize_col
from ..functions.tokens import distinct_shingles_col, tokens_col

NUM_HASHES = 16
ROWS_PER_BAND = 2
PREFIX_TURNS = 2
SHINGLE_K = 3


def normalize_turns(transcripts: DataFrame) -> DataFrame:
    """Add ``norm_text`` (narrow, no shuffle)."""
    return transcripts.withColumn("norm_text", normalize_col(F.col("text")))


def conv_profiles(turns_norm: DataFrame) -> DataFrame:
    """One row per conversation: ordered-turn signature + token/shingle sets.

    Stable turn ordering is the per-row invariant axis: ``array_sort`` over
    ``struct(turn_idx, ...)`` gives a total order independent of partitioning.
    """
    turns = F.array_sort(
        F.collect_list(
            F.struct("turn_idx", "role", F.coalesce("tool", F.lit("")).alias("tool"), "norm_text")
        )
    )
    prof = turns_norm.groupBy("conv_id").agg(
        turns.alias("turns"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    norm_texts = F.transform(F.col("turns"), lambda t: t["norm_text"])
    # composite signature: role + tool + normalized text per turn (the
    # north-star composite key: role x tool x content)
    sig_parts = F.transform(
        F.col("turns"),
        lambda t: F.concat(t["role"], F.lit("#"), t["tool"], F.lit("#"), t["norm_text"]),
    )
    prefix_parts = F.slice(norm_texts, 1, PREFIX_TURNS)
    # IMPORTANT evaluation-cost note: a lambda inside transform/filter that
    # references an *outer expression* re-evaluates that expression per array
    # element (Catalyst does not hoist it). Every intermediate below is
    # therefore materialized as a column attribute before a lambda uses it —
    # otherwise shingling becomes O(n_tokens^2) per conversation.
    prof = prof.select(
        "conv_id",
        "n_turns",
        F.md5(F.array_join(sig_parts, "|")).alias("sig"),
        F.md5(F.array_join(prefix_parts, "|")).alias("prefix_key"),
        F.array_join(norm_texts, " ").alias("concat_text"),
        F.transform(F.col("turns"), lambda t: t["role"]).alias("role_seq"),
    )
    prof = prof.withColumn("tokens", tokens_col(F.col("concat_text")))
    # 64-bit hashed shingles: the scoring join carries these instead of the
    # string set — ~8x smaller shuffle payload, integer intersects, and
    # set-overlap measures (Jaccard/containment) are hash-invariant. Sorted
    # ascending so the scorer's merge-walk intersect kernel (O(n+m), no
    # per-row hash set — java/IntersectCount.java) can consume them directly.
    # The STRING shingle set is deliberately NOT kept in the profile: it
    # nearly doubles the cached/shuffled row (it's the text re-materialized)
    # and only minhash_signature needs it — that one consumer re-derives it
    # from ``tokens`` (a cheap zip_with) instead.
    prof = prof.withColumn("shingles", distinct_shingles_col(F.col("tokens"), SHINGLE_K))
    prof = prof.withColumn(
        "sh_hash", F.array_sort(F.transform(F.col("shingles"), lambda s: F.xxhash64(s)))
    )
    return prof.select(
        "conv_id", "n_turns", "sig", "prefix_key", "concat_text",
        "tokens", "sh_hash", "role_seq",
    )


def minhash_signature(
    profiles: DataFrame, num_hashes: int = NUM_HASHES
) -> DataFrame:
    """(conv_id, mh_00..mh_NN): per-hash-family lexicographic-min of
    md5('<i>|' || shingle). md5-hex min is an order-preserving stand-in for
    integer MinHash and is reproducible in any engine (the DuckDB oracle
    computes the identical value).
    """
    # shingle strings re-derived from tokens (kept out of the cached profile
    # row on purpose — see conv_profiles)
    ex = profiles.select(
        "conv_id",
        F.explode(distinct_shingles_col(F.col("tokens"), SHINGLE_K)).alias("sh"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i:02d}|"), F.col("sh")))).alias(f"mh_{i:02d}")
        for i in range(num_hashes)
    ]
    return ex.groupBy("conv_id").agg(*aggs)


def band_keys(
    minhash: DataFrame,
    num_hashes: int = NUM_HASHES,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """Long-format LSH band keys: (conv_id, block_key) with key source 'mh<b>'.

    Band key = md5('<b>|' || minhashes of the band) — collision iff the band's
    minhashes all agree.
    """
    n_bands = num_hashes // rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(f"mh{b}").alias("src"),
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(str(b)),
                        *[F.col(f"mh_{i:02d}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)],
                    )
                ).alias("block_key"),
            )
            for b in range(n_bands)
        ]
    )
    return minhash.select("conv_id", F.explode(bands).alias("b")).select(
        "conv_id", F.col("b.src").alias("src"), F.col("b.block_key").alias("block_key")
    )


def canonical_tokens_col(tokens, synonyms: dict[str, str] | None = None):
    """Fold each token to its canonical form via the synonym dictionary.

    The dictionary is applied as a Catalyst ``map`` literal (no shuffle, no
    Python): synonym tables are dimension-sized, the classic broadcast-dim
    shape. Mirrors ``PushCrutch`` (``Parser.cs:367-520``) — variant terms
    collapse to one spelling before key generation.
    """
    from ..data.synonyms import DEFAULT_SYNONYMS

    syn = DEFAULT_SYNONYMS if synonyms is None else synonyms
    m = F.create_map(*[F.lit(x) for kv in sorted(syn.items()) for x in kv])
    return F.transform(tokens, lambda t: F.coalesce(m[t], t))


def synonym_blocks(
    profiles: DataFrame, synonyms: dict[str, str] | None = None
) -> DataFrame:
    """(conv_id, src='syn', block_key): synonym-canonical signature keys.

    Two conversations whose texts differ only by dictionary variants get the
    SAME key (metamorphic property tested in tests/test_synonyms.py) — the
    recall mechanism the sig/prefix/minhash families can't provide when a
    variant changes many shingles at once.
    """
    canon = canonical_tokens_col(F.col("tokens"), synonyms)
    return profiles.select(
        "conv_id",
        F.lit("syn").alias("src"),
        F.md5(F.array_join(canon, " ")).alias("block_key"),
    )


def block_table(
    profiles: DataFrame,
    num_hashes: int = NUM_HASHES,
    rows_per_band: int = ROWS_PER_BAND,
    synonyms: dict[str, str] | None = None,
) -> DataFrame:
    """Union of all blocking keys: (conv_id, src, block_key).

    ``synonyms``: pass a variant->canonical dict to add the 'syn' key family
    (opt-in so the default pipeline's oracle stays byte-stable).
    """
    sig_keys = profiles.select(
        "conv_id", F.lit("sig").alias("src"), F.col("sig").alias("block_key")
    )
    prefix_keys = profiles.select(
        "conv_id", F.lit("prefix").alias("src"), F.col("prefix_key").alias("block_key")
    )
    mh = band_keys(minhash_signature(profiles, num_hashes), num_hashes, rows_per_band)
    out = sig_keys.unionByName(prefix_keys).unionByName(mh)
    if synonyms is not None:
        out = out.unionByName(synonym_blocks(profiles, synonyms))
    return out
