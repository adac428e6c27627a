"""Document-level deduplication family (training-data pipeline ops).

The same normalize->key->pair->score machinery as conversation linkage,
instantiated on a flat ``documents(doc_id, text, ...)`` table — the four
standard large-corpus dedup strategies:

- exact:        md5 of normalized text, group, min-id representative
- MinHash+LSH:  token-shingle MinHash, banded keys, in-bucket pairs, Jaccard
- SimHash:      per-position majority sketch over token md5s, banded buckets,
                Hamming distance
- n-gram Jaccard: character n-gram sets on LSH candidates

Everything is Catalyst expressions (md5 / array ops / windows); each operator
has an exact DuckDB oracle in ``oracle_docs.py``. At 100 TB the shapes hold:
one groupBy per sketch, one exploded band join for candidates, block-size cap
before the quadratic step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.normalize import normalize_col
from ..functions.tokens import distinct_shingles_col, tokens_col

DOC_NUM_HASHES = 12
DOC_ROWS_PER_BAND = 2
DOC_SHINGLE_K = 3
DOC_JACCARD_DUP = 0.8
SIMHASH_BITS = 32  # one bit per md5 hex position: nibble high-bit
SIMHASH_BAND_CHARS = 8
HAMMING_DUP = 3
CHAR_NGRAM = 5
MAX_BUCKET = 50


def normalized_docs(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", normalize_col(F.col("text")).alias("norm_text")
    )


def doc_shingle_sets(docs: DataFrame, k: int = DOC_SHINGLE_K) -> DataFrame:
    # tokens materialized as a column before the shingle lambda references it
    # (outer expressions inside higher-order lambdas re-evaluate per element)
    n = normalized_docs(docs).withColumn("toks", tokens_col(F.col("norm_text")))
    return n.select(
        "doc_id",
        "norm_text",
        distinct_shingles_col(F.col("toks"), k).alias("sh"),
    )


# ---------------------------------------------------------------------------
# 1. exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, content_key, dup_group, group_n): hash-groupBy dedup.

    ``dup_group`` = min doc_id sharing the normalized-content hash — one
    shuffle on a uniform md5 key; at any scale this is the cheapest pass and
    runs first (mirrors the reference's exact-match "light mode" before the
    expensive search, ``Db/DataContextBase_AddrObject.cs:52-95``).
    """
    n = normalized_docs(docs).withColumn("content_key", F.md5("norm_text"))
    w = Window.partitionBy("content_key")
    return n.select(
        "doc_id",
        "content_key",
        F.min("doc_id").over(w).alias("dup_group"),
        F.count(F.lit(1)).over(w).alias("group_n"),
    )


# ---------------------------------------------------------------------------
# 2. MinHash + LSH
# ---------------------------------------------------------------------------


def doc_minhash(docs: DataFrame, num_hashes: int = DOC_NUM_HASHES) -> DataFrame:
    ex = doc_shingle_sets(docs).select("doc_id", F.explode("sh").alias("s"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i:02d}|"), F.col("s")))).alias(f"mh_{i:02d}")
        for i in range(num_hashes)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def doc_band_keys(
    minhash: DataFrame,
    num_hashes: int = DOC_NUM_HASHES,
    rows_per_band: int = DOC_ROWS_PER_BAND,
) -> DataFrame:
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(str(b)),
                        *[
                            F.col(f"mh_{i:02d}")
                            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(num_hashes // rows_per_band)
        ]
    )
    return minhash.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket")
    )


def bucket_drop_stats(buckets: DataFrame, max_bucket: int = MAX_BUCKET) -> DataFrame:
    """(bucket, bucket_n, pairs_dropped): oversized buckets the cap skipped.

    The 'cap + never silent' guardrail for the doc-dedup family — same
    contract as ``pairs.capped_blocks`` surfaces for conversation blocking
    (``er_dropped_blocks``): recall loss from hot buckets is a *metric*, not
    an invisible behavior. Exposed as the ``dedup_dropped_buckets`` query.
    """
    sizes = buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("bucket_n"))
    return sizes.filter(F.col("bucket_n") > max_bucket).select(
        "bucket",
        "bucket_n",
        ((F.col("bucket_n") * (F.col("bucket_n") - 1)) / 2)
        .cast("bigint")
        .alias("pairs_dropped"),
    )


def _bucket_pairs(buckets: DataFrame, max_bucket: int = MAX_BUCKET) -> DataFrame:
    """In-bucket pairs with the block-size guardrail (cap + never silent:
    the dropped side is observable via :func:`bucket_drop_stats`)."""
    from pyspark.storagelevel import StorageLevel

    # buckets fan out into 3 consumers (sizes + both self-join sides):
    # persist instead of recomputing the sketch pipeline three times
    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    kept = buckets.join(sizes.filter(F.col("n") <= max_bucket), "bucket", "left_semi")
    a = kept.select("bucket", F.col("doc_id").alias("doc_id_a"))
    b = kept.select("bucket", F.col("doc_id").alias("doc_id_b"))
    return (
        a.join(b, "bucket")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = DOC_NUM_HASHES,
    rows_per_band: int = DOC_ROWS_PER_BAND,
    threshold: float = DOC_JACCARD_DUP,
) -> DataFrame:
    """(doc_id_a, doc_id_b, jaccard, is_dup): LSH candidates + exact Jaccard."""
    sets = doc_shingle_sets(docs).select(
        "doc_id", F.transform("sh", lambda s: F.xxhash64(s)).alias("shh")
    )
    cand = _bucket_pairs(doc_band_keys(doc_minhash(docs, num_hashes), num_hashes, rows_per_band))
    j = (
        cand.join(sets.select(F.col("doc_id").alias("doc_id_a"), F.col("shh").alias("sh_a")), "doc_id_a")
        .join(sets.select(F.col("doc_id").alias("doc_id_b"), F.col("shh").alias("sh_b")), "doc_id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.round(F.when(union == 0, F.lit(1.0)).otherwise(inter / union), 6)
    return j.select(
        "doc_id_a",
        "doc_id_b",
        jac.alias("jaccard"),
        (jac >= threshold).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# 3. SimHash
# ---------------------------------------------------------------------------


def doc_simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-char bit-string sketch.

    Bit i = majority over tokens of (high bit of md5 hex nibble i) — i.e. a
    random-hyperplane sketch whose projections come from the token md5. Uses
    only substring/compare, so the DuckDB oracle reproduces it exactly.
    """
    toks = normalized_docs(docs).select(
        "doc_id", F.explode(tokens_col(F.col("norm_text"))).alias("tok")
    ).withColumn("h", F.md5("tok"))
    aggs = [
        F.sum(
            F.when(F.substring("h", i + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"b{i:02d}")
        for i in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*aggs)
    bits = F.concat(
        *[F.when(F.col(f"b{i:02d}") > 0, "1").otherwise("0") for i in range(SIMHASH_BITS)]
    )
    return agg.select("doc_id", bits.alias("simhash"))


def simhash_buckets(simhash: DataFrame) -> DataFrame:
    """(doc_id, bucket): the 4 banded simhash bucket keys per doc."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(F.lit(f"{b}|"), F.substring("simhash", b * SIMHASH_BAND_CHARS + 1, SIMHASH_BAND_CHARS)).alias("bucket"),
            )
            for b in range(SIMHASH_BITS // SIMHASH_BAND_CHARS)
        ]
    )
    return simhash.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.bucket").alias("bucket")
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = HAMMING_DUP) -> DataFrame:
    """(doc_id_a, doc_id_b, hamming, is_dup): banded simhash buckets -> pairs.

    Bucket key = one of the 4 8-char simhash bands; two sketches within
    Hamming distance <= 3 share at least one intact band (pigeonhole).
    """
    sh = doc_simhash(docs)
    cand = _bucket_pairs(simhash_buckets(sh))
    j = (
        cand.join(sh.select(F.col("doc_id").alias("doc_id_a"), F.col("simhash").alias("s_a")), "doc_id_a")
        .join(sh.select(F.col("doc_id").alias("doc_id_b"), F.col("simhash").alias("s_b")), "doc_id_b")
    )
    # Hamming over the 0/1 strings: count positions where chars differ
    ham = F.size(
        F.filter(
            F.zip_with(F.split("s_a", ""), F.split("s_b", ""), lambda x, y: x != y),
            lambda d: d,
        )
    )
    return j.select(
        "doc_id_a",
        "doc_id_b",
        ham.alias("hamming"),
        (ham <= max_hamming).alias("is_dup"),
    )


def dropped_buckets(docs: DataFrame, max_bucket: int = MAX_BUCKET) -> DataFrame:
    """(family, bucket, bucket_n, pairs_dropped) across both sketch families."""
    mh = bucket_drop_stats(doc_band_keys(doc_minhash(docs)), max_bucket).select(
        F.lit("minhash_lsh").alias("family"), "bucket", "bucket_n", "pairs_dropped"
    )
    sh = bucket_drop_stats(simhash_buckets(doc_simhash(docs)), max_bucket).select(
        F.lit("simhash").alias("family"), "bucket", "bucket_n", "pairs_dropped"
    )
    return mh.unionByName(sh)


# ---------------------------------------------------------------------------
# 4. character n-gram Jaccard on LSH candidates
# ---------------------------------------------------------------------------


def char_ngrams_col(text, n: int = CHAR_NGRAM):
    ln = F.length(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(ln - n + 1, F.lit(1))),
        lambda i: text.substr(i, F.lit(n)),
    )
    return F.array_distinct(grams)


def ngram_jaccard_pairs(docs: DataFrame, n: int = CHAR_NGRAM) -> DataFrame:
    """(doc_id_a, doc_id_b, ngram_jaccard): char-n-gram sets on LSH candidates."""
    nd = (
        normalized_docs(docs)
        .withColumn("g0", char_ngrams_col(F.col("norm_text"), n))
        .select("doc_id", F.transform(F.col("g0"), lambda g: F.xxhash64(g)).alias("g"))
    )
    cand = _bucket_pairs(doc_band_keys(doc_minhash(docs)))
    j = (
        cand.join(nd.select(F.col("doc_id").alias("doc_id_a"), F.col("g").alias("g_a")), "doc_id_a")
        .join(nd.select(F.col("doc_id").alias("doc_id_b"), F.col("g").alias("g_b")), "doc_id_b")
    )
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size("g_a") + F.size("g_b") - inter
    jac = F.round(F.when(union == 0, F.lit(1.0)).otherwise(inter / union), 6)
    return j.select("doc_id_a", "doc_id_b", jac.alias("ngram_jaccard"))
