"""Seeded synthetic transcripts at arbitrary scale — pure Spark expressions.

For benchmarks and scale tests we need a transcripts table far larger than
the sandbox parquet provides. Everything here is generated from
``spark.range`` + deterministic hash arithmetic (``xxhash64`` of
(seed, conv, turn, position)), so:

- same parameters => identical rows, regardless of partitioning/parallelism;
- generation is embarrassingly parallel (no driver-side data, no Python);
- it scales linearly to any ``n_convs`` a cluster can hold.

Duplicate-variant injection mirrors ``data/transcripts.py`` (v1 case noise /
v2 punctuation noise / v3 truncation, plus the ``_d1`` adversarial hard
negative — co-blocked by construction, must NOT match) so ground truth is
again ``cluster = base conv_id`` with ``_d1`` its own entity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_VOCAB = [
    # english-ish tokens
    "query", "table", "join", "filter", "agg", "window", "batch", "stream",
    "spark", "shuffle", "partition", "broadcast", "hash", "sort", "merge",
    "scan", "row", "column", "value", "key", "index", "cache", "spill",
    "skew", "salt", "block", "pair", "score", "cluster", "entity", "match",
    "run", "fail", "retry", "commit", "checkpoint", "resume", "metric",
    "plan", "stage", "task", "executor", "driver", "memory", "disk",
    # cyrillic tokens (exercise the normalizer's unicode path)
    "город", "улица", "дом", "переулок", "область", "район", "корпус",
    "строение", "квартира", "посёлок", "набережная", "проспект",
]
_PUNCT = ["", "", "", ",", ".", "!", "?", ";", ":", ""]

_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _h(*cols: Column | int | str) -> Column:
    return F.xxhash64(*[c if isinstance(c, Column) else F.lit(c) for c in cols])


def _pm(c: Column, m: int) -> Column:
    return F.pmod(c, F.lit(m))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 10_000,
    seed: int = 42,
    dup_fraction_mod: int = 2,
) -> DataFrame:
    """Deterministic transcripts table with injected duplicate variants.

    ~(4..9) turns per conv, ~(8..32) tokens per turn; one variant conversation
    for every conv with ``conv_num % dup_fraction_mod == 0``.
    """
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    punct = F.array(*[F.lit(p) for p in _PUNCT])

    conv = spark.range(n_convs).select(F.col("id").alias("conv_num"))
    conv = conv.withColumn("n_turns", (_pm(_h(seed, "nt", F.col("conv_num")), 6) + 4).cast("int"))
    turns = conv.select(
        "conv_num",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    cn, ti = F.col("conv_num"), F.col("turn_idx")
    n_tok = _pm(_h(seed, "len", cn, ti), 25) + 8
    words = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda i: F.concat(
            F.element_at(vocab, (_pm(_h(seed, "w", cn, ti, i), len(_VOCAB)) + 1).cast("int")),
            F.element_at(punct, (_pm(_h(seed, "p", cn, ti, i), len(_PUNCT)) + 1).cast("int")),
        ),
    )
    base = turns.select(
        "conv_num",
        F.concat(F.lit("conv_"), F.lpad(cn.cast("string"), 8, "0")).alias("conv_id"),
        ti.cast("int").alias("turn_idx"),
        F.when(ti % 2 == 0, "user")
        .when(_pm(_h(seed, "r", cn, ti), 4) == 0, "tool")
        .otherwise("assistant")
        .alias("role"),
        F.array_join(words, " ").alias("text"),
        F.when(_pm(_h(seed, "t", cn, ti), 4) == 0, F.lit("bash")).alias("tool"),
        F.timestamp_seconds(F.lit(_EPOCH) + cn * 3600 + ti * 60).alias("ts"),
    )

    dup = F.col("conv_num") % dup_fraction_mod == 0
    kind = F.col("conv_num") % (3 * dup_fraction_mod)
    v1 = (
        base.filter(dup & (kind == 0))
        .withColumn("conv_id", F.concat("conv_id", F.lit("_v1")))
        .withColumn("text", F.upper(F.col("text")))
    )
    v2 = (
        base.filter(dup & (kind == 2 % (3 * dup_fraction_mod)))
        .withColumn("conv_id", F.concat("conv_id", F.lit("_v2")))
        .withColumn("text", F.concat(F.regexp_replace("text", " ", "  "), F.lit(" ???")))
    )
    v3 = (
        base.filter(dup & (kind == 4 % (3 * dup_fraction_mod)) & (F.col("turn_idx") < 3))
        .withColumn("conv_id", F.concat("conv_id", F.lit("_v3")))
    )
    # adversarial hard negative, mirroring data/transcripts.py::_distractor_text:
    # first 2 turns identical (= blocking.PREFIX_TURNS -> guaranteed prefix-key
    # candidate pair), later turns two vocab-disjoint junk streams -> must NOT
    # match (ground truth keeps _d1 as its own entity). Worst case here: >= 2
    # junk turns of >= 8 tokens x2 streams vs <= 2x32-token prefix ->
    # containment <= ~0.68 < the 0.9 thresholds. (Cyrillic vocab words pass
    # translate() unchanged, but a surviving shingle needs 3 consecutive
    # Cyrillic tokens in unchanged order — ~1% of shingles, noise.)
    d1 = (
        base.filter(F.col("conv_num") % 6 == 1)
        .withColumn("conv_id", F.concat("conv_id", F.lit("_d1")))
        .withColumn(
            "text",
            F.when(F.col("turn_idx") < 2, F.col("text")).otherwise(
                F.concat(
                    F.reverse(F.col("text")), F.lit(" "),
                    F.translate(F.col("text"), "aeiou", "01234"),
                )
            ),
        )
    )
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    out = base.select(cols)
    for v in (v1, v2, v3, d1):
        out = out.unionByName(v.select(cols))
    return out


def synth_truth(transcripts: DataFrame) -> DataFrame:
    return (
        transcripts.select("conv_id")
        .distinct()
        .select("conv_id", F.regexp_replace("conv_id", "_v[123]$", "").alias("cluster_id"))
    )
