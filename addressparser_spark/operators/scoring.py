"""Pairwise scoring: the deterministic verdict cascade.

Analog of the reference's categorical comparator
``CompareAddresses -> {Exact, WithoutRoom, WithoutHouse, Partial, Far}``
(``AddressParser/Core/AddressComparer.cs:81-104,148-204``): an ordered ladder
of cheap-to-expensive checks, each fully deterministic so clusters are
identical run-to-run regardless of partitioning.

Verdicts (first match wins):

- ``exact``       signatures equal (normalization made the convs identical)
- ``near_dup``    shingle-set Jaccard >= 0.9
- ``resumption``  shingle containment >= 0.9 (one side truncates the other)
- ``partial``     Jaccard >= 0.5
- ``far``         otherwise

``jaccard``/``containment`` derive from one set-intersection count per pair;
``lev_sim`` is normalized capped-prefix Levenshtein; ``jw`` is Jaro-Winkler.
All three run as compiled JVM kernels when the shipped jar is loaded
(``java/``: merge-walk intersect over sorted hashes, two-row-DP Levenshtein,
Jaro-Winkler — value-identical to the Catalyst/pandas fallbacks, no Python
workers, no per-row hash-set allocation; that allocation churn was the
measured cause of sub-linear core scaling). The cascade itself depends only
on sig/jaccard/containment, so the verdict is reproducible in the ANSI-SQL
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.similarity import jaro_winkler_col, levenshtein_sim_col
from ..session import INTERSECT_FUNC, LEVSIM_FUNC, TEXTSIM_FUNC, register_jw

JACCARD_NEAR = 0.9
CONTAIN_NEAR = 0.9
JACCARD_PARTIAL = 0.5

MATCH_VERDICTS = ("exact", "near_dup", "resumption")


TEXT_CAP = 96  # chars of concat_text carried into the pair join (lev/jw cap)


def _slim_profiles(profiles: DataFrame) -> DataFrame:
    # project the join payload down to what scoring needs: hashed shingles +
    # capped text — the pair join shuffles millions of rows, payload width is
    # the dominant cost at scale. Neutral column names so BOTH pair-side
    # lookups share one canonical plan (broadcast path: ReuseExchange builds
    # the hash relation once for the a- and b-side joins).
    return profiles.select(
        "conv_id",
        "sig",
        F.col("sh_hash").alias("sh"),
        F.substring("concat_text", 1, TEXT_CAP).alias("text"),
        "n_turns",
    )


def score_pairs(
    pairs: DataFrame,
    profiles: DataFrame,
    with_jw: bool = True,
    broadcast_profiles: bool = False,
) -> DataFrame:
    """(conv_a, conv_b, jaccard, containment, lev_sim[, jw], verdict).

    Join strategy is pinned explicitly: Catalyst misestimates the exploded
    pair side (Generate keeps the pre-explode row count), which can flip the
    plan into broadcasting *millions of pairs* and streaming the profiles —
    a parallelism collapse. Default is a shuffle-hash join on conv id (both
    sides exchange-partitioned, scales with executors); set
    ``broadcast_profiles=True`` when the profile batch is dimension-sized
    (incremental runs, benchmarks) to skip shuffling pair rows entirely.
    """
    slim = _slim_profiles(profiles)
    slim = F.broadcast(slim) if broadcast_profiles else slim.hint("shuffle_hash")
    a, b = slim.alias("A"), slim.alias("B")
    j = (
        pairs.join(a, F.col("conv_a") == F.col("A.conv_id"))
        .join(b, F.col("conv_b") == F.col("B.conv_id"))
        .select(
            "conv_a",
            "conv_b",
            F.col("A.sig").alias("sig_a"),
            F.col("B.sig").alias("sig_b"),
            F.col("A.sh").alias("sh_a"),
            F.col("B.sh").alias("sh_b"),
            F.col("A.text").alias("text_a"),
            F.col("B.text").alias("text_b"),
        )
    )
    # one set-intersection count per pair; Jaccard and containment both derive
    # from it arithmetically (|A∪B| = |A|+|B|-|A∩B| since the sets are
    # distinct) — no array_union materialization. JVM merge-walk kernel over
    # the sorted sh_hash arrays when available; array_intersect fallback is
    # value-identical (sortedness doesn't change set overlap).
    spark = SparkSession.getActiveSession()
    use_jvm = spark is not None and register_jw(spark)
    inter = (
        F.call_function(INTERSECT_FUNC, F.col("sh_a"), F.col("sh_b"))
        if use_jvm
        else F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    )
    j = j.withColumn("inter", inter)
    na, nb = F.size("sh_a"), F.size("sh_b")
    union = na + nb - F.col("inter")
    j = j.withColumn(
        "jaccard",
        F.round(F.when(union == 0, F.lit(1.0)).otherwise(F.col("inter") / union), 6),
    )
    j = j.withColumn(
        "containment",
        F.round(
            F.when(F.least(na, nb) == 0, F.lit(1.0)).otherwise(
                F.col("inter") / F.least(na, nb)
            ),
            6,
        ),
    )
    if use_jvm and with_jw:
        # fused kernel: one string decode yields [lev_sim, jw] — halves the
        # per-pair allocation rate, which is what GC-bound core scaling sees
        j = j.withColumn(
            "ts", F.call_function(TEXTSIM_FUNC, F.col("text_a"), F.col("text_b"))
        )
        # null alignment with the unfused paths: TextSim returns NULL for a
        # null input (it cannot carry per-element nulls in double[]), while
        # the standalone JaroWinkler kernel and the pandas fallback define
        # jw(null) = 0.0 and LevSim defines lev_sim(null) = null — so jw is
        # coalesced here and lev_sim is left null-propagating.
        j = j.withColumn("lev_sim", F.round(F.col("ts")[0], 6)).withColumn(
            "jw", F.round(F.coalesce(F.col("ts")[1], F.lit(0.0)), 6)
        )
    elif use_jvm:
        j = j.withColumn(
            "lev_sim",
            F.round(F.call_function(LEVSIM_FUNC, F.col("text_a"), F.col("text_b")), 6),
        )
    else:
        j = j.withColumn(
            "lev_sim", F.round(levenshtein_sim_col(F.col("text_a"), F.col("text_b")), 6)
        )
        if with_jw:
            j = j.withColumn(
                "jw", F.round(jaro_winkler_col(F.col("text_a"), F.col("text_b")), 6)
            )
    verdict = (
        F.when(F.col("sig_a") == F.col("sig_b"), "exact")
        .when(F.col("jaccard") >= JACCARD_NEAR, "near_dup")
        .when(F.col("containment") >= CONTAIN_NEAR, "resumption")
        .when(F.col("jaccard") >= JACCARD_PARTIAL, "partial")
        .otherwise("far")
    )
    cols = ["conv_a", "conv_b", "jaccard", "containment", "lev_sim"] + (["jw"] if with_jw else [])
    return j.withColumn("verdict", verdict).select(*cols, "verdict")


VERDICT_RANK = {"exact": 5, "near_dup": 4, "resumption": 3, "partial": 2, "far": 1}


def choose_candidate(scored: DataFrame, profiles: DataFrame) -> DataFrame:
    """R1 proper: the multi-feature ranking cascade as ONE composed window.

    Analog of ``AddressChooser.cs:19-109`` — a 9-step ordered tie-break over
    computed features. The Spark-first form is exactly what SURVEY §2.6
    specifies: compute every feature as a column, then a single
    ``row_number`` over the composed descending order (verdict class,
    jaccard, containment, lev_sim, jw, candidate size, id) — one shuffle on
    ``conv_a``, no per-step passes. Every feature is deterministic and the
    final key (``conv_b``) is unique, so the chosen row is total-order
    stable under any partitioning.

    Returns one row per ``conv_a``: its best-ranked candidate with the
    features that chose it.
    """
    expr = None
    for v, r in VERDICT_RANK.items():
        expr = (
            F.when(F.col("verdict") == v, r)
            if expr is None
            else expr.when(F.col("verdict") == v, r)
        )
    feats = scored.join(
        profiles.select(F.col("conv_id").alias("conv_b"), F.col("n_turns").alias("n_turns_b")),
        "conv_b",
    ).withColumn("verdict_rank", expr)
    w = Window.partitionBy("conv_a").orderBy(
        F.desc("verdict_rank"),
        F.desc("jaccard"),
        F.desc("containment"),
        F.desc("lev_sim"),
        F.desc("jw"),
        F.desc("n_turns_b"),
        F.asc("conv_b"),
    )
    return (
        feats.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "conv_a",
            F.col("conv_b").alias("best_match"),
            "verdict",
            "jaccard",
            "containment",
            "lev_sim",
            "jw",
            "n_turns_b",
        )
    )


def matched_edges(scored: DataFrame) -> DataFrame:
    """Edges feeding the clustering stage."""
    return scored.filter(F.col("verdict").isin(*MATCH_VERDICTS)).select(
        F.col("conv_a").alias("src"), F.col("conv_b").alias("dst")
    )


def compare_convs(transcripts: DataFrame, conv_a: str, conv_b: str) -> DataFrame:
    """Point comparison of two conversations -> one verdict row.

    Public-API analog of ``CompareAddresses(string, string)``
    (``AddressParser.cs:143-153``): callers hand two entity keys and get the
    categorical verdict plus the similarity features the cascade used.
    """
    from . import blocking

    pair = transcripts.sparkSession.createDataFrame(
        [(min(conv_a, conv_b), max(conv_a, conv_b))], ["conv_a", "conv_b"]
    )
    sub = transcripts.filter(F.col("conv_id").isin(conv_a, conv_b))
    profiles = blocking.conv_profiles(blocking.normalize_turns(sub))
    return score_pairs(pair, profiles, with_jw=True, broadcast_profiles=True)
