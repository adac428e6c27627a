"""Transitive clustering: large-star/small-star connected components.

The reference resolves a candidate forest to one canonical entity id through
in-memory parent walks + a MERGE upsert (``AddressSearcher.cs:43-67``,
``Db/DataContextBase_Address.cs:359-440``). At 10^12-turn scale the analog is
connected components over the matched-pair edge list, computed with the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — each phase is one
groupBy+min+explode, convergence in O(log n) rounds, no driver-side graph.

Determinism: components are labeled by their lexicographic min node id, so
cluster ids are stable across runs/partitionings (replacing the reference's
order-dependent ``First()`` tie-breaks, ``AddressChooser.cs:30,62``).

Resumability: every iteration checkpoints its edge frontier to
``<checkpoint_dir>/iter_<k>`` (parquet here; Iceberg table-per-iteration in a
catalog deployment) and ``connected_components`` resumes from the newest
complete checkpoint — kill it at iteration k, rerun, and it continues from k.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect neighbors v > u to min(N(u) ∪ {u})."""
    nbrs = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mv"))
    m = F.least(F.col("u"), F.col("mv"))
    return (
        nbrs.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), m.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges big->small; connect each small neighbor (and u) to the min."""
    nbrs = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    mins = nbrs.groupBy("u").agg(F.min("v").alias("m"))
    relink = nbrs.join(mins, "u").select(F.col("v").alias("src"), F.col("m").alias("dst"))
    self_link = mins.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return (
        relink.unionAll(self_link)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _is_star_forest(edges: DataFrame) -> bool:
    """Structural convergence test: TRUE iff the edge set is a converged
    min-labeled star forest.

    Converged means: every edge points member -> center (src > dst), no node
    is both a source and a destination (no chains left to collapse), and no
    source appears twice (no node still linked to two centers). One tiny
    aggregation job — much cheaper than the extra large-star/small-star
    round that fingerprint-equality convergence detection needs to CONFIRM
    stability: this test fires on the converged round itself, and an input
    that is already a star forest (e.g. pure exact-duplicate stars) exits
    with zero rounds.
    """
    nodes = edges.select(
        F.col("src").alias("n"),
        F.lit(1).alias("s"),
        F.lit(0).alias("d"),
        (F.col("src") <= F.col("dst")).cast("int").alias("w"),
    ).unionAll(
        edges.select(F.col("dst"), F.lit(0), F.lit(1), F.lit(0))
    )
    bad = (
        nodes.groupBy("n")
        .agg(
            F.max("s").alias("s"), F.max("d").alias("d"),
            F.sum("s").alias("ns"), F.max("w").alias("w"),
        )
        .filter(
            (F.col("w") == 1)
            | ((F.col("s") == 1) & ((F.col("d") == 1) | (F.col("ns") > 1)))
        )
    )
    return bad.isEmpty()


def _checkpoint(
    spark: SparkSession, df: DataFrame, checkpoint_dir: str | None, it: int
) -> DataFrame:
    # localCheckpoint is LOAD-BEARING, not an optimization knob: each star
    # round references its input in several subtrees (self-join + union), so
    # without lineage TRUNCATION the logical plan roughly triples per
    # iteration and the analyzer/optimizer hangs by iteration ~4. persist()
    # alone does NOT truncate (caching is a physical-plan concern; the
    # optimizer still walks the full tree) — measured, do not "simplify".
    if checkpoint_dir is None:
        # eager=False: the next round's convergence-check action materializes
        # the checkpoint, so each round costs ONE job, not two — at small
        # edge volumes the loop is scheduling-latency bound, and this halves
        # the sequential job count
        return df.localCheckpoint(eager=False)
    path = os.path.join(checkpoint_dir, f"iter_{it:03d}")
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _resume_iteration(spark: SparkSession, checkpoint_dir: str) -> tuple[int, DataFrame | None]:
    if not os.path.isdir(checkpoint_dir):
        return 0, None
    done = sorted(
        d for d in os.listdir(checkpoint_dir)
        if d.startswith("iter_") and os.path.exists(os.path.join(checkpoint_dir, d, "_SUCCESS"))
    )
    if not done:
        return 0, None
    last = done[-1]
    return int(last.split("_")[1]) + 1, spark.read.parquet(os.path.join(checkpoint_dir, last))


def connected_components(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_iter: int = 25,
    resume: bool = True,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``.

    ``component`` is the lexicographic min node id of the connected component.
    """
    spark = edges.sparkSession
    # normalize in CONVERGED orientation (big -> small): an input that is
    # already a min-labeled star forest then exits below with zero rounds
    e = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst")).distinct()

    start_it = 0
    resumed = None
    if checkpoint_dir is not None and resume:
        start_it, resumed = _resume_iteration(spark, checkpoint_dir)
    if resumed is not None:
        e = resumed
    else:
        # materialize the (possibly expensive) upstream plan ONCE: the
        # convergence check and round 1 both consume this frontier
        e = e.localCheckpoint(eager=False)

    for it in range(start_it, max_iter):
        # structural check BEFORE each round: fires on the converged round
        # itself (fingerprint-equality needs one extra confirming round) and
        # doubles as the action that materializes the lazy checkpoint
        if _is_star_forest(e):
            break
        e = _small_star(_large_star(e))
        e = _checkpoint(spark, e, checkpoint_dir, it)
    else:
        if not _is_star_forest(e):
            raise RuntimeError(
                f"connected_components: no convergence in {max_iter} iterations"
            )

    # Converged: every edge points node -> component min. Reps map to themselves.
    members = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    reps = e.select(F.col("dst").alias("node"), F.col("dst").alias("component")).distinct()
    return members.unionByName(reps).distinct()


def assign_clusters(nodes: DataFrame, components: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Left-join components onto the full node set; singletons are their own cluster."""
    out = nodes.select(F.col(id_col).alias("conv_id")).distinct().join(
        components.withColumnRenamed("node", "conv_id"), "conv_id", "left"
    )
    return out.select(
        "conv_id", F.coalesce("component", "conv_id").alias("cluster_id")
    )
