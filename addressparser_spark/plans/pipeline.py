"""End-to-end linkage pipeline: normalize -> block -> pair -> score -> cluster.

Mirrors the reference lifecycle (``Parser.ParseAddress``,
``AddressParser/Core/Parser.cs:93-153``) but set-based: where the reference
makes 5-8 synchronous DB round-trips *per input row* (SURVEY.md §3.1), every
stage here is one whole-DataFrame transformation, so the "lookup" cost is a
constant number of shuffles for the entire batch.

Lineage/metrics: each stage reports row counts + dropped-block accounting via
``observe()`` (no extra actions) into :class:`PipelineMetrics`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from pyspark.sql import Window

from ..operators import blocking, pairs as pairs_op, scoring
from ..operators.clustering import assign_clusters, connected_components


def exact_edges(profiles: DataFrame) -> DataFrame:
    """Light stage: same-signature star edges straight from profiles.

    Mirrors the reference's light mode (exact-key lookup before the expensive
    full-text search, ``Db/DataContextBase_AddrObject.cs:52-95``): exact
    duplicates are linked by one window over ``sig`` — no pair generation,
    no scoring. Edges point members at the per-sig min conv_id, which yields
    the same connected components as scoring every same-sig pair.
    """
    w = Window.partitionBy("sig")
    reps = profiles.select(
        "conv_id", F.min("conv_id").over(w).alias("rep")
    )
    return reps.filter(F.col("conv_id") != F.col("rep")).select(
        F.col("conv_id").alias("src"), F.col("rep").alias("dst")
    )


def sig_representatives(profiles: DataFrame) -> DataFrame:
    """(conv_id, rep): every conversation mapped to its per-sig min conv_id."""
    w = Window.partitionBy("sig")
    return profiles.select("conv_id", F.min("conv_id").over(w).alias("rep"))


def funnel_clusters_from(
    profiles: DataFrame,
    heavy_edges: DataFrame,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(conv_id, cluster_id): light/heavy funnel clustering via contraction.

    Exact-duplicate (same-sig) stars are converged by construction — every
    member already points at the per-sig min — so sending them through the
    O(log n) connected-components loop is pure waste (they were ~95% of the
    edge volume). Instead the star is CONTRACTED: each heavy edge's
    endpoints are replaced by their sig representative, CC runs only on the
    contracted heavy-edge graph (tiny: one node per *distinct-content*
    conversation that matched something), and the mapping expands back
    through the rep.

    Contraction preserves labels exactly: every member's conv_id >= its
    rep's conv_id (rep = group min), so the min over a merged component of
    sig-groups equals the min over their reps — the same ``cluster_id`` the
    single-graph CC would emit (the driver oracle's recursive closure proves
    this equivalence).
    """
    rep = sig_representatives(profiles)
    contracted = (
        heavy_edges.join(
            rep.select(F.col("conv_id").alias("src"), F.col("rep").alias("rep_src")),
            "src",
        )
        .join(
            rep.select(F.col("conv_id").alias("dst"), F.col("rep").alias("rep_dst")),
            "dst",
        )
        .select(F.col("rep_src").alias("src"), F.col("rep_dst").alias("dst"))
    )
    comp = connected_components(contracted, checkpoint_dir=checkpoint_dir)
    return rep.join(
        comp.withColumnRenamed("node", "rep"), "rep", "left"
    ).select("conv_id", F.coalesce("component", "rep").alias("cluster_id"))


def heavy_pairs(profiles: DataFrame, num_hashes: int, rows_per_band: int,
                max_block_size: int, blocks: DataFrame | None = None) -> DataFrame:
    """Heavy stage candidates: prefix + MinHash keys only, same-sig pairs
    dropped (the light stage already linked them).

    Pass ``blocks`` (a possibly-persisted full block table) to reuse the
    MinHash computation across consumers instead of re-deriving it.
    """
    if blocks is None:
        blocks = blocking.block_table(profiles, num_hashes, rows_per_band)
    blocks = blocks.filter(F.col("src") != "sig")
    cand = pairs_op.candidate_pairs(blocks, max_block_size)
    sigs_a = profiles.select(F.col("conv_id").alias("conv_a"), F.col("sig").alias("_sig_a"))
    sigs_b = profiles.select(F.col("conv_id").alias("conv_b"), F.col("sig").alias("_sig_b"))
    return (
        cand.join(sigs_a, "conv_a")
        .join(sigs_b, "conv_b")
        .filter(F.col("_sig_a") != F.col("_sig_b"))
        .select("conv_a", "conv_b")
    )


@dataclass
class PipelineMetrics:
    counts: dict[str, int] = field(default_factory=dict)
    observations: dict[str, Observation] = field(default_factory=dict)

    def resolve(self) -> dict[str, int]:
        for name, obs in self.observations.items():
            for k, v in obs.get.items():
                self.counts[f"{name}.{k}"] = int(v)
        self.observations.clear()
        return dict(self.counts)


def partition_histogram(df: DataFrame) -> list[dict[str, int]]:
    """Per-partition row counts — the lineage signal for skew diagnosis.

    One extra job over the (usually cached) frame; rows-per-partition spread
    is what tells an operator whether salting/AQE actually balanced a stage.
    """
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy("pid")
        .collect()
    )
    return [{"partition": int(r["pid"]), "rows": int(r["rows"])} for r in rows]


@dataclass
class LinkageResult:
    profiles: DataFrame
    blocks: DataFrame
    dropped_blocks: DataFrame
    pairs: DataFrame
    scored: DataFrame
    clusters: DataFrame
    metrics: PipelineMetrics


def run_linkage(
    transcripts: DataFrame,
    checkpoint_dir: str | None = None,
    num_hashes: int = blocking.NUM_HASHES,
    rows_per_band: int = blocking.ROWS_PER_BAND,
    max_block_size: int = pairs_op.MAX_BLOCK_SIZE,
    with_jw: bool = True,
    escalate: bool = True,
) -> LinkageResult:
    """Full pipeline. ``escalate=True`` runs the light->heavy funnel: exact
    duplicates resolve from one window (no scoring), and only non-identical
    candidates reach the similarity cascade — the reference's two-phase
    search re-expressed set-based. Cluster output is identical either way
    (same-sig pairs would score 'exact' anyway); the funnel just removes
    them from the quadratic stage.
    """
    metrics = PipelineMetrics()

    turns = blocking.normalize_turns(transcripts)
    obs_turns = Observation("turns")
    turns = turns.observe(obs_turns, F.count(F.lit(1)).alias("rows"))
    metrics.observations["turns"] = obs_turns

    profiles = blocking.conv_profiles(turns).cache()
    blocks = blocking.block_table(profiles, num_hashes, rows_per_band)
    kept, dropped = pairs_op.capped_blocks(blocks, max_block_size)
    if escalate:
        # reuse the block table computed above: the MinHash sketch+explode is
        # the most expensive blocking step and must run once per pipeline
        cand = heavy_pairs(profiles, num_hashes, rows_per_band, max_block_size,
                           blocks=blocks)
    else:
        cand = pairs_op.candidate_pairs(blocks, max_block_size)
    obs_pairs = Observation("pairs")
    cand = cand.observe(obs_pairs, F.count(F.lit(1)).alias("candidates")).cache()
    metrics.observations["pairs"] = obs_pairs

    scored = scoring.score_pairs(cand, profiles, with_jw=with_jw)
    obs_scored = Observation("scored")
    scored = scored.observe(
        obs_scored,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("verdict").isin(*scoring.MATCH_VERDICTS), 1).otherwise(0)).alias("matches"),
    ).cache()
    metrics.observations["scored"] = obs_scored

    if escalate:
        # contraction shortcut: same-sig stars never enter the CC loop
        clusters = funnel_clusters_from(
            profiles, scoring.matched_edges(scored), checkpoint_dir=checkpoint_dir
        )
    else:
        components = connected_components(
            scoring.matched_edges(scored), checkpoint_dir=checkpoint_dir
        )
        clusters = assign_clusters(profiles, components)

    return LinkageResult(
        profiles=profiles,
        blocks=blocks,
        dropped_blocks=dropped,
        pairs=cand,
        scored=scored,
        clusters=clusters,
        metrics=metrics,
    )
