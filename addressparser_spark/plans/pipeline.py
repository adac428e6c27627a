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

from ..operators import blocking, pairs as pairs_op, scoring
from ..operators.clustering import assign_clusters, connected_components


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
) -> LinkageResult:
    metrics = PipelineMetrics()

    turns = blocking.normalize_turns(transcripts)
    obs_turns = Observation("turns")
    turns = turns.observe(obs_turns, F.count(F.lit(1)).alias("rows"))
    metrics.observations["turns"] = obs_turns

    profiles = blocking.conv_profiles(turns).cache()
    blocks = blocking.block_table(profiles, num_hashes, rows_per_band)
    kept, dropped = pairs_op.capped_blocks(blocks, max_block_size)
    cand = pairs_op.candidate_pairs(blocks, max_block_size).cache()
    scored = scoring.score_pairs(cand, profiles, with_jw=with_jw).cache()

    edges = scoring.matched_edges(scored)
    components = connected_components(edges, checkpoint_dir=checkpoint_dir)
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
