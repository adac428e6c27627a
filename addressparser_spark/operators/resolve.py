"""Canonical entity registry: resolve clusters to stable entity ids.

Analog of the reference's ``dbo.Addresses`` registry + ``MergeAddress``
upsert (``Db/DataContextBase_Address.cs:359-440``): a batch's clusters are
matched against the already-known registry by signature (null-safe key
equality, the ``SetAddressId`` 6-key lookup analog); unmatched clusters get
new deterministic entity ids. In production the registry is an Iceberg table
and this stage is a ``MERGE INTO``; here the same semantics are expressed as
broadcast-join + anti-join + union so the sandbox (no Iceberg jar) can run it.

Determinism: a new entity id is ``md5('entity|' + cluster signature)``, never
``uuid()`` — reruns and resumed runs assign identical ids (the reference's
IDENTITY column is replaced by a content-derived key, which also dedupes
across concurrent batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REGISTRY_SCHEMA = "entity_id string, rep_conv_id string, sig string"


def cluster_representatives(clusters: DataFrame, profiles: DataFrame) -> DataFrame:
    """(cluster_id, rep_conv_id, sig): one row per cluster.

    The representative is the cluster id itself (= min conv_id, stable), and
    the cluster signature is the representative's turn signature.
    """
    reps = clusters.select("cluster_id").distinct()
    return (
        reps.join(
            profiles.select(F.col("conv_id").alias("cluster_id"), "sig"),
            "cluster_id",
            "left",
        )
        .select(
            "cluster_id",
            F.col("cluster_id").alias("rep_conv_id"),
            "sig",
        )
    )


def resolve_entities(
    clusters: DataFrame, profiles: DataFrame, registry: DataFrame | None = None
) -> DataFrame:
    """(conv_id, cluster_id, entity_id): stable entity id per conversation.

    Known clusters (signature already in the registry) keep their entity id;
    new clusters mint ``md5('entity|' + sig)``. The registry side is
    broadcast — it is the reference-dictionary join the north star calls for
    (replacing the reference's per-row SQL lookups).
    """
    reps = cluster_representatives(clusters, profiles)
    if registry is not None and not registry.isEmpty():
        matched = reps.join(
            F.broadcast(registry.select("sig", "entity_id")), "sig", "left"
        )
    else:
        matched = reps.withColumn("entity_id", F.lit(None).cast("string"))
    resolved = matched.select(
        "cluster_id",
        F.coalesce(
            "entity_id", F.md5(F.concat(F.lit("entity|"), F.col("sig")))
        ).alias("entity_id"),
    )
    return clusters.join(resolved, "cluster_id").select(
        "conv_id", "cluster_id", "entity_id"
    )


def registry_additions(
    resolved: DataFrame, profiles: DataFrame, registry: DataFrame | None = None
) -> DataFrame:
    """Entities in this batch that are NOT yet in the registry.

    This is the write-side of the MERGE emulation: at scale the registry is
    huge and append-only, so a batch writes ONLY its additions (O(batch)),
    never a rewritten registry (O(registry)) — the streaming layer appends
    these as per-epoch delta files and compacts periodically.
    """
    spark = resolved.sparkSession
    new_entities = (
        resolved.filter(F.col("conv_id") == F.col("cluster_id"))
        .join(profiles.select("conv_id", "sig"), "conv_id")
        .select(
            "entity_id",
            F.col("conv_id").alias("rep_conv_id"),
            "sig",
        )
        .dropDuplicates(["entity_id"])
    )
    if registry is None:
        registry = spark.createDataFrame([], REGISTRY_SCHEMA)
    return new_entities.join(
        registry.select("sig").withColumn("__hit", F.lit(1)),
        "sig",
        "left_anti",
    ).select("entity_id", "rep_conv_id", "sig")


def merge_registry(
    resolved: DataFrame, profiles: DataFrame, registry: DataFrame | None = None
) -> DataFrame:
    """The MERGE-INTO emulation: registry ∪ (new entities not yet present).

    Iceberg deployment note: this whole function is
    ``MERGE INTO registry r USING new n ON r.sig <=> n.sig
    WHEN NOT MATCHED THEN INSERT ...`` — anti-join+union is the
    engine-agnostic equivalent (same null-safe key semantics).
    """
    spark = resolved.sparkSession
    if registry is None:
        registry = spark.createDataFrame([], REGISTRY_SCHEMA)
    return registry.unionByName(registry_additions(resolved, profiles, registry))
