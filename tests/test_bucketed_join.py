"""Bucketed co-located join: same-bucketed tables join with NO Exchange.

The 100-TB lever for the resolve stage's registry lookup: a registry stored
bucketed by ``sig`` joins against same-bucketed probes without shuffling
either side, regardless of registry size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from addressparser_spark.sources.tables import TableStore


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # disable broadcast so the join strategy decision is about partitioning,
    # not size (tiny test tables would otherwise broadcast trivially)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        store = TableStore(spark, str(tmp_path))
        regish = spark.range(2000).select(
            F.md5(F.col("id").cast("string")).alias("sig"),
            F.col("id").alias("entity_num"),
        )
        probes = spark.range(0, 2000, 2).select(
            F.md5(F.col("id").cast("string")).alias("sig"),
            F.col("id").alias("probe_num"),
        )
        store.write_bucketed("bucketed_registry", regish, "sig", n_buckets=8)
        store.write_bucketed("bucketed_probes", probes, "sig", n_buckets=8)

        a = store.read_bucketed("bucketed_registry")
        b = store.read_bucketed("bucketed_probes")
        joined = a.join(b, "sig")
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # co-location: neither side shuffles — the bucketed scan satisfies
        # the join's required partitioning
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 1000

        # contrast: the SAME data read as plain parquet (bucket spec lost)
        # must shuffle both sides
        pa = spark.read.parquet(str(tmp_path / "bucketed_registry"))
        pb = spark.read.parquet(str(tmp_path / "bucketed_probes"))
        plain = _physical_plan(pa.join(pb, "sig"))
        assert "Exchange hashpartitioning" in plain, plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bucketed_registry")
        spark.sql("DROP TABLE IF EXISTS bucketed_probes")
