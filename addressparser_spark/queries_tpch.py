"""Relational operator coverage over the TPC-H-ish tables.

One query per operator family from SURVEY.md §2 (joins J*, aggregations A*,
ranking cascades R*, set ops U*, scalar functions F*, hierarchy walks G1,
plus the window/sessionization family the transcript engine adds). Each has
an exact DuckDB oracle in ``oracle_tpch.py``.

Plan hygiene: dimension joins are explicitly broadcast; aggregates on doubles
are rounded so cross-engine float summation order can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def rel_q1_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-agg groupBy (A-family; map-side partial aggs)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def rel_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 analog: fact joined through two broadcast dims, rolled up."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def rel_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SJ1 analog: null-safe key equality (<=>), as in the 6-key identity lookup."""
    cust = _t(spark, sf_dir, "customer").withColumn(
        "seg_key", F.nullif("c_mktsegment", F.lit("BUILDING"))
    )
    a = cust.select(F.col("c_custkey").alias("k_a"), "seg_key", F.col("c_nationkey").alias("nk"))
    b = cust.select(F.col("c_custkey").alias("k_b"), F.col("seg_key").alias("seg_key_b"), F.col("c_nationkey").alias("nk_b"))
    j = a.join(
        b,
        a.seg_key.eqNullSafe(b.seg_key_b) & (a.nk == b.nk_b) & (a.k_a < b.k_b),
    )
    return j.groupBy("seg_key").agg(F.count(F.lit(1)).alias("n_pairs"))


def rel_argmax_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 cascade analog: deterministic top-1 per group via total-order window."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("best_price"))
    )


def rel_longest_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 analog: longest-name-per-group dedup (max length, then min name)."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc(F.length("p_name")), F.asc("p_name")
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", F.col("p_name").alias("longest_name"), F.length("p_name").alias("name_len"))
    )


def rel_groups_of_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 analog: keep groups of size exactly 1."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.min("c_custkey").alias("only_custkey"))
        .filter(F.col("n") == 1)
        .select("c_nationkey", "c_mktsegment", "only_custkey")
    )


def rel_union_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 analog: multi-source union probe, deduped."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src")
    )
    return cust.unionByName(supp).groupBy("nationkey", "src").agg(
        F.count(F.lit(1)).alias("n"), F.min("name").alias("first_name")
    )


def rel_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 analog: Except/left-anti — customers with no orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


def rel_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: customers with at least one urgent order."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


def rel_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 analog: ordered string aggregation for display."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    j = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return j.groupBy("r_name").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ", ").alias("nations")
    )


def rel_hierarchy_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 analog: bounded-level hierarchy assembly (region->nation->customer)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    j = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.select(
        "c_custkey",
        F.concat_ws(" > ", "r_name", "n_name", "c_name").alias("path"),
        F.lit(3).alias("depth"),
    )


def rel_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions per user over the events stream table."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn("sess_idx", F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    ))
    return (
        sess.groupBy("user_id", "sess_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


def rel_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the semi-structured ``events.props`` JSON column.

    Transcript pipelines carry tool-call arguments as JSON strings; the
    scalable path is ``from_json`` with an explicit schema (Catalyst
    JsonToStructs: codegen'd, prunes to the requested fields, no Python) —
    NOT per-row json.loads. Extracted field feeds a normal partial-agg
    rollup, so the whole query is one shuffle.
    """
    ev = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority x status."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
    )


def rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over lineitem flags."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


def rel_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregates + lag deltas per user over the events stream."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(run), 2).alias("running_value"),
        F.row_number().over(w).alias("seq"),
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 2).alias("delta"),
    )


def text_extract_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 analog: iterative regex peel-off of typed components into a struct."""
    d = _t(spark, sf_dir, "documents")
    first_num = F.regexp_extract("text", "([0-9]+)", 1)
    first_word = F.regexp_extract("text", "([A-Za-z]{4,})", 1)
    n_sents = F.size(F.filter(F.split("text", "[.!?]"), lambda s: F.trim(s) != ""))
    return d.select(
        "doc_id",
        F.when(first_num == "", None).otherwise(first_num).alias("first_number"),
        F.when(first_word == "", None).otherwise(first_word).alias("first_long_word"),
        n_sents.alias("n_sentences"),
    )


def rel_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation, value-identical to a plain GROUP BY.

    Runs the explicit salted aggregate (``operators/salting.py``) over the
    events table — the hot-key shape the north rule calls out — while the
    oracle is the PLAIN ``GROUP BY``: the driver's exact value-hash is the
    proof that salting never changes results, only the shuffle layout.
    """
    from .operators.salting import salted_aggregate

    ev = _t(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        ["user_id"],
        "event_id",
        {"n_events": F.count(F.lit(1)), "total_value": F.sum("value")},
    )
    return out.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("total_value", 2).alias("total_value"),
    )


def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS aggregation (multi-granularity rollup in one pass)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               count(*) AS n,
               round(sum(c_acctbal), 2) AS bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


def rel_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 combined: ROWS running aggregates + lag deltas + time-RANGE frame.

    One pass over events exercises every frame type the engine supports:
    unbounded-preceding ROWS sum, row_number, lag delta, and a 10-minute
    trailing RANGE sum over event time — all sharing one partition-by-user
    sort (a single window exchange in the plan).
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    # microsecond-precision RANGE ordering: casting ts to long would truncate
    # to whole seconds, merging sub-second peers and shifting the frame edge
    # relative to an INTERVAL-based oracle
    wr = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(run), 2).alias("running_value"),
        F.row_number().over(w).alias("seq"),
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 2).alias("delta"),
        F.round(F.sum("value").over(wr), 2).alias("trailing_10m"),
    )


def rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (order-statistics family)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
    )


def rel_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window: per-user 10-minute trailing sum over event time."""
    ev = _t(spark, sf_dir, "events")
    # microsecond-precision ordering: casting ts to long truncates to whole
    # seconds, which both merges sub-second peers and shifts the frame edge
    # relative to an INTERVAL-based oracle
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("trailing_10m"),
    )
