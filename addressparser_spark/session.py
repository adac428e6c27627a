"""SparkSession factory tuned for the linkage workload.

Local-mode settings mirror what a 1000-executor cluster deployment would set
per-executor: AQE on (skew-join splitting for hot blocking keys), shuffle
partitions sized to cores (overridden to ~2-3x total cores on a real cluster),
Arrow enabled for the pandas-UDF scoring path, and a pinned UTC session
timezone so results compare bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# JVM scoring-kernel jar (built by java/build.sh, committed): Jaro-Winkler,
# merge-walk intersect count, and two-row-DP Levenshtein similarity. Loading
# it at session build time lets the pairwise scoring stage run with zero
# Python workers and no per-row hash-set churn — the Catalyst/pandas paths
# remain as fallbacks when the jar is absent (e.g. spark-submit without
# --jars). Every JVM kernel is value-identical to its fallback, so which
# path a session gets never changes results.
JW_JAR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jars", "jw-udf.jar")
JW_FUNC = "jw_java"
INTERSECT_FUNC = "intersect_count_java"
LEVSIM_FUNC = "lev_sim_java"
TEXTSIM_FUNC = "text_sim_java"  # fused [lev_sim, jw] — one decode per pair

_JVM_FUNCS = (
    (JW_FUNC, "addressparser.JaroWinkler", "double"),
    (INTERSECT_FUNC, "addressparser.IntersectCount", "int"),
    (LEVSIM_FUNC, "addressparser.LevSim", "double"),
    (TEXTSIM_FUNC, "addressparser.TextSim", "array<double>"),
)


def register_jw(spark: SparkSession) -> bool:
    """Register the JVM scoring kernels if the jar is loaded.

    Returns True when the JVM path is usable in this session. Safe to call
    repeatedly; safe on sessions built without the jar (returns False).
    """
    try:
        if spark.catalog.functionExists(JW_FUNC):
            return True
        from pyspark.sql.types import ArrayType, DoubleType, IntegerType

        types = {
            "double": DoubleType(),
            "int": IntegerType(),
            "array<double>": ArrayType(DoubleType()),
        }
        for name, cls, rt in _JVM_FUNCS:
            spark.udf.registerJavaFunction(name, cls, types[rt])
        return True
    except Exception:
        return False


def get_spark(
    app: str = "transcript-linkage",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "16g",
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` then ``*``. On a real cluster
    the master/deploy settings come from spark-submit; everything here is
    cluster-safe (no local paths, no driver-host assumptions).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cores == "*" else int(cores)
        shuffle_partitions = max(8, int(n))

    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE right-size the output partitioning of cached plans too
        # (cached conv profiles feed every downstream stage)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    if os.path.exists(JW_JAR):
        b = b.config("spark.jars", JW_JAR)
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    register_jw(spark)
    return spark
