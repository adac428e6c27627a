"""spark-submit entry point: ``python -m addressparser_spark.cli <cmd> ...``.

Deployment shape per the north rule: zip the package
(``python -m addressparser_spark.cli package /tmp/engine.zip``), then

    spark-submit --py-files /tmp/engine.zip \
        -m ... cli.py link --input <transcripts> --output <dir>

Commands:

- ``link``     batch linkage: transcripts parquet -> clusters + resolved
               entities + registry + lineage metrics
- ``stream``   incremental linkage over a growing transcripts directory
- ``package``  build the --py-files zip
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile


def _cmd_package(args: argparse.Namespace) -> None:
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg_root)
    with zipfile.ZipFile(args.out, "w") as z:
        for root, _, files in os.walk(pkg_root):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo_root))
    print(args.out)
    jar = os.path.join(pkg_root, "jars", "jw-udf.jar")
    if os.path.exists(jar):
        # the JVM scoring kernels ride --jars (a --py-files zip is not on the
        # JVM classpath); without it the engine silently uses the
        # value-identical Catalyst/pandas fallbacks
        print(f"hint: add --jars {jar} for the JVM scoring kernels", file=sys.stderr)


def _cmd_link(args: argparse.Namespace) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from addressparser_spark.plans.pipeline import run_linkage
    from addressparser_spark.operators.resolve import (
        cascade_registry_additions,
        resolve_cascade,
    )
    from addressparser_spark.sources.registry_writer import registry_writer
    from addressparser_spark.sources.tables import TableStore

    spark = SparkSession.builder.appName("transcript-linkage").getOrCreate()
    store = TableStore(spark, args.output)
    transcripts = spark.read.parquet(args.input)
    result = run_linkage(
        transcripts,
        checkpoint_dir=os.path.join(args.output, "cc_checkpoints"),
        with_jw=not args.no_jw,
    )
    # MERGE seam: Iceberg MERGE INTO when --registry-table names a catalog
    # table and the jar is present; parquet anti-join+union emulation here
    writer = registry_writer(
        spark, store, iceberg_table=getattr(args, "registry_table", None)
    )
    registry = writer.read()
    # three consumers (resolved table, registry merge, stage metrics); the
    # try/finally releases the cache when main() is called in-process —
    # without it a second link on the same SparkSession pins executor memory
    resolved = resolve_cascade(result.clusters, result.profiles, registry).cache()
    try:
        store.write("clusters", result.clusters)
        store.write("resolved", resolved)
        writer.merge(cascade_registry_additions(resolved, result.profiles, registry))
        store.write("dropped_blocks", result.dropped_blocks)
        metrics = result.metrics.resolve()
        metrics["n_clusters"] = result.clusters.select("cluster_id").distinct().count()
        metrics["resolve_stages"] = {
            r["resolve_stage"]: int(r["n"])
            for r in resolved.groupBy("resolve_stage")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    finally:
        resolved.unpersist()
    from addressparser_spark.plans.pipeline import partition_histogram

    metrics["profile_partitions"] = partition_histogram(result.profiles)
    metrics["dropped_blocks"] = result.dropped_blocks.count()
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    print(json.dumps(metrics))


def _cmd_stream(args: argparse.Namespace) -> None:
    from pyspark.sql import SparkSession

    from addressparser_spark.streaming.incremental import incremental_linkage

    spark = SparkSession.builder.appName("transcript-linkage-stream").getOrCreate()
    q = incremental_linkage(
        spark,
        input_dir=args.input,
        output_dir=os.path.join(args.output, "resolved"),
        registry_dir=os.path.join(args.output, "registry"),
        checkpoint_dir=os.path.join(args.output, "stream_checkpoint"),
    )
    q.awaitTermination(args.timeout)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="addressparser_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pk = sub.add_parser("package", help="build the --py-files zip")
    pk.add_argument("out")
    pk.set_defaults(fn=_cmd_package)

    ln = sub.add_parser("link", help="batch linkage")
    ln.add_argument("--input", required=True)
    ln.add_argument("--output", required=True)
    ln.add_argument("--no-jw", action="store_true")
    ln.add_argument(
        "--registry-table",
        default=None,
        help="Iceberg catalog table for the registry (real MERGE INTO); "
        "default: parquet emulation under --output/registry",
    )
    ln.set_defaults(fn=_cmd_link)

    st = sub.add_parser("stream", help="incremental streaming linkage")
    st.add_argument("--input", required=True)
    st.add_argument("--output", required=True)
    st.add_argument("--timeout", type=int, default=300)
    st.set_defaults(fn=_cmd_stream)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
