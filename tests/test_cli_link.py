"""End-to-end CLI: two consecutive `link` runs over the same input.

Run 1 starts with no registry: every cluster mints a new entity id.
Run 2 resolves against run 1's persisted cascade registry: every cluster
must hit at full signature strength ('sig') with the SAME entity ids —
the idempotent-rerun guarantee the deterministic md5 ids exist for.
"""

from __future__ import annotations

import json

from addressparser_spark import cli


def test_link_twice_resolves_from_registry(spark, tmp_path, capsys):
    # the CLI consumes a transcripts parquet; derive one from the test data
    from addressparser_spark.data.transcripts import transcripts_df

    tdir = str(tmp_path / "transcripts")
    transcripts_df(spark, "/root/testdata/sf0.001").write.parquet(tdir)
    out = tmp_path / "out"

    cli.main(["link", "--input", tdir, "--output", str(out)])
    m1 = json.loads(open(out / "metrics.json").read())
    assert m1["resolve_stages"] == {"new": 167}
    assert m1["n_clusters"] == 117  # 100 base + 17 _d1 hard-negative singletons

    r1 = {
        (r["conv_id"], r["entity_id"])
        for r in spark.read.parquet(str(out / "resolved")).collect()
    }

    out2 = tmp_path / "out2"
    # second run: same input, registry carried over from run 1
    import shutil

    shutil.copytree(out / "registry", out2 / "registry")
    cli.main(["link", "--input", tdir, "--output", str(out2)])
    m2 = json.loads(open(out2 / "metrics.json").read())
    assert m2["resolve_stages"] == {"sig": 167}

    r2 = {
        (r["conv_id"], r["entity_id"])
        for r in spark.read.parquet(str(out2 / "resolved")).collect()
    }
    assert r1 == r2  # identical entity assignment across reruns

    # registry is stable: run 2 added nothing
    reg1 = spark.read.parquet(str(out / "registry"))
    reg2 = spark.read.parquet(str(out2 / "registry"))
    assert reg1.count() == reg2.count() == 117
    assert set(reg2.columns) >= {"entity_id", "rep_conv_id", "sig", "prefix_key", "syn_key"}
