"""Three-way Jaro-Winkler parity: JVM UDF == Python reference == DuckDB.

The JVM path (java/JaroWinkler.java) is the production fast path; the driver
oracle compares against DuckDB. Bit-identity across all three means swapping
paths can never flip a verdict or a driver hash.

Scope note: JVM == Python holds for ALL Unicode (both are codepoint-based).
DuckDB's ``jaro_winkler_similarity`` walks UTF-8 *bytes*, so its value
diverges on multi-byte characters — the three-way check therefore runs on
ASCII (byte == codepoint), which is what the scoring path feeds it
(normalized transcript text; the r01 driver hash over real data confirms).
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from addressparser_spark.functions.similarity import jaro_winkler_py
from addressparser_spark.session import JW_FUNC, register_jw


def _random_pairs(n: int, seed: int = 7, alphabet: str | None = None) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    if alphabet is None:
        alphabet = string.ascii_lowercase + " 0123456789"
    pairs = []
    for _ in range(n):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 96)))
        if rng.random() < 0.5:
            # mutated copy: the regime where window/transposition logic matters
            b = list(a)
            for _ in range(rng.randint(0, 8)):
                if not b:
                    break
                op = rng.randint(0, 2)
                i = rng.randrange(len(b))
                if op == 0:
                    b[i] = rng.choice(alphabet)
                elif op == 1:
                    del b[i]
                else:
                    b.insert(i, rng.choice(alphabet))
            b = "".join(b)
        else:
            b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 96)))
        pairs.append((a, b))
    pairs += [("", ""), ("a", ""), ("", "a"), ("abc", "abc"), ("ab", "ba")]
    return pairs


def test_jvm_matches_python_and_duckdb_ascii(spark):
    assert register_jw(spark), "JVM JW jar not loaded in test session"
    pairs = _random_pairs(400)
    df = spark.createDataFrame(pairs, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["jw"]
        for r in df.select("a", "b", F.call_function(JW_FUNC, "a", "b").alias("jw")).collect()
    }
    con = duckdb.connect()
    for a, b in pairs:
        py = jaro_winkler_py(a, b)
        duck = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert got[(a, b)] == py, (a, b, got[(a, b)], py)
        if a == "" and b == "":
            # engine: identical strings -> 1.0; DuckDB: empty -> 0.0. The
            # scoring path never feeds two empty capped texts (profiles of
            # empty convs don't pair), so this divergence is unreachable.
            continue
        assert py == duck, (a, b, py, duck)


def test_jvm_matches_python_unicode(spark):
    """Codepoint semantics: JVM == Python on multi-byte text too (DuckDB is
    byte-based and intentionally excluded here)."""
    assert register_jw(spark)
    pairs = _random_pairs(200, seed=11, alphabet=string.ascii_lowercase + " éüñ文𝕏")
    df = spark.createDataFrame(pairs, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["jw"]
        for r in df.select("a", "b", F.call_function(JW_FUNC, "a", "b").alias("jw")).collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == jaro_winkler_py(a, b), (a, b)


def test_intersect_kernel_matches_catalyst(spark):
    """Merge-walk intersect == size(array_intersect) on random sorted sets."""
    from addressparser_spark.session import INTERSECT_FUNC

    rng = random.Random(13)
    rows = []
    for _ in range(300):
        a = sorted({rng.randint(-2**62, 2**62) for _ in range(rng.randint(0, 40))})
        # overlap-biased second set: half drawn from a, half fresh
        b = sorted(
            {x for x in a if rng.random() < 0.5}
            | {rng.randint(-2**62, 2**62) for _ in range(rng.randint(0, 40))}
        )
        rows.append((a, b))
    rows += [([], []), ([], [1]), ([1, 2, 3], [1, 2, 3])]
    df = spark.createDataFrame(rows, "a array<bigint>, b array<bigint>")
    bad = df.select(
        F.call_function(INTERSECT_FUNC, "a", "b").alias("jvm"),
        F.size(F.array_intersect("a", "b")).alias("cat"),
    ).filter(F.col("jvm") != F.col("cat"))
    assert bad.count() == 0


def test_jvm_null_semantics(spark):
    assert register_jw(spark)
    df = spark.createDataFrame([("x", None), (None, None)], "a string, b string")
    rows = df.select(F.call_function(JW_FUNC, "a", "b").alias("jw")).collect()
    assert [r["jw"] for r in rows] == [0.0, 0.0]


def test_fused_kernel_null_parity(spark):
    """The fused TextSim extraction convention (scoring.py) must agree with
    the standalone kernels on nulls: lev_sim(null)=null, jw(null)=0.0."""
    from addressparser_spark.session import LEVSIM_FUNC, TEXTSIM_FUNC

    assert register_jw(spark)
    df = spark.createDataFrame(
        [("x", None), (None, None), ("ab", "ba"), ("", "")], "a string, b string"
    ).withColumn("ts", F.call_function(TEXTSIM_FUNC, "a", "b"))
    rows = df.select(
        F.col("ts")[0].alias("lev_fused"),
        F.coalesce(F.col("ts")[1], F.lit(0.0)).alias("jw_fused"),
        F.call_function(LEVSIM_FUNC, "a", "b").alias("lev_solo"),
        F.call_function(JW_FUNC, "a", "b").alias("jw_solo"),
    ).collect()
    for r in rows:
        assert r["lev_fused"] == r["lev_solo"], r
        assert r["jw_fused"] == r["jw_solo"], r


def test_score_pairs_uses_jvm_path(spark):
    """The scoring plan must contain no Python/Arrow eval when the jar is loaded."""
    from addressparser_spark.data.transcripts import transcripts_df
    from addressparser_spark.operators import blocking, scoring

    t = transcripts_df(spark, "/root/testdata/sf0.001")
    p = blocking.conv_profiles(blocking.normalize_turns(t))
    pair = spark.createDataFrame([("conv_000001", "conv_000002")], ["conv_a", "conv_b"])
    scored = scoring.score_pairs(pair, p, with_jw=True, broadcast_profiles=True)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
