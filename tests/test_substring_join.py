"""J2 heavy-mode substring join: containment recall + df-cap accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from addressparser_spark.operators import blocking
from addressparser_spark.operators.substring_join import (
    RARE_DF_CAP,
    hot_keys,
    substring_pairs,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _profiles_of(spark, rows):
    t = spark.createDataFrame(rows, SCHEMA)
    return blocking.conv_profiles(blocking.normalize_turns(t))


def test_truncation_pair_found_via_contains(spark):
    long_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        ("base", 0, "user", long_text, None, None),
        ("base", 1, "assistant", "lambda mu nu xi omicron pi rho", None, None),
        # truncated resumption: only the first turn — its anchor phrase is a
        # verbatim substring of base's concatenated text
        ("trunc", 0, "user", long_text, None, None),
        # unrelated conversation, no shared shingles
        ("other", 0, "user", "one two three four five six seven eight", None, None),
    ]
    p = _profiles_of(spark, rows)
    got = {
        (r["conv_a"], r["conv_b"]): (r["a_contains_b"], r["b_contains_a"])
        for r in substring_pairs(p).collect()
    }
    assert ("base", "trunc") in got
    a_in_b, b_in_a = got[("base", "trunc")]
    assert a_in_b  # trunc's anchor occurs inside base's text
    assert all("other" not in k for pair in got for k in pair)


def test_hot_keys_reported_not_silent(spark):
    shared = "common shingle words repeated across conversations"
    rows = []
    for i in range(RARE_DF_CAP + 5):
        rows.append((f"c{i:03d}", 0, "user", f"{shared} tail{i} more{i} words{i}", None, None))
    p = _profiles_of(spark, rows)
    hot = hot_keys(p).collect()
    assert len(hot) > 0
    assert all(r["df"] > RARE_DF_CAP for r in hot)
    # hot keys are excluded from pair generation: the shared phrase alone
    # must NOT produce quadratic pairs
    n_pairs = substring_pairs(p).count()
    max_quadratic = (RARE_DF_CAP + 5) * (RARE_DF_CAP + 4) / 2
    assert n_pairs < max_quadratic
