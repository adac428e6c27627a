"""Pairwise string-similarity functions.

- Token/shingle-set Jaccard + containment: pure Catalyst array expressions.
- Levenshtein: Spark built-in (JVM, ``F.levenshtein``) — never Python.
- Jaro-Winkler: Spark has no built-in, so it ships as a compiled JVM UDF
  (``java/JaroWinkler.java`` -> ``jars/jw-udf.jar``, registered as
  ``jw_java`` by ``session.get_spark``): no Python workers, no Arrow hop —
  the pairwise scoring stage stays entirely JVM-side, which is what lets its
  throughput scale linearly with cores. When the jar is absent the
  Arrow-batched pandas UDF below is the fallback (never a row-at-a-time
  ``F.udf``), mirroring the reference's pairwise comparator slot
  (``AddressComparer.cs:107-268``). Both implementations match the classic
  Winkler formulation (prefix<=4, p=0.1, boost only when jaro > 0.7) with the
  same IEEE-754 operation order — and DuckDB's ``jaro_winkler_similarity``
  computes the identical value, letting the driver oracle verify either path
  bit-for-bit (tests/test_similarity_jvm.py proves three-way equality).
"""

from __future__ import annotations

from bisect import bisect_left

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def jaccard_col(a: Column, b: Column) -> Column:
    """Set Jaccard of two array columns (JVM-side)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def containment_col(a: Column, b: Column) -> Column:
    """|A ∩ B| / min(|A|,|B|) — high when one side is a truncation of the other."""
    inter = F.size(F.array_intersect(a, b))
    m = F.least(F.size(a), F.size(b))
    return F.when(m == 0, F.lit(1.0)).otherwise(inter / m)


def levenshtein_sim_col(a: Column, b: Column, max_len: int = 96) -> Column:
    """Normalized Levenshtein similarity on length-capped prefixes (JVM).

    The cap bounds the O(n*m) DP the same way the reference chunks queries at
    150 chars (``Parser.cs:43-57``).
    """
    ta, tb = F.substring(a, 1, max_len), F.substring(b, 1, max_len)
    mx = F.greatest(F.length(ta), F.length(tb))
    return F.when(mx == 0, F.lit(1.0)).otherwise(1.0 - F.levenshtein(ta, tb) / mx)


def _jaro(s1: str, s2: str) -> float:
    # classic Jaro with a per-character position index: instead of scanning
    # the whole match window per char (O(n*window)), scan only positions of
    # that character — ~10x fewer interpreted iterations on natural text
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0
    window = max(n1, n2) // 2 - 1
    if window < 0:
        window = 0
    pos: dict[str, list[int]] = {}
    for j, c in enumerate(s2):
        pos.setdefault(c, []).append(j)
    flags1 = [False] * n1
    flags2 = [False] * n2
    m = 0
    for i, c in enumerate(s1):
        lst = pos.get(c)
        if not lst:
            continue
        lo, hi = i - window, i + window
        k = bisect_left(lst, lo)
        while k < len(lst) and lst[k] <= hi:
            j = lst[k]
            if not flags2[j]:
                flags1[i] = flags2[j] = True
                m += 1
                break
            k += 1
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(n1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (m / n1 + m / n2 + (m - t) / m) / 3.0


def jaro_winkler_py(s1: str | None, s2: str | None) -> float:
    """Classic Jaro-Winkler (prefix<=4, p=0.1, boost threshold 0.7)."""
    if s1 is None or s2 is None:
        return 0.0
    jaro = _jaro(s1, s2)
    if jaro > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        jaro += prefix * 0.1 * (1.0 - jaro)
    return jaro


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([jaro_winkler_py(x, y) for x, y in zip(a, b)], dtype="float64")


def jaro_winkler_col(a: Column, b: Column, max_len: int = 96) -> Column:
    """JW on length-capped prefixes: JVM UDF when registered, pandas fallback.

    The two paths are bit-identical (same algorithm, same double op order),
    so which one a session ends up with never changes results — only whether
    the scoring stage needs Python workers.
    """
    from pyspark.sql import SparkSession

    from ..session import JW_FUNC, register_jw

    ta, tb = F.substring(a, 1, max_len), F.substring(b, 1, max_len)
    spark = SparkSession.getActiveSession()
    if spark is not None and register_jw(spark):
        return F.call_function(JW_FUNC, ta, tb)
    return jaro_winkler_udf(ta, tb)
