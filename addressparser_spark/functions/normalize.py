"""Per-turn text normalizer — the per-row invariant surface.

Analog of the reference's query normalization chain
(``InitSearchQuery`` lower/space-collapse, ``Parser.cs:201-213``;
``RemoveBadSymbols``, ``Parser.cs:156-163``; the ``ё``->``е`` umlaut fold,
``Parser.cs:291-296``). Three implementations that MUST stay byte-identical
(tested in tests/test_normalize.py):

1. ``normalize_col``   — Spark Column expression (Catalyst-native, codegen'd;
                         this is the hot path, no Python involved).
2. ``normalize_py``    — pure-Python oracle (the reference-semantics pin).
3. ``NORMALIZE_SQL_DUCKDB`` — DuckDB SQL template for the driver oracle.

Spec (applied in order):
  a. lowercase
  b. fold ``ё`` -> ``е``
  c. every char outside ``[a-z0-9а-я ]`` becomes a single space
  d. collapse runs of spaces, trim
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Keep-class: ascii lowercase alnum, Cyrillic а-я (ё already folded), space.
_STRIP_PATTERN = "[^a-z0-9а-я ]"
_COLLAPSE_PATTERN = " +"

_strip_re = re.compile(_STRIP_PATTERN)
_collapse_re = re.compile(_COLLAPSE_PATTERN)


def normalize_py(s: str | None) -> str | None:
    """Pure-Python reference oracle for one turn's text."""
    if s is None:
        return None
    s = s.lower().replace("ё", "е")
    s = _strip_re.sub(" ", s)
    return _collapse_re.sub(" ", s).strip()


def normalize_col(c: Column) -> Column:
    """Spark-native normalizer (whole-stage-codegen'd, no Python)."""
    c = F.lower(c)
    c = F.regexp_replace(c, "ё", "е")
    c = F.regexp_replace(c, _STRIP_PATTERN, " ")
    c = F.regexp_replace(c, _COLLAPSE_PATTERN, " ")
    return F.trim(c)


def normalize_sql_duckdb(expr: str) -> str:
    """DuckDB SQL expression equivalent of ``normalize_col`` over ``expr``."""
    return (
        "trim(regexp_replace(regexp_replace(replace(lower(" + expr + "), "
        "'ё', 'е'), '[^a-z0-9а-я ]', ' ', 'g'), ' +', ' ', 'g'))"
    )
