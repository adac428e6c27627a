"""Type dictionary dimension table (B5/B6 analog).

The reference matches every word against a 123-row type dictionary
(``GetTypes``, ``Parser.cs:771-813``; ``SplitNameAndTypes``,
``Parser.cs:620-711``) to split a phrase into its typed part and its name
part. The transcript engine's analog types the corpus vocabulary into
operator/container/tool classes. One constant, consumed by BOTH engines:

- Spark: broadcast-joined as a dimension DataFrame (`operators/types.py`)
- DuckDB oracle: a VALUES CTE built from the same rows
"""

from __future__ import annotations

TYPES_DIM: list[tuple[str, str, str]] = [
    # (token, type_id, family)
    ("table", "t01", "container"),
    ("row", "t02", "container"),
    ("column", "t03", "container"),
    ("line", "t04", "container"),
    ("part", "t05", "container"),
    ("batch", "t06", "container"),
    ("stream", "t07", "container"),
    ("vector", "t08", "container"),
    ("scan", "o01", "op"),
    ("join", "o02", "op"),
    ("filter", "o03", "op"),
    ("sort", "o04", "op"),
    ("merge", "o05", "op"),
    ("group", "o06", "op"),
    ("agg", "o07", "op"),
    ("window", "o08", "op"),
    ("query", "o09", "op"),
    ("hash", "o10", "op"),
    ("bash", "x01", "tool"),
    ("search", "x02", "tool"),
]


def types_values_sql() -> str:
    """DuckDB VALUES CTE body for the same dimension."""
    rows = ", ".join(f"('{t}', '{i}', '{f}')" for t, i, f in TYPES_DIM)
    return f"types_dim(token, type_id, family) AS (SELECT * FROM (VALUES {rows}))"
