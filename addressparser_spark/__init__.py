"""transcript-linkage: a PySpark-native entity-resolution engine.

A from-scratch record-linkage pipeline over tables of multi-turn
conversation/agent transcripts ``(conv_id, turn_idx, role, text, tool, ts)``,
re-targeting the pipeline *shape* of the reference system
(iTimky/AddressParser: normalize -> block -> candidate lookup -> pairwise
verdict cascade -> canonical entity id; see
``/root/reference/AddressParser/Core/Parser.cs:93-153`` for the reference
lifecycle) onto idiomatic Spark DataFrame ops.

Layout:

- ``functions/``  scalar/column functions (normalizer, tokens, similarity, hashing)
- ``operators/``  relational operators (blocking, pairs, scoring, clustering,
  resolve, dedup, ann, text analysis, multimodal plumbing)
- ``data/``       deterministic transcripts derivation + synthetic generator
- ``plans/``      end-to-end pipeline orchestration + checkpointing
- ``streaming/``  incremental (Structured Streaming) linkage
"""

__version__ = "0.1.0"
