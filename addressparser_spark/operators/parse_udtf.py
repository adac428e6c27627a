"""Table-valued parse surface: raw transcript string -> turn rows.

The reference's public surface is a SQL TVF — ``ParseAddress`` takes one
string and returns a table row via ``FillRow``
(``AddressParser/AddressParser.cs:53-68,163-175``). The Spark-native analog
is a Python UDTF used through ``LATERAL``: ``parse_transcript(raw)`` explodes
a serialized conversation ("role: text || role: text ...") back into typed
turn rows.

Format: segments joined by ``' || '``; each segment is ``<role>: <text>``
(role = leading lowercase word; the first ``': '`` delimits, so text may
itself contain colons).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

SEP = " || "
_SEG_RE = re.compile(r"^([a-z]+): (.*)$", re.S)


@udtf(returnType="turn_idx int, role string, text string")
class ParseTranscript:
    def eval(self, raw: str):
        if raw is None:
            return
        for i, seg in enumerate(raw.split(SEP)):
            m = _SEG_RE.match(seg)
            if m:
                yield i, m.group(1), m.group(2)
            else:
                yield i, None, seg


def serialize_convs(transcripts: DataFrame) -> DataFrame:
    """(conv_id, raw): turn rows -> one serialized string per conversation."""
    parts = F.array_sort(
        F.collect_list(F.struct("turn_idx", F.concat("role", F.lit(": "), "text").alias("seg")))
    )
    return transcripts.groupBy("conv_id").agg(
        F.array_join(F.transform(parts, lambda p: p["seg"]), SEP).alias("raw")
    )


def parse_transcripts(spark: SparkSession, raw: DataFrame) -> DataFrame:
    """LATERAL-apply the UDTF: (conv_id, raw) -> (conv_id, turn_idx, role, text)."""
    spark.udtf.register("parse_transcript", ParseTranscript)
    raw.createOrReplaceTempView("raw_convs_for_udtf")
    return spark.sql(
        """
        SELECT r.conv_id, p.turn_idx, p.role, p.text
        FROM raw_convs_for_udtf r, LATERAL parse_transcript(r.raw) p
        """
    )
