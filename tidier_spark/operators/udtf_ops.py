"""Python UDTFs (table functions) — the last letter of UDF/UDAF/UDTF.

SURVEY §2.3 "UDF/UDAF/UDTF" row: scalar and grouped-agg needs are served
by `pandas_udf`/`frame_apply`, grouped-map by `grouped_apply`; this module
covers the *table-function* shape with Spark 4's arrow-optimized Python
UDTFs — one input row, many output rows, lateral-joinable.

`SentenceSplitter` is the worked example (text → one row per sentence with
offsets): the shape a chunking stage in a training-data pipeline needs.
UDTFs run row-at-a-time in Python — keep them for genuinely tabular
expansions; array-returning built-ins + `explode` (see `text.shingles`)
stay JVM-side and are preferred where expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

__all__ = ["SentenceSplitter", "split_sentences"]


@udtf(returnType="sentence: string, sent_idx: int, sent_chars: int")
class SentenceSplitter:
    """Explode a document into sentences on [.!?] boundaries."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract
        if text is None:
            return
        import re

        parts = [p.strip() for p in re.split(r"[.!?]+", text)]
        idx = 0
        for p in parts:
            if p:
                yield p, idx, len(p)
                idx += 1


def split_sentences(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Lateral-join the UDTF against each document row."""
    return df.lateralJoin(
        SentenceSplitter(F.col(text_col).outer())
    ).select(id_col, "sentence", "sent_idx", "sent_chars")
