"""M3: block remove/indent state machines (extensions/cm/preprocess.py:
48-189 — start/end regex pairs delete whole blocks of lines).

Two equivalent Spark expressions:

* ``remove_blocks`` — window form: in-block state is
  ``last(marker, ignorenulls)`` over the document order (SURVEY §2.3
  M3), where start lines emit marker=1 and end lines marker=0. This is
  exactly the reference's *non-stacking* machine: a second start inside
  a block re-asserts state 1 (no nesting), a stray end outside a block
  re-asserts 0. Start/end/in-block lines are all removed (the
  reference deletes blocks inclusive). Start/end patterns are assumed
  disjoint (they are in the reference's pattern pairs,
  extensions/cm/patterns.py:212-222).
* ``remove_blocks_pandas`` — ``applyInPandas`` per document running the
  literal sequential state machine (the fallback form SURVEY §2.3
  reserves for end-conditions Spark windows can't express, e.g. the
  channel-table reformat M4 whose end is "next primary line").

Both are tested equal (tests/test_blocks.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def remove_blocks(
    lines: DataFrame,
    start_pat: str,
    end_pat: str,
    content: str = "content",
    doc: str = "doc_id",
    order: str = "line_no",
) -> DataFrame:
    is_start = F.col(content).rlike(start_pat)
    is_end = F.col(content).rlike(end_pat)
    marker = F.when(is_start, 1).when(is_end, 0)
    w_prev = (
        Window.partitionBy(doc)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = lines.withColumn(
        "_state_prev",
        F.coalesce(F.last(marker, ignorenulls=True).over(w_prev), F.lit(0)),
    ).withColumn(
        "_removed",
        (F.col("_state_prev") == 1) | ((F.col("_state_prev") == 0) & is_start),
    )
    return df.filter(~F.col("_removed")).drop("_state_prev", "_removed")


def remove_blocks_pandas(
    lines: DataFrame,
    start_pat: str,
    end_pat: str,
    content: str = "content",
    doc: str = "doc_id",
    order: str = "line_no",
) -> DataFrame:
    """Literal per-document state machine via applyInPandas."""
    import re

    schema = lines.schema

    def machine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        sp, ep = re.compile(start_pat), re.compile(end_pat)
        keep = []
        in_block = False
        for c in pdf[content]:
            if not in_block and sp.search(c):
                in_block = True
                keep.append(False)
            elif in_block and ep.search(c):
                in_block = False
                keep.append(False)
            else:
                keep.append(not in_block)
        return pdf[pd.Series(keep, index=pdf.index)]

    return lines.groupBy(doc).applyInPandas(machine, schema)
