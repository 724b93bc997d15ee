"""M2: nested-line folding (reference ``preprocess_norm``,
preprocess_base.py:410-499).

Reference semantics: a line starting with whitespace (PTN_NESTED_LINE,
preprocess/patterns.py:40-43) is a continuation of the previous primary
line; continuations are appended with ``', '`` after ``rstrip`` of the
accumulated line and ``lstrip`` of the continuation; the primary line's
timestamp stays at the front.

Two Spark expressions of the same operator:

* ``fold_lines`` — general form over a line table: running-sum group id
  (window partitioned by document — scales, no global order) + grouped
  ordered concat.
* ``fold_page_text`` — narrow form when the input is page-shaped
  (input_hint ``text``): the fold runs *inside* the line array of each
  page via ``aggregate``, so it costs zero shuffles — the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NESTED = "^[ \t]"  # PTN_NESTED_LINE.match — leading blank ⇒ continuation


def _lstrip(c) -> F.Column:
    # Python str.lstrip() strips all whitespace; Spark ltrim only spaces.
    return F.regexp_replace(c, "^[ \t\r\n]+", "")


def _rstrip(c) -> F.Column:
    return F.regexp_replace(c, "[ \t\r\n]+$", "")


def fold_lines(
    lines: DataFrame,
    raw: str = "raw",
    doc: str = "doc_id",
    order: str = "line_no",
) -> DataFrame:
    """Window + grouped ordered concat. Output: one row per primary line
    (doc, fold_grp, line_no of primary, folded)."""
    df = lines.withColumn(
        "_prim", (~F.col(raw).rlike(NESTED)).cast("int")
    )
    w = (
        Window.partitionBy(doc)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    df = df.withColumn("fold_grp", F.sum("_prim").over(w))
    return (
        df.groupBy(doc, "fold_grp")
        .agg(
            F.min(order).alias(order),
            F.array_sort(
                F.collect_list(F.struct(F.col(order).alias("o"), F.col(raw).alias("r")))
            ).alias("_parts"),
        )
        .withColumn(
            "folded",
            F.concat_ws(
                ", ",
                F.transform(
                    "_parts",
                    lambda p, i: F.when(i == 0, _rstrip(p["r"])).otherwise(
                        _lstrip(_rstrip(p["r"]))
                    ),
                ),
            ),
        )
        .drop("_parts")
    )


def fold_text_array(col) -> F.Column:
    """Fold an array of physical lines into an array of folded lines —
    pure higher-order functions, evaluated per row (no shuffle).

    aggregate(): continuation lines merge into the last accumulator
    element; primaries append a new element.
    """
    return F.aggregate(
        col,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            x.rlike(NESTED) & (F.size(acc) > 0),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.concat(
                        _rstrip(F.element_at(acc, -1)),
                        F.lit(", "),
                        _lstrip(_rstrip(x)),
                    )
                ),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def fold_page_text(pages: DataFrame, text: str = "text") -> DataFrame:
    """Page-level fold: text → folded line array → posexplode.

    The whole M2 operator is a narrow projection here; at 100 TB this
    is the form to use (the window variant shuffles by doc_id).
    """
    keep = [c for c in pages.columns if c != text]
    return pages.select(
        *keep,
        F.posexplode(fold_text_array(F.split(F.col(text), "\n"))).alias(
            "fold_grp", "folded"
        ),
    )
