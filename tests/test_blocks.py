"""M3 block state machine: window form ≡ applyInPandas form."""

from __future__ import annotations

from tests.conftest import SF_SMALL

START = "^START$"
END = "^END$"


def _mk(spark, contents):
    rows = [(1, i, c) for i, c in enumerate(contents)]
    return spark.createDataFrame(rows, "doc_id long, line_no long, content string")


def _kept(df):
    return [r["line_no"] for r in df.orderBy("line_no").collect()]


def test_block_removal_basic(spark):
    from loganalyzer_spark.operators.blocks import remove_blocks, remove_blocks_pandas

    contents = ["a", "START", "x", "y", "END", "b", "START", "z", "END", "c"]
    df = _mk(spark, contents)
    w = _kept(remove_blocks(df, START, END))
    p = _kept(remove_blocks_pandas(df, START, END))
    assert w == p == [0, 5, 9]


def test_block_removal_no_stacking_and_stray_end(spark):
    """A second START inside a block does not nest; a stray END outside
    a block is an ordinary line (reference machine semantics,
    extensions/cm/preprocess.py:48-189)."""
    from loganalyzer_spark.operators.blocks import remove_blocks, remove_blocks_pandas

    contents = ["END", "a", "START", "START", "x", "END", "b", "START", "tail1", "tail2"]
    df = _mk(spark, contents)
    w = _kept(remove_blocks(df, START, END))
    p = _kept(remove_blocks_pandas(df, START, END))
    # stray END kept; inner START consumed; unclosed block removes tail
    assert w == p == [0, 1, 6]


def test_block_removal_on_corpus(spark):
    from loganalyzer_spark import datagen
    from loganalyzer_spark.operators.blocks import remove_blocks, remove_blocks_pandas

    lines = datagen.raw_lines(spark, SF_SMALL).select("doc_id", "line_no", "content")
    s, e = "^Status: Disconnected from server$", "^Response: 230 Login successful$"
    w = remove_blocks(lines, s, e).select("doc_id", "line_no")
    p = remove_blocks_pandas(lines, s, e).select("doc_id", "line_no")
    assert w.exceptAll(p).count() == 0 and p.exceptAll(w).count() == 0
