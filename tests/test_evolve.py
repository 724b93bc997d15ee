"""D3/D4 library evolution + M6 timestamp-width learning."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_merge_template():
    from loganalyzer_spark.operators.evolve import merge_template

    assert merge_template(["a", "b", "c"], ["a", "x", "c"]) == ["a", "<*>", "c"]


def test_cluster_templates_generalizes():
    from loganalyzer_spark.operators.evolve import cluster_templates

    lines = [
        ("Command: RETR file_1.dat", 10),
        ("Command: RETR file_2.dat", 8),
        ("Command: RETR file_3.dat", 5),
        ("Status: Disconnected from server", 3),
    ]
    out = cluster_templates(lines)
    assert "Command: RETR <*>" in out
    assert "Status: Disconnected from server" in out


def test_cluster_respects_threshold():
    """Dissimilar same-length lines stay separate clusters."""
    from loganalyzer_spark.operators.evolve import cluster_templates

    out = cluster_templates(
        [("Alpha: one two", 5), ("Beta: three four", 5)]
    )
    assert len(out) == 2


def test_evolve_library_distributed(spark):
    from loganalyzer_spark import datagen
    from loganalyzer_spark.operators import parse
    from loganalyzer_spark.operators.evolve import evolve_library

    lines = parse.mask(parse.wash(datagen.raw_lines(spark, SF_SMALL)))
    lib = evolve_library(spark, lines)
    templates = {r["event_template"] for r in lib.collect()}
    # the corpus's parameterized shapes must be generalized to <*>
    assert "Command: RETR <*>" in templates
    assert "Command: STOR <*>" in templates
    assert "Trace: Connecting to <*> port <*>" in templates


def test_learn_timestamp_offset(spark):
    """M6 end to end on the synthetic corpus: content starts at byte 28
    ('2022-06-22 HH:MM:SS pid s ' = 10+1+8+1+5+1+1+1), mirroring the
    reference's integration test (tests/integration/
    test_learn_timestamp.py:33 expects 24 for the ftp format)."""
    from loganalyzer_spark import datagen
    from loganalyzer_spark.operators.evolve import det_timestamp

    # label-free lines only: the learned offset is the *fixed* prefix
    lines = datagen.raw_lines(spark, SF_SMALL).filter(
        "is_abn = 0 AND is_seg = 0"
    )
    off = det_timestamp(
        spark, lines, datagen.templates_df(spark), max_line=200
    )
    assert off == 28
