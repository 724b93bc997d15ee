"""Per-line parity against the ACTUAL reference implementation.

Drives the reference's Drain (imported read-only from /root/reference —
not copied) over the same washed lines our matcher sees, with the same
masking patterns and the same seeded template library, and asserts
100% per-line event-id agreement — including which lines both systems
flag as new templates.

This is the strongest form of the north rule's "matching the
reference's ... routed-row equality": not an oracle re-derivation but
the reference binary itself.
"""

from __future__ import annotations

import os
import sys
import types

import pytest

REFERENCE = "/root/reference"


def _import_reference_drain():
    if REFERENCE not in sys.path:
        sys.path.append(REFERENCE)
    # test_mask_fidelity injects a synthetic bare `analyzer` module to
    # load individual reference files; purge any such non-package
    # entries so the real /root/reference package imports cleanly.
    for name in sorted(k for k in sys.modules if k.split(".")[0] == "analyzer"):
        mod = sys.modules[name]
        if not str(getattr(mod, "__file__", "") or "").startswith(REFERENCE):
            del sys.modules[name]
    os.environ.setdefault("ANALYZER_DATA", "/tmp/loganalyzer_bench/ref_data")
    for sub in ("persist", "cooked", "train", "test"):
        os.makedirs(
            os.path.join(os.environ["ANALYZER_DATA"], sub), exist_ok=True
        )
    if "tqdm" not in sys.modules:  # not in this image; bar is off anyway
        fake = types.ModuleType("tqdm")

        class _T:
            def __init__(self, *a, **k):
                pass

            def update(self, *a):
                pass

            def close(self):
                pass

        fake.tqdm = _T
        sys.modules["tqdm"] = fake
    from analyzer.parser.drain import Drain, Para  # noqa: E402

    return Drain, Para


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not present"
)
def test_event_ids_match_reference_drain(spark, tmp_path):
    import pandas as pd

    from loganalyzer_spark import datagen
    from loganalyzer_spark.operators import match, parse
    from loganalyzer_spark.patterns import PTN_HARD_PARA, PTN_SPEC_TOKEN

    N = 3000
    sdf = (
        datagen.gen_raw_lines(spark, max(1, N // 9))
        .select("doc_id", "line_no", "raw")
        .limit(N)
    )
    washed_rows = (
        parse.wash(sdf)
        .select("doc_id", "line_no", "content")
        .orderBy("doc_id", "line_no")
        .collect()
    )

    # reference side: same washed content, same lib, same mask patterns
    Drain, Para = _import_reference_drain()
    lib_csv = str(tmp_path / "tmplt_lib.csv")
    trows = datagen.template_rows()
    pd.DataFrame(
        {
            "EventIdOld": [r[0] for r in trows],
            "EventId": [r[0] for r in trows],
            "EventTemplate": [r[1] for r in trows],
        }
    ).to_csv(lib_csv, index=False)
    para = Para(
        log_format="<Content>",
        rex={p: r for p, r in PTN_HARD_PARA},
        rex_s_token=list(PTN_SPEC_TOKEN),
        raw_file="synthetic",
        tmplt_lib=lib_csv,
        outdir=str(tmp_path / "ref_out") + "/",
        nopgbar=True,
        aim=True,
        intmdt=False,
        over_wr_lib=False,
        inc_updt=True,
    )
    drain = Drain(para, [r["content"] + "\n" for r in washed_rows])
    drain.main_process()
    ref_ids = drain.df_raws["EventIdOld"].tolist()

    # our side
    ours = (
        match.match_templates(
            parse.mask(parse.wash(sdf)), datagen.templates_df(spark)
        )
        .select("doc_id", "line_no", "event_id", "is_new")
        .orderBy("doc_id", "line_no")
        .collect()
    )

    assert len(ref_ids) == len(ours) > 0
    disagree = []
    for i, (rid, r) in enumerate(zip(ref_ids, ours)):
        if rid == "0":
            ok = r["is_new"] == 1  # both say: not in the library
        else:
            ok = r["event_id"] == rid
        if not ok:
            disagree.append((i, rid, r["event_id"], r["is_new"]))
    assert not disagree, f"{len(disagree)} mismatches, first: {disagree[:5]}"


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not present"
)
def test_evolved_templates_match_reference_drain(spark, tmp_path):
    """D3/D4: the offline batch library evolution must land on the SAME
    template set as the reference's online Drain clustering over the
    same lines (same lib seed, same masks)."""
    import pandas as pd

    from loganalyzer_spark import datagen
    from loganalyzer_spark.operators import evolve, parse
    from loganalyzer_spark.patterns import PTN_HARD_PARA, PTN_SPEC_TOKEN

    N = 3000
    sdf = (
        datagen.gen_raw_lines(spark, max(1, N // 9))
        .select("doc_id", "line_no", "raw")
        .limit(N)
    )
    washed = parse.wash(sdf).select("doc_id", "line_no", "content").orderBy(
        "doc_id", "line_no"
    )

    Drain, Para = _import_reference_drain()
    lib_csv = str(tmp_path / "lib.csv")
    trows = datagen.template_rows()
    pd.DataFrame(
        {
            "EventIdOld": [r[0] for r in trows],
            "EventId": [r[0] for r in trows],
            "EventTemplate": [r[1] for r in trows],
        }
    ).to_csv(lib_csv, index=False)
    para = Para(
        log_format="<Content>",
        rex={p: r for p, r in PTN_HARD_PARA},
        rex_s_token=list(PTN_SPEC_TOKEN),
        raw_file="synthetic",
        tmplt_lib=lib_csv,
        outdir=str(tmp_path / "out") + "/",
        nopgbar=True,
        aim=True,
        intmdt=False,
        over_wr_lib=False,
        inc_updt=True,
    )
    drain = Drain(para, [r["content"] + "\n" for r in washed.collect()])
    drain.main_process()
    ref_templates = set(drain.df_tmplts["EventTemplate"].tolist())

    ours = evolve.evolve_library(
        spark,
        parse.mask(washed, content="content"),
        base_templates=datagen.templates_df(spark),
    )
    our_templates = {
        r["event_template"] for r in ours.select("event_template").collect()
    }
    assert our_templates == ref_templates and ref_templates
