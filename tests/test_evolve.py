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


# ---------------------------------------------------------------------------
# D5: LCS output-cell merge (drain.py:662-719) — faithful scalar mirror
# of the reference's Logcluster/Ouputcell object loop as the oracle.
# ---------------------------------------------------------------------------


def _lcs_mirror(seq1, seq2):
    # transcribed contract of drain.py:662-688 (independent expression)
    dp = [[0] * (len(seq2) + 1) for _ in range(len(seq1) + 1)]
    for i in range(1, len(seq1) + 1):
        for j in range(1, len(seq2) + 1):
            dp[i][j] = (
                dp[i - 1][j - 1] + 1
                if seq1[i - 1] == seq2[j - 1]
                else max(dp[i][j - 1], dp[i - 1][j])
            )
    out, i, j = [], len(seq1), len(seq2)
    while i and j:
        if dp[i][j] == dp[i - 1][j]:
            i -= 1
        elif dp[i][j] == dp[i][j - 1]:
            j -= 1
        else:
            out.insert(0, seq1[i - 1])
            i, j = i - 1, j - 1
    return out


def _reference_merge_partition(templates, sim_t_m):
    """Scalar mirror of adjust_output_cell (drain.py:689-719) with the
    reference's cell/parent object semantics, each cluster playing the
    'just updated' role once in list order. Returns the partition of
    template indices into merged output cells."""

    class Cell:
        def __init__(self, idx):
            self.ids = [idx]
            self.parents = []

    class Clust:
        def __init__(self, toks, cell):
            self.toks = toks
            self.outcell = cell

    clusts = []
    for idx, t in enumerate(templates):
        cell = Cell(idx)
        cl = Clust(t.split(" "), cell)
        cell.parents.append(cl)
        clusts.append(cl)

    for cl in clusts:
        similar, best_lcs, sim = None, [], -1.0
        for cur in clusts:
            if len(cur.toks) == len(cl.toks) or cur.outcell is cl.outcell:
                continue
            cur_lcs = _lcs_mirror(cl.toks, cur.toks)
            cur_sim = float(len(cur_lcs)) / min(len(cl.toks), len(cur.toks))
            if cur_sim > sim or (cur_sim == sim and len(cur_lcs) > len(best_lcs)):
                similar, best_lcs, sim = cur, cur_lcs, cur_sim
        if similar is not None and sim > sim_t_m:
            similar.outcell.ids += cl.outcell.ids
            removed = cl.outcell
            for parent in removed.parents:
                similar.outcell.parents.append(parent)
                parent.outcell = similar.outcell
    return {frozenset(c.outcell.ids) for c in clusts}


_MERGE_CORPUS = [
    # chains + ties + same-length exclusions, all lengths distinct
    # where merging is expected
    "Connection closed by peer <*>",
    "Connection closed by peer <*> port <*>",        # sim 5/5 vs above? no: 5 vs 7 toks, lcs 5, min 5 -> 1.0
    "Connection closed",
    "Transfer complete for <*>",
    "Transfer complete for <*> in <*> seconds",
    "Auth failure from <*>",
    "Auth failure from <*> user <*> attempt <*>",
    "Totally unrelated line here now",
    "Short one",
]


def test_lcs_kernel_matches_reference_recipe():
    from loganalyzer_spark.operators.evolve import lcs

    a = "Connection closed by peer <*>".split(" ")
    b = "Connection closed by peer <*> port <*>".split(" ")
    assert lcs(a, b) == a
    assert lcs(b, a) == a
    assert lcs(["x"], ["y"]) == []
    assert lcs([], ["y"]) == []
    # interleaved subsequence, not substring
    assert lcs(list("AXBYCZ"), list("ABC")) == ["A", "B", "C"]


def test_lcs_merge_cells_partition_parity():
    from loganalyzer_spark.datagen import event_id_of
    from loganalyzer_spark.operators.evolve import lcs_merge_cells

    for sim_t_m in (0.5, 0.7, 0.9, 1.0):
        expect = _reference_merge_partition(_MERGE_CORPUS, sim_t_m)
        got_map = lcs_merge_cells(_MERGE_CORPUS, sim_t_m)
        eids = [event_id_of(t) for t in _MERGE_CORPUS]
        cells = {}
        for i, e in enumerate(eids):
            cells.setdefault(got_map[e], set()).add(i)
        got = {frozenset(v) for v in cells.values()}
        assert got == expect, (sim_t_m, got, expect)
    # sim_t_m=1.0 is the reference's shipped default: NO merges
    assert _reference_merge_partition(_MERGE_CORPUS, 1.0) == {
        frozenset([i]) for i in range(len(_MERGE_CORPUS))
    }


def test_lcs_merge_on_static_library():
    """At 0.7 the static dim merges exactly the File-not-found /
    File-status response pair (LCS 3 / min-len 4 = 0.75); every other
    cross-length pair sits below threshold."""
    from loganalyzer_spark.datagen import event_id_of, template_rows
    from loganalyzer_spark.operators.evolve import lcs_merge_cells

    templates = [r[1] for r in template_rows()]
    mapping = lcs_merge_cells(templates, 0.7)
    a = event_id_of("Response: <*> File not found")
    b = event_id_of("Response: <*> File status")
    assert mapping[a] == mapping[b] == min(a, b)
    merged = [e for e, c in mapping.items() if e != c]
    assert merged in ([a], [b])  # exactly one absorbed template
