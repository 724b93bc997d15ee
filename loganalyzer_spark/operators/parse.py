"""Parse stage: page → lines → washed content → masked content.

Re-expresses the reference's fused preprocess scan
(``preprocess_base.py:217-407``) as narrow column transformations that
Catalyst whole-stage-codegen fuses back into one pass:

  P1  timestamp match/strip        (preprocess_base.py:272-309)
  P2  console/pid/sid cleanup      (extensions/ftp/preprocess.py:47-49)
  P6  response-status normalize    (extensions/ftp/preprocess.py:30-37)
  P4  line removal (PTN_LINE_RM)   (extensions/cm/preprocess.py:76-82)
  P3  empty-line removal           (preprocess_base.py:344-370)
  P5  token splitting              (preprocess_base.py:376, :807-826)
  P9  'abn: ' label extraction     (preprocess_base.py:508-552)
  P10 'segsign: ' segmentation     (preprocess_base.py:684-731)
  P7  hard-parameter masking       (drain.py:880-887) — pandas UDF running
      the reference's own Python ``re`` patterns, because Java regex and
      Python re disagree on corner cases; this is the byte-identical
      per-url invariant surface.

Stage order matches the reference main loop (preprocess_base.py:217-407):
strip ts → domain line process (clean chars, response normalize, line
removal marking) → empty-line purge → token splitting.

Labels are extracted *before* filtering, so the reference's
label-handover machinery (preprocess_base.py:101-113) is unnecessary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from loganalyzer_spark import patterns as P

# Anchored standard-timestamp pattern (Java-regex safe: no lookaround).
_TS_ANCHOR = "^" + P.SQL_STD_TS
# pid/sid cleanup — Java regex supports lookahead; IGNORECASE flag as (?i)
# to match the reference's re.IGNORECASE (ftp/patterns.py:33-40).
_CLEAN_CHAR = r"(?i)\d+ \d (?=[A-Z][a-z]+: )"
# P4 line removal: the reference uses ``.match`` (anchored at 0); the
# Python-re alternation is Java-compatible verbatim, so share the text.
_LINE_RM_ANCHOR = "^(?:" + P.PTN_LINE_RM.pattern + ")"


def _split_tokens_expr(col) -> Column:
    """P5 Java fast path: the reference's split_token_apart degenerates
    to a global sub because every pattern matches constant literal text
    (see patterns.split_tokens); Java regexp_replace chain with the
    same lookarounds, byte-identity proven in tests/test_wash_fidelity.
    Order: left patterns in list order, then right (preprocess_base.py
    :807-826)."""
    e = F.regexp_replace(col, r"=(?=[^= \r\n])", "= ")
    e = F.regexp_replace(e, r"\:\:(?=[a-zA-Z_]{3,})", ":: ")
    e = F.regexp_replace(e, r"\((?=(\w|[-+]))", "( ")
    e = F.regexp_replace(e, r"(?<=\w)\)", " )")
    return e


def _normalize_response_expr(col) -> Column:
    """P6: first anchored match rewrites the whole line (ftp/preprocess
    .py:30-37); when() chain preserves the reference's first-match-wins
    break. Gated behind a cheap ``startswith('Response: ')`` so the 4
    rlikes only run on response lines (~10-15 % of a corpus); the gate
    is exact because every PTN_RSP_STAT pattern starts with that
    literal."""
    e = F.col(col) if isinstance(col, str) else col
    out = None
    for ptn, canonical in P.PTN_RSP_STAT:
        assert ptn.pattern.startswith("Response: ")
        cond = e.rlike("^" + ptn.pattern)
        out = (
            F.when(cond, F.lit(canonical))
            if out is None
            else out.when(cond, F.lit(canonical))
        )
    return F.when(e.startswith("Response: "), out.otherwise(e)).otherwise(e)


# Each split pattern can only fire on a line containing its literal
# anchor char ('=', '::', '(' and ')' — the lookarounds are zero-width),
# so a line containing none of them is a fixed point of the whole P5
# chain. contains() compiles to UTF8String.contains (substring scan, no
# regex), so gating the 4 regexp_replace passes behind it skips the
# regex machinery for the majority of corpus lines.
_SPLIT_GATE_LITS = ("=", "::", "(", ")")


def _split_gate_cond(e: Column) -> Column:
    gate = None
    for lit in _SPLIT_GATE_LITS:
        c = e.contains(lit)
        gate = c if gate is None else gate | c
    return gate


def _content_expr(col) -> Column:
    """Fused P6→P5 content expression over a (cheap) column reference.

    Reference order is normalize-response THEN split (preprocess_base
    .py:376 after ftp/preprocess.py:30-37). The canonical response
    strings are proven fixed points of split_tokens at import time, so
    a canonical hit folds the whole P5 chain away; every other line
    runs P5 only when the split gate says a pattern can fire. The
    split chain appears in two branches of the expression tree, but
    each row evaluates exactly one branch, and the duplicated leaves
    are plain attribute refs — no re-computation (CLAUDE.md's
    no-cross-operator-CSE hazard applies to filters, not when()).
    """
    e = F.col(col) if isinstance(col, str) else col
    split_gated = F.when(_split_gate_cond(e), _split_tokens_expr(e)).otherwise(e)
    rsp = None
    for ptn, canonical in P.PTN_RSP_STAT:
        folded = P.split_tokens(canonical)
        assert folded == canonical, f"canonical not a P5 fixed point: {canonical!r}"
        cond = e.rlike("^" + ptn.pattern)
        rsp = (
            F.when(cond, F.lit(folded))
            if rsp is None
            else rsp.when(cond, F.lit(folded))
        )
    return F.when(
        e.startswith("Response: "), rsp.otherwise(split_gated)
    ).otherwise(split_gated)


# Cheap first-character gate for the PTN_LINE_RM filter: every branch of
# the alternation can only match a line starting with one of these
# characters (by inspection of cm/patterns.py:79-103 — asterisk/plus
# banners, BCM/RAM/RCC/TCC/Readback/DHCPc/Type/Suboption/Len/msg/
# eptAsyncCmd/fUsSetsState literals, '='/'<'/'(' separators, space-
# indented dsid/munged/hex-dump forms, '\\d+\\*'). The gate skips the
# 25-branch regex for the ~60 % of lines that start with any other
# character; tests/test_wash_fidelity.py checks the gated condition
# against Python ``.match`` on adversarial lines.
_LINE_RM_FIRST = list("*BR+TDf mSeL<=(") + [str(d) for d in range(10)]


def _line_rm_cond(col) -> Column:
    e = F.col(col) if isinstance(col, str) else col
    return F.substring(e, 1, 1).isin(_LINE_RM_FIRST) & e.rlike(_LINE_RM_ANCHOR)


def pages_to_lines(pages: DataFrame) -> DataFrame:
    """input_hint-shaped web_pages → one row per physical line.

    posexplode keeps the in-page line order as an explicit column —
    Spark guarantees no implicit row order, so every downstream
    order-sensitive op keys on (doc/url, line_no).
    """
    cols = [c for c in ("doc_id", "url", "warc_ts", "lang") if c in pages.columns]
    return pages.select(
        *cols, F.posexplode(F.split("text", "\n")).alias("line_no", "raw")
    )


def wash(lines: DataFrame, raw: str = "raw") -> DataFrame:
    """P1/P2/P3/P9/P10 as pure column expressions (one codegen stage).

    The anchored timestamp regex is evaluated ONCE per line
    (regexp_extract of the whole matched prefix); flags, class label and
    the stripped content all derive from that prefix with cheap string
    ops. The naive form (one rlike/replace per derived column) re-scans
    every line with the anchor regex ~6x — measured at ~2x the wash
    stage cost on the 18M-line corpus.
    """
    # prefix = "<ts> [abn: ][segsign: ][cNNN ]" or "" when no ts matches;
    # label markers can only occur inside the matched prefix, so
    # contains() on the prefix is exact.
    return (
        lines.withColumn("_pfx", F.regexp_extract(raw, _TS_ANCHOR, 0))
        .withColumn("has_ts", (F.col("_pfx") != "").cast("int"))
        .withColumn("is_abn", F.col("_pfx").contains("abn: ").cast("int"))
        .withColumn("is_seg", F.col("_pfx").contains("segsign: ").cast("int"))
        .withColumn("class_label", F.regexp_extract("_pfx", "(c[0-9]{3} )$", 1))
        .withColumn("_stripped", F.expr(f"substring({raw}, length(_pfx) + 1)"))
        # P3 empty purge FIRST, on _stripped: clean/rsp preserve
        # emptiness both ways (clean needs a 'Word: ' lookahead, rsp
        # needs 'Response: ...'), so testing before them is equivalent
        # to the reference's post-domain-process check — and keeps this
        # filter's pushed-down predicate a cheap btrim, not a copy of
        # the whole wash chain. (Filter pushdown inlines each filter
        # condition's full expression tree, and Spark has no cross-
        # operator CSE: the naive filter-on-_normed form evaluated the
        # clean+rsp chain 3x per row — measured 15.5 s vs 6 s e2e.)
        .filter(F.length(F.expr("btrim(_stripped, ' \t')")) > 0)
        .withColumn("_cleaned", F.regexp_replace("_stripped", _CLEAN_CHAR, ""))
        # P4 line removal on _cleaned (reference order: after clean,
        # where pid/sid stripping can expose a removable line). Testing
        # before rsp is equivalent: no rsp source or canonical line
        # matches any PTN_LINE_RM branch (they all start 'Response: ',
        # which no branch accepts).
        .filter(~_line_rm_cond("_cleaned"))
        # P6 then P5 in one single-consumer chain — evaluated once.
        .withColumn("content", _content_expr("_cleaned"))
        .drop("_pfx", "_stripped", "_cleaned")
    )


@F.pandas_udf(T.StringType())
def mask_params_udf(content: pd.Series) -> pd.Series:
    """P7: ordered Python-re masking, vectorized over Arrow batches.

    Exactly the reference's chain (drain.py:880-887 applying
    PTN_HARD_PARA from extensions/ftp/patterns.py:118-124).
    """
    s = content
    for ptn, repl in P.PTN_HARD_PARA:
        s = s.str.replace(ptn, repl, regex=True)
    return s


@F.pandas_udf(T.StringType())
def mask_params_cm_udf(content: pd.Series) -> pd.Series:
    """P7/P12 cm tier: the cable-modem extension's ordered chain
    (extensions/cm/patterns.py:341-352 applied like drain.py:880-887),
    vectorized over Arrow batches. Pandas-UDF only — the reference's
    IPv6 pattern uses `{,n}` quantifiers Java regex treats as literal
    text, so there is deliberately no JVM rewrite of this tier."""
    s = content
    for ptn, repl in P.PTN_HARD_PARA_CM:
        s = s.str.replace(ptn, repl, regex=True)
    return s


def mask_cm(lines: DataFrame, content: str = "content") -> DataFrame:
    return lines.withColumn("masked", mask_params_cm_udf(F.col(content)))


def masked_sql_expr(col: str) -> Column:
    """JVM-side masking (RE2/Java-safe rewrites) — the fast path.

    tests/test_mask_fidelity.py proves byte-equality with
    ``mask_params_udf`` on the corpus; the pandas UDF remains the
    reference-fidelity fallback for pattern sets where Java regex
    semantics diverge.
    """
    # Sequential passes, deliberately NOT merged into one alternation:
    # A/B measurement (3 reps, local[8], 18M lines) shows the merged
    # (?:ctime)|(?:ipv4)|(?:mac) pattern ~10% SLOWER — single-pattern
    # passes keep Java regex's literal-prefix scan optimizations that a
    # top-level alternation defeats.
    e = F.regexp_replace(col, P.SQL_CTIME, "<*>")
    e = F.regexp_replace(e, P.SQL_IPV4, "<*>")
    e = F.regexp_replace(e, P.SQL_MAC, "<*>")
    e = F.regexp_replace(e, P.SQL_TIME_24H, " <*>$5")
    e = F.regexp_replace(e, P.SQL_BARE_INT, " <*> ")
    return e


def mask(lines: DataFrame, content: str = "content", jvm: bool = True) -> DataFrame:
    masked = masked_sql_expr(content) if jvm else mask_params_udf(F.col(content))
    return lines.withColumn("masked", masked)


def sessionize(lines: DataFrame, part: str = "doc_id", order: str = "line_no") -> DataFrame:
    """P10: running sum of boundary flags → session_id within a partition.

    The reference derives session sizes with a sequential scan
    (preprocess_base.py:684-731); a window running-sum is the
    shuffle-minimal Spark equivalent (partitioned by document, so it
    scales — no global ordering).
    """
    w = Window.partitionBy(part).orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    return lines.withColumn("session_id", F.sum("is_seg").over(w))
