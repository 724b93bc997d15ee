"""Regex surface of the engine.

Two tiers:

1. ``PTN_*`` — Python ``re`` objects that reproduce the reference's
   parameter-masking and label semantics exactly (the per-row invariant is
   byte-identical masked text). These run inside vectorized pandas UDFs
   (``Series.str.replace``), never per-row Python, because Python ``re``
   and Java regex disagree on corner cases (SURVEY.md §4.4).

   Sources in /root/reference:
     - analyzer/utils/misc_regex.py:15-34   (ctime, MAC, IPv4)
     - analyzer/extensions/ftp/patterns.py:99-122  (PTN_HARD_PARA order)
     - analyzer/extensions/ftp/patterns.py:19-30   (standard ts + labels)
     - analyzer/preprocess/patterns.py:15-48       (labels, nested, empty)

2. ``SQL_*`` — RE2-compatible rewrites of the same patterns for DuckDB
   oracles and, where byte-equivalent, Spark ``regexp_replace``. The
   equivalence is *tested* (tests/test_mask_fidelity.py), not assumed.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Tier 1 — reference-faithful Python re (masking stage, pandas UDF side)
# ---------------------------------------------------------------------------

# misc_regex.py:15-21 — libc ctime timestamps, e.g. "Mon Jun 20 14:42:53 2022"
PTN_LIBC_CTIME = re.compile(
    r"(Mon|Tue|Wed|Thu|Fri|Sat|Sun) "
    r"(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) "
    r"(([0-2]\d)|(3[0-1])) "
    r"(([01]\d|2[0-3]):([0-5]\d):([0-5]\d)|24:00:00) \d{4}"
)

# misc_regex.py:28-30 — MAC address
PTN_MAC_ADDR = re.compile(r"([A-Fa-f0-9]{1,2}\:){5}[A-Fa-f0-9]{1,2}")

# misc_regex.py:32-34 — IPv4 (with optional leading slash / trailing port/colon)
PTN_IP_V4 = re.compile(r"(/|)([0-9]+\.){3}[0-9]+(:[0-9]+|)(:|)")

# ftp/patterns.py:104-107 — bare 24h time token bounded by spaces/line end
PTN_TIME_24H = re.compile(
    r"(?<= )(([01]\d|2[0-3]):([0-5]\d):([0-5]\d)|24:00:00)(?= |$)"
)

# ftp/patterns.py:109-116 — isolated integer token
PTN_BARE_INT = re.compile(r" \d+ ")

# ftp/patterns.py:118-124 — masking order matters (dict order preserved)
PTN_HARD_PARA: list[tuple[re.Pattern, str]] = [
    (PTN_LIBC_CTIME, "<*>"),
    (PTN_IP_V4, "<*>"),
    (PTN_MAC_ADDR, "<*>"),
    (PTN_TIME_24H, "<*>"),
    (PTN_BARE_INT, " <*> "),
]

# ftp/patterns.py:19-30 — standard leading timestamp + optional labels
PTN_STD_TS = re.compile(
    r"\d{4}-\d{2}-\d{2} (([01]\d|2[0-3]):([0-5]\d):([0-5]\d)|24:00:00) "
    r"(abn: )?(segsign: )?(c[0-9]{3} )?"
)

# preprocess/patterns.py:35-38
PTN_ABN_LABEL = re.compile(r"abn: ")
# preprocess/patterns.py:15-18
PTN_SEG_LABEL = re.compile(r"(segsign: )|(c[0-9]{3} )")
# preprocess/patterns.py:40-43 — nested (continuation) line starts with blank
PTN_NESTED_LINE = re.compile(r"^( +|\t+)")
# preprocess/patterns.py:45-48
PTN_EMPTY_LINE = re.compile(r"^[ \t]*$")

# ftp/patterns.py:63-79 — token splitting (insert space after '='/'::'/'(' etc.)
PTN_SPLIT_LEFT = [
    re.compile(r"=(?=[^= \r\n])"),
    re.compile(r"\:\:(?=[a-zA-Z_]{3,})"),
    re.compile(r"\((?=(\w|[-+]))"),
]
PTN_SPLIT_RIGHT = [re.compile(r"(?<=\w)\)")]

# ftp/patterns.py:128-136 — special tokens that must match exactly between
# a log and a candidate template (anti-over-parsing guard in seq_dist,
# drain.py:430-446)
PTN_SPEC_TOKEN = [
    re.compile(r"[a-zA-Z_]+::"),
    re.compile(r"[a-zA-Z_]+\(\)"),
    re.compile(r"[a-zA-Z_]+\("),
]


def mask_params(line: str) -> str:
    """Reference masking semantics: ordered re.sub chain (drain.py:880-887)."""
    for ptn, repl in PTN_HARD_PARA:
        line = ptn.sub(repl, line)
    return line


# ---------------------------------------------------------------------------
# Tier 2 — RE2/DuckDB-compatible rewrites (for oracle SQL)
# ---------------------------------------------------------------------------
# RE2 has no lookaround; PTN_TIME_24H is rewritten with capture groups. The
# rewrite consumes the trailing boundary, so *adjacent* maskable time tokens
# would diverge from Python re; test inputs guarantee isolation and
# tests/test_mask_fidelity.py asserts byte equality on the generated corpus.

SQL_CTIME = (
    "(Mon|Tue|Wed|Thu|Fri|Sat|Sun) "
    "(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) "
    "(([0-2]\\d)|(3[0-1])) "
    "(([01]\\d|2[0-3]):([0-5]\\d):([0-5]\\d)|24:00:00) \\d{4}"
)
SQL_MAC = "([A-Fa-f0-9]{1,2}:){5}[A-Fa-f0-9]{1,2}"
SQL_IPV4 = "(/|)([0-9]+\\.){3}[0-9]+(:[0-9]+|)(:|)"
SQL_TIME_24H = " (([01]\\d|2[0-3]):([0-5]\\d):([0-5]\\d)|24:00:00)( |$)"
SQL_BARE_INT = " \\d+ "


def duckdb_mask_expr(col: str) -> str:
    """DuckDB expression computing the same masked text as mask_params().

    Nested regexp_replace chain in PTN_HARD_PARA order ('g' = global, like
    re.sub). The time-24h rewrite re-emits the consumed boundary via \\5.
    """
    e = col
    e = f"regexp_replace({e}, '{SQL_CTIME}', '<*>', 'g')"
    e = f"regexp_replace({e}, '{SQL_IPV4}', '<*>', 'g')"
    e = f"regexp_replace({e}, '{SQL_MAC}', '<*>', 'g')"
    e = f"regexp_replace({e}, '{SQL_TIME_24H}', ' <*>\\5', 'g')"
    e = f"regexp_replace({e}, '{SQL_BARE_INT}', ' <*> ', 'g')"
    return e


# Standard timestamp + labels, RE2 form (no lookaround needed — identical).
SQL_STD_TS = (
    "\\d{4}-\\d{2}-\\d{2} (([01]\\d|2[0-3]):([0-5]\\d):([0-5]\\d)|24:00:00) "
    "(abn: )?(segsign: )?(c[0-9]{3} )?"
)
