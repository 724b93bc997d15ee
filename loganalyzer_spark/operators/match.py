"""Template matching — Drain's tree search + similarity re-expressed as a
broadcast join (SURVEY.md §2.4).

The reference routes each masked line through a 3-layer parse tree
(length → first/last token → similarity, ``drain.py:182-291``) and picks
the most similar cluster (``fast_match`` ``drain.py:474-505``). Here:

  D1 tree search    → broadcast hash join on (token_count, first_token),
                      plus a wildcard bucket for templates whose first
                      token is '<*>' (token_tree_search's fallback,
                      drain.py:268-284).
  D2 similarity     → candidate templates are pre-grouped per join key
                      into an array on the (tiny) dimension side, so
                      match resolution is a per-row array filter —
                      **zero shuffle**, no per-line groupBy/window.
  D8 new template   → unmatched lines become their own template:
                      event_id = md5(masked)[:8] (drain.py:732, 962-966).

Candidate preference on multi-match mirrors fast_match's tie-break
(max similarity, then max parameter count, drain.py:494-505): templates
whose anchored token-regex fully matches have similarity 1.0, so
ordering by (para_count desc, event_id) is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cands_dim(templates: DataFrame, wildcard: bool) -> DataFrame:
    """Group the template dim by join key with a deterministic preference
    order inside each candidate array (neg_para asc == para_count desc)."""
    t = templates.withColumn("neg_para", -F.col("para_count"))
    keys = ["token_count"] if wildcard else ["token_count", "first_token"]
    if wildcard:
        t = t.filter(F.col("first_token") == "<*>")
    else:
        t = t.filter(F.col("first_token") != "<*>")
    return t.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct("neg_para", "event_id", "match_regex", "event_template")
            )
        ).alias("cands")
    )


def match_templates(
    lines: DataFrame, templates: DataFrame, masked: str = "masked"
) -> DataFrame:
    """Assign event_id/event_template to every line.

    Adds: token_count, first_token, event_id, event_template, is_new.
    The two dimension joins are broadcast; match resolution is an array
    filter per row — the whole stage is shuffle-free.
    """
    exact = _cands_dim(templates, wildcard=False)
    wild = _cands_dim(templates, wildcard=True)

    out = (
        lines.withColumn("_toks", F.split(masked, " "))
        .withColumn("token_count", F.size("_toks"))
        .withColumn("first_token", F.col("_toks")[0])
        .drop("_toks")
        .join(F.broadcast(exact), ["token_count", "first_token"], "left")
        .join(
            F.broadcast(wild.withColumnRenamed("cands", "wcands")),
            ["token_count"],
            "left",
        )
        .withColumn(
            "_all_cands",
            F.concat(
                F.coalesce("cands", F.array()), F.coalesce("wcands", F.array())
            ),
        )
        .withColumn(
            "_hit",
            F.expr(
                f"get(filter(_all_cands, c -> {masked} rlike c.match_regex), 0)"
            ),
        )
        .withColumn("is_new", F.col("_hit").isNull().cast("int"))
        .withColumn(
            "event_id",
            F.coalesce(
                F.col("_hit.event_id"), F.substring(F.md5(F.col(masked)), 1, 8)
            ),
        )
        .withColumn(
            "event_template",
            F.coalesce(F.col("_hit.event_template"), F.col(masked)),
        )
        .drop("cands", "wcands", "_all_cands", "_hit")
    )
    return out


def extract_params(df: DataFrame, masked: str = "masked") -> DataFrame:
    """D7: parameter extraction via zip_with — pure SQL, no UDF.

    Reference: take content tokens at the template's '<*>' positions,
    guarded by equal token counts (oldschool.py:100-108).
    """
    return df.withColumn(
        "params",
        F.when(
            F.size(F.split("event_template", " ")) == F.size(F.split(masked, " ")),
            F.expr(
                f"filter(zip_with(split(event_template, ' '), split({masked}, ' '),"
                " (t, c) -> struct(t as t, c as c)), x -> x.t = '<*>').c"
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
