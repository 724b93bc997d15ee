"""Text-analysis operators for the documents corpus: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure column expressions (JVM-side, whole-stage codegen); the
hashes are md5-derived so every operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword-ratio
# language heuristic. Deliberately small and deterministic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "no", "por"],
}


def _tokens(text: str) -> F.Column:
    return F.split(F.lower(F.col(text)), "\\s+")


def token_stats(docs: DataFrame, text: str = "text") -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword estimate
    (ceil(chars/4) is the common ~4-chars/token heuristic)."""
    toks = _tokens(text)
    return docs.withColumn("n_tokens", F.size(toks)).withColumn(
        "n_subwords",
        F.ceil(F.length(F.col(text)).cast("double") / 4).cast("long"),
    )


def quality_score(docs: DataFrame, text: str = "text") -> DataFrame:
    """Quality heuristics: length, punctuation ratio, stopword ratio,
    mean word length; score = weighted combination in [0, 1]-ish."""
    toks = _tokens(text)
    n_chars = F.length(F.col(text))
    n_punct = n_chars - F.length(F.regexp_replace(text, "[\\.,;:!\\?]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_toks = F.size(toks)
    mean_len = F.when(
        n_toks > 0, (n_chars - (n_toks - 1)).cast("double") / n_toks
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_toks > 0, n_stop.cast("double") / n_toks).otherwise(
        F.lit(0.0)
    )
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(
        F.lit(0.0)
    )
    # The blend consumes the ROUNDED ratio columns (the same values the
    # output exposes), so the exact-hash oracle can reproduce the score
    # bit-for-bit — blending unrounded intermediates diverges in the 6th
    # decimal whenever rounding moves a ratio across a ulp boundary.
    out = (
        docs.withColumn("n_toks", n_toks)
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stop_ratio", F.round(stop_ratio, 6))
        .withColumn("mean_word_len", F.round(mean_len, 6))
    )
    score = (
        F.least(F.col("n_toks").cast("double") / 50, F.lit(1.0)) * 0.4
        + F.least(F.col("stop_ratio") * 5, F.lit(1.0)) * 0.3
        + (1 - F.least(F.col("punct_ratio") * 10, F.lit(1.0))) * 0.2
        + F.least(F.col("mean_word_len") / 8, F.lit(1.0)) * 0.1
    )
    return out.withColumn("quality", F.round(score, 6))


def lang_id(docs: DataFrame, text: str = "text") -> DataFrame:
    """Stopword-hit language heuristic: argmax over per-language hit
    counts, 'und' (undetermined) when all are zero. Ties break by
    language code order for determinism."""
    toks = _tokens(text)
    def contains(arr):
        return lambda t: F.array_contains(arr, t)

    hit_cols = []
    for lang, words in sorted(STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hit_cols.append(
            F.struct(
                F.size(F.filter(toks, contains(arr))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*hit_cols))
    return docs.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    ).withColumn("lang_hits", best["hits"])


def fingerprint(docs: DataFrame, text: str = "text", k: int = 4) -> DataFrame:
    """Document fingerprint: min-hash of character k-gram window hashes
    over the normalized text (winnowing-lite / rolling-hash family).

    fingerprint = min over i of H(substr(norm_text, i, k)); H = 60-bit
    md5 prefix. Deterministic, engine-independent.

    The normalized text is materialized as its own column FIRST: an
    expression inlined into a ``transform`` lambda re-evaluates PER
    ELEMENT — with the regexp_replace inside the gram lambda the scan
    re-ran the regex over the whole document once per gram position
    (O(chars²) per row; measured 10.4 s → ~0.5 s at sf0.1). Multiple
    non-cheap uses of ``_norm`` also stop CollapseProject from
    re-inlining it.
    """
    from loganalyzer_spark.operators import free_col

    nc = free_col(docs, "_norm")
    normed = docs.withColumn(
        nc, F.regexp_replace(F.lower(F.col(text)), "[^a-z0-9]", "")
    )
    grams = F.expr(
        f"CASE WHEN length(`{nc}`) < {k} THEN array(`{nc}`) "
        f"ELSE transform(sequence(1, length(`{nc}`) - {k} + 1), "
        f"i -> substring(`{nc}`, i, {k})) END"
    )
    fp = F.array_min(
        F.transform(
            grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
        )
    )
    return (
        normed.withColumn("norm_len", F.length(nc))
        .withColumn("fingerprint", fp)
        .drop(nc)
    )


def repetition_stats(docs: DataFrame, text: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals, all per-doc column
    expressions (zero shuffle — no explode/groupBy per token):

    * ``distinct_ratio`` — type/token ratio, size(distinct)/size.
    * ``top_tok_frac`` — fraction of tokens equal to the single most
      frequent token. The per-doc mode count is the longest equal run
      over ``sort_array(tokens)`` computed with the ``aggregate``
      higher-order function — the distributed-SQL re-expression of the
      reference-era "Counter(tokens).most_common(1)" driver loop, and
      it stays inside whole-stage codegen instead of exploding 100 TB
      of tokens into a groupBy.
    * ``dup_bigram_frac`` — fraction of adjacent-token bigrams that are
      repeats (1 - distinct/total), the Gopher duplicate-n-gram filter.

    Scale: embarrassingly parallel scan; cost is O(tokens log tokens)
    per row for the sort, no exchange anywhere. Tokens are materialized
    as a column first — ``element_at(toks, i)`` with the split inlined
    inside the bigram lambda re-tokenized the whole document TWICE per
    bigram position (O(tokens²) per row; the dominant cost of the r4
    quality_filter wall).
    """
    from loganalyzer_spark.operators import free_col

    tc = free_col(docs, "_toks")
    toked = docs.withColumn(tc, _tokens(text))
    toks = F.col(tc)
    n = F.size(toks)
    distinct_ratio = F.when(
        n > 0, F.size(F.array_distinct(toks)).cast("double") / n
    ).otherwise(F.lit(0.0))

    sorted_toks = F.sort_array(toks)
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        new_run = F.when(
            acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1
        ).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
        )

    top_cnt = F.aggregate(sorted_toks, zero, step, lambda acc: acc["best"])
    top_tok_frac = F.when(n > 0, top_cnt.cast("double") / n).otherwise(
        F.lit(0.0)
    )

    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bi = F.size(bigrams)
    dup_bigram_frac = F.when(
        n_bi > 0,
        1 - F.size(F.array_distinct(bigrams)).cast("double") / n_bi,
    ).otherwise(F.lit(0.0))

    return (
        toked.withColumn("n_toks", n)
        .withColumn("distinct_ratio", F.round(distinct_ratio, 6))
        .withColumn("top_tok_frac", F.round(top_tok_frac, 6))
        .withColumn("dup_bigram_frac", F.round(dup_bigram_frac, 6))
        .drop(tc)
    )


def quality_filter(
    docs: DataFrame,
    text: str = "text",
    min_toks: int = 10,
    max_top_tok: float = 0.2,
    max_dup_bigram: float = 0.1,
    min_quality: float = 0.35,
) -> DataFrame:
    """Gopher-style corpus filter: the composite keep/drop decision a
    training-data pipeline applies per document, with the FIRST failing
    rule as the drop reason (fixed rule order ⇒ deterministic).

    Rules (in order): too_short (token floor) → repetitive (top-token
    fraction) → dup_ngrams (duplicate-bigram fraction) → low_quality
    (blended quality score). All predicates compare the ROUNDED signal
    columns — the same values the output exposes — so the exact-hash
    oracle reproduces every boundary decision bit-for-bit.

    Scale: pure column expressions over one scan, zero shuffle; the
    decision columns prune to nothing when only `keep` is consumed
    downstream (Catalyst column pruning).
    """
    scored = repetition_stats(quality_score(docs, text), text)
    reason = (
        F.when(F.col("n_toks") < min_toks, F.lit("too_short"))
        .when(F.col("top_tok_frac") > max_top_tok, F.lit("repetitive"))
        .when(F.col("dup_bigram_frac") > max_dup_bigram, F.lit("dup_ngrams"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .otherwise(F.lit("keep"))
    )
    return scored.withColumn("reason", reason).withColumn(
        "keep", F.col("reason") == "keep"
    )
