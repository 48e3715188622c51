"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Everything here is pure built-in-function column algebra — JVM-side,
whole-stage-codegen'd, linear in corpus size — so it survives a 100 TB
sweep unchanged. Each has an exact SQL twin (queries/llm.py) for the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from morphl_community_edition_spark.functions.hashing import md5_long60
from morphl_community_edition_spark.functions.rounding import crnd

# Tiny per-language stopword profiles for the n-gram/stopword
# heuristic. On real corpora these discriminate well; on the synthetic
# fixture they mostly prove determinism of the operator.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "zu"),
    "es": ("el", "la", "los", "que", "y", "de", "un", "es"),
    "fr": ("le", "la", "les", "et", "un", "une", "est", "que"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}
LANG_PRIORITY = ("en", "de", "es", "fr", "zh")  # deterministic tie-break order

EN_STOPWORDS = LANG_STOPWORDS["en"]


def _stopword_hits(words: Column, stopwords: tuple[str, ...]) -> Column:
    sw_array = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(words, lambda x: F.array_contains(sw_array, x)))


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Score each language profile, predict by max score with fixed
    priority tie-break. Adds score_<lang> columns + lang_pred."""
    words = F.split(F.col(text_col), " ")
    out = df
    for lang in LANG_PRIORITY:
        out = out.withColumn(f"score_{lang}", _stopword_hits(words, LANG_STOPWORDS[lang]))
    pred = None
    for lang in reversed(LANG_PRIORITY):  # earlier langs win ties: apply last
        cond = None
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            c = F.col(f"score_{lang}") >= F.col(f"score_{other}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, lang) if pred is None else F.when(cond, lang).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: word count, mean word length,
    stopword ratio, alphabetic ratio, and a blended score.

    Single-space-tokenized corpora: mean word length is
    (chars - spaces) / words, all exact integer math before one
    rounded division."""
    text = F.col(text_col)
    words = F.split(text, " ")
    n_words = F.size(words)
    n_chars = F.length(text)
    # RAW ratios feed the blend; rounding only on output. Rounding the
    # inputs first manufactures exact .5 ties at the last digit where
    # engines' round() semantics diverge (observed at sf0.01).
    mean_wlen = (n_chars - (n_words - 1)) / n_words
    stop_ratio = _stopword_hits(words, EN_STOPWORDS) / n_words
    alpha_ratio = F.length(F.regexp_replace(text, "[^a-zA-Z]", "")) / n_chars
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
        + stop_ratio * F.lit(0.3)
        + alpha_ratio * F.lit(0.2)
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("mean_wlen", crnd(mean_wlen, 6))
        .withColumn("stop_ratio", crnd(stop_ratio, 6))
        .withColumn("alpha_ratio", crnd(alpha_ratio, 6))
        .withColumn("quality", crnd(score, 6))
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens
    (letter runs / digit runs / single other chars), distinct tokens."""
    text = F.col(text_col)
    return (
        df.withColumn("n_ws_tokens", F.size(F.split(text, " ")))
        .withColumn("n_re_tokens", F.size(F.regexp_extract_all(text, F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), 0)))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(F.split(text, " "))))
    )


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Positional polynomial fingerprint (rolling-hash style):

        fp = Σ_i ((md5_long60(word_i) mod 2^40) · (i+1)) mod 2^40

    Order-sensitive (reordered words → different fp) and reproducible
    in any engine with md5 — the cross-engine contract. Round-9
    review rewrite, three fixes in one shape:

    - **per-row array fold, no explode/groupBy**: the old form
      grouped by every input column, which shuffled the full text
      body as a grouping key, MERGED fully-duplicate input rows into
      one doubled-fp row, and silently DROPPED NULL-text rows. Now a
      pure projection: one output row per input row, NULL text →
      NULL fp, zero exchanges at any corpus size.
    - **overflow-safe under ANSI**: the old per-term value
      (h mod 2^40)·(i+1) summed past int64 at ~4100 words worst-case
      (ARITHMETIC_OVERFLOW kills the query with ANSI on, which the
      session pins). The per-term mod 2^40 bounds the sum by
      n_words·2^40 — safe to ~8M words per document, and the
      intermediate product (h mod 2^40)·(i+1) stays under 2^63 for
      the same bound.
    - the q36 oracle replays the identical modular formula, so the
      hash contract is unchanged in kind (values differ from the
      pre-round-9 formula by design; both sides moved together).
    """
    t_mod = F.lit(1099511627776)
    words = F.split(F.col(text_col), " ")
    terms = F.transform(
        words, lambda w, i: (md5_long60(w) % t_mod) * (i + F.lit(1)) % t_mod
    )
    fp = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return df.withColumn(out, fp)


# the integer lexical-diversity quality score shared by q139 (adaptive
# cut), q147 (keeper election), and q149 (pipeline v3): distinct words
# per word, scaled to 10^6 and integer-divided. PURE integer
# arithmetic on both engines (both operands positive, so trunc ==
# floor == DuckDB //) — ONE constant pair builds the Spark column AND
# the oracle SQL so the sides cannot drift (the MIX_RATES convention;
# round-8 review extracted this from three verbatim copies).
LEXDIV_SCALE = 1_000_000


def lexical_diversity_score(text_col: str = "text") -> Column:
    """Spark column: distinct-word ratio × LEXDIV_SCALE, BIGINT."""
    return F.expr(
        f"CAST((CAST(size(array_distinct(split({text_col}, ' '))) AS BIGINT)"
        f" * {LEXDIV_SCALE}) DIV CAST(size(split({text_col}, ' ')) AS BIGINT)"
        " AS BIGINT)"
    )


def lexical_diversity_score_sql(ws_expr: str = "ws") -> str:
    """DuckDB twin over a pre-split word-list expression."""
    return (
        f"CAST(len(list_distinct({ws_expr})) AS BIGINT) * {LEXDIV_SCALE}"
        f" // CAST(len({ws_expr}) AS BIGINT)"
    )
