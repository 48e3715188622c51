"""BPE merge training (K4/LLM surface, round 7): learn the first k
byte-pair-encoding merges from a corpus, the tokenizer-training step
that q126's vocabulary-coverage curve feeds.

Algorithm (the public Sennrich et al. 2016 procedure, greedy
leftmost application):

1. corpus -> (word, freq) vocabulary via whitespace split + hash agg;
2. each word starts as its character sequence;
3. k times: count adjacent symbol pairs weighted by word freq, pick
   the most frequent pair (tie-break: count DESC, then left ASC,
   right ASC — fully deterministic), and merge every
   greedy-leftmost occurrence of that pair in every word.

Spark shape — the 100 TB contract:

- The ONLY corpus-scale job is the initial word count (two-phase hash
  agg; explode + partial agg map-side). Everything after runs on the
  VOCABULARY frame — 10^5-10^6 rows at any corpus size, because merge
  training only needs (distinct word, freq). That frame is
  localCheckpoint'ed once and each iteration re-checkpoints it, so
  the per-iteration plan never re-reads the corpus and never grows
  with iteration count.
- Pair counting per iteration: zip_with(syms[:-1], syms[1:]) ->
  explode -> groupBy(l, r) -> sum(freq). Vocabulary-sized shuffle.
- Winner selection collects ONE row to the driver per iteration (k
  driver-driven merges — the loop condition lives in Python, the work
  in the JVM).
- Merge application is a NARROW per-row array fold (F.aggregate):
  a stack device — append each symbol, and when the stack top equals
  `l` and the incoming symbol equals `r`, replace the top with the
  merged symbol. This is exactly greedy leftmost non-overlapping
  matching (for l == r runs it merges positions 0-1, 2-3, ... of the
  run), with no shuffle and no Python in the loop body.

The DuckDB oracle twin (queries/llm.py q127) replays the same k
merges with the loop UNROLLED into generated SQL, using an
island-window formulation of greedy-leftmost (match positions on the
original sequence; within a maximal run of consecutive matches keep
the even offsets) that is provably equivalent to the stack fold —
overlapping matches only arise when l == r, where both keep
alternating occurrences from the run start.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def corpus_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) from whitespace-tokenized text — the one
    corpus-scale job; empty tokens (doubled spaces) dropped."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy-leftmost single-rule merge as a narrow array fold."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left)) & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """freq-weighted adjacent-pair counts over (word, freq, syms)."""
    pairs = F.explode(
        F.zip_with(
            F.slice(F.col("syms"), 1, F.size("syms") - 1),
            F.slice(F.col("syms"), 2, F.size("syms") - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
    )
    return (
        vocab_syms.select("freq", pairs.alias("pr"))
        .groupBy(F.col("pr.l").alias("lhs"), F.col("pr.r").alias("rhs"))
        .agg(F.sum("freq").cast("bigint").alias("pair_cnt"))
    )


MERGES_SCHEMA = StructType(
    [
        StructField("rk", IntegerType(), False),
        StructField("lhs", StringType(), False),
        StructField("rhs", StringType(), False),
        StructField("merged", StringType(), False),
        StructField("pair_cnt", LongType(), False),
    ]
)


def bpe_learn(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> tuple[list[tuple], DataFrame]:
    """Run the k-merge training loop; returns (merge rows, the final
    segmented vocabulary frame (word, freq, syms)) — the vocabulary
    IS the trained tokenizer's segmentation of every corpus word, so
    downstream ops (q131 subword frequencies, tokens-per-doc) read it
    directly instead of re-applying merges.

    Stops early (fewer than k merges) only if the vocabulary runs out
    of adjacent pairs — impossible on any non-trivial corpus.

    reliable=True (round 8): per-iteration lineage truncation uses
    durable ``DataFrame.checkpoint`` against ``checkpoint_dir`` (or a
    pre-configured sparkContext checkpoint dir) so the k-loop survives
    executor loss at cluster scale — see operators/checkpointing.py.
    Default localCheckpoint is the fast local path."""
    from morphl_community_edition_spark.operators.checkpointing import (
        ensure_checkpoint_dir,
        loop_checkpoint,
    )

    ensure_checkpoint_dir(docs.sparkSession, checkpoint_dir)
    vocab = corpus_vocab(docs, text_col).withColumn(
        "syms", F.split(F.col("word"), "")
    )
    # truncate lineage once up front: the loop must never re-plan the
    # corpus scan (plan-gated in tests/test_plans.py)
    vocab = loop_checkpoint(vocab, reliable)

    rows: list[tuple] = []
    for i in range(k):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("pair_cnt"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["lhs"], top[0]["rhs"], top[0]["pair_cnt"]
        rows.append((i + 1, l, r, l + r, cnt))
        vocab = vocab.withColumn("syms", apply_merge(F.col("syms"), l, r))
        # re-checkpoint so plan depth stays O(1) across iterations
        vocab = loop_checkpoint(vocab, reliable)
    return rows, vocab


def bpe_train(docs: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """Learn the first ``k`` BPE merges; returns a k-row DataFrame
    (rk, lhs, rhs, merged, pair_cnt) in merge order."""
    rows, _ = bpe_learn(docs, k, text_col)
    return docs.sparkSession.createDataFrame(rows, MERGES_SCHEMA)


def bpe_subword_frequencies(
    docs: DataFrame, k: int, top_n: int = 30, text_col: str = "text"
) -> DataFrame:
    """Corpus subword-token frequencies under the learned k-merge
    tokenizer (the APPLY step that closes the loop train q127 →
    tokenize here → coverage q126 → pack q103): every corpus word is
    segmented by the final vocabulary, each token occurrence weighted
    by word frequency; returns the ``top_n`` tokens as (rk, token,
    cnt), tie-broken (cnt DESC, token).

    Scale: the token aggregation runs over the segmented VOCABULARY
    (tokens-per-word × vocab rows, never corpus-sized); the rank
    window is over the aggregated token frame — the q82/q126
    dimension-sized-window exception."""
    from pyspark.sql import Window

    _, vocab = bpe_learn(docs, k, text_col)
    counts = (
        vocab.select("freq", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), "token")
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= top_n)
        .select("rk", "token", "cnt")
    )


def bpe_token_accounting(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group corpus token accounting under the learned k-merge
    tokenizer (the budget step q103's sequence packing consumes):
    each corpus word costs size(its final segmentation); groups
    aggregate doc token totals. Returns (group, n_docs, sum_tokens,
    max_doc_tokens) ordered by group.

    Plan shape — the CORPUS-side apply: the segmented vocabulary
    collapses to (word, n_tokens) and joins onto the exploded corpus
    words. The vocabulary is dimension-sized (10^5-10^6 rows at any
    corpus scale), so Catalyst broadcasts it and the corpus side
    never shuffles until the final per-group agg (plan-gated)."""
    _, vocab = bpe_learn(docs, k, text_col)
    word_cost = vocab.select(
        "word", F.size("syms").cast("bigint").alias("n_tok")
    )
    # id_col parameterized like every sibling operator (round-9
    # review: a hardcoded doc_id failed frames that satisfied every
    # other advertised knob)
    words = docs.select(
        F.col(id_col).alias("__doc"),
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).filter(F.col("word") != "")
    per_doc = (
        words.join(F.broadcast(word_cost), "word")
        .groupBy("grp", "__doc")
        .agg(F.sum("n_tok").alias("doc_tok"))
    )
    return (
        per_doc.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_tok").cast("bigint").alias("sum_tokens"),
            F.max("doc_tok").cast("bigint").alias("max_doc_tokens"),
        )
        .select(F.col("grp").alias("source"), "n_docs", "sum_tokens", "max_doc_tokens")
        .orderBy("source")
    )
