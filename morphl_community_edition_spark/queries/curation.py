"""Training-data curation operators, round 4 (K-family widening).

Four ops a large-scale LLM data pipeline runs between raw corpus and
tokenizer — each as an oracle-checked contract query over the
``documents`` fixture:

- q103 sequence packing: pack documents into fixed token-budget bins
  (the pretraining sequence-packing step), per source shard.
- q104 token masking: denylist-regex masking counts (the shape of a
  PII / boilerplate scrub pass).
- q105 source-mix rebalance: deterministic per-source downsampling to
  a quota (the data-mix step; md5-ranked, so survives repartitioning
  — same device as pipeline_ops' det_hash_split).
- q106 contamination screen: n-gram overlap of train sources against
  a held-out benchmark source (the eval-contamination check).

Scale notes (100 TB):
- q103's running sum windows per SOURCE (shard), never globally — a
  global pack order over 100 TB is a single-partition sort; per-shard
  packing is how distributed packers actually run.
- q105's quota rank windows per source; skew bounded by quota.
- q106 is an inverted-index semi-join: shingles of the (small)
  benchmark side broadcast; train side never self-joins. The
  df-valve caveat from operators/dedup.py applies to stop-shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.queries import query

PACK_BUDGET = 512  # tokens per packed sequence bin
MIX_QUOTA = 15  # docs kept per source by the rebalancer
MASK_RE = r"\b(key|value|hash)\b"  # denylist (RE2- and Java-regex-safe)


@query(
    "q103_pack_sequences",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
               FROM documents),
    p AS (SELECT doc_id, source, n_tok,
                 coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
          FROM t)
    SELECT source, CAST(floor(tok_before / {PACK_BUDGET}) AS BIGINT) AS bin,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens
    FROM p
    GROUP BY source, floor(tok_before / {PACK_BUDGET})
    ORDER BY source, bin
    """,
)
def q103_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: docs stream in doc_id order within each
    source shard; a doc starts in bin floor(tokens_before/BUDGET).
    One window (partitioned by source) + one hash agg."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = docs.select(
        "doc_id",
        "source",
        n_tok.alias("n_tok"),
        F.coalesce(F.sum(n_tok).over(w), F.lit(0)).alias("tok_before"),
    )
    return (
        p.groupBy("source", F.floor(F.col("tok_before") / PACK_BUDGET).alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("sum_tokens"),
        )
        .orderBy("source", "bin")
    )


@query(
    "q104_token_mask",
    oracle=f"""
    WITH m AS (SELECT doc_id, source,
                      len(regexp_extract_all(text, '{MASK_RE}')) AS hits
               FROM documents)
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS masked_docs,
           CAST(sum(hits) AS BIGINT) AS total_masks
    FROM m
    GROUP BY source
    ORDER BY source
    """,
)
def q104_token_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist-scrub accounting: per source, how many docs carry
    denylisted tokens and how many masks a regexp_replace pass would
    apply. Pure codegen (regexp_count); the scrub itself is the same
    expression with regexp_replace."""
    docs = load_table(spark, sf_dir, "documents")
    hits = F.regexp_count(F.col("text"), F.lit(MASK_RE))
    return (
        docs.select("source", hits.alias("hits"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("hits") > 0, 1).otherwise(0)).cast("bigint").alias("masked_docs"),
            F.sum("hits").cast("bigint").alias("total_masks"),
        )
        .orderBy("source")
    )


@query(
    "q105_source_mix_sample",
    oracle=f"""
    WITH r AS (SELECT doc_id, source, n_chars,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
               FROM documents)
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {MIX_QUOTA}
    ORDER BY source, rk
    """,
)
def q105_source_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mix rebalance: keep MIX_QUOTA docs per
    source, chosen by md5(doc_id) rank — order-stable under
    repartitioning, no RNG (the det_hash_split rule). Window per
    source; no global sort until the final (quota-bounded) output."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= MIX_QUOTA)
        .withColumn("rk", F.col("rk").cast("bigint"))
        .orderBy("source", "rk")
    )


@query(
    "q106_contamination_screen",
    oracle="""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
    sh AS (SELECT DISTINCT doc_id, source, array_to_string(ws[gs:gs+4], ' ') AS s
           FROM w, LATERAL unnest(generate_series(1, len(ws) - 4)) AS t(gs)),
    bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
    hit AS (SELECT DISTINCT sh.doc_id, sh.source
            FROM sh JOIN bench ON sh.s = bench.s
            WHERE sh.source <> 'src0')
    SELECT source, count(*) AS contaminated_docs
    FROM hit
    GROUP BY source
    ORDER BY source
    """,
)
def q106_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination check: a train doc is contaminated if it
    shares any 5-gram shingle with the benchmark source (src0).
    Inverted-index LEFT SEMI join, benchmark shingles broadcast (the
    benchmark set is small by construction — that is what makes it a
    benchmark); train docs are never pairwise-joined."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    # guard: F.sequence(0, n) with n<0 counts DOWN, not empty — a
    # short doc must yield zero shingles like DuckDB's generate_series
    grams = F.when(F.size(ws) >= 5, F.transform(
        F.sequence(F.lit(0), F.size(ws) - 5),
        lambda i: F.array_join(F.slice(ws, i + 1, 5), " "),
    )).otherwise(F.array().cast("array<string>"))
    sh = docs.select(
        "doc_id", "source", F.explode(F.array_distinct(grams)).alias("s")
    )
    bench = sh.filter(F.col("source") == "src0").select("s").distinct()
    hit = (
        sh.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "s", "left_semi")
        .select("doc_id", "source")
        .distinct()
    )
    return (
        hit.groupBy("source")
        .agg(F.count(F.lit(1)).alias("contaminated_docs"))
        .orderBy("source")
    )
