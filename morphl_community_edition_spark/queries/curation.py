"""Training-data curation operators, round 4 (K-family widening).

The ops a large-scale LLM data pipeline runs between raw corpus and
tokenizer — each an oracle-checked contract query over the
``documents`` fixture unless noted:

- q103 sequence packing: pack documents into fixed token-budget bins
  (the pretraining sequence-packing step), per source shard.
- q104 token masking: denylist-regex masking counts (the shape of a
  PII / boilerplate scrub pass).
- q105 source-mix rebalance: deterministic per-source downsampling to
  a quota (the data-mix step; md5-ranked, so survives repartitioning
  — same device as pipeline_ops' det_hash_split).
- q106 contamination screen: n-gram overlap of train sources against
  a held-out benchmark source (the eval-contamination check).
- q107 document chunking: overlapping token windows, md5-verified.
- q108 token rarity: unigram-LM-shaped scoring via exact integer
  rationals.
- q109 fingerprint screen: q106 on 8-byte hashes (no-oracle sketch;
  tolerance-tested superset of exact).
- q110 cross-modal neighbors: embedding KNN joined back to document
  metadata (the retrieval serving shape).
- q111 session funnel: 30-min-gap sessionization -> per-session
  furthest stage -> per-day outcome counts (events table; the
  composed L4+L5+M2 shape).
- q112 repetition quality: Gopher/FineWeb-style duplicate-word /
  duplicate-3-gram fractions + mean word length + keep flag (round 5).
- q113 exact-substring duplication: per-doc fraction of word-10-gram
  positions shared with ANOTHER document (the ExactSubstr dedup
  signal, SQL-native n-gram form; round 5).
- q118 PII redaction: ordered email/IPv4/phone/denylist
  regexp_replace chain with the redacted bytes value-checked via md5
  (round 6).
- q119 paragraph dedup: CCNet-style keep-first exact dedup at
  paragraph (10-word-block) granularity, surviving text md5-verified
  (round 6).
- q120 epoch mix: source-weighted epoch upsampling + deterministic
  hash-sharded training-order assignment — the RNG-free, global-
  sort-free data-mixing step (round 6).
- q122 curation pipeline v2: scrub → repetition/min-length filter →
  paragraph dedup → epoch mix composed end-to-end, one hash over the
  chain and its stage order (round 6; the q98 device for the round-6
  family).

Scale notes (100 TB):
- q103's running sum windows per SOURCE (shard), never globally — a
  global pack order over 100 TB is a single-partition sort; per-shard
  packing is how distributed packers actually run.
- q105's quota rank windows per source; skew bounded by quota.
- q106/q109 are inverted-index semi-joins: shingles of the (small)
  benchmark side broadcast; train side never self-joins. The
  stop-shingle df-valve (STOP_SHINGLE_MAX_DF, same device as
  operators/dedup.py max_doc_freq) removes boilerplate shingles from
  the bench set, bounding per-shingle hit volume; its own frequency
  aggregation is |bench|-bounded by map-side partial agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.functions.rounding import crnd
from morphl_community_edition_spark.operators.textstats import (
    lexical_diversity_score,
    lexical_diversity_score_sql,
)
from morphl_community_edition_spark.plans.hints import capped_order, fan_out_narrow_scan
from morphl_community_edition_spark.queries import query
from morphl_community_edition_spark.queries.windows import EVENTS_US

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


# Bench shingles in more docs than this are stop-shingles. ABSOLUTE-
# COUNT CONTRACT (verdict r5 nit): this constant is tuned to the
# fixture corpus; a production caller passes its own limit — either an
# absolute count or the fractional corpus-relative form via
# operators/dedup.resolve_doc_freq_limit (the q114 valve uses the
# fractional form end-to-end as the worked example).
STOP_SHINGLE_MAX_DF = 2


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """Distinct 5-gram word shingles per document: (doc_id, source, s).

    The scan is fanned out first: shingling is ~0.25 ms of string work
    per document, and a single-row-group parquet file would otherwise
    pin the whole explode to one task (measured 1.3 s -> parallel at
    sf0.1; no-op on a many-split table)."""
    docs = fan_out_narrow_scan(docs)
    ws = F.split(F.col("text"), " ")
    # guard: F.sequence(0, n) with n<0 counts DOWN, not empty — a
    # short doc must yield zero shingles like DuckDB's generate_series
    grams = F.when(F.size(ws) >= 5, F.transform(
        F.sequence(F.lit(0), F.size(ws) - 5),
        lambda i: F.array_join(F.slice(ws, i + 1, 5), " "),
    )).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id", "source", F.explode(F.array_distinct(grams)).alias("s")
    )


def _valved_bench_shingles(sh: DataFrame) -> DataFrame:
    """Benchmark (src0) shingle set minus stop-shingles — the df-valve.

    A bench shingle whose corpus-wide document frequency exceeds
    STOP_SHINGLE_MAX_DF is boilerplate ("in the beginning of"), not
    contamination evidence: unvalved, ONE such shingle makes the
    screen's hit volume approach corpus size. The valve is the same
    device as operators/dedup.py's ``max_doc_freq``.

    Scale shape (100 TB): df is computed ONLY for shingles already in
    the bench set — train shingles probe the broadcast bench0 hash and
    non-matches never reach the aggregation. The match stream CAN be
    huge (that is exactly the explosion being valved), but it feeds a
    count keyed by shingle, so map-side partial aggregation collapses
    it to at most |bench| rows per task before anything crosses an
    exchange. The valve therefore never materializes the volume it
    exists to prevent."""
    bench0 = sh.filter(F.col("source") == "src0").select("s").distinct()
    df_bench = (
        sh.join(F.broadcast(bench0), "s")
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return df_bench.filter(F.col("df") <= STOP_SHINGLE_MAX_DF).select("s")


@query(
    "q106_contamination_screen",
    oracle=f"""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
    sh AS (SELECT DISTINCT doc_id, source, array_to_string(ws[gs:gs+4], ' ') AS s
           FROM w, LATERAL unnest(generate_series(1, len(ws) - 4)) AS t(gs)),
    bench0 AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
    df AS (SELECT sh.s, count(*) AS df
           FROM sh JOIN bench0 ON sh.s = bench0.s GROUP BY sh.s),
    bench AS (SELECT s FROM df WHERE df <= {STOP_SHINGLE_MAX_DF})
    SELECT source, count(DISTINCT doc_id) AS contaminated_docs
    FROM sh JOIN bench ON sh.s = bench.s
    WHERE source <> 'src0'
    GROUP BY source
    ORDER BY source
    """,
)
def q106_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination check: a train doc is contaminated if it
    shares any NON-stop 5-gram shingle with the benchmark source
    (src0). Inverted-index LEFT SEMI join, benchmark shingles
    broadcast (the benchmark set is small by construction — that is
    what makes it a benchmark); train docs are never pairwise-joined.
    The stop-shingle df-valve (_valved_bench_shingles) bounds the
    per-shingle hit volume at STOP_SHINGLE_MAX_DF docs — without it a
    single boilerplate shingle in the benchmark makes the semi-join
    output grow with corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(docs)
    bench = _valved_bench_shingles(sh)
    return (
        sh.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "s", "left_semi")
        .groupBy("source")
        .agg(F.count_distinct("doc_id").alias("contaminated_docs"))
        .orderBy("source")
    )


CHUNK_TOKENS = 64  # tokens per chunk
CHUNK_STRIDE = 48  # chunk start stride (CHUNK_TOKENS - overlap)


@query(
    "q107_chunk_documents",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    c AS (SELECT doc_id, CAST(off / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
                 ws[off + 1 : off + {CHUNK_TOKENS}] AS chunk
          FROM w, LATERAL unnest(generate_series(0, len(ws) - 1, {CHUNK_STRIDE})) AS t(off))
    SELECT doc_id, chunk_id,
           CAST(len(chunk) AS BIGINT) AS n_chunk_tok,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM c
    ORDER BY doc_id, chunk_id
    """,
)
def q107_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token chunking (the RAG / pretraining chunker):
    chunks of CHUNK_TOKENS tokens starting every CHUNK_STRIDE, the
    trailing short chunk kept. 1->N row explosion stays JVM-side
    (sequence + transform + explode); md5 of each chunk proves byte
    equality with the oracle without hauling chunk text through the
    comparator. Linear in corpus size, no shuffle until the output
    sort."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    offs = F.sequence(F.lit(0), F.size(ws) - 1, F.lit(CHUNK_STRIDE))
    chunks = F.transform(
        offs,
        lambda off: F.struct(
            (off / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
            F.slice(ws, off + 1, CHUNK_TOKENS).alias("chunk"),
        ),
    )
    return (
        docs.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.chunk").cast("bigint").alias("n_chunk_tok"),
            F.md5(F.array_join("c.chunk", " ").cast("binary")).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@query(
    "q108_token_rarity",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    freq AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
    tot AS (SELECT count(*) AS n_total FROM tok),
    scored AS (SELECT t.doc_id, (tot.n_total * 1000000) // f.cnt AS rarity_ppm
               FROM tok t JOIN freq f ON t.w = f.w CROSS JOIN tot)
    SELECT doc_id, count(*) AS n_tok,
           floor((CAST(sum(rarity_ppm) AS DOUBLE) / count(*) / 1e6) * 1e6 + 0.5) / 1e6 AS rarity
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q108_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rarity score per document (the shape of a
    unigram-LM quality/filter pass, with exact arithmetic instead of
    log-probs: per-token rarity = floor(total_tokens*1e6 / cnt(w)) —
    bigint floor-division is bit-identical on both engines, where
    ln() could differ in the last ulp). Token->frequency is a join
    against the (vocabulary-sized, broadcast) frequency table; the
    corpus total rides along as a broadcast scalar row."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = tok.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        tok.join(F.broadcast(freq), "w")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.expr("CAST(n_total * 1000000 AS BIGINT) div cnt").alias("rarity_ppm"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            crnd(
                F.sum("rarity_ppm").cast("double") / F.count(F.lit(1)) / F.lit(1e6), 6
            ).alias("rarity"),
        )
        .orderBy("doc_id")
    )


def _shingle_fp(col: str = "s"):
    """THE 8-byte-sketch fingerprint expression for the contamination
    family — one definition shared by q109 (the screen) and q117 (its
    superset guarantee), so a drift in modulus/hash in either screen
    surfaces as q117 violations instead of two self-consistent private
    copies staying vacuously green (round-6 review finding)."""
    # pmod, not % (round-9 review): Spark's sign-preserving % spans
    # (-2^26, 2^26) — 27 bits — silently doubling the documented
    # ~n_bench/2^26 collision bound; pmod is the stated 26-bit bucket
    return F.pmod(F.xxhash64(col), F.lit(1 << 26)).alias("fp")


@query("q109_contamination_fingerprint")
def q109_contamination_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-fingerprint contamination screen — q106's 100 TB twin.

    The exact screen (q106) joins train shingles against benchmark
    shingles as STRINGS (~40 bytes each). At corpus scale the join
    should move 8-byte fingerprints instead: xxhash64(shingle) mod
    2^26. Like a Bloom filter this has no false negatives and a
    bounded false-positive rate (hash collisions: ~n_bench/2^26 per
    probe); unlike one it keeps the plan a plain broadcast semi-join,
    so AQE/codegen treat it exactly like q106 while shuffle/broadcast
    bytes collapse ~5x. (Spark's own bloom_filter_agg is not a
    SQL-registered function — it exists only inside the runtime
    bloom-join injection rule, which the plans suite gates
    separately.)

    The stop-shingle df-valve is shared with q106 and applied on the
    shingle STRINGS (before fingerprinting): the valve's aggregation
    ships only (shingle, partial-count) pairs for bench-matching
    shingles — map-side combine keeps that exchange |bench|-bounded —
    while the repeated cost (the per-train-shingle probe and the hit
    stream) runs on 8-byte fingerprints. Valving on strings also
    preserves the superset guarantee exactly: both screens drop the
    SAME shingles, so a hash collision can only ADD q109 hits, never
    remove one q106 found.

    No SQL oracle by design (xxhash64 is engine-specific); the
    tolerance suite pins the two sketch properties instead: per-source
    counts are a SUPERSET of q106's exact counts, and the overcount is
    bounded. The driver records the rows-only check like the other
    sketch queries (q18/q28/q41).
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(docs)
    bench_fp = _valved_bench_shingles(sh).select(_shingle_fp()).distinct()
    train = sh.filter(F.col("source") != "src0").select(
        "doc_id", "source", _shingle_fp()
    )
    return (
        train.join(F.broadcast(bench_fp), "fp", "left_semi")
        .groupBy("source")
        .agg(F.count_distinct("doc_id").alias("contaminated_docs"))
        .orderBy("source")
    )


@query(
    "q117_fingerprint_superset_check",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source
    FROM documents WHERE 1 = 0
    ORDER BY doc_id
    """,
)
def q117_fingerprint_superset_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q109's guarantee, driver-checked (verdict r5 #5): the
    fingerprint screen has NO false negatives — every train doc the
    exact string screen (q106 semantics, per-doc form) flags must also
    be flagged by the 8-byte-fingerprint screen. This query returns
    the VIOLATIONS (exact hits the fingerprint screen missed) and must
    always be empty; the oracle is the empty relation with the same
    schema, so the driver's hash compare actively asserts the
    invariant instead of the rows-only check q109 itself gets.

    The oracle side is empty BY CONSTRUCTION (DuckDB cannot replay
    xxhash64) — the verification content is entirely in the Spark
    side, which recomputes both screens from the same valved shingle
    stream: a wiring regression (valve applied to one screen only,
    fingerprint modulus drift between bench and train sides, a dropped
    distinct) surfaces as non-empty rows ⇒ hash mismatch. Cost is two
    broadcast semi-joins + an anti-join, all train-side linear."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(docs)
    bench = _valved_bench_shingles(sh)
    train = sh.filter(F.col("source") != "src0")
    exact_hits = (
        train.join(F.broadcast(bench), "s", "left_semi")
        .select("doc_id", "source")
        .distinct()
    )
    bench_fp = bench.select(_shingle_fp()).distinct()
    fp_hits = (
        train.select("doc_id", _shingle_fp())
        .join(F.broadcast(bench_fp), "fp", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        exact_hits.join(fp_hits, "doc_id", "left_anti")
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "source")
        .orderBy("doc_id")
    )


@query(
    "q110_crossmodal_neighbors",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < 5),
    p AS (SELECT q.vec_id AS q_vec, c.vec_id AS n_vec,
                 floor((list_dot_product(q.emb, c.emb)
                       / (sqrt(list_dot_product(q.emb, q.emb)) * sqrt(list_dot_product(c.emb, c.emb)))) * 1e6 + 0.5) / 1e6 AS sim
          FROM q JOIN e c ON c.vec_id != q.vec_id),
    k AS (SELECT *, row_number() OVER (PARTITION BY q_vec ORDER BY sim DESC, n_vec) AS rnk FROM p)
    SELECT k.q_vec, k.n_vec, k.sim, CAST(k.rnk AS INTEGER) AS rnk,
           d.lang AS n_lang, d.source AS n_source, d.n_chars AS n_chars
    FROM k JOIN documents d ON d.doc_id = k.n_vec
    WHERE k.rnk <= 3
    ORDER BY k.q_vec, k.rnk
    """,
)
def q110_crossmodal_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval: embedding KNN (K3's exact path, same
    cosine/rank contract as q39) joined back to the documents table
    for the neighbors' text metadata — the serving shape of a
    retrieval pipeline (vector hit -> payload lookup). The metadata
    join is a broadcast on the k-bounded neighbor set; at scale the
    payload side is the big table, so the k·|queries|-row hit list is
    always the broadcast side."""
    from morphl_community_edition_spark.operators.similarity import cosine_topk_per_query

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    hits = cosine_topk_per_query(emb, emb.filter("vec_id < 5"), k=3)
    out = (
        docs.join(F.broadcast(hits), F.expr("doc_id = n_vec"))
        .select(
            "q_vec", "n_vec", "sim", "rnk",
            F.col("lang").alias("n_lang"),
            F.col("source").alias("n_source"),
            F.col("n_chars").alias("n_chars"),
        )
    )
    # 5 probes x k=3, payload-joined on the unique doc_id: <= 15 rows
    return capped_order(out, "q_vec", "rnk", cap=15)


@query(
    "q111_session_funnel",
    oracle=f"""
    WITH e AS (SELECT event_id, ts, user_id, event_type FROM {EVENTS_US}),
    g AS (SELECT user_id, ts, event_id, event_type,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, ts, event_type,
            CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess
          FROM g),
    per AS (SELECT user_id, sess, CAST(min(ts) AS DATE) AS day,
                   CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0 THEN 2
                             WHEN sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 0 THEN 1
                             ELSE 0 END AS INTEGER) AS stage
            FROM s GROUP BY user_id, sess)
    SELECT day, count(*) AS n_sessions,
           CAST(sum(CASE WHEN stage = 1 THEN 1 ELSE 0 END) AS BIGINT) AS engaged,
           CAST(sum(CASE WHEN stage = 2 THEN 1 ELSE 0 END) AS BIGINT) AS converted
    FROM per
    GROUP BY day
    ORDER BY day
    """,
)
def q111_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-outcome funnel per day: 30-minute-gap sessionization
    (operators/sessionize — q16's exact break semantics), each
    session labeled by its furthest funnel stage, counted per the
    session's START day. This is the composed L4+L5+M2 shape the
    reference's intent pipeline consumes (per-session stage is the
    thing its model predicts), and the session-scoped stage is
    naturally non-constant (sessions are short). One user-keyed sort
    (sessionize) + two hash aggs; nothing fact-sized crosses an
    unpartitioned window."""
    from morphl_community_edition_spark.operators.sessionize import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, user_col="user_id", ts_col="ts", gap_minutes=30, order_tiebreak="event_id")
    per = s.groupBy("user_id", "sess").agg(
        F.min("ts").cast("date").alias("day"),
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) > 0, 2
        ).when(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)) > 0, 1
        ).otherwise(0).cast("int").alias("stage"),
    )
    return (
        per.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.when(F.col("stage") == 1, 1).otherwise(0)).cast("bigint").alias("engaged"),
            F.sum(F.when(F.col("stage") == 2, 1).otherwise(0)).cast("bigint").alias("converted"),
        )
        .orderBy("day")
    )


@query(
    "q112_repetition_quality",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (SELECT doc_id, array_to_string(ws[gs:gs+2], ' ') AS g3
          FROM w, LATERAL unnest(generate_series(1, len(ws) - 2)) AS t(gs)),
    gg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_g3,
                  CAST(count(DISTINCT g3) AS BIGINT) AS u_g3
           FROM g GROUP BY doc_id),
    ww AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tok,
                  CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
                  CAST(len(array_to_string(ws, '')) AS BIGINT) AS n_chr
           FROM w)
    SELECT ww.doc_id AS doc_id, n_tok,
           floor((1 - CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS dup_word_frac,
           floor((1 - CAST(u_g3 AS DOUBLE) / CAST(n_g3 AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS dup_3gram_frac,
           floor((CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mean_word_len,
           CAST(CASE WHEN (1 - CAST(u_g3 AS DOUBLE) / CAST(n_g3 AS DOUBLE)) > 0.5
                     THEN 0 ELSE 1 END AS INTEGER) AS keep
    FROM ww JOIN gg ON ww.doc_id = gg.doc_id
    ORDER BY ww.doc_id
    """,
)
def q112_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/FineWeb-style repetition quality signals, exact form:
    duplicate-word fraction (1 - distinct/total tokens),
    duplicate-3-gram fraction (the duplicate-n-gram rule), mean word
    length, and the resulting keep/reject flag. The fixture corpus has
    no line structure, so the rules operate at word/n-gram level — the
    same signals the published filters compute per line+n-gram.

    Fully linear and shuffle-light at 100 TB: the word-level metrics
    are per-row array expressions (no explode at all); only the 3-gram
    distinct-count needs an explode + two-phase distinct agg keyed by
    doc_id, and doc_id is the natural partition key (no skew: one
    doc's n-grams are one group). All ratios are int/int double
    divisions — bit-identical on both engines."""
    docs = fan_out_narrow_scan(load_table(spark, sf_dir, "documents"))
    ws = F.split(F.col("text"), " ")
    # guard: F.sequence(0, n) with n<0 counts DOWN (then slice(ws, 0, 3)
    # raises — SQL arrays are 1-indexed); a <3-word doc must yield zero
    # 3-grams, matching the oracle's empty generate_series + inner join
    g3 = F.when(F.size(ws) >= 3, F.transform(
        F.sequence(F.lit(0), F.size(ws) - 3),
        lambda i: F.array_join(F.slice(ws, i + 1, 3), " "),
    )).otherwise(F.array().cast("array<string>"))
    gg = (
        docs.select("doc_id", F.explode(g3).alias("g3"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_g3"),
            F.count_distinct("g3").alias("u_g3"),
        )
    )
    ww = docs.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(ws)).cast("bigint").alias("n_uniq"),
        F.length(F.array_join(ws, "")).cast("bigint").alias("n_chr"),
    )
    dup3 = F.lit(1) - F.col("u_g3").cast("double") / F.col("n_g3").cast("double")
    return (
        ww.join(gg, "doc_id")
        .select(
            "doc_id",
            "n_tok",
            crnd(
                F.lit(1) - F.col("n_uniq").cast("double") / F.col("n_tok").cast("double"), 6
            ).alias("dup_word_frac"),
            crnd(dup3, 6).alias("dup_3gram_frac"),
            crnd(F.col("n_chr").cast("double") / F.col("n_tok").cast("double"), 6).alias(
                "mean_word_len"
            ),
            F.when(dup3 > 0.5, 0).otherwise(1).cast("int").alias("keep"),
        )
        .orderBy("doc_id")
    )


@query(
    "q113_exact_substring_dup",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    pos AS (SELECT doc_id, array_to_string(ws[gs:gs+9], ' ') AS g
            FROM w, LATERAL unnest(generate_series(1, len(ws) - 9)) AS t(gs)),
    df AS (SELECT g, count(DISTINCT doc_id) AS df FROM pos GROUP BY g),
    dup AS (SELECT g FROM df WHERE df >= 2),
    per AS (SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_dup_pos
            FROM pos p JOIN dup ON p.g = dup.g GROUP BY p.doc_id),
    tot AS (SELECT doc_id, CAST(len(ws) - 9 AS BIGINT) AS n_pos
            FROM w WHERE len(ws) >= 10)
    SELECT t.doc_id AS doc_id, n_pos,
           CAST(coalesce(n_dup_pos, 0) AS BIGINT) AS n_dup_pos,
           floor((CAST(coalesce(n_dup_pos, 0) AS DOUBLE) / CAST(n_pos AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS dup_frac
    FROM tot t LEFT JOIN per ON t.doc_id = per.doc_id
    ORDER BY t.doc_id
    """,
)
def q113_exact_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring duplication rate (the shape of
    Lee et al.'s ExactSubstr dedup, on word 10-grams): per document,
    the fraction of its 10-gram positions whose 10-gram also occurs in
    at least one OTHER document. Positions are NOT per-doc
    deduplicated — a span repeated 5 times counts 5 times, exactly as
    substring dedup would excise each occurrence.

    Scale shape (100 TB): two linear passes over 10-gram positions.
    Pass 1 aggregates cross-doc document frequency (two-phase
    count-distinct keyed by the 10-gram; partial aggregation collapses
    per-task duplicates before the exchange). Pass 2 joins positions
    against the duplicated-gram set — both sides shuffle on the gram
    key, a plain sort-merge join with no skew hazard beyond what a
    df-valve (as in q106) would cut. Production substring dedup uses
    suffix arrays for character-exact spans; this is the SQL-native
    n-gram formulation of the same signal."""
    docs = fan_out_narrow_scan(load_table(spark, sf_dir, "documents"))
    ws = F.split(F.col("text"), " ")
    grams = F.when(F.size(ws) >= 10, F.transform(
        F.sequence(F.lit(0), F.size(ws) - 10),
        lambda i: F.array_join(F.slice(ws, i + 1, 10), " "),
    )).otherwise(F.array().cast("array<string>"))
    pos = docs.select("doc_id", F.explode(grams).alias("g"))
    dup = (
        pos.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("g")
    )
    per = pos.join(dup, "g").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_pos")
    )
    tot = docs.filter(F.size(ws) >= 10).select(
        "doc_id", (F.size(ws) - 9).cast("bigint").alias("n_pos")
    )
    n_dup = F.coalesce(F.col("n_dup_pos"), F.lit(0)).cast("bigint")
    return (
        tot.join(per, "doc_id", "left")
        .select(
            "doc_id",
            "n_pos",
            n_dup.alias("n_dup_pos"),
            crnd(n_dup.cast("double") / F.col("n_pos").cast("double"), 6).alias(
                "dup_frac"
            ),
        )
        .orderBy("doc_id")
    )


# PII scrub pass (q118). Patterns are written in the common subset of
# Java regex (Spark) and RE2 (DuckDB): \b, \d, bounded repetition, and
# character classes only — no lookaround, no backreferences. Applied
# IN ORDER (email first, so an address is swallowed whole before the
# digit patterns can bite its fragments); counts are taken on the
# ORIGINAL text so they are order-independent.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("name", r"\bcustomer\b", "<NAME>"),
]


def _pii_oracle() -> str:
    # The bare-VARCHAR cast is load-bearing: DuckDB's 'g' regexp flag
    # is a POSITION argument to Spark's regexp_replace, and Spark
    # resolves+folds that cast ('g' -> INT) BEFORE it would reject any
    # unresolved outer function — so this oracle must fail Spark's
    # PARSER, not its analyzer. CAST(... AS VARCHAR) (no length) is
    # the documented tests/test_sql_parity.py dialect gap.
    counts = ",\n           ".join(
        f"len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_{key}"
        for key, pat, _ in PII_PATTERNS
    )
    red = "text"
    for _, pat, rep in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{rep}', 'g')"
    return f"""
    SELECT doc_id,
           {counts},
           len({red})::BIGINT AS red_len,
           md5(CAST({red} AS VARCHAR)) AS red_md5
    FROM documents
    ORDER BY doc_id
    """


@query("q118_pii_redaction", oracle=_pii_oracle())
def q118_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass, output-verified: per document, match counts for
    each pattern class (email / IPv4 / phone / name-denylist) plus the
    length and md5 of the REDACTED text after the ordered
    regexp_replace chain — so the oracle checks the rewritten bytes,
    not just the accounting (q104 checks only counts). The synthetic
    corpus exercises the denylist tier; the email/IP/phone regexes are
    proven on adversarial rows by the unit test
    (tests/test_smoke_operators.py::test_q118_pii_patterns_redact).

    100 TB shape: embarrassingly parallel — one narrow projection, all
    regexps inside whole-stage codegen, zero shuffles before the final
    (output-sized) sort. A real scrub emits the redacted text column
    itself through the partitioned sink (A5); this query emits its
    hash so the driver can value-check it."""
    docs = fan_out_narrow_scan(load_table(spark, sf_dir, "documents"))
    red = F.col("text")
    for _, pat, rep in PII_PATTERNS:
        red = F.regexp_replace(red, pat, rep)
    return docs.select(
        "doc_id",
        *[
            F.regexp_count(F.col("text"), F.lit(pat)).cast("bigint").alias(f"n_{key}")
            for key, pat, _ in PII_PATTERNS
        ],
        F.length(red).cast("bigint").alias("red_len"),
        F.md5(red).alias("red_md5"),
    ).orderBy("doc_id")


PARA_WORDS = 10  # words per synthetic "paragraph" block


@query(
    "q119_paragraph_dedup",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    p AS (SELECT doc_id, CAST(off / {PARA_WORDS} AS BIGINT) AS pos,
                 array_to_string(ws[off + 1 : off + {PARA_WORDS}], ' ') AS para
          FROM w, LATERAL unnest(generate_series(0, len(ws) - 1, {PARA_WORDS})) AS t(off)),
    r AS (SELECT doc_id, pos, para,
                 row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rk
          FROM p)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(coalesce(string_agg(CASE WHEN rk = 1 THEN para END, ' ' ORDER BY pos), ''))
               AS kept_md5
    FROM r GROUP BY doc_id ORDER BY doc_id
    """,
)
def q119_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph-level exact dedup with keep-first
    semantics: split each document into non-overlapping
    {PARA_WORDS}-word blocks (the fixture corpus has no newline
    structure, so blocks stand in for paragraphs), keep only the
    globally FIRST occurrence of each block (ordered by doc_id, then
    position), and report per document the block count, surviving
    count, and the md5 of the surviving text reassembled in original
    order — the value-checked equivalent of emitting the deduped
    corpus.

    100 TB shape: keeper election is groupBy(para) -> min(packed
    (doc_id, pos) key) — the key is zero-padded so lexicographic min
    IS (doc_id, pos) order. min over a variable-width key compiles to
    partial+final SortAggregate (HashAggregate needs fixed-width agg
    buffers), which still has the scale-critical property: the
    map-side partial combine collapses a boilerplate paragraph
    repeated 10^9 times to one row per task BEFORE the exchange, at
    the cost of a local per-partition sort. The join back of the
    (one-row-per-distinct-paragraph) keeper set against occurrences is
    a plain equi-join AQE's skew-split can handle, where a window over
    the paragraph key would pin every copy of a hot paragraph to one
    task. Reassembly sorts WITHIN each doc's collected block list
    (array_sort over <=doc-sized arrays), never globally."""
    docs = fan_out_narrow_scan(load_table(spark, sf_dir, "documents"))
    ws = F.split(F.col("text"), " ")
    offs = F.sequence(F.lit(0), F.size(ws) - 1, F.lit(PARA_WORDS))
    paras = F.transform(
        offs, lambda off: F.array_join(F.slice(ws, off + 1, PARA_WORDS), " ")
    )
    occ = docs.select("doc_id", F.posexplode(paras).alias("pos", "para")).withColumn(
        "k",
        F.concat(
            F.lpad(F.col("doc_id").cast("string"), 19, "0"),
            F.lpad(F.col("pos").cast("string"), 10, "0"),
        ),
    )
    keep = occ.groupBy("para").agg(F.min("k").alias("kmin"))
    return (
        occ.join(keep, "para")
        .withColumn("is_kept", F.col("k") == F.col("kmin"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.when(F.col("is_kept"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(F.col("is_kept"), F.struct("pos", "para"))
                            )
                        ),
                        lambda s: s["para"],
                    ),
                    " ",
                )
            ).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )


N_MIX_SHARDS = 16  # training-stream output shards (hex-nibble of the order key)


@query(
    "q120_epoch_mix",
    oracle="""
    WITH e AS (SELECT doc_id, source,
                      1 + (CAST(regexp_extract(source, '[0-9]+') AS INTEGER) % 3) AS w
               FROM documents),
    x AS (SELECT doc_id, CAST(t.epoch AS BIGINT) AS epoch
          FROM e, LATERAL unnest(generate_series(1, w)) AS t(epoch)),
    k AS (SELECT doc_id, epoch,
                 md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)) AS key
          FROM x)
    SELECT doc_id, epoch,
           CAST(strpos('0123456789abcdef', substr(key, 1, 1)) - 1 AS INTEGER) AS shard,
           CAST(row_number() OVER (PARTITION BY substr(key, 1, 1)
                                   ORDER BY key, doc_id, epoch) AS BIGINT) AS pos
    FROM k
    ORDER BY shard, pos
    """,
)
def q120_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order assignment (the data-mixing step a pretraining
    pipeline runs last): upsample each source by its repetition
    factor (epochs 1..w, here w = 1 + src_num mod 3 so the rule is
    fixture-independent), then assign every (doc, epoch) a
    deterministic position in a hash-sharded training stream —
    shard = first md5 nibble, pos = rank of the md5 key within the
    shard.

    100 TB shape: the scalable substitute for 'ORDER BY random()' —
    no RNG (md5 keys are repartition-stable, the det_hash_split
    rule) and no global sort: the stream order is (shard, pos),
    where each rank window covers one md5-uniform shard (~1/16 of
    the data here; shard count scales with the cluster). Epoch
    expansion is a per-row lateral sequence (linear, no join — the
    weight is computed, not looked up)."""
    docs = fan_out_narrow_scan(load_table(spark, sf_dir, "documents"))
    w = 1 + F.regexp_extract(F.col("source"), r"[0-9]+", 0).cast("int") % 3
    x = docs.select("doc_id", F.explode(F.sequence(F.lit(1), w)).alias("epoch"))
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                         F.col("epoch").cast("string")))
    k = x.select("doc_id", F.col("epoch").cast("bigint").alias("epoch"),
                 key.alias("key"))
    shard = (F.instr(F.lit("0123456789abcdef"), F.substring("key", 1, 1)) - 1).cast("int")
    pos = F.row_number().over(
        Window.partitionBy(F.substring("key", 1, 1)).orderBy("key", "doc_id", "epoch")
    )
    return (
        k.select("doc_id", "epoch", shard.alias("shard"),
                 pos.cast("bigint").alias("pos"))
        .orderBy("shard", "pos")
    )


def _pipeline_v2_oracle() -> str:
    red = "text"
    for _, pat, rep in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{rep}', 'g')"
    return f"""
    WITH w AS (SELECT doc_id, source, string_split({red}, ' ') AS ws FROM documents),
    g AS (SELECT doc_id, array_to_string(ws[gs:gs+2], ' ') AS g3
          FROM w, LATERAL unnest(generate_series(1, len(ws) - 2)) AS t(gs)),
    gg AS (SELECT doc_id, count(*) AS n_g3, count(DISTINCT g3) AS u_g3
           FROM g GROUP BY doc_id),
    keep1 AS (SELECT w.doc_id AS doc_id, source, ws
              FROM w JOIN gg ON w.doc_id = gg.doc_id
              WHERE len(ws) >= 3
                AND (1 - CAST(u_g3 AS DOUBLE) / CAST(n_g3 AS DOUBLE)) <= 0.5),
    p AS (SELECT doc_id, source, CAST(off / {PARA_WORDS} AS BIGINT) AS pos,
                 array_to_string(ws[off + 1 : off + {PARA_WORDS}], ' ') AS para
          FROM keep1, LATERAL unnest(generate_series(0, len(ws) - 1, {PARA_WORDS})) AS t(off)),
    r AS (SELECT doc_id, source, pos, para,
                 row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rk
          FROM p),
    reb AS (SELECT doc_id, source,
                   sum(CASE WHEN rk = 1 THEN len(string_split(para, ' ')) ELSE 0 END) AS n_tok,
                   sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS n_kept
            FROM r GROUP BY doc_id, source),
    surv AS (SELECT doc_id, source, n_tok FROM reb WHERE n_kept > 0),
    ep AS (SELECT doc_id, source, n_tok, CAST(t.e AS BIGINT) AS epoch
           FROM surv, LATERAL unnest(generate_series(
               1, 1 + (CAST(regexp_extract(source, '[0-9]+') AS INTEGER) % 3))) AS t(e))
    SELECT source, epoch, count(*) AS n_docs,
           sum(n_tok)::BIGINT AS sum_tokens,
           min(doc_id)::BIGINT AS min_doc
    FROM ep GROUP BY source, epoch ORDER BY source, epoch
    """
    # Dialect-gap note: this oracle embeds the 'g'-flag regexp chain,
    # which Spark would constant-fold into a cast error during
    # spark.sql analysis — it must fail Spark's PARSER first. The
    # ws[a : b] list slices do that (DuckDB-only syntax); see
    # _pii_oracle for the same constraint handled explicitly.


@query("q122_curation_pipeline_v2", oracle=_pipeline_v2_oracle())
def q122_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-6 curation family composed end-to-end, one hash over
    the whole chain INCLUDING stage order: PII scrub (q118's ordered
    regexp chain — redaction first, so dedup sees canonical bytes) →
    repetition + min-length filter (q112's duplicate-3-gram rule on
    the REDACTED text, Gopher-style; <3-word docs drop) → keep-first
    paragraph dedup over the survivors (q119, zero-surviving-block
    docs drop) → source-weighted epoch upsampling (q120's rule) →
    per-(source, epoch) token accounting of the deduped corpus.

    Scale shape = the q98 ordering argument extended: row-local
    filters (regexp, per-doc n-gram stats) shrink the corpus BEFORE
    the only pair-wise stage (paragraph keeper election), and the
    epoch expansion multiplies a summary-sized survivor set, not raw
    text. Every stage inherits its component's gated plan shape."""
    docs = fan_out_narrow_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    red = F.col("text")
    for _, pat, rep in PII_PATTERNS:
        red = F.regexp_replace(red, pat, rep)
    base = docs.select("doc_id", "source", F.split(red, " ").alias("ws"))
    g3 = F.when(
        F.size("ws") >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - 3),
            lambda i: F.array_join(F.slice("ws", i + 1, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    gg = (
        base.select("doc_id", F.explode(g3).alias("g3"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_g3"), F.count_distinct("g3").alias("u_g3"))
    )
    dup3 = F.lit(1) - F.col("u_g3").cast("double") / F.col("n_g3").cast("double")
    keep1 = (
        base.join(gg, "doc_id")
        .filter((F.size("ws") >= 3) & (dup3 <= 0.5))
        .select("doc_id", "source", "ws")
    )
    offs = F.sequence(F.lit(0), F.size("ws") - 1, F.lit(PARA_WORDS))
    paras = F.transform(
        offs, lambda off: F.array_join(F.slice("ws", off + 1, PARA_WORDS), " ")
    )
    occ = keep1.select(
        "doc_id", "source", F.posexplode(paras).alias("pos", "para")
    ).withColumn(
        "k",
        F.concat(
            F.lpad(F.col("doc_id").cast("string"), 19, "0"),
            F.lpad(F.col("pos").cast("string"), 10, "0"),
        ),
    )
    keep = occ.groupBy("para").agg(F.min("k").alias("kmin"))
    kept = F.col("k") == F.col("kmin")
    reb = (
        occ.join(keep, "para")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.when(kept, F.size(F.split(F.col("para"), " "))).otherwise(0))
            .alias("n_tok"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        )
    )
    surv = reb.filter(F.col("n_kept") > 0).select("doc_id", "source", "n_tok")
    w = 1 + F.regexp_extract(F.col("source"), r"[0-9]+", 0).cast("int") % 3
    ep = surv.select(
        "doc_id",
        "source",
        "n_tok",
        F.explode(F.sequence(F.lit(1), w)).alias("epoch"),
    )
    return (
        ep.groupBy("source", F.col("epoch").cast("bigint").alias("epoch"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("sum_tokens"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
        .orderBy("source", "epoch")
    )


# the curated mix for q132: full src0-3, half src4-9, a fifth of
# src10-15, src16-19 dropped (default_rate 0 — allowlist posture).
# ONE dict builds both the Spark rate map and the oracle CASE chain,
# so the two sides cannot drift.
MIX_RATES: dict[str, float] = {
    **{f"src{i}": 1.0 for i in range(0, 4)},
    **{f"src{i}": 0.5 for i in range(4, 10)},
    **{f"src{i}": 0.2 for i in range(10, 16)},
}
_MIX_SALT = "mix1"
# imported, not re-declared: the oracle CASE chain must use the SAME
# bucket modulus as the Spark-side sampler (round-7 review)
from morphl_community_edition_spark.operators.sampling import MOD as _MIX_MOD  # noqa: E402


def _sample_h_sql(key: str = "doc_id", mod: bool = False) -> str:
    """The shared 60-bit sampling coordinate; ``mod=True`` appends the
    rate-bucket reduction (q132's compare). Ordering uses (q133) keep
    the full hash (round-8 review: a modular order degenerates to key
    tie-breaks inside buckets at corpus scale)."""
    h = (
        f"CAST('0x' || substring(md5(CAST({key} AS VARCHAR) || ':{_MIX_SALT}'),"
        f" 1, 15) AS BIGINT)"
    )
    return f"{h} % {_MIX_MOD}" if mod else h


def _rate_sample_oracle() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {int(round(r * _MIX_MOD))}"
        for s, r in sorted(MIX_RATES.items())
    )
    return f"""
    SELECT doc_id, source
    FROM (SELECT doc_id, source, {_sample_h_sql(mod=True)} AS h FROM documents)
    WHERE h < CASE {cases} ELSE 0 END
    ORDER BY doc_id
    """


@query("q132_hash_rate_sample", oracle=_rate_sample_oracle())
def q132_hash_rate_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rate-based stratified downsample (round 7; the
    cut half of data mixing — q120 upsamples, this drops): keep a doc
    iff md5(doc_id‖salt) mod 10^12 falls under its source's rate;
    unknown sources drop (allowlist). RNG-free, so the sample is
    reproducible across engines/partitionings and hash-checkable.

    Scale shape: a PURE scan-side filter — no shuffle, no window, no
    state; sampling 100 TB costs exactly one scan (plan-gated: zero
    Exchanges before the presentation sort)."""
    from morphl_community_edition_spark.operators.sampling import hash_rate_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return hash_rate_sample(
        docs, "doc_id", MIX_RATES, "source", default_rate=0.0, salt=_MIX_SALT
    ).orderBy("doc_id")


_EXACT_SAMPLE_N = 7


@query(
    "q133_stratified_exact_sample",
    oracle=f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
      FROM (SELECT doc_id, source, {{h}} AS h FROM documents))
    WHERE rk <= {_EXACT_SAMPLE_N} ORDER BY source, doc_id
    """.format(h=_sample_h_sql()),
)
def q133_stratified_exact_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sample (round 7): exactly 7 docs per
    source — the n smallest md5 sampling coordinates, hash-then-id as
    the total order. One shuffle on the stratum key; per-stratum
    bounded window. At 100 TB, pre-filter with q132's rate sampler at
    ~2-3x the target fraction so the rank sorts a sliver, not the
    corpus (operators/sampling docstring)."""
    from morphl_community_edition_spark.operators.sampling import (
        stratified_exact_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_exact_sample(
        docs, "doc_id", _EXACT_SAMPLE_N, "source", salt=_MIX_SALT
    ).orderBy("source", "doc_id")


@query(
    "q138_unigram_nll_quality",
    oracle="""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
               FROM documents),
    wf AS (SELECT doc_id, word FROM w WHERE word <> ''),
    v AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM wf GROUP BY word),
    t AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM v),
    m AS (SELECT word,
                 CAST(floor(ln(freq / CAST(t.total AS DOUBLE)) * 1e6 + 0.5)
                      AS BIGINT) AS slp
          FROM v, t),
    d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                 CAST(sum(slp) AS BIGINT) AS s
          FROM wf JOIN m USING (word) GROUP BY doc_id)
    SELECT doc_id, n_words,
           floor(((-CAST(s AS DOUBLE)) / (CAST(n_words AS DOUBLE) * 1e6))
                 * 1e6 + 0.5) / 1e6 AS avg_nll
    FROM d ORDER BY doc_id
    """,
)
def q138_unigram_nll_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score (round 7; the CCNet-style
    'how typical is this document of the corpus' filter, K4 family):
    per-doc average negative log-likelihood under the corpus unigram
    model — boilerplate/common-word docs score low, lexically unusual
    docs high; the score feeds a keep/bucket decision like q112's
    repetition signals.

    Hash-exactness device: per-word log-probs are rounded to 6
    decimals and INTEGER-SCALED once on the vocabulary-sized model
    frame, so the per-doc aggregation is an exact BIGINT sum —
    order-independent, immune to float-accumulation divergence (the
    functions/rounding money-column rule applied to logs; ln() itself
    is the one empirical-agreement operand, at 1e-6 granularity).

    Scale shape: corpus word count (two-phase agg) -> vocab-sized
    model projection -> model BROADCAST onto the exploded corpus ->
    per-doc integer-sum agg. No window, one corpus-side shuffle (the
    doc_id agg); the 1-row total joins by broadcast."""
    from morphl_community_edition_spark.operators.bpe import corpus_vocab

    docs = fan_out_narrow_scan(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    vocab = corpus_vocab(docs)
    total = vocab.agg(F.sum("freq").cast("bigint").alias("total"))
    model = vocab.crossJoin(F.broadcast(total)).select(
        "word",
        F.floor(
            F.log(F.col("freq") / F.col("total").cast("double")) * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("slp"),
    )
    d = (
        words.join(F.broadcast(model), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("slp").cast("bigint").alias("s"),
        )
    )
    return d.select(
        "doc_id",
        "n_words",
        crnd(
            (-F.col("s").cast("double"))
            / (F.col("n_words").cast("double") * F.lit(1e6)),
            6,
        ).alias("avg_nll"),
    ).orderBy("doc_id")


@query(
    "q139_adaptive_quality_cut",
    oracle=f"""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
               FROM documents),
    sc AS (SELECT doc_id, source,
                  {lexical_diversity_score_sql("ws")} AS score
           FROM w),
    th AS (SELECT source, quantile_cont(score, 0.25) AS thr
           FROM sc GROUP BY source)
    SELECT sc.doc_id AS doc_id, sc.source AS source, score,
           floor(thr * 1e6 + 0.5) / 1e6 AS thr
    FROM sc JOIN th USING (source)
    WHERE CAST(score AS DOUBLE) >= thr
    ORDER BY doc_id
    """,
)
def q139_adaptive_quality_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb-style ADAPTIVE per-source quality threshold (round 7,
    K4 family): instead of one global cutoff, each source keeps only
    documents at or above its own 25th-percentile quality — the
    published pipelines' answer to "a fixed threshold calibrated on
    web text guts books/code sources". Quality here = lexical
    diversity (distinct words per word), integer-scaled.

    Exactness: score = n_uniq·10⁶ DIV n_tok is PURE integer
    arithmetic (both positive, so trunc == floor == DuckDB //); the
    per-source threshold is the exact interpolated percentile over
    those integers — the q72 device, bit-identical across engines on
    integer inputs at fixture group sizes.

    Scale shape: the score is a per-row array projection (no explode,
    no shuffle); the threshold agg shuffles only (source, score)
    pairs — ~16-byte rows, not text — into a source-count-sized
    frame; thresholds BROADCAST back onto the corpus (plan-gated).
    At 100 TB the exact percentile's per-source sort is the known
    cost: the documented scale path swaps in approx_percentile
    (q73's GK sketch twin) with everything else unchanged."""
    docs = fan_out_narrow_scan(load_table(spark, sf_dir, "documents"))
    sc = docs.select(
        "doc_id",
        "source",
        lexical_diversity_score().alias("score"),
    )
    th = sc.groupBy("source").agg(F.expr("percentile(score, 0.25)").alias("thr"))
    return (
        sc.join(F.broadcast(th), "source")
        .filter(F.col("score").cast("double") >= F.col("thr"))
        .select("doc_id", "source", "score", crnd(F.col("thr"), 6).alias("thr"))
        .orderBy("doc_id")
    )


@query(
    "q140_bigram_nll_quality",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    p AS (SELECT doc_id, ws[gs] AS w1, ws[gs + 1] AS w2
          FROM w, LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(gs)),
    m AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
          FROM p GROUP BY w1, w2),
    c AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM m GROUP BY w1),
    sl AS (SELECT m.w1, m.w2,
                  CAST(floor(ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
                             * 1e6 + 0.5) AS BIGINT) AS slp
           FROM m JOIN c USING (w1)),
    d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST(sum(slp) AS BIGINT) AS s
          FROM p JOIN sl ON p.w1 = sl.w1 AND p.w2 = sl.w2
          GROUP BY doc_id)
    SELECT doc_id, n_bigrams,
           floor(((-CAST(s AS DOUBLE)) / (CAST(n_bigrams AS DOUBLE) * 1e6))
                 * 1e6 + 0.5) / 1e6 AS avg_nll
    FROM d ORDER BY doc_id
    """,
)
def q140_bigram_nll_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score (round 7; q138's unigram
    NLL upgraded to the conditional form real CCNet-style filters
    use): per-doc average negative log-likelihood of each word given
    its predecessor, P(w₂|w₁) = c(w₁w₂)/c(w₁·) with the denominator
    summed over the MODEL frame (= count of w₁ in non-final
    positions). Repetitive docs score near zero; docs with unusual
    word transitions score high.

    Exactness: q138's device — per-bigram log-probs are rounded and
    integer-scaled ONCE on the model frame (ln at 1e-6 granularity is
    the single empirical-agreement operand), so the per-doc
    aggregation is an exact order-independent BIGINT sum. Docs with
    <2 words have no bigrams and drop out in both engines identically.

    Scale shape: the bigram model is unique-bigram-sized — bounded by
    vocab² and in practice by corpus content, so unlike q138's vocab
    frame it is NOT assumed broadcastable at 100 TB: the doc-side
    score join is a plain (w1, w2) equi-join that AQE may broadcast
    when the model is small (it is here) and shuffle otherwise; both
    sides partial-agg before any exchange. No window anywhere
    (plan-gated)."""
    docs = fan_out_narrow_scan(load_table(spark, sf_dir, "documents"))
    ws = F.split(F.col("text"), " ")
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.struct(
                F.element_at(ws, i).alias("w1"),
                F.element_at(ws, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    p = docs.select("doc_id", F.explode(pairs).alias("pr")).select(
        "doc_id", "pr.w1", "pr.w2"
    )
    m = p.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    c = m.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    sl = m.join(c, "w1").select(
        "w1",
        "w2",
        F.floor(
            F.log(F.col("c12").cast("double") / F.col("c1").cast("double"))
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("slp"),
    )
    d = (
        p.join(sl, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("slp").cast("bigint").alias("s"),
        )
    )
    return d.select(
        "doc_id",
        "n_bigrams",
        crnd(
            (-F.col("s").cast("double"))
            / (F.col("n_bigrams").cast("double") * F.lit(1e6)),
            6,
        ).alias("avg_nll"),
    ).orderBy("doc_id")


_WSAMPLE_K = 50
_WSAMPLE_SALT = "w1"
_WSAMPLE_MAXW = 8
_WSAMPLE_DIV = 64
# the replica hash: md5(doc_id ‖ '#i' ‖ ':salt') reduced to the same
# 60-bit integer on both engines (the q133 device, replicated per
# weight unit); BOTH engines' weight expressions derive from the ONE
# constant pair above (the MIX_RATES convention — round-8 review)
_WSAMPLE_W_SQL = (
    f"least(greatest(n_chars // {_WSAMPLE_DIV}, 1), {_WSAMPLE_MAXW})"
)
_WSAMPLE_H_SQL = (
    "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#' || "
    f"CAST(i AS VARCHAR) || ':{_WSAMPLE_SALT}'), 1, 15) AS BIGINT)"
)


@query(
    "q146_weighted_sample",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, source,
             CAST({_WSAMPLE_W_SQL} AS INT) AS w_eff,
             min({_WSAMPLE_H_SQL}) AS priority
      FROM documents,
           LATERAL unnest(generate_series(0, {_WSAMPLE_W_SQL} - 1)) AS t(i)
      GROUP BY doc_id, source, n_chars
    )
    SELECT doc_id, source, w_eff, priority
    FROM p ORDER BY priority, doc_id LIMIT {_WSAMPLE_K}
    """,
)
def q146_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance-weighted sample (round 8; completes
    the sampling triple — q132 rate cut, q133 exact quota, q146
    weighted): top-50 docs by the minimum of w independent 60-bit
    hash coordinates, w = clamp(n_chars DIV 64, 1, 8) — longer docs
    get proportionally more chances, the integer-weight analogue of
    Efraimidis-Spirakis bottom-k sampling (exact exponential keys
    would need cross-engine float pow; the replication device keeps
    the draw hash-exact on every engine — operators/sampling
    docstring for the curvature trade-off).

    Scale shape (plan-gated): the priority is a pure per-row array
    projection (no explode, no shuffle) and the cut is
    TakeOrderedAndProject — sampling 100 TB costs one scan + a k-row
    reduce. The DuckDB oracle replays the identical replica hashes
    via LATERAL unnest and hash-matches exactly."""
    from morphl_community_edition_spark.operators.sampling import weighted_sample_topk

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(f"n_chars DIV {_WSAMPLE_DIV}").cast("int").alias("__w_raw"),
    )
    return (
        weighted_sample_topk(
            docs, "doc_id", "__w_raw", k=_WSAMPLE_K,
            salt=_WSAMPLE_SALT, max_weight=_WSAMPLE_MAXW,
        )
        .select("doc_id", "source", "w_eff", "priority")
        .orderBy("priority", "doc_id")
    )


def _pipeline_v3_oracle() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {int(round(r * _MIX_MOD))}"
        for s, r in sorted(MIX_RATES.items())
    )
    return f"""
    WITH RECURSIVE w AS (SELECT doc_id, source, n_chars, string_split(text, ' ') AS ws FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(ws[gs:gs+2], ' ') AS s
           FROM w, LATERAL unnest(generate_series(1, len(ws) - 2)) AS t(gs)),
    sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    i AS (SELECT a.doc_id AS a_doc, b.doc_id AS b_doc, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
    e AS (SELECT a_doc, b_doc FROM i
          JOIN sz sa ON sa.doc_id = a_doc JOIN sz sb ON sb.doc_id = b_doc
          WHERE inter >= 0.5 * (sa.n_sh + sb.n_sh - inter)),
    bi AS (SELECT a_doc AS n, b_doc AS m FROM e
           UNION SELECT b_doc, a_doc FROM e),
    reach(n, m) AS (
        SELECT n, n FROM (SELECT DISTINCT n FROM bi) nodes
        UNION
        SELECT r.n, bi.m FROM reach r JOIN bi ON bi.n = r.m
    ),
    comp AS (SELECT n AS doc_id, min(m) AS comp FROM reach GROUP BY n),
    sc AS (SELECT doc_id, {lexical_diversity_score_sql("ws")} AS score
           FROM w),
    k AS (SELECT comp, doc_id AS keeper_id FROM (
            SELECT c.comp, c.doc_id,
                   row_number() OVER (PARTITION BY c.comp
                                      ORDER BY sc.score DESC, c.doc_id) AS rn
            FROM comp c JOIN sc USING (doc_id)) WHERE rn = 1),
    losers AS (SELECT c.doc_id FROM comp c
               LEFT JOIN k ON k.comp = c.comp AND k.keeper_id = c.doc_id
               WHERE k.keeper_id IS NULL),
    surv AS (SELECT w.doc_id, w.source, w.n_chars, sc.score
             FROM w JOIN sc USING (doc_id)
             WHERE w.doc_id NOT IN (SELECT doc_id FROM losers)),
    th AS (SELECT source, quantile_cont(score, 0.25) AS thr
           FROM surv GROUP BY source),
    cut AS (SELECT surv.* FROM surv JOIN th USING (source)
            WHERE CAST(score AS DOUBLE) >= thr),
    samp AS (SELECT * FROM cut
             WHERE {_sample_h_sql(mod=True)} < CASE {cases} ELSE 0 END)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM samp GROUP BY source ORDER BY source
    """


@query("q149_curation_pipeline_v3", oracle=_pipeline_v3_oracle())
def q149_curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-7/8 curation machinery composed end-to-end, one hash
    over the chain INCLUDING stage order (the q122 device for this
    round's family): quality-aware near-dup dedup (q147's keeper
    election — clusters lose everyone but their best-scoring member)
    → adaptive per-source quality cut (q139's 25th-percentile rule,
    recomputed over the POST-dedup survivors — thresholds move when
    duplicates leave, which is the point of ordering dedup first)
    → deterministic rate sample (q132's allowlist mix) → per-source
    accounting (doc count, char mass, id-sum chain fingerprint).

    Scale shape: each stage inherits its component's gated plan —
    candidate-sized cluster machinery, map-side keeper collapse,
    broadcast thresholds, scan-side sampling filter; the only
    corpus-sized shuffles are the ones the components already own."""
    from morphl_community_edition_spark.operators.components import (
        dedup_clusters,
        keeper_election,
    )
    from morphl_community_edition_spark.operators.dedup import exact_jaccard_pairs
    from morphl_community_edition_spark.operators.sampling import hash_rate_sample

    docs = fan_out_narrow_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars", "text"
        )
    )
    score = lexical_diversity_score()
    edges = exact_jaccard_pairs(docs, threshold=0.5).select("a_doc", "b_doc")
    clusters = dedup_clusters(edges, "a_doc", "b_doc").select(
        F.col("n").alias("doc_id"), "comp"
    )
    member_scores = clusters.join(
        docs.select("doc_id", score.alias("score")), "doc_id"
    )
    losers = (
        keeper_election(member_scores)
        .filter(~F.col("is_keeper"))
        .select("doc_id")
    )
    surv = docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "source", "n_chars", score.alias("score")
    )
    th = surv.groupBy("source").agg(
        F.expr("percentile(score, 0.25)").alias("thr")
    )
    cut = surv.join(F.broadcast(th), "source").filter(
        F.col("score").cast("double") >= F.col("thr")
    )
    samp = hash_rate_sample(
        cut, "doc_id", MIX_RATES, "source", default_rate=0.0, salt=_MIX_SALT
    )
    return (
        samp.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
        )
        .orderBy("source")
    )
