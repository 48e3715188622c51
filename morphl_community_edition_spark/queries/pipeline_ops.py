"""Training-data pipeline operators beyond the similarity family:
deterministic dataset splitting, stratified sampling, and near-dup
cluster canonicalization (connected components).

Why hash-based splits instead of randomSplit: a 100 TB corpus is
re-materialized many times; membership of a document in train/val/test
must be a pure function of the document key, stable across runs,
engines, and partitionings. randomSplit is seed-dependent AND
partitioning-dependent (per-partition RNG streams), so it can't be the
contract. md5 is bit-identical everywhere, so both engines (and any
future re-run) agree row-for-row — and the check is a real oracle
hash-match, not a distribution-shape tolerance.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.operators.components import (
    dedup_clusters,
    keeper_election,
)
from morphl_community_edition_spark.operators import manifest as _ix_manifest
from morphl_community_edition_spark.operators.dedup import exact_jaccard_pairs
from morphl_community_edition_spark.operators.textstats import (
    lexical_diversity_score,
    lexical_diversity_score_sql,
)
from morphl_community_edition_spark.queries import query

# hex digit 1 of md5(key): '0'..'b' → train (12/16), 'c','d' → val,
# 'e','f' → test. Uniformity comes from md5; the split is a pure
# per-row projection — no shuffle, no state, trivially parallel.
_SPLIT_CASE_SQL = """CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
            ELSE 'test' END"""


@query(
    "q75_det_hash_split",
    oracle=f"""
    SELECT {_SPLIT_CASE_SQL} AS split,
           count(*) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           count(DISTINCT lang) AS n_langs,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM documents
    GROUP BY 1
    ORDER BY split
    """,
)
def q75_det_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/val/test split by md5(doc_id).
    Both engines compute the identical md5 hex, so assignment matches
    row-for-row; the aggregate fingerprint (count, char sum, min/max
    key) proves membership equality, not just split sizes."""
    docs = load_table(spark, sf_dir, "documents")
    hex1 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(hex1 <= "b", "train").when(hex1 <= "d", "val").otherwise("test")
    )
    return (
        docs.groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split")
    )


@query(
    "q76_stratified_sample",
    oracle="""
    SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn
    FROM (SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents) t
    WHERE rn <= 5
    ORDER BY lang, rn
    """,
)
def q76_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 5 docs per language, chosen by
    md5 order — a reproducible 'random' draw (hash order is
    uncorrelated with doc content) that re-selects the SAME rows on
    every run and engine, unlike df.sampleBy (per-partition RNG).
    Scale shape: one window per stratum — a single shuffle on lang;
    for heavy strata swap in a per-partition top-k (rank over md5 is
    min-k per group, which aggregates map-side)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .orderBy("lang", "rn")
    )


@query(
    "q77_dedup_components",
    oracle="""
    WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
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
    comp AS (SELECT n AS doc_id, min(m) AS comp FROM reach GROUP BY n)
    SELECT c.doc_id AS doc_id, c.comp AS comp,
           CAST(s.cluster_size AS BIGINT) AS cluster_size
    FROM comp c
    JOIN (SELECT comp, count(*) AS cluster_size FROM comp GROUP BY comp) s
      ON s.comp = c.comp
    ORDER BY comp, doc_id
    """,
)
def q77_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster canonicalization: exact-Jaccard pairs (>= 0.5)
    closed into connected components (operators/components.py —
    iterative min-label propagation; DuckDB oracle closes the same
    graph with a recursive CTE). The keeper per cluster is
    doc_id == comp. Similarity is NOT transitive, so this step — not
    the pair join — defines what 'duplicate' means corpus-wide."""
    docs = load_table(spark, sf_dir, "documents")
    edges = exact_jaccard_pairs(docs, threshold=0.5).select("a_doc", "b_doc")
    return (
        dedup_clusters(edges, "a_doc", "b_doc")
        .select(F.col("n").alias("doc_id"), "comp", "cluster_size")
        .orderBy("comp", "doc_id")
    )


@query(
    "q87_embedding_dedup_clusters",
    oracle="""
    WITH RECURSIVE e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    e AS (SELECT a.vec_id AS a_vec, b.vec_id AS b_vec
          FROM e0 a JOIN e0 b ON a.vec_id < b.vec_id
          WHERE list_dot_product(a.emb, b.emb)
                / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) >= 0.3),
    bi AS (SELECT a_vec AS n, b_vec AS m FROM e
           UNION SELECT b_vec, a_vec FROM e),
    reach(n, m) AS (
        SELECT n, n FROM (SELECT DISTINCT n FROM bi) nodes
        UNION
        SELECT r.n, bi.m FROM reach r JOIN bi ON bi.n = r.m
    ),
    comp AS (SELECT n AS vec_id, min(m) AS comp FROM reach GROUP BY n)
    SELECT c.vec_id AS vec_id, c.comp AS comp,
           CAST(s.cluster_size AS BIGINT) AS cluster_size
    FROM comp c
    JOIN (SELECT comp, count(*) AS cluster_size FROM comp GROUP BY comp) s
      ON s.comp = c.comp
    ORDER BY comp, vec_id
    """,
)
def q87_embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup CANONICALIZATION: threshold pairs
    (q38's GEMM path, cosine >= 0.3 — the fixture's top pair tail)
    closed into clusters by the same connected-components operator the
    text path uses (q77). One dedup-cluster contract, two similarity
    modalities. At production thresholds the edge source swaps to the
    LSH candidates; the closure is unchanged."""
    from morphl_community_edition_spark.catalog import table_path
    from morphl_community_edition_spark.operators.similarity import cosine_pairs_threshold
    from morphl_community_edition_spark.plans.hints import dataset_file_bytes

    emb = load_table(spark, sf_dir, "embeddings")
    edges = cosine_pairs_threshold(
        emb, threshold=0.3, source_bytes=dataset_file_bytes(table_path(sf_dir, "embeddings"))
    ).select("a_vec", "b_vec")
    return (
        dedup_clusters(edges, "a_vec", "b_vec")
        .select(F.col("n").alias("vec_id"), "comp", "cluster_size")
        .orderBy("comp", "vec_id")
    )


@query(
    "q88_frame_sample",
    oracle="""
    WITH f AS (SELECT doc_id, greatest(1, len(coalesce(text, '')) // 4) AS step,
                      coalesce(text, '') AS text FROM documents)
    SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
           CAST(len(substr(text, i * step + 1, step)) AS BIGINT) AS n_bytes,
           md5(substr(text, i * step + 1, step)) AS frame_md5
    FROM f, LATERAL unnest([0, 1, 2, 3]) AS t(i)
    ORDER BY doc_id, frame_idx
    """,
)
def q88_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 frame sampling, oracle-checked: the 1→N mapInPandas row
    explosion (operators/multimodal.sample_frames) fingerprinted per
    frame with md5 — DuckDB reproduces the exact byte slices with
    substr (the fixture text is ASCII, so byte == char offsets), so
    the match proves content equality of every frame, not just
    counts."""
    from morphl_community_edition_spark.operators.multimodal import attach_media, sample_frames

    docs = load_table(spark, sf_dir, "documents")
    # NULL-text contract: both sides coerce missing text to empty
    # (oracle coalesces; sample_frames treats NULL payload as b"") —
    # the fixture is null-free but the contract shouldn't depend on it
    frames = sample_frames(attach_media(docs), n_frames=4)
    return (
        frames.select(
            "doc_id",
            "frame_idx",
            "n_bytes",
            F.md5(F.col("frame")).alias("frame_md5"),
        )
        .orderBy("doc_id", "frame_idx")
    )


@query(
    "q93_dedup_corpus",
    oracle="""
    WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
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
    cs AS (SELECT c.doc_id, c.comp, s.cluster_size
           FROM comp c JOIN (SELECT comp, count(*) AS cluster_size
                             FROM comp GROUP BY comp) s ON s.comp = c.comp)
    SELECT d.doc_id,
           CAST(coalesce(cs.cluster_size - 1, 0) AS BIGINT) AS n_absorbed,
           d.lang, d.n_chars
    FROM documents d
    LEFT JOIN cs ON cs.doc_id = d.doc_id
    WHERE cs.doc_id IS NULL OR cs.doc_id = cs.comp
    ORDER BY d.doc_id
    """,
)
def q93_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END dedup pipeline as one query — what a training-
    data build actually runs: exact-Jaccard near-dup edges (>= 0.5,
    q37's operator) → connected components (q77's operator) → keep the
    min-id doc per cluster plus every clusterless doc; each keeper
    reports how many near-dups it absorbed. The oracle closes the same
    graph with a recursive CTE and applies the same keeper rule, so
    the hash check covers edge generation, closure, AND the keep/drop
    decision in one go.

    Scale shape: the only additions over q77 are a left join of the
    (cluster-members-sized, tiny) component table back onto documents
    and the keeper filter — no new fact-sized shuffle. At 100 TB the
    expensive step remains candidate generation; swap exact_jaccard
    edges for minhash_neardup_pairs (K2) and this pipeline is the
    production dedup, unchanged downstream."""
    docs = load_table(spark, sf_dir, "documents")
    edges = exact_jaccard_pairs(docs, threshold=0.5).select("a_doc", "b_doc")
    comps = dedup_clusters(edges, "a_doc", "b_doc").select(
        F.col("n").alias("doc_id"), "comp", "cluster_size"
    )
    return (
        docs.join(F.broadcast(comps), "doc_id", "left")
        .filter(F.col("comp").isNull() | (F.col("doc_id") == F.col("comp")))
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_size") - 1, F.lit(0)).cast("long").alias("n_absorbed"),
            "lang",
            "n_chars",
        )
        .orderBy("doc_id")
    )


@query(
    "q98_corpus_curation",
    oracle=f"""
    WITH RECURSIVE t0 AS (SELECT doc_id, text, lang, n_chars,
                                 string_split(text, ' ') AS ws
                          FROM documents),
    q AS (SELECT doc_id, text, lang, n_chars, ws,
                 floor((least(len(ws) / CAST(100 AS DOUBLE), CAST(1 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
                        + len(list_filter(ws, x -> list_contains(['the','a','and','of','to','in','is','it'], x))) / CAST(len(ws) AS DOUBLE) * CAST(0.3 AS DOUBLE)
                        + length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / CAST(length(text) AS DOUBLE) * CAST(0.2 AS DOUBLE)) * 1e6 + 0.5) / 1e6
                     AS quality
          FROM t0),
    kept0 AS (SELECT doc_id, lang, n_chars, ws FROM q
              WHERE quality > 0.40 AND lang <> 'zh'),
    sh AS (SELECT DISTINCT doc_id, array_to_string(ws[gs:gs+2], ' ') AS s
           FROM kept0, LATERAL unnest(generate_series(1, len(ws) - 2)) AS t(gs)),
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
    final AS (SELECT k.doc_id, k.lang, k.n_chars
              FROM kept0 k LEFT JOIN comp c ON c.doc_id = k.doc_id
              WHERE c.doc_id IS NULL OR c.doc_id = c.comp)
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
                ELSE 'test' END AS split,
           lang,
           count(*) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc
    FROM final
    GROUP BY 1, lang
    ORDER BY split, lang
    """,
)
def q98_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE composed training-data build — every K-family stage chained
    in realistic order (cheap row filters before the expensive pair
    stage): quality score > 0.40 (q34's exact blend, drops ~1/3) →
    language filter (≠ zh) → near-dup removal on the SURVIVORS
    (q93's edge+component+keeper rule) → deterministic md5 split
    (q75) → per-(split, lang) summary. One hash check covers the whole
    chain including stage ORDER (dedup over the filtered set produces
    different keepers than filter-after-dedup).

    Scale shape: the filters are projections that shrink the corpus
    BEFORE shingling (the expensive stage) — at 100 TB that ordering
    is the difference between shingling 100 TB and shingling 60 TB;
    everything downstream of the pair join is dimension-sized."""
    from morphl_community_edition_spark.operators.textstats import quality_features

    docs = load_table(spark, sf_dir, "documents")
    kept0 = (
        quality_features(docs)
        .filter((F.col("quality") > 0.40) & (F.col("lang") != "zh"))
        .select("doc_id", "text", "lang", "n_chars")
    )
    edges = exact_jaccard_pairs(kept0, threshold=0.5).select("a_doc", "b_doc")
    comps = dedup_clusters(edges, "a_doc", "b_doc").select(
        F.col("n").alias("doc_id"), "comp"
    )
    final = (
        kept0.join(F.broadcast(comps), "doc_id", "left")
        .filter(F.col("comp").isNull() | (F.col("doc_id") == F.col("comp")))
    )
    hex1 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = F.when(hex1 <= "b", "train").when(hex1 <= "d", "val").otherwise("test")
    return (
        final.groupBy(split.alias("split"), "lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
        )
        .orderBy("split", "lang")
    )


# q114's df-valve, corpus-relative (verdict r5 asks #1/#4): a shingle
# appearing in more than max(INCR_VALVE_MIN_DF, frac·n_docs) documents
# is boilerplate, not near-dup evidence. At sf0.01 (500 docs → limit
# 10 > max observed df 7) the cut is a fixture no-op; at corpus scale
# it bounds the batch×corpus intersection the way q106's
# STOP_SHINGLE_MAX_DF bounds the contamination screen.
# canonical home: operators/dedup.py — one definition feeds q114's
# direct form, its f-string oracle, AND the persisted-index form
# (operators/incremental_index), which are "equal by construction"
# only while these stay shared (round-7 review)
from morphl_community_edition_spark.operators.dedup import (  # noqa: E402
    INCR_NEAR_THRESHOLD,
    INCR_VALVE_FRAC,
    INCR_VALVE_MIN_DF,
)


def incremental_dedup_stages(
    docs: DataFrame,
    is_new,
    n_docs: int,
    stop_frac: float = INCR_VALVE_FRAC,
) -> dict[str, DataFrame]:
    """The named intermediate frames of the incremental-dedup
    pipeline — ONE builder shared by incremental_dedup_frame (the
    registered q114) and tools/profile_q114.py (the SCALE.md stage
    decomposition), so the published per-stage numbers can never
    drift from the pipeline q114 actually runs (round-7 review)."""
    from morphl_community_edition_spark.operators.dedup import (
        resolve_doc_freq_limit,
        word_shingles,
    )
    from morphl_community_edition_spark.plans.hints import fan_out_narrow_scan

    stop_df_limit = resolve_doc_freq_limit(stop_frac, n_docs, min_df=INCR_VALVE_MIN_DF)
    sh = word_shingles(
        fan_out_narrow_scan(docs.select("doc_id", "source", "text")), "text", 3
    ).select("doc_id", "source", F.explode("shingles").alias("s"))
    # df-valve (the q106/dedup.py device, batch-probed form): document
    # frequency is counted ONLY for shingles present in the new batch —
    # corpus postings probe the broadcast batch-shingle set and
    # non-matches never reach the aggregation, whose exchange is
    # |batch-shingles|-bounded by map-side partial agg. The stop set is
    # a SUBSET of the batch's shingles, so broadcasting it is safe by
    # construction. Sizes (na/nb) are recomputed over the PRUNED
    # postings so the ratio stays a true Jaccard over the reduced
    # feature space (same contract as exact_jaccard_pairs' valved path).
    batch_sh = sh.filter(is_new).select("s").distinct()
    stop = (
        sh.join(F.broadcast(batch_sh), "s")
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > stop_df_limit)
        .select("s")
    )
    shv = sh.join(F.broadcast(stop), "s", "left_anti")
    sz = shv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        shv.filter(is_new)
        .select(F.col("doc_id").alias("new_doc"), "s")
        .join(shv.filter(~is_new).select(F.col("doc_id").alias("ex_doc"), "s"), "s")
        .groupBy("new_doc", "ex_doc")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    raw_j = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    near = (
        inter.join(sz.select(F.col("doc_id").alias("new_doc"), F.col("n_sh").alias("na")), "new_doc")
        .join(sz.select(F.col("doc_id").alias("ex_doc"), F.col("n_sh").alias("nb")), "ex_doc")
        .filter(raw_j >= INCR_NEAR_THRESHOLD)
        .select("new_doc")
        .distinct()
        .withColumn("__near", F.lit(1))
    )
    ex_hashes = (
        docs.filter(~is_new)
        .select(F.md5(F.col("text").cast("binary")).alias("h"))
        .distinct()
        .withColumn("__exact", F.lit(1))
    )
    new_docs = docs.filter(is_new).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h")
    )
    return {
        "shingle_explode": sh,
        "batch_shingles": batch_sh,
        "stop_set": stop,
        "valved_shingles": shv,
        "valved_sizes": sz,
        "intersection": inter,
        "near_verify": near,
        "exact_hashes": ex_hashes,
        "new_docs": new_docs,
    }


def incremental_dedup_frame(
    docs: DataFrame,
    is_new,
    n_docs: int,
    stop_frac: float = INCR_VALVE_FRAC,
) -> DataFrame:
    """Classify each NEW-batch document against the EXISTING corpus
    (columns doc_id/source/text; ``is_new`` a boolean Column) —
    exact_dup / near_dup / unique. Shared by q114 and the fixed-batch
    scale measurement (tools/sweep protocol: a production batch does
    NOT grow with the corpus, so the honest 10× experiment holds the
    batch constant; SCALE.md round 6).

    ``n_docs`` is the corpus document count, passed by the caller (one
    count() job there) so the valve limit is corpus-relative without
    re-counting here."""
    st = incremental_dedup_stages(docs, is_new, n_docs, stop_frac)
    new_docs, ex_hashes, near = st["new_docs"], st["exact_hashes"], st["near_verify"]
    # ex_hashes is EXISTING-CORPUS-sized: never hint it broadcast — at
    # scale the membership probe is a shuffle on the 16-byte hash
    # (linear; AQE still broadcast-converts it at fixture size). The
    # near set IS batch-bounded, so its hint is safe by construction.
    return (
        new_docs.join(ex_hashes, "h", "left")
        .join(F.broadcast(near.withColumnRenamed("new_doc", "doc_id")), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("__exact") == 1, "exact_dup")
            .when(F.col("__near") == 1, "near_dup")
            .otherwise("unique")
            .alias("status"),
        )
        .orderBy("doc_id")
    )


@query(
    "q114_incremental_dedup",
    oracle=f"""
    WITH w AS (SELECT doc_id, source, text, string_split(text, ' ') AS ws
               FROM documents),
    sh AS (SELECT DISTINCT doc_id, source, array_to_string(ws[gs:gs+2], ' ') AS s
           FROM w, LATERAL unnest(generate_series(1, len(ws) - 2)) AS t(gs)),
    bsh AS (SELECT DISTINCT s FROM sh WHERE source = 'src1'),
    bdf AS (SELECT sh.s, count(*) AS df
            FROM sh JOIN bsh ON sh.s = bsh.s GROUP BY sh.s),
    stop AS (SELECT s FROM bdf
             WHERE df > GREATEST({INCR_VALVE_MIN_DF},
                                 CAST(floor({INCR_VALVE_FRAC} *
                                      (SELECT count(*) FROM documents)) AS BIGINT))),
    shv AS (SELECT * FROM sh WHERE s NOT IN (SELECT s FROM stop)),
    sz AS (SELECT doc_id, count(*) AS n_sh FROM shv GROUP BY doc_id),
    i AS (SELECT a.doc_id AS new_doc, b.doc_id AS ex_doc, count(*) AS inter
          FROM shv a JOIN shv b ON a.s = b.s
          WHERE a.source = 'src1' AND b.source <> 'src1'
          GROUP BY a.doc_id, b.doc_id),
    near AS (SELECT DISTINCT new_doc
             FROM i JOIN sz sa ON i.new_doc = sa.doc_id
                    JOIN sz sb ON i.ex_doc = sb.doc_id
             WHERE inter / (sa.n_sh + sb.n_sh - inter) >= {INCR_NEAR_THRESHOLD}),
    exact AS (SELECT DISTINCT n.doc_id
              FROM w n JOIN w e ON md5(n.text) = md5(e.text)
              WHERE n.source = 'src1' AND e.source <> 'src1')
    SELECT n.doc_id AS doc_id,
           CASE WHEN exact.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN near.new_doc IS NOT NULL THEN 'near_dup'
                ELSE 'unique' END AS status
    FROM w n
    LEFT JOIN exact ON n.doc_id = exact.doc_id
    LEFT JOIN near ON n.doc_id = near.new_doc
    WHERE n.source = 'src1'
    ORDER BY n.doc_id
    """,
)
def q114_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup — the production pattern for a
    continuously-fed corpus: classify each NEW-batch document (source
    'src1' plays the incoming batch) against the EXISTING corpus
    without ever joining existing docs to each other. Tiers, cheapest
    first: exact (content-md5 semi-probe against the existing hash
    set), then near-dup (3-gram inverted-index Jaccard >= 0.5 over the
    df-valved shingle space, probe side = new batch only), else unique.

    Scale shape (100 TB corpus + small daily batch): every join is
    new-batch-sized on one side. The existing corpus contributes its
    md5 set (one column) and its shingle postings; in production both
    are PRE-BUILT incremental indexes — here they derive inline from
    the same table, which only adds a linear pass. The inverted-index
    intersection is valved (verdict r5 #1): batch shingles whose corpus
    document frequency exceeds max(2, 2% of docs) are dropped from BOTH
    sides before the join, so a heavy-hitter 3-gram ("of the and")
    can no longer make per-shingle cost new-df × existing-df unbounded.
    The oracle mirrors the cut CTE-for-CTE. One extra count() job
    resolves the corpus-relative limit."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = _DOC_COUNT_MEMO.setdefault(spark, {}).get(sf_dir)
    if n_docs is None:
        n_docs = docs.count()
        _DOC_COUNT_MEMO[spark][sf_dir] = n_docs
    from morphl_community_edition_spark.plans.hints import fan_out_narrow_scan

    return incremental_dedup_frame(
        fan_out_narrow_scan(docs), F.col("source") == "src1", n_docs=n_docs
    )


# session -> {sf_dir -> documents row count} for the valve limit: the
# fixture tables are immutable within a process, so bench's rebuild
# loops pay the count() job once, not per build. Weak session key —
# same rationale as catalog._TABLE_MEMO.
_DOC_COUNT_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict[str, int]]" = (
    weakref.WeakKeyDictionary()
)


@query("q134_indexed_incremental_dedup")
def q134_indexed_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q114's PRODUCTION form (round 7): classify the same src1 batch
    against a PERSISTED postings index (operators/incremental_index)
    instead of re-shingling the corpus per batch — the answer to the
    round-7 decomposition, which named the corpus shingle explode as
    q114's irreducible per-batch term. Registered with q114's exact
    oracle attached below (the two forms are equal by construction,
    so one SQL twin certifies both); the in-query index build is the
    one corpus pass a real pipeline pays at ingest time, amortized
    across every later batch."""
    import hashlib
    import os

    from morphl_community_edition_spark.operators.incremental_index import (
        build_dedup_index,
        incremental_dedup_with_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("source") != "src1").select("doc_id", "text")
    batch = docs.filter(F.col("source") == "src1").select("doc_id", "text")
    n_docs = _DOC_COUNT_MEMO.setdefault(spark, {}).get(sf_dir)
    if n_docs is None:
        n_docs = docs.count()
        _DOC_COUNT_MEMO[spark][sf_dir] = n_docs
    # path is per-APPLICATION (applicationId), not shared across
    # processes: two concurrent runs on one host must never overwrite
    # each other's index mid-read (round-7 review)
    from morphl_community_edition_spark.catalog import index_root

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(
        index_root(spark), "morphl_dedup_index", spark.sparkContext.applicationId, tag
    )
    # the index build is the ingest-time cost a production pipeline
    # pays ONCE — memoized per (session, sf_dir) like the count memos
    # (fixtures immutable in-process; invalidate_tables drops it), so
    # warm re-runs measure the amortized per-batch classify, not a
    # rebuild (round-7 sweep: 17.9 s/run unmemoized vs ~2 s amortized).
    # The directory is re-checked on every hit: a /tmp cleaner can
    # remove it in a long-lived session, and the right response is a
    # rebuild, not an AnalysisException.
    built = _INDEX_MEMO.setdefault(spark, {})
    if built.get(sf_dir) != path or not _ix_manifest.committed_slices(path):
        build_dedup_index(existing, path)
        built[sf_dir] = path
    return incremental_dedup_with_index(spark, path, batch, n_docs=n_docs)


# session -> {sf_dir -> built index path}: result-affecting staleness
# class (a rewritten fixture needs a rebuilt index), cleared by
# catalog.invalidate_tables alongside the count memos
_INDEX_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict[str, str]]" = (
    weakref.WeakKeyDictionary()
)


@query("q153_compacted_index_dedup")
def q153_compacted_index_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q134 after a COMPACTION cycle (round 10): the existing corpus
    reaches the index as a build slice plus an appended batch-0 slice,
    `compact_index` merges them into one, and the src1 batch is
    classified against the compacted index. Equal to q114/q134 by
    construction — compaction is a pure physical re-layout (row-union
    of the slices, state carried on the compacted record) — so q114's
    oracle below certifies that the merge changed NOTHING: one hash
    covers build -> append -> compact -> classify. The q124/q134
    "pruning made vacuous" oracle-reuse device, applied to storage
    maintenance instead of probe pruning."""
    import hashlib
    import os

    from morphl_community_edition_spark.catalog import index_root
    from morphl_community_edition_spark.operators.incremental_index import (
        append_to_index,
        build_dedup_index,
        compact_index,
        incremental_dedup_with_index,
    )

    from morphl_community_edition_spark.plans.hints import fan_out_narrow_scan

    docs = fan_out_narrow_scan(load_table(spark, sf_dir, "documents"))
    existing = docs.filter(F.col("source") != "src1").select("doc_id", "text")
    batch = docs.filter(F.col("source") == "src1").select("doc_id", "text")
    n_docs = _DOC_COUNT_MEMO.setdefault(spark, {}).get(sf_dir)
    if n_docs is None:
        n_docs = docs.count()
        _DOC_COUNT_MEMO[spark][sf_dir] = n_docs
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(
        index_root(spark), "morphl_dedup_index_compacted",
        spark.sparkContext.applicationId, tag,
    )
    memo_key = f"{sf_dir}#compacted"
    built = _INDEX_MEMO.setdefault(spark, {})
    if built.get(memo_key) != path or not _ix_manifest.committed_slices(path):
        # deterministic halves so the slice layout (hence the merge)
        # is reproducible across runs and engines
        build_dedup_index(existing.filter(F.col("doc_id") % 2 == 0), path)
        append_to_index(
            existing.filter(F.col("doc_id") % 2 != 0), path, batch_id=0
        )
        merged = compact_index(spark, path)
        assert merged == 2, f"expected to merge base+batch, merged {merged}"
        built[memo_key] = path
    return incremental_dedup_with_index(spark, path, batch, n_docs=n_docs)


@query(
    "q147_quality_keeper_dedup",
    oracle=f"""
    WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
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
    csz AS (SELECT comp, count(*) AS cluster_size FROM comp GROUP BY comp),
    sc AS (SELECT doc_id, {lexical_diversity_score_sql("ws")} AS score
           FROM w),
    m AS (SELECT c.doc_id, c.comp, CAST(s.cluster_size AS BIGINT) AS cluster_size,
                 sc.score
          FROM comp c JOIN csz s USING (comp) JOIN sc USING (doc_id)),
    k AS (SELECT comp, doc_id AS keeper_id FROM (
            SELECT comp, doc_id,
                   row_number() OVER (PARTITION BY comp
                                      ORDER BY score DESC, doc_id) AS rn
            FROM m) WHERE rn = 1)
    SELECT m.doc_id AS doc_id, m.comp AS comp, m.cluster_size AS cluster_size,
           m.score AS score, (m.doc_id = k.keeper_id) AS is_keeper
    FROM m JOIN k USING (comp)
    ORDER BY comp, doc_id
    """,
)
def q147_quality_keeper_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup canonicalization (round 8): q77's
    clusters, but the keeper per cluster is the member with the BEST
    quality score (q139's integer lexical-diversity score: distinct
    words per word, ×10⁶ integer-div), ties to min doc_id — published
    curation pipelines keep the best copy of a duplicated page, not an
    arbitrary one. This also answers SemDeDup's documented min-id
    deviation with an argmax election that stays hash-exact: the score
    is pure integer arithmetic, so both engines agree bit-for-bit.

    Scale shape: edges/components are the q77 machinery (candidate-
    sized, not corpus-sized); the score is a per-row array projection
    on the corpus scan; the election is a min-of-struct agg with
    map-side partial collapse + a flag join-back
    (operators/components.keeper_election, plan-gated) — never a
    window, so a celebrity cluster collapses before the wire instead
    of shipping and sorting its membership."""
    docs = load_table(spark, sf_dir, "documents")
    # method="auto" (round 11, verdict r10 #7): this query is the
    # measured Σdf² worst case of the family (the dup90 decade tail) —
    # identity collapse + the df-profile dispatch cut that tail while
    # the pair set stays tuple-identical (oracle unchanged)
    edges = exact_jaccard_pairs(docs, threshold=0.5, method="auto").select(
        "a_doc", "b_doc"
    )
    clusters = dedup_clusters(edges, "a_doc", "b_doc").select(
        F.col("n").alias("doc_id"), "comp", "cluster_size"
    )
    # score AFTER the member join, not corpus-wide: clusters is
    # candidate-sized (near-dup members only) and nothing downstream
    # needs non-member scores, so the split/array_distinct work runs
    # on member rows alone — AQE broadcasts the cluster side, so the
    # corpus never shuffles for this join (round-8 review)
    scored = (
        docs.select("doc_id", "text")
        .join(clusters, "doc_id")
        .select(
            "doc_id", "comp", "cluster_size",
            lexical_diversity_score().alias("score"),
        )
    )
    return keeper_election(scored).select(
        "doc_id", "comp", "cluster_size", "score", "is_keeper"
    ).orderBy("comp", "doc_id")


# same results by construction => same oracle certifies both forms
from morphl_community_edition_spark.queries import ORACLE_SQL as _ORACLE_SQL  # noqa: E402

_ORACLE_SQL["q134_indexed_incremental_dedup"] = _ORACLE_SQL["q114_incremental_dedup"]
_ORACLE_SQL["q153_compacted_index_dedup"] = _ORACLE_SQL["q114_incremental_dedup"]


@query(
    "q158_leakage_safe_split",
    oracle="""
    WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
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
    rep AS (SELECT d.doc_id, d.n_chars, COALESCE(c.comp, d.doc_id) AS rep
            FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
    SELECT CASE WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
                WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT rep) AS BIGINT) AS n_clusters,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM rep GROUP BY 1 ORDER BY split
    """,
)
def q158_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (round 11): q75's
    deterministic md5 split keyed by the NEAR-DUP CLUSTER
    REPRESENTATIVE instead of the document id. A per-doc split lets
    two near-duplicates straddle the train/test boundary — the exact
    eval-contamination channel the q106/q117 screens exist to detect
    after the fact; splitting by the q77 component label prevents it
    by construction (a cluster is atomic: all members share rep ⇒
    share split). Docs in no cluster are their own rep, so the split
    degrades to q75's on a duplicate-free corpus. The aggregate
    fingerprint (counts, cluster counts, char sum, min/max key)
    proves membership equality per split, q75's device.

    Scale shape: edges + components are q77's audited plans (LSH
    candidates at production thresholds, forest contraction); the
    rep join is doc-sized on the component side (components frame ≤
    corpus), and the split itself is a pure per-row projection —
    no new shuffle class beyond q77."""
    docs = load_table(spark, sf_dir, "documents")
    # method="auto" (round 12, verdict r11 #6): q158's edge derivation
    # was the direct postings join regardless of corpus shape — the
    # worst decade row in SCALE_r11 (grown 7.25×, dup90 7.05×). The
    # measured dispatch (dup-mass-gated identity collapse + sampled
    # Σdf² profile) is the same device that cut q147's grown decade
    # 17.6→3.9; its low-dup overhead is two sub-second probe aggs.
    edges = exact_jaccard_pairs(docs, threshold=0.5, method="auto").select(
        "a_doc", "b_doc"
    )
    comps = dedup_clusters(edges, "a_doc", "b_doc").select(
        F.col("n").alias("doc_id"), "comp"
    )
    rep = docs.join(comps, "doc_id", "left").select(
        "doc_id", "n_chars", F.coalesce("comp", "doc_id").alias("rep")
    )
    hex1 = F.substring(F.md5(F.col("rep").cast("string")), 1, 1)
    split = F.when(hex1 <= "b", "train").when(hex1 <= "d", "val").otherwise("test")
    return (
        rep.groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("rep").cast("bigint").alias("n_clusters"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split")
    )
