"""Round-14 (VERDICT r13 item 6): decompose q157
persisted_hybrid_serve — the heaviest serve query (driver r13:
1.94 s) — the way q150 was decomposed in round 7, so the remaining
cost has a name: either a term we can cut, or the irreducible one
recorded in SCALE.md.

Stages timed (best-of-N each, bench profile, warm session; indexes
pre-built by a warm-up full run so every stage reads the committed
structures, which is the serve steady state):

  probe_read   — embeddings scan + vec_id==0 filter + collect (the
                 probe batch the caller hands to ann_index_topk)
  lex_leg      — bm25_topk from the q151 text index + rank window
  vec_leg      — ann_index_topk from the q150 index (router + int8
                 candidates + float re-rank)
  fuse_only    — RRF fusion + top-10 + documents payload join, fed by
                 PRE-COLLECTED leg results (so it times fusion alone)
  full         — the registered q157 (collect), for the sum check

Usage: python tools/profile_q157.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from morphl_community_edition_spark.catalog import load_table  # noqa: E402
from morphl_community_edition_spark.queries import QUERIES  # noqa: E402
from morphl_community_edition_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="morphl-profile-q157")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    from morphl_community_edition_spark.operators.ann_index import ann_index_topk
    from morphl_community_edition_spark.operators.fusion import rrf_fuse
    from morphl_community_edition_spark.operators.text_index import bm25_topk
    from morphl_community_edition_spark.queries.llm import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        _ensure_ann_index,
        _ensure_text_index,
    )

    # warm-up: builds both indexes; also the full-query reference time
    QUERIES["q157_persisted_hybrid_serve"](spark, SF_DIR).collect()
    text_idx = _ensure_text_index(spark, SF_DIR)
    ann_idx = _ensure_ann_index(spark, SF_DIR)

    emb = load_table(spark, SF_DIR, "embeddings")

    def probe_read():
        return emb.filter(F.col("vec_id") == 0).collect()

    def lex_leg():
        return (
            bm25_topk(spark, text_idx, BM25_TERMS, k=20, k1=BM25_K1, b=BM25_B)
            .select(
                "doc_id",
                F.row_number()
                .over(Window.orderBy(F.col("score_scaled").desc(), "doc_id"))
                .alias("rnk"),
            )
            .collect()
        )

    def vec_leg():
        return (
            ann_index_topk(
                spark,
                ann_idx,
                emb.filter(F.col("vec_id") == 0),
                k=20,
                n_candidates=50,
                n_probe=16,
            )
            .select(F.col("n_vec").alias("doc_id"), "rnk")
            .collect()
        )

    lex_rows = lex_leg()
    vec_rows = [(r.doc_id, r.rnk) for r in vec_leg()]

    def fuse_only():
        lex_df = spark.createDataFrame(
            [(r.doc_id, r.rnk) for r in lex_rows], "doc_id bigint, rnk int"
        )
        vec_df = spark.createDataFrame(vec_rows, "doc_id bigint, rnk int")
        fused = (
            rrf_fuse({"lex": lex_df, "vec": vec_df})
            .orderBy(F.col("rrf_scaled").desc(), "doc_id")
            .limit(10)
        )
        return (
            load_table(spark, SF_DIR, "documents")
            .join(F.broadcast(fused), "doc_id")
            .select("doc_id", "lex_rnk", "vec_rnk", "rrf_scaled", "source")
            .collect()
        )

    def full():
        return QUERIES["q157_persisted_hybrid_serve"](spark, SF_DIR).collect()

    stages = {
        "probe_read": probe_read,
        "lex_leg": lex_leg,
        "vec_leg": vec_leg,
        "fuse_only": fuse_only,
        "full": full,
    }
    out: dict[str, float] = {}
    for name, fn in stages.items():
        spark.sparkContext.setJobDescription(f"q157-decomp:{name}")
        best = 1e9
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
        print(f"# {name}: {out[name]:.3f}s", file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
