"""Reciprocal-rank fusion (RRF) — hybrid retrieval's merge step.

A modern retrieval stack serves two rankers over the same corpus:
lexical BM25 (operators/text_index) and vector KNN
(operators/similarity / ann_index). RRF (Cormack, Clarke &
Buettcher, SIGIR 2009) fuses their per-query rank lists without any
score calibration: fused(d) = Σ_r 1/(K + rank_r(d)) over the rankers
r that returned d, with the standard K=60. It is the default hybrid
fusion in production search engines precisely because it only
consumes RANKS — the BM25 and cosine score scales never meet.

Exactness device (this repo's cross-engine contract): each
contribution is computed as ``SCALE div (K + rank)`` — pure BIGINT
floor division, identical in Spark (`div`) and ANSI SQL (`//`) — and
the fused score is the exact BIGINT sum of contributions, so ranking
ties break on (fused_scaled DESC, id) with no float anywhere.
SCALE=1e12 keeps six significant digits of separation between
adjacent ranks at K=60 (1/(60+1) - 1/(60+2) ≈ 2.6e-4 → ~2.6e8 scaled
units) — far above the ±1 truncation error per contribution.

Scale shape (100 TB corpus, q queries): each input ranking is
k-bounded PER QUERY (top-k lists, k ≤ ~1000), so fusion joins frames
of q·k rows — never corpus-sized. With a query column the join key is
(query_id, id) and the fused sort is a per-query window over ≤ r·k
rows; single-query fusion (the serve path) is a driver-tiny frame.
The expensive work happened upstream in the rankers; fusion itself is
shuffle-light by construction.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RRF_K = 60
RRF_SCALE = 10**12


def rrf_fuse(
    ranked: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    k_const: int = RRF_K,
    scale: int = RRF_SCALE,
) -> DataFrame:
    """Fuse named rank lists into one RRF ranking.

    ``ranked`` maps ranker name -> DataFrame carrying (id_col,
    rank_col) with rank 1-based within the list. Returns one row per
    id seen by ANY ranker: (id_col, <name>_rnk INT (null where that
    ranker missed the doc) per ranker, rrf_scaled BIGINT). Callers
    order by (rrf_scaled DESC, id_col) and cut top-k.

    The full-outer join chain is over k-bounded lists (see module
    docstring) — r-1 joins of tiny frames, each coalescing the id so
    later joins key correctly even for ids absent from earlier lists.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranking")
    sides = []
    for name, df in ranked.items():
        sides.append(
            df.select(
                F.col(id_col),
                F.expr(f"{scale} div ({k_const} + {rank_col})")
                .cast("bigint")
                .alias(f"{name}_rrf"),
                F.col(rank_col).cast("int").alias(f"{name}_rnk"),
            )
        )
    fused = sides[0]
    for s in sides[1:]:
        fused = fused.join(s, id_col, "full_outer")
    total = reduce(
        lambda a, b: a + b,
        [F.coalesce(F.col(f"{n}_rrf"), F.lit(0)) for n in ranked],
    )
    return fused.select(
        id_col,
        *[F.col(f"{n}_rnk") for n in ranked],
        total.cast("bigint").alias("rrf_scaled"),
    )
