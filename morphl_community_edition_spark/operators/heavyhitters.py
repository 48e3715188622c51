"""Exact frequent-item mining at corpus scale: Misra-Gries candidate
generation + broadcast exact recount.

The pipeline op: "which words / shingles / template fragments exceed
support φ of the corpus?" — stopword discovery, boilerplate-fragment
mining, vocabulary heads. The naive plan is `GROUP BY item` over the
exploded corpus: map-side combine collapses each input partition to
its DISTINCT items, but for text vocabularies that is still
millions of rows × thousands of partitions across the wire, and the
reduce side materializes the full global vocabulary only to throw
away everything below the support line.

The scale path is candidates-then-verify (the q117 contamination
device, applied to frequency):

1. **Misra-Gries per partition** (one corpus pass, NO shuffle): a
   k-counter summary per input partition via ``mapInPandas`` — the
   iterator form carries ONE summary across all of a partition's
   Arrow batches, each batch folded in as an exact ``value_counts``
   and re-pruned by the merge rule of Agarwal et al., "Mergeability
   of Summaries" (TODS 2013): subtract the (k+1)-th largest counter
   from all, drop non-positives. Per-partition undercount is
   ≤ n_p/(k+1), so any item with GLOBAL count > N/k must survive in
   at least one partition (if it died everywhere, its count would be
   ≤ Σ n_p/(k+1) = N/(k+1) < N/k) — the candidate union is a
   guaranteed SUPERSET of the true heavy hitters. Wire cost: ≤ k+1
   rows per partition, not per-partition-distinct.
2. **Exact recount** (second corpus pass): broadcast-join the
   candidate list onto the exploded corpus — the filter collapses
   map-side, so the only shuffle carries candidate items — then an
   exact count and the support cut ``cnt·k > N``. The output is
   EXACT (MG only prunes), so a plain GROUP BY/HAVING oracle
   certifies the whole composition end-to-end.

Two scans, no vocabulary-sized shuffle: sampling-free, deterministic,
and the 100 TB shape is one narrow pass + one candidate-sized agg.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# collected candidate rows are driver state: k counters per input
# partition, so the bound is k × partitions. The valve errors loudly
# instead of OOMing the driver — raise k only with the partition
# count in view.
MAX_CANDIDATE_ROWS = 2_000_000


def misra_gries_summaries(items: DataFrame, col: str, k: int) -> DataFrame:
    """One (item, n) summary frame: per input partition, the ≤ k
    surviving Misra-Gries counter IDENTITIES (n = 0 rows) plus one
    marker row (item NULL, n = partition row count). Identities and
    exact partition sizes are all downstream needs — counter VALUES
    are under-estimates by construction and must not leak out.

    No shuffle: mapInPandas runs on the scan partitioning; the
    summary state lives across the partition's Arrow batches in the
    generator. The summary's item column keeps the INPUT column's
    type (round-9 advice: a hardcoded string schema silently
    stringified numeric items, and the recount join-back then
    compared string-vs-numeric — Spark casts both sides to double,
    losing precision for large int64 items)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    item_type = dict(items.dtypes)[col]

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n = 0
        for pdf in batches:
            vals = pdf[col].dropna()
            n += int(len(vals))
            for item, cnt in vals.value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > k:
                # Agarwal et al. merge: subtract the (k+1)-th largest
                # from every counter, keep positives (≤ k survive)
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {i: v - cut for i, v in counters.items() if v > cut}
        # object dtype, NOT inferred: a numeric key list with the None
        # marker appended coerces to float64 (NaN for None), silently
        # corrupting int64 identities above 2^53 — Arrow converts the
        # object column to the declared type exactly instead
        yield pd.DataFrame(
            {
                "item": pd.Series(list(counters.keys()) + [None], dtype="object"),
                "n": [0] * len(counters) + [n],
            }
        )

    return items.mapInPandas(mg, schema=f"item {item_type}, n long")


def heavy_hitters_exact(items: DataFrame, col: str, k: int) -> DataFrame:
    """EXACT items with count·k > N over ``items[col]`` (support 1/k),
    as (item, cnt) — Misra-Gries candidates, then a broadcast-join
    recount whose filter collapses the exploded corpus map-side
    (plan-gated). NULLs are excluded (they are not items). The
    candidate list and the empty frame carry the input column's type,
    so the recount join is same-typed (never the string-vs-numeric
    double cast)."""
    spark = items.sparkSession
    item_type = dict(items.dtypes)[col]
    # the valve must fire BEFORE the driver materializes anything
    # (round-8 review: a post-collect len() check can't prevent the
    # OOM it documents): persist the summary frame cluster-side —
    # it is tiny (≤ k+1 rows per partition) but k × partitions can
    # still be driver-hostile at 100 TB scan widths — count it there,
    # and only then collect.
    summary_df = misra_gries_summaries(items, col, k).persist()
    try:
        n_rows = summary_df.count()
        if n_rows > MAX_CANDIDATE_ROWS:
            raise RuntimeError(
                f"Misra-Gries candidate set ({n_rows} rows) exceeds "
                f"MAX_CANDIDATE_ROWS={MAX_CANDIDATE_ROWS}: k={k} × too many "
                "partitions for a driver collect — lower k or coalesce the scan"
            )
        summaries = summary_df.collect()
    finally:
        summary_df.unpersist()
    total = sum(r["n"] for r in summaries if r["item"] is None)
    cand = sorted({r["item"] for r in summaries if r["item"] is not None})
    if not cand:
        return spark.createDataFrame([], f"{col} {item_type}, cnt long")
    cand_df = spark.createDataFrame([(c,) for c in cand], f"{col} {item_type}")
    return (
        items.join(F.broadcast(cand_df), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * F.lit(int(k)) > F.lit(int(total)))
    )


def streaming_mg_candidates(
    items: DataFrame, col: str = "item", k: int = 200, n_slices: int = 16
) -> DataFrame:
    """Streaming Misra-Gries (I6 form of the candidate stage): the
    vocabulary is sliced by hash(item) mod n_slices; each slice holds
    ONE MG(k) summary in group state (applyInPandasWithState), folded
    per micro-batch by the same Agarwal et al. merge rule as the
    batch pass, and re-emits its full surviving candidate set every
    trigger with a per-slice monotone ``ver`` (the reader keeps the
    max-ver emission per slice).

    Guarantee carried over: an item's occurrences land entirely in
    ONE slice, and the slice summary undercounts by ≤ n_slice/(k+1)
    ≤ N/(k+1), so every item with stream-lifetime count > N/k is in
    the slice's final emission — the streamed candidate union is a
    superset of the true heavy hitters, exactly like the batch pass
    (S12-tested: candidates ⊇ exact, and the recount composition
    equals the batch q148 result).

    Scale shape: state is n_slices × k counters — BOUNDED, unlike a
    streaming word-count whose state is vocabulary-sized; slices give
    the state store parallelism without breaking the per-item
    locality the guarantee needs."""
    import pandas as pd  # noqa: F811 — local for the worker closure
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # the group-state schema is declared string — fail loudly instead
    # of silently stringifying numeric items (the batch pass derives
    # its schema; the fixed state schema keeps this variant strings-only)
    col_type = dict(items.dtypes)[col]
    if col_type != "string":
        raise ValueError(
            f"streaming_mg_candidates is strings-only (state schema is "
            f"array<string>); column {col!r} is {col_type} — cast it to "
            "string on both the stream and the recount side"
        )

    out_schema = T.StructType(
        [
            T.StructField("slice", T.IntegerType()),
            T.StructField("ver", T.LongType()),
            T.StructField("item", T.StringType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ver", T.LongType()),
            T.StructField("its", T.ArrayType(T.StringType())),
            T.StructField("cnts", T.ArrayType(T.LongType())),
        ]
    )

    def upd(key, pdfs, state: "GroupState"):
        (slc,) = key
        if state.exists:
            ver, its, cnts = state.get
            counters = dict(zip(its, cnts))
        else:
            ver, counters = 0, {}
        for pdf in pdfs:
            vals = pdf[col].dropna()
            for item, cnt in vals.value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {i: v - cut for i, v in counters.items() if v > cut}
        ver += 1
        state.update(
            (ver, list(counters.keys()), [int(v) for v in counters.values()])
        )
        yield pd.DataFrame(
            {
                "slice": [slc] * len(counters),
                "ver": [ver] * len(counters),
                "item": list(counters.keys()),
            }
        )

    sliced = items.withColumn(
        "slice", F.pmod(F.xxhash64(F.col(col)), F.lit(n_slices)).cast("int")
    )
    return sliced.groupBy("slice").applyInPandasWithState(
        upd,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
