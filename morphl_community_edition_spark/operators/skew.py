"""Skew mitigation (SURVEY.md §5.1 / SCALE.md): salted joins and
salted aggregation for keys whose frequency breaks hash partitioning.

AQE's skew-join handling covers sort-merge joins automatically; these
operators are for the cases AQE can't see — e.g. a hot key in a
broadcast-ineligible join, or a groupBy where one key holds 30% of
all rows (two-phase salted aggregation keeps every task bounded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the LEFT (large/skewed) side.

    Left rows get a random salt in [0, n_salts); the right side is
    replicated n_salts times with every salt value, and the join key
    becomes (key, salt) — a hot key now spreads over n_salts tasks.
    Cost: right side inflates n_salts× (use for small-to-medium right
    sides that just miss the broadcast threshold, or cap replication
    to the known-hot keys only).

    Only left-preserving modes are valid: a right/full outer join
    would emit each unmatched right row once PER SALT REPLICA.
    """
    # normalize Spark's own alias spellings before the allowlist
    # (round-9 review: 'semi'/'anti'/'leftouter' are valid
    # left-preserving spellings Spark accepts)
    norm = how.lower().replace("_", "")
    if norm not in ("inner", "left", "leftsemi", "leftanti", "leftouter", "semi", "anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched right rows "
            "are replicated n_salts times under right/full outer modes"
        )
    for side, frame in (("left", left), ("right", right)):
        if "__salt" in frame.columns:
            raise ValueError(
                f"salted_join: {side} side already has a '__salt' column — "
                "the helper name is reserved (drop or rename it first)"
            )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    right_rep = right.select("*", salts)
    left_salted = left.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    out = left_salted.join(right_rep, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` is a list of (input_col, fn, out_col) with fn ∈
    {sum, count, min, max}: phase 1 aggregates on (key, salt) — hot
    keys split across n_salts tasks — phase 2 merges the partials on
    key alone (n_salts rows per key, trivially cheap). Algebraic
    aggregates only; avg = sum/count composed by the caller.
    """
    if "__salt" in df.columns:
        raise ValueError(
            "salted_agg: input already has a '__salt' column — the helper "
            "name is reserved (drop or rename it first)"
        )
    partial_exprs, merge_exprs = [], []
    for col, fn, out in aggs:
        if fn == "count":
            partial_exprs.append(F.count(col).alias(out))
            merge_exprs.append(F.sum(out).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(out))
            merge_exprs.append(F.sum(out).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(out))
            merge_exprs.append(F.min(out).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(out))
            merge_exprs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r}; use the base groupBy")
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    # NOTE on float sums: the two-phase shape reassociates the
    # addition, so sum(double) can differ from the single-phase result
    # in the last ulp — exactly as any repartitioning (or AQE re-plan)
    # does. count/min/max and integer sums are bit-exact; for
    # deterministic money sums feed scaled longs (functions/rounding
    # .to_scaled_long), which this rewrite preserves exactly.
    partial = salted.groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*merge_exprs)
