"""Batch MERGE / keyed upsert (L6 — the reference's daily prediction
write, as a relational operator).

MorphL upserts each day's prediction batch into Cassandra by primary
key [PUBLIC, SURVEY.md §1]; the streaming twin here is
``streaming/sinks.foreach_batch_upsert``. This module is the BATCH
form: ``merge_upsert(base, delta, keys)`` = SCD-1 merge where delta
rows win on key collision, base rows survive otherwise — the exact
semantics of `MERGE INTO ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED
THEN INSERT` with whole-row updates.

Implementation is a full outer join on the keys + per-column coalesce
(delta side first). A union + row_number()=1 formulation would also
work but shuffles the union twice (window partition + final); the
outer join is one shuffle per side on the same key and stays entirely
in codegen.

Scale: both sides shuffle once on the merge key; at 100 TB the base
side is the big one, so co-locating it (bucketed layout on the key —
see the bucketed-join plan gate) removes its shuffle entirely and the
merge cost becomes ~|delta|. Deterministic by construction: no
dropDuplicates, no first() without order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    assert_unique_delta: bool = False,
) -> DataFrame:
    """SCD-1 keyed merge: delta wins on collision, base survives
    otherwise. Both inputs must share a schema; output keeps it.

    PRECONDITION: ``delta`` must be key-unique. SQL MERGE raises on a
    second WHEN MATCHED hit; a full-outer join instead MULTIPLIES the
    matched base row per duplicate delta key, silently. Callers whose
    delta is not unique-by-construction (ours are: one prediction row
    per user per batch) should pass ``assert_unique_delta=True`` —
    one cheap aggregate job (count vs distinct-key count, both
    map-side combinable) that raises instead of corrupting.

    The distinct count goes over a STRUCT of the keys: a bare
    ``count_distinct(k1, k2)`` skips rows where ANY key is NULL (SQL
    COUNT semantics), so a genuinely key-unique delta containing a
    NULL-keyed row would miscount and raise a false error. Struct
    comparison treats NULL fields as equal-to-NULL (group-by
    semantics), matching how the merge join itself groups keys."""
    # cheap driver-side validations FIRST (round-9 review: the
    # uniqueness agg is a cluster job — invalid inputs used to pay it
    # and then die with an opaque UNRESOLVED_COLUMN instead of these)
    if [(f.name, f.dataType) for f in base.schema.fields] != [
        (f.name, f.dataType) for f in delta.schema.fields
    ]:
        raise ValueError(
            "merge_upsert requires identical schemas (names AND types); "
            f"base={base.schema.simpleString()} delta={delta.schema.simpleString()}"
        )
    missing = [k for k in keys if k not in base.columns]
    if missing:
        raise ValueError(f"merge keys {missing} not in schema {base.columns}")
    if assert_unique_delta:
        row = delta.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.struct(*[F.col(k) for k in keys])).alias("nk"),
        ).first()
        if row["n"] != row["nk"]:
            raise ValueError(
                f"merge_upsert delta is not key-unique on {keys}: "
                f"{row['n']} rows over {row['nk']} distinct keys"
            )
    payload = [c for c in base.columns if c not in keys]
    b = base.select(
        *[F.col(k).alias(f"__bk_{k}") for k in keys],
        *[F.col(c).alias(f"__b_{c}") for c in payload],
    )
    # whole-row update semantics need a presence flag, NOT per-column
    # coalesce: a legitimately-NULL delta value must still override the
    # base value, never mix columns from both versions of the row
    d = delta.select(
        *[F.col(k).alias(f"__dk_{k}") for k in keys],
        F.lit(True).alias("__d_present"),
        *[F.col(c).alias(f"__d_{c}") for c in payload],
    )
    # NULL-SAFE key equality (round-8 review): the list-form join uses
    # EqualTo, under which a NULL-keyed delta row never meets the
    # NULL-keyed base row — both would survive, the exact stale-row
    # corruption this merge exists to prevent — while the uniqueness
    # assert above already treats NULL=NULL (struct semantics). One
    # key definition for both checks.
    cond = None
    for k in keys:
        c = F.col(f"__bk_{k}").eqNullSafe(F.col(f"__dk_{k}"))
        cond = c if cond is None else (cond & c)
    merged = b.join(d, cond, "full_outer")
    take_delta = F.col("__d_present").isNotNull()

    def resolved(c: str):
        if c in keys:
            return F.when(take_delta, F.col(f"__dk_{c}")).otherwise(
                F.col(f"__bk_{c}")
            )
        return F.when(take_delta, F.col(f"__d_{c}")).otherwise(F.col(f"__b_{c}"))

    # output columns in the INPUT's order (round-9 review: the old
    # keys-first projection broke the documented "output keeps the
    # schema" contract whenever keys were not the leading columns)
    return merged.select(*[resolved(c).alias(c) for c in base.columns])
