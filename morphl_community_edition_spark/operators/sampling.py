"""Deterministic sampling for training-data mixing (K-family, round
7): the downsampling half of data mixing — q120's epoch_mix
UPsamples under-represented sources; these operators cut
over-represented ones. Both are RNG-free: sampling decisions hash
document identity (functions/hashing.md5_long60 — identical on every
engine), so a sample is reproducible across runs, engines, cluster
sizes, and partitionings, and is itself DuckDB-oracle-checkable
(q132/q133). A `rand()` sample would be none of those.

Two forms, two plan shapes:

- ``hash_rate_sample``: keep a row iff
  h(key ‖ salt) mod 10^12 < round(rate·10^12), with a per-stratum
  rate map (10^12 buckets resolve the sub-ppm rates the 100 TB
  pre-filter recipe needs; ordering uses the FULL 60-bit hash).
  A PURE scan-side filter — no shuffle, no state, whole-stage
  codegen; the 100 TB default (sampling 100 TB costs one scan). The
  kept fraction converges to the rate (law of large numbers on the
  hash), it is not exact per stratum.
- ``stratified_exact_sample``: exactly ``n`` rows per stratum — the
  n smallest hashes (rank window per stratum). One shuffle on the
  stratum key; the window is per-stratum-bounded, and at 100 TB you
  pre-filter with hash_rate_sample at ~2-3× the target fraction
  first so the sort ranks a sliver, not the corpus (the standard
  top-n-by-hash trick; not needed at fixture scale).

Salting: the salt is part of the sampling identity — two pipelines
using different salts draw independent samples; re-running with the
same salt reproduces the sample exactly (the property a training-data
audit needs).

NULL keys (round-9 review): a NULL identity has no sampling
coordinate — md5(NULL) is NULL, which the rate filter silently
dropped while the window/top-k forms sorted it FIRST (ASC NULLS
FIRST), letting NULL-keyed rows deterministically steal quota slots
and diverge from the DuckDB twins (NULLS LAST default). One rule for
all three samplers now: NULL-keyed rows are excluded up front —
identity-hashed sampling requires an identity. Callers with nullable
keys coalesce to a sentinel first, explicitly.

Duplicate key values: the tie-break order is (hash, key), so two
ROWS sharing the same key value are interchangeable at a quota/k
boundary — which one survives is partition-order-dependent. The
reproducibility contract therefore assumes key_col is unique per row
(a document id); with duplicate keys the SET of selected keys is
still deterministic, the surviving payload row for a duplicated key
is not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from morphl_community_edition_spark.functions.hashing import md5_long60

# rate-bucket modulus: 10^12 resolves parts-per-TRILLION rates — the
# round-8 review killed the old 10^6: at the 100 TB design point the
# documented recipe (rate pre-filter at 2-3× a tiny target fraction)
# needs sub-ppm rates, which int(rate·10^6) floored to ZERO
MOD = 10**12


def sample_hash(key: Column, salt: str) -> Column:
    """The sampling coordinate: the FULL 60-bit md5 of
    `key ‖ ':' ‖ salt` (round-8 review: the old % 10^6 reduction made
    the exact sampler's order degenerate to key tie-breaks inside
    10^6-row buckets at corpus scale — a low-doc_id ingestion-order
    bias; ordering now uses all 60 bits, and only the RATE compare
    reduces mod MOD)."""
    return md5_long60(F.concat(key.cast("string"), F.lit(":" + salt)))


def hash_rate_sample(
    df: DataFrame,
    key_col: str,
    rates: dict[str, float],
    strata_col: str,
    default_rate: float = 0.0,
    salt: str = "mix1",
) -> DataFrame:
    """Rate-based deterministic stratified sample: keep a row iff its
    sampling coordinate mod MOD falls below round(rate·MOD). Strata
    not in ``rates`` use ``default_rate`` (0.0 = drop unknown strata —
    the allowlist posture a curated mix wants). round(), not int():
    0.29·10^12 is 289999999999.99994 in binary — truncation would
    silently drop the top bucket of every non-dyadic rate (round-8
    review)."""
    thr = F.lit(int(round(default_rate * MOD)))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(rate * MOD)))
        ).otherwise(thr)
    return df.filter(
        F.col(key_col).isNotNull()
        & (sample_hash(F.col(key_col), salt) % MOD < thr)
    )


def stratified_exact_sample(
    df: DataFrame,
    key_col: str,
    n_per_stratum: int,
    strata_col: str,
    salt: str = "mix1",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer only if the
    stratum is smaller): the n smallest sampling coordinates, hash
    then key as the total tie-break order."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        sample_hash(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("__srk", F.row_number().over(w))
        .filter(F.col("__srk") <= n_per_stratum)
        .drop("__srk")
    )


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "w1",
    max_weight: int = 16,
) -> DataFrame:
    """Deterministic WEIGHTED top-k sample (round 8 — the third
    sampling form: q132 rate, q133 exact-quota, this one
    importance-weighted): each row draws ``w`` independent 60-bit
    sampling coordinates h(key ‖ '#i' ‖ salt), i < w (the row's
    integer weight, clamped to [1, max_weight]), keeps the MINIMUM as
    its priority, and the k smallest priorities corpus-wide win.

    This is the bottom-k sketch over replicated hash coordinates —
    the deterministic integer-weight analogue of the
    Efraimidis-Spirakis exponential-keys sampler (public recipe): a
    row with weight w has w chances at a small coordinate, so
    selection odds grow ~linearly in w for the small-fraction regime
    (P = 1-(1-p)^w), while the whole draw stays RNG-free — the same
    sample on every engine, run, cluster size, and partitioning, and
    DuckDB-oracle-checkable (q146). Exact exponential keys would need
    float pow/log whose libm rounding differs across engines — the
    integer replication trades a cosmetic curvature difference for
    hash-exactness (the q143 rationale).

    Scale shape: the priority is a pure per-row projection (the
    replica loop is an array expression — no explode, no shuffle) and
    the global cut is top-k (TakeOrderedAndProject, never a full
    sort): sampling 100 TB costs one scan + a k-row reduce.
    ``max_weight`` bounds the per-row array work — a corpus-derived
    weight column must be clamped anyway (one runaway doc must not
    monopolize the sample)."""
    w = F.least(
        F.greatest(F.col(weight_col).cast("int"), F.lit(1)), F.lit(max_weight)
    )
    pr = F.array_min(
        F.transform(
            F.sequence(F.lit(0), w - F.lit(1)),
            lambda i: md5_long60(
                F.concat(
                    F.col(key_col).cast("string"),
                    F.lit("#"),
                    i.cast("string"),
                    F.lit(":" + salt),
                )
            ),
        )
    )
    return (
        df.filter(F.col(key_col).isNotNull())
        .select("*", w.alias("w_eff"), pr.alias("priority"))
        .orderBy(F.col("priority").asc(), F.col(key_col).asc())
        .limit(k)
    )
