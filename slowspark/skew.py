"""Deterministic skew handling (BASELINE.json north_rule: "partitioning /
shuffle / skew handled explicitly").

Hot-domain skew: Common-Crawl url distributions are Zipf — a handful of
domains dominate. Two defenses, both deterministic (salts are hashes of
natural keys, never rand(), so reruns/resumes are byte-identical):

1. salted_repartition — spread rows evenly before an expensive narrow stage
   (the parse UDF) regardless of how the scan grouped them.
2. salted_groupby_agg — two-phase aggregation for a skewed group key:
   partial agg on (key, salt) then final agg on key. Map-side combine
   already defuses most count/sum skew; the explicit salt handles the
   reduce-side case where one key's partials still overwhelm one task
   (e.g. collect_list-style aggs). AQE skew-join splitting
   (spark.sql.adaptive.skewJoin) covers residual join skew.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def det_salt(col: str | Column, buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of the given column(s).
    NOTE: to spread a HOT key, the salt must be derived from something that
    varies WITHIN the key (other row columns) — a salt that is a pure
    function of the key itself is a constant per key value and spreads
    nothing (round-1 ADVICE finding)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int")


def salted_repartition(
    df: DataFrame,
    key: str,
    partitions: int,
    buckets: int = 64,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Repartition on hash(key) + salt so a single hot key value spreads
    over up to `buckets` partitions instead of one.

    The salt is xxhash64 over `salt_cols` (default: every column except the
    key) — row-varying within a key, yet still deterministic in row CONTENT
    (no rand()/monotonically_increasing_id()), so reruns and checkpoint
    resumes place identical rows identically. Rows that are full duplicates
    co-locate (they hash alike), which is harmless: the downstream stage is
    narrow and content-identical rows are interchangeable."""
    if salt_cols is None:
        # hash expressions reject MAP types (map equality is order-free, so
        # Spark prohibits hashing them) — skip any column containing one
        salt_cols = [
            f.name
            for f in df.schema.fields
            if f.name != key and "MapType" not in repr(f.dataType)
        ]
    if not salt_cols:
        salt_cols = [key]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(buckets))
    return df.repartition(
        partitions,
        F.pmod(F.xxhash64(F.col(key)) + salt, F.lit(partitions)),
    )


def salted_groupby_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str = "url",
    buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: output_name -> (fn, input_col) with fn in {count,sum,min,max}.
    Phase 1 groups by (keys..., salt) — partials are bounded at
    buckets x |keys| rows per key; phase 2 merges partials by keys.
    """
    salt = det_salt(salt_col, buckets).alias("__salt")
    phase1_exprs = []
    phase2_exprs = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count("*").alias(name))
            phase2_exprs.append(F.sum(name).alias(name))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(name))
            phase2_exprs.append(F.sum(name).alias(name))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(name))
            phase2_exprs.append(F.min(name).alias(name))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(name))
            phase2_exprs.append(F.max(name).alias(name))
        else:
            raise ValueError(f"unsupported agg fn: {fn}")
    partial = df.groupBy(*keys, salt).agg(*phase1_exprs)
    return partial.groupBy(*keys).agg(*phase2_exprs)
