"""Count-Min Sketch — bounded-memory frequency estimation for heavy
hitters over unbounded streams (Cormode & Muthukrishnan 2005).

The 100 TB problem: "which terms / domains / fingerprints are hot" over
a stream whose exact groupBy state would grow with the key universe.
A CMS is a depth x width counter grid — memory FIXED at d*w cells
regardless of universe size — where every occurrence increments one
cell per row (cell_j = hash_j(value) mod width) and a point estimate is
the MIN over the value's d cells: never an underestimate, over by at
most epsilon*N with probability 1-delta at the textbook sizing.

Spark shape: the sketch IS a DataFrame of nonzero cells (j, col, c) —
built with one map-side-combined groupBy over the d exploded hash
positions per occurrence, so the shuffle carries at most d*w cell rows
per partition no matter how many occurrences flow through (the same
bound that makes the block-built Bloom filter scale,
bloomdedup.build_bloom). Sketches MERGE by unionByName + the same
groupBy-sum — the associative property that makes per-batch sketches
composable across a stream's epochs. Queries broadcast the sketch
(d*w rows) and take one min-aggregation per candidate value.

Hashes are xxhash64(value, j) pmod width — Spark-reproducible from a
materialized position table by any engine (the bloomdedup/minhash
oracle convention); everything downstream is integer SQL.

No reference analog (/root/reference is a slow-log parser, src/*.rs).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def cms_params(epsilon: float, delta: float) -> tuple[int, int]:
    """(depth, width) for additive error <= epsilon * N with probability
    >= 1 - delta: width = ceil(e / epsilon), depth = ceil(ln(1/delta))."""
    if not 0.0 < epsilon < 1.0:
        raise ValueError(f"cms_params: epsilon must be in (0, 1), got {epsilon}")
    if not 0.0 < delta < 1.0:
        raise ValueError(f"cms_params: delta must be in (0, 1), got {delta}")
    return math.ceil(math.log(1.0 / delta)), math.ceil(math.e / epsilon)


def cms_positions(
    df: DataFrame, value_col: str, depth: int, width: int
) -> DataFrame:
    """One (value, j, col) row per input row per sketch row j: col =
    xxhash64(value, j) pmod width. Keeps every OTHER column of `df`
    (weights ride along)."""
    js = F.array(*[F.lit(j) for j in range(depth)])
    return df.select(
        "*", F.explode(js).alias("j")
    ).withColumn(
        "col", F.pmod(F.xxhash64(F.col(value_col), F.col("j")), F.lit(width))
    )


def build_cms(
    df: DataFrame,
    value_col: str,
    depth: int,
    width: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Nonzero sketch cells (j, col, c): c = sum of weights (1 per row if
    `weight_col` is None) of the values hashing there. One shuffle whose
    width is bounded by depth*width cells per map partition."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return (
        cms_positions(df.select(value_col, *( [weight_col] if weight_col else [] )),
                      value_col, depth, width)
        .groupBy("j", "col")
        .agg(F.sum(w).alias("c"))
    )


def merge_cms(*sketches: DataFrame) -> DataFrame:
    """Union per-batch/per-partition sketches into one — cell-wise sum,
    the CMS merge law. Same cell bound as build_cms."""
    if not sketches:
        raise ValueError("merge_cms: need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "col").agg(F.sum("c").alias("c"))


def cms_query(
    values: DataFrame,
    cms: DataFrame,
    value_col: str,
    depth: int,
    width: int,
) -> DataFrame:
    """(value, cms_est) point estimates for the candidate values: min
    over the value's depth cells; a value whose cell was never touched
    estimates 0 (left-join null). The sketch side broadcasts (<= d*w
    rows); one per-value min aggregation is the only shuffle."""
    pos = cms_positions(
        values.select(value_col).distinct(), value_col, depth, width
    )
    return (
        pos.join(F.broadcast(cms), ["j", "col"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    k: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002) per
    group: the k smallest xxhash64 values over the DISTINCT inputs —
    (group..., h, rk) rows, rk 1-based. Unlike HLL, KMV with a fixed
    hash is fully DETERMINISTIC, so two engines (or two runs) produce
    the identical sketch — the property that makes it value-hash
    verifiable where approx_count_distinct is not.

    Scale shape: distinct (one map-side-combined shuffle), then a
    per-group window bottom-k — parallel across groups; for ONE
    giant group prefer the two-phase rank (corpus._distributed_rank)
    to avoid a single-partition sort, the standard window caveat."""
    if k < 2:
        raise ValueError(f"kmv_sketch: k must be >= 2, got {k}")
    from pyspark.sql import Window

    gcols = list(group_cols)
    hashed = (
        df.select(*gcols, F.col(value_col).alias("__v"))
        .distinct()
        .select(*gcols, F.xxhash64("__v").alias("h"))
    )
    w = Window.partitionBy(*gcols).orderBy("h") if gcols else Window.orderBy("h")
    return (
        hashed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*gcols, "h", "rk")
    )


def kmv_estimate(
    sketch: DataFrame, k: int, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(group..., n_distinct_est): (k-1) / u_(k) where u_(k) maps the
    k-th smallest signed-64 hash onto (0, 1). A group holding FEWER than
    k hashes has every distinct value in the sketch — its count is
    exact, by definition of bottom-k, and is returned as such. All
    arithmetic is reproducible double math over the sketch rows — the
    oracle recomputes it from the same materialized hashes."""
    gcols = list(group_cols)
    agg = sketch.groupBy(*gcols).agg(
        F.count("*").alias("__n"), F.max("h").alias("__hk")
    )
    u = (F.col("__hk").cast("double") - F.lit(float(-(2 ** 63)))) / F.lit(
        float(2 ** 64)
    )
    return agg.select(
        *gcols,
        F.when(F.col("__n") < k, F.col("__n").cast("double"))
        .otherwise(F.lit(float(k - 1)) / u)
        .alias("n_distinct_est"),
    )


def merge_kmv(
    k: int, *sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Union per-batch sketches and keep the bottom-k again — the KMV
    merge law (hash values are values, so distinct-union then bottom-k
    equals the whole-stream sketch exactly)."""
    if not sketches:
        raise ValueError("merge_kmv: need at least one sketch")
    from pyspark.sql import Window

    gcols = list(group_cols)
    out = sketches[0].select(*gcols, "h")
    for s in sketches[1:]:
        out = out.unionByName(s.select(*gcols, "h"))
    w = Window.partitionBy(*gcols).orderBy("h") if gcols else Window.orderBy("h")
    return (
        out.distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*gcols, "h", "rk")
    )


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    cms: DataFrame,
    candidates: DataFrame,
    depth: int,
    width: int,
) -> DataFrame:
    """Estimate-vs-exact audit over a candidate set: (value, exact,
    cms_est). The CMS guarantee — cms_est >= exact always, and over by
    at most epsilon*N w.h.p. — is checkable row by row; `df` supplies
    the exact counts (at audit scale; in production the exact side is
    the expensive thing the sketch replaces)."""
    exact = (
        df.join(candidates.select(value_col).distinct(), value_col, "left_semi")
        .groupBy(value_col)
        .agg(F.count("*").alias("exact"))
    )
    est = cms_query(candidates, cms, value_col, depth, width)
    return exact.join(est, value_col)
