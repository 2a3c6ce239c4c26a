"""Approximate-nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k with pure built-ins (zip_with dot
product — JVM-side, codegen'd). Scale path: LSH random-hyperplane bucketing
(sign bits -> bucket key -> candidates only within bucket) and an IVF-style
coarse quantizer (deterministic hashed-seed centroids + assignment via the
same dot-product expression). 100 TB shape: queries are broadcast; the
corpus is never shuffled for brute force; LSH/IVF turn all-pairs into a
bucket-keyed shuffle.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"0D, (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
            f"0D, (acc, v) -> acc + v)"
        )
    )


def with_cosine(df: DataFrame, vec_col: str, query: list[float], out: str = "cosine") -> DataFrame:
    """Cosine similarity of every row's vec_col against a constant query
    vector (literal array -> broadcast to every task, no join)."""
    qn = float(np.sqrt(np.dot(query, query))) or 1.0
    qlit = F.array(*[F.lit(float(x)) for x in query])
    df2 = df.withColumn("__q", qlit)
    return (
        df2.withColumn(
            out,
            _dot(vec_col, "__q")
            / (F.greatest(_norm(vec_col), F.lit(1e-12)) * F.lit(qn)),
        ).drop("__q")
    )


def brute_force_topk(
    df: DataFrame, vec_col: str, query: list[float], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k: one scan + a k-row ordered take. Deterministic
    tie-break on id."""
    return (
        with_cosine(df, vec_col, query)
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def topk_per_query(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Batch top-k: broadcast the (small) query set against the corpus,
    window-rank per query. Corpus is scanned once, never shuffled; only the
    k best rows per query survive to the window."""
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("__qv"),
        _norm(vec_col).alias("__qn"),
    )
    scored = (
        corpus.select(F.col(corpus_id), F.col(vec_col), _norm(vec_col).alias("__cn"))
        .join(F.broadcast(q))
        .withColumn(
            "cosine",
            _dot(vec_col, "__qv")
            / (F.greatest(F.col("__cn") * F.col("__qn"), F.lit(1e-12))),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def with_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 12, dim: int | None = None,
    seed: int = 42, out: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane LSH (Charikar 2002): sign bit per hyperplane ->
    integer bucket. Hyperplanes are literal arrays (deterministic seed),
    evaluated JVM-side — no Python, no shuffle."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plit = F.array(*[F.lit(float(x)) for x in p])
        sign = (
            F.expr(
                f"aggregate(zip_with({vec_col}, __p{i}, (x, y) -> cast(x as double) * y), "
                f"0D, (acc, v) -> acc + v)"
            )
            > 0
        ).cast("long")
        df = df.withColumn(f"__p{i}", plit)
        bucket = bucket + sign * F.lit(1 << i)
    out_df = df.withColumn(out, bucket)
    return out_df.drop(*[f"__p{i}" for i in range(n_planes)])


def lsh_topk(
    corpus: DataFrame,
    query: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: restrict the exact cosine scan to the query's LSH bucket
    plus multi-probe neighbors within `probe_hamming` bit flips (standard
    multi-probe LSH: near vectors most likely land one sign-flip away).
    Recall/latency trade-off is (n_planes, probe_hamming); at scale the
    bucket column is a partition/cluster key so the scan prunes to the
    probed buckets' files."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes, seed)
    qbucket = 0
    for i, p in enumerate(planes):
        if float(np.dot(p, query)) > 0:
            qbucket |= 1 << i
    probes = {qbucket}
    if probe_hamming >= 1:
        probes |= {qbucket ^ (1 << i) for i in range(n_planes)}
    if probe_hamming >= 2:
        probes |= {
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    bucketed = with_lsh_bucket(corpus, vec_col, n_planes, dim, seed)
    return brute_force_topk(
        bucketed.filter(F.col("lsh_bucket").isin(list(probes))),
        vec_col, query, k, id_col,
    )


def ivf_assign(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    seed: int = 42,
) -> DataFrame:
    """IVF coarse quantizer, deterministic: centroids = hash-sampled corpus
    rows (ids where xxhash64(id) lands in the smallest n buckets), one
    assignment pass (argmin distance via the same codegen'd dot product).
    A production build would Lloyd-iterate; one pass is the partition-key
    generator here."""
    sample = (
        corpus.select(id_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(n_centroids)
        .collect()
    )
    centroids = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(sample)]
    best_id = F.lit(-1)
    best_score = F.lit(float("-inf"))
    df = corpus
    for ci, cvec in centroids:
        clit = F.array(*[F.lit(x) for x in cvec])
        df = df.withColumn(f"__c{ci}", clit)
        score = _dot(vec_col, f"__c{ci}")
        best_id = F.when(score > best_score, F.lit(ci)).otherwise(best_id)
        best_score = F.greatest(best_score, score)
    out = df.withColumn("ivf_cell", best_id).drop(
        *[f"__c{ci}" for ci, _ in centroids]
    )
    return out


def embedding_near_dup_pairs(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cosine_threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket the corpus (no
    all-pairs cross join — the shuffle is keyed on the bucket), verify exact
    cosine within buckets, keep pairs above the threshold. Vectors within a
    bucket share all sign bits, so true near-dups (cosine -> 1) co-bucket
    with high probability; recall can be raised with multiple plane seeds."""
    b = with_lsh_bucket(corpus, vec_col, n_planes, None, seed).select(
        F.col(id_col), F.col(vec_col), F.col("lsh_bucket"),
        _norm(vec_col).alias("__n"),
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r,
        on=[
            F.col("l.lsh_bucket") == F.col("r.lsh_bucket"),
            F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
        ],
    )
    cos = F.expr(
        f"aggregate(zip_with(l.{vec_col}, r.{vec_col}, "
        f"(x, y) -> cast(x as double) * cast(y as double)), 0D, (a, v) -> a + v)"
    ) / F.greatest(F.col("l.__n") * F.col("r.__n"), F.lit(1e-12))
    return (
        pairs.select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= cosine_threshold)
    )


def embedding_dedup(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cosine_threshold: float = 0.95,
) -> DataFrame:
    """Drop the higher-id member of every near-dup pair (min-id keeper,
    same policy as textops.minhash_dedup)."""
    losers = (
        embedding_near_dup_pairs(corpus, vec_col, id_col, cosine_threshold)
        .select(F.greatest("id_a", "id_b").alias(id_col))
        .distinct()
    )
    return corpus.join(losers, on=id_col, how="left_anti")
