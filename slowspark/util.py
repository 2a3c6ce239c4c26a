"""Shared plan-shape utilities: eager materialization and bucket capping.

These exist because two patterns recur across the dedup/similarity family:

  - self-joins on UDF-produced tables must materialize the UDF output
    first (a lazy cache lets both join sides race to recompute the UDF
    subtree — measured 2-3x signature cost run-to-run);
  - bucket-keyed candidate joins need a safety cap against pathological
    (viral-template) buckets, and that cap must never be silent.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

logger = logging.getLogger("slowspark")


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize a DataFrame and truncate its lineage.

    With a reliable checkpoint dir configured (spark.sparkContext.
    setCheckpointDir — what a production cluster job should do), uses
    .checkpoint(): blocks live in fault-tolerant storage and survive
    executor loss. Otherwise falls back to .localCheckpoint(), which is
    exactly right for local mode but NOT fault-tolerant on a cluster
    (executor churn loses blocks AND the truncated lineage prevents
    recompute). Used before self-joins on UDF-produced tables and inside
    iterative loops (plan growth)."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path) for `path` via the Hadoop FS API — resolves the
    scheme (file://, hdfs://, s3a://, ...) from the session's Hadoop conf,
    so the same call works on local dirs in the sandbox and object stores
    on a cluster. This is the one sanctioned way slowspark probes/writes
    index and marker files (sources.compact_pages uses the same API for
    sizing); os.path/open on an s3a:// string would silently probe the
    driver's local disk instead."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def fs_exists(spark, path: str) -> bool:
    """True iff `path` exists on its (scheme-resolved) filesystem."""
    fs, p = _hadoop_fs(spark, path)
    return bool(fs.exists(p))


def fs_mkdirs(spark, path: str) -> None:
    fs, p = _hadoop_fs(spark, path)
    fs.mkdirs(p)


def fs_write_text_atomic(spark, path: str, content: str) -> None:
    """Write a small text file (marker / JSON metadata) so a torn write
    never looks valid: the bytes land in `<path>.tmp` first, then a rename
    publishes them. On rewrite the rename uses
    FileContext.rename(..., Options.Rename.OVERWRITE) where the store
    supports it, so a concurrent reader sees either the old content or the
    new content — never an absent path (absence is itself an observable
    torn state: a reader in a delete-to-rename window would conclude the
    marker is missing and trigger a spurious rebuild). Where overwrite
    rename is unavailable (some object-store connectors), the fallback is
    delete-then-rename: still crash-safe (the final path is never
    partially written) but NOT concurrent-reader-safe on rewrite — a
    reader can observe the gap."""
    jvm = spark._jvm
    fs, p = _hadoop_fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
    try:
        fctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            p.toUri(), spark._jsc.hadoopConfiguration()
        )
        gw = spark.sparkContext._gateway
        opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
        opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fctx.rename(tmp, p, opts)
        return
    except Exception:
        logger.debug(
            "fs_write_text_atomic: overwrite rename unavailable for %s; "
            "falling back to delete-then-rename (crash-safe, not "
            "concurrent-reader-safe on rewrite)", path,
        )
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise IOError(f"fs_write_text_atomic: rename {tmp} -> {p} failed")


def fs_read_text(spark, path: str) -> str:
    """Read a small text file (marker / JSON metadata) via the Hadoop FS
    API. Only for driver-side metadata a few KB in size — datasets go
    through spark.read."""
    fs, p = _hadoop_fs(spark, path)
    stream = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def capped_by_bucket(
    df: DataFrame,
    keys: list[str],
    max_bucket_size: int,
    label: str,
    log_drops: bool = True,
) -> DataFrame:
    """Drop every bucket (group over `keys`) larger than `max_bucket_size`
    via a left-semi join on the surviving keys.

    No-silent-caps rule: by default the dropped-bucket count and row count
    are computed eagerly (one tiny aggregate job over the bucket-size
    table — the caller explicitly opted into capping, and a cap that
    truncates recall without a trace is how candidates disappear unnoticed)
    and emitted through the `slowspark` logger at WARNING. Pass
    log_drops=False to keep the plan fully lazy (e.g. inside plan-shape
    tests).

    The input is materialized first on the eager path: `df` is almost
    always a UDF-derived band/signature table, and without truncating its
    lineage the drop-stats job, the size aggregate, and BOTH sides of the
    left-semi join would each recompute the whole upstream UDF subtree
    (measured 4x wall on the sf0.1 dedup-skew bench: capped 42s vs
    uncapped 10.8s before this materialize)."""
    if log_drops:
        df = materialize(df)
    sizes = df.groupBy(*keys).agg(F.count("*").alias("__bn"))
    if log_drops:
        stats = (
            sizes.filter(F.col("__bn") > max_bucket_size)
            .agg(
                F.count("*").alias("nb"),
                F.coalesce(F.sum("__bn"), F.lit(0)).alias("nr"),
            )
            .first()
        )
        if stats["nb"]:
            logger.warning(
                "%s: max_bucket_size=%d dropped %d bucket(s) / %d row(s) "
                "from candidate generation (recall truncated for those "
                "buckets; run the bucket histogram to inspect)",
                label, max_bucket_size, stats["nb"], stats["nr"],
            )
    kept = sizes.filter(F.col("__bn") <= max_bucket_size).select(*keys)
    return df.join(kept, keys, "left_semi")
