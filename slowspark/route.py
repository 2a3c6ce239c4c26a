"""Entry-kind fan-out routing (BASELINE.json north_star).

The reference's EntryStatement enum (/root/reference/src/types.rs:249-257)
is the routing key: SqlStatement / AdminCommand / InvalidStatement, plus our
ParseError lane (the reference panics instead, src/codec.rs:313-327).

Kind discrimination is a column, not control flow: each sink is a filter on
the same cached parsed DataFrame, so the expensive parse stage runs once and
the four writes are narrow scans of the cached result.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, functions as F

KINDS = ("SqlStatement", "AdminCommand", "InvalidStatement", "ParseError")

SINK_NAMES: Mapping[str, str] = {
    "SqlStatement": "sql_statements",
    "AdminCommand": "admin_commands",
    "InvalidStatement": "invalid_statements",
    "ParseError": "parse_errors",
}


def route(entries: DataFrame) -> dict[str, DataFrame]:
    """Split the parsed table into per-kind sinks. Row-disjoint and
    row-complete by construction: union of sinks == input (routed-row
    equality is pinned by tests)."""
    return {
        SINK_NAMES[k]: entries.filter(F.col("entry_kind") == k) for k in KINDS
    }


def write_sinks(
    entries: DataFrame,
    base_path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> dict[str, str]:
    """Fan-out writes. The sql sink is partitioned by sql_type (query-time
    partition pruning for per-type rollups); dt-partitioning (by
    date(log_time)) is what a production Iceberg table would add.

    The input is persisted for the duration of the four writes: each sink is
    a filter over the SAME materialized rows, so the upstream plan (the
    expensive Python parse stage, when called on an unmaterialized
    parse_pages output) executes once, not once per sink. Inputs that are
    already cached/materialized are left alone."""
    paths: dict[str, str] = {}
    already_cached = entries.storageLevel.useMemory or entries.storageLevel.useDisk
    if not already_cached:
        entries = entries.persist()
    try:
        sinks = route(entries)
        for name, df in sinks.items():
            path = f"{base_path}/{name}"
            writer = df.write.mode(mode).format(fmt)
            if name == "sql_statements":
                writer = (
                    df.withColumn("dt", F.to_date("log_time"))
                    .write.mode(mode).format(fmt)
                    .partitionBy("sql_type", "dt")
                )
            writer.save(path)
            paths[name] = path
    finally:
        if not already_cached:
            entries.unpersist()
    return paths
