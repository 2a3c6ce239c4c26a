"""Per-partition lineage + metrics tables (BASELINE.json north_rule).

The decode_eof analog (/root/reference/src/codec.rs:334-351): the reference
errors on leftover non-whitespace bytes; we surface the same signal as
ParseError rows plus these per-partition / per-page metrics tables, so a
10^12-row job reports residue instead of dying.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def partition_metrics(entries: DataFrame) -> DataFrame:
    """One row per task partition: rows in, parse errors, distinct pages.
    spark_partition_id is evaluated where the data lives — the lineage of
    which task produced which slice."""
    return (
        entries
        .groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("entries_out"),
            F.sum(
                (F.col("entry_kind") == "ParseError").cast("long")
            ).alias("parse_errors"),
            F.approx_count_distinct("url").alias("approx_pages"),
            F.sum(F.length("statement_raw")).alias("statement_bytes"),
        )
    )


def page_lineage(entries: DataFrame) -> DataFrame:
    """Per-page lineage: entries per url + error flags; a page whose
    parse produced errors flags a lineage warning rather than failing."""
    return (
        entries
        .groupBy("url")
        .agg(
            F.count("*").alias("n_entries"),
            F.sum(
                (F.col("entry_kind") == "ParseError").cast("long")
            ).alias("n_errors"),
            F.min("entry_index").alias("first_index"),
            F.max("entry_index").alias("last_index"),
        )
        .withColumn("has_errors", F.col("n_errors") > 0)
    )
