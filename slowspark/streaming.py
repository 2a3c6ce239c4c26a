"""Structured Streaming mode: the same parse -> route -> aggregate pipeline
over a file-source stream of pages.

The reference is a streaming decoder (tokio FramedRead,
/root/reference/src/lib.rs:14-36); its framing state machine
(src/codec.rs:284-311) existed because an entry could span read buffers. In
the page model an entry never spans rows, so micro-batch boundaries align
with rows and NO cross-batch parser state is needed — no
flatMapGroupsWithState, just a stateless mapInPandas per micro-batch plus
watermarked windowed aggregation for late pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from slowspark.parse import parse_pages
from slowspark.route import SINK_NAMES
from slowspark.schema import PAGES_SCHEMA


def read_page_stream(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .load(path)
    )


def parse_stream(pages_stream: DataFrame) -> DataFrame:
    """mapInPandas works unchanged on a streaming DataFrame."""
    return parse_pages(pages_stream)


def windowed_kind_counts(entries_stream: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window kind census with late-page tolerance."""
    return (
        entries_stream
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "entry_kind")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "entry_kind", "n")
    )


def start_fanout_sink(entries_stream: DataFrame, base_path: str, checkpoint: str):
    """foreachBatch multi-sink fan-out: each micro-batch is routed by
    entry_kind into the same per-kind tables the batch pipeline writes.

    Exactly-once per sink: each epoch writes to its OWN directory
    (`<sink>/epoch=<id>`) with mode('overwrite'). foreachBatch alone is
    at-least-once — after a mid-batch failure the streaming checkpoint
    replays the epoch with the SAME epoch_id, and a blind append would
    duplicate rows; the epoch-keyed overwrite makes the replay rewrite the
    identical directory instead (idempotent, since parse output is
    deterministic). Readers see `epoch` as a discovered partition column on
    `spark.read.parquet(base_path/<sink>)`."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            for kind, sink in SINK_NAMES.items():
                (
                    batch_df.filter(F.col("entry_kind") == kind)
                    .write.mode("overwrite")
                    .parquet(f"{base_path}/{sink}/epoch={epoch_id}")
                )
        finally:
            batch_df.unpersist()

    return (
        entries_stream.writeStream
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
