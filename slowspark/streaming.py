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


def sessionize_stream(
    entries_stream: DataFrame,
    key_cols: tuple[str, ...] = ("user",),
    ts_col: str = "warc_ts",
    gap_minutes: float = 60,
    watermark: str = "1 second",
) -> DataFrame:
    """Custom STATEFUL streaming operator via applyInPandasWithState:
    cross-batch gap-based session windows per key, the streaming analog of
    slowspark.aggregate.session_windows (same semantics on closed sessions).

    State per key = the one open session (start_us, last_us, n, sum_qt).
    Each micro-batch merges its rows in event-time order into that session,
    EMITS every session closed by a gap, keeps the still-open tail in state
    and arms an event-time timeout at last_seen + gap: when the watermark
    passes it (i.e. no row can extend the session anymore), the timed-out
    state flushes as a final session. Late rows beyond the watermark are
    dropped by Spark before they reach the function — exactly the
    late-data contract the batch analog's determinism needs.

    Late-but-within-watermark rows (older than the open session) are
    handled by INTERVAL semantics, not a forward-only merge: rows within
    `gap` of the open session extend it BACKWARD (session_start moves
    earlier); strictly earlier rows form their own session(s), emitted
    before the open one, and the trailing early session merges with the
    open session when their gap allows. A row landing INSIDE an
    already-emitted session's span cannot be recovered (that session left
    the operator when the gap closed it) — keep the watermark at least as
    large as the expected disorder, which is the same contract Spark's own
    session_window aggregation has.

    Scale shape: state is O(1) per key (4 scalars), the shuffle is the
    groupBy key partitioning, and emission is incremental — this never
    buffers a key's history the way a naive collect-and-sessionize would."""
    out_fields = ", ".join(f"{k} string" for k in key_cols)
    out_schema = (
        f"{out_fields}, session_start timestamp, session_end timestamp, "
        f"n_events long, sum_query_time double"
    )
    state_schema = "start_us long, last_us long, n long, sum_qt double"
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def fn(key, pdfs, state):
        import pandas as pd

        def emit(start_us, last_us, n, sqt):
            return pd.DataFrame({
                **{k: [key[i]] for i, k in enumerate(key_cols)},
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                "sum_query_time": [sqt],
            })

        if state.hasTimedOut:
            # watermark passed last_seen + gap: the open session is final
            start_us, last_us, n, sqt = state.get
            state.remove()
            yield emit(start_us, last_us, n, sqt)
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        # normalize to ns first — Arrow may hand back datetime64[us] or [ns]
        ts_us = (
            pd.to_datetime(rows[ts_col]).astype("datetime64[ns]").astype("int64")
            // 1000
        ).tolist()
        qts = rows["query_time"].fillna(0.0).tolist() if "query_time" in rows else [0.0] * len(ts_us)

        if state.exists:
            o_start, o_last, o_n, o_sqt = state.get
            # rows within `gap` of the open session (t >= o_start - gap)
            # extend it — possibly BACKWARD; strictly earlier rows are
            # sessionized on their own first
            early = [(t, q) for t, q in zip(ts_us, qts) if t < o_start - gap_us]
            late = [(t, q) for t, q in zip(ts_us, qts) if t >= o_start - gap_us]
        else:
            o_start, o_last, o_n, o_sqt = None, None, 0, 0.0
            early, late = [], list(zip(ts_us, qts))

        # sessionize the strictly-earlier rows; the trailing open one may
        # merge into the state session if their gap allows
        cur = None  # (start, last, n, sqt)
        for t, q in early:
            if cur is not None and t - cur[1] > gap_us:
                yield emit(*cur)
                cur = None
            if cur is None:
                cur = (t, t, 1, float(q))
            else:
                cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + float(q))
        if cur is not None:
            if o_start is not None and o_start - cur[1] <= gap_us:
                o_start, o_last = cur[0], max(o_last, cur[1])
                o_n, o_sqt = o_n + cur[2], o_sqt + cur[3]
            else:
                yield emit(*cur)

        # fold the remaining rows into the open session (forward merges;
        # t may sit inside the span — that only tightens internal gaps)
        if o_start is None and late:
            t0, q0 = late[0]
            o_start, o_last, o_n, o_sqt = t0, t0, 0, 0.0
        start_us, last_us, n, sqt = o_start, o_last, o_n, o_sqt
        for t, q in late:
            if n > 0 and t - last_us > gap_us:
                yield emit(start_us, last_us, n, sqt)
                start_us, n, sqt = t, 0, 0.0
            start_us = min(start_us, t)
            last_us = max(last_us, t)
            n += 1
            sqt += float(q)
        state.update((start_us, last_us, n, sqt))
        # close the open session once no on-time row can extend it
        state.setTimeoutTimestamp(last_us // 1000 + int(gap_minutes * 60 * 1000))

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        entries_stream.withWatermark(ts_col, watermark)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
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
