"""The vectorized parse stage: pages -> entries via Arrow-batched mapInPandas.

This is the Spark re-expression of the reference's streaming decoder
(EntryCodec, /root/reference/src/codec.rs:255-352). The reference's framing
problem — an entry split across read buffers, solved with Partial streams +
checkpoint/rewind (src/codec.rs:284-311) — disappears here: a page is a
self-contained record (no entry spans pages), so the parse is embarrassingly
parallel over rows. Memory is bounded by the Arrow batch size
(spark.sql.execution.arrow.maxRecordsPerBatch), the analog of the
reference's tunable read buffer (src/lib.rs:23).

Scale notes (100 TB / 10^12 pages):
  - the only Python stage in the pipeline; everything downstream is
    JVM-side DataFrame ops under whole-stage codegen
  - regexes compile at slowspark.grammar import time = once per Python
    worker process ("once per partition", BASELINE.json north_star)
  - no shuffle: mapInPandas is a narrow transformation; input splits come
    straight from the Parquet/Iceberg scan (spark.sql.files.maxPartitionBytes
    controls split size; pages are ~KB so default 128 MiB splits are fine)
  - column pruning: only url/text/lang/warc_ts are read from the scan —
    html (the big binary column) is never touched unless asked for
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from slowspark import grammar
from slowspark.schema import ENTRY_SCHEMA

_OUT_COLS = [f.name for f in ENTRY_SCHEMA.fields if f.name != "entry_id"]

_INT_DTYPES = (
    # nullable integer dtypes so error rows (None stats) survive the Arrow
    # conversion to LongType instead of degrading to float64+NaN
    ("entry_index", "Int32"),
    ("thread_id", "Int64"),
    ("rows_sent", "Int64"),
    ("rows_examined", "Int64"),
    ("set_timestamp", "Int64"),
)


def _entries_for_batch(
    pdf: pd.DataFrame, context_mapper, out_cols, fields=None
) -> pd.DataFrame:
    rows: list[dict] = []
    want_time = "log_time" in out_cols
    has_lang = "lang" in pdf.columns
    has_ts = "warc_ts" in pdf.columns
    urls = pdf["url"].tolist()
    texts = pdf["text"].tolist()
    langs = pdf["lang"].tolist() if has_lang else [None] * len(urls)
    tss = pdf["warc_ts"].tolist() if has_ts else [None] * len(urls)
    for url, text, lang, warc_ts in zip(urls, texts, langs, tss):
        if text is None:
            continue
        for e in grammar.parse_entries(text, context_mapper, fields):
            us = e.pop("log_time_us")
            if want_time:
                e["log_time"] = (
                    pd.Timestamp(us, unit="us") if us is not None else pd.NaT
                )
            e["url"] = url
            e["lang"] = lang
            e["warc_ts"] = warc_ts
            rows.append(e)
    out = pd.DataFrame(rows, columns=out_cols)
    for col, dt in _INT_DTYPES:
        if col in out_cols:
            out[col] = out[col].astype(dt)
    return out


def parse_pages(
    pages: DataFrame,
    context_mapper=grammar.default_comment_context,
    columns: Optional[list[str]] = None,
    masking: str = "none",
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> DataFrame[ENTRY_SCHEMA].

    The UDTF-shaped stage: one page row in, N entry rows out. Equivalent of
    iterating EntryCodec over the page text (src/codec.rs:137-252), plus our
    never-panic policy: malformed entries become ParseError rows
    (entry_kind='ParseError') instead of killing the job the way the
    reference's panics would (src/codec.rs:313-327).

    ``columns``: manual column pruning THROUGH the Python boundary. Catalyst
    prunes the scan below this stage but cannot prune what the UDF emits, so
    a census that needs 5 columns would otherwise pay Arrow+JVM conversion
    for all 27 (the nested objects/map/struct columns and the three
    statement strings dominate that cost). Pass the columns the downstream
    plan needs; url/entry_index are always included (entry_id determinism).

    ``masking``: the reference's EntryMasking config
    (/root/reference/src/lib.rs:93-105) as a pipeline parameter.
    ``"none"`` (reference default) leaves literal values in ``statement``;
    ``"placeholder"`` renders SqlStatement rows' ``statement`` with every
    literal masked to '?' (the ``fingerprint`` rendering — mask_tokens,
    src/parser.rs:559-581). Either way ``fingerprint`` stays available as
    its own column; the switch is a JVM-side projection, not a re-parse.
    """
    if masking not in ("none", "placeholder"):
        raise ValueError(f"masking must be 'none' or 'placeholder', got {masking!r}")
    in_cols = [c for c in ("url", "text", "lang", "warc_ts") if c in pages.columns]
    mapper = context_mapper
    forced_cols: set[str] = set()
    if columns is None:
        out_cols = _OUT_COLS
    else:
        need = set(columns) | {"url", "entry_index"}
        if masking == "placeholder" and "statement" in need:
            # helper columns for the masking projection; dropped afterwards
            # unless the caller asked for them (the projection contract must
            # not depend on the masking flag)
            forced_cols = {"fingerprint", "entry_kind"} - need
            need |= forced_cols
        out_cols = [c for c in _OUT_COLS if c in need]

    # column pruning THROUGH the parse, not just through Arrow: a derived
    # field the plan discards (objects / canonical statement / raw bytes /
    # context) is never computed in the Python worker — with the default
    # full column set this is a no-op (fields=None = compute everything)
    prune = None if columns is None else frozenset(out_cols)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _entries_for_batch(pdf, mapper, out_cols, prune)

    by_name = {f.name: f for f in ENTRY_SCHEMA.fields}
    schema_no_id = ",".join(
        f"`{c}` {by_name[c].dataType.simpleString()}" for c in out_cols
    )
    out = pages.select(*in_cols).mapInPandas(fn, schema=schema_no_id)
    if masking == "placeholder" and "statement" in out_cols:
        out = mask_statements(out)
        if forced_cols:
            out = out.drop(*sorted(forced_cols))
    # deterministic entry id: hash of natural keys, never rand()/uuid()
    # (reruns and checkpoint resumes must produce identical tables)
    return out.withColumn("entry_id", F.xxhash64("url", "entry_index"))


def mask_statements(entries: DataFrame) -> DataFrame:
    """The EntryMasking 'placeholder' switch as a standalone projection
    (reference /root/reference/src/lib.rs:93-105 + mask_tokens rendering,
    src/parser.rs:559-581): SqlStatement rows' ``statement`` becomes the
    masked ``fingerprint`` rendering; every other entry kind keeps its raw
    statement. Pure JVM-side CASE — no re-parse — so it can be applied to
    already-materialized entry tables as well as inline in parse_pages."""
    return entries.withColumn(
        "statement",
        F.when(
            F.col("entry_kind") == "SqlStatement", F.col("fingerprint")
        ).otherwise(F.col("statement")),
    )


def split_errors(entries: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, parse_errors) — the decode_eof analog (src/codec.rs:334-351):
    non-whitespace residue / malformed entries are routed, not fatal."""
    good = entries.filter(F.col("entry_kind") != "ParseError")
    bad = entries.filter(F.col("entry_kind") == "ParseError")
    return good, bad
