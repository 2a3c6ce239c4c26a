"""Explicit Spark schemas — never inferred.

The reference's schema is fixed at compile time by its struct definitions
(/root/reference/src/types.rs:12-21 Entry, :406-420 EntrySession, :554-565
EntryStats, :525-532 EntryCall, :489-496 EntrySqlAttributes); the Spark
equivalents below map Rust Option<T> -> nullable, Bytes -> BinaryType where
byte-identity matters (statement_raw) and StringType elsewhere, and the
EntryStatement enum (src/types.rs:249-257) -> the entry_kind discriminator
column plus kind-specific columns.
"""

from pyspark.sql import types as T

# Input table (BASELINE.json input_hint): Iceberg table of Common-Crawl-style
# pages. Sandbox materializes it as Parquet (see slowspark.catalog).
PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

OBJECT_TYPE = T.StructType([
    T.StructField("schema_name", T.StringType(), True),
    T.StructField("object_name", T.StringType(), False),
])

# File-preamble metadata the reference parses into HeaderLines
# (/root/reference/src/parser.rs:95-129): mysqld version string (trailing
# '.' kept, per the parses_header golden src/parser.rs:904-925), TCP port,
# unix socket path. Carried per-entry (the most recent preamble seen above
# the entry in its page); NULL when the page has no preamble.
LOG_META_TYPE = T.StructType([
    T.StructField("version", T.StringType(), True),
    T.StructField("tcp_port", T.LongType(), True),
    T.StructField("socket", T.StringType(), True),
])

CONTEXT_TYPE = T.StructType([
    T.StructField("request_id", T.StringType(), True),
    T.StructField("caller", T.StringType(), True),
    T.StructField("function", T.StringType(), True),
    T.StructField("line", T.IntegerType(), True),
])

# One row per parsed entry. url/entry_index are lineage (which page, which
# position); lang/warc_ts are page passthrough used by enrichment and
# windowed rollups; entry_id is added JVM-side as xxhash64(url, entry_index).
ENTRY_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("entry_index", T.IntegerType(), False),
    T.StructField("lang", T.StringType(), True),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("log_time", T.TimestampType(), True),
    T.StructField("log_time_raw", T.StringType(), True),
    T.StructField("user", T.StringType(), True),
    T.StructField("sys_user", T.StringType(), True),
    T.StructField("host", T.StringType(), True),
    T.StructField("ip", T.StringType(), True),
    T.StructField("thread_id", T.LongType(), True),
    T.StructField("query_time", T.DoubleType(), True),
    T.StructField("lock_time", T.DoubleType(), True),
    T.StructField("rows_sent", T.LongType(), True),
    T.StructField("rows_examined", T.LongType(), True),
    T.StructField("db", T.StringType(), True),
    T.StructField("set_timestamp", T.LongType(), True),
    T.StructField("statement_raw", T.BinaryType(), True),
    T.StructField("statement", T.StringType(), True),
    T.StructField("entry_kind", T.StringType(), False),
    T.StructField("admin_command", T.StringType(), True),
    T.StructField("sql_type", T.StringType(), True),
    T.StructField("objects", T.ArrayType(OBJECT_TYPE), True),
    T.StructField("comment_kv", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("context", CONTEXT_TYPE, True),
    T.StructField("fingerprint", T.StringType(), True),
    T.StructField("log_meta", LOG_META_TYPE, True),
    T.StructField("parse_error", T.StringType(), True),
])

# Broadcast enrichment dims (BASELINE.json north_star)
HOST_DC_SCHEMA = T.StructType([
    T.StructField("host", T.StringType(), False),
    T.StructField("datacenter", T.StringType(), True),
])

LANG_LOCALE_SCHEMA = T.StructType([
    T.StructField("lang", T.StringType(), False),
    T.StructField("locale", T.StringType(), True),
])
