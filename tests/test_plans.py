"""Physical-plan audits: pin the plan properties the 100 TB design relies
on (predicate pushdown to the scan, column pruning, partial+final
aggregation, no shuffle before the parse stage, window/groupBy partitioning
reuse), so a plan regression fails CI instead of surfacing as a silent
10x at scale."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pricing_summary_pushes_filter_to_scan(spark):
    import __spark_entry__ as contract

    df = contract.queries()["pricing_summary"](spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_regex_extract_stats_prunes_scan_columns(spark):
    import __spark_entry__ as contract

    df = contract.queries()["regex_extract_stats"](spark, SF_DIR)
    plan = _plan(df)
    # the documents table has 5 columns; the scan must read only 2
    read = plan[plan.index("ReadSchema:"):].splitlines()[0]
    assert "doc_id" in read and "text" in read
    assert "lang" not in read and "source" not in read and "n_chars" not in read


def test_duplicate_clusters_is_partial_plus_final_agg(spark):
    from slowspark.textops import duplicate_clusters

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(duplicate_clusters(docs))
    # map-side combine: two HashAggregates around exactly one shuffle
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") == 1


def test_parse_census_has_no_shuffle_before_python_stage(spark):
    """The parse is narrow: the ONLY Exchange in scan -> parse -> census is
    the tiny post-parse aggregation shuffle."""
    from slowspark.aggregate import kind_census
    from slowspark.gen import gen_pages
    from slowspark.parse import parse_pages

    df = kind_census(
        parse_pages(gen_pages(spark, 50, partitions=4), columns=["entry_kind"])
    )
    plan = _plan(df)
    assert plan.count("Exchange") == 1
    # physical plans print root-first, so the one Exchange (the census agg)
    # must appear ABOVE the MapInPandas parse operator — i.e. nothing
    # shuffles between the scan and the Python stage
    assert plan.index("Exchange") < plan.index("MapInPandas")


def test_session_windows_single_shuffle(spark):
    """lag-flag window, running-sum window and the final groupBy all reuse
    ONE hash partitioning on the key."""
    from slowspark.aggregate import session_windows

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = _plan(session_windows(ev, ["user_id"], "ts", 30))
    assert plan.count("Exchange") == 1


def test_fingerprint_rollup_single_shuffle_after_parse(spark):
    from slowspark.aggregate import fingerprint_rollup
    from slowspark.gen import gen_pages
    from slowspark.parse import parse_pages

    entries = parse_pages(
        gen_pages(spark, 50, partitions=4),
        columns=["entry_kind", "fingerprint", "sql_type", "query_time",
                 "lock_time", "rows_sent", "rows_examined"],
    )
    plan = _plan(fingerprint_rollup(entries))
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2  # partial + final


def test_exact_dedup_semi_join_reuses_aggregation_partitioning(spark):
    """exact_dedup: groupBy(text_hash) then a left_semi back to the corpus —
    the whole plan needs at most 3 exchanges (agg + two join sides) and no
    cartesian anywhere."""
    from slowspark.textops import exact_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(exact_dedup(docs))
    assert "Cartesian" not in plan
    assert plan.count("Exchange") <= 3


def test_lsh_near_dup_join_is_bucket_keyed_not_cartesian(spark):
    from slowspark.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(embedding_near_dup_pairs(emb, dim=64))
    assert "Cartesian" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_manku_simhash_join_is_key_equijoin(spark):
    from slowspark import textops

    sigs = spark.createDataFrame(
        [(i, i * 7919) for i in range(50)], "doc_id long, simhash long"
    )
    plan = _plan(textops.simhash_candidates(sigs))
    assert "Cartesian" not in plan
    # the join keys are (tbl, tkey) — an equi-join, hash or sort-merge
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed identically on the join key: the SortMergeJoin
    must read the bucketing metadata and plan with ZERO Exchange — the
    pre-pay-the-shuffle-once pattern for repeatedly-joined fact tables."""
    from slowspark.catalog import Catalog

    cat = Catalog(str(tmp_path))
    a = spark.range(0, 2000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 2000).selectExpr("id AS k", "id * 3 AS vb")
    cat.write_bucketed(a, "bt_a", ["k"], n_buckets=4, sort_by=["k"])
    cat.write_bucketed(b, "bt_b", ["k"], n_buckets=4, sort_by=["k"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # read through Catalog.read, not spark.table directly: the reader
        # must resolve metastore-registered names via the catalog (a path
        # load silently drops the bucketing metadata and re-introduces the
        # Exchange this feature exists to avoid)
        joined = cat.read(spark, "bt_a").join(cat.read(spark, "bt_b"), "k")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_incremental_simhash_probe_prunes_index_columns(spark, tmp_path):
    """The persisted-index probe's scale contract: the candidate join
    scans the tbl-partitioned key table reading ONLY (doc_id, tkey) —
    never the 8-byte simhash per key row (20 rows/doc; reading it would
    inflate the dominant scan by ~50%) — with tbl arriving as a partition
    column (PartitionFilters, prunable); and the index sigs table is
    scanned exactly once (the hamming verify), not per candidate join."""
    from slowspark import textops

    corpus = spark.createDataFrame(
        [(i, f"w{i} " * 30) for i in range(20)], "doc_id long, text string"
    )
    idx = str(tmp_path / "shidx")
    textops.build_simhash_index(corpus, idx)
    new = spark.createDataFrame(
        [(100, "w1 " * 30)], "doc_id long, text string"
    )
    df = textops.incremental_simhash_near_dups(new, idx)
    plan = _plan(df)
    assert "Cartesian" not in plan
    # identify the two index scans by ReadSchema (the plan's Location
    # string truncates long paths): the key-table scan reads exactly
    # (doc_id, tkey) with tbl as a partition filter; the sigs scan reads
    # (doc_id, simhash). Exactly one of each — no redundant re-read.
    scans = plan.split("Scan parquet")[1:]
    tables_scans = [
        s for s in scans
        if "ReadSchema: struct<doc_id:bigint,tkey:bigint>" in s
    ]
    assert len(tables_scans) == 1
    assert "PartitionFilters: [isnotnull(tbl" in tables_scans[0]
    sigs_scans = [
        s for s in scans
        if "ReadSchema: struct<doc_id:bigint,simhash:bigint>" in s
    ]
    assert len(sigs_scans) == 1
    assert len(scans) == 2  # and nothing else scans the index


def test_gopher_repetition_single_python_stage_no_shuffle(spark):
    """gopherrep: all 13 signals in one narrow mapInPandas pass — the plan
    must contain exactly one Python stage and ZERO exchanges (a gram
    explode/shuffle formulation would move O(6x tokens) rows per doc)."""
    from slowspark.gopherrep import gopher_repetition_flags

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(gopher_repetition_flags(docs))
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1


def test_qualityclf_scoring_broadcast_join_single_exchange(spark):
    """score_documents: the coefficient table must broadcast (never
    shuffle the corpus-sized feature table for the join) and the per-doc
    margin agg must be partial+final with ONE exchange."""
    from slowspark.qualityclf import score_documents

    feats = spark.createDataFrame(
        [(1, 5, 0.5), (1, 9, 0.5)], "id long, bucket int, tf double"
    )
    coeffs = spark.createDataFrame([(5, 1.0)], "bucket int, weight double")
    plan = _plan(score_documents(feats, coeffs, 0.0))
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan


def test_qualityclf_features_pushdown_and_two_narrow_shuffles(spark):
    """hashed_text_features: explode + groupBy(id,bucket) + window norm —
    the exploded gram stream partial-aggregates map-side (the shuffle
    carries distinct (id,bucket) rows, not raw grams), then one window
    re-partition by id; no more than 2 exchanges, no Python stage."""
    from slowspark.qualityclf import hashed_text_features

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(hashed_text_features(docs))
    assert "partial_count" in plan or "partial_sum" in plan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_bloom_probe_broadcasts_blocks(spark):
    """bloom_probe: the block table must broadcast — the batch is never
    shuffled for the membership join; the fold-back agg is partial+final
    with one exchange."""
    from slowspark.bloomdedup import bloom_probe, build_bloom

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "doc_id long, v string"
    )
    blocks = build_bloom(df, "v", "doc_id", 1024, 4)
    plan = _plan(bloom_probe(df, blocks, "v", "doc_id", 1024, 4))
    assert "BroadcastHashJoin" in plan
    # one exchange for the per-id agg; blocks build has its own agg
    # exchange feeding the broadcast — none on the probe side stream
    assert "partial_min" in plan


def test_bpe_pair_counts_stay_jvm_side(spark):
    """The BPE round primitive (pair counts) is pure built-ins — no
    Python stage — and partial-aggregates before its one exchange."""
    from slowspark import bpe as bpemod

    words = spark.createDataFrame(
        [("\x1fa\x1f\x1fb\x1f", 3)], "s string, count long"
    ).withColumnRenamed("count", "cnt")
    plan = _plan(bpemod._pair_counts(words.withColumnRenamed("cnt", "count")))
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "partial_sum" in plan


def test_substring_dedup_chars_exchange_carries_hashes_not_grams(spark):
    """exact_substring_dedup_chars' scale contract: the per-position
    L-char gram STRING never crosses an exchange (16 bytes of xxhash64
    fingerprint per position do, not L bytes of text — the 50x shuffle
    blowup the design avoids), the window count+min aggregate is
    map-side combined, and the whole pipeline is Python-free."""
    from slowspark.textops import exact_substring_dedup_chars

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(exact_substring_dedup_chars(docs, min_len=40))
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "partial_min" in plan and "partial_count" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert " AS g#" not in line and "substring(" not in line


def test_sequence_spans_no_shuffle_after_pack(spark):
    """sequence_spans is a narrow map over the packed table: zero
    exchanges of its own (only pack_sequences' two-phase machinery may
    shuffle upstream of the provided input)."""
    from slowspark.corpus import sequence_spans

    packed = spark.createDataFrame(
        [(1, 10, 0, 0), (2, 30, 0, 10)],
        "doc_id long, n_tokens long, seq_id long, seq_offset long",
    )
    plan = _plan(sequence_spans(packed, 16))
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_cms_build_partial_aggregates(spark):
    """build_cms: the cell-grid shuffle must be map-side combined so it
    carries at most depth*width cell rows per partition."""
    from slowspark.sketch import build_cms

    df = spark.createDataFrame([("a",), ("b",)], "term string")
    plan = _plan(build_cms(df, "term", 4, 64))
    assert "partial_sum" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_bpe_segment_udf_python_runs_over_distinct_words(spark):
    """The production segmenter's scale contract: the Python stage
    (mapInPandas) must sit downstream of the DISTINCT-word aggregate —
    O(distinct words) Python work — never over the exploded occurrence
    table (O(word occurrences), 4+ orders of magnitude more rows at web
    scale); the occurrence side rejoins the segmented words by key."""
    from slowspark.bpe import bpe_learn, bpe_segment_udf

    df = spark.createDataFrame(
        [(i, "low lower lowest newest " * 4) for i in range(4)],
        "doc_id long, text string",
    )
    merges = bpe_learn(df, n_merges=4)
    plan = _plan(bpe_segment_udf(df, merges))
    # exactly one Python stage
    assert plan.count("MapInPandas") == 1
    # the Python stage's subtree contains the distinct aggregate
    # (HashAggregate on word), i.e. Python consumes the deduped words
    python_subtree = plan.split("MapInPandas")[1]
    assert "HashAggregate" in python_subtree
    # and the occurrences come back via a key join, not a re-parse
    assert "Join" in plan


def test_bpe_byte_level_python_stays_distinct_bounded(spark):
    """Byte-level mode keeps BOTH of the word path's scale contracts:
    the trainer's corpus-wide pass (pre-tokenize + explode + count) is
    pure JVM regex — its Python stage (the byte map) consumes the
    ALREADY-AGGREGATED distinct table; and the UDF segmenter's single
    Python stage still sits over the distinct pre-tokens, occurrences
    rejoining by key."""
    from slowspark.bpe import bpe_learn, bpe_segment_udf, pretoken_frequencies

    df = spark.createDataFrame(
        [(i, "low lower Lowest  newest don't " * 4) for i in range(4)],
        "doc_id long, text string",
    )
    tplan = _plan(pretoken_frequencies(df))
    assert tplan.count("MapInPandas") == 1
    # byte map AFTER the count aggregate: its subtree holds the groupBy
    assert "HashAggregate" in tplan.split("MapInPandas")[1]
    merges = bpe_learn(df, n_merges=4, byte_level=True)
    plan = _plan(bpe_segment_udf(df, merges, byte_level=True))
    assert plan.count("MapInPandas") == 1
    assert "HashAggregate" in plan.split("MapInPandas")[1]
    assert "Join" in plan


def test_unimax_sample_selection_scan_is_narrow(spark):
    """After the (eager, strata-bounded) count aggregate, the UniMax
    selection itself must be a narrow scan: literal thresholds, no
    Exchange, no join — the hash_sample discipline carried over to the
    repeat path."""
    from slowspark.corpus import unimax_sample

    df = spark.createDataFrame(
        [(i, "tok " * 10, "en" if i % 2 else "de") for i in range(30)],
        "doc_id long, text string, lang string",
    )
    out = unimax_sample(df, total_budget=100, max_epochs=2.0)
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_temperature_mixture_selection_scan_is_narrow(spark):
    """temperature_mixture_props + mixture_sample: rates become literal
    CASE thresholds — the selection plan is one narrow filtered scan."""
    from slowspark.corpus import mixture_sample, temperature_mixture_props

    df = spark.createDataFrame(
        [(i, "tok " * 10, "en" if i % 2 else "de") for i in range(30)],
        "doc_id long, text string, lang string",
    )
    props = temperature_mixture_props(df, 2.0)
    plan = _plan(mixture_sample(df, props))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_pagerank_iteration_reuses_edge_partitioning(spark):
    """The scale property the iterative graph family depends on: the
    persisted edges⋈outdeg table was shuffled on src ONCE at build; a
    per-iteration contribution join must re-shuffle only the (tiny)
    rank table against the cache's preserved hash partitioning — an
    Exchange on the edge side every round would re-shuffle 10^12 edges
    per iteration. Plan contract: cache scan present, and at most two
    Exchanges in the whole iteration step (ranks side + groupBy(dst));
    a third would be the edge re-shuffle."""
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        edges = spark.createDataFrame(
            [(i, (i * 7 + 1) % 40) for i in range(40) if i % 10 != 0],
            "src long, dst long",
        )
        out_deg = edges.groupBy("src").agg(F.count("*").alias("__od"))
        edges_w = edges.join(out_deg, "src").persist()
        edges_w.count()
        ranks = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
            .withColumn("rank", F.lit(0.025))
        )
        step = (
            edges_w.join(ranks, edges_w["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("__od")).alias("c"))
        )
        plan = step._jdf.queryExecution().executedPlan().toString()
        # the cached relation PRINTS its stored build plan (exchanges
        # included) under InMemoryRelation — the live region above the
        # cache is what executes per iteration
        live = plan.split("InMemoryRelation")[0]
        assert "InMemoryTableScan" in live  # the cache is actually used
        # exactly the groupBy(dst) exchange; an Exchange on src here
        # would be the 10^12-edge re-shuffle
        assert live.count("Exchange") == 1, plan
        assert "Exchange hashpartitioning(src" not in live, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        edges_w.unpersist()


def test_hits_iteration_reuses_repartitioned_edge_caches(spark):
    """hits caches the edge list twice, hash-partitioned per join key —
    the per-iteration join must reuse that partitioning (exchange only
    the score side + the per-direction groupBy), never re-shuffle the
    edge table."""
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    e = spark.createDataFrame(
        [(i, (i * 7 + 1) % 40) for i in range(40) if i % 10 != 0],
        "src long, dst long",
    ).select(F.col("src").alias("__s"), F.col("dst").alias("__d"))
    es = e.repartition("__s").persist()
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        es.count()
        scores = es.select(F.col("__s").alias("node")).distinct() \
            .withColumn("hub", F.lit(1.0))
        step = (
            es.join(scores.select(F.col("node").alias("__s"), "hub"), "__s")
            .groupBy("__d")
            .agg(F.sum("hub").alias("a"))
        )
        plan = step._jdf.queryExecution().executedPlan().toString()
        live = plan.split("InMemoryRelation")[0]
        assert "InMemoryTableScan" in live
        # the one live exchange above the cache is the groupBy(__d);
        # an Exchange on __s would be the per-round edge re-shuffle
        assert "Exchange hashpartitioning(__s" not in live, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        es.unpersist()


def test_priority_block_leaves_rotation_slots():
    """The driver verifies only the first 50 queries() entries per round.
    r8 shipped a 51-entry priority block: the 51st entry never reached the
    driver AND the stable-tail rotation advanced zero slots (VERDICT r8
    "What's wrong" #1). Cap the block so >= 20 rotation slots always
    survive, and pin that the priority entries actually lead the dict."""
    import __spark_entry__ as contract

    n_prio = len(contract._PRIORITY_QUERIES)
    assert n_prio + 20 <= 50, (
        f"_PRIORITY_QUERIES has {n_prio} entries; the driver window is 50 "
        "and >= 20 rotation slots must survive"
    )
    assert len(contract._PRIORITY_QUERIES) == len(set(contract._PRIORITY_QUERIES))
    names = list(contract.queries())
    assert names[:n_prio] == contract._PRIORITY_QUERIES


def test_coverage_index_names_every_query():
    """COVERAGE.md's operator->oracle index rotted to 125 entries while the
    registry grew to 132 (VERDICT r8 "What's missing" #2). Guard the doc:
    every queries() name must appear backticked somewhere in COVERAGE.md,
    so a new query cannot land without an index entry."""
    import re

    import __spark_entry__ as contract

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(here, "COVERAGE.md")).read()
    documented = set(re.findall(r"`([A-Za-z0-9_.]+)`", text))
    missing = sorted(set(contract.queries()) - documented)
    assert not missing, f"queries absent from COVERAGE.md: {missing}"
