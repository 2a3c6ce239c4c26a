"""retrieval: BM25 postings build + broadcast-probe top-k scoring."""

import math

import pytest
from pyspark.sql import functions as F

from slowspark.retrieval import bm25_topk, build_postings


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("d1", "spark query engine for big data"),
        ("d2", "spark spark spark tuning guide"),
        ("d3", "cooking pasta with tomato sauce"),
        ("d4", "query planner internals and big joins big shuffles"),
        ("d5", "the the the the the the the the"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _py_bm25(rows, query_terms, k1=1.2, b=0.75, max_df=None):
    """Independent pure-Python BM25 (Lucene idf) over the same corpus."""
    docs = {d: t.lower().split() for d, t in rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfreq = {}
    for toks in docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    scores = {}
    for term in set(query_terms):
        df_t = dfreq.get(term)
        if df_t is None or (max_df is not None and df_t > max_df):
            continue
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        for d, toks in docs.items():
            tf = toks.count(term)
            if tf == 0:
                continue
            tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(toks) / avgdl))
            scores[d] = scores.get(d, 0.0) + idf * tfn
    return scores


def test_bm25_matches_python_reference(spark, corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    q = spark.createDataFrame(
        [("q1", "spark query"), ("q2", "big data shuffles")],
        "query_id string, query_text string",
    )
    postings = build_postings(corpus)
    got = bm25_topk(postings, q, topk=10)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["bm25"]
    want1 = _py_bm25(rows, ["spark", "query"])
    want2 = _py_bm25(rows, ["big", "data", "shuffles"])
    assert by_q["q1"] == {d: round(s, 4) for d, s in want1.items()}
    assert by_q["q2"] == {d: round(s, 4) for d, s in want2.items()}


def test_bm25_duplicate_query_terms_count_once(spark, corpus):
    postings = build_postings(corpus)
    q1 = spark.createDataFrame(
        [("q", "spark")], "query_id string, query_text string"
    )
    q2 = spark.createDataFrame(
        [("q", "spark spark spark")], "query_id string, query_text string"
    )
    a = {(r["doc_id"], r["bm25"]) for r in bm25_topk(postings, q1).collect()}
    b = {(r["doc_id"], r["bm25"]) for r in bm25_topk(postings, q2).collect()}
    assert a == b


def test_bm25_max_df_prunes_hot_terms(spark, corpus):
    postings = build_postings(corpus)
    q = spark.createDataFrame(
        [("q", "big the")], "query_id string, query_text string"
    )
    # 'big' appears in 2 docs, 'the' in 1 doc (d5) — max_df=1 keeps only
    # 'the', so d1/d4 (matched via 'big' only) must vanish
    got = {r["doc_id"] for r in bm25_topk(postings, q, max_df=1).collect()}
    assert got == {"d5"}
    full = {r["doc_id"] for r in bm25_topk(postings, q).collect()}
    assert full == {"d1", "d4", "d5"}


def test_bm25_topk_and_rank_tiebreak(spark, corpus):
    postings = build_postings(corpus)
    q = spark.createDataFrame(
        [("q", "spark query big")], "query_id string, query_text string"
    )
    out = bm25_topk(postings, q, topk=2).collect()
    assert len(out) == 2
    assert [r["rk"] for r in sorted(out, key=lambda r: r["rk"])] == [1, 2]
    with pytest.raises(ValueError, match="topk"):
        bm25_topk(postings, q, topk=0)


def test_bm25_probe_is_broadcast_no_postings_shuffle(spark, corpus):
    """The postings side must reach the probe join WITHOUT an Exchange:
    the query side broadcasts. One shuffle total (the score groupBy)."""
    postings = build_postings(corpus)
    q = spark.createDataFrame(
        [("q", "spark query")], "query_id string, query_text string"
    )
    plan = (
        bm25_topk(postings, q, topk=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_build_index_matches_adhoc_and_probe_has_no_postings_aggregate(
    spark, corpus
):
    """build_index side tables make the probe aggregate-free over
    postings (r8 VERDICT #2): same results as the ad-hoc path, and the
    probe's plan contains NO aggregate whose child scans the postings
    table — the only aggregate left is the (query, doc) score groupBy
    above the join."""
    from slowspark.retrieval import build_index

    q = spark.createDataFrame(
        [("q1", "spark query"), ("q2", "big data shuffles")],
        "query_id string, query_text string",
    )
    adhoc = bm25_topk(build_postings(corpus), q, topk=10)
    postings, term_stats, corpus_stats = build_index(corpus)
    indexed = bm25_topk(
        postings, q, topk=10, term_stats=term_stats,
        corpus_stats=corpus_stats,
    )
    assert sorted(map(tuple, adhoc.collect())) == sorted(
        map(tuple, indexed.collect())
    )
    # plan pin: the postings side reaches the probe join as a FLAT scan
    # of the materialized table — the only Generate(explode) left is the
    # tiny query-text tokenizer, there is no doclens distinct-exchange
    # (Exchange hashpartitioning(doc_id, dl)), and no per-probe
    # re-tokenize of the corpus. The ad-hoc path shows three explodes
    # (postings + dfreq + corpus each re-tokenize).
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Generate explode") == 1, final
    assert "hashpartitioning(doc_id, dl" not in final, final
    adhoc_final = (
        bm25_topk(build_postings(corpus), q, topk=10)
        ._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    # ad-hoc: query tokenize + THREE corpus re-tokenizes (postings,
    # dfreq, doclens/corpus)
    assert adhoc_final.count("Generate explode") == 4


def test_write_postings_store_probe_prunes_partitions(spark, corpus, tmp_path):
    """The persisted store is term-bucket partitioned; a probe reads
    only the buckets its query terms hash into (partition pruning in
    the scan) and returns the same rows as the in-memory path."""
    from slowspark.retrieval import (
        bm25_topk_from_store, build_index, write_postings,
    )

    q = spark.createDataFrame(
        [("q1", "spark query")], "query_id string, query_text string"
    )
    postings, term_stats, corpus_stats = build_index(corpus)
    path = str(tmp_path / "bm25_store")
    write_postings(postings, term_stats, corpus_stats, path, n_buckets=16)
    got = bm25_topk_from_store(spark, path, q, n_buckets=16, topk=10)
    want = bm25_topk(
        postings, q, topk=10, term_stats=term_stats,
        corpus_stats=corpus_stats,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # the scan's partition filter must name term_bucket (pruned probe)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "term_bucket" in plan.split("PartitionFilters")[1].split("]")[0]
