"""BM25 inverted-index retrieval — sparse lexical top-k over a document
corpus (Robertson & Zaragoza 2009; the Lucene idf variant).

The 100 TB problem: serving "find the passages most relevant to this
query batch" over a web-scale corpus — the retrieval half of
RAG-corpus construction and of dedup-by-retrieval audits — without a
dense index. The classic engine answer is an inverted index; the
Spark-native answer is the same structure as a DataFrame: one postings
row per (term, doc) with its term frequency, document length and
corpus statistics on the side.

Scale shape, deliberately:
- postings build = tokenize + one map-side-combined groupBy(doc, term)
  — the same single-shuffle shape as corpus.tfidf_similar_pairs;
- the query batch is SMALL (human queries), so scoring joins postings
  against a BROADCAST of query terms: the 100 TB postings table never
  shuffles for a probe — only the matched slice (sum of the matched
  terms' postings lists) flows into the groupBy(query, doc) score
  aggregation;
- a hot query term (a stopword) fans out to that term's whole postings
  list; `max_df` prunes those terms at probe time (the standard IR
  stopping rule), bounding the matched slice — pruned terms are
  REPORTED per query, never silently dropped;
- per-query top-k is a window over query_id — parallel across the
  batch, never a global sort.

No reference analog (/root/reference parses slow logs; src/*.rs). The
tokenizer is textops.ws_token_array — the repo-wide whitespace
convention, so postings line up with term_stats/tfidf oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from slowspark.textops import ws_token_array


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings: (term, doc_id, tf, dl) — tf = term count
    in the doc, dl = doc length in tokens (riding along so scoring
    needs no second join). One map-side-combined shuffle."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), ws_token_array(text_col).alias("tk")
    ).select("doc_id", F.size("tk").alias("dl"), F.explode("tk").alias("term"))
    return toks.groupBy("term", "doc_id", "dl").agg(F.count("*").alias("tf"))


def bm25_topk(
    postings: DataFrame,
    queries: DataFrame,
    *,
    topk: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int | None = None,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Top-k BM25 scoring of a small query batch against a postings
    table: (query_id, doc_id, bm25, rk), rk 1-based by descending score
    (doc_id tiebreak). idf is the Lucene ln(1 + (N-df+0.5)/(df+0.5)) —
    always positive, so a matched term never penalizes.

    Duplicate query terms count ONCE (standard bag-of-words probe with
    binary query weights). Terms with df > max_df are pruned before the
    probe; at web scale that bound is what keeps a stopword query from
    dragging a billion-row postings list into the aggregation.
    """
    if topk < 1:
        raise ValueError(f"bm25_topk: topk must be >= 1, got {topk}")
    # avgdl over DOCS, not postings rows: dl repeats per (doc, term)
    doclens = postings.select("doc_id", "dl").distinct()
    corpus = doclens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    dfreq = postings.groupBy("term").agg(F.count("*").alias("df_t"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df_t") <= max_df)

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            ws_token_array(query_text_col).alias("tk"),
        )
        .select("query_id", F.explode("tk").alias("term"))
        .distinct()
    )
    # probe: broadcast the (tiny) query-term set and its matched idf;
    # the postings table itself never shuffles
    probe = F.broadcast(
        qterms.join(dfreq, "term").crossJoin(F.broadcast(corpus))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        postings.join(probe, "term")
        .select("query_id", "doc_id", (idf * tf_norm).alias("w"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("query_id", "doc_id", F.round("score", 4).alias("bm25"), "rk")
    )
