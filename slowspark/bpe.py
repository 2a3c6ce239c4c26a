"""Distributed BPE tokenizer training — Sennrich et al. 2016 merges
learned over a corpus with pure DataFrame string/array ops.

The standard algorithm never iterates over the corpus: it aggregates to
the DISTINCT-WORD frequency table once (10^7-ish rows at web scale, vs
10^12 docs) and runs the merge loop there. The Spark shape per merge
round is: adjacent-pair counts from the current symbol strings (explode
+ one map-side-combined weighted count), a 1-row argmax collect
(count desc, pair asc — deterministic), and applying the merge as ONE
string replace() over the word table. No UDF anywhere.

Symbol-state representation: a word's symbols are kept as a single
string with every symbol wrapped in sentinel \\x1f characters —
"the" -> "\\x1ft\\x1f\\x1fh\\x1f\\x1fe\\x1f". Wrapping makes merge
application a plain substring replace: the pair (a, b) is
"\\x1fa\\x1f\\x1fb\\x1f" and CANNOT match across symbol boundaries or
inside a longer symbol (any such match would need a sentinel mid-symbol,
and symbols never contain the sentinel — enforced). replace() scans
left-to-right non-overlapping, exactly the BPE convention for runs like
"a a a" under merge (a,a). Every engine with replace() reproduces the
whole training loop — the driver oracle unrolls the rounds into
generated SQL stages and hash-checks the learned merge table itself,
not just a downstream application.

Lineage: each round rewrites the word table; 50 nested replace()
columns would blow plan depth, so rounds localCheckpoint (lineage
truncation; on a cluster, checkpoint to the reliable store instead —
the table is tiny relative to the corpus either way).

No reference analog (/root/reference is a slow-log parser, src/*.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SENT = "\x1f"


def word_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, count) over lowered whitespace tokens — the one corpus-wide
    pass; everything after runs on this table. Words containing the
    sentinel character are dropped (they would corrupt the symbol-state
    encoding; \\x1f is a C0 control char absent from any real text)."""
    from slowspark.textops import ws_token_array

    return (
        df.select(F.explode(ws_token_array(text_col)).alias("word"))
        .filter(~F.col("word").contains(SENT))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _encode(col):
    """word string -> sentinel-wrapped initial character symbols."""
    return F.concat(
        F.lit(SENT),
        F.array_join(F.split(col, ""), SENT + SENT),
        F.lit(SENT),
    )


def _symbols(col):
    """sentinel state string -> array of symbols."""
    return F.split(F.expr(f"trim(BOTH '{SENT}' FROM {col})"), SENT + SENT)


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, c): adjacent-symbol pair counts weighted by word count."""
    syms = _symbols("s")
    pairs = F.expr(
        "transform(slice(sym, 1, greatest(size(sym) - 1, 0)),"
        " (t, i) -> struct(t as a, sym[i + 1] as b))"
    )
    return (
        words.select("count", syms.alias("sym"))
        .select("count", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("count").alias("c"))
    )


def bpe_learn(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[dict]:
    """Learn `n_merges` BPE merges. Returns the ordered merge table:
    [{merge_ix, left, right, merged, pair_count}] — left/right are the
    merged pair's symbols, pair_count its corpus-weighted frequency at
    the time of the merge. Ties break lexicographically on (left, right)
    — fully deterministic. Stops early (shorter list) when no pair
    occurs twice.

    Scale: the loop runs on the distinct-word table; each round is one
    explode+count over it, a 1-ROW collect, and one replace() map. The
    corpus is touched exactly once (word_frequencies)."""
    if n_merges < 1:
        raise ValueError(f"bpe_learn: n_merges must be >= 1, got {n_merges}")
    words = (
        word_frequencies(df, text_col, id_col)
        .select(_encode(F.col("word")).alias("s"), "count")
        .localCheckpoint()
    )
    merges: list[dict] = []
    for ix in range(n_merges):
        top = (
            _pair_counts(words)
            .filter(F.col("c") >= 2)
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], top[0]["c"]
        merges.append(
            {
                "merge_ix": ix,
                "left": a,
                "right": b,
                "merged": a + b,
                "pair_count": int(c),
            }
        )
        prev = words
        words = words.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(f"{SENT}{a}{SENT}{SENT}{b}{SENT}"),
                F.lit(f"{SENT}{a}{b}{SENT}"),
            ),
        ).localCheckpoint()
        prev.unpersist()
    words.unpersist()
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table: (id, tokens array<string>, n_tokens)
    where each word is segmented by replaying the merges IN ORDER — the
    exact BPE inference rule. Pure string ops: the per-word symbol state
    goes through the same sentinel replace() chain the trainer used, so
    segment(learn(corpus)) is internally consistent by construction.

    Scale: one explode to words, |merges| chained replace() expressions
    (a single codegen'd projection — no per-merge pass), one groupBy(id)
    reassembly."""
    from slowspark.textops import ws_token_array

    state = _encode(F.col("word"))
    for m in merges:
        state = F.replace(
            state,
            F.lit(f"{SENT}{m['left']}{SENT}{SENT}{m['right']}{SENT}"),
            F.lit(f"{SENT}{m['merged']}{SENT}"),
        )
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(ws_token_array(text_col)).alias("pos", "word"),
        )
        .select("id", "pos", state.alias("s"))
        .select("id", "pos", _symbols("s").alias("sym"))
    )
    return (
        toks.groupBy("id")
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "sym"))
                ).getField("sym")
            ).alias("tokens")
        )
        .select(
            F.col("id").alias(id_col),
            "tokens",
            F.size("tokens").alias("n_tokens"),
        )
    )
