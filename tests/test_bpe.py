"""bpe: distributed BPE training/segmentation vs a pure-Python reference."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from slowspark.bpe import bpe_learn, bpe_segment, word_frequencies


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference Sennrich BPE on a word-frequency dict: left-to-right
    non-overlapping merge application, (count desc, pair asc) argmax."""
    words: dict[tuple, int] = {}
    for w, c in word_counts.items():
        words[tuple(w)] = words.get(tuple(w), 0) + c
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        pc = Counter({p: c for p, c in pc.items() if c >= 2})
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append({"left": a, "right": b, "merged": a + b, "pair_count": c})
        new: dict[tuple, int] = {}
        for syms, cnt in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + cnt
        words = new
    return merges


def _ref_segment(word: str, merges) -> list[str]:
    syms = list(word)
    for m in merges:
        out, i = [], 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == m["left"]
                and syms[i + 1] == m["right"]
            ):
                out.append(m["merged"])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


CORPUS = [
    (1, "low low low lower lower lowest newest newest newest newest"),
    (2, "wider wider new new newer lowest widest low"),
    (3, "the cat sat on the mat the cat ran"),
]


def test_word_frequencies(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = {r["word"]: r["count"] for r in word_frequencies(df).collect()}
    assert wf["low"] == 4 and wf["newest"] == 4 and wf["the"] == 3


def test_bpe_learn_matches_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = {r["word"]: r["count"] for r in word_frequencies(df).collect()}
    got = bpe_learn(df, n_merges=10)
    ref = _ref_bpe(wf, 10)
    assert [
        (m["left"], m["right"], m["merged"], m["pair_count"]) for m in got
    ] == [(m["left"], m["right"], m["merged"], m["pair_count"]) for m in ref]
    assert [m["merge_ix"] for m in got] == list(range(len(got)))


def test_bpe_multichar_symbol_boundary_safety(spark):
    """After (a,b)->ab, the pair (b,c) must match only a REAL b symbol —
    never the b inside the merged 'ab' (the sentinel-wrapping invariant)."""
    # counts: (a,b)=5 ties (b,c)=5 -> lexicographic picks (a,b); then
    # (ab,c)=3 beats (b,c)=2; merge 3 IS (b,c) and must touch only the
    # real b,c symbols in 'xbc' — never the 'bc' inside the merged 'abc'
    text = "abc abc abc ab ab xbc xbc"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = bpe_learn(df, n_merges=3)
    assert [(m["left"], m["right"]) for m in got] == [
        ("a", "b"), ("ab", "c"), ("b", "c"),
    ]
    seg = {
        r["doc_id"]: r["tokens"]
        for r in bpe_segment(df, got).collect()
    }
    ref = _ref_bpe({"abc": 3, "ab": 2, "xbc": 2}, 3)
    exp = []
    for w in text.split():
        exp.extend(_ref_segment(w, ref))
    assert seg[1] == exp
    assert _ref_segment("abc", ref) == ["abc"]  # stayed whole
    assert _ref_segment("xbc", ref) == ["x", "bc"]


def test_bpe_early_stop_and_bad_args(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    got = bpe_learn(df, n_merges=50)
    assert got == []  # no pair reaches count 2
    with pytest.raises(ValueError, match="n_merges"):
        bpe_learn(df, 0)


def test_bpe_segment_matches_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_learn(df, n_merges=6)
    seg = {r["doc_id"]: r for r in bpe_segment(df, merges).collect()}
    for doc_id, text in CORPUS:
        exp = []
        for w in text.split():
            exp.extend(_ref_segment(w, merges))
        assert seg[doc_id]["tokens"] == exp
        assert seg[doc_id]["n_tokens"] == len(exp)
