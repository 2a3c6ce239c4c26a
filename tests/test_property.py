"""Property-based tests (hypothesis) for the grammar hot paths.

The optimized regex-jump scanner must agree with a verbatim port of the
reference's per-char loop (src/parser.rs:131-167) on arbitrary inputs, and
the masking fingerprint must be invariant under literal substitution."""

from hypothesis import given, settings, strategies as st

from slowspark.grammar import mask_fingerprint, scan_sql_statement

ALPHABET = list("ab \n;'\"`\\x1,()=")


def reference_scan(text: str, pos: int):
    """Verbatim port of the reference sql_lines loop semantics
    (src/parser.rs:138-164): per-char, quote stack, escape flag."""
    quotes = []
    escaped = False
    i = pos
    n = len(text)
    while i < n:
        c = text[i]
        if not escaped and c in ("'", '"', "`"):
            if quotes and quotes[-1] == c:
                quotes.pop()
            else:
                quotes.append(c)
        if not escaped and c == "\\":
            escaped = True
        else:
            escaped = False
        if not quotes and c == ";":
            return i + 1
        i += 1
    return None


@given(st.text(alphabet=ALPHABET, max_size=200))
@settings(max_examples=500, deadline=None)
def test_scan_agrees_with_reference_loop(s):
    assert scan_sql_statement(s, 0) == reference_scan(s, 0)


@given(st.text(alphabet=ALPHABET, max_size=120), st.integers(0, 60))
@settings(max_examples=200, deadline=None)
def test_scan_agrees_at_any_start(s, pos):
    pos = min(pos, len(s))
    assert scan_sql_statement(s, pos) == reference_scan(s, pos)


@given(
    # non-negative: '-1' tokenizes as minus + number in the reference's
    # sqlparser too, so sign changes legitimately change the masked form
    st.integers(0, 99999),
    st.integers(0, 99999),
    st.text(alphabet=list("abc d"), max_size=20),
    st.text(alphabet=list("xyz w"), max_size=20),
)
@settings(max_examples=200, deadline=None)
def test_fingerprint_literal_invariance(n1, n2, s1, s2):
    """Two statements differing only in literal values produce EQUAL
    fingerprints (reference invariant, src/parser.rs:807-823)."""
    tpl = "SELECT a, {n}, '{s}' FROM t WHERE b < {n} ORDER BY a"
    fp1 = mask_fingerprint(tpl.format(n=n1, s=s1.replace("'", "")))
    fp2 = mask_fingerprint(tpl.format(n=n2, s=s2.replace("'", "")))
    assert fp1 == fp2


@given(st.text(alphabet=ALPHABET, max_size=200))
@settings(max_examples=300, deadline=None)
def test_fingerprint_total(s):
    """mask_fingerprint never raises on arbitrary input (malformed
    statements route to InvalidStatement, they must not kill a task)."""
    mask_fingerprint(s)


# ---------------------------------------------------------------------------
# corpus.quality_filter_flags vs a pure-Python reference
# ---------------------------------------------------------------------------

_JAVA_WS = " \t\n\x0b\f\r"  # Java regex \s is ASCII-only (unlike Python's)
# \x0b included: Java \s and RE2 \s disagree on it, so the oracles spell
# the class out — the differential must cover the disagreement byte
_QF_ALPHABET = list("abe THE.the,a#7 09%\t\né中ß-\x0b")


def _ref_quality_row(text, min_words=20, max_words=100_000,
                     min_mwl=2.0, max_mwl=12.0, max_sym=0.1, max_dig=0.3,
                     min_stop=1):
    """Pure-Python re-implementation of quality_filter_flags' per-row math,
    with Java-regex whitespace semantics (\\s = ASCII classes only)."""
    import re

    ws = f"[{_JAVA_WS}]"
    trimmed = text.strip(_JAVA_WS)
    toks = [t for t in re.split(ws + "+", trimmed.lower()) if t]
    n_words = len(toks)
    n_chars = len(text)
    nonws = len(re.sub(ws + "+", "", text))
    # Java \p{L}\p{N} == Unicode general categories L* / N* (Python's re
    # has no \p classes, so count via unicodedata)
    import unicodedata

    symbols = sum(
        1 for ch in text
        if ch not in _JAVA_WS and unicodedata.category(ch)[0] not in "LN"
    )
    digits = len(re.sub("[^0-9]", "", text))
    mean_wl = nonws / max(n_words, 1)
    sym_r = symbols / max(n_chars, 1)
    dig_r = digits / max(n_chars, 1)
    stops = {"the", "a", "to", "of", "and", "in", "that", "with"}
    stop_hits = len(set(toks) & stops)
    rules = {
        "rule_word_count": min_words <= n_words <= max_words,
        "rule_mean_word_len": min_mwl <= mean_wl <= max_mwl,
        "rule_symbol_ratio": sym_r <= max_sym,
        "rule_digit_ratio": dig_r <= max_dig,
        "rule_stopwords": stop_hits >= min_stop,
    }
    return {
        "n_words": n_words,
        "stopword_hits": stop_hits,
        **rules,
        "keep": all(rules.values()),
    }


@given(
    st.lists(st.text(alphabet=_QF_ALPHABET, max_size=120), min_size=1, max_size=30)
)
@settings(max_examples=15, deadline=None)
def test_quality_filter_matches_python_reference(spark, texts):
    from slowspark.corpus import quality_filter_flags

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in quality_filter_flags(df).collect()}
    for i, t in enumerate(texts):
        want = _ref_quality_row(t)
        for k, v in want.items():
            assert got[i][k] == v, (k, repr(t), got[i][k], v)


# ---- Gopher repetition signals vs an independent reference ----------------

_GOPHER_WS = " \t\n\x0b\f\r"


def _ref_gopher_row(text):
    """Independent recompute of all 13 signals: Counter + explicit
    covered-index SETS (the implementation uses a difference array)."""
    import re as _re
    from collections import Counter as _C

    def dup(items):
        n = len(items)
        if n == 0:
            return 0, 0.0, 0.0
        c = _C(items)
        dn = sum(v - 1 for v in c.values())
        dch = sum((v - 1) * len(k) for k, v in c.items())
        tot = sum(len(x) for x in items)
        return n, dn / n, (dch / tot) if tot else 0.0

    lines = [x for x in (l.strip(_GOPHER_WS) for l in text.split("\n")) if x]
    paras = [
        x for x in (p.strip(_GOPHER_WS) for p in _re.split(r"\n{2,}", text)) if x
    ]
    toks = [t for t in _re.split(r"[ \t\n\x0B\f\r]+", text.lower()) if t]
    joined = " ".join(toks)
    row = {}
    row["n_lines"], row["dup_line_frac"], row["dup_line_char_frac"] = dup(lines)
    row["n_paras"], row["dup_para_frac"], row["dup_para_char_frac"] = dup(paras)
    starts = []
    off = 0
    for t in toks:
        starts.append(off)
        off += len(t) + 1
    for n in (2, 3, 4):
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if not grams or not joined:
            row[f"top_{n}gram_char_frac"] = 0.0
            continue
        c = _C(grams)
        mx = max(c.values())
        top = min(g for g, v in c.items() if v == mx)
        row[f"top_{n}gram_char_frac"] = mx * len(top) / len(joined)
    for n in range(5, 11):
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if not grams or not joined:
            row[f"dup_{n}gram_char_frac"] = 0.0
            continue
        c = _C(grams)
        covered = set()
        for i, g in enumerate(grams):
            if c[g] >= 2:
                covered.update(range(starts[i], starts[i] + len(g)))
        row[f"dup_{n}gram_char_frac"] = len(covered) / len(joined)
    return row


@given(
    st.lists(
        st.text(alphabet=list("ab c\n"), max_size=150), min_size=1, max_size=8
    )
)
@settings(max_examples=10, deadline=None)
def test_gopher_repetition_matches_python_reference(spark, texts):
    from slowspark.gopherrep import gopher_repetition_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in gopher_repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        want = _ref_gopher_row(t)
        for k, v in want.items():
            if isinstance(v, float):
                assert abs(got[i][k] - v) < 1e-12, (k, repr(t), got[i][k], v)
            else:
                assert got[i][k] == v, (k, repr(t), got[i][k], v)


# ---- BPE trainer vs the pure-Python reference -----------------------------

@given(
    st.lists(
        st.text(alphabet=list("abcd "), min_size=1, max_size=60),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 6),
)
@settings(max_examples=10, deadline=None)
def test_bpe_learn_property_matches_reference(spark, texts, n_merges):
    from slowspark.bpe import bpe_learn, word_frequencies
    from tests.test_bpe import _ref_bpe

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wf = {r["word"]: r["count"] for r in word_frequencies(df).collect()}
    got = bpe_learn(df, n_merges=n_merges)
    ref = _ref_bpe(wf, n_merges)
    assert [
        (m["left"], m["right"], m["merged"], m["pair_count"]) for m in got
    ] == [(m["left"], m["right"], m["merged"], m["pair_count"]) for m in ref]


# ---- Stupid Backoff scoring vs a pure-Python reference --------------------

def _ref_sb(doc_texts, model_texts, alpha=0.4):
    import math
    from collections import Counter as _C

    def toks(t):
        return [x for x in t.lower().split() if x]

    uni = _C()
    big = _C()
    for t in model_texts:
        tk = toks(t)
        uni.update(tk)
        big.update(zip(tk, tk[1:]))
    N = sum(uni.values())
    out = {}
    for i, t in enumerate(doc_texts):
        tk = toks(t)
        pairs = list(zip(tk, tk[1:]))
        if not pairs:
            out[i] = (0, 0.0)
            continue
        ss = []
        for w1, w2 in pairs:
            if (w1, w2) in big:
                ss.append(big[(w1, w2)] / uni[w1])
            else:
                ss.append(alpha * max(uni.get(w2, 0), 1) / N)
        out[i] = (
            len(pairs),
            round(sum(-math.log(s) for s in ss) / len(pairs), 6),
        )
    return out


@given(
    st.lists(st.text(alphabet=list("ab c"), max_size=60), min_size=1, max_size=6),
    st.lists(st.text(alphabet=list("ab c"), min_size=3, max_size=60),
             min_size=1, max_size=4),
)
@settings(max_examples=10, deadline=None)
def test_stupid_backoff_matches_python_reference(spark, texts, model_texts):
    from hypothesis import assume

    from slowspark.corpus import stupid_backoff_logprob

    assume(any(len(t.split()) >= 1 for t in model_texts))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    mdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(model_texts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_neg_logprob"])
        for r in stupid_backoff_logprob(df, model_df=mdf).collect()
    }
    want = _ref_sb(texts, model_texts)
    assert got == want


# ---------------------------------------------------------------------------
# UniMax waterfill (pure core, no Spark)
# ---------------------------------------------------------------------------

@given(
    st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=3),
        st.floats(min_value=1.0, max_value=1e9,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=8,
    ),
    st.floats(min_value=0.5, max_value=1.0),
)
@settings(deadline=None, max_examples=200)
def test_waterfill_is_maxmin_fair(caps, frac):
    """Properties of the UniMax core on random caps/budgets:
    (1) budget conservation: allocations sum to the budget (<= capacity
        by construction here);
    (2) feasibility: no allocation exceeds its cap (tolerance 1 ulp-ish);
    (3) max-min fairness: every UNCAPPED key's allocation is >= every
        other allocation (you cannot raise the minimum by taking from
        anyone) — the defining property of water-filling;
    (4) uncapped keys all share one level."""
    import pytest

    from slowspark.corpus import _waterfill

    budget = frac * sum(caps.values())
    alloc = _waterfill(caps, budget)
    assert set(alloc) == set(caps)
    total = sum(alloc[s] for s in sorted(alloc))
    assert total == pytest.approx(budget, rel=1e-9)
    eps = 1e-9 * max(caps.values())
    for s, a in alloc.items():
        assert a <= caps[s] + eps
    uncapped = [s for s in alloc if alloc[s] < caps[s] - eps]
    if uncapped:
        level = max(alloc[s] for s in uncapped)
        for s, a in alloc.items():
            assert a <= level + eps  # nobody exceeds the shared level
        for s in uncapped:
            assert alloc[s] == pytest.approx(level, rel=1e-9)


# ---------------------------------------------------------------------------
# latest_capture / crawl_delta vs a pure-Python reference
# ---------------------------------------------------------------------------

@given(
    st.lists(
        st.tuples(
            st.integers(0, 7),    # url index
            st.integers(0, 5),    # ts
            st.integers(-3, 3),   # capture id (collisions + negatives)
            st.integers(0, 2),    # fingerprint index
        ),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 2)),
        max_size=10,
        unique_by=lambda t: t[0],
    ),
)
@settings(max_examples=10, deadline=None)
def test_latest_capture_and_crawl_delta_match_python_reference(
    spark, caps, new_snap
):
    from slowspark.weburl import crawl_delta, latest_capture

    rows = [(f"u{u}", t, c, f"f{fp}") for u, t, c, fp in caps]
    df = spark.createDataFrame(
        rows, "url string, warc_ts long, doc_id long, fingerprint string"
    )
    kept = latest_capture(df).collect()
    # python reference: max (ts, id) per url; n_captures = group size
    ref: dict[str, tuple] = {}
    sizes: dict[str, int] = {}
    for u, t, c, fp in rows:
        sizes[u] = sizes.get(u, 0) + 1
        if u not in ref or (t, c) > (ref[u][0], ref[u][1]):
            ref[u] = (t, c, fp)
    assert len(kept) == len(ref)
    for r in kept:
        t, c, fp = ref[r["url"]]
        assert (r["warc_ts"], r["doc_id"], r["n_captures"]) == (
            t, c, sizes[r["url"]]
        )
        # the keeper's fingerprint is the max-capture's fingerprint
        # only when (ts,id) is unique in its group; equal (ts,id) pairs
        # are genuine full duplicates and either fp is a valid keeper
        if sum(1 for (u2, t2, c2, _) in rows
               if (f"u{u2}", t2, c2) == (r["url"], t, c)) == 1:
            assert r["fingerprint"] == fp

    old = {u: v[2] for u, v in ref.items()}
    new = {f"u{u}": f"f{fp}" for u, fp in new_snap}
    old_df = spark.createDataFrame(
        [(u, f) for u, f in old.items()], "url string, fingerprint string"
    )
    new_df = spark.createDataFrame(
        [(u, f) for u, f in new.items()], "url string, fingerprint string"
    ) if new else spark.createDataFrame([], "url string, fingerprint string")
    got = {r["url"]: r["status"] for r in crawl_delta(old_df, new_df).collect()}
    want = {}
    for u in set(old) | set(new):
        if u not in old:
            want[u] = "new"
        elif u not in new:
            want[u] = "gone"
        elif old[u] == new[u]:
            want[u] = "unchanged"
        else:
            want[u] = "changed"
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from([
                "https://x.ex/a", "//cdn.ex/b", "/root/c", "rel/d",
                "mailto:e@f.g", "", "HTTP://UP.EX/h",
            ]),
            st.sampled_from(['', ' class="k"', ' id="z" ']),
        ),
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_extract_links_matches_python_re(spark, anchors):
    import re

    from slowspark.weburl import LINK_HREF_RE, extract_links

    html = "<html><body>" + "".join(
        f"<a{attrs} href=\"{h}\">t</a>" for h, attrs in anchors
    ) + "</body></html>"
    base = "https://base.example.com/dir/p"
    df = spark.createDataFrame(
        [(base, html.encode())], "url string, html binary"
    )
    got = [(r["href"], r["resolved_url"])
           for r in extract_links(df).collect()]
    want = []
    for h in re.findall(LINK_HREF_RE, html):
        if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", h):
            want.append((h, h))
        elif h.startswith("//"):
            want.append((h, "https:" + h))
        elif h.startswith("/"):
            want.append((h, "https://base.example.com" + h))
        else:
            want.append((h, None))
    assert sorted(got, key=str) == sorted(want, key=str)


# --------------------------------------------------- unigram viterbi


def _enumerate_best(word, logp, max_piece_len):
    """Brute-force optimal segmentation score by enumerating EVERY
    segmentation (exponential — fine at len <= 8)."""
    from slowspark.unigramlm import UNK_LOGP

    best = [None] * (len(word) + 1)
    best[0] = 0.0
    for pos in range(1, len(word) + 1):
        for j in range(max(0, pos - max_piece_len), pos):
            if best[j] is None:
                continue
            p = word[j:pos]
            lp = logp.get(p)
            if lp is None:
                if pos - j != 1:
                    continue
                lp = UNK_LOGP
            s = best[j] + lp
            if best[pos] is None or s > best[pos]:
                best[pos] = s
    return best[len(word)]


@given(
    st.text(alphabet=list("abc"), min_size=1, max_size=8),
    st.dictionaries(
        st.text(alphabet=list("abc"), min_size=1, max_size=3),
        st.floats(min_value=-10.0, max_value=-0.1),
        max_size=12,
    ),
)
@settings(max_examples=300, deadline=None)
def test_viterbi_pieces_is_optimal_and_reassembles(word, model):
    from slowspark.unigramlm import UNK_LOGP, viterbi_pieces

    L = 3
    pieces = viterbi_pieces(word, model, L)
    # segmentation is a partition of the word
    assert "".join(pieces) == word
    assert all(1 <= len(p) <= L for p in pieces)
    # its score equals the brute-force optimum
    score = sum(model.get(p, UNK_LOGP) for p in pieces)
    assert score == _enumerate_best(word, model, L)
    # every out-of-vocab piece is a single char (the UNK contract)
    for p in pieces:
        assert p in model or len(p) == 1


# ---------------------------------------------------- aho-corasick


def _ac_scan_counts(text, patterns):
    """Pure-python replica of the UDF scan loop over the built
    automaton (tests the automaton itself, not Spark plumbing)."""
    from slowspark.textops import _aho_corasick_build

    goto, fail, out = _aho_corasick_build(patterns)
    hits = {}
    s = 0
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        for ix in out[s]:
            hits[ix] = hits.get(ix, 0) + 1
    return {patterns[ix]: n for ix, n in hits.items()}


@given(
    st.text(alphabet=list("ab c"), max_size=120),
    st.lists(
        st.text(alphabet=list("ab c"), min_size=1, max_size=4),
        min_size=1, max_size=6, unique=True,
    ),
)
@settings(max_examples=300, deadline=None)
def test_aho_corasick_counts_match_regex(text, patterns):
    import re

    got = _ac_scan_counts(text, patterns)
    want = {}
    for p in patterns:
        n = len(re.findall(f"(?={re.escape(p)})", text))
        if n:
            want[p] = n
    assert got == want
