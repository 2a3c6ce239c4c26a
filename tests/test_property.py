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
