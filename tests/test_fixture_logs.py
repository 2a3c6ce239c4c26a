"""M2 fixture fidelity: parse the reference's committed log fixtures.

The fixtures are read from /root/reference/assets at test time (read-only;
NOT copied into this repo). Hard goldens from the reference test suite:
  - 310 entries in slow-test-queries.log (src/codec.rs:583)
  - 22 entries in slow-test-queries-small.log (restartability analog:
    src/codec.rs:586-599 asserts the same count at 4-byte read capacity)
  - admin histogram: Ping 1 + Quit 12 (big), 3 admin total (small)
  - multi-word admin commands (log lines 44/723/764: Init DB x2,
    Register Slave) land in InvalidStatement (src/parser.rs:479-494
    single-token grammar fall-through)

The SqlStatement/InvalidStatement split inside the 297 non-admin entries is
pinned HERE by our own validity rule (FIXTURES.md §E sanctions pinning at
M2): 195 SqlStatement + 102 InvalidStatement (big), 6 + 13 (small). The 102
invalid = 96 /*!NNNNN ...*/ version comments + 3 multi-word admin +
1 CREATE TRIGGER-style + 1 CHECKSUM + 1 LOAD (all sqlparser-rejected in the
reference era as well).
"""

import os
from collections import Counter

import pytest

from slowspark.grammar import parse_entries

ASSETS = "/root/reference/assets"
BIG = os.path.join(ASSETS, "slow-test-queries.log")
SMALL = os.path.join(ASSETS, "slow-test-queries-small.log")

needs_fixtures = pytest.mark.skipif(
    not os.path.exists(BIG), reason="reference assets not available"
)


def _parse(path):
    with open(path, encoding="utf-8", errors="replace") as f:
        return parse_entries(f.read())


@needs_fixtures
def test_big_log_totals():
    entries = _parse(BIG)
    assert len(entries) == 310  # src/codec.rs:583
    kinds = Counter(e["entry_kind"] for e in entries)
    assert kinds["ParseError"] == 0
    assert kinds["AdminCommand"] == 13
    assert kinds["SqlStatement"] == 195  # pinned: our validity rule
    assert kinds["InvalidStatement"] == 102


@needs_fixtures
def test_big_log_admin_histogram():
    entries = _parse(BIG)
    admin = Counter(
        e["admin_command"] for e in entries if e["entry_kind"] == "AdminCommand"
    )
    assert admin == {"Ping": 1, "Quit": 12}


@needs_fixtures
def test_big_log_multiword_admin_fall_through():
    entries = _parse(BIG)
    mw = [
        e for e in entries
        if e["entry_kind"] == "InvalidStatement"
        and e["statement_raw"].startswith(b"# administrator command:")
    ]
    heads = sorted(e["statement_raw"].decode() for e in mw)
    assert heads == [
        "# administrator command: Init DB;",
        "# administrator command: Init DB;",
        "# administrator command: Register Slave;",
    ]


@needs_fixtures
def test_big_log_sql_type_histogram():
    entries = _parse(BIG)
    types = Counter(
        e["sql_type"] for e in entries if e["entry_kind"] == "SqlStatement"
    )
    assert types == {
        "INSERT": 42,  # 41 INSERT + 1 REPLACE INTO
        "LOCK TABLES": 32,  # 16 LOCK + 16 UNLOCK (quirk src/types.rs:173)
        "ALTER TABLE": 32,
        "CREATE TABLE": 31,
        "SELECT": 20,
        "DROP TABLE": 11,
        "SET": 9,
        "CREATE VIEW": 6,
        "CREATE DATABASE": 3,
        "COMMIT TRANSACTION": 2,
        "SHOW VARIABLE": 1,
        "USE": 1,
        "FLUSH": 1,
        "NULL": 1,  # ANALYZE -> reference Unknown arm (src/types.rs:175)
        "UPDATE": 1,
        "SHOW TABLES": 1,
        "ROLLBACK TRANSACTION": 1,
    }


@needs_fixtures
def test_small_log_totals():
    entries = _parse(SMALL)
    assert len(entries) == 22
    kinds = Counter(e["entry_kind"] for e in entries)
    assert kinds["AdminCommand"] == 3
    assert kinds["SqlStatement"] == 6
    assert kinds["InvalidStatement"] == 13
    admin = Counter(
        e["admin_command"] for e in entries if e["entry_kind"] == "AdminCommand"
    )
    assert admin == {"Ping": 1, "Quit": 2}


@needs_fixtures
def test_byte_identity_roundtrip():
    """Byte-identity invariant (BASELINE.json input_hint): every non-admin,
    non-error statement_raw must be an exact byte slice of the source text,
    terminating in ';'."""
    with open(BIG, encoding="utf-8", errors="replace") as f:
        text = f.read()
    data = text.encode("utf-8")
    for e in parse_entries(text):
        if e["entry_kind"] in ("SqlStatement", "InvalidStatement"):
            raw = e["statement_raw"]
            assert raw.endswith(b";")
            assert raw in data


@needs_fixtures
def test_canonical_sql_divergence_inventory():
    """Pin the EXACT set of fixture entries whose `statement` (our
    canonical rendering: comments dropped, whitespace outside strings
    collapsed, trailing ';' stripped — grammar.canonical_sql) differs from
    the minimally-normalized raw SQL (whitespace-collapse + ';'-strip
    only).

    Why this exists (round-3 verdict): the reference REWRITES parseable
    statements to sqlparser's canonical ``Statement::to_string()`` form
    (/root/reference/src/codec.rs:220), which is not reproducible offline;
    our substitute form is documented in SURVEY.md §2.3. A user diffing
    `statement` against the reference therefore needs to know exactly
    where and how the two renderings can differ. Against the minimal
    normalization, our rendering diverges on EXACTLY ONE entry per
    fixture log — the mid-statement MySQL version comment, which we drop:

        big log entry 3 / small log entry 3:
        'SHOW /*!40100 ENGINE*/ INNODB STATUS' -> 'SHOW INNODB STATUS'

    Everything else is byte-preserved modulo whitespace runs and the
    trailing ';' (string literals keep interior whitespace verbatim: the
    tokenizer emits string tokens untouched). The reference's sqlparser
    rendering ADDITIONALLY normalizes keyword case, literal quoting, and
    parenthesization — categorically documented, not reproducible here;
    any change to OUR side of the divergence fails this test first."""
    import re

    def divergences(path):
        out = {}
        for e in _parse(path):
            if e["entry_kind"] != "SqlStatement":
                continue
            raw = e["statement_raw"].decode("utf-8")
            minimal = re.sub(r"\s+", " ", raw).strip().rstrip(";").rstrip()
            if e["statement"] != minimal:
                out[e["entry_index"]] = (minimal, e["statement"])
        return out

    big = divergences(BIG)
    assert set(big) == {3}
    assert big[3] == (
        "SHOW /*!40100 ENGINE*/ INNODB STATUS",
        "SHOW INNODB STATUS",
    )
    small = divergences(SMALL)
    assert set(small) == {3}
    assert small[3] == (
        "SHOW /*!40100 ENGINE*/ INNODB STATUS",
        "SHOW INNODB STATUS",
    )
