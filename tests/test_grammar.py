"""M0: pure-Python grammar tests, porting the reference unit vectors verbatim.

Inputs are the exact strings from /root/reference/src/parser.rs tests
(lines cited per test) and /root/reference/src/codec.rs codec tests. No Spark.
"""

from datetime import datetime, timezone

import pytest

from slowspark.grammar import (
    ADMIN_RE,
    HEADER_RE,
    STATS_RE,
    TIME_RE,
    USE_RE,
    USER_RE,
    SET_TS_RE,
    DetailsCommentError,
    canonical_sql,
    default_comment_context,
    extract_objects,
    mask_fingerprint,
    parse_details_comment,
    parse_entries,
    parse_iso8601_utc_us,
    resolve_statement,
    scan_sql_statement,
    tokenize_sql,
)


# --- line parsers (src/parser.rs:583-926) ---------------------------------

def test_parses_time_line():
    # src/parser.rs:596-623
    i = "# Time: 2015-06-26T16:43:23+0200"
    m = TIME_RE.match(i)
    assert m and m.group("ts") == "2015-06-26T16:43:23+0200"
    us = parse_iso8601_utc_us(m.group("ts"))
    expected = datetime(2015, 6, 26, 14, 43, 23, tzinfo=timezone.utc)
    assert us == int(expected.timestamp()) * 1_000_000


def test_time_millisecond_truncation():
    # codec test comment: "decimal places were shortened by parser"
    # (src/codec.rs:383-384): .273786 carried as .273
    us = parse_iso8601_utc_us("2018-02-05T02:46:47.273786Z")
    expected = datetime(2018, 2, 5, 2, 46, 47, 273000, tzinfo=timezone.utc)
    assert us == int(expected.timestamp()) * 1_000_000 + 273000


def test_parses_use_database():
    # src/parser.rs:625-635 — fully consumed
    m = USE_RE.match("use mysql;")
    assert m and m.group("db") == "mysql" and m.end() == len("use mysql;")


def test_parses_host_names():
    # src/parser.rs:637-655 via the USER_RE host group
    line1 = "# User@Host: u[u] @ localhost []  Id: 1"
    assert USER_RE.match(line1).group("host") == "localhost"
    line2 = "# User@Host: u[u] @ local.tests.rs []  Id: 1"
    assert USER_RE.match(line2).group("host") == "local.tests.rs"


def test_parses_ip_address():
    # src/parser.rs:657-665
    line = "# User@Host: u[u] @ [127.0.0.2]  Id: 1"
    assert USER_RE.match(line).group("ip") == "127.0.0.2"


def test_parses_user_line_no_ip():
    # src/parser.rs:667-683
    i = "# User@Host: msandbox[msandbox] @ localhost []  Id:     3\n"
    m = USER_RE.match(i)
    assert m is not None
    assert m.group("user") == "msandbox"
    assert m.group("sys_user") == "msandbox"
    assert m.group("host") == "localhost"
    assert m.group("ip") is None
    assert int(m.group("thread_id")) == 3


def test_parses_user_line_no_host():
    # src/parser.rs:685-699
    i = "# User@Host: lobster[lobster] @ [192.168.56.1]  Id:   190\n"
    m = USER_RE.match(i)
    assert m is not None
    assert m.group("host") is None
    assert m.group("ip") == "192.168.56.1"
    assert int(m.group("thread_id")) == 190


def test_parses_stats_line():
    # src/parser.rs:701-716
    i = "# Query_time: 1.000016  Lock_time: 2.000000 Rows_sent: 3  Rows_examined: 4\n"
    m = STATS_RE.match(i)
    assert float(m.group("query_time")) == 1.000016
    assert float(m.group("lock_time")) == 2.0
    assert int(m.group("rows_sent")) == 3
    assert int(m.group("rows_examined")) == 4


def test_parses_admin_command_line():
    # src/parser.rs:718-730
    m = ADMIN_RE.match("# administrator command: Quit;\n")
    assert m and m.group("cmd") == "Quit"


def test_admin_multiword_falls_through():
    # single-token grammar: multi-word commands must NOT match
    # (src/parser.rs:479-494; fixture lines 44/723/764)
    assert ADMIN_RE.match("# administrator command: Init DB;\n") is None
    assert ADMIN_RE.match("# administrator command: Register Slave;\n") is None


def test_parses_set_timestamp():
    # src/parser.rs:796-805
    m = SET_TS_RE.match("SET timestamp=1517798807;")
    assert m and int(m.group("ts")) == 1517798807 and m.end() == 25


def test_parses_details_comment():
    # src/parser.rs:732-760 — ';'/',' pair seps x ':'/'=' kv seps
    expected = {
        "Id": "123",
        "long": "some kind of details here",
        "caller": "hello_world()",
    }
    for s in (
        "-- Id: 123; long: some kind of details here; caller: hello_world()\n",
        "-- Id: 123, long: some kind of details here, caller : hello_world()\n",
        "-- Id= 123, long = some kind of details here, caller= hello_world()\n",
    ):
        kv, end = parse_details_comment(s, 0)
        assert kv == expected
        assert end == len(s)


def test_parses_details_comment_trailing_key():
    # src/parser.rs:762-794 — values may contain ':'
    s = "-- Id: 123, long: some kind of details here, caller: hello_world():52\n"
    kv, _ = parse_details_comment(s, 0)
    assert kv["caller"] == "hello_world():52"
    s = "-- Id: 123, long: some kind of details here, caller: hello_world(): 52\n"
    kv, _ = parse_details_comment(s, 0)
    assert kv["caller"] == "hello_world(): 52"


def test_details_comment_duplicate_key_errors():
    # duplicate key -> hard error (src/parser.rs:353-356)
    with pytest.raises(DetailsCommentError):
        parse_details_comment("-- a: 1, a: 2\n", 0)


def test_parses_header():
    # src/parser.rs:904-925
    h = (
        "/home/karl/mysql/my-5.7/bin/mysqld, Version: 5.7.20-log (MySQL Community Server (GPL)). started with:\n"
        "Tcp port: 12345  Unix socket: /tmp/12345/mysql_sandbox12345.sock\n"
        "Time                 Id Command    Argument\n"
    )
    m = HEADER_RE.match(h)
    assert m is not None
    assert m.group("version") == "5.7.20-log (MySQL Community Server (GPL))."
    assert m.group("tcp_port") == "12345"
    assert m.group("socket") == "/tmp/12345/mysql_sandbox12345.sock"
    assert m.end() == len(h)
    # '#' guard (src/parser.rs:106): a Time line must never match
    assert HEADER_RE.match("# Time: 2018-02-05T02:46:43.015898Z\n") is None


# --- sql_lines scanner (src/parser.rs:825-902) -----------------------------

def test_parses_select_sql():
    sql = (
        "SELECT a, b, 123, 'abcd', myfunc(b) "
        "FROM table_1 "
        "WHERE a > b AND b < 100 "
        "ORDER BY a DESC, b;"
    )
    end = scan_sql_statement(sql, 0)
    assert sql[:end] == sql


def test_parses_setter_sql():
    sql = "/*!40101 SET NAMES utf8 */;\n"
    end = scan_sql_statement(sql, 0)
    assert sql[:end] == sql.strip()


def test_parses_quoted_terminator_sql():
    # src/parser.rs:848-874: ';' inside quotes is not a terminator;
    # trailing '\n' left on the stream
    sql = """SELECT
a.actor_id,
a.first_name,
a.last_name,
GROUP_CONCAT(DISTINCT CONCAT(c.name, ': ',
                (SELECT GROUP_CONCAT(f.title ORDER BY f.title SEPARATOR ', ')
                    FROM sakila.film f
                    INNER JOIN sakila.film_category fc
                      ON f.film_id = fc.film_id
                    INNER JOIN sakila.film_actor fa
                      ON f.film_id = fa.film_id
                    WHERE fc.category_id = c.category_id
                    AND fa.actor_id = a.actor_id
                 )
             )
             ORDER BY c.name SEPARATOR '; ')
AS film_info
FROM sakila.actor a;
"""
    end = scan_sql_statement(sql, 0)
    assert sql[:end] == sql.strip()
    assert sql[end:] == "\n"


def test_parses_quoted_quoted_terminator_sql():
    # src/parser.rs:876-902: backslash escapes + quote stack
    sql = """SELECT
a.actor_id,
GROUP_CONCAT(DISTINCT CONCAT(c.name, ': ',
                (SELECT GROUP_CONCAT(f.title ORDER BY f.title SEPARATOR ', ')
                    FROM sakila.film f
                 )
             )
             ORDER BY c.name SEPARATOR '\\'\\"; ')
AS film_info
FROM sakila.actor a;
"""
    end = scan_sql_statement(sql, 0)
    assert sql[:end] == sql.strip()


def test_quote_stack_push_differing_quote():
    # non-standard reference rule: a differing quote char inside an open
    # quote is PUSHED and must be closed (src/parser.rs:143-153)
    s = "SELECT '\" ; \" ; ';"
    end = scan_sql_statement(s, 0)
    assert s[:end] == s


# --- masking fingerprint (src/parser.rs:807-823) ----------------------------

def test_parses_masked_selects():
    sql0 = (
        "SELECT a, b, 123, 'abcd', myfunc(b) "
        "FROM table_1 "
        "WHERE a > b AND b < 100 "
        "ORDER BY a DESC, b"
    )
    sql1 = (
        "SELECT a, b, 456, 'efg', myfunc(b) "
        "FROM table_1 "
        "WHERE a > b AND b < 1000 "
        "ORDER BY a DESC, b"
    )
    assert mask_fingerprint(sql0) == mask_fingerprint(sql1)
    assert "?" in mask_fingerprint(sql0)
    assert "123" not in mask_fingerprint(sql0)


def test_fingerprint_masks_all_literal_classes():
    fp = mask_fingerprint(
        "SELECT 1, 1.5, .5, 'a', \"b\", N'c', X'1F', 0xAB, x'00' FROM t"
    )
    assert fp == "SELECT ?, ?, ?, ?, ?, ?, ?, ?, ? FROM t"


# --- statement resolution (src/codec.rs:183-238) ----------------------------

def test_version_comment_is_invalid():
    # /*!40101 SET NAMES utf8 */; -> zero statements -> InvalidStatement
    # (src/codec.rs:471-516 expects exactly 1 invalid of 3)
    r = resolve_statement("/*!40101 SET NAMES utf8 */;")
    assert r["entry_kind"] == "InvalidStatement"
    assert r["statement"] == "/*!40101 SET NAMES utf8 */;"


def test_canonical_sql_strips_semicolon_and_collapses_ws():
    # the reference canonical sql is semicolon-free (src/codec.rs:441)
    sql = "SELECT a,\n   b\nFROM   t;"
    assert canonical_sql(sql) == "SELECT a, b FROM t"


def test_select_objects_golden():
    # src/codec.rs:518-569
    sql = """SELECT film.film_id AS FID, film.title AS title, film.description AS description, category.name AS category, film.rental_rate AS price
    FROM category LEFT JOIN film_category ON category.category_id = film_category.category_id LEFT
    JOIN film ON film_category.film_id = film.film_id LEFT JOIN film AS dupe_film ON film_category
    .film_id = dupe_film.film_id LEFT JOIN other.film AS other_film ON other_film.film_id =
    film_category.film_id
    GROUP BY film.film_id, category.name;"""
    r = resolve_statement(sql)
    assert r["entry_kind"] == "SqlStatement"
    assert r["sql_type"] == "SELECT"
    assert r["objects"] == [
        {"schema_name": None, "object_name": "category"},
        {"schema_name": None, "object_name": "film"},
        {"schema_name": None, "object_name": "film_category"},
        {"schema_name": "other", "object_name": "film"},
    ]


def test_objects_from_comma_list_and_update_insert():
    r = resolve_statement("SELECT * FROM a x, b y WHERE x.i = y.i;")
    assert [o["object_name"] for o in r["objects"]] == ["a", "b"]
    r = resolve_statement("UPDATE t1 SET a = 1 WHERE b = 2;")
    assert [o["object_name"] for o in r["objects"]] == ["t1"]
    r = resolve_statement("INSERT INTO s.t2 (a) VALUES (1);")
    assert r["objects"] == [{"schema_name": "s", "object_name": "t2"}]
    r = resolve_statement("CREATE TABLE IF NOT EXISTS t3 (a INT);")
    assert [o["object_name"] for o in r["objects"]] == ["t3"]


def test_sql_type_classifier():
    cases = {
        "SELECT 1;": "SELECT",
        "WITH x AS (SELECT 1) SELECT * FROM x;": "SELECT",
        "INSERT INTO t VALUES (1);": "INSERT",
        "REPLACE INTO t VALUES (1);": "INSERT",
        "UPDATE t SET a=1;": "UPDATE",
        "DELETE FROM t;": "DELETE",
        "CREATE TABLE t (a INT);": "CREATE TABLE",
        "CREATE UNIQUE INDEX i ON t (a);": "CREATE INDEX",
        "CREATE VIEW v AS SELECT 1;": "CREATE VIEW",
        "CREATE DATABASE d;": "CREATE DATABASE",
        "ALTER TABLE t ADD COLUMN b INT;": "ALTER TABLE",
        "DROP TABLE t;": "DROP TABLE",
        "DROP VIEW v;": "DROP TABLE",  # Statement::Drop displays DROP TABLE
        "DROP FUNCTION f;": "DROP FUNCTION",
        "SET NAMES utf8;": "SET",
        "SHOW VARIABLES;": "SHOW VARIABLES",
        "SHOW TABLES;": "SHOW TABLES",
        "USE mydb;": "USE",
        "BEGIN;": "BEGIN TRANSACTION",
        "START TRANSACTION;": "BEGIN TRANSACTION",
        "COMMIT;": "COMMIT TRANSACTION",
        "ROLLBACK;": "ROLLBACK TRANSACTION",
        "LOCK TABLES t READ;": "LOCK TABLES",
        # reference quirk: UnlockTables -> EntrySqlType::LockTables
        # (src/types.rs:173)
        "UNLOCK TABLES;": "LOCK TABLES",
        "FLUSH PRIVILEGES;": "FLUSH",
    }
    for sql, want in cases.items():
        r = resolve_statement(sql)
        assert r["entry_kind"] == "SqlStatement", sql
        assert r["sql_type"] == want, sql
    # unknown starters -> InvalidStatement (sqlparser-era failures)
    for sql in ("LOAD DATA INFILE 'x' INTO TABLE t;", "CHECKSUM TABLE t;"):
        assert resolve_statement(sql)["entry_kind"] == "InvalidStatement", sql


# --- full entry golden (src/codec.rs:375-469) -------------------------------

SELECT_ENTRY = """# Time: 2018-02-05T02:46:47.273Z
# User@Host: msandbox[msandbox] @ localhost []  Id:    10
# Query_time: 0.000352  Lock_time: 0.000000 Rows_sent: 0  Rows_examined: 0
use mysql;
SET timestamp=1517798807;
-- request_id: apLo5wdqkmKw4W7vGfiBc5, file: src/endpoints/original/mod.rs, method: notifications(), line: 38
SELECT film.film_id AS FID, film.title AS title, film.description AS description, category.name AS category, film.rental_rate AS price FROM category LEFT JOIN film_category ON category.category_id = film_category.category_id LEFT JOIN film ON film_category.film_id = film.film_id GROUP BY film.film_id, category.name;
"""


def test_parses_select_entry_golden():
    entries = parse_entries(SELECT_ENTRY)
    assert len(entries) == 1
    e = entries[0]
    assert e["entry_kind"] == "SqlStatement"
    assert e["user"] == "msandbox"
    assert e["sys_user"] == "msandbox"
    assert e["host"] == "localhost"
    assert e["ip"] is None
    assert e["thread_id"] == 10
    assert e["query_time"] == 0.000352
    assert e["lock_time"] == 0.0
    assert e["rows_sent"] == 0
    assert e["rows_examined"] == 0
    assert e["db"] == "mysql"  # kept (reference discards, codec.rs:171)
    assert e["set_timestamp"] == 1517798807
    expected = datetime(2018, 2, 5, 2, 46, 47, 273000, tzinfo=timezone.utc)
    assert e["log_time_us"] == int(expected.timestamp()) * 1_000_000 + 273000
    # canonical sql without ';' (src/codec.rs:441)
    assert e["statement"].endswith("GROUP BY film.film_id, category.name")
    assert not e["statement"].endswith(";")
    assert e["sql_type"] == "SELECT"
    assert e["context"] == {
        "request_id": "apLo5wdqkmKw4W7vGfiBc5",
        "caller": "src/endpoints/original/mod.rs",
        "function": "notifications()",
        "line": 38,
    }
    assert [o["object_name"] for o in e["objects"]] == [
        "category", "film", "film_category",
    ]
    # byte-identity anchor: raw statement bytes incl. ';'
    raw = e["statement_raw"].decode("utf-8")
    assert raw.startswith("SELECT film.film_id") and raw.endswith(";")


MULTI_ENTRIES = """# Time: 2018-02-05T02:46:47.273786Z
# User@Host: msandbox[msandbox] @ localhost []  Id:    10
# Query_time: 0.000352  Lock_time: 0.000000 Rows_sent: 0  Rows_examined: 0
SET timestamp=1517798807;
-- ID: 123, caller: hello_world()
SELECT film.film_id AS FID, film.title AS title, film.description AS description, category.name AS category, film.rental_rate AS price
FROM category LEFT JOIN film_category ON category.category_id = film_category.category_id LEFT JOIN film ON film_category.film_id = film.film_id
GROUP BY film.film_id, category.name;
# Time: 2018-02-05T02:46:47.273787Z
# User@Host: msandbox[msandbox] @ localhost []  Id:    10
# Query_time: 0.000352  Lock_time: 0.000000 Rows_sent: 0  Rows_examined: 0
SET timestamp=1517798808;
/*!40101 SET NAMES utf8 */;
# Time: 2018-02-05T02:46:47.273788Z
# User@Host: msandbox[msandbox] @ localhost []  Id:    10
# Query_time: 0.000352  Lock_time: 0.000000 Rows_sent: 0  Rows_examined: 0
SET timestamp=1517798809;
-- ID: 456, caller: hello_world()
SELECT film2.film_id AS FID, film2.title AS title, film2.description AS description, category.name
AS category, film2.rental_rate AS price
FROM category LEFT JOIN film_category ON category.category_id = film_category.category_id LEFT
JOIN film2 ON film_category.film_id = film2.film_id
GROUP BY film2.film_id, category.name;
"""


def test_parses_multiple_entries():
    # src/codec.rs:471-516: 3 entries, exactly 1 InvalidStatement
    entries = parse_entries(MULTI_ENTRIES)
    assert len(entries) == 3
    invalid = [e for e in entries if e["entry_kind"] == "InvalidStatement"]
    assert len(invalid) == 1
    assert invalid[0]["statement_raw"] == b"/*!40101 SET NAMES utf8 */;"
    # literal-differing SELECTs (123 vs 456 in the comment, film vs film2
    # tables) -> different fingerprints here, but same-shape queries collapse
    sqls = [e for e in entries if e["entry_kind"] == "SqlStatement"]
    assert len(sqls) == 2
    assert all(e["comment_kv"]["ID"] in ("123", "456") for e in sqls)


def test_header_then_entries_and_resync():
    text = (
        "/usr/sbin/mysqld, Version: 8.0.1 started with:\n"
        "Tcp port: 3306  Unix socket: /tmp/mysql.sock\n"
        "Time                 Id Command    Argument\n"
        + SELECT_ENTRY
        + "garbage that is not an entry\n"
        + SELECT_ENTRY
    )
    entries = parse_entries(text)
    kinds = [e["entry_kind"] for e in entries]
    assert kinds == ["SqlStatement", "ParseError", "SqlStatement"]


def test_admin_entry():
    text = """# Time: 2018-02-05T02:46:43.015898Z
# User@Host: msandbox[msandbox] @ localhost []  Id:     2
# Query_time: 0.000159  Lock_time: 0.000000 Rows_sent: 0  Rows_examined: 0
SET timestamp=1517798803;
# administrator command: Quit;
"""
    entries = parse_entries(text)
    assert len(entries) == 1
    e = entries[0]
    assert e["entry_kind"] == "AdminCommand"
    assert e["admin_command"] == "Quit"
    assert e["statement"] == "Quit"  # sql = bare command (codec.rs:186-190)


def test_multiword_admin_becomes_invalid():
    text = """# Time: 2018-02-05T02:46:43.015898Z
# User@Host: msandbox[msandbox] @ localhost []  Id:     2
# Query_time: 0.000159  Lock_time: 0.000000 Rows_sent: 0  Rows_examined: 0
SET timestamp=1517798803;
# administrator command: Init DB;
"""
    entries = parse_entries(text)
    assert len(entries) == 1
    e = entries[0]
    assert e["entry_kind"] == "InvalidStatement"
    assert e["statement_raw"] == b"# administrator command: Init DB;"


def test_default_comment_context_all_absent_is_none():
    assert default_comment_context({"unrelated": "x"}) is None


def test_escaped_semicolon_still_terminates_outside_quotes():
    # reference check order (src/parser.rs:161-163): the ';' terminator test
    # ignores the escape flag — an escaped ';' outside quotes terminates
    s = r"SELECT a \; b;"
    end = scan_sql_statement(s, 0)
    assert s[:end] == r"SELECT a \;"


def test_double_backslash_does_not_escape_quote():
    # '\\\\' = two backslashes: the second is escaped, so a following quote
    # is NOT escaped and opens a string
    s = "SELECT '\\\\' ; x;"
    end = scan_sql_statement(s, 0)
    assert s[:end] == "SELECT '\\\\' ;"


def test_backslash_escapes_quote():
    # '\\'' inside a string: escaped quote does not close it
    s = "SELECT 'a\\'b; c';"
    end = scan_sql_statement(s, 0)
    assert s[:end] == s


def test_log_meta_surfaces_on_entries():
    """The header captures must be KEPT, not discarded: every entry below a
    preamble carries log_meta{version, tcp_port, socket} mirroring the
    reference's HeaderLines (src/parser.rs:95-129, golden :904-925)."""
    text = (
        "/home/karl/mysql/my-5.7/bin/mysqld, Version: 5.7.20-log (MySQL Community Server (GPL)). started with:\n"
        "Tcp port: 12345  Unix socket: /tmp/12345/mysql_sandbox12345.sock\n"
        "Time                 Id Command    Argument\n"
        + SELECT_ENTRY
        + "garbage that is not an entry\n"
        + SELECT_ENTRY
    )
    entries = parse_entries(text)
    assert [e["entry_kind"] for e in entries] == [
        "SqlStatement", "ParseError", "SqlStatement"
    ]
    want = {
        "version": "5.7.20-log (MySQL Community Server (GPL)).",
        "tcp_port": 12345,
        "socket": "/tmp/12345/mysql_sandbox12345.sock",
    }
    # all three rows (including the ParseError lane) carry the preamble
    assert all(e["log_meta"] == want for e in entries)
    # no preamble -> NULL, never a fabricated struct
    assert all(e["log_meta"] is None for e in parse_entries(SELECT_ENTRY))


def test_log_meta_optional_port_and_socket():
    # reference: tcp_port and socket are opt(...) (src/parser.rs:116-119)
    text = (
        "/usr/sbin/mysqld, Version: 8.0.1 started with:\n"
        "Tcp port:  Unix socket: \n"
        "Time                 Id Command    Argument\n"
        + SELECT_ENTRY
    )
    (e,) = parse_entries(text)
    assert e["log_meta"] == {"version": "8.0.1", "tcp_port": None, "socket": None}
