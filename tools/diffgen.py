#!/usr/bin/env python3
"""Differential-fixture generator + verifier for the graft barrage suites.

The *DifferentialSpec.scala suites hardcode DuckDB-1.0-truth values for
generated expressions; this script is the committed provenance for those
fixtures (VERDICT r12 task 5).  Two modes:

  gen <family> [--seed N]   print Scala fixture tuples for a family,
                            values computed by the locally-installed
                            REAL DuckDB (1.0.0, /root/.pyenv/shims).
  verify <Spec.scala ...>   re-extract every ("expr", "value") fixture
                            pair from a committed spec and recompute it
                            in DuckDB; non-zero exit on any drift.

Families: json structmap regexp tz arith date string agg list window
(the last six verify-only: their expression lists live in the committed
specs; `verify` proves the hardcoded values still match real DuckDB).

Evaluation harness mirrors the specs exactly:
  scalar families:  SELECT CAST((expr) AS VARCHAR)          -> one value
  window family:    SELECT id, CAST((expr) AS VARCHAR) FROM
                    <the spec's VALUES table> ORDER BY id    -> "0=..;1=.."
NULL prints as None (the specs' convention).  TimeZone is forced to UTC
to match the pinned-UTC Spark session.
"""
import argparse
import random
import re
import sys

import duckdb


WINDOW_TABLE = ("(VALUES (0, 'b', 1), (1, 'b', 8), (2, 'b', 9), (3, 'b', 4), "
                "(4, 'b', 6), (5, 'a', 6), (6, 'a', 1), (7, 'a', 4), (8, 'b', 8), "
                "(9, 'a', 5), (10, 'b', 3), (11, 'a', 8)) t(id, g, v)")

AGG_TABLE = ("(VALUES (0, 'a', 8, 4.59), (1, 'c', 4, 2.27), (2, 'a', 20, 2.22), "
             "(3, 'c', 0, 2.56), (4, 'a', 20, -2.97), (5, 'b', 13, 1.71), "
             "(6, 'a', 20, 5.26), (7, 'a', 17, -2.53), (8, 'c', 19, 6.63), "
             "(9, 'c', 9, -2.63), (10, 'b', 12, 2.47), (11, 'a', 15, 7.47), "
             "(12, 'b', -5, -1.3), (13, 'a', -2, 5.89)) t(id, g, i, d)")


def connect():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    return con


def eval_scalar(con, expr):
    row = con.execute(f"SELECT CAST(({expr}) AS VARCHAR) AS v").fetchone()
    return "None" if row[0] is None else row[0]


def eval_window(con, expr):
    rows = con.execute(
        f"SELECT id, CAST(({expr}) AS VARCHAR) AS x FROM {WINDOW_TABLE} "
        "ORDER BY id").fetchall()
    return ";".join(f"{r[0]}={'None' if r[1] is None else r[1]}" for r in rows)


def eval_query(con, q):
    """full-query fixture: the query returns ONE column, already
    VARCHAR-cast, with its own deterministic ORDER BY; rows joined ';'"""
    rows = con.execute(q).fetchall()
    return ";".join("None" if r[0] is None else str(r[0]) for r in rows)


def eval_auto(con, text):
    head = text.lstrip().upper()
    return (eval_query(con, text)
            if head.startswith("SELECT") or head.startswith("WITH")
            or head.startswith("COPY")
            else eval_scalar(con, text))


def eval_agg(con, expr):
    rows = con.execute(
        f"SELECT g, CAST(({expr}) AS VARCHAR) AS v FROM {AGG_TABLE} "
        "GROUP BY g ORDER BY g").fetchall()
    return ";".join(f"{r[0]}={'None' if r[1] is None else r[1]}" for r in rows)


# ---------------------------------------------------------------- families

def fam_json(seed):
    rng = random.Random(seed)
    docs = [
        '{"a": 1, "b": "x", "c": [1, 2, 3]}',
        '{"a": {"b": {"c": 42}}, "list": [{"k": "v1"}, {"k": "v2"}]}',
        '{"s": "he said \\"hi\\"", "n": null, "f": 1.5, "t": true}',
        '[10, 20, 30, [40, 50]]',
        '{"empty_obj": {}, "empty_arr": [], "uni": "h\\u00e9llo"}',
        '{"a.b": 9, "a": {"b": 8}}',
    ]
    exprs = []
    # arrow chains over each doc
    chains = [
        ("'{d0}' -> 'a'",), ("'{d0}' ->> 'a'",), ("'{d0}' -> 'b'",),
        ("'{d0}' ->> 'b'",), ("'{d0}' -> 'c'",), ("'{d0}' ->> 'c'",),
        ("'{d0}' -> 'c' -> 0",), ("'{d0}' -> 'c' ->> 2",),
        ("'{d0}' -> 'missing'",), ("'{d0}' ->> 'missing'",),
        ("'{d1}' -> 'a' -> 'b' ->> 'c'",), ("'{d1}' -> 'a' -> 'b' -> 'c'",),
        ("'{d1}' -> 'list' -> 0 ->> 'k'",), ("'{d1}' -> 'list' -> 1 -> 'k'",),
        ("'{d1}' -> 'list' -> 7",),
        ("'{d2}' ->> 's'",), ("'{d2}' -> 's'",),
        ("'{d2}' -> 'n'",), ("'{d2}' ->> 'n'",),
        ("'{d2}' ->> 'f'",), ("'{d2}' ->> 't'",),
        ("'{d3}' -> 0",), ("'{d3}' ->> 1",), ("'{d3}' -> 3 ->> 0",),
        ("'{d3}' -> -1",), ("'{d3}' ->> -2",),
        ("'{d4}' -> 'empty_obj'",), ("'{d4}' -> 'empty_arr'",),
        ("'{d4}' ->> 'uni'",),
    ]
    for (tpl,) in chains:
        exprs.append(tpl.format(d0=docs[0].replace("'", "''"),
                                d1=docs[1].replace("'", "''"),
                                d2=docs[2].replace("'", "''"),
                                d3=docs[3].replace("'", "''"),
                                d4=docs[4].replace("'", "''")))
    # json_extract / json_extract_string path spellings
    paths = ["$.a", "$.a.b.c", "/a/b/c", "a.b.c", "$.list[0].k", "/list/1/k",
             "$.c[1]", "/c/2", "$.missing", "c[0]"]
    fns = ["json_extract", "json_extract_string"]  # json_value absent in 1.0
    for p in paths:
        d = docs[1] if ("list" in p or p.count(".") > 1 or "/b/" in p) else docs[0]
        f = rng.choice(fns)
        exprs.append(f"{f}('{d}', '{p}')")
    # every fn on a fixed pair for determinism
    for f in fns:
        exprs.append(f"{f}('{docs[0]}', '$.c')")
        exprs.append(f"{f}('{docs[0]}', '$.b')")
    # array length family
    exprs += [
        f"json_array_length('{docs[3]}')",
        f"json_array_length('{docs[0]}', '$.c')",
        f"json_array_length('{docs[0]}', 'c')",
        f"json_array_length('{docs[1]}', '/list')",
        f"json_array_length('{docs[4]}', '$.empty_arr')",
        f"json_array_length('{docs[0]}', '$.a')",
        f"json_array_length('{docs[0]}', '$.missing')",
    ]
    # validity / structure probes
    exprs += [
        "json_valid('{\"a\": 1}')", "json_valid('{bad')",
        "json_valid('[1,2,')", "json_valid('null')", "json_valid('3')",
        f"json_array_length('{docs[3]}'::JSON)",
        f"('{docs[0]}'::JSON ->> 'a')",
        f"('{docs[0]}'::JSON -> 'c' ->> 1)",
    ]
    return [(e, "scalar") for e in exprs]


def fam_structmap(seed):
    exprs = [
        # struct literals + access
        "{'a': 1, 'b': 'x'}", "({'a': 1, 'b': 'x'}).a", "({'a': 1, 'b': 'x'}).b",
        "{'a': 1, 'b': 'x'}['a']",
        "{'n': {'m': 7}}", "({'n': {'m': 7}}).n.m", "{'n': {'m': 7}}['n']['m']",
        "struct_pack(a := 5, b := 'y')", "struct_pack(a := 5).a",
        "{'l': [1,2,3]}", "({'l': [1,2,3]}).l[2]",
        "{'a': NULL}", "({'a': NULL}).a",
        "{'s': 'he''s'}", "({'s': 'he''s'}).s",
        "row(1, 'two', 3.5)",
        "{'a': 1} = {'a': 1}", "{'a': 1} = {'a': 2}",
        "{'a': 1, 'b': 2} < {'a': 1, 'b': 3}",
        "{'a': 1.5, 'b': DATE '2024-01-15'}",
        "CAST({'a': 1, 'b': 'x'} AS VARCHAR)",
        "struct_extract({'a': 10, 'b': 20}, 'b')",
        # maps
        "map(['k1','k2'],[10,20])",
        "map(['k1','k2'],[10,20])['k1']",
        "map(['k1','k2'],[10,20])['nope']",
        "map_keys(map(['k1','k2'],[10,20]))",
        "map_values(map(['k1','k2'],[10,20]))",
        "map_entries(map(['k1','k2'],[10,20]))",
        "cardinality(map(['k1','k2'],[10,20]))",
        "map()", "cardinality(map())",
        "map([1,2],['a','b'])[2]",
        "map_extract(map(['x'],[42]), 'x')",
        "map_from_entries([{'k': 'a', 'v': 1}, {'k': 'b', 'v': 2}])",
        "element_at(map(['k'],[7]), 'k')",
        "map_contains(map(['k'],[7]), 'k')",
        "map_contains(map(['k'],[7]), 'z')",
        # struct<->list interplay
        "[{'a': 1}, {'a': 2}]", "([{'a': 1}, {'a': 2}])[1].a",
        "list_transform([{'a': 1}, {'a': 2}], x -> x.a)",
        # casts
        "CAST({'a': 1} AS STRUCT(a VARCHAR))",
        "CAST(map(['k'],[1]) AS VARCHAR)",
        "CAST(row(1,2) AS VARCHAR)",
        "struct_insert({'a': 1}, b := 9)",
        "{'a': 1, 'b': 'x'}.b || '!'",
        "({'d': DATE '2024-03-01'}).d + 1",
        "{'m': map(['q'],[3])}",
        "({'m': map(['q'],[3])}).m['q']",
    ]
    return [(e, "scalar") for e in exprs]


def fam_regexp(seed):
    exprs = [
        # regexp_extract: group index, missing group, empty match, no match
        "regexp_extract('abc123', '([a-z]+)(\\d+)', 0)",
        "regexp_extract('abc123', '([a-z]+)(\\d+)', 1)",
        "regexp_extract('abc123', '([a-z]+)(\\d+)', 2)",
        "regexp_extract('abc123', '[a-z]+')",
        "regexp_extract('abc', '(\\d+)')",
        "regexp_extract('abc', '(\\d*)')",
        "regexp_extract('', '(a?)')",
        "regexp_extract('hello', 'l(l)?(o)?', 2)",
        "regexp_extract('ab', '(a)|(b)', 2)",
        "regexp_extract('aaa', 'a*')",
        "regexp_extract('xaaa', 'a*')",
        # named groups -> struct
        "regexp_extract('2024-05-06', '(\\d+)-(\\d+)-(\\d+)', ['y','m','d'])",
        # regexp_extract_all
        "regexp_extract_all('a1b2c3', '[a-z]')",
        "regexp_extract_all('a1b2c3', '([a-z])(\\d)', 2)",
        "regexp_extract_all('', 'x')",
        "regexp_extract_all('aaa', 'a*')",
        "regexp_extract_all('abc', '')",
        # regexp_matches + flags
        "regexp_matches('Hello', 'hello')",
        "regexp_matches('Hello', 'hello', 'i')",
        "regexp_matches('a\nb', 'a.b')",
        "regexp_matches('a\nb', 'a.b', 's')",
        "regexp_matches('foo\nbar', '^bar$')",
        "regexp_matches('foo\nbar', '^bar$', 'm')",
        "regexp_matches('abc', '^b')",
        "regexp_matches('abc', 'b')",
        "regexp_matches('', '')",
        "regexp_full_match('abc', 'a.c')",
        "regexp_full_match('abcd', 'a.c')",
        "regexp_full_match('AbC', 'abc', 'i')",
        # regexp_replace: first-match default, g flag, flags combos
        "regexp_replace('aaa', 'a', 'b')",
        "regexp_replace('aaa', 'a', 'b', 'g')",
        "regexp_replace('Hello World', '[aeiou]', '_', 'gi')",
        "regexp_replace('Hello World', 'O', '0', 'i')",
        "regexp_replace('abc', '', 'X')",
        "regexp_replace('abc', '', 'X', 'g')",
        "regexp_replace('a1b2', '(\\d)', '[\\1]', 'g')",
        "regexp_replace('abc', 'b', '\\0\\0')",
        "regexp_replace('a\nb', '^', '>', 'gm')",
        # regexp_split_to_array edges
        "regexp_split_to_array('a,b,,c', ',')",
        "regexp_split_to_array('', ',')",
        "regexp_split_to_array('abc', '')",
        "regexp_split_to_array('a1b22c', '\\d+')",
        "regexp_split_to_array(',a,', ',')",
        "regexp_split_to_array('no-match', ';')",
        "string_split_regex('x1y2z', '\\d')",
        # escapes / classes
        "regexp_matches('a.b', 'a\\.b')",
        "regexp_matches('axb', 'a\\.b')",
        "regexp_extract('price: $4.99', '\\$(\\d+\\.\\d+)', 1)",
        "regexp_matches('tab\there', '\\t')",
        "regexp_extract('word boundary', '\\bbound\\w+')",
        "regexp_matches('ABC', '[[:upper:]]+')",
        "regexp_extract('héllo wörld', '[^ ]+')",
        "regexp_replace('héllo', 'é', 'e')",
        "regexp_matches('123-456', '^\\d{3}-\\d{3}$')",
        "regexp_extract('aAbB', '[A-Z]', 0)",
        "regexp_extract_all('one two  three', '\\S+')",
        "regexp_replace('  trim  me  ', '^\\s+|\\s+$', '', 'g')",
        "regexp_extract('nested (paren (inner))', '\\(([^()]*)\\)', 1)",
        "regexp_matches('backslash\\\\path', '\\\\\\\\')",
        # r14: bare ~ / !~ are FULL-match regex operators when infix,
        # prefix bitwise-NOT otherwise (disambiguated on the operand end)
        "'abc' ~ 'b'", "'abc' ~ 'a.c'", "'abc' ~ '^a.c$'",
        "'abc' !~ 'b'", "'abc' !~ 'z.*'", "upper('ab') ~ 'AB'",
        "'abc' ~ NULL", "~5", "~(-1)", "1 + ~2",
        # precedence (measured): LHS crosses ||, RHS is tight
        "'a' || 'bc' ~ 'abc'", "'abc' ~ 'a' || 'bc'",
        "upper('a') || 'BC' ~ 'ABC'",
    ]
    return [(e, "scalar") for e in exprs]


def fam_tz(seed):
    exprs = [
        # TIMESTAMPTZ literals (session pinned UTC both sides)
        "TIMESTAMPTZ '2024-03-10 12:00:00+00'",
        "TIMESTAMPTZ '2024-03-10 12:00:00-05'",
        "TIMESTAMPTZ '2024-03-10 12:00:00+05:30'",
        "CAST(TIMESTAMPTZ '2024-07-01 00:00:00+02' AS TIMESTAMP)",
        "CAST(TIMESTAMP '2024-07-01 08:00:00' AS TIMESTAMPTZ)",
        # AT TIME ZONE both directions
        "TIMESTAMP '2024-03-10 12:00:00' AT TIME ZONE 'America/New_York'",
        "TIMESTAMP '2024-07-10 12:00:00' AT TIME ZONE 'America/New_York'",
        "TIMESTAMPTZ '2024-03-10 12:00:00+00' AT TIME ZONE 'America/New_York'",
        "TIMESTAMPTZ '2024-07-10 12:00:00+00' AT TIME ZONE 'Asia/Tokyo'",
        "TIMESTAMP '2024-01-15 00:00:00' AT TIME ZONE 'UTC'",
        "timezone('Europe/Paris', TIMESTAMP '2024-11-03 01:30:00')",
        "timezone('Europe/Paris', TIMESTAMPTZ '2024-11-03 01:30:00+00')",
        # DST boundaries
        "TIMESTAMP '2024-03-10 02:30:00' AT TIME ZONE 'America/New_York'",
        "TIMESTAMP '2024-11-03 01:30:00' AT TIME ZONE 'America/New_York'",
        # tz arithmetic / parts
        "TIMESTAMPTZ '2024-03-10 12:00:00+00' + INTERVAL 1 DAY",
        "TIMESTAMPTZ '2024-06-01 10:00:00+00' - TIMESTAMPTZ '2024-05-31 08:00:00+00'",
        "date_part('hour', TIMESTAMPTZ '2024-03-10 12:00:00-05')",
        "date_part('epoch', TIMESTAMPTZ '2024-03-10 17:00:00+00')",
        "date_trunc('day', TIMESTAMPTZ '2024-03-10 17:30:00+00')",
        "CAST(TIMESTAMPTZ '2024-03-10 17:00:00+03' AS DATE)",
        "CAST(TIMESTAMPTZ '2024-03-10 17:00:00+03' AS TIME)",
        # TIME type
        "TIME '13:45:30'", "TIME '13:45:30.123456'",
        "TIME '13:45:30' + INTERVAL 90 MINUTE",
        "TIME '23:30:00' + INTERVAL 1 HOUR",
        "TIME '00:30:00' - INTERVAL 1 HOUR",
        "date_part('minute', TIME '13:45:30')",
        "CAST('14:00:00' AS TIME)",
        "CAST(TIMESTAMP '2024-03-10 17:25:13' AS TIME)",
        "TIME '13:45:30' < TIME '14:00:00'",
        "make_time(7, 30, 12.5)",
        "EXTRACT(hour FROM TIME '22:10:09')",
    ]
    return [(e, "scalar") for e in exprs]


def fam_cast(seed):
    exprs = [
        # DOUBLE/FLOAT -> VARCHAR render (shortest repr, python-style
        # exponent thresholds, 'inf'/'nan', -0.0 normalized)
        "CAST(CAST(1.5 AS DOUBLE) AS VARCHAR)",
        "CAST(CAST(1e15 AS DOUBLE) AS VARCHAR)",
        "CAST(CAST(1e16 AS DOUBLE) AS VARCHAR)",
        "CAST(CAST(1e20 AS DOUBLE) AS VARCHAR)",
        "CAST(CAST(1.5e20 AS DOUBLE) AS VARCHAR)",
        "CAST(CAST(-2.75e-7 AS DOUBLE) AS VARCHAR)",
        "CAST(CAST(1e-4 AS DOUBLE) AS VARCHAR)",
        "CAST(CAST(1e-5 AS DOUBLE) AS VARCHAR)",
        "CAST(CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS VARCHAR)",
        "CAST(1.0/3 AS VARCHAR)",
        "CAST(CAST('inf' AS DOUBLE) AS VARCHAR)",
        "CAST(CAST('-inf' AS DOUBLE) AS VARCHAR)",
        "CAST(CAST('nan' AS DOUBLE) AS VARCHAR)",
        "CAST(CAST(-0.0 AS DOUBLE) AS VARCHAR)",
        "CAST(CAST(42 AS DOUBLE) AS VARCHAR)",
        "CAST(CAST(-7.25 AS DOUBLE) AS VARCHAR)",
        "CAST(CAST(123456789.123456 AS DOUBLE) AS VARCHAR)",
        "CAST(CAST(1.5 AS FLOAT) AS VARCHAR)",
        "CAST(CAST(0.1 AS FLOAT) AS VARCHAR)",
        "CAST(CAST(3.14159 AS FLOAT) AS VARCHAR)",
        "CAST(CAST(1e10 AS FLOAT) AS VARCHAR)",
        "CAST(CAST(2 AS FLOAT) AS VARCHAR)",
        "concat('v=', CAST(2.5 AS DOUBLE))",
        "concat('v=', 1e18)",
        # string -> integral: DuckDB parses decimals and ROUNDS half away
        "CAST('3.7' AS INTEGER)", "CAST('3.4' AS INTEGER)",
        "CAST('-3.5' AS INTEGER)", "CAST('2.5' AS INTEGER)",
        "CAST(' 42 ' AS INTEGER)", "CAST('+7' AS INTEGER)",
        "CAST('1e3' AS INTEGER)",
        "TRY_CAST('abc' AS INTEGER)", "TRY_CAST('999999999999' AS INTEGER)",
        "TRY_CAST('3.99' AS BIGINT)",
        # numeric -> integral rounding (half away from zero)
        "CAST(CAST(3.5 AS DOUBLE) AS INTEGER)",
        "CAST(CAST(2.5 AS DOUBLE) AS INTEGER)",
        "CAST(CAST(-2.5 AS DOUBLE) AS INTEGER)",
        "CAST(CAST(-3.7 AS DOUBLE) AS BIGINT)",
        "CAST(CAST(2.5 AS FLOAT) AS INTEGER)",
        "CAST(CAST(3.99 AS DECIMAL(10,2)) AS INTEGER)",
        "CAST(CAST(-0.5 AS DECIMAL(10,2)) AS INTEGER)",
        "CAST(CAST(0.49 AS DOUBLE) AS INTEGER)",
        # integral width + overflow behavior (loud)
        "CAST(127 AS TINYINT)", "TRY_CAST(200 AS TINYINT)",
        "CAST(32767 AS SMALLINT)", "TRY_CAST(40000 AS SMALLINT)",
        "CAST(CAST(9.5e18 AS DOUBLE) AS VARCHAR)",
        "TRY_CAST(CAST(1e19 AS DOUBLE) AS BIGINT)",
        # boolean casts
        "CAST('true' AS BOOLEAN)", "CAST('t' AS BOOLEAN)",
        "CAST('1' AS BOOLEAN)", "CAST('FALSE' AS BOOLEAN)",
        "CAST('f' AS BOOLEAN)", "TRY_CAST('yes' AS BOOLEAN)",
        "CAST(0 AS BOOLEAN)", "CAST(2 AS BOOLEAN)",
        "CAST(true AS INTEGER)", "CAST(false AS VARCHAR)",
        "CAST(true AS VARCHAR)",
        # DECIMAL render and scale behavior
        "CAST(CAST('123.456' AS DECIMAL(10,2)) AS VARCHAR)",
        "CAST(CAST('123.454' AS DECIMAL(10,2)) AS VARCHAR)",
        "CAST(CAST(5 AS DECIMAL(10,3)) AS VARCHAR)",
        "CAST(CAST(-1.005 AS DECIMAL(12,4)) AS VARCHAR)",
        "CAST(CAST(2.5 AS DECIMAL(3,1)) AS DECIMAL(3,0))",
        # integer division / modulo renders
        "CAST(1/3 AS VARCHAR)", "CAST(7%3 AS VARCHAR)",
        "CAST(-7%3 AS VARCHAR)",
        # date/timestamp string casts (round-trip spellings)
        "CAST('2024-3-5' AS DATE)",
        "CAST('2024-03-05 7:08:09' AS TIMESTAMP)",
        "TRY_CAST('not a date' AS DATE)",
        "CAST(DATE '2024-03-05' AS VARCHAR)",
        "CAST(TIMESTAMP '2024-03-05 07:08:09.5' AS VARCHAR)",
        "CAST(CAST('2024-03-05' AS DATE) AS TIMESTAMP)",
        # BIGINT/HUGEINT boundaries
        "CAST(9223372036854775807 AS VARCHAR)",
        "CAST(-9223372036854775808 AS VARCHAR)",
        "CAST(170141183460469231731687303715884105727 AS VARCHAR)",
    ]
    return [(e, "scalar") for e in exprs]


def fam_hashbit(seed):
    exprs = [
        # hashes (hex renders)
        "md5('abc')", "md5('')", "md5('héllo')",
        "sha256('abc')", "sha256('')",
        # base64 / hex codecs (blob results cast to VARCHAR by harness)
        "base64('abc'::BLOB)", "base64(''::BLOB)",
        "CAST(from_base64('YWJj') AS VARCHAR)",
        "to_hex(255)", "to_hex(0)", "to_hex(-1)", "to_hex('ab'::BLOB)",
        "hex(4095)", "CAST(unhex('4142') AS VARCHAR)",
        "CAST(from_hex('6162') AS VARCHAR)",
        "CAST(encode('héllo') AS VARCHAR)",
        "decode('abc'::BLOB)",
        "octet_length('héllo'::BLOB)", "bit_length('abc')",
        # bit ops (operators + functions)
        "bit_count(7)", "bit_count(CAST(255 AS BIGINT))", "bit_count(0)",
        "xor(5, 3)", "xor(-1, 255)",
        "5 & 3", "5 | 3", "~5", "1 << 4", "256 >> 2", "-8 >> 1",
        "CAST(1 AS BIGINT) << 40",
        # codepoints
        "ascii('A')", "ascii('é')", "ascii('')",
        "chr(9731)", "chr(65)", "unicode('héllo')", "ord('h')",
        "ascii('☃x')",
    ]
    return [(e, "scalar") for e in exprs]


def fam_compare(seed):
    exprs = [
        # IEEE special-value comparison semantics (SQL total order)
        "'nan'::DOUBLE = 'nan'::DOUBLE", "'nan'::DOUBLE > 1e308",
        "'nan'::DOUBLE <= 'inf'::DOUBLE", "'inf'::DOUBLE > 1e308",
        "-0.0::DOUBLE = 0.0::DOUBLE", "-0.0::DOUBLE < 0.0::DOUBLE",
        # mixed-type comparison coercions
        "1 = '1'", "1 < '2'", "'10' < '9'", "10 < '9'",
        "1 = 1.0", "true = 1", "false = 0",
        "1 IN ('1', '2')", "'1' IN (1, 2)", "2 BETWEEN '1' AND '3'",
        "'2024-01-02' = DATE '2024-01-02'",
        "DATE '2024-01-02' < '2024-01-03'",
        "TIMESTAMP '2024-01-02 03:04:05' > '2024-01-02'",
        # greatest/least: NULL-skipping + coercion
        "greatest(1, 2.5)", "greatest('2', 10)", "least('abc', 'b')",
        "greatest(1, NULL, 3)", "least(NULL, NULL)",
        "greatest(DATE '2024-01-02', DATE '2023-05-06')",
        # three-valued logic
        "NULL = NULL", "(NULL = NULL) IS NULL",
        "NULL IS DISTINCT FROM 1", "NULL IS NOT DISTINCT FROM NULL",
        "1 IS DISTINCT FROM 2", "'nan'::DOUBLE IS DISTINCT FROM 'nan'::DOUBLE",
        "NULL AND false", "NULL AND true", "NULL OR true", "NULL OR false",
        "NOT NULL",
        "nullif(3, 3)", "nullif(3, 4)", "coalesce(NULL, NULL, 7)",
        "ifnull(NULL, 5)",
        # interval comparison (micros-normalized in DuckDB)
        "INTERVAL 1 DAY = INTERVAL 24 HOUR",
        "INTERVAL 1 MONTH = INTERVAL 30 DAY",
        "INTERVAL 1 MONTH > INTERVAL 29 DAY",
        # list/struct comparisons
        "[1, 2] = [1, 2]", "[1, 2] < [1, 3]", "[1] < [1, 0]",
        "[2] > [1, 9]", "[NULL] = [NULL]",
        "{'a': 1} IS DISTINCT FROM {'a': 2}",
        # CASE result typing across branches
        "CASE WHEN true THEN 1 ELSE 2.5 END",
        "CASE WHEN false THEN 1 ELSE '7' END",
    ]
    return [(e, "scalar") for e in exprs]


def fam_coercion(seed):
    """set-op / implicit-coercion barrage (r14 VERDICT task 1):
    UNION/INTERSECT/EXCEPT branch type resolution, VALUES-list column
    typing, mixed IN-lists, CASE/COALESCE/GREATEST result typing, and
    mixed-operand || — the type a branch RESOLVES to is observed through
    the VARCHAR render (INT '1' vs DOUBLE '1.0' vs VARCHAR '1')."""
    def setop(op, pairs):
        # two branches with an id column; render the coerced column
        (a, b) = pairs
        return ("SELECT CAST(x AS VARCHAR) AS v FROM "
                f"(SELECT 1 AS id, {a} AS x UNION ALL SELECT 2, {b}) t "
                "ORDER BY id") if op == "UNION ALL" else (
                "SELECT CAST(x AS VARCHAR) AS v FROM "
                f"(SELECT {a} AS x {op} SELECT {b}) t ORDER BY v NULLS FIRST")
    queries = [
        # UNION ALL branch resolution (id-ordered, both rows rendered)
        setop("UNION ALL", ("1", "'a'")),
        setop("UNION ALL", ("1", "2.5")),
        setop("UNION ALL", ("1", "CAST(2.5 AS DOUBLE)")),
        setop("UNION ALL", ("CAST(1.25 AS DECIMAL(4,2))", "2")),
        setop("UNION ALL", ("CAST(1.25 AS DECIMAL(4,2))", "CAST(0.5 AS DOUBLE)")),
        setop("UNION ALL", ("DATE '2024-01-02'", "'2024-06-07'")),
        setop("UNION ALL", ("DATE '2024-01-02'", "TIMESTAMP '2024-06-07 08:09:10'")),
        setop("UNION ALL", ("true", "2")),
        setop("UNION ALL", ("NULL", "3")),
        setop("UNION ALL", ("3", "NULL")),
        setop("UNION ALL", ("CAST(1 AS TINYINT)", "300")),
        setop("UNION ALL", ("CAST(1 AS BIGINT)", "2.5")),
        setop("UNION ALL", ("'x'", "NULL")),
        setop("UNION ALL", ("[1, 2]", "[2.5]")),
        # UNION (distinct) dedups AFTER coercion
        setop("UNION", ("1", "1.0")),
        setop("UNION", ("1", "'1'")),
        setop("UNION", ("'a'", "'a'")),
        setop("UNION", ("NULL", "NULL")),
        setop("UNION", ("1", "2.5")),
        # INTERSECT / EXCEPT coerce before matching
        setop("INTERSECT", ("1", "1.0")),
        setop("INTERSECT", ("1", "'1'")),
        setop("INTERSECT", ("1", "2")),
        setop("EXCEPT", ("1", "1.0")),
        setop("EXCEPT", ("1", "'1'")),
        setop("EXCEPT", ("1.5", "2")),
        # silent-divergence pins: VARCHAR set-op semantics change the
        # ROWS, not just the render (1 INTERSECT '1.0' is EMPTY as
        # VARCHAR, one row under Spark's numeric coercion); a string
        # branch keeps its RAW text (no date canonicalization)
        setop("INTERSECT", ("1", "'1.0'")),
        setop("EXCEPT", ("1", "'1.00'")),
        setop("UNION ALL", ("1", "'2.5'")),
        setop("UNION ALL", ("2.5", "true")),
        setop("UNION ALL", ("true", "CAST(5 AS BIGINT)")),
        setop("UNION ALL", ("INTERVAL 1 DAY", "'1 day'")),
        setop("UNION ALL", ("DATE '2024-01-02'", "'2024-6-7'")),
        ("SELECT CAST(x AS VARCHAR) AS v FROM (SELECT 1 AS id, 1 AS x "
         "UNION ALL SELECT 2, 'a' UNION ALL SELECT 3, true) t ORDER BY id"),
        ("WITH s AS (SELECT 1 AS x UNION ALL SELECT 'a') "
         "SELECT CAST(x AS VARCHAR) AS v FROM s ORDER BY v"),
        # VALUES-list column typing across rows
        "SELECT CAST(x AS VARCHAR) AS v FROM (VALUES (1),(2.5),('3')) t(x) ORDER BY v",
        "SELECT CAST(x AS VARCHAR) AS v FROM (VALUES (1),(2.5)) t(x) ORDER BY v",
        "SELECT CAST(x AS VARCHAR) AS v FROM (VALUES (1),(NULL)) t(x) ORDER BY v NULLS FIRST",
        "SELECT CAST(x AS VARCHAR) AS v FROM (VALUES (1),('a')) t(x) ORDER BY v",
        "SELECT CAST(x AS VARCHAR) AS v FROM (VALUES (DATE '2024-01-02'),('2024-06-07')) t(x) ORDER BY v",
        "SELECT CAST(x AS VARCHAR) AS v FROM (VALUES (1),(CAST(2 AS BIGINT))) t(x) ORDER BY v",
        "SELECT CAST(x AS VARCHAR) AS v FROM (VALUES (true),(NULL)) t(x) ORDER BY v NULLS FIRST",
        "SELECT CAST(x AS VARCHAR) AS v FROM (VALUES (-1),(2.5),('3')) t(x) ORDER BY v",
    ]
    exprs = [
        # mixed-type IN-lists
        "1 IN (1.0, 2.5)", "1 IN ('1', '2')", "1.5 IN (1, 2)",
        "1 IN (1, '2.5')", "'1.0' IN (1, 2)", "2 IN (1, 2.0, '3')",
        "DATE '2024-01-02' IN ('2024-01-02', '2024-06-07')",
        "true IN (1, 0)", "NULL IN (1, 2)", "1 IN (2, NULL)",
        "1 IN (1, NULL)",
        # greatest's unknown-string rule is BIGINT with string rounding
        "greatest(1, '2.5')", "greatest(-5, '2')",
        # CASE branch typing (observed through the render)
        "CASE WHEN true THEN 1 ELSE 'x' END",
        "CASE WHEN false THEN 'x' ELSE 2 END",
        "CASE WHEN false THEN DATE '2024-01-02' ELSE '2024-6-7' END",
        "CASE WHEN false THEN 1 ELSE 'x' END",
        "CASE WHEN true THEN 1 ELSE 2.5 END",
        "CASE WHEN true THEN 1 WHEN false THEN 2.5 ELSE NULL END",
        "CASE WHEN false THEN DATE '2024-01-02' ELSE '2024-06-07' END",
        "CASE WHEN true THEN NULL ELSE 7 END",
        "CASE WHEN false THEN CAST(1 AS TINYINT) ELSE 300 END",
        "CASE WHEN true THEN true ELSE 2 END",
        "CASE WHEN false THEN true ELSE 2 END",
        # COALESCE / IFNULL / NULLIF typing
        "coalesce(NULL, 1, 'x')", "coalesce(NULL, 1, 2.5)",
        "coalesce(NULL, CAST(1 AS TINYINT), CAST(300 AS INTEGER))",
        "coalesce('a', 1)", "ifnull(NULL, 2.5)", "ifnull(1, 2.5)",
        "nullif(1, '1')", "nullif(2.5, 2)",
        # GREATEST / LEAST typing
        "greatest(1, 2.5)", "greatest(1, '2')", "least('10', 9)",
        "greatest(DATE '2024-01-02', '2024-01-01')",
        "least(1, 2.5, NULL)", "greatest(true, false)",
        # mixed-operand concatenation
        "1 || 'a'", "1 || 2", "DATE '2024-01-02' || '!'",
        "2.5 || 'x'", "NULL || 'x'", "[1] || [2.5]",
    ]
    return ([(q, "query") for q in queries] +
            [(e, "scalar") for e in exprs])


def fam_decimal(seed):
    """DECIMAL + - * % propagation (r14 VERDICT task 2): result
    precision/scale observed through the ::VARCHAR render (the scale IS
    the fraction-digit count), across plain/mixed operands and the
    38-precision cap where DuckDB keeps the formula scale and Spark's
    default mode would reduce it (the engine pins allowPrecisionLoss
    off to match)."""
    rng = random.Random(seed)
    def D(v, p, s):
        return f"CAST({v} AS DECIMAL({p},{s}))"
    exprs = [
        # plain propagation
        f"{D('99.9',3,1)} + {D('99.9',3,1)}",
        f"{D('1.5',3,1)} - {D('2.75',4,2)}",
        f"{D('99.9',3,1)} * {D('99.9',3,1)}",
        f"{D('12.34',5,2)} * {D('1.234',5,3)}",
        f"{D('10.25',4,2)} % {D('3.0',3,1)}",
        f"-{D('1.5',3,1)}",
        f"{D('0.1',2,1)} + {D('0.2',2,1)}",
        f"{D('5',1,0)} - {D('7',1,0)}",
        f"{D('1.000001',7,6)} * {D('1.000001',7,6)}",
        # mixed integer / decimal-literal operands
        f"{D('1.5',3,1)} + 1",
        f"{D('1.5',3,1)} * 2",
        f"{D('1.5',3,1)} + 0.25",
        f"{D('1.5',3,1)} - CAST(3 AS BIGINT)",
        f"{D('2.5',3,1)} * CAST(4 AS TINYINT)",
        "1.5 + 2.25", "1.5 * 2.25", "1.5 - 2.25", "7.5 % 2.25",
        # the 38-cap regime: DuckDB keeps the formula scale
        f"{D('1.1',38,10)} + {D('2.2',38,10)}",
        f"{D('1.1',38,10)} - {D('2.2',38,10)}",
        f"{D('1.1',38,10)} * {D('2',10,5)}",
        f"{D('1.5',38,20)} + {D('2.5',20,10)}",
        f"{D('123456.789012',18,6)} * {D('2.5',18,6)}",
        f"{D('1.00000000000000000001',21,20)} * {D('1',2,1)}",
        # chained expressions keep propagating
        f"({D('1.5',3,1)} + {D('2.5',3,1)}) * {D('0.5',2,1)}",
        f"{D('100',5,2)} - {D('0.001',4,3)} - {D('0.001',4,3)}",
        # renders that depend on scale zero-padding
        f"{D('2',10,5)} + {D('3',10,5)}",
        f"{D('2',10,5)} * {D('3',10,5)}",
        # sum/avg aggregates widen like DuckDB? (typed literals, 1 row)
        f"(SELECT sum(x) FROM (VALUES ({D('1.25',4,2)})) t(x))",
        f"(SELECT avg(x) FROM (VALUES ({D('1.25',4,2)}), ({D('2.25',4,2)})) t(x))",
    ]
    return [(e, "scalar") for e in exprs]


def fam_interval(seed):
    """interval arithmetic (r14 VERDICT task 5): DuckDB's interval is a
    (months, days, micros) TRIPLE and * / int act PER FIELD with
    integer division ('1 day' / 2 is '00:00:00', not 12 hours);
    non-integer multipliers are binder errors; + - keep the fields
    unnormalized ('1 month -40 days'); comparison micros-normalizes.
    Renders through ::VARCHAR, string-exact."""
    exprs = [
        # multiply: per-field
        "INTERVAL '1 day' * 2", "2 * INTERVAL '3 hours'",
        "INTERVAL '1 day 2 hours' * 3", "INTERVAL '2 months' * 4",
        "INTERVAL '1 month 1 day 1 hour' * 2", "INTERVAL '90 minutes' * 2",
        "INTERVAL '1 day' * 0", "INTERVAL '3 hours' * -2",
        # divide: per-field INTEGER division
        "INTERVAL '1 day' / 2", "INTERVAL '3 hours' / 2",
        "INTERVAL '1 month' / 2", "INTERVAL '5 days' / 2",
        "INTERVAL '1 day 2 hours' / 2", "INTERVAL '7 months' / 3",
        "INTERVAL '1 minute' / 7",
        # add/sub keep fields unnormalized
        "INTERVAL '1 hour' + INTERVAL '30 minutes'",
        "INTERVAL '1 day' - INTERVAL '26 hours'",
        "INTERVAL '5 days' + INTERVAL '3 days'",
        "INTERVAL '1 year' + INTERVAL '3 months'",
        "INTERVAL '2 hours' - INTERVAL '150 minutes'",
        # negative / mixed renders
        "-INTERVAL '1 day 2 hours'", "-INTERVAL '3 months'",
        "-INTERVAL '90 minutes'",
        # comparisons (same flavor; cross-flavor stays a pinned refusal)
        "INTERVAL '1 day' > INTERVAL '23 hours'",
        "INTERVAL '1 day' < INTERVAL '25 hours'",
        "INTERVAL '2 hours' = INTERVAL '120 minutes'",
        "INTERVAL '3 months' > INTERVAL '2 months'",
        "INTERVAL '1 day' <= INTERVAL '24 hours'",
        # cross-flavor comparison micros-normalizes: 1 month = 30 days
        "INTERVAL '1 month' = INTERVAL '30 days'",
        "INTERVAL '1 year' = INTERVAL '360 days'",
        "INTERVAL '1 month' > INTERVAL '29 days'",
        "INTERVAL '1 month 1 day' > INTERVAL '30 days'",
        "INTERVAL '1 month' = INTERVAL '30 days 1 microsecond'",
        # DATE literal +- interval is a TIMESTAMP (midnight base)
        "DATE '2024-01-15' + INTERVAL '1 day'",
        "DATE '2024-01-15' + INTERVAL '1 month'",
        "DATE '2024-01-15' + INTERVAL '2 hours'",
        "DATE '2024-01-15' + INTERVAL '1 month 1 day'",
        "DATE '2024-03-01' - INTERVAL '1 day'",
    ]
    return [(e, "scalar") for e in exprs]


def fam_keyequiv(seed):
    """GROUP BY / DISTINCT key equivalence (r14 VERDICT task 6):
    grouping equality is NOT the three-valued comparison — NULL
    elements compare equal inside container keys, NaN groups with NaN,
    -0.0 groups with 0.0 (also inside lists), NULL is its own group,
    [] and [NULL] stay distinct. Full queries, deterministic ORDER BY."""
    def q(expr):
        return expr
    queries = [
        "SELECT CAST(x AS VARCHAR) AS k FROM (SELECT DISTINCT x FROM (VALUES (CAST(-0.0 AS DOUBLE)),(CAST(0.0 AS DOUBLE))) t(x)) s ORDER BY k",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT DISTINCT x FROM (VALUES (CAST('nan' AS DOUBLE)),(CAST('nan' AS DOUBLE))) t(x)) s",
        "SELECT CAST(n AS VARCHAR) AS v FROM (SELECT x, count(*) AS n FROM (VALUES (CAST('nan' AS DOUBLE)),(CAST('nan' AS DOUBLE)),(CAST(1.0 AS DOUBLE))) t(x) GROUP BY x) s ORDER BY v",
        "SELECT CAST(n AS VARCHAR) AS v FROM (SELECT x, count(*) AS n FROM (VALUES (NULL),(NULL),(1)) t(x) GROUP BY x) s ORDER BY v",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT DISTINCT x FROM (VALUES ([1, NULL]),([1, NULL])) t(x)) s",
        "SELECT CAST(x AS VARCHAR) AS k FROM (SELECT x, count(*) AS n FROM (VALUES ([1, NULL]),([1, NULL]),([1, 2]),([NULL])) t(x) GROUP BY x) s ORDER BY k",
        "SELECT CAST(n AS VARCHAR) AS v FROM (SELECT x, count(*) AS n FROM (VALUES ([1, NULL]),([1, NULL]),([1, 2]),([NULL])) t(x) GROUP BY x) s ORDER BY v",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT DISTINCT x FROM (VALUES ({'a': NULL}),({'a': NULL})) t(x)) s",
        "SELECT CAST(n AS VARCHAR) AS v FROM (SELECT x, count(*) AS n FROM (VALUES ({'a': 1}),({'a': 1}),({'a': NULL})) t(x) GROUP BY x) s ORDER BY v",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT DISTINCT x FROM (VALUES ([CAST(-0.0 AS DOUBLE)]),([CAST(0.0 AS DOUBLE)])) t(x)) s",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT DISTINCT x FROM (VALUES ([CAST('nan' AS DOUBLE)]),([CAST('nan' AS DOUBLE)])) t(x)) s",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT DISTINCT x FROM (VALUES ([]),([NULL])) t(x)) s",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT DISTINCT x FROM (VALUES ({'a': [NULL, 1]}),({'a': [NULL, 1]})) t(x)) s",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT x FROM (VALUES (CAST('nan' AS DOUBLE)),(CAST('nan' AS DOUBLE)),(CAST(-0.0 AS DOUBLE)),(CAST(0.0 AS DOUBLE))) t(x) GROUP BY x) s",
    ]
    return [(x, "query") for x in map(q, queries)]


def fam_fnwave(seed):
    """r14 function-battery gaps: fuzzy-text similarity, format_bytes,
    iso/julian/epoch date parts, grade-up, list set-ops, the parse_path
    family — each closed with a native or a pure-SQL twin."""
    exprs = [
        "jaro_similarity('duck','luck')",
        "jaro_winkler_similarity('duck','luck')",
        "jaro_winkler_similarity('martha','marhta')",
        "jaro_winkler_similarity('abc','abc')",
        "jaro_winkler_similarity('', 'abc')",
        "editdist3('abc','axc')", "mismatches('abc','abd')",
        "format_bytes(1023)", "format_bytes(1024)", "format_bytes(1536)",
        "format_bytes(0)", "format_bytes(123456789)",
        "format_bytes(10000000000000)",
        "isodow(DATE '2024-03-05')", "isodow(DATE '2024-03-03')",
        "decade(DATE '2024-03-05')", "century(DATE '2024-03-05')",
        "century(DATE '2000-12-31')", "decade(DATE '1999-01-01')",
        "julian(DATE '2000-01-01')", "julian(DATE '2024-03-05')",
        "julian(TIMESTAMP '2024-03-05 18:00:00')",
        "epoch_ms(TIMESTAMP '2024-01-01 00:00:00.5')",
        "epoch_us(TIMESTAMP '2024-01-01 00:00:00.5')",
        "epoch_ns(TIMESTAMP '2024-01-01 00:00:00')",
        "list_grade_up([3, 1, 2, 1])",
        "list_has_all([1,2,3],[2,3])", "list_has_all([1,2],[2,9])",
        "list_sort(list_intersect([1,2,3],[2,3,4]))",
        "parse_path('/a/b/c.txt')", "parse_path('a/b.txt')",
        "parse_dirname('/a/b/c.txt')", "parse_dirname('a/b/c.txt')",
        "parse_dirname('c.txt')",
        "parse_dirpath('/a/b/c.txt')",
        "parse_filename('/a/b/c.txt')", "parse_filename('/a/b/c.txt', true)",
        "str_split_regex('a1b2c','[0-9]')",
    ]
    return [(e, "scalar") for e in exprs]


def fam_csvio(seed):
    """r15: CSV COPY TO -> read_csv round-trips of quoting/escape edge
    values. Each fixture is a two-statement script (unique /tmp path per
    fixture); the round-trip must recover the original logical values in
    EACH engine independently. NULL renders as None."""
    import os, shutil
    shutil.rmtree("/tmp/graft_csvio", ignore_errors=True)
    os.makedirs("/tmp/graft_csvio", exist_ok=True)
    # (value-SQL, copy-option blob, read_csv extra args)
    vals = [
        ("'abc'", "", ", all_varchar=true"),
        ("'a,b'", "", ", all_varchar=true"),
        ("'say \"hi\"'".replace("\\", "\\"), "", ", all_varchar=true"),
        ("'it''s'", "", ", all_varchar=true"),
        ("'l1' || chr(10) || 'l2'", "", ", all_varchar=true"),
        ("'l1' || chr(13) || chr(10) || 'l2'", "", ", all_varchar=true"),
        ("'back\\slash'", "", ", all_varchar=true"),
        ("'  padded  '", "", ", all_varchar=true"),
        ("'héß👍'", "", ", all_varchar=true"),
        ("'\"quoted\"'", "", ", all_varchar=true"),
        ("''", "", ", all_varchar=true"),
        ("CAST(NULL AS VARCHAR)", "", ", all_varchar=true"),
        ("'tab\there'", "", ", all_varchar=true"),
        ("'a|b'", "DELIMITER '|'", ", delim='|', all_varchar=true"),
        ("'a;b'", "DELIMITER ';'", ", delim=';', all_varchar=true"),
        ("'x,y'", "DELIMITER ',', QUOTE ''''", ", quote='''', all_varchar=true"),
        ("'don''t,stop'", "QUOTE ''''", ", quote='''', all_varchar=true"),
        ("'esc\"me,too'", "ESCAPE '\\'", ", escape='\\', all_varchar=true"),
        ("'a\"b'", "QUOTE '\"', ESCAPE '\"'", ", quote='\"', escape='\"', all_varchar=true"),
        ("'nullish'", "NULLSTR 'nullish'", ", nullstr='nullish', all_varchar=true"),
        ("'NA'", "NULLSTR 'NA'", ", nullstr='NA', all_varchar=true"),
        ("CAST(NULL AS VARCHAR)", "NULLSTR 'NA'", ", nullstr='NA', all_varchar=true"),
        
        ("'hdr'", "HEADER true", ", header=true, all_varchar=true"),
    ]
    scripts = []
    for i, (v, wopt, ropt) in enumerate(vals):
        path = f"/tmp/graft_csvio/f{i:02d}.csv"
        blob = "FORMAT CSV" + (", " + wopt if wopt else "")
        scripts.append(
            f"COPY (SELECT 1 AS id, {v} AS c UNION ALL SELECT 2, 'z2') "
            f"TO '{path}' ({blob}); "
            f"SELECT CAST(id AS VARCHAR) || '=' || "
            f"coalesce(CAST(c AS VARCHAR), 'None') "
            f"FROM read_csv('{path}'{ropt}) ORDER BY 1")
    # typed round-trips: inference recovers int/double/date renders
    for j, expr in enumerate([
            "SELECT 1 AS id, 42 AS c UNION ALL SELECT 2, -7",
            "SELECT 1 AS id, 1.5 AS c UNION ALL SELECT 2, -0.25",
            "SELECT 1 AS id, DATE '2024-02-29' AS c UNION ALL SELECT 2, DATE '1999-12-31'",
            "SELECT 1 AS id, TIMESTAMP '2024-02-29 01:02:03' AS c UNION ALL SELECT 2, TIMESTAMP '1999-12-31 23:59:59'",
            "SELECT 1 AS id, true AS c UNION ALL SELECT 2, false",
    ]):
        path = f"/tmp/graft_csvio/t{j:02d}.csv"
        scripts.append(
            f"COPY ({expr}) TO '{path}' (FORMAT CSV); "
            f"SELECT CAST(id AS VARCHAR) || '=' || "
            f"coalesce(CAST(c AS VARCHAR), 'None') "
            f"FROM read_csv('{path}') ORDER BY 1")
    # header=false on the write + headerless read: positional names
    path = "/tmp/graft_csvio/h0.csv"
    scripts.append(
        f"COPY (SELECT 'only' AS id, 'v' AS c) TO '{path}' (FORMAT CSV, HEADER false); "
        f"SELECT CAST(column0 AS VARCHAR) || '=' || CAST(column1 AS VARCHAR) "
        f"FROM read_csv('{path}', header=false, all_varchar=true)")
    return [(sq, "query") for sq in scripts]


def _rawfile(path, text):
    """emit a COPY statement that writes `text` verbatim (QUOTE ''
    disables quoting on both engines; chr(10) joins keep one
    deterministic row)"""
    lines = text.split("\n")
    sql = " || chr(10) || ".join("'" + l.replace("'", "''") + "'"
                                 for l in lines)
    return (f"COPY (SELECT {sql} AS j) TO '{path}' "
            "(FORMAT CSV, QUOTE '', HEADER false)")


def fam_csvopt(seed):
    """r17: read_csv READER-option depth (r16 VERDICT task 6a) — nullstr
    LISTS, force_not_null's match-to-'' substitution, columns={...}
    declared schemas, names=/types= overrides, skip=, ignore_errors via
    conversion failure, all_varchar interplay, and that null substitution
    happens BEFORE type sniffing. Each fixture writes its file first
    (raw-line COPY), so scripts are self-contained in both engines."""
    import os, shutil
    shutil.rmtree("/tmp/graft_csvopt_fx", ignore_errors=True)
    os.makedirs("/tmp/graft_csvopt_fx", exist_ok=True)
    d = "/tmp/graft_csvopt_fx"
    scripts = []

    def fx(fname, content, select):
        scripts.append(_rawfile(f"{d}/{fname}", content) + "; " + select)

    base = "id,c,d\n1,NA,7\n2,none,NA\n3,x,9"
    # nullstr list: both markers null out, in EVERY column
    fx("n0.csv", base,
       f"SELECT CAST(id AS VARCHAR) || '=' || coalesce(c, 'None') || '/' || "
       f"coalesce(CAST(d AS VARCHAR), 'None') "
       f"FROM read_csv('{d}/n0.csv', nullstr=['NA','none']) ORDER BY 1")
    # ...and sniffing happens AFTER null-clean: d is numeric (d+1 works)
    fx("n1.csv", base,
       f"SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(d + 1 AS VARCHAR), 'None') "
       f"FROM read_csv('{d}/n1.csv', nullstr=['NA','none']) ORDER BY 1")
    # single nullstr leaves the other marker as text
    fx("n2.csv", base,
       f"SELECT CAST(id AS VARCHAR) || '=' || coalesce(c, 'None') "
       f"FROM read_csv('{d}/n2.csv', nullstr='NA') ORDER BY 1")
    # force_not_null: matches become EMPTY STRINGS, bracketed to see them
    fx("f0.csv", base,
       f"SELECT CAST(id AS VARCHAR) || '=[' || c || ']' "
       f"FROM read_csv('{d}/f0.csv', nullstr=['NA','none'], force_not_null=['c']) ORDER BY 1")
    # force_not_null under the DEFAULT nullstr: empty field stays ''
    fx("f1.csv", "id,c\n1,\n2,x",
       f"SELECT CAST(id AS VARCHAR) || '=[' || c || ']' "
       f"FROM read_csv('{d}/f1.csv', force_not_null=['c']) ORDER BY 1")
    # ...while without force_not_null the empty field is NULL
    fx("f2.csv", "id,c\n1,\n2,x",
       f"SELECT CAST(id AS VARCHAR) || '=' || coalesce('[' || c || ']', 'None') "
       f"FROM read_csv('{d}/f2.csv') ORDER BY 1")
    # quoted empty field behaves like unquoted (NULL default, '' forced)
    fx("f3.csv", 'id,c\n1,""\n2,x',
       f"SELECT CAST(id AS VARCHAR) || '=' || coalesce('[' || c || ']', 'None') "
       f"FROM read_csv('{d}/f3.csv') ORDER BY 1")
    fx("f4.csv", 'id,c\n1,""\n2,x',
       f"SELECT CAST(id AS VARCHAR) || '=[' || c || ']' "
       f"FROM read_csv('{d}/f4.csv', force_not_null=['c']) ORDER BY 1")
    # unaffected column keeps its nullstr nulls when another is forced
    fx("f5.csv", base,
       f"SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(d AS VARCHAR), 'None') "
       f"FROM read_csv('{d}/f5.csv', nullstr=['NA','none'], force_not_null=['c']) ORDER BY 1")
    # columns={...}: declared names+types, header consumed, casts applied
    fx("c0.csv", base,
       f"SELECT CAST(x AS VARCHAR) || '=' || coalesce(y, 'None') || '/' || "
       f"coalesce(CAST(z AS VARCHAR), 'None') "
       f"FROM read_csv('{d}/c0.csv', columns={{'x':'INTEGER','y':'VARCHAR','z':'DOUBLE'}}, nullstr=['NA','none']) ORDER BY 1")
    # columns= VARCHAR keeps leading zeros the sniffer would eat
    fx("c1.csv", "id,c\n1,007\n2,08",
       f"SELECT CAST(id AS VARCHAR) || '=' || c "
       f"FROM read_csv('{d}/c1.csv', columns={{'id':'INTEGER','c':'VARCHAR'}}) ORDER BY 1")
    # names= renames the first k, the rest keep sniffed names
    fx("m0.csv", "id,c,d\n1,x,7\n2,y,8",
       f"SELECT CAST(p AS VARCHAR) || '=' || q || '/' || CAST(d AS VARCHAR) "
       f"FROM read_csv('{d}/m0.csv', names=['p','q']) ORDER BY 1")
    # types= dict override by original name
    fx("t0.csv", "id,c\n1,x\n2,y",
       f"SELECT CAST(id AS VARCHAR) || '=' || c "
       f"FROM read_csv('{d}/t0.csv', types={{'id':'DOUBLE'}}) ORDER BY 1")
    # types= positional list: everything VARCHAR keeps raw renders
    fx("t1.csv", "id,c\n1,x\n2,y",
       f"SELECT id || '=' || c "
       f"FROM read_csv('{d}/t1.csv', types=['VARCHAR','VARCHAR']) ORDER BY 1")
    fx("t2.csv", "a,b\n1,2\n3,4",
       f"SELECT CAST(a AS VARCHAR) || '=' || CAST(b AS VARCHAR) "
       f"FROM read_csv('{d}/t2.csv', types={{'b':'DOUBLE'}}) ORDER BY 1")
    # skip= drops junk preamble lines, then the header sniffs as usual
    fx("s0.csv", "garbage\nmore garbage\na\n10\n20",
       f"SELECT CAST(a + 1 AS VARCHAR) FROM read_csv('{d}/s0.csv', skip=2) ORDER BY 1")
    fx("s1.csv", "junk\nv\n5\n6",
       f"SELECT CAST(a AS VARCHAR) FROM read_csv('{d}/s1.csv', skip=1, names=['a'], header=true) ORDER BY 1")
    # ignore_errors: conversion-failing rows drop, the rest survive
    fx("e0.csv", "a\n1\nxx\n3",
       f"SELECT CAST(a AS VARCHAR) FROM read_csv('{d}/e0.csv', "
       f"columns={{'a':'INTEGER'}}, ignore_errors=true, header=true) ORDER BY 1")
    # all_varchar + nullstr list: strings stay raw except the nulls
    fx("v0.csv", base,
       f"SELECT id || '=' || coalesce(d, 'None') "
       f"FROM read_csv('{d}/v0.csv', all_varchar=true, nullstr=['NA','none']) ORDER BY 1")
    # engine-tuning knobs tolerate silently alongside real options
    fx("k0.csv", base,
       f"SELECT CAST(id AS VARCHAR) || '=' || coalesce(c, 'None') "
       f"FROM read_csv('{d}/k0.csv', nullstr=['NA','none'], sample_size=100) ORDER BY 1")
    # boolean / padded-int / date / timestamp sniffing through the
    # null-clean path (types must land so casts+arithmetic behave)
    fx("i0.csv", "f,g\ntrue,NA\nfalse,true",
       f"SELECT CAST(f AS VARCHAR) || '=' || coalesce(CAST(g AS VARCHAR), 'None') "
       f"FROM read_csv('{d}/i0.csv', nullstr=['NA']) ORDER BY 1")
    fx("i1.csv", "a,b\n 7,NA\n 8,9",
       f"SELECT CAST(a + 1 AS VARCHAR) || '/' || coalesce(CAST(b + 1 AS VARCHAR), 'None') "
       f"FROM read_csv('{d}/i1.csv', nullstr=['NA']) ORDER BY 1")
    fx("i2.csv", "dt,x\n2024-02-29,NA\n1999-12-31,5",
       f"SELECT CAST(dt + INTERVAL 1 DAY AS VARCHAR) "
       f"FROM read_csv('{d}/i2.csv', nullstr=['NA']) ORDER BY 1")
    fx("i3.csv", "ts\n2024-02-29 01:02:03\nNA",
       f"SELECT coalesce(CAST(ts AS VARCHAR), 'None') "
       f"FROM read_csv('{d}/i3.csv', nullstr=['NA']) ORDER BY 1")
    fx("i4.csv", "v\n1.5\nNA\n-0.25",
       f"SELECT coalesce(CAST(v * 2 AS VARCHAR), 'None') "
       f"FROM read_csv('{d}/i4.csv', nullstr=['NA']) ORDER BY 1")
    # all-null column sniffs VARCHAR (renders via || without cast)
    fx("i5.csv", "a,b\nNA,1\nNA,2",
       f"SELECT coalesce(a, 'None') || '/' || CAST(b AS VARCHAR) "
       f"FROM read_csv('{d}/i5.csv', nullstr=['NA','none']) ORDER BY 1")
    return [(sq, "query") for sq in scripts]


def fam_jsonopt(seed):
    """r17: read_json READER-option depth (r16 VERDICT task 6a) — array
    vs newline-delimited framing (auto + explicit), records=false STRUCT
    packing, scalar roots in a `json` column, columns={...} projection
    with casts and NULL for missing keys, ignore_errors' all-NULL rows,
    date/timestamp string promotion (and its NON-promotion for bare-T
    strings), nested structure inference, and mixed-number widening."""
    import os, shutil
    shutil.rmtree("/tmp/graft_jsonopt_fx", ignore_errors=True)
    os.makedirs("/tmp/graft_jsonopt_fx", exist_ok=True)
    d = "/tmp/graft_jsonopt_fx"
    scripts = []

    def fx(fname, content, select):
        scripts.append(_rawfile(f"{d}/{fname}", content) + "; " + select)

    nd = '{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}'
    arr = '[{"a": 1, "b": "x"},\n{"a": 2, "b": "y"}]'
    # framing: auto-detect both shapes, explicit format=
    fx("a0.json", arr,
       f"SELECT CAST(a AS VARCHAR) || '=' || b FROM read_json('{d}/a0.json') ORDER BY 1")
    fx("a1.json", arr,
       f"SELECT CAST(a AS VARCHAR) || '=' || b FROM read_json('{d}/a1.json', format='array') ORDER BY 1")
    fx("a2.json", nd,
       f"SELECT CAST(a AS VARCHAR) || '=' || b FROM read_json('{d}/a2.json', format='newline_delimited') ORDER BY 1")
    fx("a3.json", nd,
       f"SELECT CAST(a AS VARCHAR) || '=' || b FROM read_json('{d}/a3.json') ORDER BY 1")
    fx("a4.json", nd,
       f"SELECT CAST(a AS VARCHAR) || '=' || b FROM read_ndjson('{d}/a4.json') ORDER BY 1")
    # records=false: one STRUCT column named json (DuckDB render)
    fx("r0.json", nd,
       f"SELECT CAST(json AS VARCHAR) FROM read_json('{d}/r0.json', records=false) ORDER BY 1")
    fx("r1.json", arr,
       f"SELECT CAST(json AS VARCHAR) FROM read_json('{d}/r1.json', records=false) ORDER BY 1")
    # scalar roots: a `json` column of the sniffed type
    fx("s0.json", "1\n2\n3",
       f"SELECT CAST(sum(json) AS VARCHAR) FROM read_json('{d}/s0.json')")
    fx("s1.json", "1.5\n-0.25",
       f"SELECT CAST(json * 2 AS VARCHAR) FROM read_json('{d}/s1.json') ORDER BY 1")
    fx("s2.json", '"abc"\n"d\\"e"',
       f"SELECT json FROM read_json('{d}/s2.json') ORDER BY 1")
    fx("s3.json", "true\nfalse",
       f"SELECT CAST(json AS VARCHAR) FROM read_json('{d}/s3.json') ORDER BY 1")
    # columns={...}: only listed columns, casts applied, missing -> NULL
    fx("c0.json", nd,
       f"SELECT CAST(a AS VARCHAR) || '=' || b FROM read_json('{d}/c0.json', columns={{'a':'DOUBLE','b':'VARCHAR'}}) ORDER BY 1")
    fx("c1.json", nd,
       f"SELECT a FROM read_json('{d}/c1.json', columns={{'a':'VARCHAR'}}) ORDER BY 1")
    fx("c2.json", nd,
       f"SELECT coalesce(CAST(zz AS VARCHAR), 'None') FROM read_json('{d}/c2.json', columns={{'zz':'INTEGER'}})")
    # ignore_errors: the malformed line keeps an all-NULL row
    fx("e0.json", '{"a": 1}\nnot json\n{"a": 3}',
       f"SELECT coalesce(CAST(a AS VARCHAR), 'None') FROM read_json('{d}/e0.json', ignore_errors=true) ORDER BY 1")
    # date/timestamp STRING promotion at the top level
    fx("p0.json", '{"d": "2024-02-29"}\n{"d": "1999-12-31"}',
       f"SELECT CAST(d + INTERVAL 1 DAY AS VARCHAR) FROM read_json('{d}/p0.json') ORDER BY 1")
    fx("p1.json", '{"t": "2024-02-29 01:02:03"}\n{"t": "1999-12-31 23:59:59.5"}',
       f"SELECT CAST(t AS VARCHAR) FROM read_json('{d}/p1.json') ORDER BY 1")
    fx("p2.json", '{"t": "2024-02-29T01:02:03Z"}',
       f"SELECT CAST(t AS VARCHAR) FROM read_json('{d}/p2.json')")
    # bare-T strings without a zone do NOT promote (stay VARCHAR)
    fx("p3.json", '{"t": "2024-02-29T01:02:03"}',
       f"SELECT t || '!' FROM read_json('{d}/p3.json')")
    # numeric-looking and boolean-looking strings stay VARCHAR
    fx("p4.json", '{"n": "007", "b": "true"}',
       f"SELECT n || '/' || b || '!' FROM read_json('{d}/p4.json')")
    # nested structure inference: struct field access + list render
    fx("x0.json", '{"s": {"x": 1, "y": [1,2]}, "l": ["a","b"]}\n{"s": {"x": 2, "y": []}, "l": []}',
       f"SELECT CAST(s.x AS VARCHAR) || '=' || CAST(l AS VARCHAR) FROM read_json('{d}/x0.json') ORDER BY 1")
    # missing fields NULL-pad; mixed int/double widens to DOUBLE
    fx("x1.json", '{"a": 1, "b": "x"}\n{"a": 2}',
       f"SELECT CAST(a AS VARCHAR) || '=' || coalesce(b, 'None') FROM read_json('{d}/x1.json') ORDER BY 1")
    fx("x2.json", '{"v": 1}\n{"v": 2.5}',
       f"SELECT CAST(v AS VARCHAR) FROM read_json('{d}/x2.json') ORDER BY 1")
    return [(sq, "query") for sq in scripts]


def fam_stmtshape(seed):
    """r17: statement-SHAPE depth (r16 VERDICT task 6b) — nested set-op
    precedence (INTERSECT binds tighter; left-assoc UNION/EXCEPT
    chains), parenthesized operands with inner ORDER BY + outer
    LIMIT/OFFSET, CTE shadowing (nested, scalar-subquery, FORWARD
    references between CTEs), VALUES-row coercion breadth, FROM-first,
    GROUP BY/ORDER BY ALL, DISTINCT ON, LIMIT n%, FETCH FIRST, ORDER BY
    of an alias that shadows its source column. Error atomicity lives
    in R17EdgeSpec (error scripts cannot hash-compare)."""
    qs = [
        # ---- set-op precedence / associativity ----
        "SELECT CAST(x AS VARCHAR) FROM (SELECT 1 AS x UNION SELECT 2 INTERSECT SELECT 2) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (SELECT 1 AS x INTERSECT SELECT 2 UNION SELECT 3) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (SELECT 1 AS x UNION ALL SELECT 2 EXCEPT SELECT 1) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (SELECT 1 AS x EXCEPT SELECT 1 UNION ALL SELECT 5) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (SELECT 1 AS x UNION SELECT 2 UNION ALL SELECT 2) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM ((SELECT 1 AS x UNION SELECT 2) INTERSECT SELECT 2) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (SELECT 1 AS x UNION ALL (SELECT 2 EXCEPT SELECT 2)) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (SELECT 2 AS x UNION ALL SELECT 2 INTERSECT ALL SELECT 2) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (SELECT 1 AS x EXCEPT SELECT 2 EXCEPT SELECT 1) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES (1) UNION ALL VALUES (2) INTERSECT VALUES (2)) t(x) ORDER BY 1",
        # trailing ORDER BY scopes to the whole union; inner ORDER BY
        # stays inside its parens, outer LIMIT/OFFSET over the union
        "SELECT * FROM (VALUES (3),(1)) t(x) UNION ALL SELECT 2 ORDER BY 1",
        "SELECT 1 UNION SELECT 2 ORDER BY 1 LIMIT 1 OFFSET 1",
        "WITH t(x) AS (VALUES (1),(2)) (SELECT x FROM t) UNION ALL (SELECT x FROM t) ORDER BY 1",
        "(SELECT 2 AS x) UNION ALL (SELECT 1) ORDER BY 1 LIMIT 1",
        # ---- CTE shadowing / forward references ----
        "WITH t(x) AS (SELECT 1) SELECT CAST(x AS VARCHAR) FROM (WITH t(x) AS (SELECT 2) SELECT x FROM t)",
        "WITH t(x) AS (SELECT 1), u(y) AS (SELECT x + 1 FROM t) SELECT CAST(y AS VARCHAR) FROM u",
        "WITH t(x) AS (SELECT 1) SELECT CAST((WITH t(x) AS (SELECT 5) SELECT x FROM t) + x AS VARCHAR) FROM t",
        "WITH u(y) AS (SELECT x FROM t), t(x) AS (SELECT 7) SELECT CAST(y AS VARCHAR) FROM u",
        "WITH RECURSIVE t(x) AS (SELECT 1 UNION ALL SELECT x+1 FROM t WHERE x < 4) SELECT CAST(sum(x) AS VARCHAR) FROM t",
        "WITH t(x) AS (SELECT 10) SELECT CAST(a.x + b.x AS VARCHAR) FROM t a, t b",
        "WITH t AS (SELECT 1 AS x) SELECT CAST(x AS VARCHAR) FROM (WITH u AS (SELECT x + 1 AS x FROM t) SELECT x FROM u)",
        # ---- VALUES-row coercion breadth ----
        "SELECT CAST(x AS VARCHAR) FROM (VALUES (1), (2.5), (3)) t(x) ORDER BY x",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES (DATE '2024-01-01'), ('2024-02-03')) t(x) ORDER BY 1",
        "SELECT coalesce(CAST(x AS VARCHAR), 'None') FROM (VALUES (1), (NULL), (3)) t(x) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES (true), (1)) t(x) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES ([1,2]), ([3.5])) t(x) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES (CAST(1 AS TINYINT)), (300)) t(x) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES (1e0), (2)) t(x) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES (TIMESTAMP '2024-01-01 01:02:03'), ('2024-02-03 00:00:00')) t(x) ORDER BY 1",
        # ---- clause shapes ----
        "SELECT CAST(x AS VARCHAR) FROM (VALUES (4),(2),(1),(3)) t(x) ORDER BY 1 OFFSET 1",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES (1),(2),(3)) t(x) ORDER BY 1 LIMIT 50%",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES (1),(2),(3)) t(x) ORDER BY 1 FETCH FIRST 2 ROWS ONLY",
        "FROM (VALUES (1),(2)) t(x) SELECT CAST(x + 1 AS VARCHAR) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) || '/' || CAST(count(*) AS VARCHAR) FROM (VALUES (1),(1),(2)) t(x) GROUP BY ALL ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES (3),(1),(2)) t(x) ORDER BY ALL",
        "SELECT CAST(-x AS VARCHAR) AS x FROM (VALUES (3),(1)) t(x) ORDER BY x",
        "SELECT DISTINCT ON (x % 2) CAST(x AS VARCHAR) FROM (VALUES (4),(2),(1),(3)) t(x) ORDER BY x % 2, x",
    ]
    return [(q, "query") for q in qs]


def fam_jsonbuild(seed):
    """r15: JSON construction/inspection — to_json over scalars,
    json_object/json_array from mixed-typed args, RFC 7386
    json_merge_patch, json_type names, json_keys on non-objects."""
    exprs = [
        "to_json({'a': 1, 'b': 'x'})", "to_json([1, 2, 3])",
        "to_json('plain')", "to_json('he said \"hi\"')", "to_json(1.5)",
        "to_json(true)", "to_json(CAST(1 AS BIGINT))",
        "to_json(DATE '2024-01-02')", "to_json(NULL)",
        "json_quote(1.5)", "json_quote('x')",
        "json_object('k', 1, 'j', 'two')", "json_object()",
        "json_object('k', NULL)", "json_object('k', [1,2])",
        "json_object('k', {'x': 1})", "json_object('a', 1.5, 'b', true)",
        "json_array()", "json_array(1, 'a', NULL)", "json_array([1,2])",
        "json_array(1.5, true)", "json_array('q')",
        "json_merge_patch('{\"a\":1,\"b\":2}', '{\"b\":null,\"c\":3}')",
        "json_merge_patch('{\"a\":{\"x\":1,\"y\":2}}', '{\"a\":{\"y\":null,\"z\":9}}')",
        "json_merge_patch('{\"a\":1}', '3')",
        "json_merge_patch('{\"a\":1}', 'null')",
        "json_merge_patch(NULL, '{\"a\":1}')",
        "json_merge_patch('{\"a\":1}', NULL)",
        "json_type('{\"a\":1}')", "json_type('[1]')", "json_type('3')",
        "json_type('-3')", "json_type('1.5')", "json_type('\"x\"')",
        "json_type('null')", "json_type('true')",
        "json_type('{\"a\":[1]}', '$.a')",
        "CAST(json_keys('{\"a\":1,\"b\":{\"c\":2}}') AS VARCHAR)",
        "CAST(json_keys('{}') AS VARCHAR)",
        "CAST(json_keys('[1]') AS VARCHAR)",
        # r16 wave: yyjson double rendering (ADVICE — Jackson's
        # scientific-notation thresholds silently diverged), NULL-key
        # skip, timestamp/time scalars
        "to_json(1e16)", "to_json(12345678.5)", "to_json(1234567.5)",
        "to_json(1234567890123456.5)", "to_json(1e20)", "to_json(1e21)",
        "to_json(1.5e21)", "to_json(1e-6)", "to_json(1e-7)",
        "to_json(1.23e-5)", "to_json(1e100)", "to_json(5e-324)",
        "to_json(CAST('nan' AS DOUBLE))", "to_json(CAST('inf' AS DOUBLE))",
        "to_json(CAST('-inf' AS DOUBLE))", "to_json(CAST(-0.0 AS DOUBLE))",
        "to_json(CAST(3.14 AS FLOAT))", "to_json(CAST(1e16 AS FLOAT))",
        "to_json(CAST(123456789012345678 AS DOUBLE))",
        "to_json(TIMESTAMP '2024-01-15 10:30:00.123456')",
        "to_json(TIMESTAMP '2024-01-15 10:30:00')",
        "to_json(TIMESTAMP '2024-01-15 10:30:00.120')",
        "to_json(TIMESTAMP '0044-03-15 01:02:03')",
        "to_json(TIME '23:59:59.999999')", "to_json(TIME '01:02:03')",
        "json_object(NULL, 1)", "json_object('a', 1, NULL, 2, 'b', 3)",
        "json_object('d', 1e16)", "json_array(1e16, CAST('nan' AS DOUBLE))",
        "json_array(TIMESTAMP '2024-01-15 10:30:00')",
    ]
    return [(e, "scalar") for e in exprs]


def fam_numedge(seed):
    """r15: numeric edge semantics — division/modulo by zero (NULL in
    DuckDB), sign of modulo, truncating //, inf/nan arithmetic and
    renders, round family, double->int casts (DuckDB ROUNDS half away),
    -0.0 normalization, huge factorials. Error cases (int overflow,
    sqrt(-1), ln(0), out-of-range casts) refuse in BOTH engines and live
    in R15EdgeSpec instead."""
    exprs = [
        "1 / 0", "1.0 / 0", "CAST(1 AS DOUBLE) / 0", "0 / 0",
        "1 % 0", "fmod(1, 0)", "fmod(7.5, 2)", "fmod(-7.5, 2)",
        "-7 % 3", "7 % -3", "-7 % -3", "7.5 % 2",
        "-7 // 2", "7 // -2", "-7 // -2", "7.5 // 2",
        "CAST('inf' AS DOUBLE)", "CAST('-inf' AS DOUBLE)",
        "CAST('nan' AS DOUBLE)",
        "CAST(1e308 AS DOUBLE) * 10",
        "1 / CAST('inf' AS DOUBLE)",
        "CAST('inf' AS DOUBLE) > 1e308",
        "CAST('nan' AS DOUBLE) = CAST('nan' AS DOUBLE)",
        "CAST('nan' AS DOUBLE) > CAST('inf' AS DOUBLE)",
        "round(2.5)", "round(3.5)", "round(-2.5)", "round(-3.5)",
        "round(2.345, 2)", "round(2.675, 2)", "round(-2.675, 2)",
        "round(1234.5678, -2)",
        "ceil(-0.5)", "floor(-0.5)", "ceil(0.5)", "trunc(-1.7)",
        "CAST(-0.0 AS DOUBLE)", "sign(-0.0)", "sign(-3)", "sign(CAST('nan' AS DOUBLE))",
        "CAST(3.99 AS INTEGER)", "CAST(-3.99 AS INTEGER)",
        "CAST(2.5 AS INTEGER)", "CAST(3.5 AS INTEGER)", "CAST(-2.5 AS INTEGER)",
        "CAST('1e4' AS INTEGER)",
        "CAST(CAST(2.5 AS DOUBLE) AS BIGINT)",
        "factorial(21)",
        "atan2(0, 0)", "0 ** 0", "2 ** -1", "power(2, 0.5)",
        "exp(0)", "log10(100)", "log2(8)", "cbrt(-8)",
        "isnan(CAST('nan' AS DOUBLE))", "isinf(CAST('inf' AS DOUBLE))",
        "isfinite(1.5)",
        "greatest(CAST('nan' AS DOUBLE), 1.0)",
        "least(CAST('nan' AS DOUBLE), 1.0)",
        # wave 2: concat NULL-skipping, substr window semantics, typed shifts
        "concat('a', NULL, 'b')", "concat(NULL, NULL)", "concat('x')",
        "concat(1, 'a', 2.5)", "concat(['x','y'], ['z'])",
        "concat('a', NULL) || 'z'",
        "substr('abcdef', 0, 3)", "substr('abcdef', 0)", "substr('abcdef', 0, 0)",
        "substr('abcdef', -5, 3)", "substr('abcdef', -6, 3)", "substr('abcdef', -7, 3)",
        "substr('abcdef', 2, -1)", "substr('abcdef', -1, 1)", "substr('abcdef', 0, 10)",
        "substring('abcdef', 0, 3)", "substring('abcdef' FROM 0 FOR 3)",
        "substring('abcdef' FROM 2 FOR 2)", "substr('héllo', 0, 3)",
        "5 << 2", "5 >> 1", "-8 >> 1", "-7 >> 1",
        "5 >> -1", "5 >> 64", "CAST(1 AS BIGINT) << 62",
        "CAST(-2147483648 AS INTEGER) >> 1", "1 << 30",
        "3 * 2 << 1", "1 + 2 << 1", "2 << 1 + 1",
        "5 & 3", "5 | 3", "xor(5, 3)", "bit_count(255)", "~5",
        # r16 wave: zero-input left shift short-circuits to 0 for any
        # non-negative amount (ADVICE — we errored where DuckDB answers)
        "0::BIGINT << 64", "0::INTEGER << 40", "0::SMALLINT << 100",
        "0 << 0", "0::BIGINT << 9223372036854775807",
    ]
    return [(e, "scalar") for e in exprs]


def fam_uuidblob(seed):
    """r16: UUID casts/literals (canonical lowercase render), BIT
    function set over the VARCHAR carrier, BLOB \\xHH escape decode +
    codec functions (VERDICT task 6). gen_random_uuid is nondeterministic
    and spec-covered instead; BIT | & ~ xor operators are documented
    loud refusals."""
    exprs = [
        "CAST(uuid '550e8400-e29b-41d4-a716-446655440000' AS VARCHAR)",
        "CAST('550E8400-E29B-41D4-A716-446655440000' AS UUID)::VARCHAR",
        "CAST('550e8400e29b41d4a716446655440000' AS UUID)::VARCHAR",
        "CAST('{550e8400-e29b-41d4-a716-446655440000}' AS UUID)::VARCHAR",
        "TRY_CAST('not-a-uuid' AS UUID)::VARCHAR",
        "uuid '550e8400-e29b-41d4-a716-446655440000' = CAST('550E8400-E29B-41D4-A716-446655440000' AS UUID)",
        "CAST('0101'::BIT AS VARCHAR)",
        "bitstring('0101', 8)::VARCHAR",
        "bitstring('0101', 4)::VARCHAR",
        "CAST(bit_count('1111'::BIT) AS BIGINT)",
        "CAST(bit_count('0101'::BIT) AS BIGINT)",
        "CAST(bit_count(255) AS BIGINT)",
        "CAST(bit_position('010'::BIT, '0110101'::BIT) AS BIGINT)",
        "CAST(bit_position('11'::BIT, '0101'::BIT) AS BIGINT)",
        "CAST(get_bit('0110'::BIT, 1) AS BIGINT)",
        "CAST(get_bit('0110'::BIT, 0) AS BIGINT)",
        "set_bit('0110'::BIT, 1, 0)::VARCHAR",
        "set_bit('0110'::BIT, 3, 1)::VARCHAR",
        "CAST(bit_length('0101'::BIT) AS BIGINT)",
        "CAST(octet_length('0101'::BIT) AS BIGINT)",
        "CAST(octet_length('101010101'::BIT) AS BIGINT)",
        "CAST(length('0101'::BIT) AS BIGINT)",
        "TRY_CAST('0a1' AS BIT)::VARCHAR",
        "('001'::BIT << 1)::VARCHAR",
        "('100'::BIT >> 2)::VARCHAR",
        "('0110'::BIT << 64)::VARCHAR",
        "('0110'::BIT >> -1)::VARCHAR",
        "('0110'::BIT << 0)::VARCHAR",
        "('0101'::BIT = '0101'::BIT)",
        "('0101'::BIT < '0110'::BIT)",
        "CAST('abc'::BLOB AS VARCHAR)",
        r"CAST('\x41\x42'::BLOB AS VARCHAR)",
        r"hex('\x41'::BLOB)",
        r"hex('a''b'::BLOB)",
        r"CAST(octet_length('\x00ab'::BLOB) AS BIGINT)",
        "CAST(TRY_CAST('héllo' AS BLOB) AS VARCHAR)",
        "encode('héllo')::VARCHAR",
        "CAST(decode(encode('hé')) AS VARCHAR)",
        "CAST(octet_length(encode('héllo')) AS BIGINT)",
        "base64('abc'::BLOB)",
        "to_base64('abc'::BLOB)",
        "from_base64('YWJj')::VARCHAR",
        "hex('abc'::BLOB)",
        "unhex('414243')::VARCHAR",
        "CAST(unhex('27') AS VARCHAR)",
        "CAST(unhex('5C') AS VARCHAR)",
        "CAST(unhex('09') AS VARCHAR)",
        "CAST(unhex('7F') AS VARCHAR)",
        "to_hex(255)",
        "from_hex('ff')::VARCHAR",
        "('ab'::BLOB || 'cd'::BLOB)::VARCHAR",
        "md5('abc')",
        "sha256('abc')",
    ]
    return [(e, "scalar") for e in exprs]


def fam_strftime(seed):
    """r16: strftime/strptime C-directive matrix — the highest-traffic
    everyday surface with no family until now (VERDICT task 3). Formats:
    names/week-numbers/ISO fields/fraction units/padding flags; parses:
    defaults, ranges, pivot years, ignored fields, %z instant shift,
    list formats. Error cases (unsupported specifiers, range violations)
    live in the spec's refusal test."""
    t1 = "TIMESTAMP '2024-03-05 04:07:09.123456'"
    t2 = "TIMESTAMP '1999-12-31 23:59:59.000100'"
    t3 = "TIMESTAMP '2021-01-03 00:30:00'"
    t4 = "TIMESTAMP '0044-03-15 12:00:00'"
    d1 = "DATE '2024-03-05'"
    fmt_specs = ["%a", "%A", "%w", "%u", "%d", "%-d", "%b", "%B", "%m",
                 "%-m", "%y", "%-y", "%Y", "%G", "%H", "%-H", "%I", "%-I",
                 "%p", "%M", "%-M", "%S", "%-S", "%g", "%f", "%n", "%j",
                 "%-j", "%U", "%W", "%V", "%x", "%X", "%c", "%T", "%h",
                 "%z", "%%"]
    exprs = []
    for s in fmt_specs:
        exprs.append(f"strftime({t1}, '{s}')")
    for s in ["%a %A %w %u", "%G|%V|%U|%W", "%I %p", "%g|%f|%n", "%c"]:
        exprs.append(f"strftime({t2}, '{s}')")
        exprs.append(f"strftime({t3}, '{s}')")
    exprs += [
        f"strftime({t4}, '%Y|%y|%-y|%G')",
        f"strftime({d1}, '%Y/%m/%d %H:%M')",
        f"strftime({t1}, 'week %U of %Y, day %-j')",
        # parses: defaults / flexible widths / names / pivot / ignored
        "CAST(strptime('2024-03-15', '%Y-%m-%d') AS VARCHAR)",
        "CAST(strptime('5/3/2024', '%-d/%-m/%Y') AS VARCHAR)",
        "CAST(strptime('2024-3-5', '%Y-%m-%d') AS VARCHAR)",
        "CAST(strptime('05:06', '%H:%M') AS VARCHAR)",
        "CAST(strptime('March 5, 2024', '%B %-d, %Y') AS VARCHAR)",
        "CAST(strptime('MAR 5 2024', '%b %-d %Y') AS VARCHAR)",
        "CAST(strptime('march 5 2024', '%B %-d %Y') AS VARCHAR)",
        "CAST(strptime('24 Mar 5', '%y %b %-d') AS VARCHAR)",
        "CAST(strptime('99-12-31', '%y-%m-%d') AS VARCHAR)",
        "CAST(strptime('68-12-31', '%y-%m-%d') AS VARCHAR)",
        "CAST(strptime('69-12-31', '%y-%m-%d') AS VARCHAR)",
        "CAST(strptime('2024-066', '%Y-%j') AS VARCHAR)",
        "CAST(strptime('11 PM', '%I %p') AS VARCHAR)",
        "CAST(strptime('11 pm', '%I %p') AS VARCHAR)",
        "CAST(strptime('12 AM', '%I %p') AS VARCHAR)",
        "CAST(strptime('12 PM', '%I %p') AS VARCHAR)",
        "CAST(strptime('123456 2024', '%f %Y') AS VARCHAR)",
        "CAST(strptime('1 2024', '%f %Y') AS VARCHAR)",
        "CAST(strptime('12 2024', '%g %Y') AS VARCHAR)",
        "CAST(strptime('2024-03-15 10:30:00.123', '%Y-%m-%d %H:%M:%S.%g') AS VARCHAR)",
        "CAST(strptime('x2024', 'x%Y') AS VARCHAR)",
        "CAST(strptime(' 2024', '%Y') AS VARCHAR)",
        "CAST(strptime('2024 ', '%Y') AS VARCHAR)",
        "CAST(strptime('Tue 2024-03-05', '%a %Y-%m-%d') AS VARCHAR)",
        "CAST(strptime('Mon 2024-03-05', '%a %Y-%m-%d') AS VARCHAR)",
        "CAST(strptime('Friday 2024-03-15', '%A %Y-%m-%d') AS VARCHAR)",
        "CAST(strptime('2024-03-15T10:30', '%Y-%m-%dT%H:%M') AS VARCHAR)",
        "CAST(strptime('5', '%-I') AS VARCHAR)",
        "CAST(strptime('0', '%H') AS VARCHAR)",
        # %z shifts to a UTC instant; result is TIMESTAMPTZ
        "CAST(strptime('2024-03-15 +01', '%Y-%m-%d %z') AS VARCHAR)",
        "CAST(strptime('2024-03-15 +0130', '%Y-%m-%d %z') AS VARCHAR)",
        "CAST(strptime('2024-03-15 +01:30', '%Y-%m-%d %z') AS VARCHAR)",
        "CAST(strptime('2024-03-15 -05', '%Y-%m-%d %z') AS VARCHAR)",
        # list formats (TIMESTAMPTZ by type)
        "CAST(strptime('2024-03-15', ['%Y/%m/%d', '%Y-%m-%d']) AS VARCHAR)",
        "CAST(strptime('31.12.1999', ['%d.%m.%Y']) AS VARCHAR)",
        # try_ flavor NULLs every failure class
        "CAST(try_strptime('2024-13-05', '%Y-%m-%d') AS VARCHAR)",
        "CAST(try_strptime('2024-02-31', '%Y-%m-%d') AS VARCHAR)",
        "CAST(try_strptime('nope', '%Y') AS VARCHAR)",
        "CAST(try_strptime('x', ['%Y', '%-d']) AS VARCHAR)",
    ]
    return [(e, "scalar") for e in exprs]


def fam_trailing(seed):
    """r15: the trailing-comma TOLERANCE side of the measured matrix
    (refusals error identically in both engines and cannot be value
    fixtures — R15EdgeSpec intercepts those). Full-query kind."""
    qs = [
        "SELECT CAST(1 AS VARCHAR), FROM (VALUES (0)) t(z)",
        "SELECT CAST(z AS VARCHAR), FROM (VALUES (7)) t(z) WHERE z > 0",
        "SELECT CAST(z AS VARCHAR) FROM (VALUES (1),(2)) t(z) GROUP BY z, ORDER BY z",
        "SELECT CAST(z AS VARCHAR) FROM (VALUES (1),(2),(3)) t(z) WHERE z IN (1, 3,) ORDER BY z",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES (1, 2,), (3, 4,),) v(x, y) ORDER BY x",
        "SELECT CAST([1, 2,] AS VARCHAR)",
        "SELECT CAST({'a': 1,} AS VARCHAR)",
        "SELECT CAST(row(1, 2,) AS VARCHAR)",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES (1, 2)) v(x, y,)",
        "WITH c(x,) AS (SELECT 5) SELECT CAST(x AS VARCHAR) FROM c",
        "WITH a(x) AS (SELECT 1), b(y,) AS (SELECT 2) SELECT CAST(x + y AS VARCHAR) FROM a, b",
        "SELECT CAST(z AS VARCHAR) FROM (VALUES (2),(1)) t(z) GROUP BY CUBE (z,) ORDER BY 1 NULLS FIRST",
        "SELECT DISTINCT ON (z,) CAST(z AS VARCHAR) FROM (VALUES (4)) t(z)",
        "SELECT CAST(z AS VARCHAR), FROM (VALUES (9)) t(z) LIMIT 1",
        "SELECT CAST(z AS VARCHAR), FROM (VALUES (8)) t(z) OFFSET 0",
        "SELECT CAST(a AS VARCHAR), FROM (VALUES (1)) t(a) UNION ALL SELECT CAST(b AS VARCHAR), FROM (VALUES (2)) u(b) ORDER BY 1",
        "SELECT CAST((SELECT 42,) AS VARCHAR)",
        "SELECT CAST(z AS VARCHAR) FROM (VALUES (1),(5)) t(z) WHERE EXISTS (SELECT 1, FROM (VALUES (0)) u(w)) ORDER BY z",
        "SELECT CAST(z AS VARCHAR) FROM (VALUES (1),(2)) t(z) GROUP BY z, HAVING z > 1",
        "SELECT CAST(sum(z) AS VARCHAR) FROM (VALUES (1),(2)) t(z) GROUP BY GROUPING SETS ((z),(),) ORDER BY 1",
    ]
    return [(q, "query") for q in qs]


def fam_collate(seed):
    """r15: expression-level COLLATE at comparison / IN / ORDER BY sites.
    DuckDB's NOCASE is utf8proc's SIMPLE fold (STRASSE <> strasse-from-
    straße), NOACCENT strips combining marks only (ø/đ keep their
    stroke), dotted chains compose."""
    rng = random.Random(seed)
    pairs = [("'A'", "'a'"), ("'Ä'", "'ä'"), ("'ẞ'", "'ß'"), ("'İ'", "'i'"),
             ("'𐐀'", "'𐐨'"), ("'STRASSE'", "'straße'"), ("'AbC'", "'aBc'"),
             ("'x'", "'Y'"), ("'ä'", "'z'"), ("'a'", "'B'")]
    exprs = []
    for op in ["=", "<>", "<", "<=", ">", ">="]:
        for (a, b) in pairs:
            side = rng.choice(["right", "left"])
            exprs.append(f"{a} {op} {b} COLLATE NOCASE" if side == "right"
                         else f"{a} COLLATE NOCASE {op} {b}")
    for (a, b) in [("'é'", "'e'"), ("'ñ'", "'n'"), ("'ç'", "'c'"),
                   ("'ě'", "'e'"), ("'ø'", "'o'"), ("'đ'", "'d'"),
                   ("'å'", "'a'"), ("'ü'", "'u'")]:
        exprs.append(f"{a} = {b} COLLATE NOACCENT")
    exprs += [
        "'É' = 'e' COLLATE NOCASE.NOACCENT",
        "'Å' = 'a' COLLATE NOACCENT.NOCASE",
        "'Ñ' <> 'n' COLLATE NOCASE.NOACCENT",
        "'x' COLLATE C = 'X'",
        "'é' COLLATE NFC = 'é'",
        "('a' COLLATE NOCASE) IN ('A', 'x')",
        "('Q' COLLATE NOCASE) IN ('a', 'b')",
        "('Ä' COLLATE NOCASE) IN ('ä', 'ö')",
        "upper('straße') = 'STRASSE' COLLATE NOCASE",
        "'a' || 'BC' = 'AbC' COLLATE NOCASE",
    ]
    # ORDER BY keys (full-query kind; keys distinct under the fold so the
    # unspecified tie order cannot flap)
    queries = [
        "SELECT CAST(x AS VARCHAR) FROM (VALUES ('b'),('A'),('C')) t(x) ORDER BY x COLLATE NOCASE",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES ('b'),('A'),('C'),('d')) t(x) ORDER BY x COLLATE NOCASE DESC",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES ('é'),('a'),('f')) t(x) ORDER BY x COLLATE NOACCENT",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES ('b'),('A'),('ç'),('D')) t(x) ORDER BY x COLLATE NOCASE.NOACCENT",
        "SELECT CAST(x AS VARCHAR) FROM (VALUES ('b'),('A'),('C')) t(x) ORDER BY 1 = 1, x COLLATE NOCASE",
    ]
    return [(e, "scalar") for e in exprs] + [(q, "query") for q in queries]


def fam_printf(seed):
    """printf (C/fmt) + format (fmt {}-spec) + format_bytes — the r16
    formatting barrage. Spark's java.util.Formatter silently diverges
    on %b, %.0f ties, %g stripping, nan casing, %i/%u/%a/%''d."""
    rng = random.Random(seed)
    exprs = [
        # --- printf: int directives, widths, flags
        "printf('%d', 42)", "printf('%d', -42)",
        "printf('%5d|%-5d|%05d', 42, 42, 42)",
        "printf('%05d', -42)", "printf('%-08d|', -42)",
        "printf('%+d|%+d|% d', 5, -5, 5)",
        "printf('%.3d', 42)", "printf('%08.3d', 42)",
        "printf('%i %u %ld %hd %zu', 1, 2, 3, 4, 5)",
        "printf('%u', -5)", "printf('%u', CAST(-5 AS BIGINT))",
        "printf('%d', true)", "printf('%d', CAST(5 AS SMALLINT))",
        "printf('%d', CAST(-9223372036854775807 - 1 AS BIGINT))",
        # --- base conversion (two's complement per arg width)
        "printf('%x|%X|%o|%b', 255, 255, 8, 5)",
        "printf('%x', -1)", "printf('%x', CAST(-1 AS BIGINT))",
        "printf('%x', CAST(-1 AS SMALLINT))",
        "printf('%o', CAST(-1 AS INTEGER))", "printf('%b', CAST(-1 AS INTEGER))",
        "printf('%#x|%#X|%#o|%#b', 255, 255, 8, 5)",
        "printf('%x|%o|%b', 0, 0, 0)",
        "printf('%08x', 255)", "printf('%.6x', 255)",
        # --- thousand separators
        "printf('%,d', 1234567)", "printf('%,d', -1234567)",
        "printf('%,d', 123)", "printf('%''d', 1234567)",
        "printf('%,x|%,s', 255, 'ab')",
        # --- %c
        "printf('%c', 65)", "printf('%c', 0) IS NOT NULL",
        "printf('%5c|%-5c|', 65, 66)", "printf('%c', 127)",
        # --- %s over string-class values
        "printf('%s|%10s|%-10s|', 'hi', 'hi', 'hi')",
        "printf('%10.3s', 'abcdef')", "printf('%.2s', 'héllo')",
        "printf('%5s', 'héllo')",
        "printf('%s', true)", "printf('%s', DATE '2024-01-02')",
        "printf('%s', TIMESTAMP '2024-01-02 03:04:05')",
        "printf('%s', [1, 2, 3])", "printf('%s', {'a': 1})",
        # --- %f/%F
        "printf('%f', 1.5)", "printf('%.3f|%10.2f|%-10.2f|', 3.14159, 3.14159, 3.14159)",
        "printf('%.0f|%.0f|%.0f', 2.5, 3.5, 0.5)",
        "printf('%.2f', 2.675)", "printf('%.1f|%.1f', 0.25, 0.35)",
        "printf('%08.2f', -3.14159)", "printf('%#.0f', 3.0)",
        "printf('%f|%F', CAST('nan' AS DOUBLE), CAST('nan' AS DOUBLE))",
        "printf('%f|%F', CAST('inf' AS DOUBLE), CAST('-inf' AS DOUBLE))",
        "printf('%+f|% f', CAST('inf' AS DOUBLE), 1.0)",
        "printf('%5.1f|%05.1f', CAST('nan' AS DOUBLE), CAST('nan' AS DOUBLE))",
        "printf('%8.2f', CAST('-inf' AS DOUBLE))",
        "printf('%-6.1f|', CAST('nan' AS DOUBLE))",
        "printf('%f', CAST(1.5 AS DECIMAL(4,2)))",
        "printf('%.2f', CAST(0.1 AS FLOAT))",
        # --- %e/%E
        "printf('%e|%E', 12345.678, 12345.678)",
        "printf('%.2e', 9.996e5)", "printf('%.0e', 12345.0)",
        "printf('%+.2e', -0.000123)", "printf('%15.4e|', -123.456)",
        "printf('%e', 0.0)", "printf('%E', CAST('-inf' AS DOUBLE))",
        # --- %g/%G
        "printf('%g|%G', 0.00001234, 123456789.0)",
        "printf('%g|%g', 100000.0, 1000000.0)",
        "printf('%g|%g|%g', 1.5, 150.0, 0.1)",
        "printf('%g', 1e300)", "printf('%g', 0.000099999)",
        "printf('%.10g', 3.14159265358979)", "printf('%.2g|%.2g', 1234.5, 0.000012345)",
        "printf('%#g|%#.3g', 1.0, 1.0)", "printf('%G', CAST('inf' AS DOUBLE))",
        "printf('%030.10g', 3.14)", "printf('%g', 123456.789)",
        # --- %a hex float
        "printf('%a|%A', 1.5, 1.5)", "printf('%a', 0.0)", "printf('%a', -2.0)",
        # --- positional, dynamic width/precision, escapes, nulls
        "printf('%2$s %1$s', 'world', 'hello')", "printf('%1$s %1$s', 'x')",
        "printf('%*d', 6, 42)", "printf('%.*f', 2, 3.14159)",
        "printf('%%|%d%%', 5)", "printf('abc')", "printf('')",
        "printf('%d', 1, 2)",
        "printf('%s', NULL) IS NULL", "printf(NULL, 5) IS NULL",
        "printf('%d', 1, NULL) IS NULL", "printf('%y', NULL) IS NULL",
        # --- format (fmt {}-spec)
        "format('{} {}', 'a', 1)", "format('{0} {0} {1}', 'x', 'y')",
        "format('{1} {0}', 'a', 'b')",
        "format('{:>8}|{:<8}|{:^8}|', 'hi', 'hi', 'hi')",
        "format('{:*^7}', 'ab')", "format('{:0>6}', 42)",
        "format('{:=8}', -42)", "format('{:010}', -42)",
        "format('{:5d}|{:05d}', 42, 42)", "format('{:10}', 42)",
        "format('{:+}|{:-}|{: }', 5, -5, 5)",
        "format('{:.2f}|{:06.2f}', 3.14159, 3.14159)",
        "format('{:08.3f}', -3.14159)", "format('{:.0f}|{:.0f}', 2.5, 3.5)",
        "format('{:e}|{:E}', 12345.678, 12345.678)",
        "format('{:e}', -123.456)", "format('{:g}', 1000000.0)",
        "format('{:g}', 0.00001234)", "format('{:10.4g}', 3.14159)",
        "format('{:.3}', 3.14159)", "format('{:.2s}', 'abcdef')",
        "format('{:5s}|', 'ab')", "format('{:5}|', true)",
        "format('{:x}|{:X}|{:b}|{:o}', 255, 255, 5, 8)",
        "format('{:x}', -1)", "format('{:x}', CAST(-1 AS BIGINT))",
        "format('{:#x}|{:#b}|{:#o}', 255, 5, 8)",
        "format('{:,}|{:,d}', 1234567, 1234567)",
        "format('{:d}', true)", "format('{:>{}}', 'x', 5)",
        "format('{:.{}f}', 3.14159, 3)", "format('{{}} {}', 1)",
        "format('{}', 1.5)", "format('{}', CAST(1.5 AS FLOAT))",
        "format('{}', 1e16)", "format('{}', 1e7)", "format('{}', 0.0001)",
        "format('{}', -0.0)", "format('{}', CAST('nan' AS DOUBLE))",
        "format('{:f}', CAST('nan' AS DOUBLE))",
        "format('{:+f}', CAST('inf' AS DOUBLE))",
        "format('{}', true)", "format('{}', DATE '2024-01-02')",
        "format('{}', TIMESTAMP '2024-01-02 03:04:05.5')",
        "format('{}', [1, 2])", "format('{}', 123456789.5)",
        "format('{}', NULL) IS NULL",
        # --- format_bytes (binary units, one decimal past KiB)
        "format_bytes(0)", "format_bytes(1023)", "format_bytes(1024)",
        "format_bytes(1536)", "format_bytes(-5)", "format_bytes(123456789)",
    ]
    # randomized cross-checks: width x precision x value for %f/%g/%e
    vals = ["3.14159", "-2.5", "0.0078125", "12345.675", "1e10"]
    for _ in range(12):
        spec = rng.choice(["f", "e", "g"])
        w = rng.choice(["", str(rng.randint(4, 14))])
        p = rng.choice(["", "." + str(rng.randint(0, 8))])
        fl = rng.choice(["", "-", "+", "0"])
        v = rng.choice(vals)
        exprs.append(f"printf('%{fl}{w}{p}{spec}', {v})")
    for _ in range(8):
        w = rng.choice(["", str(rng.randint(4, 10))])
        p = rng.choice(["", "." + str(rng.randint(1, 6))])
        t = rng.choice(["f", "g", "e", ""])
        al = rng.choice(["", "<", ">", "^"])
        exprs.append(f"format('{{:{al}{w}{p}{t}}}', {rng.choice(vals)})")
    return [(e, "scalar") for e in exprs]


def fam_likeglob(seed):
    """LIKE / ILIKE / GLOB / SIMILAR TO / like_escape family — the r16
    pattern-match barrage. DuckDB LIKE has NO default escape (backslash
    literal) where Spark's default escape IS backslash; GLOB is
    byte-wise; SIMILAR TO is a full-anchored POSIX regex."""
    exprs = [
        # LIKE basics + the no-default-escape divergence
        "'abc' LIKE 'a%'", "'abc' LIKE 'a_c'", "'abc' LIKE 'a__'",
        "'abc' LIKE '%'", "'' LIKE '%'", "'' LIKE '_'",
        "'abc' LIKE 'ABC'", "'abc' NOT LIKE 'A%'",
        r"'a\b' LIKE 'a\b'", r"'ab' LIKE 'a\b'",
        r"'a\c' LIKE 'a\_'", r"'a%c' LIKE 'a\%c'",
        r"'x\\y' LIKE 'x\\y'", r"'a\' LIKE '%\'",
        "'héllo' LIKE 'h_llo'", "'héllo' LIKE 'h__llo'",
        # explicit ESCAPE
        "'a%c' LIKE 'a!%c' ESCAPE '!'", "'axc' LIKE 'a!%c' ESCAPE '!'",
        "'a_c' LIKE 'a!_c' ESCAPE '!'", "'a!b' LIKE 'a!!b' ESCAPE '!'",
        "'abc' LIKE 'a%' ESCAPE NULL IS NULL",
        # ILIKE
        "'abc' ILIKE 'ABC'", "'ABC' ILIKE 'a_c'", "'abc' NOT ILIKE 'AB%'",
        "'a%c' ILIKE 'A!%C' ESCAPE '!'",
        # ~~ operator family
        "'abc' ~~ 'a%'", "'abc' !~~ 'a%'", "'abc' ~~* 'A%'", "'abc' !~~* 'A%'",
        # like_escape function family
        "like_escape('a%c', 'a$%c', '$')", "like_escape('axc', 'a$%c', '$')",
        "not_like_escape('axc', 'a$%c', '$')",
        "ilike_escape('A%c', 'a$%c', '$')", "not_ilike_escape('ABC', 'a_c', '$')",
        "like_escape('abc', 'ABC', '')",
        "like_escape('a%c', 'a$%c', NULL) IS NULL",
        "like_escape(NULL, 'a', '$') IS NULL",
        # GLOB: wildcards, classes, byte semantics
        "'main.c' GLOB '*.c'", "'main.c' GLOB '*.[ch]'", "'main.x' GLOB '*.[ch]'",
        "'main.c' GLOB 'm?in.c'", "'MAIN.C' GLOB '*.c'",
        "'abc' GLOB 'a[b-d]c'", "'abc' GLOB 'a[!b]c'", "'a-c' GLOB 'a[!b]c'",
        "'ab/cd' GLOB 'ab/*'", "'a/b' GLOB 'a?b'",
        "'' GLOB ''", "'' GLOB '*'", "'abc' GLOB ''",
        "'a]c' GLOB 'a]c'", "'abc' GLOB 'a]c'",
        "'abc' GLOB 'a[]b]c'", "'a]c' GLOB 'a[]b]c'",
        "'-' GLOB '[a-]'", "'b' GLOB '[a-]'", "'a[' GLOB 'a['",
        "'z' GLOB '[!a-y]'", "'Z' GLOB '[a-y]'",
        "'aXb' GLOB 'a*b*'", "'ab' GLOB 'a**b'", "'xaYbZ' GLOB '*a*b*'",
        "'héllo' GLOB 'h?llo'", "'héllo' GLOB 'h??llo'", "'héllo' GLOB 'h*llo'",
        r"'a*b' GLOB 'a\*b'", r"'axb' GLOB 'a\*b'", r"'ab' GLOB 'a\b'",
        "'[x]' GLOB '[[]x]'", "'!' GLOB '[!!]'", "'x' GLOB '[!!]'",
        "NULL GLOB 'a' IS NULL", "'a' GLOB NULL IS NULL",
        "(upper('main.c')) GLOB '*.C'",
        # SIMILAR TO: full-anchored regex, % is NOT a wildcard
        "'abc' SIMILAR TO 'a%'", "'a%' SIMILAR TO 'a%'",
        "'abc' SIMILAR TO 'a.c'", "'abc' SIMILAR TO 'a.*'",
        "'abc' SIMILAR TO '(a|b)bc'", "'abc' SIMILAR TO 'ab'",
        "'abc' NOT SIMILAR TO 'ab'", "'abc' SIMILAR TO 'AB.'",
        "'abc' SIMILAR TO 'a[bc]{2}'", "'aaa' SIMILAR TO 'a+'",
        r"'a1c' SIMILAR TO 'a\dc'",
        # pattern-shaped scans through columns (pushdown shapes)
        "SELECT count(*) FROM (VALUES ('alpha'),('beta'),('gamma'),('a%b')) "
        "t(s) WHERE s LIKE 'a%'",
        "SELECT count(*) FROM (VALUES ('alpha'),('beta'),('gamma'),('a%b')) "
        r"t(s) WHERE s LIKE 'a\%%'",
        "SELECT count(*) FROM (VALUES ('m.c'),('m.h'),('m.x'),('n.c')) "
        "t(s) WHERE s GLOB '*.[ch]'",
        "SELECT count(*) FROM (VALUES ('ab'),('aXb'),('b'),('ba')) "
        "t(s) WHERE s SIMILAR TO 'a.*b'",
    ]
    return [(e, "auto") for e in exprs]


def fam_unicase(seed):
    """r15: Unicode case/length/slicing edge semantics. DuckDB cases with
    utf8proc's SIMPLE 1:1 fold (upper('ß')='ẞ', lower('İ')='i',
    ligatures unchanged); length/substr/left/reverse are code-point
    based; ILIKE folds both sides simply."""
    zoo = ["ß", "ẞ", "İ", "ı", "ﬁ", "µ", "ſ", "ǆ", "Ǆ", "𐐨", "𐐀",
           "é", "ŉ", "Σς", "👍x👎", "a👨‍👩‍👧b", "ÄÖÜ", "straße"]
    exprs = []
    for z in zoo:
        exprs += [f"upper('{z}')", f"lower('{z}')", f"length('{z}')"]
    exprs += [
        "ucase('ß')", "lcase('İ')",
        "upper('the straße of İstanbul')",
        "lower('THE STRASSE OF İSTANBUL')",
        "strip_accents('éøñ')", "strip_accents('Ångström')",
        "reverse('a👍b')", "reverse('𐐨x')",
        "substr('👍👎👏', 2, 1)", "left('👍👎👏x', 2)", "right('x👍👎👏', 2)",
        "strlen('👍')", "strlen('é')",
        "instr('a👍b', 'b')", "strpos('𐐨x𐐀', 'x')",
        "'ẞ' ILIKE 'ß'", "'İ' ILIKE 'i'", "'ss' ILIKE 'ß'",
        "'STRASSE' ILIKE 'straße'", "'ÄB' ILIKE 'ä_'", "'𐐀x' ILIKE '𐐨_'",
        "'abc' ILIKE 'AB%'", "'abc' NOT ILIKE 'AB%'",
        "'a%c' ILIKE 'A!%C' ESCAPE '!'",
        "'aXc' NOT ILIKE 'A!%C' ESCAPE '!'",
        "upper('ß') = 'ẞ'", "length(upper('ß'))",
        "lower('İ') = 'i'", "length(lower('İ'))",
    ]
    return [(e, "scalar") for e in exprs]


def fam_mapdepth(seed):
    """r16: MAP function depth (VERDICT r15 residue 4 'map-function
    depth'). Measured DuckDB 1.0.0 semantics worth differential proof:
    subscript/map_extract/element_at return a LIST of matches ([] on
    miss, [] even on NULL map/key), map_concat is last-wins on key
    collision, map() duplicate keys ERROR, NULL keys ERROR, nested
    value types render through the {k=v} text form."""
    exprs = [
        # construction + render
        "CAST(map(['a','b'],[1,2]) AS VARCHAR)",
        "CAST(map() AS VARCHAR)",
        "CAST(map([2,1],['x','y']) AS VARCHAR)",
        "CAST(map([1.5,2.5],['a','b']) AS VARCHAR)",
        "CAST(map_from_entries([('a',1),('b',2)]) AS VARCHAR)",
        "CAST(map_from_entries([{'k': 'a', 'v': 1},{'k':'b','v':2}]) AS VARCHAR)",
        "CAST(map(NULL,NULL) AS VARCHAR)",
        # subscript / extract: LIST-of-matches semantics
        "CAST(map(['x','y'],[10,20])['x'] AS VARCHAR)",
        "CAST(map(['x','y'],[10,20])['z'] AS VARCHAR)",
        "CAST(map([1,2],['a','b'])[1] AS VARCHAR)",
        "CAST(map([1.5,2.5],['a','b'])[1.5] AS VARCHAR)",
        "CAST(map([[1,2]],['v'])[[1,2]] AS VARCHAR)",
        "CAST(map_extract(map(['x','y'],[10,20]),'x') AS VARCHAR)",
        "CAST(map_extract(map(['x','y'],[10,20]),'z') AS VARCHAR)",
        "CAST(element_at(map(['x','y'],[10,20]),'x') AS VARCHAR)",
        "CAST(map_extract(NULL::MAP(VARCHAR,INTEGER),'a') AS VARCHAR)",
        "CAST(map_extract(map(['a'],[1]), NULL) AS VARCHAR)",
        "CAST(element_at(map(['a'],[1]), NULL) AS VARCHAR)",
        "CAST((CAST(NULL AS MAP(VARCHAR,INTEGER)))['a'] AS VARCHAR)",
        "CAST(map(['a'],[NULL])['a'] AS VARCHAR)",
        # nested value types through extract
        "CAST(map(['k'],[[1,2,3]])['k'] AS VARCHAR)",
        "CAST(map(['k'],[map(['n'],[5])])['k'] AS VARCHAR)",
        "CAST(map(['k'],[{'a': 1, 'b': 'x'}])['k'] AS VARCHAR)",
        # keys / values / entries preserve insertion order
        "CAST(map_keys(map([2,1],['x','y'])) AS VARCHAR)",
        "CAST(map_values(map([2,1],['x','y'])) AS VARCHAR)",
        "CAST(map_entries(map(['a','b'],[1,2])) AS VARCHAR)",
        "CAST(map_keys(map()) AS VARCHAR)",
        "CAST(map_values(map()) AS VARCHAR)",
        "CAST(map_keys(NULL::MAP(VARCHAR,INTEGER)) AS VARCHAR)",
        # concat: last-wins, order = first-seen
        "CAST(map_concat(map(['a'],[1]), map(['b'],[2])) AS VARCHAR)",
        "CAST(map_concat(map(['a'],[1]), map(['a'],[2])) AS VARCHAR)",
        "CAST(map_concat(map(['a','b'],[1,2]), map(['b','c'],[9,3])) AS VARCHAR)",
        # cardinality
        "cardinality(map(['a','b'],[1,2]))",
        "cardinality(map())",
        "CAST(cardinality(NULL::MAP(VARCHAR,INTEGER)) AS VARCHAR)",
    ]
    return [(e, "scalar") for e in exprs]


def fam_listmath(seed):
    """r16: list vector-math + shape functions (the embedding-adjacent
    everyday surface). Measured DuckDB 1.0.0 edges: cosine of a zero
    vector is -1.0 (not NaN/error), length-mismatch ERRORS, list_zip
    pads with NULL, list_select is 1-based with NULL on out-of-range,
    grade_up sorts NULLS LAST, flatten skips NULL sublists,
    list_resize(x, NULL) is [] not NULL."""
    exprs = [
        "list_cosine_similarity([1.0,2.0],[2.0,4.0])",
        "list_cosine_similarity([1.0,0.0],[0.0,1.0])",
        "list_cosine_similarity([0.0,0.0],[1.0,1.0])",
        "list_cosine_similarity([3.0],[4.0])",
        "CAST(list_cosine_similarity([1.0,2.0],NULL) AS VARCHAR)",
        "list_dot_product([1.0,2.0],[3.0,4.0])",
        "list_inner_product([1,2],[3,4])",
        "list_dot_product([-1.5,2.5],[4.0,2.0])",
        "list_distance([1.0,2.0],[4.0,6.0])",
        "list_distance([1,2],[4,6])",
        "list_distance([2.5],[2.5])",
        "CAST(list_zip([1,2],['a','b','c']) AS VARCHAR)",
        "CAST(list_zip([1],[2],[3]) AS VARCHAR)",
        "CAST(list_zip([1,2],[],[3]) AS VARCHAR)",
        "CAST(list_zip([1,2]) AS VARCHAR)",
        "CAST(list_select([10,20,30],[3,1]) AS VARCHAR)",
        "CAST(list_select([10,20,30],[0]) AS VARCHAR)",
        "CAST(list_select([10,20,30],[4]) AS VARCHAR)",
        "CAST(list_select([10,20,30],[2,2]) AS VARCHAR)",
        "CAST(list_select([10,20,30],[]) AS VARCHAR)",
        "CAST(list_where([10,20,30],[true,false,true]) AS VARCHAR)",
        "CAST(list_where([10,20,30],[true,false]) AS VARCHAR)",
        "CAST(list_where([10,20],[false,false]) AS VARCHAR)",
        "CAST(list_where([10],[true,false,true]) AS VARCHAR)",
        "CAST(list_grade_up([3,1,2]) AS VARCHAR)",
        "CAST(list_grade_up([NULL,3,1]) AS VARCHAR)",
        "CAST(list_grade_up(['b','a','c']) AS VARCHAR)",
        "CAST(list_grade_up([]) AS VARCHAR)",
        "CAST(flatten([[1,2],[3]]) AS VARCHAR)",
        "CAST(flatten([[1],NULL,[2]]) AS VARCHAR)",
        "CAST(flatten([NULL]) AS VARCHAR)",
        "CAST(flatten([[]]) AS VARCHAR)",
        "CAST(list_resize([1,2],4) AS VARCHAR)",
        "CAST(list_resize([1,2],4,9) AS VARCHAR)",
        "CAST(list_resize([1,2],1) AS VARCHAR)",
        "CAST(list_resize([1,2],0) AS VARCHAR)",
        "CAST(list_resize([1,2],NULL) AS VARCHAR)",
        "CAST(list_resize(NULL,3) AS VARCHAR)",
        "list_has_any([1,2],[2,3])",
        "list_has_any([],[])",
        "list_has_any([1,NULL],[NULL])",
        "list_has_all([1,2,3],[2,3])",
        "list_has_all([1,2],[NULL])",
        "list_has_all([],[])",
        "list_has_all([2,3],[1,2,3])",
        "CAST(list_intersect([1,2,3],[2,3,4]) AS VARCHAR)",
        "CAST(list_intersect([1,NULL,2],[NULL,2]) AS VARCHAR)",
        "CAST(list_intersect([2,2,3],[2,2]) AS VARCHAR)",
        "CAST(list_intersect([],[1]) AS VARCHAR)",
        "CAST(list_intersect([2,3,2,4],[2,3,4]) AS VARCHAR)",
        "CAST(list_intersect([5,1,5,2],[1,2,5]) AS VARCHAR)",
        # NULL list arguments: measured asymmetries
        "list_cosine_similarity([0.0,0.0],[0.0,0.0])",
        "list_cosine_similarity([-1.0,-2.0],[1.0,2.0])",
        "CAST(list_zip(NULL) AS VARCHAR)",
        "CAST(list_zip([1],NULL) AS VARCHAR)",
        "CAST(list_intersect(NULL,[1]) AS VARCHAR)",
        "CAST(list_intersect([1],NULL) AS VARCHAR)",
        "CAST(list_select([1],NULL) AS VARCHAR)",
        "CAST(list_where([1],NULL) AS VARCHAR)",
        "CAST(list_has_any(NULL,[1]) AS VARCHAR)",
        "CAST(list_has_all([1],NULL) AS VARCHAR)",
        "list_has_all([NULL],[NULL])",
        "CAST(list_grade_up(NULL) AS VARCHAR)",
        "CAST(flatten(NULL) AS VARCHAR)",
    ]
    return [(e, "scalar") for e in exprs]


def fam_slice(seed):
    """r18: bracket indexing + slicing depth over lists, strings, maps,
    structs. Measured DuckDB 1.0.0 edges: 1-based indexing with [0] and
    out-of-range -> NULL (lists) / '' (strings); negative indexes count
    from the end; slice END is INCLUSIVE; a negative slice END means
    "from the end" but asymmetrically — list[:-1] keeps ALL elements
    while 'hello'[:-2] drops one; [4:5] past the end and inverted [2:1]
    give []/''; start 0 clamps to 1; steps need all three parts
    ([1:5:2], no [::2]); map[k] returns a LIST (empty when missing);
    NULL anywhere in the bracket -> NULL."""
    exprs = [
        # list element extraction
        "([10,20,30])[1]", "([10,20,30])[3]", "([10,20,30])[-1]",
        "CAST(([10,20,30])[0] AS VARCHAR)", "CAST(([10,20,30])[4] AS VARCHAR)",
        "CAST(([10,20,30])[-4] AS VARCHAR)", "CAST(([1,2])[NULL] AS VARCHAR)",
        "list_extract([10,20],-1)", "list_extract([10,20],2)",
        "CAST(list_extract([10,20],0) AS VARCHAR)",
        # list slices (inclusive end, 1-based, 0-start clamp)
        "CAST(([10,20,30])[1:2] AS VARCHAR)", "CAST(([10,20,30])[2:] AS VARCHAR)",
        "CAST(([10,20,30])[:2] AS VARCHAR)", "CAST(([10,20,30])[2:2] AS VARCHAR)",
        "CAST(([10,20,30])[-2:] AS VARCHAR)", "CAST(([10,20,30])[:-1] AS VARCHAR)",
        "CAST(([10,20,30])[:-2] AS VARCHAR)", "CAST(([10,20,30])[4:5] AS VARCHAR)",
        "CAST(([10,20,30])[2:1] AS VARCHAR)", "CAST(([10,20,30])[0:2] AS VARCHAR)",
        "CAST(([10,20,30])[-5:-2] AS VARCHAR)", "CAST(([10,20,30])[-1:-1] AS VARCHAR)",
        "CAST(([1,2])[NULL:2] AS VARCHAR)", "CAST(([1,2])[1:NULL] AS VARCHAR)",
        "CAST(([1,2,3])[:] AS VARCHAR)",
        # stepped slices (three-part only) + list_slice function form
        "CAST(([1,2,3,4,5])[1:5:2] AS VARCHAR)", "CAST(([1,2,3,4,5])[2:5:3] AS VARCHAR)",
        "CAST(([1,2,3,4,5])[5:1:1] AS VARCHAR)", "CAST(([1,2,3,4,5])[1:-1:2] AS VARCHAR)",
        "CAST(list_slice([1,2,3,4,5],1,4,2) AS VARCHAR)",
        "CAST(list_slice([1,2,3],2,3) AS VARCHAR)",
        "CAST(list_slice([1,2,3],NULL,2) AS VARCHAR)",
        # string indexing / slicing
        "'hello'[2]", "'hello'[-2]", "'hello'[0]", "'hello'[7]",
        "'hello'[2:4]", "'hello'[-3:]", "'hello'[:0]", "'hello'[3:]",
        "'hello'[:-2]", "'hello'[2:2]", "'hello'[4:2]", "'hello'[-5:-4]",
        "CAST('hello'[NULL] AS VARCHAR)", "array_extract('hello',2)",
        "''[1]",
        # nested chains
        "([[1,2],[3]])[1][2]", "([[1,2],[3]])[2][1]",
        "CAST(([[1,2],[3]])[1] AS VARCHAR)",
        "CAST(([[1,2],[3,4]])[2][1:2] AS VARCHAR)",
        "CAST({'a':[1,2,3]}.a[2] AS VARCHAR)",
        "CAST({'a':{'b':7}}.a.b AS VARCHAR)",
        "CAST(struct_extract({'a':5,'b':6},'b') AS VARCHAR)",
        "'hello world'[1:5][2]",
        # map bracket extraction returns a LIST
        "CAST(map([1,2],[10,20])[1] AS VARCHAR)",
        "CAST(map([1,2],[10,20])[3] AS VARCHAR)",
        "CAST(map(['k'],['v'])['k'] AS VARCHAR)",
        "CAST(element_at(map([1,2],[10,20]),2) AS VARCHAR)",
        # subquery / expression receivers
        "CAST((SELECT x FROM (VALUES ([1,2,3])) t(x))[2] AS VARCHAR)",
        "CAST(list_append([1,2],3)[3] AS VARCHAR)",
        "CAST(('ab' || 'cd')[2:3] AS VARCHAR)",
    ]
    return [(e, "scalar") for e in exprs]


def fam_lambda(seed):
    """r18: lambda functions + list aggregation dispatch. Measured
    DuckDB 1.0.0 edges: index lambda parameters are 1-BASED in
    list_transform/list_filter (Spark's are 0-based — silent off-by-one
    without the rewrite); list_reduce seeds with element 1 (errors on
    empty; a 3-param lambda carries the 1-based merge-step counter);
    list_aggregate dispatches on the aggregate NAME with string_agg
    joining non-NULLs (default sep ','); list_product is a NULL-skipping
    DOUBLE fold answering NULL for empty; aliases apply/list_apply/
    filter/array_*/list_aggr/reduce all share the semantics."""
    exprs = [
        "CAST(list_transform([1,2,3], x -> x * 2) AS VARCHAR)",
        "CAST(list_transform(['a','b'], (x, i) -> x || CAST(i AS VARCHAR)) AS VARCHAR)",
        "CAST(list_transform([10,20], (x, i) -> x + i) AS VARCHAR)",
        "CAST(list_transform([1,2], (x, i) -> i) AS VARCHAR)",
        "CAST(list_filter([1,2,3,4], x -> x % 2 = 0) AS VARCHAR)",
        "CAST(list_filter([1,2,3,4], (x, i) -> i <= 2) AS VARCHAR)",
        "CAST(list_filter([10,20,30], (x, i) -> i % 2 = 1) AS VARCHAR)",
        "CAST(list_transform([1,NULL,3], x -> x + 1) AS VARCHAR)",
        "CAST(list_filter([1,NULL,3], x -> x > 1) AS VARCHAR)",
        "CAST(list_transform([[1,2],[3]], l -> list_transform(l, x -> x + 10)) AS VARCHAR)",
        "CAST(list_transform([1,2], x -> [x, x*2]) AS VARCHAR)",
        "CAST(list_transform([1,2], x -> CASE WHEN x = 1 THEN 'one' ELSE 'two' END) AS VARCHAR)",
        "CAST((SELECT list_transform([1,2], x -> x + y) FROM (SELECT 100 AS y)) AS VARCHAR)",
        "CAST(list_reduce([1,2,3,4], (a, b) -> a + b) AS VARCHAR)",
        "CAST(list_reduce([1], (a, b) -> a + b) AS VARCHAR)",
        "CAST(list_reduce(['a','b','c'], (x, y) -> concat(x, y)) AS VARCHAR)",
        "CAST(list_reduce([1,2,3], (a, b, i) -> a + b * i) AS VARCHAR)",
        "CAST(list_reduce([5,10,20], (a, b, i) -> a + b + i) AS VARCHAR)",
        "CAST(list_aggregate([1,2,3], 'sum') AS VARCHAR)",
        "CAST(list_aggregate([1,2,NULL], 'count') AS VARCHAR)",
        "CAST(list_aggregate(['b','a'], 'min') AS VARCHAR)",
        "CAST(list_aggregate([1,2,3], 'avg') AS VARCHAR)",
        "CAST(list_aggregate([1,5,3], 'first') AS VARCHAR)",
        "CAST(list_aggregate([1,5,3], 'last') AS VARCHAR)",
        "CAST(list_aggregate([1,2,3], 'string_agg', '-') AS VARCHAR)",
        "CAST(list_aggregate([1,NULL,3], 'string_agg', '-') AS VARCHAR)",
        "CAST(list_aggregate(['x','y'], 'string_agg') AS VARCHAR)",
        "CAST(list_aggregate([2,3], 'product') AS VARCHAR)",
        "CAST(list_aggregate([1,NULL], 'sum') AS VARCHAR)",
        "CAST(list_aggr([1,2,3], 'max') AS VARCHAR)",
        "CAST(list_sum([1,2,NULL]) AS VARCHAR)",
        "CAST(list_sum([]::INT[]) AS VARCHAR)",
        "CAST(list_avg([1,2,3]) AS VARCHAR)",
        "CAST(list_count([1,NULL]) AS VARCHAR)",
        "CAST(list_count([]::INT[]) AS VARCHAR)",
        "CAST(list_count(NULL::INT[]) AS VARCHAR)",
        "CAST(list_product([2,3,4]) AS VARCHAR)",
        "CAST(list_product([2,NULL,4]) AS VARCHAR)",
        "CAST(list_product([]::INT[]) AS VARCHAR)",
        "CAST(list_unique([1,2,2,NULL]) AS VARCHAR)",
        "CAST(list_any_value([NULL,2,3]) AS VARCHAR)",
        "CAST(filter([1,2,3], x -> x > 1) AS VARCHAR)",
        "CAST(apply([1,2], x -> -x) AS VARCHAR)",
        "CAST(list_apply([1,2], x -> x+1) AS VARCHAR)",
        "CAST(array_transform([1,2], x -> x+1) AS VARCHAR)",
        "CAST(array_filter([1,2], x -> x>1) AS VARCHAR)",
        "CAST(array_reduce([1,2], (a,b) -> a+b) AS VARCHAR)",
        "CAST(reduce([1,2,3], (a,b) -> a+b) AS VARCHAR)",
        "CAST(filter(['aa','b'], s -> length(s) > 1) AS VARCHAR)",
        "CAST(list_transform([1,2,3], x -> x + list_aggregate([1,1], 'sum')) AS VARCHAR)",
    ]
    return [(e, "scalar") for e in exprs]


def fam_tvf(seed):
    """r18: table-valued functions + SELECT-position unnest depth.
    Measured DuckDB 1.0.0 edges: multiple unnests in one select ZIP in
    lockstep padding with NULL (NOT a cartesian product); scalars
    repeat; unnest(recursive:=true) flattens all list levels keeping
    NULL leaves but skipping NULL sublists; unnest(struct) expands to
    columns; range() is half-open (select-position list and FROM rows),
    generate_series inclusive; DATE bounds + INTERVAL step answer
    TIMESTAMPs; crossed directions are loud binder errors."""
    exprs = [
        # multi-unnest zip + pad
        ("SELECT CAST(a AS VARCHAR) || '|' || coalesce(CAST(b AS VARCHAR),'None') AS v FROM (SELECT unnest([1,2]) AS a, unnest([10,20]) AS b) ORDER BY 1", "query"),
        ("SELECT coalesce(CAST(a AS VARCHAR),'None') || '|' || CAST(b AS VARCHAR) AS v FROM (SELECT unnest([1,2]) AS a, unnest([10,20,30]) AS b) ORDER BY 1", "query"),
        ("SELECT coalesce(CAST(a AS VARCHAR),'N') || coalesce(CAST(b AS VARCHAR),'N') || coalesce(CAST(c AS VARCHAR),'N') AS v FROM (SELECT unnest([1]) AS a, unnest([2,3]) AS b, unnest([4,5,6]) AS c) ORDER BY 1", "query"),
        ("SELECT CAST(a AS VARCHAR) || b AS v FROM (SELECT unnest([1,2,3]) AS a, 'x' AS b) ORDER BY 1", "query"),
        ("SELECT CAST(x + y AS VARCHAR) AS v FROM (SELECT unnest([1,2]) AS x, unnest([10,20]) AS y) ORDER BY 1", "query"),
        # expression-nested unnest
        ("SELECT CAST(unnest([1,2]) + 5 AS VARCHAR) AS v", "query"),
        ("SELECT upper(unnest(['a','b'])) AS v", "query"),
        # nested lists, recursive flatten
        ("SELECT CAST(unnest([[1,2],[3]]) AS VARCHAR) AS v", "query"),
        ("SELECT CAST(unnest([[1,2],[3]], recursive:=true) AS VARCHAR) AS v", "query"),
        ("SELECT coalesce(CAST(unnest([[1,NULL],[3]], recursive:=true) AS VARCHAR),'None') AS v", "query"),
        ("SELECT CAST(unnest([[1,2],NULL,[3]], recursive:=true) AS VARCHAR) AS v", "query"),
        ("SELECT CAST(unnest([[[1],[2]],[[3]]], recursive:=true) AS VARCHAR) AS v", "query"),
        ("SELECT CAST(unnest([1,2], recursive:=true) AS VARCHAR) AS v", "query"),
        ("SELECT CAST(unnest([4,5], recursive:=false) AS VARCHAR) AS v", "query"),
        # struct unnest expands columns (fixture reads column 0)
        ("SELECT unnest({'a':7,'b':8})", "query"),
        # empty / NULL
        ("SELECT CAST(unnest(NULL::INT[]) AS VARCHAR) AS v", "query"),
        ("SELECT CAST(unnest([]::INT[]) AS VARCHAR) AS v", "query"),
        # FROM-position series
        ("SELECT CAST(generate_series AS VARCHAR) AS v FROM generate_series(1, 10, 3)", "query"),
        ("SELECT CAST(generate_series AS VARCHAR) AS v FROM generate_series(5, 1, -2)", "query"),
        ("SELECT CAST(generate_series AS VARCHAR) AS v FROM generate_series(1, 5)", "query"),
        ("SELECT CAST(range AS VARCHAR) AS v FROM range(1, 5)", "query"),
        ("SELECT CAST(range AS VARCHAR) AS v FROM range(5)", "query"),
        ("SELECT CAST(range AS VARCHAR) AS v FROM range(7, 2, -2)", "query"),
        ("SELECT CAST(range AS VARCHAR) AS v FROM range(DATE '2024-01-01', DATE '2024-01-04', INTERVAL 1 DAY)", "query"),
        ("SELECT CAST(range AS VARCHAR) AS v FROM range(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-01', INTERVAL 1 DAY)", "query"),
        ("SELECT CAST(generate_series AS VARCHAR) AS v FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-02', INTERVAL 12 HOUR)", "query"),
        ("SELECT CAST(generate_series AS VARCHAR) AS v FROM generate_series(DATE '2024-01-01', DATE '2024-01-03', INTERVAL 1 DAY)", "query"),
        ("SELECT CAST(generate_series AS VARCHAR) AS v FROM generate_series(TIMESTAMP '2024-03-31', TIMESTAMP '2024-06-30', INTERVAL 1 MONTH)", "query"),
        ("SELECT CAST(z AS VARCHAR) AS v FROM range(3) t(z)", "query"),
        ("SELECT CAST(g * 2 AS VARCHAR) AS v FROM generate_series(1, 3) t(g)", "query"),
        # select-position lists
        ("SELECT CAST(generate_series(1, 4) AS VARCHAR) AS v", "query"),
        ("SELECT CAST(range(1, 4) AS VARCHAR) AS v", "query"),
        ("SELECT CAST(range(4) AS VARCHAR) AS v", "query"),
        ("SELECT CAST(range(1, 10, 4) AS VARCHAR) AS v", "query"),
        ("SELECT CAST(range(8, 1, -3) AS VARCHAR) AS v", "query"),
        ("SELECT CAST(range(3, 3) AS VARCHAR) AS v", "query"),
        ("SELECT coalesce(CAST(generate_series(1, 3, NULL) AS VARCHAR),'None') AS v", "query"),
        ("SELECT coalesce(CAST(range(NULL, 5) AS VARCHAR),'None') AS v", "query"),
        ("SELECT CAST(unnest(generate_series(1,3)) AS VARCHAR) AS v", "query"),
        ("SELECT CAST(unnest(range(1,4)) AS VARCHAR) AS v", "query"),
        # composition
        ("SELECT CAST(a.x AS VARCHAR) AS v FROM (SELECT unnest([1,2]) AS x) a WHERE a.x > 1", "query"),
        ("SELECT CAST(sum(x) AS VARCHAR) AS v FROM (SELECT unnest([1,2,3]) AS x)", "query"),
        ("SELECT CAST(range AS VARCHAR) AS v FROM range(1, 20, 5) WHERE range > 5", "query"),
    ]
    return exprs


def fam_windepth(seed):
    """r16: window-function depth beyond the r12 window family —
    EXCLUDE CURRENT ROW / GROUP / TIES frames, aggregates-as-window
    (string_agg running concat, mode, arg_max, list, quantile_cont,
    product, bit_xor), lag with an explicit default, lead over a DESC
    order. IGNORE NULLS and GROUPS frames are NOT DuckDB-1.0 surface
    (its parser refuses both) so they stay loud on both engines."""
    exprs = [
        "sum(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)",
        "sum(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP)",
        "sum(v) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES)",
        "sum(v) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE NO OTHERS)",
        "min(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)",
        "count(*) OVER (PARTITION BY g ORDER BY v RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP)",
        "string_agg(CAST(v AS VARCHAR), ',') OVER (PARTITION BY g ORDER BY id)",
        # least(v, 6): mode over an all-singleton group ties and DuckDB
        # tie-breaks by ITS scan order — not reproducible
        "mode(least(v, 6)) OVER (PARTITION BY g)",
        "arg_max(id, v) OVER (PARTITION BY g)",
        "CAST(list(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS VARCHAR)",
        "quantile_cont(v, 0.5) OVER (PARTITION BY g)",
        "quantile_disc(v, 0.25) OVER (PARTITION BY g ORDER BY id)",
        "product(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)",
        "bit_xor(v) OVER (PARTITION BY g ORDER BY id)",
        "bool_or(v > 7) OVER (PARTITION BY g ORDER BY id)",
        "lag(v, 2, -1) OVER (PARTITION BY g ORDER BY id)",
        "lead(v) OVER (PARTITION BY g ORDER BY id DESC)",
        "lag(v) OVER (ORDER BY id)",
        "row_number() OVER (ORDER BY id)",
        "first(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)",
        "last(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING)",
        "any_value(v) OVER (PARTITION BY g ORDER BY id)",
    ]
    return [(e, "window") for e in exprs]


def fam_aggdepth(seed):
    """r16: aggregate-function depth beyond the r12 agg family —
    list-arg quantiles (DECIMAL-preserving per element), the ordered-set
    WITHIN GROUP spellings, Kahan float sums, DISTINCT forms, in-call
    ORDER BY on order-sensitive aggregates (list/first/last), the full
    regr_* set, sem, and bounded bitstring_agg. approx_quantile /
    reservoir_quantile are excluded (approximate/PRNG);
    string_agg(DISTINCT ...) is excluded (DuckDB hash-orders it)."""
    exprs = [
        "quantile_cont(i, [0.25, 0.5, 0.75])",
        "quantile_disc(i, [0.25, 0.75])",
        "quantile_cont(d, [0.1, 0.9])",
        "quantile(i, 0.5)",
        "fsum(d)", "favg(d)", "kahan_sum(d)", "sumkahan(d)",
        "sum(DISTINCT i)", "avg(DISTINCT i)", "count(DISTINCT i)",
        "list(i ORDER BY i DESC)", "list(d ORDER BY id)",
        "array_agg(i ORDER BY i)",
        "first(i ORDER BY d)", "last(i ORDER BY d)",
        "any_value(i)",
        "regr_count(d, i)", "regr_avgx(d, i)", "regr_avgy(d, i)",
        "regr_sxx(d, i)", "regr_syy(d, i)", "regr_sxy(d, i)",
        "sem(i)", "var_pop(i)", "covar_samp(i, d)",
        "mode() WITHIN GROUP (ORDER BY i)",
        "percentile_cont(0.5) WITHIN GROUP (ORDER BY i)",
        "percentile_cont([0.25, 0.75]) WITHIN GROUP (ORDER BY i)",
        "percentile_disc(0.25) WITHIN GROUP (ORDER BY i)",
        "bitstring_agg(i, -5, 20)",
        "bit_count(bitstring_agg(i, -5, 20))",
        "min(id) FILTER (i > 10)",
        "histogram(i // 10)",
        "max(g || CAST(i AS VARCHAR))",
        "count(*) FILTER (d < 0)",
        "arg_max(i, d)", "arg_min(d, i)",
    ]
    return [(e, "agg") for e in exprs]



def fam_winspec(seed):
    """r18: window-spec depth 2 (VERDICT r17 task 6a) — named-window
    SCOPING (per SELECT, per set-op branch, subquery invisibility),
    one-level inheritance (a copied window contributes only its OWN
    clauses; the grandparent is dropped — measured DuckDB 1.0.0),
    OVER (w) copy vs bare OVER w distinction, self/cyclic/forward refs,
    unused bad defs staying silent, EXCLUDE frames through inheritance,
    and RANGE frames with offsets over DATE/TIMESTAMP/DECIMAL keys."""
    t = "(VALUES (1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'b', 40), (5, 'a', 50), (6, 'b', 60)) t(id, g, v)"
    d = ("(VALUES (1, DATE '2024-01-01'), (2, DATE '2024-01-02'), "
         "(3, DATE '2024-01-04'), (4, DATE '2024-01-08'), (5, DATE '2024-01-09')) t(id, d)")
    ts = ("(VALUES (1, TIMESTAMP '2024-01-01 00:00:00'), (2, TIMESTAMP '2024-01-01 01:30:00'), "
          "(3, TIMESTAMP '2024-01-01 05:00:00'), (4, TIMESTAMP '2024-01-01 05:45:00')) t(id, ts)")
    dec = ("(VALUES (1, CAST('1.10' AS DECIMAL(8,2))), (2, CAST('1.25' AS DECIMAL(8,2))), "
           "(3, CAST('2.00' AS DECIMAL(8,2))), (4, CAST('2.05' AS DECIMAL(8,2))), "
           "(5, CAST('9.99' AS DECIMAL(8,2)))) t(id, k)")

    def row(expr, frm, win=""):
        w = (" WINDOW " + win) if win else ""
        return (f"SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(({expr}) AS VARCHAR), 'None') "
                f"FROM {frm}{w} ORDER BY 1")

    qs = [
        # --- inheritance basics: extension merges own clauses + tail
        row("sum(v) OVER (w ROWS UNBOUNDED PRECEDING)", t, "w AS (PARTITION BY g ORDER BY id)"),
        row("sum(v) OVER (w ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)", t, "w AS (ORDER BY id)"),
        row("sum(v) OVER (w ORDER BY id ROWS UNBOUNDED PRECEDING)", t, "w AS (PARTITION BY g)"),
        # child may ADD a partition when the base has only ORDER BY
        row("sum(v) OVER (w PARTITION BY g)", t, "w AS (ORDER BY id)"),
        # def-level inheritance, bare use: base's own + own
        row("sum(v) OVER w2", t, "w1 AS (PARTITION BY g), w2 AS (w1 ORDER BY id)"),
        row("sum(v) OVER w2", t, "w1 AS (PARTITION BY g), w2 AS (w1 ORDER BY id ROWS UNBOUNDED PRECEDING)"),
        # ONE-LEVEL copy: the grandparent's PARTITION BY is dropped
        row("sum(v) OVER (w2 ROWS UNBOUNDED PRECEDING)", t, "w1 AS (PARTITION BY g), w2 AS (w1 ORDER BY id)"),
        row("sum(v) OVER w3", t, "w1 AS (PARTITION BY g), w2 AS (w1 ORDER BY id), w3 AS (w2)"),
        row("sum(v) OVER w3", t, "w1 AS (PARTITION BY g), w2 AS (w1 ORDER BY id), w3 AS (w2 ROWS UNBOUNDED PRECEDING)"),
        # OVER (w) copies own clauses only; bare OVER w is the full def
        row("sum(v) OVER (w2)", t, "w1 AS (PARTITION BY g), w2 AS (w1 ORDER BY id)"),
        # forward references resolve (defs bind as a set)
        row("sum(v) OVER w2", t, "w2 AS (w1 ORDER BY id), w1 AS (PARTITION BY g)"),
        row("sum(v) OVER (w3 ROWS UNBOUNDED PRECEDING)", t, "w3 AS (w2), w2 AS (w1 ORDER BY id), w1 AS (PARTITION BY g)"),
        # self-reference is an identity copy; cycles stop at one level
        row("sum(v) OVER w", t, "w AS (w ORDER BY id)"),
        row("first_value(v) OVER w", t, "w AS (w ORDER BY id DESC)"),
        row("sum(v) OVER w1", t, "w1 AS (w2 ORDER BY id), w2 AS (w1 PARTITION BY g)"),
        # unknown base inside a COPIED def drops silently; unused bad defs never bind
        row("sum(v) OVER (w2 ROWS UNBOUNDED PRECEDING)", t, "w2 AS (zzz ORDER BY id)"),
        row("sum(v) OVER w2", t, "w1 AS (zzz), w2 AS (w1 ORDER BY id)"),
        row("sum(v) OVER w", t, "w AS (ORDER BY id), unused AS (nope ORDER BY id)"),
        # quoted window names
        row('sum(v) OVER ("my win" ROWS UNBOUNDED PRECEDING)', t, '"my win" AS (ORDER BY id)'),
        # several functions over one named window
        row("CAST(rank() OVER w AS VARCHAR) || '/' || CAST(sum(v) OVER w AS VARCHAR)", t,
            "w AS (PARTITION BY g ORDER BY v)"),
        row("lead(v, 1) OVER w", t, "w AS (PARTITION BY g ORDER BY id)"),
        row("lag(v, 1, -1) OVER w", t, "w AS (PARTITION BY g ORDER BY id)"),
        row("row_number() OVER (w)", t, "w AS (PARTITION BY g ORDER BY v DESC)"),
        row("ntile(2) OVER w", t, "w AS (ORDER BY id)"),
        # --- scoping: a subquery's clause is its own; outer same name differs
        (f"SELECT CAST(id AS VARCHAR) || '=' || CAST(a AS VARCHAR) || '/' || CAST(sum(a) OVER w AS VARCHAR) "
         f"FROM (SELECT id, sum(v) OVER (w ROWS UNBOUNDED PRECEDING) AS a FROM {t} WINDOW w AS (ORDER BY id)) q "
         f"WINDOW w AS (ORDER BY a DESC) ORDER BY 1"),
        # sibling subqueries, each with its own clause
        (f"SELECT CAST(q.id AS VARCHAR) || '=' || CAST(q.a AS VARCHAR) || '/' || CAST(r.b AS VARCHAR) "
         f"FROM (SELECT id, sum(v) OVER (w ROWS UNBOUNDED PRECEDING) AS a FROM {t} WINDOW w AS (ORDER BY id)) q, "
         f"(SELECT max(v) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS b FROM {t} "
         f"WINDOW w AS (ORDER BY id) LIMIT 1) r ORDER BY 1"),
        # set-op branches: one WINDOW clause each (same NAME in two
        # branches is "already defined" in DuckDB — pinned in R18EdgeSpec)
        (f"SELECT CAST(sum(v) OVER (w ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS s FROM {t} WINDOW w AS (ORDER BY id) "
         f"UNION ALL SELECT CAST(sum(v) OVER (w2 ROWS UNBOUNDED PRECEDING) AS VARCHAR) FROM {t} "
         f"WINDOW w2 AS (ORDER BY id DESC) ORDER BY 1"),
        # CTE body carries its own clause, outer query its own
        (f"WITH c AS (SELECT id, g, v, sum(v) OVER (w ROWS UNBOUNDED PRECEDING) AS a FROM {t} "
         f"WINDOW w AS (ORDER BY id)) "
         f"SELECT CAST(id AS VARCHAR) || '=' || CAST(a AS VARCHAR) || '/' || "
         f"CAST(sum(v) OVER (w ROWS UNBOUNDED PRECEDING) AS VARCHAR) FROM c "
         f"WINDOW w AS (PARTITION BY g ORDER BY id) ORDER BY 1"),
        # --- EXCLUDE through inheritance
        row("sum(v) OVER (w ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)", t,
            "w AS (ORDER BY id)"),
        row("sum(v) OVER (w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP)", t,
            "w AS (PARTITION BY g ORDER BY v)"),
        row("sum(v) OVER (w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES)", t,
            "w AS (ORDER BY g)"),
        row("sum(v) OVER w2", t,
            "w1 AS (PARTITION BY g ORDER BY id), w2 AS (w1 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)"),
        # --- RANGE frames with offsets, inherited and direct
        row("sum(v) OVER (w RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)", t, "w AS (ORDER BY id)"),
        row("sum(v) OVER (w RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)", t, "w AS (PARTITION BY g ORDER BY v)"),
        row("count(*) OVER (w RANGE BETWEEN INTERVAL 2 DAY PRECEDING AND CURRENT ROW)", d, "w AS (ORDER BY d)"),
        row("sum(id) OVER (w RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND INTERVAL 1 DAY FOLLOWING)", d,
            "w AS (ORDER BY d)"),
        row("count(*) OVER (w RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW)", ts, "w AS (ORDER BY ts)"),
        row("sum(id) OVER (w RANGE BETWEEN INTERVAL 90 MINUTE PRECEDING AND INTERVAL 30 MINUTE FOLLOWING)", ts,
            "w AS (ORDER BY ts)"),
        row("count(*) OVER (w RANGE BETWEEN 0.20 PRECEDING AND 0.20 FOLLOWING)", dec, "w AS (ORDER BY k)"),
        row("sum(id) OVER (w2 RANGE BETWEEN 1.00 PRECEDING AND CURRENT ROW)", dec,
            "w1 AS (PARTITION BY 1), w2 AS (w1 ORDER BY k)"),
        row("min(k) OVER (w RANGE BETWEEN CURRENT ROW AND 5.00 FOLLOWING)", dec, "w AS (ORDER BY k)"),
        # RANGE DESC order keys with offsets
        row("sum(v) OVER (w RANGE BETWEEN 15 PRECEDING AND CURRENT ROW)", t, "w AS (ORDER BY v DESC)"),
        row("count(*) OVER (w RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)", d, "w AS (ORDER BY d DESC)"),
        # frame-in-def used bare after inheritance
        row("first_value(v) OVER w2", t,
            "w1 AS (PARTITION BY g), w2 AS (w1 ORDER BY v DESC ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)"),
        row("nth_value(v, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)", t,
            "w AS (PARTITION BY g ORDER BY id)"),
    ]
    return [(q, "query") for q in qs]



def fam_nestord(seed):
    """r19: nested-type ORDERING (VERDICT r18 task 4). Measured DuckDB
    1.0.0 rules: NULL elements/fields sort LARGEST ([1,2] < [1,NULL],
    [2] < [NULL]; Spark's ordering puts inner NULLs smallest — silently
    different row order AND top-k membership); lists compare
    lexicographically with a strict prefix first (['a'] < ['a',NULL] <
    ['ab']); structs compare by FIELD POSITION; doubles order values <
    NaN < NULL; min/max aggregates and list_min/list_max follow the same
    order (max over {[1],[NULL],[1,2]} = [NULL]) while SKIPPING NULLs;
    list_sort places inner NULLs largest; GROUP BY/DISTINCT treat equal
    nested values (incl. NULL elements) as one group."""
    LN = ("(VALUES ([1,NULL]),([1,2]),([1]),([NULL]),([2]),(NULL),"
          "([0])) t(x)")
    LS = ("(VALUES ([{'a':1,'b':2}]),([{'a':1,'b':NULL}]),"
          "([{'a':NULL,'b':0}]),([{'a':1,'b':2},{'a':0,'b':0}]),(NULL),"
          "([{'a':2,'b':0}])) t(x)")
    ST = ("(VALUES ({'s':'a','n':1}),({'s':'a','n':NULL}),"
          "({'s':NULL,'n':0}),({'s':'ab','n':0}),(NULL),"
          "({'s':'b','n':NULL})) t(x)")
    SS = ("(VALUES (['a']),(['ab']),(['a',NULL]),([NULL]),(['b']),"
          "(['a','b'])) t(x)")
    LL = ("(VALUES ([[1],[2]]),([[1,NULL]]),([[1],NULL]),([[1]]),"
          "([NULL]),([[2]])) t(x)")
    DBL = ("(VALUES ([1.5]),(['NaN'::DOUBLE]),(['Infinity'::DOUBLE]),"
           "(['-Infinity'::DOUBLE]),([-1.0]),([NULL::DOUBLE])) t(x)")
    BOOL = "(VALUES ([true]),([false]),([NULL::BOOLEAN]),([true,false])) t(x)"
    DT = ("(VALUES ([DATE '2024-01-02']),([DATE '2024-01-01',NULL]),"
          "([NULL::DATE]),([DATE '2024-01-01'])) t(x)")
    DEC = ("(VALUES ([1.25::DECIMAL(9,2)]),([NULL::DECIMAL(9,2)]),"
           "([1.30::DECIMAL(9,2)]),([0.99::DECIMAL(9,2),NULL])) t(x)")
    G = ("(VALUES ([1,NULL]),([1,NULL]),([1]),(NULL),(NULL),([NULL]),"
         "([1])) t(x)")
    GS = ("(VALUES ({'a':NULL}),({'a':NULL}),({'a':1}),({'a':1}),"
          "({'a':2})) t(x)")
    def ob(tbl, order="x"):
        return (f"SELECT CAST(x AS VARCHAR) AS v FROM {tbl} ORDER BY "
                f"{order}")
    qs = [
        # ORDER BY list with inner NULLs, both directions + NULLS FIRST
        ob(LN), ob(LN, "x DESC"), ob(LN, "x ASC NULLS FIRST"),
        ob(LN, "x DESC NULLS FIRST"),
        # list-of-struct / struct / strings-in-lists / list-of-list
        ob(LS), ob(LS, "x DESC"),
        ob(ST), ob(ST, "x DESC"),
        ob(SS), ob(SS, "x DESC"),
        ob(LL), ob(LL, "x DESC"),
        # doubles NaN/inf, bools, dates, decimals inside lists
        ob(DBL), ob(DBL, "x DESC"),
        ob(BOOL), ob(DT), ob(DEC),
        # top-k membership through LIMIT
        f"SELECT CAST(x AS VARCHAR) AS v FROM {LN} ORDER BY x LIMIT 3",
        f"SELECT CAST(x AS VARCHAR) AS v FROM {SS} ORDER BY x DESC LIMIT 2",
        # GROUP BY / DISTINCT on nested keys (NULL elements equal)
        (f"SELECT CAST(x AS VARCHAR) || '#' || CAST(count(*) AS VARCHAR)"
         f" AS v FROM {G} GROUP BY x ORDER BY x"),
        (f"SELECT CAST(x AS VARCHAR) || '#' || CAST(count(*) AS VARCHAR)"
         f" AS v FROM {GS} GROUP BY x ORDER BY x"),
        f"SELECT DISTINCT CAST(x AS VARCHAR) AS v FROM {G} ORDER BY 1",
        f"SELECT DISTINCT CAST(x AS VARCHAR) AS v FROM {GS} ORDER BY 1",
        # min/max aggregates over nested (NULL rows skipped, inner
        # NULLs largest)
        f"SELECT CAST(max(x) AS VARCHAR) AS v FROM {LN}",
        f"SELECT CAST(min(x) AS VARCHAR) AS v FROM {LN}",
        f"SELECT CAST(max(x) AS VARCHAR) AS v FROM {ST}",
        f"SELECT CAST(min(x) AS VARCHAR) AS v FROM {ST}",
        f"SELECT CAST(max(x) AS VARCHAR) AS v FROM {SS}",
        f"SELECT CAST(max(x) AS VARCHAR) AS v FROM {LL}",
        f"SELECT CAST(min(x) AS VARCHAR) AS v FROM {DBL}",
        f"SELECT CAST(max(x) AS VARCHAR) AS v FROM {DBL}",
        # list_min/list_max over nested elements (NULL elements skipped)
        "SELECT CAST(list_max([[1,NULL],[1,2]]) AS VARCHAR) AS v",
        "SELECT CAST(list_min([[1,NULL],[1,2],NULL]) AS VARCHAR) AS v",
        "SELECT CAST(list_max([NULL,[1]]) AS VARCHAR) AS v",
        "SELECT coalesce(CAST(list_min([NULL::INT[]]) AS VARCHAR),"
        "'None') AS v",
        "SELECT CAST(list_min([{'a':NULL},{'a':1}]) AS VARCHAR) AS v",
        # list_sort / list_reverse_sort over nested elements
        "SELECT CAST(list_sort([[1],[NULL],NULL,[1,2]]) AS VARCHAR) AS v",
        "SELECT CAST(list_reverse_sort([[1],[NULL],NULL,[1,2]]) "
        "AS VARCHAR) AS v",
        "SELECT CAST(list_sort([{'a':1},{'a':NULL},{'a':0}]) AS VARCHAR)"
        " AS v",
        "SELECT CAST(list_sort([['a'],['a',NULL],['ab'],[NULL]]) "
        "AS VARCHAR) AS v",
    ]
    return [(q, "query") for q in qs]


def fam_lateral(seed):
    """r19: TVF/lateral depth 2 (VERDICT r18 task 8). Measured DuckDB
    1.0.0 edges: comma/JOIN-position unnest auto-LATERALs (iterates per
    outer row; empty/NULL lists DROP the row; LEFT JOIN LATERAL ON true
    keeps it with NULL); MULTIPLE FROM-position unnests are a CARTESIAN
    (unlike the SELECT-position zip); correlated args reach through
    struct fields and lambdas; WHERE/GROUP BY compose over the lateral
    output; TVFs compose with set ops; range/generate_series REFUSE
    lateral column parameters (loud binder error)."""
    qs = [
        # correlated comma-position unnest
        "SELECT t.g || '=' || CAST(u.x AS VARCHAR) AS v FROM (VALUES ('a',[1,2]),('b',[3])) t(g,l), unnest(t.l) u(x) ORDER BY 1",
        "SELECT t.g || '=' || CAST(x AS VARCHAR) AS v FROM (VALUES ('a',[1,2]),('b',[3])) t(g,l), unnest(t.l) u(x) ORDER BY 1",
        # LATERAL keyword spellings
        "SELECT t.g || '=' || CAST(u.x AS VARCHAR) AS v FROM (VALUES ('a',[1,2])) t(g,l), LATERAL unnest(t.l) u(x) ORDER BY 1",
        "SELECT t.g || '=' || CAST(u.x AS VARCHAR) AS v FROM (VALUES ('a',[1,2])) t(g,l) CROSS JOIN LATERAL unnest(t.l) u(x) ORDER BY 1",
        "SELECT t.g || '=' || CAST(u.x AS VARCHAR) AS v FROM (VALUES ('a',[1,2])) t(g,l) CROSS JOIN unnest(t.l) u(x) ORDER BY 1",
        "SELECT t.g || '=' || CAST(u.x AS VARCHAR) AS v FROM (VALUES ('a',[5])) t(g,l) INNER JOIN LATERAL unnest(t.l) u(x) ON true ORDER BY 1",
        # empty and NULL lists: dropped by CROSS, kept by LEFT ... ON true
        "SELECT t.g || '=' || coalesce(CAST(u.x AS VARCHAR),'None') AS v FROM (VALUES ('a',[1]),('b',[]::INT[])) t(g,l), unnest(t.l) u(x) ORDER BY 1",
        "SELECT t.g || '=' || coalesce(CAST(u.x AS VARCHAR),'None') AS v FROM (VALUES ('a',[1]),('b',NULL::INT[])) t(g,l), unnest(t.l) u(x) ORDER BY 1",
        "SELECT t.g || '=' || coalesce(CAST(u.x AS VARCHAR),'None') AS v FROM (VALUES ('a',[1]),('b',[]::INT[])) t(g,l) LEFT JOIN LATERAL unnest(t.l) u(x) ON true ORDER BY 1",
        "SELECT t.g || '=' || coalesce(CAST(u.x AS VARCHAR),'None') AS v FROM (VALUES ('a',[1]),('b',NULL::INT[])) t(g,l) LEFT JOIN LATERAL unnest(t.l) u(x) ON true ORDER BY 1",
        # NULL elements survive the iteration
        "SELECT t.g || '=' || coalesce(CAST(u.x AS VARCHAR),'None') AS v FROM (VALUES ('a',[1,NULL,3])) t(g,l), unnest(t.l) u(x) ORDER BY 1",
        # correlated through struct fields and lambdas
        "SELECT t.g || '=' || CAST(u.x AS VARCHAR) AS v FROM (VALUES ('a',{'l':[1,2]}),('b',{'l':[3]})) t(g,s), unnest(t.s.l) u(x) ORDER BY 1",
        "SELECT t.g || '=' || CAST(u.x AS VARCHAR) AS v FROM (VALUES ('a',{'l':[1,2]})) t(g,s), unnest(list_transform(t.s.l, z -> z*10)) u(x) ORDER BY 1",
        "SELECT t.g || '=' || CAST(u.x AS VARCHAR) AS v FROM (VALUES ('a',[1,2,3])) t(g,l), unnest(list_filter(t.l, z -> z % 2 = 1)) u(x) ORDER BY 1",
        # unnest emitting LIST elements
        "SELECT t.g || '=' || CAST(u.x AS VARCHAR) AS v FROM (VALUES ('a',[[1],[2,3]])) t(g,l), unnest(t.l) u(x) ORDER BY 1",
        # multiple FROM-position unnests: CARTESIAN, not zip
        "SELECT CAST(u.x AS VARCHAR) || '|' || CAST(v.y AS VARCHAR) AS v FROM (VALUES ([1,2],[10,20])) t(a,b), unnest(t.a) u(x), unnest(t.b) v(y) ORDER BY 1",
        "SELECT t.g || CAST(u.x AS VARCHAR) || CAST(v.y AS VARCHAR) AS v FROM (VALUES ('a',[1],[7,8])) t(g,p,q2), unnest(t.p) u(x), unnest(t.q2) v(y) ORDER BY 1",
        # WHERE / GROUP BY / aggregates over the lateral output
        "SELECT t.g || '=' || CAST(u.x AS VARCHAR) AS v FROM (VALUES ('a',[1,2,3])) t(g,l), unnest(t.l) u(x) WHERE u.x > 1 ORDER BY 1",
        "SELECT t.g || '#' || CAST(sum(u.x) AS VARCHAR) AS v FROM (VALUES ('a',[1,2]),('b',[3])) t(g,l), unnest(t.l) u(x) GROUP BY t.g ORDER BY 1",
        "SELECT t.g || '#' || CAST(count(*) AS VARCHAR) AS v FROM (VALUES ('a',[1,2]),('b',[3]),('c',[]::INT[])) t(g,l), unnest(t.l) u(x) GROUP BY t.g ORDER BY 1",
        # lateral output joined back / composed with set ops
        "SELECT CAST(x AS VARCHAR) AS v FROM (VALUES ([1,2])) t(l), unnest(t.l) u(x) UNION ALL SELECT CAST(x AS VARCHAR) FROM (VALUES ([9])) s(l), unnest(s.l) w(x) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) AS v FROM (VALUES ([1,2,3])) t(l), unnest(t.l) u(x) INTERSECT SELECT CAST(x AS VARCHAR) FROM (VALUES ([2,3,4])) s(l), unnest(s.l) w(x) ORDER BY 1",
        "SELECT CAST(x AS VARCHAR) AS v FROM (VALUES ([1,2,3])) t(l), unnest(t.l) u(x) EXCEPT SELECT CAST(x AS VARCHAR) FROM (VALUES ([3])) s(l), unnest(s.l) w(x) ORDER BY 1",
        # TVFs composed with set ops
        "SELECT CAST(range AS VARCHAR) AS v FROM range(2) UNION ALL SELECT CAST(range AS VARCHAR) FROM range(1) ORDER BY 1",
        "SELECT CAST(range AS VARCHAR) AS v FROM range(3) INTERSECT SELECT CAST(range AS VARCHAR) FROM range(2, 5) ORDER BY 1",
        "SELECT CAST(generate_series AS VARCHAR) AS v FROM generate_series(1,2) UNION SELECT CAST(range AS VARCHAR) FROM range(2) ORDER BY 1",
        # uncorrelated comma/JOIN TVFs next to a real table
        "SELECT CAST(t.x + r.range AS VARCHAR) AS v FROM (SELECT 10 AS x) t, range(3) r ORDER BY 1",
        "SELECT CAST(g.generate_series AS VARCHAR) AS v FROM (SELECT 1) t, generate_series(1,3) g ORDER BY 1",
        # two unnests on DIFFERENT outer rows compose independently
        "SELECT t.g || '=' || CAST(u.x AS VARCHAR) || ':' || CAST(w.y AS VARCHAR) AS v FROM (VALUES ('a',[1,2],[5])) t(g,l,m), unnest(t.l) u(x), unnest(t.m) w(y) ORDER BY 1",
        # chained: unnest of an unnest output's field via a subquery
        "SELECT CAST(y AS VARCHAR) AS v FROM (SELECT u.x AS inner_l FROM (VALUES ([[1,2],[3]])) t(l), unnest(t.l) u(x)) s, unnest(s.inner_l) w(y) ORDER BY 1",
    ]
    return [(q, "query") for q in qs]


FAMILIES = {"json": fam_json, "structmap": fam_structmap,
            "uuidblob": fam_uuidblob,
            "strftime": fam_strftime,
            "regexp": fam_regexp, "tz": fam_tz, "cast": fam_cast,
            "hashbit": fam_hashbit, "compare": fam_compare,
            "coercion": fam_coercion, "decimal": fam_decimal,
            "interval": fam_interval, "keyequiv": fam_keyequiv,
            "fnwave": fam_fnwave, "collate": fam_collate,
            "unicase": fam_unicase, "csvio": fam_csvio,
            "csvopt": fam_csvopt, "jsonopt": fam_jsonopt,
            "stmtshape": fam_stmtshape, "winspec": fam_winspec,
            "trailing": fam_trailing, "numedge": fam_numedge,
            "jsonbuild": fam_jsonbuild, "printf": fam_printf,
            "likeglob": fam_likeglob,
            "mapdepth": fam_mapdepth, "listmath": fam_listmath,
            "aggdepth": fam_aggdepth, "windepth": fam_windepth,
            "slice": fam_slice, "tvf": fam_tvf, "lambda": fam_lambda,
            "nestord": fam_nestord, "lateral": fam_lateral}


# verify-only families map spec file -> harness kind
SPEC_KIND = {"WindowDifferentialSpec.scala": "window",
             "LikeGlobDifferentialSpec.scala": "auto",
             "CollateDifferentialSpec.scala": "auto",
             "CsvIoDifferentialSpec.scala": "auto",
             "TrailingCommaDifferentialSpec.scala": "auto",
             "AggDifferentialSpec.scala": "agg",
             "AggDepthDifferentialSpec.scala": "agg",
             "WinDepthDifferentialSpec.scala": "window",
             "CoercionDifferentialSpec.scala": "auto",
             "KeyEquivSpec.scala": "auto",
             # r18 (VERDICT r17 task 1): the three r17 families emit
             # per-fixture kind "query" (multi-row, rows joined ';');
             # eval_auto is insufficient — StmtShape has FROM-first
             # statements that start with neither SELECT nor WITH.
             "CsvOptDifferentialSpec.scala": "query",
             "JsonOptDifferentialSpec.scala": "query",
             "StmtShapeDifferentialSpec.scala": "query",
             "WinSpecDifferentialSpec.scala": "query",
             # r18: full-query fixtures (SliceDifferentialSpec stays on
             # the default scalar kind)
             "TvfDifferentialSpec.scala": "query",
             # r19: nested-type ordering + lateral depth
             "NestOrdDifferentialSpec.scala": "query",
             "LateralDifferentialSpec.scala": "query"}


def scala_quote(s):
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') \
                  .replace("\n", "\\n").replace("\t", "\\t") \
                  .replace("\r", "\\r") + '"'


def cmd_gen(family, seed):
    con = connect()
    out, skipped = [], []
    for expr, kind in FAMILIES[family](seed):
        try:
            val = (eval_scalar(con, expr) if kind == "scalar"
               else eval_query(con, expr) if kind == "query"
               else eval_auto(con, expr) if kind == "auto"
               else eval_agg(con, expr) if kind == "agg"
               else eval_window(con, expr))
            out.append(f"      ({scala_quote(expr)}, {scala_quote(val)}),")
        except Exception as e:
            skipped.append(f"// SKIP {expr}: {str(e).splitlines()[0][:100]}")
    print("\n".join(out))
    if skipped:
        print("\n".join(skipped), file=sys.stderr)
    print(f"// {len(out)} fixtures, {len(skipped)} skipped "
          f"(family={family}, seed={seed}, duckdb={duckdb.__version__})",
          file=sys.stderr)


FIXTURE_RE = re.compile(r'^\s*\("((?:[^"\\]|\\.)*)",\s*"((?:[^"\\]|\\.)*)"\)[,)]?\s*$')


def unescape(s):
    return (s.replace("\\\\", "\x00").replace('\\"', '"')
             .replace("\\n", "\n").replace("\\t", "\t")
             .replace("\\r", "\r").replace("\x00", "\\"))


def cmd_verify(paths):
    con = connect()
    # csvopt/jsonopt fixture scripts COPY their own input files into
    # these dirs before reading them back — the scripts are
    # self-contained, but the DIRECTORIES must exist (gen creates them
    # in fam_csvopt/fam_jsonopt; verify must too).
    import os
    for d in ("/tmp/graft_csvopt_fx", "/tmp/graft_jsonopt_fx"):
        os.makedirs(d, exist_ok=True)
    total = bad = 0
    for path in paths:
        kind = SPEC_KIND.get(path.split("/")[-1], "scalar")
        with open(path) as f:
            lines = f.read().splitlines()
        for ln in lines:
            m = FIXTURE_RE.match(ln)
            if not m:
                continue
            expr, expected = unescape(m.group(1)), unescape(m.group(2))
            total += 1
            try:
                got = (eval_scalar(con, expr) if kind == "scalar"
                       else eval_agg(con, expr) if kind == "agg"
                       else eval_auto(con, expr) if kind == "auto"
                       else eval_query(con, expr) if kind == "query"
                       else eval_window(con, expr))
            except Exception as e:
                got = f"<ERR {str(e).splitlines()[0][:80]}>"
            if got != expected:
                # doubles: tolerate 1e-12 relative (the specs do the same)
                def close(g, e):
                    gp, ep = g.split(";"), e.split(";")
                    if len(gp) != len(ep):
                        return False
                    for a, b in zip(gp, ep):
                        ka, va = a.partition("=")[::2], None
                        try:
                            fa = float(a.rpartition("=")[2] if "=" in a else a)
                            fb = float(b.rpartition("=")[2] if "=" in b else b)
                            if abs(fa - fb) > max(1e-12 * abs(fb), 1e-14):
                                return False
                        except ValueError:
                            if a != b:
                                return False
                    return True
                if not close(got, expected):
                    bad += 1
                    print(f"{path}: {expr}\n  spec:   {expected!r}\n  duckdb: {got!r}")
    print(f"verified {total} fixtures, {bad} drifted "
          f"(duckdb={duckdb.__version__})", file=sys.stderr)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen")
    g.add_argument("family", choices=sorted(FAMILIES))
    g.add_argument("--seed", type=int, default=13)
    v = sub.add_parser("verify")
    v.add_argument("paths", nargs="+")
    a = ap.parse_args()
    if a.cmd == "gen":
        cmd_gen(a.family, a.seed)
    else:
        cmd_verify(a.paths)
