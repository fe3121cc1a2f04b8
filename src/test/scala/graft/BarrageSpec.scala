package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** Dialect breadth probe, pinned (r11): a barrage of everyday DuckDB
  * expressions through the router. Every spelling is either RUNNABLE
  * (and its values are oracle-checked by q_lake_fn_wave / the dialect
  * rows) or in the KNOWN-REFUSED set, which must fail LOUDLY — a new
  * refusal appearing here means a rewrite regressed; a refusal
  * disappearing means a mapping landed and the pin should move.
  */
class BarrageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("everyday-DuckDB expression barrage: runnable set runs, refusals stay loud") {
    val dir = Files.createTempDirectory("graft_barrage").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    lake.sql("CREATE TABLE b(id INTEGER, s VARCHAR, d DATE, x DOUBLE); " +
      "INSERT INTO b VALUES (1, 'Hello World', DATE '2024-03-15', 2.5)")
    val runnable = Seq(
      "SELECT EXTRACT(YEAR FROM d) AS v FROM b",
      "SELECT s ILIKE 'hello%' AS v FROM b",
      "SELECT position('World' IN s) AS v FROM b",
      "SELECT d + 5 AS v FROM b",
      "SELECT d - DATE '2024-03-01' AS v FROM b",
      "SELECT d + INTERVAL 3 DAY AS v FROM b",
      "SELECT last_day(d) AS v FROM b",
      "SELECT date_part('month', d) AS v FROM b",
      "SELECT string_to_array(s, ' ') AS v FROM b",
      "SELECT string_split_regex(s, '\\s+') AS v FROM b",
      "SELECT array_agg(s) AS v FROM b",
      "SELECT list_unique([1,2,2,NULL,3]) AS v FROM b",
      "SELECT regexp_extract(s, '([A-Z])\\w+', 1) AS v FROM b",
      "SELECT left(s, 5) AS v, right(s, 5) AS w FROM b",
      "SELECT repeat('ab', 3) AS v FROM b",
      "SELECT md5(s) AS v FROM b",
      "SELECT strpos(s, 'World') AS v FROM b",
      "SELECT instr(s, 'World') AS v FROM b",
      "SELECT to_hex(255) AS v FROM b",
      "SELECT bit_length(s) AS v FROM b",
      "SELECT jaccard('abc','abd') AS v FROM b",
      "SELECT hamming('abc','abd') AS v FROM b",
      "SELECT mismatches('abc','abd') AS v FROM b",
      "SELECT greatest(1, 2) AS v, least(3, 4) AS w FROM b",
      "SELECT (true = 1) AS v",
      "SELECT greatest('2', 10) AS v",
      "SELECT (INTERVAL 1 MONTH = INTERVAL 30 DAY) AS v",
      "SELECT isfinite(x) AS v, isinf(x) AS w FROM b",
      "SELECT isnan(x) AS v FROM b",
      "SELECT format('{} and {}', 1, 2) AS v FROM b",
      "SELECT list_zip([1,2],[3,4]) AS v FROM b",
      "SELECT flatten([[1,2],[3]]) AS v FROM b",
      "SELECT list_dot_product([1.0,2.0],[3.0,4.0]) AS v FROM b",
      "SELECT list_inner_product([1.0,2.0],[3.0,4.0]) AS v FROM b",
      "SELECT list_cosine_similarity([1.0,0.0],[1.0,0.0]) AS v FROM b",
      "SELECT list_distance([1.0,2.0],[4.0,6.0]) AS v FROM b",
      "SELECT array_to_string([1,2], '-') AS v FROM b",
      "SELECT try_strptime('x', '%Y') AS v FROM b",
      "SELECT typeof(x) AS v FROM b",
      "SELECT uuid() IS NOT NULL AS v FROM b",
      "SELECT epoch(TIMESTAMP '2024-01-01 00:00:00') AS v FROM b",
      "SELECT make_date(2024, 3, 15) AS v FROM b",
      // r12 scalar wave (values asserted below / oracle-checked)
      "SELECT age(DATE '2024-03-20', d) AS v FROM b",
      "SELECT damerau_levenshtein('abc','acb') AS v FROM b",
      "SELECT even(2.5) AS v FROM b",
      "SELECT nextafter(1.0, 2.0) AS v FROM b",
      "SELECT x // 1 AS v FROM b",
      // r13: gamma ships as a documented-tolerance Lanczos twin
      // (GammaToleranceSpec pins |rel err| <= 1e-12); no oracle row
      "SELECT gamma(5) AS v FROM b")
    // no faithful Spark composition exists — these MUST stay loud
    val refused = Seq(
      // r13 cast differential: DuckDB's HUGEINT holds 39 digits
      // (2^127-1); the engine's HUGEINT convention is DECIMAL(38,0),
      // so the last digit of range stays a loud precision error
      "SELECT CAST(170141183460469231731687303715884105727 AS VARCHAR) AS v",
      // r13 compare differential — all three former refusals now RUN
      // via CoercionRepair's literal lattice (bool<->int comparison,
      // mixed string/number greatest(), and the cross-flavor interval
      // comparison, which micros-normalizes with 1 month = 30 days;
      // values pinned in Compare/IntervalDifferentialSpec)
      // r14 interval barrage: a non-integer multiplier is a DuckDB
      // binder error — Spark would silently compute the fraction
      "SELECT (INTERVAL '1 day' * 2.5) AS v",
      "SELECT (INTERVAL '3 hours' / 1.5) AS v",
      // 1-arg age is current_date-relative: volatile, unverifiable
      "SELECT age(TIMESTAMP '2024-03-20 00:00:00') AS v FROM b",
      // time_bucket with a non-literal width / TIMESTAMP origin: no
      // static rewrite (the literal-width forms run — r12)
      "SELECT time_bucket(INTERVAL (id) DAY, d) AS v FROM b",
      "SELECT time_bucket(INTERVAL 1 DAY, d, TIMESTAMP '2000-02-01') AS v FROM b")
    val broken = runnable.flatMap { q =>
      try { lake.sql(q).collect(); None }
      catch { case e: Throwable =>
        Some(q + " ==> " + e.getMessage.linesIterator.take(1).mkString) }
    }
    assert(broken.isEmpty, broken.mkString("\n"))
    val silent = refused.filter(q =>
      try { lake.sql(q).collect(); true } catch { case _: Throwable => false })
    assert(silent.isEmpty,
      s"known-refused spellings now run — verify values and move the pin:\n" +
      silent.mkString("\n"))
    // r12 time_bucket values, measured against DuckDB 1.0: sub-day
    // widths epoch-align (floor toward -inf), whole-day widths count
    // from Monday 2000-01-03, month widths from 2000-01-01, the
    // INTERVAL offset shifts in/out, '48 hours' == '2 days'
    def tb(sql: String): String =
      lake.sql(sql).head().getTimestamp(0).toString
    assert(tb("SELECT time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-03-15 10:37:22') AS v")
      == "2024-03-15 10:30:00.0")
    assert(tb("SELECT time_bucket(INTERVAL '1 hour 30 minutes', TIMESTAMP '2024-03-15 10:37:22') AS v")
      == "2024-03-15 10:30:00.0")
    assert(tb("SELECT time_bucket(INTERVAL '10 seconds', TIMESTAMP '1969-12-31 23:59:55') AS v")
      == "1969-12-31 23:59:50.0")
    assert(tb("SELECT time_bucket(INTERVAL '2 days', TIMESTAMP '1999-12-31 10:00:00') AS v")
      == "1999-12-30 00:00:00.0")
    assert(tb("SELECT time_bucket(INTERVAL '48 hours', TIMESTAMP '2024-03-16 10:37:22') AS v")
      == "2024-03-15 00:00:00.0")
    assert(tb("SELECT time_bucket(INTERVAL '1 week', TIMESTAMP '2024-03-15 10:37:22') AS v")
      == "2024-03-11 00:00:00.0")
    assert(tb("SELECT time_bucket(INTERVAL '3 months', TIMESTAMP '2024-03-15 10:37:22') AS v")
      == "2024-01-01 00:00:00.0")
    assert(tb("SELECT time_bucket(INTERVAL '2 months', TIMESTAMP '1999-11-15 10:00:00') AS v")
      == "1999-11-01 00:00:00.0")
    assert(tb("SELECT time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-03-15 10:37:22', INTERVAL '5 minutes') AS v")
      == "2024-03-15 10:35:00.0")
    assert(tb("SELECT time_bucket(INTERVAL 1 DAY, TIMESTAMP '2024-03-15 10:37:22') AS v")
      == "2024-03-15 00:00:00.0")

    // r12 scalar-wave values, all measured against DuckDB 1.0 this
    // session (ScalarWave documents each contract)
    def one(sql: String): Any = lake.sql(sql).head().get(0)
    // age: day borrow uses B's month length (Jan=31 -> 26, not 24)
    assert(one("SELECT age(DATE '2024-03-10', DATE '2024-01-15') AS v").toString
      == "1 month 26 days")
    assert(one("SELECT age(DATE '2024-01-15', DATE '2024-03-10') AS v").toString
      == "-1 month -26 days")
    assert(one("SELECT age(TIMESTAMP '2024-03-10 05:00:00', " +
      "TIMESTAMP '2024-01-15 10:30:00') AS v").toString == "1 month 25 days 18:30:00")
    assert(one("SELECT age(TIMESTAMP '2024-03-01 05:00:00', " +
      "TIMESTAMP '2024-02-28 10:00:00') AS v").toString == "1 day 19:00:00")
    assert(one("SELECT age(DATE '2025-07-04', DATE '2022-12-25') AS v").toString
      == "2 years 6 months 10 days")
    assert(one("SELECT age(DATE '2024-03-15', DATE '2024-03-15') AS v").toString
      == "00:00:00")
    // full DL with the dictionary ('ca'->'abc' is 2; OSA would say 3),
    // over UTF-8 BYTES ('é' vs 'e' is 2)
    assert(one("SELECT damerau_levenshtein('abc','acb') AS v") == 1L)
    assert(one("SELECT damerau_levenshtein('ca','abc') AS v") == 2L)
    assert(one("SELECT damerau_levenshtein('kitten','sitting') AS v") == 3L)
    assert(one("SELECT damerau_levenshtein('é','e') AS v") == 2L)
    assert(one("SELECT damerau_levenshtein('', 'abc') AS v") == 3L)
    // even: away-from-zero to the next even integer, DOUBLE
    assert(one("SELECT even(2.5) AS v") == 4.0)
    assert(one("SELECT even(-2.5) AS v") == -4.0)
    assert(one("SELECT even(2.0) AS v") == 2.0)
    assert(one("SELECT even(-0.5) AS v") == -2.0)
    assert(one("SELECT even(0) AS v") == 0.0)
    // nextafter: bit-exact IEEE step
    assert(one("SELECT nextafter(1.0, 2.0) AS v") == 1.0000000000000002)
    assert(one("SELECT nextafter(0.0, -1.0) AS v") == -java.lang.Double.MIN_VALUE)
    // `//`: ints trunc toward zero, doubles PLAIN-divide, /0 -> NULL
    assert(one("SELECT 7 // 2 AS v") == 3L)
    assert(one("SELECT (-7) // 2 AS v") == -3L)
    assert(one("SELECT 7.5 // 2 AS v") == 3.75)
    assert(lake.sql("SELECT 7 // 0 AS v").head().isNullAt(0))
    assert(lake.sql("SELECT 7.5 // 0 AS v").head().isNullAt(0))
    // bar: floor-eighth partial block, pad to width BYTES
    assert(one("SELECT bar(3, 0, 5, 5) AS v") == "███")
    assert(one("SELECT bar(2.7, 0, 5, 10) AS v") ==
      "█████▍")
    assert(one("SELECT bar(0, 0, 5, 5) AS v") == "     ")
    assert(one("SELECT bar(1.0, 0, 5, 5) AS v") == "█  ")
    assert(one("SELECT bar(4.99, 0, 5, 5) AS v") ==
      "████▉")
  }

  test("r12 wave-2 barrage: gap-probe spellings run with DuckDB-measured values") {
    val dir = Files.createTempDirectory("graft_barrage_w2").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    lake.sql("CREATE TABLE w(id INTEGER); INSERT INTO w VALUES (1)")
    def one(q: String): Any = lake.sql(q).head().get(0)
    // 2-arg trim family: Spark's (trimStr, str) order is REVERSED from
    // DuckDB's (str, chars) — the rewrite goes through ANSI TRIM(...
    // FROM ...) so ltrim('xxabc','x') is 'abc', not the silent '' the
    // bare rename produced
    assert(one("SELECT ltrim('xxabc','x') AS v") == "abc")
    assert(one("SELECT rtrim('abcyy','y') AS v") == "abc")
    assert(one("SELECT trim('xxabcxx','x') AS v") == "abc")
    assert(one("SELECT btrim('xxabcxx','x') AS v") == "abc")
    // len/length: type-dispatching BIGINT (codepoints / elements)
    assert(one("SELECT len('héllo') AS v") == 5L)
    assert(one("SELECT len([1,2,NULL]) AS v") == 3L)
    assert(one("SELECT length('abc') AS v") == 3L)
    // gcd/lcm over absolute values
    assert(one("SELECT gcd(-12, 18) AS v") == 6L)
    assert(one("SELECT lcm(-4, 6) AS v") == 12L)
    assert(one("SELECT least_common_multiple(4, 6) AS v") == 12L)
    assert(one("SELECT to_base(255, 16) AS v") == "FF")
    // ISO week twins (Spark 4 has no weekofyear builtin; EXTRACT WEEK /
    // YEAROFWEEK are the ISO fields)
    assert(one("SELECT weekofyear(DATE '2021-01-01') AS v") == 53)
    assert(one("SELECT yearweek(DATE '2024-12-31') AS v") == 202501L)
    // interval constructors -> ANSI interval makers
    assert(one("SELECT CAST(DATE '2024-01-01' + to_days(3) AS DATE) AS v")
      .toString == "2024-01-04")
    assert(one("SELECT CAST(TIMESTAMP '2024-01-01 00:00:00' + to_hours(2) AS VARCHAR) AS v")
      == "2024-01-01 02:00:00")
    // 3-arg date_sub: SIGNED complete units, trunc toward zero
    assert(one("SELECT date_sub('day', DATE '2024-03-01', DATE '2024-01-01') AS v") == -60L)
    assert(one("SELECT date_sub('hour', TIMESTAMP '2024-01-01 00:30:00', " +
      "TIMESTAMP '2024-01-01 05:00:00') AS v") == 4L)
    assert(one("SELECT date_sub('month', DATE '2024-03-10', DATE '2024-01-15') AS v") == -1L)
    // list fold/aggregate family
    assert(one("SELECT list_reduce([1,2,3,4], (a,b) -> a + b) AS v") == 10)
    assert(one("SELECT list_reduce([5], (a,b) -> a + b) AS v") == 5)
    assert(one("SELECT list_aggregate(['a','b'], 'min') AS v") == "a")
    assert(one("SELECT list_aggregate([1,NULL,3], 'count') AS v") == 2L)
    assert(one("SELECT list_any_value([NULL, 3, 4]) AS v") == 3)
    assert(one("SELECT array_to_string(array_reverse([1,2,3]), ',') AS v") == "3,2,1")
    assert(one("SELECT array_to_string(regexp_split_to_array('a1b2c', '[0-9]'), ',') AS v")
      == "a,b,c")
    assert(lake.sql("SELECT generate_subscripts([9,8,7], 1) AS i").collect()
      .map(_.get(0)).mkString(",") == "1,2,3")
    // date_part divergent fields (r12 date differential): dow is
    // Sunday=0 (Spark's dayofweek is Sunday=1 — silent off-by-one
    // before), epoch is DOUBLE seconds (numeric here: Spark renders
    // doubles scientifically so the VARCHAR twin can't cover it)
    assert(one("SELECT date_part('dow', DATE '2024-01-07') AS v") == 0L)
    assert(one("SELECT date_part('isodow', DATE '2024-01-07') AS v") == 7L)
    assert(one("SELECT date_part('epoch', TIMESTAMP '2024-01-01 00:00:05') AS v")
      == 1.704067205e9)
    assert(one("SELECT date_part('second', TIMESTAMP '2024-01-01 00:00:46.75') AS v")
      == 46L)
    assert(one("SELECT date_part('milliseconds', TIMESTAMP '2024-01-01 00:00:46.75') AS v")
      == 46750L)
    // date_sub month clamp: Jan-31 + 1 month clamps to Feb-29, so
    // 10:00 -> 10:00 completes the month; 09:00 on Feb-28 does not
    assert(one("SELECT date_sub('month', TIMESTAMP '2024-01-31 10:00:00', " +
      "TIMESTAMP '2024-02-29 10:00:00') AS v") == 1L)
    assert(one("SELECT date_sub('month', TIMESTAMP '2024-01-31 10:00:00', " +
      "TIMESTAMP '2024-02-28 09:00:00') AS v") == 0L)
    // DATE - DATE is a day COUNT like DuckDB, not Spark's DAY interval
    assert(one("SELECT (DATE '2024-03-10' - DATE '2024-03-01') AS v") == 9)
    // Postgres LIKE operators; r14 closes the bare `~`/`!~` refusal —
    // infix (operand on the left) is the FULL-match regex, prefix is
    // bitwise-NOT (RegexpDifferentialSpec pins the values)
    assert(one("SELECT ('abc' ~~ 'a%') AS v") == true)
    assert(one("SELECT ('ABC' ~~* 'a%') AS v") == true)
    assert(one("SELECT ('abc' !~~ 'b%') AS v") == true)
    assert(one("SELECT ('ABC' !~~* 'b%') AS v") == true)
    assert(one("SELECT ('abc' ~ 'a.c') AS v") == true)
    assert(one("SELECT ('abc' !~ 'b') AS v") == true)
    assert(one("SELECT (~5) AS v") == -6)
  }

  test("statement-shape barrage: runnable set runs, refusals stay loud") {
    val dir = Files.createTempDirectory("graft_barrage2").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    lake.sql("CREATE TABLE t(id INTEGER, v VARCHAR); " +
      "INSERT INTO t VALUES (1,'a'),(2,'b'),(3,'c')")
    val runnable = Seq(
      "CREATE TABLE c1 AS FROM t",                       // FROM-first CTAS
      "INSERT INTO c1 FROM t",                           // FROM-first insert body
      "VALUES (1, 'x'), (2, 'y')",                       // bare VALUES statement
      "WITH m AS MATERIALIZED (SELECT id FROM t) SELECT count(*) AS c FROM m",
      "WITH m AS NOT MATERIALIZED (SELECT id FROM t) SELECT count(*) AS c FROM m",
      "SELECT COLUMNS(c -> c LIKE 'i%') FROM t",          // lambda COLUMNS
      "SELECT CAST('5' AS USMALLINT) AS v",               // unsigned family
      "SELECT CAST(5 AS UBIGINT) AS v",
      "SELECT prefix(v, 'a') AS p, suffix(v, 'a') AS s FROM t",
      "SELECT 'a' IN (SELECT v FROM t) AS v",
      "SELECT id FROM t WHERE id = ANY (SELECT id FROM t)",
      "SELECT id FROM t WHERE id <> ALL (VALUES (99))",
      "SELECT first(v ORDER BY id) AS a, last(v ORDER BY id) AS z FROM t",
      "SELECT first(v ORDER BY id DESC) AS a FROM t",
      "SELECT 0x1F AS v",                                 // hex literal
      "SELECT 1_000_000 AS v",                            // digit separators
      "SELECT 'dq' AS v FROM t WHERE v = $$a$$",          // dollar quotes
      "SELECT id, v FROM (SELECT id FROM t) t1 POSITIONAL JOIN (SELECT v FROM t) t2",
      "TABLE t",
      "SUMMARIZE t",
      "SELECT id FROM t OFFSET 1",
      "FROM t SELECT id WHERE id > 1",
      "SELECT * FROM t LIMIT 50%",          // r12: count pass + floor limit
      "SELECT bar(3, 0, 5, 5) AS v")        // r12: native BarText
    val refused = Seq(
      // r13: same-named POSITIONAL sides now twin DuckDB's duplicate
      // output names for SELECT * (PosJoinDupSpec); what stays refused
      // is a QUALIFIED alias ref into the zipped view — the rewrite
      // materializes one view, so t1./t2. anchors can't resolve
      "SELECT t1.id FROM t t1 POSITIONAL JOIN t t2")
    val broken = runnable.flatMap { q =>
      try { lake.sql(q).collect(); None }
      catch { case e: Throwable =>
        Some(q + " ==> " + e.getMessage.linesIterator.take(1).mkString) }
    }
    assert(broken.isEmpty, broken.mkString("\n"))
    val silent = refused.filter(q =>
      try { lake.sql(q).collect(); true } catch { case _: Throwable => false })
    assert(silent.isEmpty,
      "known-refused shapes now run — verify values and move the pin:\n" +
      silent.mkString("\n"))
    // percent limit (r12), measured: floor(n*pct/100) rows — 50% of 3
    // is 1 row, 33% is 0, 34% is 1; ordered queries keep their order
    assert(lake.sql("SELECT id FROM t ORDER BY id LIMIT 50%").collect()
      .map(_.getInt(0)).toSeq == Seq(1))
    assert(lake.sql("SELECT id FROM t LIMIT 33%").count() == 0L)
    assert(lake.sql("SELECT id FROM t LIMIT 34%").count() == 1L)
    assert(lake.sql("SELECT id FROM t ORDER BY id DESC LIMIT 100%").collect()
      .map(_.getInt(0)).toSeq == Seq(3, 2, 1))
    // aggregate surface (barrage #3): the mapped set runs…
    lake.sql("CREATE TABLE ag(id INTEGER, g VARCHAR, x DOUBLE); " +
      "INSERT INTO ag VALUES (1,'a',1.0),(2,'a',2.0),(3,'b',3.0),(4,'b',4.0)")
    val aggRunnable = Seq(
      "SELECT median(x) AS v FROM ag", "SELECT mode(g) AS v FROM ag",
      "SELECT skewness(x) AS v FROM ag", "SELECT kurtosis(x) AS v FROM ag",
      "SELECT bit_and(id) AS v, bit_or(id) AS w, bit_xor(id) AS u FROM ag",
      "SELECT corr(x, id) AS v, covar_pop(x, id) AS w FROM ag",
      "SELECT regr_slope(x, id) AS v, regr_r2(x, id) AS w FROM ag",
      "SELECT geomean(x) AS v, fsum(x) AS w, favg(x) AS u FROM ag",
      "SELECT min(x, 2) AS v, max(x, 2) AS w FROM ag",
      "SELECT quantile_disc(x, 0.5) AS v FROM ag",
      "SELECT count(*) FILTER (g = 'a') AS v FROM ag",
      "SELECT sum(x ORDER BY id) AS v FROM ag",
      "SELECT filter([1,2,3], fx -> fx > 1) AS v FROM ag",
      // r12: the native profiling aggregates
      "SELECT product(x) AS v FROM ag", "SELECT entropy(g) AS v FROM ag",
      "SELECT mad(x) AS v FROM ag", "SELECT histogram(g) AS v FROM ag")
    val aggBroken = aggRunnable.flatMap { q =>
      try { lake.sql(q).collect(); None }
      catch { case e: Throwable =>
        Some(q + " ==> " + e.getMessage.linesIterator.take(1).mkString) }
    }
    assert(aggBroken.isEmpty, aggBroken.mkString("\n"))
    // r12 profiling-aggregate values, measured against DuckDB 1.0:
    // product keeps IEEE signed zero and NULLs out; entropy is log2 with
    // all-NULL -> 0.0; mad interpolates both medians; histogram sorts
    // keys ascending and skips NULL keys
    assert(lake.sql("SELECT product(x) AS v FROM ag").head().getDouble(0) == 24.0)
    assert(lake.sql(
      "SELECT product(x) AS v FROM (VALUES (2.0),(0.0),(-4.0)) t(x)")
      .head().getDouble(0).toString == "-0.0")
    assert(lake.sql("SELECT product(x) AS v FROM (SELECT x FROM ag WHERE false) t")
      .head().isNullAt(0))
    assert(math.abs(lake.sql(
      "SELECT entropy(g) AS v FROM (VALUES ('b'),('a'),('b')) t(g)")
      .head().getDouble(0) - 0.9182958340544893) < 1e-12)
    assert(lake.sql("SELECT entropy(g) AS v FROM (VALUES (CAST(NULL AS VARCHAR))) t(g)")
      .head().getDouble(0) == 0.0)
    // r12: DECIMAL literals keep DuckDB's DECIMAL-typed mad (the exact
    // BigDecimal pipeline); DOUBLE inputs still return DOUBLE
    assert(lake.sql(
      "SELECT mad(x) AS v FROM (VALUES (1.0),(2.0),(4.0),(100.0)) t(x)")
      .head().get(0).toString == "1.5")
    assert(lake.sql("SELECT mad(x) AS v FROM (VALUES (1.0),(2.0)) t(x)")
      .head().get(0).toString == "0.5")
    assert(lake.sql(
      "SELECT mad(x) AS v FROM (VALUES (CAST(1.0 AS DOUBLE)),(2.0),(4.0),(100.0)) t(x)")
      .head().getDouble(0) == 1.5)
    val hist = lake.sql(
      "SELECT histogram(g) AS v FROM (VALUES ('b'),('a'),('b'),(NULL)) t(g)")
      .head().getMap[String, Long](0)
    assert(hist.toSeq == Seq("a" -> 1L, "b" -> 2L))
    // histogram in a GROUP BY keeps per-group maps
    val hg = lake.sql("SELECT g, histogram(id) AS v FROM ag GROUP BY g ORDER BY g")
      .collect()
    assert(hg(0).getMap[Int, Long](1).toSeq == Seq(1 -> 1L, 2 -> 1L))
    assert(hg(1).getMap[Int, Long](1).toSeq == Seq(3 -> 1L, 4 -> 1L))
    // the FILTER shorthand fix must not break the higher-order filter()
    assert(lake.sql("SELECT filter([1,2,3], fx -> fx > 1) AS v FROM ag LIMIT 1")
      .head().getSeq[Int](0) == Seq(2, 3))
    // spot-check values the rewrites produce
    assert(lake.sql("SELECT 0x1F AS v").head().get(0).toString == "31")
    assert(lake.sql("SELECT 1_000_000 AS v").head().get(0).toString == "1000000")
    // hostile literals: the numeric/dollar passes must not touch string
    // CONTENT, and '' escapes inside dollar quotes must survive
    assert(lake.sql("SELECT '0x1F and 1_000' AS v").head().getString(0)
      == "0x1F and 1_000")
    assert(lake.sql("SELECT '$$' AS v").head().getString(0) == "$$")
    assert(lake.sql("SELECT $$it's 0x10$$ AS v").head().getString(0) == "it's 0x10")
    // a quoted '$$' before a REAL dollar quote must not stop the scan
    val both = lake.sql("SELECT '$$' AS a, $$real$$ AS b").head()
    assert(both.getString(0) == "$$" && both.getString(1) == "real", both)
    assert(lake.sql("SELECT first(v ORDER BY id DESC) AS a FROM t")
      .head().getString(0) == "c")
    assert(lake.sql("SELECT id FROM t WHERE id <> ALL (VALUES (99)) ORDER BY id")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(lake.sql("SELECT COLUMNS(c -> c LIKE 'i%') FROM t ORDER BY id")
      .columns.toSeq == Seq("id"))
  }
}
