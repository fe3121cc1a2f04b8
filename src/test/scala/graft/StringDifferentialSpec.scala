package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** Differential string-function barrage (r12): 110 generated
  * expressions over substr/substring-FROM-FOR/left/right/lpad/rpad/
  * repeat/split_part/strpos/instr/regexp_extract/regexp_replace/
  * replace/translate/initcap/contains/starts_with/ends_with/reverse/
  * concat_ws/md5 with adversarial arguments (negative and
  * out-of-range indices, empty strings, unicode), each evaluated by
  * REAL DuckDB 1.0 offline (seeded generator) and replayed through
  * the dialect router with the result CAST to VARCHAR on both sides.
  */
class StringDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val fixtures: Seq[(String, String)] = Seq(
      ("strpos('héllo wörld', 'b')", "0"),
      ("substring('' FROM 2 FOR 1)", ""),
      ("split_part('', ',', 2)", ""),
      ("left('aaa', 1)", "a"),
      ("regexp_extract('Hello World', '([a-z]+) ([a-z]+)', 1)", ""),
      ("lpad('The quick brown fox', 0, '*')", ""),
      ("strpos('', 'b')", "0"),
      ("left('héllo wörld', 9)", "héllo wör"),
      ("translate('', 'lo', '01')", ""),
      ("strpos('AbC dEf', 'b')", "2"),
      ("split_part('x|y|z', ',', 5)", ""),
      ("md5('  pad  ')", "ff65a08b378189d94bfd3f019d2821eb"),
      ("substring('AbC dEf' FROM 4 FOR 2)", " d"),
      ("instr('abc', 'o')", "0"),
      ("upper('The quick brown fox') || lower('héllo wörld')", "THE QUICK BROWN FOXhéllo wörld"),
      ("regexp_replace('', '[aeiou]', '_')", ""),
      ("reverse('')", ""),
      ("regexp_extract('a,b,,c', '([a-z]+) ([a-z]+)', 0)", ""),
      ("starts_with('AbC dEf', 'a') OR ends_with('héllo wörld', 'c')", "false"),
      ("upper('x|y|z') || lower('héllo wörld')", "X|Y|Zhéllo wörld"),
      ("regexp_replace('héllo wörld', '[aeiou]', '_')", "héll_ wörld"),
      ("concat_ws('-', '', 'The quick brown fox')", "-The quick brown fox"),
      ("contains('aaa', 'b')", "false"),
      ("split_part('The quick brown fox', ',', 2)", ""),
      ("repeat('AbC dEf', 1)", "AbC dEf"),
      ("left('  pad  ', 9)", "  pad  "),
      ("concat_ws('-', 'Hello World', '  pad  ')", "Hello World-  pad  "),
      ("substr('a,b,,c', -1)", "c"),
      ("contains('x|y|z', 'b')", "false"),
      ("instr('héllo wörld', 'o')", "5"),
      ("rpad('  pad  ', 8, '-')", "  pad  -"),
      ("upper('a,b,,c') || lower('AbC dEf')", "A,B,,Cabc def"),
      ("starts_with('', 'a') OR ends_with('The quick brown fox', 'c')", "false"),
      ("split_part('x|y|z', ',', 2)", ""),
      ("regexp_replace('Hello World', '[aeiou]', '_')", "H_llo World"),
      ("md5('The quick brown fox')", "a2004f37730b9445670a738fa0fc9ee5"),
      ("substr('AbC dEf', 5)", "dEf"),
      ("rpad('héllo wörld', 6, '-')", "héllo "),
      ("rpad('aaa', 3, '-')", "aaa"),
      ("split_part('', ',', 1)", ""),
      ("translate('The quick brown fox', 'lo', '01')", "The quick br1wn f1x"),
      ("reverse('aaa')", "aaa"),
      ("substr('x|y|z', 5)", "z"),
      ("starts_with('Hello World', 'a') OR ends_with('', 'c')", "false"),
      ("regexp_extract('abc', '([a-z]+) ([a-z]+)', 1)", ""),
      ("regexp_extract('héllo wörld', '([a-z]+) ([a-z]+)', 2)", "w"),
      ("regexp_replace('abc', '[aeiou]', '_')", "_bc"),
      ("upper('Hello World') || lower('Hello World')", "HELLO WORLDhello world"),
      ("replace('AbC dEf', 'l', 'L')", "AbC dEf"),
      ("lpad('x|y|z', 15, '*')", "**********x|y|z"),
      ("split_part('a,b,,c', ',', 3)", ""),
      ("substr('  pad  ', 11)", ""),
      ("rpad('', 8, '-')", "--------"),
      ("translate('a,b,,c', 'lo', '01')", "a,b,,c"),
      ("strpos('  pad  ', 'b')", "0"),
      ("md5('a,b,,c')", "e25525e3d41f57be29ab0ecf3365ba14"),
      ("upper('a,b,,c') || lower('The quick brown fox')", "A,B,,Cthe quick brown fox"),
      ("regexp_extract('  pad  ', '([a-z]+) ([a-z]+)', 0)", ""),
      ("instr('AbC dEf', 'o')", "0"),
      ("translate('Hello World', 'lo', '01')", "He001 W1r0d"),
      ("replace('  pad  ', 'l', 'L')", "  pad  "),
      ("left('Hello World', -5)", "Hello "),
      ("repeat('x|y|z', 3)", "x|y|zx|y|zx|y|z"),
      ("reverse('  pad  ')", "  dap  "),
      ("replace('Hello World', 'l', 'L')", "HeLLo WorLd"),
      ("regexp_extract('aaa', '([a-z]+) ([a-z]+)', 1)", ""),
      ("lpad('', 1, '*')", "*"),
      ("right('AbC dEf', 0)", ""),
      ("repeat('héllo wörld', 2)", "héllo wörldhéllo wörld"),
      ("regexp_replace('  pad  ', '[aeiou]', '_')", "  p_d  "),
      ("lpad('abc', 11, '*')", "********abc"),
      ("upper('aaa') || lower('héllo wörld')", "AAAhéllo wörld"),
      ("lpad('Hello World', 10, '*')", "Hello Worl"),
      ("rpad('aaa', 4, '-')", "aaa-"),
      ("substr('a,b,,c', -1, 1)", "c"),
      ("contains('AbC dEf', 'b')", "true"),
      ("left('AbC dEf', 3)", "AbC"),
      ("repeat('Hello World', 1)", "Hello World"),
      ("substring('a,b,,c' FROM 5 FOR 3)", ",c"),
      ("repeat('The quick brown fox', 3)", "The quick brown foxThe quick brown foxThe quick brown fox"),
      ("reverse('Hello World')", "dlroW olleH"),
      ("right('The quick brown fox', -1)", "he quick brown fox"),
      ("reverse('AbC dEf')", "fEd CbA"),
      ("regexp_extract('', '([a-z]+) ([a-z]+)', 2)", ""),
      ("regexp_extract('héllo wörld', '([a-z]+) ([a-z]+)', 0)", "llo w"),
      ("rpad('Hello World', 3, '-')", "Hel"),
      ("starts_with('héllo wörld', 'a') OR ends_with('abc', 'c')", "true"),
      ("rpad('The quick brown fox', 9, '-')", "The quick"),
      ("substr('abc', -2)", "bc"),
      ("regexp_extract('  pad  ', '([a-z]+) ([a-z]+)', 1)", ""),
      ("contains('  pad  ', 'b')", "false"),
      ("lpad('x|y|z', 9, '*')", "****x|y|z"),
      ("substr('aaa', -5, 8)", "aaa"),
      ("replace('a,b,,c', 'l', 'L')", "a,b,,c"),
      ("split_part('AbC dEf', ',', 4)", ""),
      ("rpad('x|y|z', 13, '-')", "x|y|z--------"),
      ("reverse('x|y|z')", "z|y|x"),
      ("repeat('  pad  ', 3)", "  pad    pad    pad  "),
      ("repeat('Hello World', 4)", "Hello WorldHello WorldHello WorldHello World"),
      ("substr('x|y|z', 11)", ""),
      ("rpad('', 3, '-')", "---"),
      ("substr('The quick brown fox', -1, 4)", "x"),
      ("left('x|y|z', 11)", "x|y|z"),
      ("substr('a,b,,c', 8)", ""),
      ("substr('aaa', -5, 2)", ""),
      ("regexp_extract('The quick brown fox', '([a-z]+) ([a-z]+)', 0)", "he quick"),
      ("instr('Hello World', 'o')", "5"),
      ("starts_with('  pad  ', 'a') OR ends_with('héllo wörld', 'c')", "false"),
      ("split_part('x|y|z', ',', 1)", "x|y|z"),
      ("split_part('AbC dEf', ',', 5)", "")
  )

  test("110 DuckDB-evaluated string expressions match through the router") {
    val dir = Files.createTempDirectory("graft_strdiff").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    val bad = fixtures.flatMap { case (expr, expected) =>
      try {
        val got = lake.sql(s"SELECT CAST(($expr) AS VARCHAR) AS v").head().getString(0)
        if (got == expected) None
        else Some(s"$expr: got '$got', DuckDB says '$expected'")
      } catch { case e: Throwable =>
        Some(s"$expr FAILED: ${e.getMessage.linesIterator.take(1).mkString.take(90)}") }
    }
    assert(bad.isEmpty, s"${bad.size} mismatches:\n" + bad.mkString("\n"))
  }
}
