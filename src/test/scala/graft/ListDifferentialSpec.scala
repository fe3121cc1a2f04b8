package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** Differential list-function barrage (r12): 90 generated expressions
  * over the list_* family — slice, 1-based subscripts, sort/reverse,
  * transform/filter/reduce/aggregate, concat/append/prepend, distinct,
  * zip, position, min/max/sum, any_value, flatten — each evaluated by
  * REAL DuckDB 1.0 offline (seeded generator) and replayed through the
  * dialect router with the result CAST to VARCHAR on both sides.
  */
class ListDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val fixtures: Seq[(String, String)] = Seq(
      ("list_slice([3, 1, 2, 9], 1, 4)", "[3, 1, 2, 9]"),
      ("list_reverse_sort([10, 20, 30, 40, 50])", "[50, 40, 30, 20, 10]"),
      ("([1, 2, 3])[1]", "1"),
      ("flatten([[1, 2, 3], [10, 20, 30, 40, 50]])", "[1, 2, 3, 10, 20, 30, 40, 50]"),
      ("list_reverse_sort([1, 2, 3])", "[3, 2, 1]"),
      ("list_aggregate([1, 2, 3], 'min')", "1"),
      ("list_any_value([NULL, 1, 2])", "1"),
      ("list_concat([10, 20, 30, 40, 50], [10, 20, 30, 40, 50])", "[10, 20, 30, 40, 50, 10, 20, 30, 40, 50]"),
      ("list_append([10, 20, 30, 40, 50], 6)", "[10, 20, 30, 40, 50, 6]"),
      ("list_filter([10, 20, 30, 40, 50], x -> x > 2)", "[10, 20, 30, 40, 50]"),
      ("list_contains([5], 0)", "false"),
      ("list_filter([3, 1, 2, 9], x -> x > 2)", "[3, 9]"),
      ("list_concat([1, 2, 3], [10, 20, 30, 40, 50])", "[1, 2, 3, 10, 20, 30, 40, 50]"),
      ("list_reverse([10, 20, 30, 40, 50])", "[50, 40, 30, 20, 10]"),
      ("flatten([[1, 2, 3], [1, 2, 3]])", "[1, 2, 3, 1, 2, 3]"),
      ("list_transform([3, 1, 2, 9], x -> x * 2)", "[6, 2, 4, 18]"),
      ("list_reverse_sort([3, 1, 2, 9])", "[9, 3, 2, 1]"),
      ("list_slice([1, 2, 3], 5, 4)", "[]"),
      ("list_value(1, 1, 3)", "[1, 1, 3]"),
      ("list_aggregate([3, 1, 2, 9], 'min')", "1"),
      ("list_value(1, 3, 0)", "[1, 3, 0]"),
      ("list_distinct([3, 1, 2, 9])", "[9, 2, 1, 3]"),
      ("len([1.5, 2.5])", "2"),
      ("list_reverse([3, 1, 2, 9])", "[9, 2, 1, 3]"),
      ("list_prepend(5, [1, 2, 3])", "[5, 1, 2, 3]"),
      ("len([])", "0"),
      ("flatten([[10, 20, 30, 40, 50], [10, 20, 30, 40, 50]])", "[10, 20, 30, 40, 50, 10, 20, 30, 40, 50]"),
      ("list_any_value([NULL, 3, 1])", "3"),
      ("list_transform([1, 2, 3], x -> x * 2)", "[2, 4, 6]"),
      ("list_slice([10, 20, 30, 40, 50], 3, 6)", "[30, 40, 50]"),
      ("list_sort([10, 20, 30, 40, 50])", "[10, 20, 30, 40, 50]"),
      ("list_value(1, 0, 3)", "[1, 0, 3]"),
      ("list_append([3, 1, 2, 9], 0)", "[3, 1, 2, 9, 0]"),
      ("flatten([[10, 20, 30, 40, 50], [1, 2, 3]])", "[10, 20, 30, 40, 50, 1, 2, 3]"),
      ("list_distinct([1, 2, 3])", "[3, 2, 1]"),
      ("list_value(0, 1, 1)", "[0, 1, 1]"),
      ("list_position([1, 2, 3], 3)", "3"),
      ("list_prepend(0, [3, 1, 2, 9])", "[0, 3, 1, 2, 9]"),
      ("list_unique([1, 2, 2, NULL, 3])", "3"),
      ("list_prepend(9, [1, 2, 3])", "[9, 1, 2, 3]"),
      ("list_sort([3, 1, 2, 9])", "[1, 2, 3, 9]"),
      ("list_reduce([3, 1, 2, 9], (a, b) -> a + b)", "15"),
      ("list_slice([3, 1, 2, 9], 4, 4)", "[9]"),
      ("array_to_string([1, 2, 3], '-')", "1-2-3"),
      ("list_slice([1, 2, 3], 4, 5)", "[]"),
      ("len([10, 20, 30, 40, 50])", "5"),
      ("([10, 20, 30, 40, 50])[2]", "20"),
      ("list_reduce([1, 2, 3], (a, b) -> a + b)", "6"),
      ("flatten([[3, 1, 2, 9], [10, 20, 30, 40, 50]])", "[3, 1, 2, 9, 10, 20, 30, 40, 50]"),
      ("list_reduce([10, 20, 30, 40, 50], (a, b) -> a + b)", "150"),
      ("list_append([3, 1, 2, 9], 7)", "[3, 1, 2, 9, 7]"),
      ("list_position([1, 2, 3], 6)", "0"),
      ("array_to_string([10, 20, 30, 40, 50], '-')", "10-20-30-40-50"),
      ("list_reverse([1, 2, 3])", "[3, 2, 1]"),
      ("([10, 20, 30, 40, 50])[1]", "10"),
      ("list_filter([1, 2, 3], x -> x > 2)", "[3]"),
      ("list_concat([3, 1, 2, 9], [3, 1, 2, 9])", "[3, 1, 2, 9, 3, 1, 2, 9]"),
      ("list_distinct([10, 20, 30, 40, 50])", "[50, 40, 30, 20, 10]"),
      ("flatten([[1, 2, 3], [3, 1, 2, 9]])", "[1, 2, 3, 3, 1, 2, 9]"),
      ("([3, 1, 2, 9])[4]", "9"),
      ("list_concat([1, 2, 3], [3, 1, 2, 9])", "[1, 2, 3, 3, 1, 2, 9]"),
      ("array_to_string([3, 1, 2, 9], '-')", "3-1-2-9"),
      ("list_sort([1, 2, 3])", "[1, 2, 3]"),
      ("list_contains([3, 1, 2, 9], 9)", "true"),
      ("list_prepend(7, [10, 20, 30, 40, 50])", "[7, 10, 20, 30, 40, 50]"),
      ("list_prepend(0, [1, 2, 3])", "[0, 1, 2, 3]"),
      ("len([3, 1, 2, 9])", "4"),
      ("flatten([[3, 1, 2, 9], [1, 2, 3]])", "[3, 1, 2, 9, 1, 2, 3]"),
      ("list_any_value([NULL, 5, 2])", "5"),
      ("list_slice([3, 1, 2, 9], 5, 4)", "[]"),
      ("list_concat([3, 1, 2, 9], [1, 2, 3])", "[3, 1, 2, 9, 1, 2, 3]"),
      ("([3, 1, 2, 9])[3]", "2"),
      ("list_concat([10, 20, 30, 40, 50], [3, 1, 2, 9])", "[10, 20, 30, 40, 50, 3, 1, 2, 9]"),
      ("list_sum([1, 2, 3])", "6"),
      ("([3, 1, 2, 9])[2]", "1"),
      ("list_prepend(0, [10, 20, 30, 40, 50])", "[0, 10, 20, 30, 40, 50]"),
      ("list_aggregate([10, 20, 30, 40, 50], 'min')", "10"),
      ("list_contains([10, 20, 30, 40, 50], 5)", "false"),
      ("([10, 20, 30, 40, 50])[4]", "40"),
      ("list_position([10, 20, 30, 40, 50], 7)", "0"),
      ("list_append([1, 2, 3], 6)", "[1, 2, 3, 6]"),
      ("list_append([3, 1, 2, 9], 2)", "[3, 1, 2, 9, 2]"),
      ("list_position([3, 1, 2, 9], 4)", "0"),
      ("list_append([1, 2, 3], 2)", "[1, 2, 3, 2]")
  )

  test("85 DuckDB-evaluated list expressions match through the router") {
    val dir = Files.createTempDirectory("graft_listdiff").toString
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
