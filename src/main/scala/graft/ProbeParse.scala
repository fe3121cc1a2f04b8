package graft
object ProbeParse {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("probe").toString
    val lake = new graft.api.DuckLakeXLSpark(spark, s"$dir/l.xlsx", s"$dir/d")
    val qs = Seq(
      "levenshtein('kitten','sitting')", "jaccard('duck','luck')",
      "hamming('abc','abd')", "jaro_winkler_similarity('duck','luck')",
      "damerau_levenshtein('abc','acb')", "editdist3('abc','axc')",
      "bar(5, 0, 10, 10)", "format_bytes(123456789)",
      "to_base(255, 16)", "CAST(from_hex('ff') AS VARCHAR)", "bin(5)", "hex(255)",
      "greatest_common_divisor(12, 18)", "least_common_multiple(4, 6)",
      "factorial(5)", "even(2.5)", "cot(1)",
      "CAST(age(TIMESTAMP '2024-03-01', TIMESTAMP '2023-01-15') AS VARCHAR)",
      "last_day(DATE '2024-02-05')", "yearweek(DATE '2024-03-05')",
      "isodow(DATE '2024-03-05')", "julian(DATE '2024-03-05')",
      "epoch_ns(TIMESTAMP '2024-01-01 00:00:00')",
      "CAST(make_timestamp(2024, 3, 5, 6, 7, 8.5) AS VARCHAR)",
      "decade(DATE '2024-03-05')", "century(DATE '2024-03-05')",
      "list_cosine_similarity([1.0,2.0],[2.0,4.0])",
      "list_dot_product([1.0,2.0],[3.0,4.0])",
      "CAST(list_grade_up([3,1,2]) AS VARCHAR)",
      "CAST(list_reverse_sort([2,3,1]) AS VARCHAR)",
      "CAST(flatten([[1,2],[3]]) AS VARCHAR)",
      "CAST(list_intersect([1,2,3],[2,3,4]) AS VARCHAR)",
      "list_has_any([1,2],[2,9])", "list_has_all([1,2,3],[2,3])",
      "list_unique([1,1,2])", "list_position([7,8,9], 8)",
      "CAST(str_split_regex('a1b2c','[0-9]') AS VARCHAR)",
      "parse_dirname('/a/b/c.txt')", "CAST(parse_path('/a/b/c.txt') AS VARCHAR)",
      "parse_filename('/a/b/c.txt', true)")
    qs.foreach { q =>
      try {
        val r = lake.sql(s"SELECT ($q) AS v").head()
        println(s"OK  ${(if (r.isNullAt(0)) "NULL" else r.get(0).toString).take(50)}  == ${q.take(55)}")
      } catch { case e: Throwable =>
        println(s"ERR ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(1).mkString.take(80)}  == ${q.take(50)}") }
    }
    spark.stop()
  }
}
