package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.DuckLakeXLSpark
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship (SURVEY §7.7): build a temp DuckLakeXL lake (xlsx catalog +
    * parquet data), replay the reference's test_excel slice through it,
    * then answer the multiway star join over the sf0.001 testdata — one
    * call proving catalog + sync + SQL. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = Files.createTempDirectory("graft_entry").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    val smoke = lake.sql(
      """CREATE TABLE my_table(id INTEGER, val VARCHAR);
        |INSERT INTO my_table VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta');
        |DELETE FROM my_table WHERE id = 3;
        |SELECT * FROM my_table""".stripMargin)
    require(smoke.count() == 3L, "lake smoke flow must yield rows {1,2,4}")
    QueriesRelational.queries("q_join_multiway")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesRelational.queries ++ QueriesFunctions.queries ++
      QueriesUdf.queries ++ QueriesLlm.queries ++ QueriesLake.queries ++
      QueriesStreaming.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    QueriesRelational.oracle ++ QueriesFunctions.oracle ++
      QueriesUdf.oracle ++ QueriesLlm.oracle ++ QueriesLake.oracle ++
      QueriesStreaming.oracle
}
