package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.DuckLakeXLSpark

/** Face B exercised through the driver's oracle gate: each query runs a
  * complete lake lifecycle (xlsx catalog + parquet data + pull/push sync)
  * in a fresh temp dir and returns a result whose expected value is a
  * VALUES literal — so the DuckDB oracle verifies the END STATE of the
  * reference's test_excel flow (ducklakexl.py:695-743), not just row
  * counts.
  */
object QueriesLake {
  type QFn = (SparkSession, String) => DataFrame

  private def freshLake(s: SparkSession): DuckLakeXLSpark = {
    val dir = Files.createTempDirectory("graft_lake_q").toString
    new DuckLakeXLSpark(s, s"$dir/lake.xlsx", s"$dir/data")
  }

  val queries: Map[String, QFn] = Map(
    // the test_excel flow, reopened from the workbook alone (E1+E5)
    "q_lake_e2e" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql("CREATE TABLE my_table(id INTEGER, val VARCHAR)")
      lake.sql("INSERT INTO my_table VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta')")
      lake.sql("DELETE FROM my_table WHERE id = 3")
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      reopened.sql("SELECT * FROM my_table ORDER BY id")
    },
    // multi-statement script semantics (ipynb cell 8 shape)
    "q_lake_multistatement" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE t(id INTEGER, val VARCHAR);
          |INSERT INTO t VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta')""".stripMargin)
      lake.sql(
        """DELETE FROM t WHERE id = 3;
          |INSERT INTO t VALUES (5, 'epsilon');
          |SELECT * FROM t ORDER BY id""".stripMargin)
    },
    // time travel: the table as of the pre-DELETE snapshot
    "q_lake_time_travel" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql("CREATE TABLE tt(id INTEGER, val VARCHAR)")
      lake.sql("INSERT INTO tt VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta')")
      val beforeDelete = lake.currentState.currentSnapshot
      lake.sql("DELETE FROM tt WHERE id <= 2")
      lake.tableAt("tt", beforeDelete).orderBy("id")
    },
    // copy-on-write UPDATE with an expression over the pre-update row
    "q_lake_update" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE u(id INTEGER, qty INTEGER, val VARCHAR);
          |INSERT INTO u VALUES (1,10,'alpha'),(2,20,'beta'),(3,30,'gamma'),(4,40,'delta');
          |UPDATE u SET qty = qty + 5, val = 'bumped' WHERE id >= 3;
          |SELECT * FROM u ORDER BY id""".stripMargin)
    }
  )

  val oracle: Map[String, String] = Map(
    "q_lake_e2e" ->
      ("SELECT * FROM (VALUES (1,'alpha'),(2,'beta'),(4,'delta')) t(id, val) ORDER BY id"),
    "q_lake_multistatement" ->
      ("SELECT * FROM (VALUES (1,'alpha'),(2,'beta'),(4,'delta'),(5,'epsilon')) t(id, val) ORDER BY id"),
    "q_lake_time_travel" ->
      ("SELECT * FROM (VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta')) t(id, val) ORDER BY id"),
    "q_lake_update" ->
      ("SELECT * FROM (VALUES (1,10,'alpha'),(2,20,'beta'),(3,35,'bumped'),(4,45,'bumped')) " +
       "t(id, qty, val) ORDER BY id")
  )
}
