package graft

import org.apache.spark.sql.SparkSession

/** The driver's t1 smoke, reproduced exactly: a BARE SparkSession (no
  * session confs beyond master — `spark.sql.legacy.parquet.nanosAsLong`
  * and friends must be set dynamically by the code under test, never
  * assumed from a harness) calling `SparkEntry.entry`. Run:
  * `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows: $n")
    require(n > 0, "driver smoke: entry() must return rows")
    spark.stop()
  }
}
