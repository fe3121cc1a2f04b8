package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Registers the driver test tables (TESTDATA.md) as temp views. Temp views
  * are global per session, so we track the ACTIVE sf dir per session
  * (keyed by sessionUUID) and re-register all views whenever a different
  * dir is requested — a session mixing sf0.001 (entry) and sf0.01 (verify)
  * always reads the dir it asked for.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // WeakHashMap keyed on the session object: no collision/GC-reuse issues
  // (unlike identityHashCode keys), entries vanish with their session.
  private val activeDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  def ensure(spark: SparkSession, dir: String): Unit = synchronized {
    val prev = activeDir.put(spark, dir)
    if (prev != dir) {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
      // read it as epoch-nanos Long and integer-divide to micros (exactly
      // what DuckDB's nanos->micros narrowing does). `ts div 1000` stays in
      // Long arithmetic — a double-valued `/` would lose ulps above 2^53.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      all.foreach { name =>
        val path = s"$dir/$name.parquet"
        if (new java.io.File(path).exists()) {
          val df0 = spark.read.parquet(path)
          val df = if (name == "events" &&
              df0.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType)) {
            df0.withColumn("ts",
              timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
          } else df0
          df.createOrReplaceTempView(name)
        }
      }
    }
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensure(spark, dir)
    spark.table(name)
  }
}
