package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Registers the driver test tables (TESTDATA.md) as temp views, once per
  * (session, dir). Queries address tables by name so the same code works
  * against any scale factor — and, on a real cluster, against a catalog.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val registered = new ConcurrentHashMap[String, Boolean]()

  def ensure(spark: SparkSession, dir: String): Unit = {
    val key = System.identityHashCode(spark) + ":" + dir
    registered.computeIfAbsent(key, { _ =>
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
      // read it as epoch-nanos Long and floor-divide to micros (exactly what
      // DuckDB's nanos->micros narrowing does).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      all.foreach { name =>
        val path = s"$dir/$name.parquet"
        if (new java.io.File(path).exists()) {
          val df0 = spark.read.parquet(path)
          val df = if (name == "events" &&
              df0.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType)) {
            df0.withColumn("ts",
              timestamp_micros(floor(col("ts") / 1000L).cast(LongType))
                .cast(TimestampNTZType))
          } else df0
          df.createOrReplaceTempView(name)
        }
      }
      true
    })
    ()
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensure(spark, dir)
    spark.table(name)
  }
}
