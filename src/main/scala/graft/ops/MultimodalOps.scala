package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (brief §north-star): media as opaque
  * `binary` payloads + typed metadata struct, with decode / feature
  * extraction as PARTITION-WISE batch transforms — the Scala counterpart
  * of the `mapInPandas` batch-UDF shape: one decoder init per partition
  * (not per row), rows streamed through it, decoder closed with the
  * partition. That amortized-init shape is what makes per-row-expensive
  * media work viable at 100 TB; swap `StubDecoder` for a real image/audio
  * codec (JNI or pure-JVM) without touching the Spark plumbing.
  *
  * The decode itself is STUBBED deterministically — no image/audio
  * libraries exist in this container — but the schema, partitioning,
  * batch shape, and resource lifecycle are real and tested
  * (MultimodalSpec).
  */
object MultimodalOps {

  /** what a real decoder would yield per payload */
  final case class Decoded(width: Int, height: Int, channels: Int, ok: Boolean)

  /** deterministic fake decoder: "parses" a header from the payload bytes.
    * Stands in for e.g. a JPEG decoder; one instance per partition.
    */
  final class StubDecoder {
    var closed = false
    def decode(payload: Array[Byte]): Decoded = {
      require(!closed, "decoder used after close")
      if (payload == null || payload.isEmpty) Decoded(0, 0, 0, ok = false)
      else {
        // fake header parse: dimensions derived from the first bytes —
        // deterministic, so tests can assert exact outputs
        val w = 16 + (payload(0) & 0x3f)
        val h = 16 + (payload(payload.length / 2) & 0x3f)
        Decoded(w, h, 3, ok = true)
      }
    }
    def close(): Unit = closed = true
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("ok", BooleanType)))

  /** documents -> (payload binary, meta struct) -> partition-wise decode */
  def decodeDocuments(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.t(spark, dir, "documents")
      .select(col("doc_id"),
        col("text").cast(BinaryType).as("payload"),
        struct(lit("image/fake").as("mime"), col("n_chars")).as("meta"))
    decodePayloads(src)
  }

  /** the reusable operator: any df with (doc_id, payload, meta.mime) */
  def decodePayloads(src: DataFrame): DataFrame = {
    val spark = src.sparkSession
    val out = src.select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
      .rdd
      .mapPartitions { rows =>
        // per-partition decoder lifecycle (the mapInPandas batch shape)
        val dec = new StubDecoder
        val it = rows.map { r =>
          val d = dec.decode(r.getAs[Array[Byte]]("payload"))
          Row(r.getAs[Long]("doc_id"), r.getAs[String]("mime"),
            d.width, d.height, d.channels, d.ok)
        }
        new Iterator[Row] {
          def hasNext: Boolean = { val h = it.hasNext; if (!h && !dec.closed) dec.close(); h }
          def next(): Row = it.next()
        }
      }
    spark.createDataFrame(out, decodedSchema)
  }
}
