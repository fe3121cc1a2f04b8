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

  /** the per-partition decoder contract: one instance per partition,
    * rows streamed through `decode`, `close()` with the partition */
  trait Decoder {
    def decode(payload: Array[Byte]): Decoded
    def close(): Unit
    def closed: Boolean
  }

  /** deterministic fake decoder: "parses" a header from the payload bytes.
    * Stands in for e.g. a JPEG decoder; one instance per partition.
    */
  final class StubDecoder extends Decoder {
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

  /** REAL codec path behind the same seam: `javax.imageio` ships in the
    * JDK (no new dependencies) and decodes PNG/BMP/GIF/JPEG payloads.
    * Undecodable bytes yield ok=false rather than failing the partition
    * — at 100 TB some corrupt payloads are a certainty, and one bad blob
    * must not kill a task. Same lifecycle as the stub: one instance per
    * partition (ImageIO reader caches warm up once per task, the
    * amortized-init shape that makes per-row-expensive decode viable).
    */
  final class ImageIODecoder extends Decoder {
    var closed = false
    def decode(payload: Array[Byte]): Decoded = {
      require(!closed, "decoder used after close")
      if (payload == null || payload.isEmpty) Decoded(0, 0, 0, ok = false)
      else try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) Decoded(0, 0, 0, ok = false)
        else Decoded(img.getWidth, img.getHeight,
          img.getRaster.getNumBands, ok = true)
      } catch {
        // ImageIO plugins throw UNCHECKED exceptions on truncated or
        // malformed-but-recognized payloads (IndexOutOfBounds, CMMException,
        // IllegalArgument …) — any of them escaping would kill the task,
        // the exact failure this class exists to prevent (review-found)
        case scala.util.control.NonFatal(_) => Decoded(0, 0, 0, ok = false)
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

  /** the reusable operator: any df with (doc_id, payload, meta.mime).
    * `decoder` picks the codec — the stub by default (the oracle row's
    * deterministic shape), [[ImageIODecoder]] for real PNG/BMP/GIF/JPEG
    * payloads; the factory runs ON THE EXECUTOR, once per partition.
    */
  def decodePayloads(src: DataFrame,
                     decoder: () => Decoder = () => new StubDecoder): DataFrame = {
    val spark = src.sparkSession
    val out = src.select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
      .rdd
      .mapPartitions { rows =>
        // per-partition decoder lifecycle (the mapInPandas batch shape)
        val dec = decoder()
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

  // ------------------------------------------------------------- resize

  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("out_width", IntegerType),
    StructField("out_height", IntegerType),
    StructField("scale_num", IntegerType),
    StructField("scale_den", IntegerType)))

  /** Resize plan for decoded media: fit each (width, height) inside
    * `maxSide` preserving aspect ratio — integer arithmetic only, so the
    * transform is deterministic and engine-portable. A real pipeline
    * swaps the dimension arithmetic for the codec's resample call; the
    * Spark-side shape (pure projection over the decode output, zero
    * shuffle) is the artifact.
    */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    require(maxSide > 0, s"maxSide must be positive: $maxSide")
    val spark = decoded.sparkSession
    val out = decoded.select(col("doc_id"), col("width"), col("height"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val w = r.getAs[Int]("width")
          val h = r.getAs[Int]("height")
          val side = math.max(w, h)
          // scale = min(1, maxSide/side) as an exact rational
          val (num, den) = if (side <= maxSide || side == 0) (1, 1) else (maxSide, side)
          val ow = math.max(1, w * num / den)
          val oh = math.max(1, h * num / den)
          Row(r.getAs[Long]("doc_id"), w, h, ow, oh, num, den)
        }
      }
    spark.createDataFrame(out, resizedSchema)
  }

  // -------------------------------------------------------- frame sample

  val framesSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("frame_ts_ms", LongType),
    StructField("frame_digest", StringType)))

  /** Frame sampling for video-like payloads: every `stride`-th frame of a
    * payload whose "frame count" the stub decoder derives from the byte
    * length (a real decoder reads the container index). One decoder per
    * partition, frames emitted as (index, timestamp, content digest) —
    * the flatMap row-explosion shape a clip-sampling pipeline needs,
    * with output rows proportional to sampled frames, never buffered
    * per-payload.
    */
  def sampleFrames(src: DataFrame, stride: Int, fps: Int = 25): DataFrame = {
    require(stride > 0 && fps > 0, s"stride/fps must be positive: $stride/$fps")
    val spark = src.sparkSession
    val out = src.select(col("doc_id"), col("payload"))
      .rdd.mapPartitions { rows =>
        val dec = new StubDecoder
        val it = rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val id = r.getAs[Long]("doc_id")
          if (payload == null || payload.isEmpty) Iterator.empty
          else {
            // stub "container index": one frame per 8 payload bytes
            val nFrames = math.max(1L, payload.length / 8L)
            (0L until nFrames by stride.toLong).iterator.map { i =>
              val b = payload(((i * 8) % payload.length).toInt) & 0xff
              Row(id, i, i * 1000L / fps,
                f"$b%02x${payload.length}%08x$i%04x")
            }
          }
        }
        new Iterator[Row] {
          def hasNext: Boolean = { val h = it.hasNext; if (!h && !dec.closed) dec.close(); h }
          def next(): Row = it.next()
        }
      }
    spark.createDataFrame(out, framesSchema)
  }
}
