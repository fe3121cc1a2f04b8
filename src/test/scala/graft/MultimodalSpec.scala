package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stub decoder is deterministic on bytes and rejects empty payloads") {
    val dec = new MultimodalOps.StubDecoder
    val d1 = dec.decode("hello world".getBytes("UTF-8"))
    val d2 = dec.decode("hello world".getBytes("UTF-8"))
    assert(d1 == d2 && d1.ok && d1.channels == 3)
    assert(!dec.decode(Array.emptyByteArray).ok)
    dec.close()
    assertThrows[IllegalArgumentException](dec.decode("x".getBytes))
  }

  test("partition-wise decode keeps schema and row count over documents") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val out = MultimodalOps.decodeDocuments(spark, "/root/testdata/sf0.001")
    assert(out.schema == MultimodalOps.decodedSchema)
    val n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(out.count() == n)
    assert(out.filter(col("ok") && col("mime") === "image/fake").count() == n)
    // deterministic: same payload bytes -> same fake dimensions, twice
    assert(out.orderBy("doc_id").limit(3).collect().toSeq ==
      MultimodalOps.decodeDocuments(spark, "/root/testdata/sf0.001")
        .orderBy("doc_id").limit(3).collect().toSeq)
  }

  test("resizePlan fits inside the box, preserves aspect via exact rationals") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val decoded = MultimodalOps.decodeDocuments(spark, "/root/testdata/sf0.001")
    val out = MultimodalOps.resizePlan(decoded, maxSide = 32)
    assert(out.schema == MultimodalOps.resizedSchema)
    assert(out.count() == decoded.count())
    val bad = out.filter(col("out_width") > 32 || col("out_height") > 32 ||
      col("out_width") < 1 || col("out_height") < 1).count()
    assert(bad == 0, "resize escaped the box")
    // already-small dims pass through untouched (scale 1/1)
    val small = out.filter(col("width") <= 32 && col("height") <= 32)
    assert(small.filter(col("out_width") =!= col("width") ||
      col("out_height") =!= col("height")).count() == 0)
  }

  test("sampleFrames: stride-4 count/ts math matches the stub container index") {
    val rows = Seq(
      Row(1L, Array.fill[Byte](80)(7)),   // 10 frames -> idx 0,4,8 sampled
      Row(2L, Array.fill[Byte](7)(1)),    // <8 bytes -> still 1 frame
      Row(3L, Array.emptyByteArray))      // empty -> no frames
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema).repartition(2)
    val out = MultimodalOps.sampleFrames(df, stride = 4).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    assert(out(1L).map(_.getLong(1)).toSeq == Seq(0L, 4L, 8L))
    assert(out(1L).map(_.getLong(2)).toSeq == Seq(0L, 160L, 320L))
    assert(out(2L).map(_.getLong(1)).toSeq == Seq(0L))
    assert(!out.contains(3L))
    // deterministic digests: same payload -> same digest on re-run
    val again = MultimodalOps.sampleFrames(df, stride = 4).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    assert(out(1L).map(_.getString(3)).toSeq == again(1L).map(_.getString(3)).toSeq)
  }

  test("decodePayloads works on an arbitrary binary+meta frame (many partitions)") {
    val rows = (0L until 100L).map(i =>
      Row(i, s"payload-$i".getBytes("UTF-8"), Row("image/fake", i)))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType), StructField("n", LongType))))))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema).repartition(7)
    val out = MultimodalOps.decodePayloads(df)
    assert(out.count() == 100)
    assert(out.agg(min("width"), max("width")).collect()(0).toSeq.forall(
      v => v.asInstanceOf[Int] >= 16 && v.asInstanceOf[Int] < 80))
  }

  test("ImageIODecoder decodes real in-test PNGs through the partition-wise path") {
    // real codec, same seam: render PNGs of known dimensions with the
    // JDK's ImageIO and push them through decodePayloads as binary
    // payloads — the executor-side factory builds one decoder per
    // partition and corrupt payloads degrade to ok=false, not a crash
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8040)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Row(1L, png(20, 30), Row("image/png")),
      Row(2L, png(64, 8), Row("image/png")),
      Row(3L, "not an image at all".getBytes("UTF-8"), Row("image/png")),
      Row(4L, Array.emptyByteArray, Row("image/png")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", StructType(Seq(StructField("mime", StringType))))))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema).repartition(3)
    val out = MultimodalOps.decodePayloads(df,
        () => new MultimodalOps.ImageIODecoder)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getBoolean(5))).toMap
    assert(out(1L) == ((20, 30, 3, true)), out(1L))
    assert(out(2L) == ((64, 8, 3, true)), out(2L))
    assert(!out(3L)._4, "garbage bytes must decode to ok=false")
    assert(!out(4L)._4, "empty payload must decode to ok=false")
    // and the real decode chains into the resize plan unchanged
    val rp = MultimodalOps.resizePlan(
      MultimodalOps.decodePayloads(df, () => new MultimodalOps.ImageIODecoder)
        .filter(col("ok")), maxSide = 16)
      .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    assert(rp(1L) == ((10, 16)), rp(1L))  // 20x30 -> x16/30 -> 10x16
    assert(rp(2L) == ((16, 2)), rp(2L))   // 64x8  -> x16/64 -> 16x2
  }
}
