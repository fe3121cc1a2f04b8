package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.SparkTestSession

/** The native sketch expressions must be BIT-IDENTICAL to the
  * functions-built chains they replaced (which are what the DuckDB
  * oracle twins mirror). Each test evaluates both formulations over the
  * same input — generated strings incl. multi-byte chars, plus the real
  * fixture corpus — and compares exactly.
  */
class TextSketchSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark
  import org.apache.spark.sql.Column

  private val norm: Column => Column =
    c => trim(regexp_replace(lower(c), "\\s+", " "))

  /** the replaced chain: conv(substring(md5(g),1,15),16,10) over substr grams */
  private def oldCharGrams(c: Column, n: Int, stride: Int, mod: Int): Column =
    filter(array_distinct(transform(
      sequence(lit(1), length(c) - (n - 1), lit(stride)),
      i => conv(substring(md5(c.substr(i, lit(n))), 1, 15), 16, 10).cast(LongType))),
      h => h % mod === 0)

  private def oldWordShingles(ws: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => conv(substring(md5(concat_ws(" ", slice(ws, i, lit(n)))), 1, 15), 16, 10)
        .cast(LongType)))

  private def docsNorm(sf: String): DataFrame =
    graft.ops.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), norm(col("text")).as("nt"))

  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 200)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar.map(_.toString), 3 -> Gen.const(" "),
      1 -> Gen.oneOf("é", "Ω", "中", "𐍈"))) // incl. a surrogate pair
  } yield cs.mkString

  private def compareCols(df: DataFrame, a: Column, b: Column): Unit = {
    val bad = df.select(a.as("x"), b.as("y"))
      .filter(!(col("x") <=> col("y"))).limit(5).collect()
    assert(bad.isEmpty, s"mismatch rows: ${bad.mkString("; ")}")
  }

  test("HashedGrams(char) == the built-in chain on generated strings") {
    val texts = Gen.listOfN(60, genText).sample.get :+ "" :+ "ab" :+ "     " :+ "中中中中中中"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.map(Row(_)), 4),
      StructType(Seq(StructField("t", StringType))))
      .select(norm(col("t")).as("nt")).filter(length(col("nt")) >= 5)
    compareCols(df,
      TextSketch.hashedCharGramsCol(col("nt"), 5, 2, 4),
      oldCharGrams(col("nt"), 5, 2, 4))
    compareCols(df, // unsampled config (stride 1, no mod)
      TextSketch.hashedCharGramsCol(col("nt"), 5, 1, 1),
      oldCharGrams(col("nt"), 5, 1, 1))
  }

  test("HashedGrams(char) == the built-in chain on the fixture corpus") {
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$d/documents.parquet").exists())
    val df = docsNorm(d).filter(length(col("nt")) >= 5)
    compareCols(df,
      TextSketch.hashedCharGramsCol(col("nt"), 5, 2, 4),
      oldCharGrams(col("nt"), 5, 2, 4))
  }

  test("HashedGrams(word) == the built-in shingle chain on the fixture corpus") {
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$d/documents.parquet").exists())
    val df = docsNorm(d)
      .select(col("nt"), split(col("nt"), " ").as("ws"))
      .filter(size(col("ws")) >= 5)
    compareCols(df,
      TextSketch.hashedWordShinglesCol(col("nt"), 5),
      oldWordShingles(col("ws"), 5))
  }

  test("MinHashSig == the 16 array_min sweeps (incl. null on empty set)") {
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$d/documents.parquet").exists())
    val coeffs = graft.ops.QueriesLlm.hashCoeffs
    val hs = TextSketch.hashedCharGramsCol(col("nt"), 5, 2, 4)
    val df = docsNorm(d).filter(length(col("nt")) >= 5).select(hs.as("hs"))
    val sweeps = array(coeffs.map { case (a, b) =>
      array_min(transform(col("hs"),
        x => (lit(a) * (x % TextSketch.HashP) + lit(b)) % TextSketch.HashP))
    }: _*)
    // array(null-elements) vs null array: compare element-wise through
    // coalesce so "empty set -> all-null sweeps" matches "null sig"
    val sig = TextSketch.minhashSigCol(col("hs"), coeffs)
    compareCols(df.filter(size(col("hs")) > 0), sig, sweeps)
    val empties = df.filter(size(col("hs")) === 0)
      .select(TextSketch.minhashSigCol(col("hs"), coeffs).as("sig"))
      .filter(col("sig").isNotNull).count()
    assert(empties == 0L)
  }

  test("GramTopCount == the explode+groupBy counts on the fixture corpus") {
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$d/documents.parquet").exists())
    val n = 3
    val doc = docsNorm(d)
      .select(col("doc_id"), col("nt"), split(col("nt"), " ").as("ws"))
      .filter(size(col("ws")) >= n)
    val old = doc.select(col("doc_id"),
        explode(transform(
          sequence(lit(1), size(col("ws")) - (n - 1)),
          i => concat_ws(" ", slice(col("ws"), i, lit(n))))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").as("top_old"), sum("c").as("total_old"))
    val neu = doc.select(col("doc_id"),
      TextSketch.gramTopCountCol(col("nt"), n).as("tc"))
    val joined = old.join(neu, "doc_id")
    assert(joined.count() == old.count() && joined.count() == neu.count())
    val bad = joined.filter(
      col("tc.top") =!= col("top_old") || col("tc.total") =!= col("total_old"))
      .limit(5).collect()
    assert(bad.isEmpty, s"count mismatch: ${bad.mkString("; ")}")
  }

  test("WinnowFingerprints == a naive direct-polynomial reimplementation") {
    val K = 8; val W = 32; val B = 257L; val M = 2147483647L
    // independent oracle: direct per-gram polynomial + naive window scan
    def brute(text: String): Option[Seq[Long]] = {
      val cps = text.codePoints().toArray.map(_.toLong)
      if (cps.length < K + W - 1) return None
      val hashes = (0 to cps.length - K).map { i =>
        (0 until K).foldLeft(0L)((h, j) => (h * B + cps(i + j)) % M)
      }
      val mins = (W - 1 until hashes.length).map(p => hashes.slice(p - W + 1, p + 1).min)
      Some(mins.distinct)
    }
    val texts = Gen.listOfN(40, genText).sample.get.map(
      t => t.toLowerCase.replaceAll("\\s+", " ").trim) :+
      ("abcdefgh" * 12) :+ ("中中" + "abcdefgh" * 10)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.map(Row(_)), 4),
      StructType(Seq(StructField("t", StringType))))
    val got = df.select(col("t"),
        TextSketch.winnowFingerprintsCol(col("t"), K, W, B, M).as("fps"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1).toSeq))).toMap
    texts.foreach { t =>
      assert(got(t) == brute(t), s"winnow mismatch for ${t.take(40)}…")
    }
  }

  test("docs sharing a >= w+k-1 char substring share a winnow fingerprint") {
    val K = 8; val W = 32
    val shared = "the quick brown fox jumps over the lazy dog tail" // 49 >= 39
    assert(shared.length >= W + K - 1)
    val a = "prefix one " + shared + " suffix alpha"
    val b = "another beginning " + shared + " different end"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(a), Row(b)), 2),
      StructType(Seq(StructField("t", StringType))))
    val fps = df.select(TextSketch.winnowFingerprintsCol(col("t"), K, W, 257L, 2147483647L))
      .collect().map(_.getSeq[Long](0).toSet)
    assert(fps(0).intersect(fps(1)).nonEmpty, "winnowing guarantee violated")
  }

  test("TextStatsRaw == the regex/HOF battery on generated strings + fixture corpus") {
    val stops5 = Seq("the", "a", "of", "and", "to")
    def oldStruct(raw: Column): Column = {
      val nm = norm(raw)
      val ws = split(nm, " ")
      struct(
        size(ws).as("n_words"),
        size(regexp_extract_all(nm, lit("[a-z0-9]+"), lit(0))).as("n_tokens"),
        aggregate(ws, lit(0L), (acc, x) => acc + length(x)).as("total_len"),
        size(filter(ws, x => array_contains(typedLit(stops5), x))).as("stop_cnt"),
        length(nm).as("norm_len"),
        length(regexp_replace(nm, "[^a-z0-9 ]", "")).as("alnum_len"),
        substring(md5(nm), 1, 16).as("fp"))
    }
    val texts = Gen.listOfN(60, genText).sample.get ++ Seq(
      "", "   ", "the a of and to", "a\tb\nc", "Ωmega 中文 mixed42 a..b",
      "UPPER the AND lower", "t1  t2 t3")
    val gdf = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.map(Row(_)), 4),
      StructType(Seq(StructField("t", StringType))))
    compareCols(gdf, TextSketch.textStatsRawCol(col("t"), stops5), oldStruct(col("t")))
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$d/documents.parquet").exists())
    val ddf = graft.ops.Tables.t(spark, d, "documents")
    compareCols(ddf, TextSketch.textStatsRawCol(col("text"), stops5), oldStruct(col("text")))
  }

  test("SimHashSig == the explode+vote aggregation on the fixture corpus") {
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$d/documents.parquet").exists())
    val doc = docsNorm(d)
    // the replaced shape: one md5 per word occurrence, 64 vote sums
    val words = doc
      .select(col("doc_id"), explode(split(col("nt"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .select(col("doc_id"), md5(col("word")).as("h"))
    val chunks = (0 until 4).map(j =>
      conv(substring(col("h"), j * 4 + 1, 4), 16, 10).cast(LongType).as(s"c$j"))
    val wc = words.select(col("doc_id") +: chunks: _*)
    val bitAggs = (0 until 64).map { b =>
      val j = b / 16
      val k = 15 - (b % 16)
      sum(shiftright(col(s"c$j"), k) % 2 * 2 - 1).as(s"v$b")
    }
    val sigCols = (0 until 4).map { j =>
      (0 until 16).map { i =>
        when(col(s"v${j * 16 + i}") >= 0, lit(1L << (15 - i))).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val oldSig = wc.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), array(sigCols: _*).as("sig_old"))
    val newSig = doc
      .select(col("doc_id"), TextSketch.simhashSigCol(col("nt")).as("sig_new"))
      .filter(col("sig_new").isNotNull)
    val joined = oldSig.join(newSig, "doc_id")
    assert(joined.count() == oldSig.count(), "doc coverage differs")
    assert(joined.count() == newSig.count(), "doc coverage differs")
    val bad = joined.filter(!(col("sig_old") <=> col("sig_new"))).limit(5).collect()
    assert(bad.isEmpty, s"signature mismatch: ${bad.mkString("; ")}")
  }

  test("EntropyStats == the explode+groupBy entropies (generated + fixture corpus)") {
    // summation ORDER differs between the two shapes, so entropies agree
    // to ~ulps, not bit-exactly; the query convention rounds to 4
    // decimals and the comparison here uses 1e-9 — six orders tighter
    def oldEntropy(doc: DataFrame): DataFrame = {
      def entropy(units: DataFrame): DataFrame =
        units.groupBy("doc_id", "u").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum("c").as("n"),
            (log2(sum(col("c")).cast(DoubleType)) -
              sum(col("c") * log2(col("c").cast(DoubleType))) / sum(col("c")))
              .as("h"))
      val ce = entropy(doc.select(col("doc_id"),
        explode(regexp_extract_all(col("nt"), lit("."), lit(0))).as("u")))
      val we = entropy(doc.select(col("doc_id"),
          explode(split(col("nt"), " ")).as("u"))
        .filter(length(col("u")) > 0))
      ce.select(col("doc_id"), col("n").as("n_old"), col("h").as("ch_old"))
        .join(we.select(col("doc_id"), col("h").as("wh_old")), "doc_id")
    }
    def check(doc: DataFrame): Unit = {
      val old = oldEntropy(doc)
      val nw = doc
        .select(col("doc_id"), TextSketch.entropyStatsCol(col("nt")).as("es"))
        .filter(col("es").isNotNull)
        .select(col("doc_id"), col("es.n_chars_norm").as("n_new"),
          col("es.char_entropy").as("ch_new"), col("es.word_entropy").as("wh_new"))
      val joined = old.join(nw, "doc_id")
      assert(joined.count() == old.count(), "doc coverage differs (old side)")
      assert(joined.count() == nw.count(), "doc coverage differs (new side)")
      val bad = joined.filter(col("n_old") =!= col("n_new") ||
          abs(col("ch_old") - col("ch_new")) > 1e-9 ||
          abs(col("wh_old") - col("wh_new")) > 1e-9)
        .limit(5).collect()
      assert(bad.isEmpty, s"entropy mismatch: ${bad.mkString("; ")}")
    }
    val texts = Gen.listOfN(60, genText).sample.get ++ Seq(
      "", "   ", "aaaa", "a a a a", "Ωmega 中文 mixed42", "𐍈𐍈 𐍈 x")
    check(spark.createDataFrame(
        spark.sparkContext.parallelize(texts.zipWithIndex.map {
          case (t, i) => Row(i.toLong, t) }, 4),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("t", StringType))))
      .select(col("doc_id"), norm(col("t")).as("nt")))
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$d/documents.parquet").exists())
    check(docsNorm(d))
  }
}
