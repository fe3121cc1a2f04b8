package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** LSH bucket-occupancy audit (r16, VERDICT task 2).
  *
  * The sf1 LLM bench showed q_llm_split_leakfree / q_llm_dedup_ngram at
  * wall_x 14 and q_llm_dedup_contain at bytes_x 16 for data_x 10 — the
  * O(N·cap·T) candidate contract (QueriesLlm scale notes) was asserted
  * but never MEASURED at sf1 density, where the generator's 10×
  * near-duplicate construction densifies buckets by design. This main
  * measures, for each of the three bucket streams feeding those queries,
  * the PRE-cap bucket-size distribution and the candidate-pair counts
  * with and without the cap, against the analytic bound
  * entries·(cap-1)/2:
  *
  *  - `minhash_word`  — the (band, bkey) stream of [[QueriesLlm
  *    .minhashPairs]] over word shingles (q_llm_dedup_near,
  *    q_llm_split_leakfree's cluster stage)
  *  - `minhash_ngram` — the same stream over sampled char-5-grams
  *    (q_llm_dedup_ngram)
  *  - `contain_postings` — the gram posting lists of
  *    [[QueriesLlm.containPairs]] (q_llm_dedup_contain)
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.ops.LshAudit"
  * Prints one JSON line per stream (grep "LSHAUDIT"). Driver-side
  * evidence tool — results recorded in SCALE.md §6.20 and
  * bench_archive/LSH_AUDIT_r16_*.json.
  */
object LshAudit {
  private def auditKeyed(s: SparkSession, name: String, keyed: DataFrame,
      keys: Seq[String], nDocs: Long, tables: Int, cap: Int): String = {
    val sizes = keyed.groupBy(keys.map(col): _*).agg(count(lit(1)).as("k"))
    // r18: over-cap buckets TRUNCATE to cap members instead of dropping
    // (QueriesLlm.cappedIdListsSampled, the VERDICT r17 task-2 fix) —
    // kept pairs are C(min(k, cap), 2) per bucket and the truncated
    // entries are `k - cap`, not the whole bucket
    val kKept = least(col("k"), lit(cap.toLong))
    val r = sizes.agg(
      count(lit(1)).as("buckets"),
      max(col("k")).as("max_bucket"),
      sum(col("k")).as("entries"),
      count(when(col("k") > cap, 1)).as("buckets_over_cap"),
      sum(when(col("k") > cap, col("k") - cap).otherwise(lit(0L)))
        .as("entries_dropped"),
      sum(when(col("k") >= 2, kKept * (kKept - 1) / 2)
        .otherwise(lit(0L))).cast(LongType).as("cand_pairs_kept"),
      sum(when(col("k") >= 2, col("k") * (col("k") - 1) / 2)
        .otherwise(lit(0L))).cast(LongType).as("cand_pairs_uncapped")
    ).head()
    val entries = r.getAs[Long]("entries")
    val kept = r.getAs[Long]("cand_pairs_kept")
    val bound = entries * (cap - 1) / 2 // each kept bucket has k <= cap
    s"""{"stream":"$name","n_docs":$nDocs,"tables":$tables,"cap":$cap,""" +
      s""""buckets":${r.getAs[Long]("buckets")},"max_bucket":${r.getAs[Long]("max_bucket")},""" +
      s""""entries":$entries,"buckets_over_cap":${r.getAs[Long]("buckets_over_cap")},""" +
      s""""entries_dropped":${r.getAs[Long]("entries_dropped")},""" +
      s""""cand_pairs_kept":$kept,"cand_pairs_uncapped":${r.getAs[Long]("cand_pairs_uncapped")},""" +
      s""""bound_entries_x_cap":$bound,"kept_within_bound":${kept <= bound}}"""
  }

  /** the (band, bkey, doc_id) stream minhashPairs buckets on */
  private def bandStream(sh: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val mh = sh.toDF("doc_id", "hs")
      .select(col("doc_id"),
        graft.functions.TextSketch.minhashSigCol(
          col("hs"), QueriesLlm.hashCoeffs.take(numHashes)).as("sig"))
    val bandArr = array((0 until bands).map { j =>
      struct(lit(j).as("band"),
        concat_ws("_", (1 to rows).map(r =>
          col("sig")(rows * j + r - 1).cast(org.apache.spark.sql.types.StringType)): _*).as("bkey"))
    }: _*)
    mh.select(col("doc_id"), explode(bandArr).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "8g")
      .appName("lsh-audit").getOrCreate()
    try {
      val nDocs = Tables.t(spark, dir, "documents").count()
      val word = bandStream(QueriesLlm.shinglesDF(spark, dir),
        QueriesLlm.NumHashes, QueriesLlm.Bands)
      println("LSHAUDIT " + auditKeyed(spark, "minhash_word", word,
        Seq("band", "bkey"), nDocs, QueriesLlm.Bands, QueriesLlm.MaxBucket))
      val ngram = bandStream(QueriesLlm.ngramsDF(spark, dir),
        QueriesLlm.NgramHashes, QueriesLlm.NgramBands)
      println("LSHAUDIT " + auditKeyed(spark, "minhash_ngram", ngram,
        Seq("band", "bkey"), nDocs, QueriesLlm.NgramBands, QueriesLlm.NgramMaxBucket))
      val postings = QueriesLlm.shinglesDF(spark, dir)
        .toDF("doc_id", "hs")
        .select(col("doc_id"), explode(col("hs")).as("h"))
      println("LSHAUDIT " + auditKeyed(spark, "contain_postings", postings,
        Seq("h"), nDocs, 1, QueriesLlm.MaxBucket))
    } finally spark.stop()
  }
}
