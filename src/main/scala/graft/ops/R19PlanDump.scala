package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** r19 plan-evidence dump (tools-only, not part of the library surface).
  *
  * The dedup queries return localCheckpoint'd DataFrames, so their
  * explain("formatted") shows one `Scan ExistingRDD` — the pipeline the
  * optimization round actually changed is invisible in the full-query
  * plan files. This tool dumps the INTERNAL pipelines:
  *
  *  - `minhash_internal_after`: the full minhashPairs DAG pre-checkpoint
  *    (via the tools-only `materialize = false`).
  *  - `minhash_cand_{before,after}`: the candidate-generation region in
  *    its pre-r19 two-pass spelling (clique aggregation + SEPARATE count
  *    pass for the ring's over-cap keys — copied verbatim from commit
  *    eca2268) vs the r19 merged one-aggregation shape. Everything above
  *    (est-filter + verify) is unchanged between the two.
  *  - `contain_internal_{before,after}`: containPairs in its pre-r19
  *    two-branch unionByName spelling (verbatim from eca2268, where the
  *    whole cand+verify subtree is planned TWICE) vs the r19 single-pass
  *    explode shape.
  *
  * usage: sbt "runMain graft.ops.R19PlanDump [outDir]"
  */
object R19PlanDump {
  private def pairsExplode(list: Column): Column =
    explode(flatten(transform(list, (x, i) =>
      transform(slice(list, i + 2, size(list)),
        y => struct(x.as("a"), y.as("b"))))))

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args.headOption.getOrElse("/root/repo/plans/r19")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dump(name: String, header: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.txt"),
        (s"# $header\n\n" + plan).getBytes("UTF-8"))
      println(s"[plandump] $name: ${plan.linesIterator.count(_.contains("Exchange"))} Exchange lines")
    }

    // shared input: the doc-level (hs, sig) table and its 8-band stream —
    // identical in both spellings (the r19 change starts at the aggregate)
    val numHashes = QueriesLlm.NumHashes
    val bands = QueriesLlm.Bands
    val rows = numHashes / bands
    val cap = 100
    val sh = QueriesLlm.shinglesDF(spark, d)
      .select(col("doc_id"), col("hs"),
        graft.functions.TextSketch.minhashSigCol(
          col("hs"), QueriesLlm.hashCoeffs.take(numHashes)).as("sig"))
    val bandArr = array((0 until bands).map { j =>
      struct(lit(j).as("band"),
        concat_ws("_", (1 to rows).map(r =>
          col("sig")(rows * j + r - 1).cast(StringType)): _*).as("bkey"))
    }: _*)
    val bandsAll = sh.drop("hs").select(col("doc_id"), explode(bandArr).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))

    // ---- candidate region, pre-r19 spelling (verbatim from eca2268)
    val cliqueOld = QueriesLlm.cappedIdListsSampled(
        bandsAll, Seq("band", "bkey"), "doc_id", cap)
      .select(pairsExplode(col("ds")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val ringOld = {
      val rank = md5(concat_ws("_", col("band").cast(StringType),
        col("bkey"), col("doc_id").cast(StringType)))
      val overKeys = bandsAll.groupBy(col("band"), col("bkey"))
        .agg(count(lit(1)).as("bsz")).filter(col("bsz") > cap)
        .select(col("band"), col("bkey"))
      val ord = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("bkey")).orderBy(rank, col("doc_id"))
      bandsAll.join(overKeys, Seq("band", "bkey"))
        .withColumn("nxt", lead(col("doc_id"), 1).over(ord))
        .filter(col("nxt").isNotNull)
        .select(least(col("doc_id"), col("nxt")).as("a"),
          greatest(col("doc_id"), col("nxt")).as("b"))
    }
    dump("minhash_cand_before",
      "minhashPairs candidate region, PRE-r19 two-pass spelling " +
        "(eca2268): cappedIdListsSampled aggregation + a SECOND count() " +
        "pass over the same band stream for the ring's over-cap keys",
      cliqueOld.unionByName(ringOld).distinct())

    // ---- candidate region, r19 merged shape (same code as minhashPairs)
    val bandRank = md5(concat_ws("_", col("band").cast(StringType),
      col("bkey"), col("doc_id").cast(StringType)))
    val grouped = bandsAll.groupBy(col("band"), col("bkey"))
      .agg(graft.functions.BoundedCollect
        .boundedTopKCol(bandRank, col("doc_id").cast(LongType), cap).as("ds0"),
        count(lit(1)).as("bsz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cliqueNew = grouped
      .select(sort_array(col("ds0")).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(pairsExplode(col("ds")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val ringNew = {
      val overKeys = grouped.filter(col("bsz") > cap)
        .select(col("band"), col("bkey"))
      val ord = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("bkey")).orderBy(bandRank, col("doc_id"))
      bandsAll.join(overKeys, Seq("band", "bkey"))
        .withColumn("nxt", lead(col("doc_id"), 1).over(ord))
        .filter(col("nxt").isNotNull)
        .select(least(col("doc_id"), col("nxt")).as("a"),
          greatest(col("doc_id"), col("nxt")).as("b"))
    }
    dump("minhash_cand_after",
      "minhashPairs candidate region, r19 merged shape: ONE persisted " +
        "aggregation (BoundedTopK + count) feeds both the clique lists " +
        "and the ring's over-cap keys (both consumers scan the same " +
        "InMemoryRelation; without the persist, column pruning split the " +
        "branches back into the two-pass plan)",
      cliqueNew.unionByName(ringNew).distinct())

    // ---- the full minhashPairs DAG as the queries now plan it
    dump("minhash_internal_after",
      "full minhashPairs pipeline pre-checkpoint (ordered = false, as the " +
        "five pipeline consumers call it); via tools-only materialize=false",
      QueriesLlm.minhashPairs(QueriesLlm.shinglesDF(spark, d),
        numHashes, bands, 0.5, ordered = false, materialize = false))

    // ---- containPairs, pre-r19 two-branch spelling (verbatim eca2268)
    val shC = QueriesLlm.shinglesDF(spark, d)
    val thr = 0.9
    val containOld = {
      val posts = QueriesLlm.cappedIdListsSampled(
        shC.select(col("doc_id"), explode(col("hs")).as("h")),
        Seq("h"), "doc_id", cap)
      val cand = posts
        .select(pairsExplode(col("ds")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .distinct()
      val shA = shC.select(col("doc_id").as("a"), col("hs").as("ha"))
      val shB = shC.select(col("doc_id").as("b2"), col("hs").as("hb"))
      val scored = cand.join(shA, "a").join(shB, col("b") === col("b2"))
        .select(col("a"), col("b"),
          size(array_intersect(col("ha"), col("hb"))).cast(LongType).as("inter"),
          size(col("ha")).cast(LongType).as("sza"),
          size(col("hb")).cast(LongType).as("szb"))
      val dirA = scored
        .filter(col("inter").cast(DoubleType) / col("sza") >= thr)
        .select(col("a").as("contained"), col("b").as("container"),
          round(col("inter").cast(DoubleType) / col("sza"), 4).as("containment"))
      val dirB = scored
        .filter(col("inter").cast(DoubleType) / col("szb") >= thr)
        .select(col("b").as("contained"), col("a").as("container"),
          round(col("inter").cast(DoubleType) / col("szb"), 4).as("containment"))
      dirA.unionByName(dirB)
    }
    dump("contain_internal_before",
      "containPairs, PRE-r19 two-branch unionByName spelling (eca2268): " +
        "the whole cand+verify join subtree is planned twice",
      containOld.orderBy("contained", "container"))

    dump("contain_internal_after",
      "containPairs, r19 single-pass shape: one scored subtree, both " +
        "directions via a 2-struct explode",
      QueriesLlm.containPairs(shC, cap).orderBy("contained", "container"))

    spark.stop()
  }
}
