package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** r20 plan-evidence dump (tools-only, not part of the library surface).
  *
  * Dumps explain("formatted") for the query paths the r20 optimization
  * round touched, each in its pre-r20 spelling (verbatim from commit
  * 8e46011) and its r20 spelling:
  *
  *  - `q_llm_boilerplate_{before,after}`: window gram-df (count over
  *    (partition by g)) vs two-level map-side-combined df + common-gram
  *    join-back (guide §2.5 skew shape).
  *  - `q_llm_segment_dedup_{before,after}`: stacked-window distinct-doc
  *    df vs distinct + per-seg count + dup-table join-back.
  *  - `q_llm_copy_detect_chain`: the posting-list + pair-count chain —
  *    evidence for the VERDICT item-6 probe (is the fp stream aggregated
  *    twice like pre-r19 minhash was? the dump shows ONE linear chain).
  *  - `q_scale_probe_{cpu,agg}_after`: the new bench-only scaling probes.
  *
  * usage: sbt "runMain graft.ops.R20PlanDump [outDir]"
  */
object R20PlanDump {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args.headOption.getOrElse("/root/repo/plans/r20")
    new java.io.File(outDir).mkdirs()
    val spark = graft.GraftSession.defaults(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dump(name: String, header: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.txt"),
        (s"# $header\n\n" + plan).getBytes("UTF-8"))
      println(s"[plandump] $name: ${plan.linesIterator.count(_.contains("Exchange"))} Exchange lines, " +
        s"${plan.linesIterator.count(_.contains("Window"))} Window lines")
    }

    def normText(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(lower(c), "\\s+", " "))

    // ---------------- boilerplate: shared gram stream, both spellings
    val n = 5
    val bpDocs = Tables.t(spark, d, "documents")
      .select(col("doc_id"), normText(col("text")).as("nt"))
      .filter(size(split(col("nt"), " ")) >= n)
    val grams = bpDocs.select(col("doc_id"),
      explode(graft.functions.TextSketch.hashedWordShinglesCol(
        col("nt"), n, xx = false)).as("g"))
    val bpThr = 2
    val bpBefore = grams
      .withColumn("df", count(lit(1)).over(Window.partitionBy("g")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") > bpThr, 1L).otherwise(0L)).as("n_common"))
      .select(col("doc_id"), col("n_grams"), col("n_common"),
        round(col("n_common").cast(DoubleType) / col("n_grams"), 4).as("boiler_ratio"))
      .orderBy("doc_id")
    dump("q_llm_boilerplate_before",
      "boilerplate, PRE-r20 spelling (8e46011): gram df via count over " +
        "(partition by g) — the FULL gram stream is exchanged by a " +
        "hot-by-design key and each key's partition is buffered by ONE " +
        "WindowExec task (windows are excluded from AQE skew splitting)",
      bpBefore)
    dump("q_llm_boilerplate_after",
      "boilerplate, r20 spelling: two-level df (map-side-combined count " +
        "aggregate; a viral gram crosses the exchange as partial counts) " +
        "+ left join against only the >threshold COMMON grams (AQE " +
        "broadcasts the small table; pathological fallback is a " +
        "skew-splittable shuffle join)",
      QueriesLlm.queries("q_llm_boilerplate")(spark, d))

    // ---------------- segment dedup: both spellings
    val sgDocs = Tables.t(spark, d, "documents")
      .select(col("doc_id"), normText(col("text")).as("nt"))
    val segW = 10
    val segThr = 2
    val nseg = ceil(size(col("ws")).cast(DoubleType) / segW).cast(IntegerType)
    val segs = sgDocs
      .select(col("doc_id"), split(col("nt"), " ").as("ws"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), nseg), i =>
          struct(i.as("seg_idx"),
            concat_ws(" ",
              slice(col("ws"), (i - 1) * segW + lit(1), lit(segW))).as("seg")))).as("sg"))
      .select(col("doc_id"), col("sg.seg_idx").as("seg_idx"), col("sg.seg").as("seg"))
    val wDocSeg = Window.partitionBy("doc_id", "seg").orderBy("seg_idx")
    val keepB = col("df") <= segThr
    val sgBefore = segs
      .withColumn("first_occ",
        when(row_number().over(wDocSeg) === 1, 1L).otherwise(0L))
      .withColumn("df", sum(col("first_occ")).over(Window.partitionBy("seg")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when(keepB, 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(keepB, struct(col("seg_idx"), col("seg"))))),
          x => x("seg")), " ").as("clean"))
      .select(col("doc_id"), col("n_segs"), col("n_kept"),
        length(col("clean")).cast(LongType).as("clean_len"),
        substring(md5(col("clean")), 1, 16).as("clean_digest"))
      .orderBy("doc_id")
    dump("q_llm_segment_dedup_before",
      "segment_dedup, PRE-r20 spelling (8e46011): stacked windows — " +
        "row_number over (doc_id, seg) then sum over (partition by seg); " +
        "the second window exchanges the full segment stream by the " +
        "hot-by-design segment key and buffers each key on one task",
      sgBefore)
    dump("q_llm_segment_dedup_after",
      "segment_dedup, r20 spelling: distinct (doc, seg) pairs (composite " +
        "key — not hot) -> map-side-combined per-seg count -> only the " +
        ">threshold DUP segments join back (AQE broadcast when small, " +
        "skew-splittable shuffle join otherwise)",
      QueriesLlm.queries("q_llm_segment_dedup")(spark, d))

    // ---------------- copy_detect chain (VERDICT item 6 evidence)
    dump("q_llm_copy_detect_chain",
      "copy_detect full chain: scan -> winnow-fingerprint explode -> ONE " +
        "posting-list aggregation (keyed fp) -> pair explode -> ONE " +
        "pair-count aggregation (keyed (a,b)) -> sort. The two aggregates " +
        "consume DIFFERENT keys in one linear chain — unlike pre-r19 " +
        "minhash there is no second pass over the fp stream to merge",
      QueriesLlm.queries("q_llm_copy_detect")(spark, d))

    // ---------------- scaling probes (bench-only, new in r20)
    dump("q_scale_probe_cpu_after",
      "bench-only scaling probe: cores-derived repartition -> 8x explode " +
        "-> 16 chained md5 per row -> 1-row checksum (no before: new)",
      graft.BenchProbes.scaleCpu(spark, d))
    dump("q_scale_probe_agg_after",
      "bench-only scaling probe: cores-derived repartition -> hashed " +
        "per-row work -> 100k-key aggregate -> 1-row checksum (no before: new)",
      graft.BenchProbes.scaleAgg(spark, d))

    spark.stop()
  }
}
