package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ad-hoc perf decomposition for the headline residuals (tools-only) */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
    }

    // SPARK_GRAFT_PROBE=cc|json|ngram|agg limits the run to one section
    val only = sys.env.get("SPARK_GRAFT_PROBE")
    def section(name: String)(body: => Unit): Unit =
      if (only.forall(_ == name)) body

    val ev = graft.ops.Tables.t(spark, d, "events")
    val li = graft.ops.Tables.t(spark, d, "lineitem")

    // r7: q_fn_json decomposition (the one headline regression). Which of
    // scan / parse / repartition / total ORDER BY owns the residual?
    section("json") {
    val jFrom = from_json(col("props"), StructType(Seq(StructField("k", StringType)))).getField("k")
    val jGet = get_json_object(col("props"), "$.k")
    def fullWith(j: org.apache.spark.sql.Column, repart: Boolean) = {
      val raw = ev.select("event_id", "props")
      val src = if (repart) raw.repartition(32) else raw
      src.select(col("event_id"), j.cast(LongType).as("k_num"), j.as("k_str"),
        j.cast(LongType).as("k2")).orderBy("event_id")
    }
    time("ev_scan_only")(ev.select("event_id", "props"))
    time("ev_order_only")(ev.select("event_id", "props").orderBy("event_id"))
    time("ev_fromjson_noorder")(ev.select(col("event_id"), jFrom.as("k")))
    time("ev_getjson_noorder")(ev.select(col("event_id"), jGet.as("k")))
    time("json_full_from_repart")(fullWith(jFrom, repart = true))
    time("json_full_from_norepart")(fullWith(jFrom, repart = false))
    time("json_full_get_repart")(fullWith(jGet, repart = true))
    time("json_full_get_norepart")(fullWith(jGet, repart = false))
    time("q_fn_json_full")(graft.ops.QueriesFunctions.queries("q_fn_json")(spark, d))
    // r7b: orderBy re-executes its child for range-boundary sampling, so a
    // parse BELOW the sort runs twice; and the post-sort stage is 32-way
    // parallel, so a parse ABOVE the sort runs once AND in parallel.
    time("json_parse_after_sort") {
      val raw = ev.select("event_id", "props").orderBy("event_id")
      raw.select(col("event_id"), jGet.cast(LongType).as("k_num"),
        jGet.as("k_str"), jGet.cast(LongType).as("k2"))
    }
    time("json_parse_after_sort_from") {
      val raw = ev.select("event_id", "props").orderBy("event_id")
      raw.select(col("event_id"), jFrom.cast(LongType).as("k_num"),
        jFrom.as("k_str"), jFrom.cast(LongType).as("k2"))
    }
    }

    section("sortproj") {
      // does moving an expensive projection ABOVE the mandated total
      // ORDER BY pay on the wide-projection queries the way it did for
      // the JSON parse? (child of a global sort executes twice: sampling
      // + real pass; and the post-sort stage is exchange-wide)
      def mathProj(src: DataFrame) = src.select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice")).as("fl_price"),
        ceil(col("l_quantity")).as("ce_qty"),
        abs(col("l_discount") - 0.05).as("ab_disc"),
        round(log(col("l_quantity") + 1), 4).as("ln_q"),
        round(exp(col("l_discount")), 4).as("exp_d"),
        pow(col("l_quantity"), 2).as("pow_q"),
        pmod(col("l_orderkey"), lit(7)).as("pm"),
        signum(col("l_discount") - 0.05).cast(IntegerType).as("sg"),
        greatest(col("l_quantity"), lit(25.0)).as("g"),
        least(col("l_quantity"), lit(25.0)).as("lst"))
      time("math_proj_below_sort")(
        mathProj(li).orderBy("l_orderkey", "l_linenumber"))
      time("math_proj_above_sort")(
        mathProj(li.select("l_orderkey", "l_linenumber", "l_extendedprice",
          "l_quantity", "l_discount").orderBy("l_orderkey", "l_linenumber")))
      time("math_proj_below_sort2")(
        mathProj(li).orderBy("l_orderkey", "l_linenumber"))
      time("math_proj_above_sort2")(
        mathProj(li.select("l_orderkey", "l_linenumber", "l_extendedprice",
          "l_quantity", "l_discount").orderBy("l_orderkey", "l_linenumber")))
    }

    section("jsonplan") {
      val df = graft.ops.QueriesFunctions.queries("q_fn_json")(spark, d)
      df.explain("formatted")
      df.show(5)
    }

    section("multiway") {
      // r8: q_join_multiway decomposition (slowest headline at 17.2×
      // baseline) — scan floor vs join tree vs aggregation vs the
      // mandated total ORDER BY, plus a filter-first join-order variant
      // (region/nation reduced onto supplier BEFORE the fact joins)
      val cu = graft.ops.Tables.t(spark, d, "customer")
      val or = graft.ops.Tables.t(spark, d, "orders")
      val su = graft.ops.Tables.t(spark, d, "supplier")
      val na = graft.ops.Tables.t(spark, d, "nation")
      val re = graft.ops.Tables.t(spark, d, "region")
      val revenue = (sum(round(col("l_extendedprice") * 100).cast(LongType) *
        (lit(100L) - round(col("l_discount") * 100).cast(LongType)))
        .cast(DoubleType) / 10000.0).as("revenue")
      time("mw_scan_customer")(cu)
      time("mw_scan_orders")(or)
      time("mw_scan_lineitem")(li)
      time("mw_scan_li_3cols")(li.select("l_orderkey", "l_suppkey", "l_extendedprice"))
      def joined = cu.join(or, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
                  col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(na), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(re.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      time("mw_joins_only")(joined.select(col("n_name")))
      def agged = joined.groupBy("n_name").agg(revenue)
      time("mw_joins_agg")(agged)
      time("mw_full_with_order")(agged.orderBy("n_name"))
      // filter-first: broadcast ASIA nations onto supplier, then join the
      // shrunken supplier into the fact chain
      val asiaN = na.join(broadcast(re.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val su2 = su.join(broadcast(asiaN), col("s_nationkey") === col("n_nationkey"))
      def agged2 = cu.join(or, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(su2, col("l_suppkey") === col("s_suppkey") &&
                   col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name").agg(revenue)
      time("mw_filter_first")(agged2.orderBy("n_name"))
      time("q_join_multiway_full")(
        graft.ops.QueriesRelational.queries("q_join_multiway")(spark, d))
    }

    section("mwplan") {
      val df = graft.ops.QueriesRelational.queries("q_join_multiway")(spark, d)
      df.write.format("noop").mode("overwrite").save()
      // post-AQE final plan: which joins ended up broadcast?
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .mkString("\n"))
    }

    // r6: where does q_llm_dedup_ngram's time go? Stage-by-stage over the
    // documents table (char-5-grams), mirroring QueriesLlm's shapes.
    section("ngram") {
    val docsRaw = graft.ops.Tables.t(spark, d, "documents")
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val gramsNoHash = transform(
      sequence(lit(1), length(col("norm")) - 4),
      i => col("norm").substr(i, lit(5)))
    val hashed = array_distinct(transform(gramsNoHash, g =>
      conv(substring(md5(g), 1, 15), 16, 10).cast(LongType)))
    val xxhashed = array_distinct(transform(gramsNoHash, g => xxhash64(g)))
    time("doc_norm_only")(docsRaw.select(col("doc_id"), norm.as("norm")))
    time("doc_grams_nohash")(docsRaw.select(col("doc_id"), norm.as("norm"))
      .filter(length(col("norm")) >= 5).select(col("doc_id"), gramsNoHash.as("g")))
    time("doc_grams_md5")(docsRaw.select(col("doc_id"), norm.as("norm"))
      .filter(length(col("norm")) >= 5).select(col("doc_id"), hashed.as("hs")))
    time("doc_grams_xxh")(docsRaw.select(col("doc_id"), norm.as("norm"))
      .filter(length(col("norm")) >= 5).select(col("doc_id"), xxhashed.as("hs")))
    time("doc_sig16_fold") {
      val base = docsRaw.select(col("doc_id"), norm.as("norm"))
        .filter(length(col("norm")) >= 5).select(col("doc_id"), xxhashed.as("hs"))
      val p = 2147483647L
      val sigInit = struct((1 to 16).map(i => lit(p).as(s"m$i")): _*)
      base.select(col("doc_id"), aggregate(col("hs"), sigInit, (acc, x) =>
        struct((1 to 16).map { i =>
          least(acc.getField(s"m$i"), (lit(31L + i) * (x % p) + lit(7L * i)) % p).as(s"m$i")
        }: _*)).as("sig"))
    }
    time("doc_sig16_sweeps") {
      val base = docsRaw.select(col("doc_id"), norm.as("norm"))
        .filter(length(col("norm")) >= 5).select(col("doc_id"), xxhashed.as("hs"))
      val p = 2147483647L
      base.select(Seq(col("doc_id")) ++ (1 to 16).map(i =>
        array_min(transform(col("hs"), x => (lit(31L + i) * (x % p) + lit(7L * i)) % p)).as(s"m$i")): _*)
    }
    }

    // r7: connected-components strategy shoot-out (judge #8). All three
    // run on the SAME checkpointed pair set, so the LSH pipeline cost is
    // excluded and the numbers isolate the superstep loop.
    section("cc") {
      val pairs = graft.ops.QueriesLlm.queries("q_llm_dedup_near")(spark, d)
        .select("a", "b")
      def timeCC(name: String)(body: => DataFrame): Unit = {
        body.write.format("noop").mode("overwrite").save() // warm
        val t0 = System.nanoTime()
        val n = body.count()
        println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
      timeCC("cc_minlabel")(graft.ops.QueriesLlm.ccMinLabel(spark, pairs))
      timeCC("cc_twohop")(graft.ops.QueriesLlm.ccTwoHop(spark, pairs))
      timeCC("cc_stars")(graft.ops.QueriesLlm.ccStars(spark, pairs))
      time("q_llm_dedup_cluster_full")(
        graft.ops.QueriesLlm.queries("q_llm_dedup_cluster")(spark, d))
    }

    // r9 (r8 verdict item 5): the r2 pathological case — one LSH bucket
    // holding 60%+ of the corpus — replayed against the capped aggregate.
    // The claim to evidence: BoundedCollectLongs' buffer (map-side AND
    // reduce-side) stops at cap+1 BY CONSTRUCTION, so the degenerate
    // bucket costs the same as any other; the uncapped collect_list twin
    // materializes the whole 60% slice in one buffer (the OOM shape at
    // 10^9 docs). The emitted-list bound is checked, not just timed.
    section("degenerate") {
      val cap = 200
      // 4M synthetic ids (corpus-size independent — the sf0.1 embeddings
      // table is only 2k vectors, too small to exercise a buffer):
      // 60% collapse onto bucket 0, the rest spread over 1000 buckets.
      // The degenerate bucket would hold 2.4M ids (~19 MB) in ONE
      // uncapped aggregation buffer; the capped aggregate's buffer stops
      // at cap+1 = 201 longs whatever the skew.
      val rows = spark.range(4000000L).select(col("id").as("vec_id"),
        when(col("id") % 10 < 6, lit(0L))
          .otherwise(pmod(hash(col("id")), lit(1000)).cast(LongType))
          .as("bucket"))
      def capped = rows.groupBy("bucket")
        .agg(graft.functions.BoundedCollect
          .boundedCollectLongsCol(col("vec_id"), cap).as("ds"))
      time("degen_capped_agg")(capped)
      time("degen_uncapped_collect")(rows.groupBy("bucket")
        .agg(collect_list(col("vec_id")).as("ds")))
      val total = rows.count()
      val biggest = rows.groupBy("bucket").count()
        .agg(max("count")).head().getLong(0)
      val maxList = capped.agg(max(size(col("ds")))).head().getInt(0)
      println(s"[probe] degenerate: corpus=$total " +
        s"biggest_bucket=$biggest (${100 * biggest / total}%) " +
        s"max_emitted_list=$maxList (cap+1=${cap + 1})")
      assert(maxList <= cap + 1, "capped aggregate emitted an over-bound list")
    }

    // r9b: the domain-cap keep-set under maximal skew — one "hot" domain
    // holding 60% of a 4M-doc corpus. BoundedTopK's buffer holds ≤ cap
    // (key, id) pairs by construction, so the hot domain costs what any
    // domain costs; the row_number window spelling sorts the whole 2.4M
    // hot partition end-to-end just to keep 20 rows.
    section("domaincap") {
      val cap = 20
      val rows = spark.range(4000000L).select(col("id").as("doc_id"),
        when(col("id") % 10 < 6, lit("hot"))
          .otherwise(concat(lit("src"),
            pmod(hash(col("id")), lit(1000)).cast(StringType)))
          .as("source"))
      def capped = graft.ops.QueriesLlm.domainCapFromDocs(rows, cap)
      time("domaincap_bounded_agg")(capped)
      time("domaincap_window_rownum") {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast(StringType)).asc, col("doc_id").asc)
        rows.withColumn("rnk", row_number().over(w))
          .select(col("doc_id"), col("source"),
            (col("rnk") <= cap).cast(LongType).as("kept"))
      }
      val nsrc = rows.select("source").distinct().count()
      val kept = capped.agg(sum("kept")).head().getLong(0)
      println(s"[probe] domaincap: sources=$nsrc kept=$kept expected=${cap * nsrc}")
      assert(kept == cap * nsrc, "cap must bind exactly per source")
    }

    // r9b: mixture sampling at 4M docs — how much of the corpus does the
    // boundary bucket actually sort, and what does the two-level plan
    // save vs the per-source window cumsum?
    section("mixture") {
      val docs = spark.range(4000000L).select(col("id").as("doc_id"),
        concat(lit("src"), pmod(hash(col("id")), lit(4)).cast(StringType)).as("source"),
        // synthetic "text" with 1-40 tokens — cheap but realistic spread
        concat_ws(" ", transform(sequence(lit(1),
          pmod(col("id"), lit(40)).cast(IntegerType) + 1), i =>
          concat(lit("w"), i.cast(StringType)))).as("nt"))
      def fast = graft.ops.QueriesLlm.mixtureVerdictsFromDocs(docs, 0.5)
      def ref = graft.ops.QueriesLlm.mixtureVerdictsReference(docs, 0.5)
      time("mixture_bucketed_4M")(fast)
      time("mixture_window_4M")(ref)
      // boundary fraction: docs that actually enter the sort
      val base = docs.select(col("doc_id"), col("source"),
        size(split(col("nt"), " ")).cast("long").as("tok"),
        md5(col("doc_id").cast("string")).as("hx"))
        .withColumn("bk", substring(col("hx"), 1, 2))
      val perBucket = base.groupBy("source", "bk").agg(sum("tok").as("btok"),
        count(lit(1)).as("n"))
      val total = 4000000L
      // one boundary bucket per source of 256 → expected ~1/256 sorted
      val avgBucket = perBucket.agg(avg("n")).head().getDouble(0)
      println(f"[probe] mixture: avg bucket ${avgBucket}%.0f docs " +
        f"(${100.0 * avgBucket * 4 / total}%.2f%% of corpus enters the sort " +
        "across the 4 boundary buckets)")
    }

    section("agg") {
    time("li_scan7cols")(li.select("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate"))
    time("li_filter_only")(li.filter(col("l_shipdate") <= lit("2001-09-01").cast(TimestampNTZType)))
    time("q_agg_groupby_full")(graft.ops.QueriesRelational.queries("q_agg_groupby")(spark, d))
    time("li_repart32_agg") {
      li.repartition(32)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast(TimestampNTZType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(round(col("l_quantity")).cast(LongType)).as("s"), count(lit(1)).as("c"))
    }
    }
    spark.stop()
  }
}
